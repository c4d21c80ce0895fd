"""Scale-evidence section for bench.py: the dedup/similarity stack
measured at 1x (sf0.1-shape: 5k docs / 2k vecs) and 10x (sf1-shape:
50k / 20k) over the deterministic synthetic corpora of
``sources/scale.py``, with candidate-pair and cap-drop TELEMETRY — the
proof that no operator hides a quadratic (VERDICT r2 next-round #1).

What each number means (written up in BENCH/BASELINE.md):

- ``minhash_lsh.cand_pairs``: sum over LSH band buckets of C(m,2) —
  the exact number of pairs the verify join scores. Linear growth
  (flat pairs/doc) is the signature of banding working; this is the
  production dedup path at 10^12 docs.
- ``ngram_jaccard.cand_pairs_cap*``: the exact-verification join's
  pair count under each hot-shingle cap. The head of the shingle df
  distribution grows linearly with N, so UNCAPPED exact jaccard is
  quadratic BY DATA (any corpus, any engine); the cap bounds it to
  ~N*cap from the zipf tail. The sweep shows the knob working.
- ``embedding_lsh``: bucket-occupancy + candidate pairs at the DEFAULT
  n_planes=8 AND at n_planes=11 for the 10x corpus — the documented
  sizing rule (similarity.py: n_planes must grow ~log2(N) to keep
  per-bucket occupancy constant). 8 planes at 10x is the
  mis-sized-index case and is reported as such.
- ``*.wall_ratio``: 10x wall / 1x wall, steal-aware best-of-attempts
  (see ``_timed`` — this VM takes minutes-long hypervisor CPU-steal
  bursts; a polluted run retries, min stays honest). <= ~10 means
  at-most-linear at this span; the 100x tier adds a second decade for
  the production path where compute genuinely dominates fixed cost.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

SEED = 11
BASE = "/tmp/spark_graft_bench/scaled_v1"
SCALES = {"1x": 5000, "10x": 50000}
VEC_FRAC = 0.4


def _corpus(spark, n_docs: int) -> dict:
    from tesseract_ocr_service_spark.sources import scale

    d = f"{BASE}/n{n_docs}_s{SEED}"
    # gate on the table written LAST: an interrupted first generation
    # must not wedge the cache with documents present but embeddings
    # missing/partial (write_scaled_corpus writes embeddings second)
    if not os.path.exists(f"{d}/embeddings.parquet/_SUCCESS"):
        scale.write_scaled_corpus(spark, d, n_docs, int(n_docs * VEC_FRAC), SEED)
    return {
        "documents": spark.read.parquet(f"{d}/documents.parquet"),
        "embeddings": spark.read.parquet(f"{d}/embeddings.parquet"),
    }


def _cpu_stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:9]))
    return sum(v) - v[3], v[7]  # busy, steal


def _timed(thunk, max_attempts: int = 3, steal_cap: float = 0.03) -> tuple[float, int]:
    """Best clean wall + row count of ``thunk() -> DataFrame``. The
    thunk runs INSIDE the timing because several operators
    (dedup_corpus, neardup_components) materialize eagerly during plan
    construction (checkpointed fixed-point loops) — timing only the
    final count would undercount them.

    This VM takes bursty hypervisor CPU steal (minutes-long, up to
    ~14% of busy jiffies — same discipline as bench._extract_wall):
    each run measures its own steal window; a polluted run triggers a
    retry (stolen time only ever slows a run, so min-over-attempts
    stays honest), an idle box accepts the first run."""
    best, n = float("inf"), 0
    for _ in range(max_attempts):
        b0, s0 = _cpu_stat()
        t0 = time.perf_counter()
        n = thunk().count()
        wall = time.perf_counter() - t0
        b1, s1 = _cpu_stat()
        best = min(best, wall)
        if (s1 - s0) <= steal_cap * max(1, b1 - b0):
            break
    return round(best, 2), n


def _pair_sum(grouped, n_col: str):
    return int(
        grouped.agg(
            F.sum(F.col(n_col) * (F.col(n_col) - 1) / 2).alias("p")
        ).collect()[0]["p"]
        or 0
    )


def _incremental_probe(spark, docs, n: int, full_wall: float) -> dict:
    """Incremental-dedup measurement shared by the 1x/10x and deep
    tiers: history = first 90% of ids (store built once, persisted to
    parquet — the one-time cost a real pipeline amortizes), timed job
    = last 10% against the STORE. persist=False everywhere: a timed
    probe must not leak MEMORY_AND_DISK blocks into later tiers'
    measurements (nothing here could unpersist the returned frame)."""
    from tesseract_ocr_service_spark.operators import incremental as I

    cut = int(n * 0.9)
    store_dir = f"{BASE}/n{n}_s{SEED}/sigstore_c{cut}"
    if not os.path.exists(f"{store_dir}/_SUCCESS"):
        _, s1 = I.dedup_incremental(
            docs.where(F.col("doc_id") < cut), persist=False
        )
        s1.write.mode("overwrite").parquet(store_dir)
    store = I.read_signature_store(spark, store_dir)
    newday = docs.where(F.col("doc_id") >= cut)
    wi, ki = _timed(
        lambda: I.dedup_incremental(newday, store, persist=False)[0],
        max_attempts=2,
    )
    return {
        "wall": wi,
        "kept_newday": ki,
        "newday_docs": n - cut,
        "wall_full_corpus": full_wall,
    }


def _deep_tier(spark, D, docs, n: int) -> dict:
    """The 100x tier body (production dedup path + telemetry-only
    aggregates). Split out so the caller can wrap it in try/finally
    restoring the shuffle-partition conf it runs under."""
    w_sig, _ = _timed(
        lambda: D.minhash_signatures_agg(docs), max_attempts=2
    )
    sigs = D.minhash_signatures_agg(docs).persist()
    cand = _pair_sum(D.minhash_lsh_candidates(docs, sigs=sigs), "n_docs")
    wv, nv = _timed(
        lambda: D.minhash_dedup_pairs(docs, threshold=0.7, sigs=sigs),
        max_attempts=2,
    )
    sigs.unpersist()
    w, kept = _timed(lambda: D.dedup_corpus(docs), max_attempts=2)
    # telemetry-only aggregates (no joins): the shingle-df cap sweep at
    # the third decade — as head shingles cross a fixed cap they drop
    # out, bending exact-jaccard candidate growth from quadratic toward
    # ~N*cap — and the simhash band-collision counts for BOTH pair-gen
    # shapes: fixed 16-bit bands (~N^2/2^16, the documented limit) vs
    # the multi-index 3-of-6-block keys (~32-bit space, the scale-safe
    # default since round 4).
    sh = D.shingle_rows(docs, "doc_id", "text", 3, distinct=True)
    row = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("m"))
        .agg(
            F.max("m").alias("max_df"),
            *[
                F.sum(
                    F.when(
                        F.col("m") <= cap,
                        F.col("m") * (F.col("m") - 1) / 2,
                    ).otherwise(0)
                ).alias(f"cand_pairs_cap{cap}")
                for cap in (50, 100, 1000)
            ],
        )
        .collect()[0]
    )
    # empty/degenerate corpora aggregate to NULL — report 0, not a crash
    ngram_tel = {k: int(row[k] or 0) for k in row.asDict()}
    sht = D.simhash_table(docs)
    simhash_cand = _pair_sum(
        sht.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned("sh", 16 * b).bitwiseAND(
                            F.lit(0xFFFF)
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band", "band_key")
        )
        .groupBy("band", "band_key")
        .agg(F.count("*").alias("m")),
        "m",
    )
    mi_cand = _pair_sum(
        D.simhash_multi_index_keys(sht)
        .groupBy("table_id", "key")
        .agg(F.count("*").alias("m")),
        "m",
    )
    wmp, nmp = _timed(
        lambda: D.simhash_pairs_multi_index(docs, max_hamming=3),
        max_attempts=2,
    )
    incr = _incremental_probe(spark, docs, n, w)
    return {
        "n_docs": n,
        "minhash_lsh": {
            "wall_sigs": w_sig,
            "cand_pairs": cand,
            "cand_pairs_per_doc": round(cand / n, 4),
            "wall_verify_sigs_persisted": wv,
            "verified_pairs": nv,
        },
        "dedup_corpus": {"wall": w, "kept": kept, "dropped": n - kept},
        "dedup_incremental": incr,
        "ngram_shingle_df": ngram_tel,
        "simhash_cand_pairs": simhash_cand,
        "simhash_multi_index": {
            "cand_pairs": mi_cand,
            "cand_pairs_per_doc": round(mi_cand / n, 4),
            "wall_pairs": wmp,
            "pairs": nmp,
        },
    }


def sf1_section(spark) -> dict:
    from tesseract_ocr_service_spark.operators import dedup as D
    from tesseract_ocr_service_spark.operators import dsir as DS
    from tesseract_ocr_service_spark.operators import similarity as S

    out: dict = {"scales": {k: {"n_docs": n, "n_vecs": int(n * VEC_FRAC)} for k, n in SCALES.items()}}

    for tag, n in SCALES.items():
        c = _corpus(spark, n)
        docs, embs = c["documents"], c["embeddings"]
        sec: dict = {}

        # --- shingle df distribution + cap sweep (ngram exact verify)
        sh = D.shingle_rows(docs, "doc_id", "text", 3, distinct=True)
        m = sh.groupBy("shingle").agg(F.count("*").alias("m"))
        row = m.agg(
            F.max("m").alias("max_df"),
            *[
                F.sum(
                    F.when(F.col("m") <= cap, F.col("m") * (F.col("m") - 1) / 2)
                    .otherwise(0)
                ).alias(f"cand_pairs_cap{cap}")
                for cap in (50, 100, 1000)
            ],
        ).collect()[0]
        ng = {k: int(row[k]) for k in row.asDict()}
        w, nout = _timed(
            lambda: D.ngram_jaccard_pairs(docs, threshold=0.7, hot_shingle_cap=100)
        )
        ng.update({"wall": w, "pairs": nout, "hot_shingle_cap": 100})
        sec["ngram_jaccard"] = ng

        # --- minhash signatures + LSH banding (the production path).
        # wall_sigs measures the UNCACHED signature stage, so it runs
        # BEFORE the persist (the cache manager matches by logical
        # plan — persisting first would time a cache read); every
        # later stage reuses the persisted sigs instead of recomputing
        # the shingle/minhash pass (same discipline as the 100x tier).
        w, _ = _timed(lambda: D.minhash_signatures_agg(docs))
        sigs = D.minhash_signatures_agg(docs).persist()
        cand = _pair_sum(D.minhash_lsh_candidates(docs, sigs=sigs), "n_docs")
        wv, nv = _timed(
            lambda: D.minhash_dedup_pairs(docs, threshold=0.7, sigs=sigs)
        )
        # CANDIDATE RECALL vs exact ground truth: linear candidate
        # growth means nothing if the bands silently lose true pairs
        # as N grows. Truth = exact 3-gram jaccard >= 0.7 (uncapped);
        # recall = fraction of true pairs sharing >= one band bucket.
        truth = D.ngram_jaccard_pairs(
            docs, threshold=0.7, hot_shingle_cap=10**9
        ).select("id_a", "id_b")
        cand_pairs_df = D.bucket_id_pairs(
            D.minhash_lsh_candidates(docs, sigs=sigs)
        )
        n_true = truth.count()
        n_hit = truth.join(cand_pairs_df, ["id_a", "id_b"]).count()
        sigs.unpersist()
        sec["minhash_lsh"] = {
            "wall_sigs": w,
            "cand_pairs": cand,
            "cand_pairs_per_doc": round(cand / n, 4),
            "wall_verify": wv,
            "verified_pairs": nv,
            "true_pairs_j07": n_true,
            "candidate_recall": round(n_hit / n_true, 4) if n_true else None,
        }

        # --- composed dedup + components
        w, kept = _timed(lambda: D.dedup_corpus(docs))
        sec["dedup_corpus"] = {"wall": w, "kept": kept, "dropped": n - kept}

        # --- incremental dedup: the wall should track the 10% new-day
        # increment, not the corpus (the store probe never re-shingles
        # history) — see _incremental_probe
        sec["dedup_incremental"] = _incremental_probe(spark, docs, n, w)
        w, ncomp = _timed(
            lambda: D.neardup_components(docs).groupBy("component_id").count()
        )
        sec["neardup_components"] = {"wall": w, "components": ncomp}

        # --- simhash: fingerprints + banded pairs
        w, _ = _timed(lambda: D.simhash_table(docs))
        wp, np_ = _timed(lambda: D.simhash_pairs(docs, max_hamming=3))
        # band-collision telemetry: 4 fixed 16-bit bands give the
        # hamming<=3 guarantee but candidate pairs grow ~N^2/65536
        # (birthday collisions at FIXED band width) — the honest scale
        # limit of 64-bit simhash banding; shard or widen beyond ~10^7
        # docs per band space (see BENCH/BASELINE.md).
        sht = D.simhash_table(docs)
        banded = sht.select(
            "id",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned("sh", 16 * b).bitwiseAND(
                            F.lit(0xFFFF)
                        )
                        for b in range(4)
                    ]
                )
            ).alias("band", "band_key"),
        )
        occ_sh = banded.groupBy("band", "band_key").agg(
            F.count("*").alias("m")
        )
        sec["simhash"] = {
            "wall_table": w,
            "wall_pairs": wp,
            "pairs": np_,
            "cand_pairs": _pair_sum(occ_sh, "m"),
        }
        # multi-index (3-of-6-block, ~32-bit keys) vs fixed 16-bit
        # bands: same exact hamming<=3 pair set, candidate count
        # should stay ~O(N) where fixed bands grow ~N^2/2^16
        mi_cand = _pair_sum(
            D.simhash_multi_index_keys(sht)
            .groupBy("table_id", "key")
            .agg(F.count("*").alias("m")),
            "m",
        )
        wmp, nmp = _timed(lambda: D.simhash_pairs_multi_index(docs))
        sec["simhash_multi_index"] = {
            "cand_pairs": mi_cand,
            "cand_pairs_per_doc": round(mi_cand / n, 4),
            "wall_pairs": wmp,
            "pairs": nmp,
        }

        # --- embedding near-dup LSH: default planes; at 10x ALSO the
        # log2(N)-sized index (n_planes 8 -> 11 for 10x vectors;
        # similarity.auto_n_planes would pick 12 — the sweep uses 11 to
        # isolate exactly +log2(scale_factor))
        sec["auto_n_planes"] = S.auto_n_planes(int(n * VEC_FRAC))
        for planes in (8,) if tag == "1x" else (8, 11):
            base = embs.select(
                F.col("vec_id").alias("id"), F.col("embedding").alias("v")
            )
            pl = S.hyperplane_signs(4 * planes, 64, 42)
            banded = base.select(
                "id",
                F.posexplode(
                    F.array(
                        *[
                            S.lsh_bucket("v", pl[b * planes : (b + 1) * planes])
                            for b in range(4)
                        ]
                    )
                ).alias("band", "bucket"),
            )
            occ = banded.groupBy("band", "bucket").agg(F.count("*").alias("m"))
            cand = _pair_sum(occ, "m")
            stats = occ.agg(
                F.count("*").alias("used_buckets"), F.max("m").alias("max_bucket")
            ).collect()[0]
            w, npairs = _timed(
                lambda: S.embedding_neardup_pairs(
                    embs, threshold=0.98, n_planes=planes
                )
            )
            sec[f"embedding_lsh_p{planes}"] = {
                "n_planes": planes,
                "cand_pairs": cand,
                "cand_pairs_per_vec": round(cand / int(n * VEC_FRAC), 3),
                "used_buckets": int(stats["used_buckets"]),
                "max_bucket": int(stats["max_bucket"]),
                "wall": w,
                "pairs": npairs,
            }
        # --- linear text-curation ops (round 4): the full Gopher gate
        # and host-scoped line dedup are single-scan/one-window shapes,
        # so per-decade wall growth should track N (~10x), not N^2.
        # Host fan-out ~100 docs/host mirrors a site-skewed crawl;
        # sep='.' gives multi-segment docs (the synthetic text has no
        # newlines).
        from tesseract_ocr_service_spark.functions import textstats as TX

        w, nkeep = _timed(
            lambda: docs.where(TX.gopher_keep(F.col("text")))
        )
        # kept=0 is EXPECTED on this corpus (docs are < 50 words with
        # < 2 distinct stopwords by construction — both hard Gopher
        # rejects); the measurement is the one-pass scan wall, and the
        # reason histogram proves the gate classifies, not shortcuts.
        reasons = {
            r["reason"]: r["count"]
            for r in docs.groupBy(
                TX.gopher_reason(
                    TX.gopher_signals(F.col("text"))
                ).alias("reason")
            )
            .count()
            .collect()
        }
        sec["gopher_filter"] = {"wall": w, "kept": nkeep, "reasons": reasons}
        hosts = docs.withColumn(
            "host",
            F.concat(
                F.lit("h"),
                (F.col("doc_id") % F.lit(max(1, n // 100))).cast("string"),
            ),
        )
        w, nrows = _timed(
            lambda: D.dedup_paragraphs(
                hosts, "doc_id", "text", sep=".", min_df=2,
                scope_col="host",
            )
        )
        sec["host_line_dedup"] = {"wall": w, "rows": nrows}

        # --- SemDeDup: codebook sized so clusters stay ~256 vectors
        # (cluster size IS the pair cap, so K scales with N and
        # cand_pairs_per_vec should hold ~flat); assignment via the
        # batched numpy-matmul path — the large-K shape (the unrolled
        # expression argmax is the small-K oracle path only)
        n_vec = int(n * VEC_FRAC)
        k_sem = max(8, n_vec // 256)
        cents = S.ivf_centroids(embs, n_lists=k_sem, iterations=0)
        occ_sem = S.assign_codebook_batched(embs, cents).groupBy(
            "list_id"
        ).agg(F.count("*").alias("m"))
        cand_sem = _pair_sum(occ_sem, "m")
        # assign='batched' EXPLICITLY: auto would pick expr at the 1x
        # tier (K=8 <= 32), and the 10x/1x wall ratio must compare one
        # implementation with itself, not expr vs batched
        w, nkeep = _timed(
            lambda: S.semantic_dedup(
                embs, cents, threshold=0.9, assign="batched"
            ).where("keep = 1")
        )
        sec["semantic_dedup"] = {
            "k": k_sem,
            "cand_pairs": cand_sem,
            "cand_pairs_per_vec": round(cand_sem / n_vec, 3),
            "wall": w,
            "kept": nkeep,
        }

        # --- hashed-model text ops (round 4): DSIR selection and the
        # bigram-LM perplexity cut. Both are two-tokenize-pass shapes
        # over a persisted per-doc feature table with broadcast-sized
        # models (B / B^2 rows), so wall should track N ~linearly; the
        # eager percentile/total actions run inside the constructor, so
        # the thunk times construction + action together (CLAUDE.md).
        w, nkeep = _timed(
            lambda: DS.dsir_importance(
                docs, target=F.col("doc_id") % 2 == 0
            ).where("keep = 1")
        )
        sec["dsir"] = {"wall": w, "kept": nkeep}
        w, nkeep = _timed(
            lambda: DS.perplexity_filter(docs).where("keep = 1")
        )
        sec["perplexity"] = {"wall": w, "kept": nkeep}

        out[tag] = sec

    # --- 100x tier (500k docs): the PRODUCTION dedup path only
    # (minhash sigs -> LSH banding -> verify -> composed dedup_corpus),
    # giving a three-point scaling series 5k -> 50k -> 500k where the
    # top tier is genuinely compute-dominated (fixed driver/plan cost
    # amortized). ngram/simhash exact-verify and embedding LSH stay at
    # the 10x tier: their telemetry already shows the quadratic terms
    # and the caps/sizing rules that bound them. SPARK_GRAFT_SF1_DEEP=0
    # skips (~2 min).
    if os.environ.get("SPARK_GRAFT_SF1_DEEP", "1") != "0":
        n = 100 * SCALES["1x"]
        d = f"{BASE}/n{n}_s{SEED}"
        if not os.path.exists(f"{d}/documents.parquet/_SUCCESS"):
            from tesseract_ocr_service_spark.sources import scale

            scale.write_documents(spark, f"{d}/documents.parquet", n, SEED)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        # size the shuffle to the data, as a real job would: the 500k-doc
        # tier explodes to ~25M shingle rows — 32 reduce partitions spill
        # (measured 84s vs 32s for dedup_corpus); AQE coalesces the extra
        # partitions away on the smaller stages.
        prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "128")
        try:
            out["100x"] = _deep_tier(spark, D, docs, n)
        finally:
            # bench.py swallows tier exceptions — the session conf must
            # not stay mutated for whatever runs next in this process
            spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    # wall + output ratios 10x/1x
    ratios: dict = {}
    for op, field in (
        ("ngram_jaccard", "wall"),
        ("minhash_lsh", "wall_verify"),
        ("dedup_corpus", "wall"),
        ("dedup_incremental", "wall"),
        ("neardup_components", "wall"),
        ("simhash", "wall_pairs"),
        ("simhash_multi_index", "wall_pairs"),
        ("gopher_filter", "wall"),
        ("host_line_dedup", "wall"),
        ("embedding_lsh_p8", "wall"),
        ("semantic_dedup", "wall"),
        ("dsir", "wall"),
        ("perplexity", "wall"),
    ):
        lo, hi = out["1x"][op][field], out["10x"][op][field]
        ratios[op] = round(hi / lo, 2) if lo else None
    ratios["minhash_lsh_cand_pairs"] = round(
        out["10x"]["minhash_lsh"]["cand_pairs"]
        / max(1, out["1x"]["minhash_lsh"]["cand_pairs"]),
        2,
    )
    out["wall_ratio_10x_over_1x"] = ratios
    if "100x" in out:
        out["wall_ratio_100x_over_10x"] = {
            "dedup_corpus": round(
                out["100x"]["dedup_corpus"]["wall"]
                / out["10x"]["dedup_corpus"]["wall"],
                2,
            ),
            "minhash_sigs": round(
                out["100x"]["minhash_lsh"]["wall_sigs"]
                / out["10x"]["minhash_lsh"]["wall_sigs"],
                2,
            ),
            "minhash_lsh_cand_pairs": round(
                out["100x"]["minhash_lsh"]["cand_pairs"]
                / max(1, out["10x"]["minhash_lsh"]["cand_pairs"]),
                2,
            ),
        }
    return out
