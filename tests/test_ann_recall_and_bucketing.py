"""ANN approximation quality (recall vs brute force) + bucketed joins."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tesseract_ocr_service_spark.operators import extract as X
from tesseract_ocr_service_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _recall(approx_rows, brute_rows) -> float:
    a = {r["vec_id"] for r in approx_rows}
    b = {r["vec_id"] for r in brute_rows}
    return len(a & b) / len(b)


def test_lsh_recall_at_10(emb):
    """Average recall@10 of sign-LSH (8 planes, single probe) over 10
    query vectors — documents the approximation trade-off; a floor
    guards against silent bucket-hash regressions."""
    queries = emb.where(F.col("vec_id") < 10).collect()
    recalls = []
    for q in queries:
        qv = list(q["embedding"])
        brute = S.cosine_topk(emb, qv, k=10).collect()
        # 4 planes -> 16 buckets over 500 vecs (~30 members/bucket):
        # the right bucket width for this corpus size; 8 planes would
        # leave ~2-member buckets and recall collapses to self-only.
        approx = S.ann_topk_lsh(emb, qv, k=10, n_planes=4).collect()
        recalls.append(_recall(approx, brute))
    avg = sum(recalls) / len(recalls)
    # the query itself must always be found, plus some neighbor overlap.
    # NB: uniformly random 64-dim embeddings are the worst case for any
    # LSH (no cluster structure, all cosines near 0) — the floor here
    # guards against regressions, not a production recall target.
    assert all(r > 0 for r in recalls)
    assert avg >= 0.15, recalls


def test_ivf_recall_beats_single_probe_lsh(emb):
    """IVF with n_probe=2 of 8 lists should recall most of the true
    top-10 (coarser cells than LSH -> higher recall per probe)."""
    cents = S.ivf_centroids(emb, n_lists=8, iterations=1)
    queries = emb.where(F.col("vec_id") < 10).collect()
    recalls = []
    for q in queries:
        qv = list(q["embedding"])
        brute = S.cosine_topk(emb, qv, k=10).collect()
        approx = S.ann_topk_ivf(emb, qv, cents, k=10, n_probe=2).collect()
        recalls.append(_recall(approx, brute))
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_index_prunes_partitions_and_matches_inline(emb, spark, tmp_path):
    """The materialized IVF index must (a) return exactly what the
    inline-assignment search returns and (b) plan the probe as a
    partition-pruned scan (PartitionFilters on list_id — only the
    probed list directories are read)."""
    cents = S.ivf_centroids(emb, n_lists=8, iterations=0)
    path = str(tmp_path / "ivf_index")
    S.build_ivf_index(emb, cents, path)
    q = emb.where(F.col("vec_id") == 3).collect()[0]
    qv = list(q["embedding"])
    indexed = S.ann_topk_ivf_indexed(spark, path, qv, cents, k=10, n_probe=2)
    inline = S.ann_topk_ivf(emb, qv, cents, k=10, n_probe=2).collect()
    assert [(r["vec_id"], r["sim"]) for r in indexed.collect()] == [
        (r["vec_id"], r["sim"]) for r in inline
    ]
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan, plan
    # the probed read must touch only the 2 probed lists
    probed = S.probe_lists(qv, cents, 2)
    scanned = (
        spark.read.parquet(path)
        .where(F.col("list_id").isin(probed))
        .select("list_id")
        .distinct()
        .collect()
    )
    assert {r["list_id"] for r in scanned} == set(probed)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy co-location: equi-join of two tables bucketed on the
    same key plans with ZERO Exchange nodes."""
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # which is gitignored; dropped at the end of the test)
    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    rnd = random.Random(1)
    rows = [(f"u{i}", rnd.randint(0, 99)) for i in range(2000)]
    a = spark.createDataFrame(rows, ["url", "x"])
    b = spark.createDataFrame(rows, ["url", "y"])
    X.write_bucketed(a, "bkt_a", n_buckets=8, key="url")
    X.write_bucketed(b, "bkt_b", n_buckets=8, key="url")
    ta = spark.table("bkt_a")
    tb = spark.table("bkt_b")
    # tiny test tables would otherwise be broadcast (which bypasses
    # bucketing entirely); disable it to expose the co-located plan —
    # at 10^12 rows neither side broadcasts and this IS the plan.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 2000
        # and a groupBy on the bucket key also avoids the shuffle
        agg = ta.groupBy("url").agg(F.sum("x").alias("sx"))
        plan2 = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE bkt_a")
        spark.sql("DROP TABLE bkt_b")


def test_auto_n_planes_resolves_to_oracle_constant_at_driver_scales():
    """embedding_neardups_auto's oracle pins n_planes=8 on the claim
    that auto_n_planes(N) == 8 for every N <= 8 * 2^8 — pin the claim
    for the driver corpora sizes AND the boundary, and that the
    growing branch actually grows past it."""
    from tesseract_ocr_service_spark.operators import similarity as S

    for n in (20, 200, 2000, 2048):
        assert S.auto_n_planes(n) == 8, n
    assert S.auto_n_planes(4096) == 9
    assert S.auto_n_planes(20000) == 12


def test_batched_banding_matches_expr_path(emb):
    """lsh_buckets_batched (numpy matmul per Arrow batch — the
    large-plane-count scale path) must produce the SAME (id, band,
    bucket) rows as the JVM expression banding. Sign bits can only
    diverge when a dot product sits within float-summation noise of
    exactly 0 (different summation order) — never observed on real
    embeddings; this pins it for the driver corpus."""
    planes = S.hyperplane_signs(4 * 6, 64)
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    via_expr = base.select(
        "id",
        F.posexplode(
            F.array(
                *[S.lsh_bucket("v", planes[b * 6 : (b + 1) * 6]) for b in range(4)]
            )
        ).alias("band", "bucket"),
    )
    via_np = S.lsh_buckets_batched(base, planes, bands=4)
    a = {(r["id"], r["band"], r["bucket"]) for r in via_expr.collect()}
    b = {(r["id"], r["band"], r["bucket"]) for r in via_np.collect()}
    assert a == b and len(a) == emb.count() * 4


def test_neardup_pairs_batched_banding_matches_expr(emb):
    """embedding_neardup_pairs(banding='batched') end-to-end equals the
    expression path (same candidates -> same verified pairs), and an
    unknown mode raises."""
    kw = dict(threshold=0.3, n_planes=6, bands=4, dim=64)
    ex = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in S.embedding_neardup_pairs(emb, banding="expr", **kw).collect()
    }
    ba = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in S.embedding_neardup_pairs(emb, banding="batched", **kw).collect()
    }
    assert ex == ba and len(ex) > 0
    with pytest.raises(ValueError):
        S.embedding_neardup_pairs(emb, banding="matmul")
