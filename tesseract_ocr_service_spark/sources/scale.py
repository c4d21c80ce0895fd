"""Deterministic SCALED synthetic corpora for the dedup/similarity
scale-evidence bench (sf0.1-shape -> sf1-shape, 10x).

The driver's /root/testdata tables stop at sf0.1 (5k documents, 2k
embeddings); the 100-TB argument needs the same operators measured at
10x that with candidate-pair telemetry (VERDICT r2 "Next round" #1).
These generators synthesise `documents`/`embeddings`-shaped tables at
ANY row count, deterministically — every row is a pure function of
``(seed, id)``, so generation distributes over ``spark.range`` with no
cross-row dependencies and two runs at different parallelism produce
byte-identical tables.

Distribution design (what makes the 1x->10x comparison honest):

- **Token mix = steep-zipf head + per-doc unique tail.** Real web text
  has a stopword head whose shingle doc-frequency grows LINEARLY with
  corpus size (a fixed phrase appears in a fixed fraction of pages) and
  a long tail of effectively-unique shingles (text diversity grows with
  the corpus — the property shingle-based near-dup detection relies
  on). A fixed small vocabulary (like the driver's sf tables) models
  only the head: every shingle's df grows ~N and the exact-verify join
  goes quadratic BY CONSTRUCTION of the data, not the algorithm. Here
  ~30% of tokens come from a 40-word zipf head (hot shingles exist and
  the hot_shingle_cap has something real to do) and ~70% are drawn from
  a space proportional to N (df stays O(1) as N grows).
- **Planted near-dup clusters with bounded neighborhoods.** Each doc is
  a near-dup of an earlier BASE doc with probability ``dup_rate``
  (templates picked within the previous ``neighborhood`` ids, walking
  back to a base doc so clusters anchor on real text). Near-dups
  replace 1-2 words (3-gram jaccard ~0.78-0.88 at ~50 words, above the
  0.7 minhash verify threshold); a smaller fraction are exact dups.
  Expected pairs therefore scale LINEARLY with N — a flat pairs/doc
  ratio across 1x->10x is the signal the operators preserve it.
- **Embeddings**: 10 gaussian label clusters (matches the driver's
  shape, dim 64) plus planted near-identical vectors (cosine ~0.999)
  at ``dup_rate``, same bounded-neighborhood rule.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

N_LABELS = 10
DIM = 64
HEAD_VOCAB = (
    "the data page query stream table row column value merge group sort "
    "join scan filter window batch spark vector hash big fast line word "
    "block text crawl corpus index shard cache store fetch parse token "
    "frame byte list map set"
).split()
assert len(HEAD_VOCAB) == 40
LANGS = ["rus", "eng", "es", "zh", "de"]


def _rnd(seed: int, stream: int, i: int) -> random.Random:
    """Independent deterministic RNG per (seed, stream, id) — splitmix64
    finalizer over the packed key (same recipe as sources/gen._rnd)."""
    z = (
        seed * 0x9E3779B97F4A7C15
        + stream * 0xD1B54A32D192ED03
        + i * 0xBF58476D1CE4E5B9
    ) & (2**64 - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return random.Random(z ^ (z >> 31))


# --------------------------------------------------------------- documents


def _zipf_head(r: random.Random) -> str:
    # steep zipf over the 40-word head: p(rank) ~ 1/(rank+1)
    w = [1.0 / (k + 1) for k in range(len(HEAD_VOCAB))]
    # r.choices is O(n) per call; precompute cumulative once per doc is
    # overkill at 50 words — keep it simple, generation is one-time.
    return r.choices(HEAD_VOCAB, weights=w, k=1)[0]


def _base_words(seed: int, doc_id: int, n_docs: int) -> list[str]:
    """The base (template) text of ``doc_id`` — defined for EVERY id
    regardless of whether that id ends up emitted as a dup."""
    r = _rnd(seed, 1, doc_id)
    n = max(8, int(math.exp(r.gauss(math.log(50), 0.35))))
    tail_space = max(1000, n_docs * 8)  # diversity grows with the corpus
    words = []
    for _ in range(n):
        if r.random() < 0.30:
            words.append(_zipf_head(r))
        else:
            words.append(f"w{r.randrange(tail_space)}")
    return words


def _is_dup(seed: int, doc_id: int, dup_rate: float) -> bool:
    return _rnd(seed, 2, doc_id).random() < dup_rate


def _doc_text(
    seed: int, doc_id: int, n_docs: int, dup_rate: float, neighborhood: int
) -> str:
    """Pure text function. Dups copy the BASE text of an earlier base
    doc (walking past dup templates keeps clusters anchored on text
    that is actually emitted), then mutate 0-2 words."""
    if doc_id == 0 or not _is_dup(seed, doc_id, dup_rate):
        return " ".join(_base_words(seed, doc_id, n_docs))
    r = _rnd(seed, 3, doc_id)
    t = max(0, doc_id - 1 - r.randrange(neighborhood))
    while t > 0 and _is_dup(seed, t, dup_rate):
        t -= 1
    words = _base_words(seed, t, n_docs)
    n_mut = r.choice([0, 1, 1, 2])  # 25% exact dups, else 1-2 word edits
    for _ in range(n_mut):
        words[r.randrange(len(words))] = f"m{r.randrange(10**9)}"
    return " ".join(words)


def gen_documents_pdf(
    ids: "pd.Series", seed: int, n_docs: int, dup_rate: float, neighborhood: int
) -> pd.DataFrame:
    texts, langs, sources = [], [], []
    for i in ids:
        i = int(i)
        texts.append(_doc_text(seed, i, n_docs, dup_rate, neighborhood))
        r = _rnd(seed, 4, i)
        langs.append(LANGS[r.randrange(len(LANGS))])
        sources.append(f"src{r.randrange(20)}")
    return pd.DataFrame(
        {
            "doc_id": ids.astype("int64"),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": [len(t) for t in texts],
        }
    )


def write_documents(
    spark,
    path: str,
    n_docs: int,
    seed: int = 11,
    dup_rate: float = 0.05,
    neighborhood: int = 50,
    partitions: int = 32,
) -> None:
    """documents-shaped table: (doc_id, text, lang, source, n_chars)."""
    from pyspark.sql import functions as F  # noqa: F401

    def gen(batches):
        for pdf in batches:
            yield gen_documents_pdf(
                pdf["id"], seed, n_docs, dup_rate, neighborhood
            )

    (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(
            gen,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .write.mode("overwrite")
        .parquet(path)
    )


# -------------------------------------------------------------- embeddings


def _centroid(seed: int, label: int) -> np.ndarray:
    rs = np.random.RandomState(_rnd(seed, 5, label).randrange(2**31))
    c = rs.normal(0.0, 1.0, DIM)
    return c / np.linalg.norm(c)


def _base_vec(seed: int, vec_id: int, cents: np.ndarray) -> np.ndarray:
    rs = np.random.RandomState(_rnd(seed, 6, vec_id).randrange(2**31))
    return cents[vec_id % N_LABELS] + rs.normal(0.0, 0.35, DIM)


def gen_embeddings_pdf(
    ids: "pd.Series", seed: int, dup_rate: float, neighborhood: int
) -> pd.DataFrame:
    cents = np.stack([_centroid(seed, l) for l in range(N_LABELS)])
    vecs, labels = [], []
    for i in ids:
        i = int(i)
        r = _rnd(seed, 7, i)
        if i > 0 and r.random() < dup_rate:
            t = max(0, i - 1 - r.randrange(neighborhood))
            rs = np.random.RandomState(r.randrange(2**31))
            v = _base_vec(seed, t, cents) + rs.normal(0.0, 0.004, DIM)
            labels.append(t % N_LABELS)
        else:
            v = _base_vec(seed, i, cents)
            labels.append(i % N_LABELS)
        vecs.append(v.astype("float32").tolist())
    return pd.DataFrame(
        {
            "vec_id": ids.astype("int64"),
            "embedding": vecs,
            "label": pd.array(labels, dtype="int32"),
        }
    )


def write_embeddings(
    spark,
    path: str,
    n_vecs: int,
    seed: int = 11,
    dup_rate: float = 0.05,
    neighborhood: int = 25,
    partitions: int = 32,
) -> None:
    """embeddings-shaped table: (vec_id, embedding array<float>, label)."""

    def gen(batches):
        for pdf in batches:
            yield gen_embeddings_pdf(pdf["id"], seed, dup_rate, neighborhood)

    (
        spark.range(0, n_vecs, 1, partitions)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_scaled_corpus(
    spark, base_dir: str, n_docs: int, n_vecs: int, seed: int = 11
) -> dict[str, str]:
    """Both tables under ``base_dir`` -> {'documents': path, 'embeddings':
    path}. Ratio n_vecs = 0.4 * n_docs matches the driver's sf tables."""
    paths = {
        "documents": f"{base_dir}/documents.parquet",
        "embeddings": f"{base_dir}/embeddings.parquet",
    }
    write_documents(spark, paths["documents"], n_docs, seed)
    write_embeddings(spark, paths["embeddings"], n_vecs, seed)
    return paths
