"""Cross-engine NULL/empty-text parity for the shingle-based oracles.

The generated testdata has no NULL/empty text, which masked a latent
divergence: Spark's shingle_rows coalesces NULL to one '' shingle while
an uncoalesced DuckDB [NULL] list silently drops the document. This
test pins the documented ''-shingle semantics on BOTH engines over a
corpus that actually contains NULL, empty, and sub-n-token documents.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tesseract_ocr_service_spark.operators import queries as Q

ROWS = [
    (0, None),
    (1, ""),
    (2, "one"),
    (3, "two tokens"),
    (4, "alpha beta gamma delta"),
    (5, "alpha beta gamma delta"),  # exact dup of 4
    (6, "  Alpha   beta GAMMA delta  "),  # normalized dup of 4
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulltext")
    pd.DataFrame(ROWS, columns=["doc_id", "text"]).to_parquet(
        d / "documents.parquet"
    )
    return str(d)


@pytest.fixture(scope="module")
def ddb(corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/documents.parquet')"
    )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        else:
            df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_sig", "dedup_ngram_jaccard", "dedup_exact_groups"],
)
def test_null_text_docs_survive_on_both_engines(spark, ddb, corpus_dir, name):
    got = Q.SPARK_QUERIES[name](spark, corpus_dir).toPandas()
    exp = ddb.execute(Q.ORACLES[name]).df()
    if name == "dedup_minhash_sig":
        # every document — including NULL-text — must keep a signature
        assert len(got) == len(ROWS)
    assert len(got) == len(exp), f"{name}: {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exp), check_dtype=False, obj=name
    )
