"""JSONL training export (jobs/export_jsonl.py): shard layout,
round-trip fidelity, manifest digests, rerun byte-stability."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

import jobs.export_jsonl as J


@pytest.fixture()
def corpus(spark, tmp_path):
    root = str(tmp_path / "corpus")
    spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the text of doc "), F.col("id").cast("string"))
        .alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("ru").alias("lang"),
    ).write.parquet(root)
    return root


def _shard_files(out: str) -> dict[int, list[str]]:
    by = {}
    for p in glob.glob(os.path.join(out, "data", "shard=*", "*")):
        base = os.path.basename(p)
        if base.startswith(("_", ".")) or base.endswith(".crc"):
            continue
        s = int(p.split("shard=")[1].split("/")[0])
        by.setdefault(s, []).append(p)
    return by


def test_export_roundtrip_and_manifest(spark, corpus, tmp_path, capsys):
    out = str(tmp_path / "export")
    rc = J.main(["--in", corpus, "--out", out, "--shards", "8",
                 "--id-col", "doc_id"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 900

    # exactly ONE gzipped file per shard directory
    by_shard = _shard_files(out)
    assert len(by_shard) == 8
    assert all(len(v) == 1 for v in by_shard.values()), by_shard
    assert all(v[0].endswith(".gz") for v in by_shard.values())

    # round trip: spark.read.json recovers every row and column
    back = spark.read.json(f"{out}/data")
    assert back.count() == 900
    src = spark.read.parquet(corpus)
    assert (
        back.select("doc_id", "text", "lang")
        .exceptAll(src.select("doc_id", "text", "lang"))
        .count()
        == 0
    )

    # manifest digests match an independent recompute from the export
    man = {
        r["shard"]: r
        for r in spark.read.parquet(f"{out}/_manifest").collect()
    }
    re = {
        r["shard"]: r
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("bit_xor(xxhash64(cast(doc_id as string)))").alias(
                "id_digest"
            ),
        )
        .collect()
    }
    assert set(man) == set(re)
    for s in man:
        assert man[s]["n_docs"] == re[s]["n_docs"]
        assert man[s]["id_digest"] == re[s]["id_digest"]
    assert sum(r["n_tokens"] for r in man.values()) == 900 * 5


def test_export_rerun_is_line_identical(spark, corpus, tmp_path):
    out1 = str(tmp_path / "e1")
    out2 = str(tmp_path / "e2")
    for out in (out1, out2):
        assert J.main(["--in", corpus, "--out", out, "--shards", "4",
                       "--id-col", "doc_id"]) == 0

    def lines(out):
        got = {}
        for s, files in _shard_files(out).items():
            with gzip.open(files[0], "rt") as f:
                got[s] = f.read().splitlines()
        return got

    a, b = lines(out1), lines(out2)
    assert a == b  # same shard -> same docs in the same order
    assert sum(len(v) for v in a.values()) == 900


def test_export_column_selection(spark, corpus, tmp_path):
    out = str(tmp_path / "cols")
    assert J.main(["--in", corpus, "--out", out, "--shards", "2",
                   "--id-col", "doc_id", "--columns", "doc_id,text"]) == 0
    back = spark.read.json(f"{out}/data")
    assert set(back.columns) == {"doc_id", "text", "shard"}
