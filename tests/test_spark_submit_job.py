"""End-to-end spark-submit packaging test (north_rule: the job runs
via ``spark-submit --py-files dist/engine.zip`` on a cluster).

Runs the REAL spark-submit binary from a NEUTRAL working directory so
``tesseract_ocr_service_spark`` can resolve ONLY from the zip shipped
via --py-files — the exact mechanism executors on a real cluster use.
Pins: the zip is self-contained, the job banner prints, the
checkpointed run commits every warc_day, and a re-submit is a no-op
(idempotent resume)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.slow
def test_spark_submit_with_py_files_zip(spark, tmp_path):
    from tesseract_ocr_service_spark.sources import gen

    submit = _spark_submit()
    if submit is None:  # pragma: no cover - env guard
        pytest.skip("spark-submit not on PATH")

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    gen.write_pages(spark, pages, 60, seed=9, partitions=2)

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import package as pkg
    finally:
        sys.path.pop(0)
    zip_path = pkg.build(str(tmp_path / "engine.zip"))

    neutral = str(tmp_path / "cwd")
    os.makedirs(neutral)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source

    def submit_once() -> list[dict]:
        r = subprocess.run(
            [
                submit,
                "--master",
                "local[2]",
                "--py-files",
                zip_path,
                "--conf",
                "spark.ui.enabled=false",
                "--conf",
                "spark.sql.shuffle.partitions=4",
                os.path.join(REPO, "jobs", "extract.py"),
                "--pages",
                pages,
                "--out",
                out,
            ],
            capture_output=True,
            text=True,
            cwd=neutral,
            env=env,
            timeout=600,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return [
            json.loads(l)
            for l in r.stdout.splitlines()
            if l.startswith("{")
        ]

    lines = submit_once()
    banner = next(l["banner"] for l in lines if "banner" in l)
    assert banner["spark_version"] and banner["engine"]
    summary = next(l for l in lines if "n_docs" in l)
    assert summary["n_docs"] == 60
    assert len(summary["pending_days"]) > 0
    assert len(summary["skipped_days"]) == 0

    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == 60
    assert ext.select("url").distinct().count() == 60

    # idempotent resume: same submit again processes ZERO days
    lines2 = submit_once()
    summary2 = next(l for l in lines2 if "n_docs" in l)
    assert len(summary2["pending_days"]) == 0
    assert summary2["n_docs"] == 0
    assert spark.read.parquet(f"{out}/extracted").count() == 60
