#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

    {"metric": "extract_wall_sec", "value": <sec>, "unit": "sec",
     "queries": {<name>: sec, ...}, "sf": <sf>,
     "docs_per_sec": ..., "scaling": {...}}

Components:
1. flagship extraction (full fused kernel incl. spans) over a cached
   deterministic synthetic corpus, at local[$SPARK_GRAFT_CPUS] — the
   headline docs/sec number vs the reference's ~0.35 docs/s
   (README.md:74: 8,500 ms for a 3-page PDF on 8 CPUs).
2. every __spark_entry__.queries() entry at $SPARK_GRAFT_SF_DIR.
3. scaling evidence (north_rule: throughput efficiency >= 0.8 from N to
   4N executors): the same extraction at local[2] vs local[8] in fresh
   subprocesses — chosen so BOTH runs have physical cores to spare on
   this 32-core box (each simulated "executor" brings its own core, as
   on a real cluster); the saturated local[8]->local[32] pair is also
   reported for transparency but measures box saturation, not job
   scalability. Skip with SPARK_GRAFT_SCALING=0.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (default 30000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "30000"))
SEED = 5
CORPUS = f"/tmp/spark_graft_bench/pages_{BENCH_DOCS}_{SEED}"


def _session(master: str, shuffle: int):
    from tesseract_ocr_service_spark.operators.extract import session_builder

    return (
        session_builder(app="bench", master=master, shuffle_partitions=shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _ensure_corpus(spark) -> None:
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        return
    from tesseract_ocr_service_spark.sources import gen

    gen.write_pages(spark, CORPUS, BENCH_DOCS, seed=SEED, partitions=64)


def _extract_wall(spark, repeats: int = 2) -> float:
    """Wall seconds for the full extraction: warm once, then best-of-N
    (min wall) — robust against transient background load.

    Runs with the scale configuration: explicit xxhash64(url) salting at
    a FIXED fine granularity (128 tasks) — the corpus has genuinely
    heavy-tailed page sizes, and the unsalted narrow plan stalls on
    byte-skewed input splits (measured 3.3x slower at 30k docs), while
    cores-proportional salting is too coarse at low parallelism
    (stragglers in the last wave). Fine fixed granularity is also the
    real-cluster shape: task count tracks data, not cluster size."""
    from tesseract_ocr_service_spark.operators import extract as X

    salt = int(os.environ.get("SPARK_GRAFT_SALT", "128"))
    df = X.extract(X.read_pages(spark, CORPUS), salt_partitions=salt)
    df.write.format("noop").mode("overwrite").save()  # warm JVM/py workers
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def child(master: str) -> None:
    spark = _session(master, max(2, int(master.strip("local[]"))))
    _ensure_corpus(spark)
    wall = _extract_wall(spark)
    spark.stop()
    print(json.dumps({"wall_sec": wall, "docs_per_sec": BENCH_DOCS / wall}))


def _run_child(master: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", master],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    spark = _session(f"local[{CPUS}]", CPUS)
    _ensure_corpus(spark)

    # 1. headline extraction
    wall = _extract_wall(spark)

    # 2. per-query timings at the sf dir
    qtimes: dict[str, float] = {}
    for name, q in em.queries().items():
        df = q(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    spark.stop()

    # 3. scaling evidence in fresh subprocesses. The 2/8 pair runs
    # INTERLEAVED twice (best per config): this box shows bursty
    # hypervisor CPU steal lasting minutes, so a single child can land
    # entirely inside a burst and skew the ratio; alternating runs give
    # both configs the same exposure and best-of picks the clean ones.
    scaling = {}
    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        lo = mid = 0.0
        for _ in range(2):  # alternate 2,8,2,8
            lo = max(lo, _run_child("local[2]")["docs_per_sec"])
            mid = max(mid, _run_child("local[8]")["docs_per_sec"])
        hi = _run_child("local[32]")["docs_per_sec"]
        scaling = {
            "docs_per_sec_local2": round(lo, 1),
            "docs_per_sec_local8": round(mid, 1),
            "docs_per_sec_local32": round(hi, 1),
            "efficiency_2_to_8": round(mid / (4 * lo), 3),
            "efficiency_8_to_32_saturated_box": round(hi / (4 * mid), 3),
        }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "extract_wall_sec",
                "value": round(wall, 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "bench_docs": BENCH_DOCS,
                "docs_per_sec": round(BENCH_DOCS / wall, 1),
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sys.path.insert(0, REPO)
        child(sys.argv[2])
    else:
        main()
