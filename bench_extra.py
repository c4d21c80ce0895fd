#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1). NOT the frozen
bench.py: this file exists so per-query isolation runs, steal fractions
and plan captures can be produced without touching the driver's timing
contract.

Usage:
    python bench_extra.py time [query ...]      # per-query walls + steal
    python bench_extra.py plan [query ...]      # explain("formatted") dumps
    python bench_extra.py both [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measured scale), SPARK_GRAFT_CPUS (default 32),
BENCH_EXTRA_OUT (default BENCH/queries_r06_<tag>.json),
BENCH_EXTRA_PLANDIR (default plans/r06).

Methodology matches the frozen bench.py exactly (warm pass, then
best-of-2 noop-sink writes, constructor inside the timed window) plus a
per-query steal fraction from /proc/stat so a polluted wall is visible
in the artifact instead of masquerading as a regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from tesseract_ocr_service_spark.operators.extract import session_builder

    arrow = int(os.environ.get("SPARK_GRAFT_ARROW", "256"))
    return (
        session_builder(
            app="bench_extra",
            master=f"local[{CPUS}]",
            shuffle_partitions=CPUS,
            arrow_batch_rows=arrow,
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _cpu_stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:9]))
    return sum(v) - v[3], v[7]


def time_queries(spark, names: list[str]) -> dict:
    import __spark_entry__ as em

    qs = em.queries()
    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")

        def run_once():
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        t0 = time.perf_counter()
        run_once()  # warm
        warm = time.perf_counter() - t0
        best, worst, steal_best = float("inf"), 0.0, 0.0
        for _ in range(2):
            b0, s0 = _cpu_stat()
            t0 = time.perf_counter()
            run_once()
            wall = time.perf_counter() - t0
            b1, s1 = _cpu_stat()
            st = (s1 - s0) / max(1, b1 - b0)
            if wall < best:
                best, steal_best = wall, st
            worst = max(worst, wall)
        out[name] = {
            "best": round(best, 3),
            "worst": round(worst, 3),
            "warm": round(warm, 3),
            "steal": round(steal_best, 4),
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    return out


def hash_queries(spark, names: list[str]) -> dict:
    """Order-insensitive full-content fingerprint per query:
    (row count, XOR of xxhash64(to_json(struct(*)))) — any bit-level
    change in any value (incl. double formatting) changes the hash.
    Used to prove optimizations result-identical at sf1.0, which is
    stricter than the driver's 4dp-rounded oracle compare."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    qs = em.queries()
    out: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        r = df.select(
            F.xxhash64(F.to_json(F.struct(*df.columns))).alias("h")
        ).agg(F.count("*").alias("n"), F.bit_xor("h").alias("x")).collect()[0]
        out[name] = {"n": int(r["n"] or 0), "xor": int(r["x"] or 0)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def dump_plans(spark, names: list[str], tag: str) -> None:
    import __spark_entry__ as em

    plandir = os.environ.get("BENCH_EXTRA_PLANDIR", f"{REPO}/plans/r06")
    os.makedirs(plandir, exist_ok=True)
    qs = em.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{plandir}/{name}_{tag}.txt", "w") as f:
            f.write(txt)
        print(f"plan -> {plandir}/{name}_{tag}.txt", flush=True)


def main() -> None:
    sys.path.insert(0, REPO)
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    tag = os.environ.get("BENCH_EXTRA_TAG", "before")

    import __spark_entry__ as em

    all_names = list(em.queries().keys())
    if not names:
        names = all_names
    else:
        unknown = [n for n in names if n not in all_names]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    spark = _session()
    try:
        if mode == "hash":
            res = hash_queries(spark, names)
            out = os.environ.get(
                "BENCH_EXTRA_OUT", f"{REPO}/BENCH/hashes_r06_{tag}.json"
            )
            prev = {}
            if os.path.exists(out):
                with open(out) as f:
                    prev = json.load(f).get("queries", {})
            prev.update(res)
            with open(out, "w") as f:
                json.dump({"sf_dir": SF_DIR, "queries": prev}, f, indent=1)
            print(f"wrote {out}", flush=True)
        if mode in ("plan", "both"):
            dump_plans(spark, names, tag)
        if mode in ("time", "both"):
            res = time_queries(spark, names)
            out = os.environ.get(
                "BENCH_EXTRA_OUT", f"{REPO}/BENCH/queries_r06_{tag}.json"
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                json.dump(
                    {"sf_dir": SF_DIR, "cpus": CPUS, "queries": res},
                    f,
                    indent=1,
                )
            print(f"wrote {out}", flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
