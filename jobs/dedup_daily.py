#!/usr/bin/env python
"""Cluster job entrypoint: the DAILY incremental dedup run.

Dedup a new ingest partition against the historical corpus without
re-reading history: the store holds (id, fingerprint, sig) for every
prior exact-survivor (operators/incremental.py), so the day's job
shingles only the new documents and probes the store via band keys
recomputed from stored signatures.

    spark-submit --master <cluster> \\
        --py-files dist/engine.zip \\
        jobs/dedup_daily.py --docs s3://.../day=2026-02-01 \\
        --store s3://.../sigstore --out s3://.../kept/day=2026-02-01

First run (empty/missing store) behaves as the one-shot full dedup of
the batch. Each run appends the new exact-survivors' signatures to the
store LAST — crash before the append leaves the store unchanged and
the rerun reproduces identical output (dedup is deterministic), so the
overwrite of --out makes retries idempotent. PRECONDITION: ids must be
monotone across days (include the ingest day in the key).

Local smoke:

    python jobs/dedup_daily.py --docs /tmp/day1 --store /tmp/sigs \\
        --out /tmp/kept1 --master "local[8]"
"""

from __future__ import annotations

import argparse
import json
import sys

# plain `python jobs/<name>.py` local smoke: the script dir (jobs/) is
# on sys.path but the repo root is not; under spark-submit --py-files
# the zip already provides the package and this is a no-op
import os as _os

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="new-day documents parquet")
    p.add_argument("--store", required=True, help="signature store root")
    p.add_argument("--out", required=True, help="kept-docs output parquet")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--minhash-k", type=int, default=16)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument(
        "--no-broadcast-new",
        action="store_true",
        help="shuffle join instead of broadcasting the increment "
        "(when a backfill rivals the store in size)",
    )
    p.add_argument("--master", default=None, help="override (local runs)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from tesseract_ocr_service_spark.operators import incremental as I
    from tesseract_ocr_service_spark.operators.extract import session_builder

    # only stop a session this job itself created — an embedding caller
    # (tests, a notebook driving several jobs) keeps its session
    owns_session = SparkSession.getActiveSession() is None
    spark = session_builder(
        app="dedup-daily", master=args.master
    ).getOrCreate()
    docs = spark.read.parquet(args.docs)
    # EXPLICIT existence probe, not a swallowed read error: a transient
    # FS failure mistaken for "no history" would dedup against nothing
    # and append duplicate signatures, permanently breaking the store's
    # all-historical-exact-survivors invariant. Only a genuinely
    # missing/empty store bootstraps; any other read error propagates.
    jvm, hconf = spark._jvm, spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(args.store)
    store = None
    if p.getFileSystem(hconf).exists(p):
        from pyspark.errors import AnalysisException

        try:
            store = I.read_signature_store(spark, args.store)
        except AnalysisException as e:
            # a dir with no data files (crash debris) is "no history";
            # any other analysis error is real and must propagate
            if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                raise
    kept, inc = I.dedup_incremental(
        docs,
        store,
        id_col=args.id_col,
        text_col=args.text_col,
        k=args.minhash_k,
        bands=args.bands,
        threshold=args.threshold,
        broadcast_new=not args.no_broadcast_new,
    )
    kept.write.mode("overwrite").parquet(args.out)
    n_kept = spark.read.parquet(args.out).count()
    # count BEFORE the append: writing to the store path invalidates
    # any cached plan that READS that path (Spark recache-by-path), so
    # a post-append re-evaluation of `inc` would see its own freshly
    # appended signatures and anti-join itself to zero.
    n_inc = inc.count()
    # append the store marker LAST (see module docstring: retry safety)
    I.append_signatures(inc, args.store)
    inc.unpersist()
    print(
        json.dumps(
            {
                "n_in": docs.count(),
                "n_kept": n_kept,
                "n_sig_appended": n_inc,
                "had_history": store is not None,
            }
        )
    )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
