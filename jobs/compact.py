#!/usr/bin/env python
"""Cluster job entrypoint: compact a small-file parquet dataset.

Rewrites a (possibly hive-partitioned) parquet dataset to ~target-size
files per partition directory, preserving the partition layout so
downstream partition pruning is untouched (plans/compact.py). Output
goes to a NEW root; swapping it in is the caller's atomic rename /
metastore repoint — this job never rewrites in place.

    spark-submit --master <cluster> --py-files dist/engine.zip \\
        jobs/compact.py --in s3://.../extracted --out s3://.../compacted \\
        --id-col url --target-mb 512 --sort-by url

Local smoke:

    python jobs/compact.py --in /tmp/frag --out /tmp/tidy \\
        --id-col doc_id --target-mb 1 --master "local[8]"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain `python jobs/compact.py` local smoke: the script dir (jobs/) is
# on sys.path but the repo root is not; under spark-submit --py-files
# the zip already provides the package and this is a no-op
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in", dest="in_root", required=True)
    p.add_argument("--out", dest="out_root", required=True)
    p.add_argument(
        "--id-col", required=True,
        help="stable id column; file placement is a pure function of it",
    )
    p.add_argument("--target-mb", type=int, default=512)
    p.add_argument(
        "--sort-by", default=None,
        help="comma-separated columns to cluster rows by within files",
    )
    p.add_argument("--master", default=None, help="override (local runs)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from tesseract_ocr_service_spark.operators.extract import session_builder
    from tesseract_ocr_service_spark.plans import compact as C

    owns_session = SparkSession.getActiveSession() is None
    spark = session_builder(app="compact", master=args.master).getOrCreate()
    layout = C.compact(
        spark,
        args.in_root,
        args.out_root,
        id_col=args.id_col,
        target_bytes=args.target_mb * 1024 * 1024,
        sort_within=args.sort_by.split(",") if args.sort_by else None,
    )
    print(
        json.dumps(
            {
                "n_partitions": layout.n_partitions,
                "n_files_in": layout.n_files_in,
                "bytes_in": layout.bytes_in,
                "n_files_target": layout.n_files_target,
            }
        )
    )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
