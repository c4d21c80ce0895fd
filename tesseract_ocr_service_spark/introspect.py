"""Job-level introspection: the batch analog of the reference's
``GET /health`` endpoint (ocr/main.py:63-101), which echoes service
status, engine version, and the effective OCR configuration per
request. A batch job has no endpoint, so the same information is a
BANNER dict emitted once at job start (and printed as one JSON line by
jobs/extract.py): engine + Spark versions, master, the effective
scale-relevant Spark conf, and every extraction-config knob — enough
to reconstruct "what exactly ran" from the job log alone.
"""

from __future__ import annotations

from dataclasses import asdict
from typing import Any

from pyspark.sql import SparkSession

from . import __version__
from .config import ExtractConfig

#: scale-relevant conf keys echoed in the banner (the reference echoes
#: its OCR env knobs, ocr/main.py:78-98; these are our analog knobs).
_CONF_KEYS = (
    "spark.master",
    "spark.sql.adaptive.enabled",
    "spark.sql.shuffle.partitions",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.files.maxPartitionBytes",
    "spark.local.dir",
)


def job_banner(spark: SparkSession, cfg: ExtractConfig) -> dict[str, Any]:
    """-> {engine_version, spark_version, master, conf{...}, config{...},
    lang_string}. Pure metadata — no jobs are triggered."""
    sc = spark.sparkContext
    conf = {}
    for k in _CONF_KEYS:
        try:
            conf[k] = spark.conf.get(k)
        except Exception:
            conf[k] = None
    return {
        "status": "ok",
        "engine": "tesseract_ocr_service_spark",
        "engine_version": __version__,
        "spark_version": spark.version,
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "conf": conf,
        "config": asdict(cfg),
        "lang_string": cfg.lang_string,
    }
