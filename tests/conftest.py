from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from tesseract_ocr_service_spark.operators.extract import session_builder

    s = (
        session_builder(app="tests", master="local[4]", shuffle_partitions=8)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()
