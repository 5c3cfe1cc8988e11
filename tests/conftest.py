"""Shared fixtures: one SparkSession per test session (local mode)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from deepseek_ocr_omnidocbench_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield spark
    spark.stop()
