"""Shared Spark fixture. One local session per test run (JVM spin-up is
~10 s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from wistia_etl_pipeline_spark.session import get_spark

    spark = get_spark("wistia-etl-pipeline-spark-tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
