from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from kafka_streams_homework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    return s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def ts(minute: int, second: int = 0) -> dt.datetime:
    """Deterministic event time inside 2024-01-01 00:<minute>:<second>."""
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture()
def purchases_schema() -> str:
    # Purchase: id long, quantity long, productid long (+ event ts)
    # — TestUtils.java:7-13
    return "id long, quantity long, productid long, ts timestamp"


@pytest.fixture()
def products_schema() -> str:
    # Product: id long, name string, description string, price double
    # — TestUtils.java:15-22
    return "id long, name string, description string, price double"
