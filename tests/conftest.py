"""Shared fixtures: one local SparkSession per test run, testdata paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from cve_manager_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spark = get_session("cve_manager_spark-tests", master=f"local[{cpus}]")
    yield spark
    spark.stop()
