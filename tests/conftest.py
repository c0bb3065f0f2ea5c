"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_lsm_timeseries_spark.session import get_spark  # noqa: E402

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("rlts-tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture()
def store(spark, tmp_path):
    from redis_lsm_timeseries_spark.config import EngineConfig
    from redis_lsm_timeseries_spark.store import TimeseriesStore

    cfg = EngineConfig(root=str(tmp_path / "engine"), partition_width=5)
    s = TimeseriesStore(spark, cfg)
    s.initialize()
    return s
