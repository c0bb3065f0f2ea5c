"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``redis_lsm_timeseries_spark``; this module is
a thin adapter over the query catalog (``plans.catalog.REGISTRY``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redis_lsm_timeseries_spark.plans import catalog  # noqa: E402
import redis_lsm_timeseries_spark.plans  # noqa: F401, E402  (populates REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The canonical composed read (reference readData semantics): pruned
    range scan + LWW merge over the events table."""
    return catalog.REGISTRY["ts_range_read"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible operators → rows-only check)."""
    return catalog.oracle_sql()
