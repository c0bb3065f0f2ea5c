"""Star-schema analytics queries (SURVEY.md §2.3 'engine adds'):
joins, aggregations, set ops, scalar functions over the TPC-H-ish
tables. Populated incrementally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from redis_lsm_timeseries_spark.plans.catalog import register
from redis_lsm_timeseries_spark.sources.testdata import load_table
