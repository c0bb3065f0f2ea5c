"""LLM-data-pipeline queries (north star): dedup, similarity search,
text analysis, multimodal plumbing over documents/embeddings.
Populated incrementally."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from redis_lsm_timeseries_spark.plans.catalog import register
from redis_lsm_timeseries_spark.sources.testdata import load_table
