"""Loaders for the driver-generated testdata (TESTDATA.md).

Tables: TPC-H-ish star schema + an ``events`` stream table +
LLM-pipeline ``documents``/``embeddings``. All Parquet, one file per
table, read with pushdown enabled — filters and projections in the
query catalog reach the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}


def events_as_samples(spark: SparkSession, sf_dir: str, partition_width: int = 120_000) -> DataFrame:
    """Map the driver's ``events`` table onto the engine sample schema
    (FIXTURES.md §6): ``tag := event_type``, ``ts := unix_millis(ts)``,
    ``value := props``, plus a numeric projection ``value_num`` for
    analytics. ``ingest_ts``/``writer_id``/``seq`` are synthesized
    deterministically from the event row so LWW ordering is stable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("tag"),
        F.unix_millis(F.col("ts")).alias("ts"),
        F.col("props").alias("value"),
        F.col("value").alias("value_num"),
        F.unix_millis(F.col("ts")).alias("ingest_ts"),
        F.lit("gen").alias("writer_id"),
        F.col("event_id").alias("seq"),
        (
            F.unix_millis(F.col("ts"))
            - F.pmod(F.unix_millis(F.col("ts")), F.lit(partition_width))
        ).alias("part_start"),
        F.col("user_id"),
        F.col("event_id"),
    )
