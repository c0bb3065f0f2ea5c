"""Loaders for the driver-generated testdata (TESTDATA.md).

Tables: TPC-H-ish star schema + an ``events`` stream table +
LLM-pipeline ``documents``/``embeddings``. All Parquet, one file per
table, read with pushdown enabled — filters and projections in the
query catalog reach the scan.

``events.ts`` is written as Parquet TIMESTAMP(NANOS), which Spark 4
rejects by default; ``load_events`` flips
``spark.sql.legacy.parquet.nanosAsLong`` (a runtime-settable SQLConf)
and converts with exact integer arithmetic, so any SparkSession —
including the driver's — can run the catalog queries.
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
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_ns`` (raw int64 nanos), ``ts_ms`` (epoch ms), and
    ``ts`` re-exposed as a microsecond TIMESTAMP — matching what DuckDB
    sees when it reads the same file (ns truncated to us)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # `div` is exact int64 division — a double round-trip would lose
    # precision above 2^53 and could flip a millisecond boundary.
    return raw.select(
        "event_id",
        F.col("ts").alias("ts_ns"),
        F.expr("ts div 1000000").alias("ts_ms"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_as_samples(spark: SparkSession, sf_dir: str, partition_width: int = 120_000) -> DataFrame:
    """Map the driver's ``events`` table onto the engine sample schema
    (FIXTURES.md §6): ``tag := event_type``, ``ts := epoch ms``,
    ``value := props``, plus a numeric projection ``value_num`` for
    analytics. ``ingest_ts``/``writer_id``/``seq`` are synthesized
    deterministically from the event row so LWW ordering is stable."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        F.col("event_type").alias("tag"),
        F.col("ts_ms").alias("ts"),
        F.col("props").alias("value"),
        F.col("value").alias("value_num"),
        F.col("ts_ms").alias("ingest_ts"),
        F.lit("gen").alias("writer_id"),
        F.col("event_id").alias("seq"),
        (
            F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(partition_width))
        ).alias("part_start"),
        F.col("user_id"),
        F.col("event_id"),
    )
