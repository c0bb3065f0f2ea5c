"""SparkSession builder for the engine.

Tuned for the driver environment (single-JVM ``local[N]``) but every
setting is the one you'd want on a real cluster too: AQE on (runtime
shuffle coalescing + skew-join splitting), UTC session time zone (so
timestamp comparisons against the DuckDB oracle are stable), Arrow for
the Pandas-UDF slow path, and shuffle partitions sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def pinned_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily size ``spark.sql.shuffle.partitions`` to a job's
    actual data, restoring the session value on exit.

    Used by the catalog's temp-store mutation entries (a few thousand
    rows — 32 near-empty shuffle tasks per job cost more than the work)
    and by the finite test streams (the StateStore partition count is
    frozen from this conf at the first micro-batch). A production
    deployment sizes the session value once to key cardinality x
    executor count; this pin is for bounded, known-small jobs only."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def get_spark(app_name: str = "redis-lsm-timeseries-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python DataSource pushFilters (the rlts_table connector's
        # manifest-stats skipping) is gated off by default in 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Dynamic overwrite: the purge-ack job replaces only the hot
        # partitions it rewrites (tiering.py), never the whole table.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
