"""Bucketed tables: shuffle-free co-located joins for repeated big
joins.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem x
orders on the order key) is the shuffle of BOTH sides. If the tables
are written ONCE bucketed by the join key into the same number of
buckets, every subsequent join is co-located: Spark matches bucket i of
one table with bucket i of the other and plans a sort-merge join with
NO Exchange on either side — the one-time write shuffle is amortized
over every downstream join, aggregation, and dedup keyed on the same
column.

This is the standard Spark answer to the reference's fixed layout: the
reference co-locates by construction (each partition is one Redis ZSET,
``index.js:121-122``); bucketing is the multi-executor equivalent for
JOIN keys, complementing the hot table's ``partitionBy`` time layout
for SCAN pruning.

Requirements this module encodes (and the plan gate in
``tests/test_bucketed.py`` asserts):
- both sides bucketed by the join key with the SAME bucket count
  (bucket counts divisible into each other also co-locate since Spark
  3.1 with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- written via ``saveAsTable`` (bucket metadata lives in the catalog;
  a plain ``parquet(path)`` write silently drops bucketing);
- ``sortBy`` the join key at write time so the merge phase reads
  pre-sorted buckets (Spark still re-sorts when a bucket has >1 file
  per bucket — keep one file per bucket per write batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed (and optionally sorted)
    by the given columns. Joins/aggregations between tables bucketed on
    the same keys with the same bucket count need no shuffle."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With both
    sides bucketed identically this plans as a zero-Exchange sort-merge
    join (assert via ``"Exchange" not in df...executedPlan``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
