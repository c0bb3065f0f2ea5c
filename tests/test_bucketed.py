"""Plan gates for bucketed co-located joins (operators/bucketed.py):
two tables bucketed on the join key with equal bucket counts must join
with NO shuffle Exchange on either side, and a groupBy on the bucket
key must aggregate without an exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.bucketed import (
    bucketed_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 5000).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 700).alias("cust_id"),
        (F.col("id") * 3 % 1000).alias("total"),
    )
    items = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("order_id"),
        (F.col("id") % 97).alias("qty"),
    )
    # coalesce(1): one file per bucket so the write-time sortBy order
    # survives and the join's merge phase reads pre-sorted buckets.
    write_bucketed(
        orders.coalesce(1), "b_orders", ["order_id"], 8, sort_cols=["order_id"]
    )
    write_bucketed(
        items.coalesce(1), "b_items", ["order_id"], 8, sort_cols=["order_id"]
    )
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        l, r = bucketed_tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # Force the SMJ path: a broadcast join would also avoid the
            # exchange but for the wrong (size-bound) reason.
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = bucketed_join(spark, l, r, ["order_id"])
            joined.collect()
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

    def test_join_result_correct(self, spark, bucketed_tables):
        l, r = bucketed_tables
        joined = bucketed_join(spark, l, r, ["order_id"])
        # every item row matches exactly one order row
        assert joined.count() == 20000

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed_tables):
        _, r = bucketed_tables
        agg = spark.table(r).groupBy("order_id").agg(F.sum("qty").alias("q"))
        agg.collect()
        plan = _plan(agg)
        assert "Exchange" not in plan, plan

    def test_unbucketed_join_does_shuffle(self, spark, bucketed_tables):
        """Control: the same join over the raw DataFrames shuffles —
        proving the gate above is detecting bucketing, not a trivially
        exchange-free plan."""
        l, _ = bucketed_tables
        plain = spark.table(l).select("order_id", "cust_id")
        other = spark.range(0, 5000).select(
            F.col("id").alias("order_id"), (F.col("id") % 7).alias("x")
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = plain.join(other, "order_id")
            joined.collect()
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Exchange" in plan
