"""Streaming exact dedup (streaming/dedup.py): duplicates inside the
watermark horizon are dropped across micro-batch boundaries, and the
admitted set equals the batch-distinct oracle."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

from redis_lsm_timeseries_spark.streaming import (
    dedup_stream_by_content,
    dedup_stream_by_key,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _t(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)


def _land(spark, input_dir: str, rows, batch: int) -> None:
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(f"{input_dir}/b{batch}")


def _run_stream(spark, dedup_fn, input_dir: str, tmp_path) -> list:
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(f"{input_dir}/*")
    out_dir = str(tmp_path / "out")
    q = (
        dedup_fn(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "incoming"
    d.mkdir()
    return str(d)


class TestStreamingDedup:
    def test_key_dedup_across_batches(self, spark, input_dir, tmp_path):
        """The same doc_id replayed in a LATER micro-batch (inside the
        horizon) must not be re-admitted — state crosses batches."""
        _land(
            spark,
            input_dir,
            [(1, "alpha", _t(0)), (2, "beta", _t(1)), (1, "alpha-again", _t(2))],
            batch=0,
        )
        _land(
            spark,
            input_dir,
            [(2, "beta-replay", _t(3)), (3, "gamma", _t(4))],
            batch=1,
        )
        rows = _run_stream(
            spark,
            lambda s: dedup_stream_by_key(
                s, ["doc_id"], "event_time", "30 minutes"
            ),
            input_dir,
            tmp_path,
        )
        admitted = {r.doc_id for r in rows}
        assert admitted == {1, 2, 3}
        assert len(rows) == 3  # one row per key, not per arrival
        # First-arrival wins: doc 1's admitted text is the original.
        assert {r.text for r in rows if r.doc_id == 1} == {"alpha"}

    def test_content_dedup_collapses_distinct_ids(self, spark, input_dir, tmp_path):
        """Different doc_ids carrying identical TEXT collapse to one
        admitted row per content digest — the batch exact-dedup oracle
        (count distinct text) computed on the same input."""
        rows_in = [
            (10, "same payload", _t(0)),
            (11, "same payload", _t(1)),
            (12, "other payload", _t(2)),
            (13, "same payload", _t(3)),
        ]
        _land(spark, input_dir, rows_in[:2], batch=0)
        _land(spark, input_dir, rows_in[2:], batch=1)
        rows = _run_stream(
            spark,
            lambda s: dedup_stream_by_content(
                s, "text", "event_time", "30 minutes"
            ),
            input_dir,
            tmp_path,
        )
        batch_distinct = (
            spark.createDataFrame(rows_in, DOC_SCHEMA)
            .select("text")
            .distinct()
            .count()
        )
        assert len(rows) == batch_distinct == 2
        assert {r.text for r in rows} == {"same payload", "other payload"}
        # The digest column rides along for downstream batch compaction.
        assert all(len(r.content_digest) == 64 for r in rows)
