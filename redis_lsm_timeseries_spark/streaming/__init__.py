"""Structured Streaming surface: continuous ingest into the hot layout
and event-time windowed rollups."""

from redis_lsm_timeseries_spark.streaming.ingest import (
    start_hot_ingest,
    start_hot_ingest_with_maintenance,
    streaming_rollup,
)

__all__ = [
    "start_hot_ingest",
    "start_hot_ingest_with_maintenance",
    "streaming_rollup",
]
