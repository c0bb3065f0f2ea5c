"""Structured Streaming surface: continuous ingest into the hot layout
and event-time windowed rollups."""

from redis_lsm_timeseries_spark.streaming.curation import curate_stream
from redis_lsm_timeseries_spark.streaming.dedup import (
    dedup_stream_by_content,
    dedup_stream_by_key,
)
from redis_lsm_timeseries_spark.streaming.ingest import (
    start_hot_ingest,
    start_hot_ingest_with_maintenance,
    streaming_rollup,
)

__all__ = [
    "curate_stream",
    "dedup_stream_by_content",
    "dedup_stream_by_key",
    "start_hot_ingest",
    "start_hot_ingest_with_maintenance",
    "streaming_rollup",
]
