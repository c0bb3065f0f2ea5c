"""Streaming exact deduplication with watermark-bounded state.

The batch dedup family (operators/dedup.py) answers "which documents in
this CORPUS are duplicates"; a training-data ingest pipeline also needs
the streaming form — "drop documents I have already admitted" — as data
arrives continuously. The reference engine has no document surface at
all (its stream is the purge queue); this operator is part of the
LLM-pipeline extension mandated by the build plan (SURVEY.md §6).

Scale posture: exact streaming dedup keeps one state row per key seen,
which is unbounded on an infinite stream — the 100 TB failure mode is
the state store, not the data. ``dropDuplicatesWithinWatermark`` bounds
state to keys newer than the event-time watermark: a duplicate arriving
within the horizon is dropped; one arriving after its original's state
expired is re-admitted (at-most-once dedup inside the horizon,
at-least-once admission overall). Downstream exact batch dedup
(operators/dedup.py) remains the idempotent backstop — the same
two-tier shape the LSM store uses (streaming admission + batch
compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream_by_key(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Identity dedup: admit the first row per ``key_cols`` within the
    watermark horizon, drop later duplicates. State holds only keys —
    rows never buffer waiting for the watermark (unlike
    ``dropDuplicates`` on a watermarked column, which must keep the
    event-time column in the key to expire state)."""
    return stream.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def dedup_stream_by_content(
    stream: DataFrame,
    content_col: str,
    event_time_col: str,
    watermark: str = "10 minutes",
    digest_col: str = "content_digest",
) -> DataFrame:
    """Content dedup: digest the payload (sha2-256, JVM-side — the
    streaming analog of operators/dedup.py's exact digest groupBy) and
    admit one row per digest within the horizon. The digest column is
    kept in the output: downstream batch compaction can dedup on it
    again without re-hashing the content."""
    digested = stream.withColumn(
        digest_col, F.sha2(F.col(content_col).cast("binary"), 256)
    )
    return dedup_stream_by_key(
        digested, [digest_col], event_time_col, watermark
    )
