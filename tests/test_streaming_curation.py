"""Streaming curation admission: streaming result equals the batch
pipeline over the union of micro-batches; junk filtered, PII
scrubbed, duplicates admitted once across batch boundaries."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from redis_lsm_timeseries_spark.operators.text import (
    scrub_pii,
    with_quality_score,
    with_token_stats,
)
from redis_lsm_timeseries_spark.streaming.curation import curate_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs on for a while"
)
GOOD2 = (
    "a tale of two cities is a novel and the plot is set in london and paris"
)
PII = (
    "contact me at jane.doe@example.com for the report on the big project "
    "we discussed in the spring meeting of the board"
)
JUNK_SHORT = "too short"
JUNK_PUNCT = "!!! ??? *** ### $$$ %%% ^^^ &&& ((( ))) @@@ ~~~ ``` |||"


def _t(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)


@pytest.fixture()
def landed(spark, tmp_path):
    """Three micro-batches: good docs, a cross-batch duplicate, junk,
    and a PII doc whose scrubbed form duplicates a batch-1 admission."""
    input_dir = str(tmp_path / "in")
    batches = [
        [
            (1, GOOD, _t(0)),
            (2, JUNK_SHORT, _t(0)),
            (3, PII, _t(1)),
        ],
        [
            (4, GOOD, _t(2)),  # exact duplicate of doc 1
            (5, GOOD2, _t(2)),
            (6, JUNK_PUNCT, _t(3)),
        ],
        [
            # scrubbed-form duplicate of doc 3 (different email)
            (7, PII.replace("jane.doe@example.com", "bob@corp.net"), _t(4)),
            (8, GOOD2 + " extended with further words", _t(4)),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{input_dir}/b{i}")
    return input_dir, [r for b in batches for r in b]


def _run(spark, input_dir: str, tmp_path, **kw) -> list:
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(f"{input_dir}/*")
    out_dir = str(tmp_path / "out")
    q = (
        curate_stream(stream, **kw)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


def test_admission_set_and_scrubbing(spark, landed, tmp_path):
    input_dir, _ = landed
    rows = _run(spark, input_dir, tmp_path)
    admitted = {r.doc_id for r in rows}
    # junk out (2, 6); duplicates admitted once: {1,4} one of, {3,7}
    # one of (same digest after scrubbing), 5 and 8 in
    assert 2 not in admitted and 6 not in admitted
    assert len(admitted & {1, 4}) == 1
    assert len(admitted & {3, 7}) == 1
    assert {5, 8} <= admitted
    for r in rows:
        assert "@" not in r.text  # PII scrubbed in the persisted text
        assert r.quality_score >= 0.5 and r.n_tokens >= 5
        assert r.content_digest is not None


def test_streaming_equals_batch_pipeline(spark, landed, tmp_path):
    """The admitted DIGEST set equals the batch pipeline (score ->
    filter -> scrub -> exact dedup) over the union of all
    micro-batches."""
    input_dir, all_rows = landed
    stream_digests = {
        r.content_digest for r in _run(spark, input_dir, tmp_path)
    }
    batch = spark.createDataFrame(all_rows, DOC_SCHEMA)
    scored = with_quality_score(with_token_stats(batch, "text"), "text")
    # same nonempty-token length gate as curate_stream
    kept = scored.where(
        "quality_score >= 0.5 "
        "AND size(filter(split(lower(text), '\\\\s+'), t -> t != '')) >= 5"
    )
    scrubbed = scrub_pii(kept, "text")
    batch_digests = {
        r.d
        for r in scrubbed.select(
            F.sha2(F.col("text_scrubbed").cast("binary"), 256).alias("d")
        )
        .distinct()
        .collect()
    }
    assert stream_digests == batch_digests


def test_no_scrub_mode_keeps_raw_text(spark, landed, tmp_path):
    input_dir, _ = landed
    rows = _run(spark, input_dir, tmp_path, scrub=False)
    admitted = {r.doc_id: r for r in rows}
    # without scrubbing, 3 and 7 differ by email -> both admitted
    assert len(set(admitted) & {3, 7}) == 2
    pii_doc = admitted[3] if 3 in admitted else admitted[7]
    assert "@" in pii_doc.text
