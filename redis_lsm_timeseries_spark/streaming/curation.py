"""Streaming curation admission (north star): the continuous-ingest
form of the batch curation pass — as crawl documents arrive, score
quality, filter, scrub PII, and admit only first-seen content, all in
one Structured Streaming pipeline.

Composes the existing operators unchanged: the text scorers
(``operators/text.py``) are pure Column expressions, so they apply to
a streaming DataFrame exactly as to a batch one (same codegen, no
UDFs); the dedup stage is the watermark-bounded
``dropDuplicatesWithinWatermark`` from ``streaming/dedup.py``. The
result is the streaming twin of the batch pipeline, verified
equivalent to it in tests (same admitted set as quality-filter +
exact-dedup over the union of all micro-batches, up to watermark
horizon semantics).

Scale posture: stateless stages (scoring, filtering, scrubbing) are
map-only over each micro-batch; the only state is the dedup stage's
digest set, bounded by the watermark horizon — the same reasoning as
``streaming/dedup.py``. Batch exact dedup downstream remains the
idempotent backstop for re-admissions past the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.functions.portable import nonempty_tokens
from redis_lsm_timeseries_spark.operators.pipeline import (
    DEFAULT_MIN_QUALITY,
    DEFAULT_MIN_TOKENS,
)
from redis_lsm_timeseries_spark.operators.text import (
    scrub_pii,
    with_quality_score,
    with_token_stats,
)
from redis_lsm_timeseries_spark.streaming.dedup import (
    dedup_stream_by_content,
)


def curate_stream(
    stream: DataFrame,
    event_time_col: str = "event_time",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    watermark: str = "10 minutes",
    scrub: bool = True,
) -> DataFrame:
    """Quality-gate, (optionally) PII-scrub, and dedup a document
    stream. Emits admitted rows with their audit columns
    (``n_tokens``, ``quality_score``, ``content_digest``).

    Stage order matters and mirrors the batch pipeline:
    1. score + threshold BEFORE dedup — junk never enters dedup
       state, so a flood of low-quality spam cannot evict real keys;
    2. scrub AFTER scoring (scrubbing changes punctuation ratios;
       scores must describe the document as crawled) but BEFORE
       digesting — two crawls differing only in a scrubbed email
       admit once, and the persisted text is the clean one."""
    # n_tokens is overridden with the REAL (nonempty) token count
    # after scoring, mirroring the batch pipeline: the length gate and
    # the persisted audit column must agree with packing/LM/report,
    # while quality_score still sees with_quality_score's definition.
    scored = (
        with_quality_score(with_token_stats(stream, text_col), text_col)
        .withColumn(
            "n_tokens", F.size(nonempty_tokens(text_col)).cast("long")
        )
        .where(
            (F.col("quality_score") >= F.lit(float(min_quality)))
            & (F.col("n_tokens") >= F.lit(int(min_tokens)))
        )
    )
    # drop the heavy intermediate array; keep scalar audit columns
    slim = scored.drop("toks")
    if scrub:
        # the scrubbed text REPLACES the original: the digest (and
        # anything persisted) must be over the clean form
        slim = (
            scrub_pii(slim, text_col)
            .drop(text_col)
            .withColumnRenamed("text_scrubbed", text_col)
        )
    return dedup_stream_by_content(
        slim, text_col, event_time_col, watermark
    )
