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


# ---------------------------------------------------- near-dup admission
#
# The exact-dedup stage above is content-digest-keyed: a re-crawl that
# differs by one word sails through. Near-dup admission closes that
# gap with the SAME machinery the batch pipeline uses — the persisted
# MinHash band index (`operators.dedup.build_band_index`) probed per
# micro-batch via `incremental_near_dup` — wrapped in foreachBatch,
# because the probe joins against a growing external table, which the
# declarative streaming operators cannot express.

MIN_SHINGLE_TOKENS = 3  # word-3-shingles need >= 3 tokens to exist


def near_dup_admitting_batch(
    output_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int | None = None,
):
    """Build the ``foreachBatch`` function for near-dup-aware
    streaming admission. For each micro-batch:

    1. EXACT guard (idempotency): probe the admitted-digest index with
       ``incremental_exact_dedup`` — rows whose content was already
       admitted (including a re-delivered micro-batch after a restart:
       same content, same digests) drop here, so replays admit nothing
       twice and never grow the index. In-batch exact dups admit once
       (min id).
    2. NEAR guard: MinHash-probe the persisted band index with
       ``incremental_near_dup``; rows whose best signature agreement
       >= ``threshold`` drop. Documents too short to shingle
       (< 3 tokens) skip this stage — their max-init signatures would
       all collide — and rely on the exact guard alone.
    3. Admit the remainder: append rows to ``output_path``, their
       digests and band rows (signatures included) to the index.

    Batch-internal NEAR dups (two first-seen variants arriving in one
    micro-batch) both admit — the idempotent batch dedup downstream
    remains the backstop, the same two-tier posture as the exact
    stage. State lives entirely in the two index tables, not the
    streaming state store, so it survives restarts and is shared with
    batch admission jobs using the same index.

    100 TB shape: per batch, the (small) batch side broadcasts twice —
    digests against the digest index, band keys against the band index
    — and the indexes are scanned, never shuffled; appends are
    batch-sized. At deployment scale the band index is stored bucketed
    by (band_idx, band_key) so the probe is bucket-pruned."""
    from pyspark.sql import types as T

    from redis_lsm_timeseries_spark.functions.portable import (
        nonempty_tokens as _net,
    )
    from redis_lsm_timeseries_spark.operators import dedup as D

    nh = D.NUM_HASHES if num_hashes is None else int(num_hashes)
    digests_path = f"{index_path}/digests"
    bands_path = f"{index_path}/bands"

    bands_schema = T.StructType(
        [
            T.StructField("corpus_id", T.LongType()),
            T.StructField("band_idx", T.IntegerType()),
            T.StructField("band_key", T.StringType()),
            T.StructField("mhs", T.ArrayType(T.LongType())),
        ]
    )

    def _read_or_empty(spark, path, schema):
        # ONLY a missing path reads as empty (first run). Any other
        # failure — corrupt files, permissions — must propagate: an
        # unreadable index treated as empty would silently re-admit
        # every duplicate.
        from pyspark.errors import AnalysisException

        try:
            return spark.read.schema(schema).parquet(path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(
                exc
            ):
                return spark.createDataFrame([], schema)
            raise

    def process(batch_df, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        digest_idx = _read_or_empty(
            spark, digests_path, T.StructType(
                [T.StructField("digest", T.StringType())]
            ),
        )
        exact = D.incremental_exact_dedup(batch, digest_idx, text_col, id_col)
        novel_ids = exact.where("admit").select(id_col)
        novel = batch.join(novel_ids, id_col, "left_semi").localCheckpoint(
            eager=True
        )
        if novel.isEmpty():
            return
        long_enough = novel.where(
            F.size(_net(text_col)) >= MIN_SHINGLE_TOKENS
        )
        band_idx_df = _read_or_empty(spark, bands_path, bands_schema)
        near = D.incremental_near_dup(
            long_enough.select(id_col, text_col),
            band_idx_df,
            text_col,
            id_col,
            threshold,
            nh,
        )
        dropped_ids = near.where("is_near_dup").select(id_col)
        admitted = novel.join(dropped_ids, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        if admitted.isEmpty():
            return
        admitted.write.mode("append").parquet(output_path)
        (
            admitted.select(D.content_digest(text_col).alias("digest"))
            .distinct()
            .write.mode("append")
            .parquet(digests_path)
        )
        new_bands = D.build_band_index(
            admitted.where(F.size(_net(text_col)) >= MIN_SHINGLE_TOKENS),
            text_col,
            id_col,
            nh,
        )
        # enforce the index schema (band_idx is int, ids long) so a
        # later probe's signature-width/type guard stays meaningful
        (
            new_bands.select(
                F.col("corpus_id").cast("long"),
                F.col("band_idx").cast("int"),
                F.col("band_key"),
                F.col("mhs"),
            )
            .write.mode("append")
            .parquet(bands_path)
        )

    return process


def curate_stream_near_dup(
    stream: DataFrame,
    output_path: str,
    index_path: str,
    checkpoint_path: str,
    event_time_col: str = "event_time",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    watermark: str = "10 minutes",
    scrub: bool = True,
    threshold: float = 0.5,
    trigger: dict | None = None,
):
    """The near-dup-aware streaming curation pipeline: the stateless
    ``curate_stream`` stages (score, filter, scrub, watermark-bounded
    exact dedup) feed a ``foreachBatch`` admission sink that drops
    near-duplicates of everything previously admitted and appends the
    rest to ``output_path``. Returns the started StreamingQuery.
    ``trigger`` passes through to ``writeStream.trigger`` (e.g.
    ``{"availableNow": True}`` for drain-and-stop runs)."""
    curated = curate_stream(
        stream, event_time_col, text_col, min_quality, min_tokens,
        watermark, scrub,
    )
    writer = curated.writeStream.foreachBatch(
        near_dup_admitting_batch(
            output_path, index_path, text_col, threshold=threshold
        )
    ).option("checkpointLocation", checkpoint_path)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.outputMode("append").start()


def compact_admission_index(
    spark,
    index_path: str,
    fs=None,
    target_files: int = 1,
) -> dict:
    """Small-file hygiene for the admission index: every micro-batch
    appends one file to ``digests`` and ``bands``, so after N batches
    each probe pays N file opens — the same accretion the purge log
    suffers (``tiering.compact_purge_log``), handled the same way:
    rewrite each table clustered into ``target_files`` files via a
    crash-safe tmp-write + two-rename swap (full copy on disk at
    every instant; an interrupted swap leaves ``.compact-old`` to
    fall back to, repaired on the next run). The bands rewrite also
    clusters by (band_idx, band_key), so probes touch co-located
    row groups — the local-FS stand-in for the bucketed layout a
    deployment stores the index in.

    Run this between streaming runs (the admission sink reads the
    index at the start of each micro-batch; swapping mid-batch would
    race it — same single-writer maintenance posture as tiering).
    Returns {"digests": files_before, "bands": files_before} (0 =
    nothing to do)."""
    from redis_lsm_timeseries_spark.fs import LOCAL_FS

    fs = fs if fs is not None else LOCAL_FS
    done = {}
    for name, cluster in (("digests", ["digest"]),
                          ("bands", ["band_idx", "band_key"])):
        path = f"{index_path}/{name}"
        tmp, old = path + ".compact-tmp", path + ".compact-old"
        # repair an interrupted swap first (same protocol as
        # commit.ParquetLeaseCommit.repair_interrupted_rewrite)
        if not fs.exists(path):
            if fs.exists(tmp) and fs.exists(f"{tmp}/_SUCCESS"):
                fs.rename(tmp, path)
                fs.remove_tree(old)
            elif fs.exists(old):
                fs.remove_tree(tmp)
                fs.rename(old, path)
        if not fs.exists(path):
            done[name] = 0
            continue
        n = fs.count_files_with_suffix(path, ".parquet")
        if n <= target_files:
            done[name] = 0
            continue
        fs.remove_tree(tmp)
        fs.remove_tree(old)
        (
            spark.read.parquet(path)
            .repartition(target_files, *cluster)
            .sortWithinPartitions(*cluster)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        fs.rename(path, old)
        fs.rename(tmp, path)
        fs.remove_tree(old)
        done[name] = n
    return done
