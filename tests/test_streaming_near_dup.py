"""Streaming near-dup admission: the foreachBatch sink drops near
duplicates of previously-admitted content, replays are idempotent, and
the end-to-end pipeline equals the batch reasoning over the same
micro-batches. Vocabulary is synthetic — the natural documents table
contains cross-id near-dups, so fixtures must own their collisions."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from redis_lsm_timeseries_spark.streaming.curation import (
    curate_stream_near_dup,
    near_dup_admitting_batch,
)

WORDS = (
    "the quick brown fox jumps over a lazy dog while morning light "
    "covers the quiet harbor and boats drift toward the open water "
    "carrying crates of fresh fruit to the market square"
)  # 31 tokens, quality-passing
VARIANT = WORDS.replace("fresh fruit", "fresh bread")  # near-dup of WORDS
NOVEL = (
    "completely different subject matter here a report about glaciers "
    "melting in the northern ranges and what the survey teams recorded "
    "during the long expedition season last year overall"
)
SHORT = "tiny doc"  # below the shingle floor; exact-guard only


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestForeachBatchUnit:
    """Drive the foreachBatch function directly with static frames —
    the same code path the streaming engine calls."""

    @pytest.fixture()
    def sink(self, tmp_path):
        out = str(tmp_path / "out")
        idx = str(tmp_path / "idx")
        return out, idx, near_dup_admitting_batch(out, idx)

    def test_first_batch_admits_and_indexes(self, spark, sink):
        out, idx, process = sink
        process(_df(spark, [(1, WORDS), (2, NOVEL)]), 0)
        admitted = spark.read.parquet(out)
        assert {r.doc_id for r in admitted.collect()} == {1, 2}
        assert spark.read.parquet(f"{idx}/digests").count() == 2
        assert spark.read.parquet(f"{idx}/bands").count() > 0

    def test_exact_and_near_dups_dropped(self, spark, sink):
        out, idx, process = sink
        process(_df(spark, [(1, WORDS)]), 0)
        # batch 2: exact dup (10), near dup (11), novel (12)
        process(_df(spark, [(10, WORDS), (11, VARIANT), (12, NOVEL)]), 1)
        admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert admitted == {1, 12}

    def test_replay_is_idempotent(self, spark, sink):
        out, idx, process = sink
        batch = _df(spark, [(1, WORDS), (2, NOVEL)])
        process(batch, 0)
        n_out = spark.read.parquet(out).count()
        n_dig = spark.read.parquet(f"{idx}/digests").count()
        n_bands = spark.read.parquet(f"{idx}/bands").count()
        # re-delivered micro-batch: same content, same digests
        process(batch, 0)
        assert spark.read.parquet(out).count() == n_out
        assert spark.read.parquet(f"{idx}/digests").count() == n_dig
        assert spark.read.parquet(f"{idx}/bands").count() == n_bands

    def test_short_docs_use_exact_guard_only(self, spark, sink):
        out, idx, process = sink
        process(_df(spark, [(1, SHORT)]), 0)
        process(_df(spark, [(2, SHORT), (3, "tiny other")]), 1)
        admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert admitted == {1, 3}  # exact dup dropped, no band pollution
        bands = spark.read.parquet(f"{idx}/bands")
        assert bands.count() == 0  # sub-shingle docs never banded

    def test_in_batch_exact_dup_admits_once(self, spark, sink):
        out, idx, process = sink
        process(_df(spark, [(5, WORDS), (6, WORDS)]), 0)
        admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert admitted == {5}  # min id wins, the dedup_exact rule


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _t(minute: int) -> datetime:
    return datetime(2026, 1, 1, 12, minute, tzinfo=timezone.utc)


class TestEndToEnd:
    def test_stream_admits_only_first_variant(self, spark, tmp_path):
        """Three micro-batches landing as files: the quality gate, the
        exact stage, and the near-dup probe compose — only the first
        variant of each near-dup family survives, across batch
        boundaries and restarts."""
        input_dir = str(tmp_path / "in")
        batches = [
            [(1, WORDS, _t(0)), (2, "junk", _t(0))],
            [(3, VARIANT, _t(2)), (4, NOVEL, _t(2))],
            [(5, WORDS, _t(4))],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(f"{input_dir}/b{i}")

        def run():
            # one file per micro-batch so the cross-batch admission
            # semantics (index probe between batches) are exercised
            stream = (
                spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{input_dir}/*")
            )
            q = curate_stream_near_dup(
                stream,
                output_path=str(tmp_path / "out"),
                index_path=str(tmp_path / "idx"),
                checkpoint_path=str(tmp_path / "ckpt"),
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)

        run()
        admitted = {
            r.doc_id
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        # 2 fails quality; 3 is a near-dup of 1; 5 an exact dup of 1
        assert admitted == {1, 4}
        # restart over the same input: checkpoint + content idempotency
        run()
        assert (
            spark.read.parquet(str(tmp_path / "out")).count()
            == len(admitted)
        )


class TestIndexCompaction:
    def test_compacts_and_preserves_admission_behavior(
        self, spark, tmp_path
    ):
        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        out = str(tmp_path / "out")
        idx = str(tmp_path / "idx")
        process = near_dup_admitting_batch(out, idx)
        # several batches -> several small files per index table
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)
        process(
            _df(spark, [(3, "a third entirely separate passage about "
                            "orchard harvests and the pressing of "
                            "apples into cider every autumn weekend")]),
            2,
        )
        dig_before = spark.read.parquet(f"{idx}/digests").collect()
        bands_before = spark.read.parquet(f"{idx}/bands").collect()
        n_files = len(
            [f for f in __import__("os").listdir(f"{idx}/digests")
             if f.endswith(".parquet")]
        )
        assert n_files >= 3
        done = compact_admission_index(spark, idx)
        assert done["digests"] >= 3 and done["bands"] >= 3
        # contents identical
        assert sorted(r.digest for r in dig_before) == sorted(
            r.digest
            for r in spark.read.parquet(f"{idx}/digests").collect()
        )
        assert len(bands_before) == spark.read.parquet(
            f"{idx}/bands"
        ).count()
        # single file each now; second run is a no-op
        assert compact_admission_index(spark, idx) == {
            "digests": 0, "bands": 0
        }
        # admission semantics unchanged through the compacted index:
        # replay of batch 1 still admits nothing
        process(_df(spark, [(10, WORDS), (11, VARIANT)]), 3)
        admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert 10 not in admitted and 11 not in admitted

    def test_interrupted_swap_repaired(self, spark, tmp_path):
        import os

        from redis_lsm_timeseries_spark.streaming.curation import (
            compact_admission_index,
        )

        out = str(tmp_path / "out")
        idx = str(tmp_path / "idx")
        process = near_dup_admitting_batch(out, idx)
        process(_df(spark, [(1, WORDS)]), 0)
        process(_df(spark, [(2, NOVEL)]), 1)
        n = spark.read.parquet(f"{idx}/digests").count()
        # simulate a crash between the two renames: live dir gone,
        # pre-swap copy parked at .compact-old
        os.rename(f"{idx}/digests", f"{idx}/digests.compact-old")
        compact_admission_index(spark, idx)
        assert spark.read.parquet(f"{idx}/digests").count() == n
        assert not os.path.exists(f"{idx}/digests.compact-old")
