"""Continuous rollups: the incremental refresh must be bit-identical
to the full recompute through writes, updates, tombstones, old-bucket
late writes, and tier movement (purge lifecycle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.rollup import (
    read_rollup,
    refresh_rollup,
    rollup_full,
)

STEP = 10
T0 = 1_000_000


@pytest.fixture(params=["parquet", "manifest"])
def store(spark, tmp_path, request):
    """Rollup lifecycle tests run against both commit backends — the
    rollup table is fully seam-routed, so under ManifestCommit it is a
    versioned manifest table end to end (VERDICT r8 #2)."""
    from redis_lsm_timeseries_spark.commit import (
        ManifestCommit,
        ParquetLeaseCommit,
    )
    from redis_lsm_timeseries_spark.config import EngineConfig
    from redis_lsm_timeseries_spark.store import TimeseriesStore

    commit = (
        ManifestCommit() if request.param == "manifest"
        else ParquetLeaseCommit()
    )
    cfg = EngineConfig(root=str(tmp_path / "engine"), partition_width=5)
    s = TimeseriesStore(spark, cfg, commit=commit)
    s.initialize()
    return s


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "tag", "bucket_start", "n", "n_numeric",
            "sum_num", "min_num", "max_num",
        ).collect()
    )


def _assert_matches_full(store, name="agg"):
    assert _rows(read_rollup(store, name)) == _rows(
        rollup_full(store, STEP)
    )


class TestIncrementalEqualsFull:
    def test_lifecycle(self, store):
        # initial corpus: numeric + non-numeric values, two tags
        store.write(
            [
                ("cpu", 1, "1.5"),
                ("cpu", 4, "2.5"),
                ("cpu", 12, "4.0"),
                ("mem", 3, "opaque"),
            ],
            ingest_ts=T0,
        )
        m = refresh_rollup(store, "agg", STEP)
        assert m.buckets_refreshed == 3  # cpu:0, cpu:10, mem:0
        _assert_matches_full(store)

        # no new writes -> no-op
        m2 = refresh_rollup(store, "agg", STEP)
        assert m2.buckets_refreshed == 0
        _assert_matches_full(store)

        # new bucket + LATE write into an old bucket + LWW update
        store.write(
            [
                ("cpu", 25, "10.0"),   # new bucket 20
                ("cpu", 7, "3.5"),     # late write, bucket 0
                ("cpu", 12, "5.0"),    # supersedes (LWW), bucket 10
            ],
            ingest_ts=T0 + 1_000,
        )
        m3 = refresh_rollup(store, "agg", STEP)
        assert m3.buckets_refreshed == 3  # cpu:0, cpu:10, cpu:20
        _assert_matches_full(store)
        got = {
            (r.tag, r.bucket_start): r
            for r in read_rollup(store, "agg").collect()
        }
        assert got[("cpu", 10)].sum_num == 5.0  # update took effect
        assert got[("cpu", 0)].n == 3
        # untouched tag's rows carried over untouched
        assert got[("mem", 0)].n == 1 and got[("mem", 0)].n_numeric == 0

    def test_tombstone_empties_bucket(self, store):
        store.write([("t", 5, "1.0"), ("t", 15, "2.0")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)
        # tombstone the only member of bucket 10
        store.write([("t", 15, None)], ingest_ts=T0 + 1_000)
        m = refresh_rollup(store, "agg", STEP)
        assert m.buckets_refreshed == 1
        _assert_matches_full(store)
        buckets = {
            r.bucket_start for r in read_rollup(store, "agg").collect()
        }
        assert buckets == {0}  # bucket 10 deleted, not zero-padded

    def test_survives_purge_lifecycle(self, store):
        from redis_lsm_timeseries_spark.tiering import (
            purge_ack_many,
            purge_scan,
        )

        store.write(
            [("a", 1, "1.0"), ("a", 12, "2.0"), ("b", 2, "3.0")],
            ingest_ts=T0,
        )
        refresh_rollup(store, "agg", STEP)
        before = _rows(read_rollup(store, "agg"))
        marks = purge_scan(store, 0, 10, now_ms=T0 + 10_000)
        assert marks
        acked = purge_ack_many(store, [m.purge_id for m in marks])
        assert all(acked.values())
        # eviction changes tiers, not logical content: refresh is a
        # no-op and the rollup still equals the full recompute over
        # the hot-union-cold view
        m = refresh_rollup(store, "agg", STEP)
        assert m.buckets_refreshed == 0
        assert _rows(read_rollup(store, "agg")) == before
        _assert_matches_full(store)

    def test_step_mismatch_raises(self, store):
        store.write([("x", 1, "1")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)
        with pytest.raises(ValidationError):
            refresh_rollup(store, "agg", STEP + 5)

    def test_missing_rollup_raises(self, store):
        store.write([("x", 1, "1")], ingest_ts=T0)
        with pytest.raises(ValidationError):
            read_rollup(store, "nope")

    def test_two_rollups_independent(self, store):
        store.write([("x", 1, "1.0"), ("x", 55, "2.0")], ingest_ts=T0)
        refresh_rollup(store, "fine", STEP)
        refresh_rollup(store, "coarse", 100)
        assert read_rollup(store, "fine").count() == 2
        assert read_rollup(store, "coarse").count() == 1


class TestStreamingPiggyback:
    def test_rollup_maintained_from_ingest_stream(self, spark, store, tmp_path):
        """Rollups refresh from the ingest trigger, and a replayed
        micro-batch (identity-equal members) leaves them unchanged."""
        from redis_lsm_timeseries_spark.streaming.ingest import (
            make_maintenance_batch_handler,
        )

        ckpt = str(tmp_path / "ckpt")
        handler = make_maintenance_batch_handler(
            store,
            ckpt,
            partition_age_threshold_s=1e6,  # no purging in this test
            rollups=[("agg", STEP)],
        )
        b0 = spark.createDataFrame(
            [("cpu", 1, "1.0"), ("cpu", 12, "2.0")],
            "tag string, ts long, value string",
        )
        handler(b0, 0)
        _assert_matches_full(store)
        assert read_rollup(store, "agg").count() == 2
        b1 = spark.createDataFrame(
            [("cpu", 14, "3.0"), ("mem", 2, "4.0")],
            "tag string, ts long, value string",
        )
        handler(b1, 1)
        _assert_matches_full(store)
        before = _rows(read_rollup(store, "agg"))
        # replay of batch 1: pinned ingest_ts + content-hash seq make
        # members identity-equal; the watermark refresh sees nothing
        handler(b1, 1)
        assert _rows(read_rollup(store, "agg")) == before
        _assert_matches_full(store)


def test_fully_tombstoned_tag_disappears_from_rollup(store):
    """The dynamic-overwrite gap: a touched tag whose EVERY bucket
    emptied must lose its partition directory, not keep stale rows."""
    store.write(
        [("gone", 5, "1.0"), ("gone", 15, "2.0"), ("kept", 3, "9.0")],
        ingest_ts=T0,
    )
    refresh_rollup(store, "agg", STEP)
    assert read_rollup(store, "agg").where("tag = 'gone'").count() == 2
    store.write(
        [("gone", 5, None), ("gone", 15, None)], ingest_ts=T0 + 1_000
    )
    refresh_rollup(store, "agg", STEP)
    _assert_matches_full(store)
    out = read_rollup(store, "agg")
    assert out.where("tag = 'gone'").count() == 0
    assert out.where("tag = 'kept'").count() == 1
