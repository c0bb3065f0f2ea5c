"""Hierarchical rollups (cascade_rollup): coarser aggregates derived
from a finer rollup without touching base data — exact for the
partition-merging columns, sketch-estimated for distincts, atomic
replace through the commit seam, on both backends."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.rollup import (
    cascade_rollup,
    read_rollup,
    refresh_rollup,
    rollup_full,
)

FINE, COARSE = 10, 40
T0 = 1_000_000


@pytest.fixture(params=["parquet", "manifest"])
def store(spark, tmp_path, request):
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


def _seed(store):
    # values repeat ACROSS fine buckets (v1 in buckets 0 and 10) — the
    # case where summing per-fine-bucket exact distincts would
    # overcount, and only the sketch union is right
    store.write(
        [
            ("cpu", 1, "v1"),
            ("cpu", 4, "2.5"),
            ("cpu", 12, "v1"),
            ("cpu", 15, "7.5"),
            ("cpu", 45, "9.0"),
            ("mem", 3, "opaque"),
            ("mem", 44, "opaque"),
        ],
        ingest_ts=T0,
    )


class TestCascade:
    def test_exact_columns_match_direct_coarse_rollup(self, store):
        _seed(store)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        m = cascade_rollup(store, "fine", "coarse", COARSE)
        assert m.buckets_refreshed > 0
        got = {
            (r.tag, r.bucket_start): r
            for r in read_rollup(store, "coarse").collect()
        }
        want = {
            (r.tag, r.bucket_start): r
            for r in rollup_full(store, COARSE, with_sketch=True).collect()
        }
        assert set(got) == set(want)
        for k in want:
            g, w = got[k], want[k]
            # partition-merging columns are EXACT
            assert (g.n, g.n_numeric, g.min_num, g.max_num) == (
                w.n, w.n_numeric, w.min_num, w.max_num,
            ), k
            assert g.sum_num == pytest.approx(w.sum_num, rel=1e-12)
            # distincts are the HLL estimate of the true value
            assert g.n_distinct == pytest.approx(w.n_distinct, rel=0.05), k

    def test_sketch_merge_not_sum_for_repeated_values(self, store):
        """cpu bucket 0 has {v1, 2.5}, bucket 10 has {v1, 7.5}: the
        coarse bucket's distinct count is 3, not 4 — the cascade must
        NOT sum the per-fine-bucket exact counts."""
        _seed(store)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        cascade_rollup(store, "fine", "coarse", COARSE)
        row = {
            (r.tag, r.bucket_start): r
            for r in read_rollup(store, "coarse").collect()
        }[("cpu", 0)]
        assert row.n == 4
        assert row.n_distinct == 3  # HLL exact at this cardinality

    def test_recascade_after_source_refresh(self, store):
        _seed(store)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        cascade_rollup(store, "fine", "coarse", COARSE)
        before = read_rollup(store, "coarse").count()
        store.write([("cpu", 85, "late")], ingest_ts=T0 + 1_000)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        m = cascade_rollup(store, "fine", "coarse", COARSE)
        assert m.watermark_ingest_ts == T0 + 1_000
        after = {
            (r.tag, r.bucket_start)
            for r in read_rollup(store, "coarse").collect()
        }
        assert ("cpu", 80) in after and len(after) == before + 1

    def test_chained_cascade(self, store):
        """hour -> day -> month: the cascade output carries sketches,
        so it cascades again."""
        _seed(store)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        cascade_rollup(store, "fine", "mid", COARSE)
        cascade_rollup(store, "mid", "top", COARSE * 2)
        got = {
            (r.tag, r.bucket_start): r
            for r in read_rollup(store, "top").collect()
        }
        want = {
            (r.tag, r.bucket_start): r
            for r in rollup_full(store, COARSE * 2).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k].n == want[k].n

    def test_interrupted_rewrite_recovers(self, store):
        """r10 review: a cascade that crashed between the directory
        backend's two renames (live dir absent, copy at .compact-old)
        must be repaired by the next cascade, not destroyed by its
        remove_tree(old)."""
        from redis_lsm_timeseries_spark.commit import ManifestCommit

        if isinstance(store.commit, ManifestCommit):
            pytest.skip("manifest commits atomically — no rename swap")
        _seed(store)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        cascade_rollup(store, "fine", "coarse", COARSE)
        before = {
            (r.tag, r.bucket_start, r.n)
            for r in read_rollup(store, "coarse").collect()
        }
        data = f"{store.config.base_path}/rollups/coarse/data"
        # simulate the crash window: live promoted to old, nothing live
        store.fs.rename(data, data + ".compact-old")
        # reads fall back to the old copy meanwhile
        assert {
            (r.tag, r.bucket_start, r.n)
            for r in read_rollup(store, "coarse").collect()
        } == before
        m = cascade_rollup(store, "fine", "coarse", COARSE)
        assert m.buckets_refreshed == len(before)
        assert {
            (r.tag, r.bucket_start, r.n)
            for r in read_rollup(store, "coarse").collect()
        } == before
        assert not store.fs.exists(data + ".compact-old")

    def test_validation(self, store):
        _seed(store)
        refresh_rollup(store, "plain", FINE)  # no sketches
        with pytest.raises(ValidationError, match="sketch"):
            cascade_rollup(store, "plain", "c", COARSE)
        refresh_rollup(store, "fine", FINE, with_sketch=True)
        with pytest.raises(ValidationError, match="multiple"):
            cascade_rollup(store, "fine", "c", FINE + 5)
        with pytest.raises(ValidationError, match="multiple"):
            cascade_rollup(store, "fine", "c", FINE)  # same step
        with pytest.raises(ValidationError, match="does not exist"):
            cascade_rollup(store, "nope", "c", COARSE)
        with pytest.raises(ValidationError, match="differ"):
            cascade_rollup(store, "fine", "fine", COARSE)
        cascade_rollup(store, "fine", "c", COARSE)
        # re-targeting an existing cascade with different params raises
        with pytest.raises(ValidationError, match="exists"):
            cascade_rollup(store, "fine", "c", COARSE * 2)
        # r10 review: a base-data refresh of a cascade target would mix
        # exact distincts into the HLL-estimated table and strip
        # cascade_of — it refuses
        with pytest.raises(ValidationError, match="cascade"):
            refresh_rollup(store, "c", COARSE, with_sketch=True)
        # and the cascade still works afterwards
        cascade_rollup(store, "fine", "c", COARSE)
