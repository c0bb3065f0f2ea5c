"""delete_series: GDPR-style erasure of whole tags across hot, cold,
purge log, and rollups — both commit backends, idempotent, other tags
untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import ManifestCommit
from redis_lsm_timeseries_spark.config import EngineConfig
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.store import TimeseriesStore
from redis_lsm_timeseries_spark.tiering import (
    delete_series,
    purge_ack_many,
    purge_log,
    purge_scan,
)


@pytest.fixture(params=["manifest", "directory", "manifest_hot"])
def store(request, spark, tmp_path):
    cfg = EngineConfig(
        root=str(tmp_path / "e"), partition_width=10,
        manifest_hot=(request.param == "manifest_hot"),
    )
    s = TimeseriesStore(
        spark, cfg,
        commit=None if request.param == "directory" else ManifestCommit(),
    )
    s.initialize()
    # two tags, history evicted cold, plus fresh hot rows and a rollup
    s.write([("A", t, f"a{t}") for t in range(0, 20)], ingest_ts=1)
    s.write([("B", t, f"b{t}") for t in range(0, 20)], ingest_ts=1)
    marks = purge_scan(
        s, partition_age_threshold_s=0.0, max_partitions_to_mark=10
    )
    purge_ack_many(s, [m.purge_id for m in marks])
    s.write([("A", 100, "a100"), ("B", 100, "b100")], ingest_ts=2)
    from redis_lsm_timeseries_spark.rollup import refresh_rollup

    refresh_rollup(s, "daily", 10)
    return s


class TestDeleteSeries:
    def test_erases_tag_everywhere_keeps_others(self, spark, store):
        from redis_lsm_timeseries_spark.rollup import read_rollup

        m = delete_series(store, ["A"])
        assert m.hot_partitions_dropped >= 1
        assert m.cold_files_rewritten >= 1
        assert m.purge_log_rows_removed >= 1
        assert m.rollups_swept == 1
        # no trace of A in any tier
        got = store.read_range(
            {"A": (0, 1000), "B": (0, 1000)}, include_cold=True
        )
        rows = {(r.tag, r.ts) for r in got.collect()}
        assert not any(t == "A" for t, _ in rows)
        assert ("B", 5) in rows and ("B", 100) in rows
        assert (
            purge_log(store).where(F.col("tag") == "A").count() == 0
        )
        assert purge_log(store).where(F.col("tag") == "B").count() > 0
        roll = read_rollup(store, "daily")
        tags = {r.tag for r in roll.select("tag").distinct().collect()}
        assert tags == {"B"}

    def test_idempotent(self, spark, store):
        delete_series(store, ["A"])
        m2 = delete_series(store, ["A"])
        assert m2.hot_partitions_dropped == 0
        assert m2.purge_log_rows_removed == 0
        got = store.read_range({"B": (0, 1000)}, include_cold=True)
        assert got.count() == 21  # B fully intact

    def test_unacked_mark_for_erased_tag_acks_to_nothing(
        self, spark, store
    ):
        # new old-enough A data, marked but NOT acked, then erased
        store.write([("A", 200, "late")], ingest_ts=3)
        marks = purge_scan(
            store, partition_age_threshold_s=0.0,
            max_partitions_to_mark=10,
        )
        a_marks = [m for m in marks if m.tag == "A"]
        delete_series(store, ["A"])
        # ack after erasure: finds nothing, stays consistent
        if a_marks:
            purge_ack_many(store, [m.purge_id for m in a_marks])
        got = store.read_range({"A": (0, 1000)}, include_cold=True)
        assert got.count() == 0

    def test_rollup_refresh_after_erasure_stays_clean(
        self, spark, store
    ):
        from redis_lsm_timeseries_spark.rollup import (
            read_rollup,
            refresh_rollup,
        )

        delete_series(store, ["A"])
        store.write([("B", 101, "b101")], ingest_ts=5)
        refresh_rollup(store, "daily", 10)
        tags = {
            r.tag
            for r in read_rollup(store, "daily")
            .select("tag").distinct().collect()
        }
        assert tags == {"B"}  # A does not resurface

    def test_invalid_tag_rejected(self, spark, store):
        with pytest.raises(ValidationError, match="invalid tag"):
            delete_series(store, [""])
        assert delete_series(store, []).hot_partitions_dropped == 0
