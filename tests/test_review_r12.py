"""Fixes from the round-12 self-review — each test pins a failure a
reviewer demonstrated concretely:

- vacuum must ABORT (pruning nothing) when it cannot anchor the
  oldest retained version with a checkpoint, else every retained
  snapshot becomes unreconstructible;
- the keyed mirror's data-mutating commits carry the cursor CAS, so
  a racing consumer conflicts BEFORE overwriting newer mirrored data
  with stale values;
- keyed netting is deterministic under duplicate-key append rows
  (full-row tie-break), so crash replay picks the same survivor;
- MergeStats.rows_upserted reports rows the clauses ACTUALLY applied;
- temporal Z-order columns rank by their epoch numeric instead of
  crashing in float();
- create_exclusive degrades gracefully on filesystems without hard
  links.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.changefeed import mirror_changes
from redis_lsm_timeseries_spark.commit import (
    CHECKPOINT_SUFFIX,
    LOG_DIR,
    CommitHost,
    ManifestCommit,
)
from redis_lsm_timeseries_spark.errors import (
    ConcurrentMaintenanceError,
    RewriteConflictError,
)
from redis_lsm_timeseries_spark.operators.merge import merge_into

SCHEMA = "k long, v string"


def _fx(spark, tmp_path, name="t"):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / name)
    commit._target_for_write(host, path)
    return host, commit, path


def _add(commit, host, root, fname):
    def mutate(tables):
        return {**tables, "": tables.get("", []) + [fname]}

    return commit._commit(host, root, mutate)


class TestVacuumAnchorAbort:
    def test_failed_anchor_write_aborts_before_pruning(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        for i in range(15):
            _add(commit, host, path, f"f{i}.parquet")
        real = ManifestCommit._write_checkpoint
        # the interval checkpoint at v10 must not rescue the vacuum:
        # drop it so the anchor at the cut boundary is load-bearing
        os.remove(f"{path}/{LOG_DIR}/{10:020d}{CHECKPOINT_SUFFIX}")
        ManifestCommit._write_checkpoint = (
            lambda self, *a, **k: False  # simulated IO failure
        )
        try:
            with pytest.raises(ConcurrentMaintenanceError):
                commit.vacuum(host, path, grace_s=0)
        finally:
            ManifestCommit._write_checkpoint = real
        # NOTHING was pruned: all 15 entries still reconstruct
        assert commit.table_versions(host, path) == list(range(15))
        assert len(commit.member_files(host, path)) == 15
        # and a later healthy vacuum succeeds
        commit.vacuum(host, path, grace_s=0)
        assert len(commit.table_versions(host, path)) == 10


class TestKeyedMirrorRace:
    def test_racing_consumer_conflicts_before_mutating(
        self, spark, tmp_path
    ):
        """Consumer A plans, consumer B completes a full step, then
        A's MERGE must raise — A's stale delta must never land on the
        destination at all (not merely fail at the cursor commit
        after overwriting newer data)."""
        host, commit = CommitHost(spark), ManifestCommit()
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        commit.append_table_with_meta(
            host, src,
            spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA), {},
        )
        mirror_changes(host, src, dst, keys=["k"], commit=commit)
        merge_into(
            host, src, spark.createDataFrame([(1, "v7")], SCHEMA),
            ["k"], commit=commit,
        )

        real = ManifestCommit.read_app_meta
        fired = {"done": False}

        def hijack(self_, store, path_):
            out = real(self_, store, path_)
            if path_ == dst and not fired["done"]:
                fired["done"] = True
                # B completes a FULL step while A holds its plan —
                # including a newer source change A has not seen
                merge_into(
                    host, src,
                    spark.createDataFrame([(1, "v8")], SCHEMA),
                    ["k"], commit=commit,
                )
                mirror_changes(host, src, dst, keys=["k"],
                               commit=commit)
            return out

        ManifestCommit.read_app_meta = hijack
        try:
            with pytest.raises(RewriteConflictError):
                mirror_changes(host, src, dst, keys=["k"],
                               commit=commit)
        finally:
            ManifestCommit.read_app_meta = real
        # the mirror holds B's NEWER value — A's stale v7 never landed
        got = {
            r.k: r.v
            for r in commit.read_table(host, dst, SCHEMA).collect()
        }
        assert got[1] == "v8"
        # and the next run is a clean noop
        assert mirror_changes(
            host, src, dst, keys=["k"], commit=commit
        ).mode == "noop"


class TestDeterministicNetting:
    def test_duplicate_key_append_nets_identically_everywhere(
        self, spark, tmp_path
    ):
        """A source append violating key uniqueness nets to the SAME
        survivor on every independent consumer (full-row tie-break),
        so replay and parallel mirrors agree."""
        host, commit = CommitHost(spark), ManifestCommit()
        src = str(tmp_path / "src")
        commit.append_table_with_meta(
            host, src, spark.createDataFrame([(1, "a")], SCHEMA), {}
        )
        dsts = [str(tmp_path / f"d{i}") for i in range(3)]
        for d in dsts:
            mirror_changes(host, src, d, keys=["k"], commit=commit)
        # one commit carrying duplicate-key rows
        commit.append_table_with_meta(
            host, src,
            spark.createDataFrame(
                [(7, "x"), (7, "y"), (7, "z")], SCHEMA
            ).coalesce(1),
            {},
        )
        got = []
        for d in dsts:
            mirror_changes(host, src, d, keys=["k"], commit=commit)
            got.append(sorted(
                (r.k, r.v)
                for r in commit.read_table(host, d, SCHEMA).collect()
            ))
        assert got[0] == got[1] == got[2]
        assert got[0] == [(1, "a"), (7, "z")]  # greatest row wins


class TestMergeStatsApplied:
    def test_conditional_merge_reports_applied_rows(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], SCHEMA
        ).coalesce(1)
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )
        # 3 matched rows, condition true for exactly one ('zz' > 'v5')
        src = spark.createDataFrame(
            [(4, "a4"), (5, "zz"), (6, "a6")], SCHEMA
        )
        st = merge_into(
            host, path, src, ["k"], commit=commit,
            matched_condition="s.v > t.v",
        )
        assert st.rows_upserted == 1
        # matched-delete applies zero upserts
        st = merge_into(
            host, path,
            spark.createDataFrame([(1, "x"), (99, "x")], SCHEMA),
            ["k"], commit=commit,
            when_matched="delete", insert_unmatched=False,
        )
        assert st.rows_upserted == 0
        # insert-if-absent counts only the inserts
        st = merge_into(
            host, path,
            spark.createDataFrame([(2, "no"), (200, "new")], SCHEMA),
            ["k"], commit=commit, when_matched=None,
        )
        assert st.rows_upserted == 1


class TestTemporalZorder:
    def test_timestamp_column_clusters_and_prunes(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.operators.zorder import (
            zorder_rewrite,
        )

        host, commit, path = _fx(spark, tmp_path)
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i % 16, base + datetime.timedelta(hours=i), f"p{i}")
            for i in range(512)
        ]
        df = spark.createDataFrame(
            rows, "g long, ev timestamp_ntz, payload string"
        ).repartition(8)
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )
        zorder_rewrite(host, path, ["g", "ev"], target_files=8,
                       commit=commit)
        lo = base + datetime.timedelta(hours=400)
        kept, total = commit.prune_files(host, path, {"ev": (lo, None)})
        assert total == 8 and 0 < len(kept) < total
        kept2, _ = commit.prune_files(
            host, path, {"g": (0, 3), "ev": (lo, None)}
        )
        assert len(kept2) <= len(kept)
        # row-exactness through the pruned read
        sch = "g long, ev timestamp_ntz, payload string"
        want = (
            commit.read_table(host, path, sch)
            .where(F.col("ev") >= F.lit(lo)).count()
        )
        got = (
            commit.read_table_pruned(
                host, path, sch, predicates={"ev": (lo, None)}
            ).where(F.col("ev") >= F.lit(lo)).count()
        )
        assert got == want == 112

    def test_date_column_ranks(self, spark):
        from redis_lsm_timeseries_spark.operators.zorder import (
            column_bounds,
            zorder_key,
        )

        df = spark.createDataFrame(
            [
                (i, datetime.date(2024, 1, 1)
                 + datetime.timedelta(days=i))
                for i in range(32)
            ],
            "k long, d date",
        )
        b = column_bounds(df, ["k", "d"])
        assert b["d"]["kind"] == "d"
        out = df.select(
            "k", zorder_key(["k", "d"], b, bits=8).alias("z")
        ).collect()
        # both dims advance together -> z strictly increases with k
        zs = [r.z for r in sorted(out, key=lambda r: r.k)]
        assert zs == sorted(zs) and len(set(zs)) == 32


class TestCreateExclusiveFallback:
    def test_no_hardlink_filesystem_degrades(self, tmp_path, monkeypatch):
        from redis_lsm_timeseries_spark.fs import LOCAL_FS

        def no_link(src, dst):
            raise OSError(95, "Operation not supported")

        monkeypatch.setattr(os, "link", no_link)
        p = str(tmp_path / "claim.json")
        assert LOCAL_FS.create_exclusive(p, '{"a": 1}') is True
        assert LOCAL_FS.read_text(p) == '{"a": 1}'
        assert LOCAL_FS.create_exclusive(p, '{"a": 2}') is False
        assert LOCAL_FS.read_text(p) == '{"a": 1}'
