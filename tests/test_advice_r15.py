"""Round-15 ADVICE fixes, each with the race it closes.

1. (high) ``rewrite_files`` vs concurrent DV restat: the
   file-presence conflict check cannot see a ``restat`` — the file
   stays LISTED while a deletion vector erases rows from it. A
   compaction / Z-order / rewrite-mode merge that planned before the
   restat would commit replacement files materialized from the
   pre-DV bytes, silently resurrecting the deleted rows and
   discarding the racer's vector. Fix: ``scan_member_subset`` hands
   the planner the exact per-file DV state it filtered through
   (``plan`` out-param) and ``rewrite_files(plan_dv=...)`` CAS-checks
   it inside the optimistic-commit loop.

2. (low) ``_apply_dv_delete`` vs concurrent ``backfill_file_stats``:
   the DV attach used to ride a whole-block ``restat`` built from
   plan-time stats, clobbering a racing backfill's rows/cols back to
   plan-time values (``rows: None``). Fix: ``restat_overlay`` merges
   ONLY the ``dv`` field onto the file's commit-time stats block.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import RewriteConflictError
from redis_lsm_timeseries_spark.maintenance import (
    backfill_file_stats,
    compact_small_files,
    fast_count,
)
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)
from redis_lsm_timeseries_spark.operators.zorder import zorder_compact

SCHEMA = "k long, v string"


def _seed(spark, host, commit, path, n=100, files=4):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], SCHEMA
    ).repartitionByRange(files, "k").sortWithinPartitions("k")
    commit.rewrite_files(
        host, path, [],
        lambda tmp: df.write.mode("overwrite").parquet(tmp),
    )


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k long")


def _inject_on_first_stage(monkeypatch, inject):
    """Monkeypatch ``ManifestCommit._stage_in`` so ``inject(store)``
    runs ONCE, after the first staging completes and before the
    commit — the exact window the conflict checks must cover."""
    real = ManifestCommit._stage_in
    raced = {"done": False}

    def racing(self_, store, root, member, write_fn):
        files = real(self_, store, root, member, write_fn)
        if not raced["done"]:
            raced["done"] = True
            inject(store)
        return files

    monkeypatch.setattr(ManifestCommit, "_stage_in", racing)
    return raced


class TestRewriteVsConcurrentDvRestat:
    """ADVICE r14 (high): a DV restat landing between a rewrite's
    planning scan and its commit must CONFLICT, never be silently
    resurrected."""

    def _fx(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        _seed(spark, host, commit, path)
        return host, commit, path

    def test_compaction_conflicts_and_never_resurrects(
        self, spark, tmp_path, monkeypatch
    ):
        host, commit, path = self._fx(spark, tmp_path)

        def inject(store):
            st = delete_rows(
                store, path, _keys(spark, [7]), ["k"],
                commit=ManifestCommit(), mode="dv",
            )
            assert st.files_rewritten == 1

        raced = _inject_on_first_stage(monkeypatch, inject)
        st = compact_small_files(
            host, path, target_rows=1_000, commit=commit
        )
        assert raced["done"]
        # the group whose staging raced the restat must abort — a
        # silent commit here is exactly the resurrection bug
        assert st.conflicts >= 1
        rows = {
            r.k for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert 7 not in rows and 8 in rows
        monkeypatch.undo()
        # retry on fresh state: compaction folds AND materializes the
        # DV; the deleted row stays deleted and the debt is gone
        st2 = compact_small_files(
            host, path, target_rows=1_000, commit=commit
        )
        assert st2.groups >= 1 and st2.conflicts == 0
        rows2 = {
            r.k for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert 7 not in rows2 and len(rows2) == 99
        stats = commit.member_file_stats(host, path)
        assert not any((s or {}).get("dv") for s in stats.values())

    def test_rewrite_merge_conflicts_on_racing_dv_delete(
        self, spark, tmp_path, monkeypatch
    ):
        host, commit, path = self._fx(spark, tmp_path)

        def inject(store):
            delete_rows(
                store, path, _keys(spark, [2]), ["k"],
                commit=ManifestCommit(), mode="dv",
            )

        _inject_on_first_stage(monkeypatch, inject)
        src = spark.createDataFrame([(1, "N1")], SCHEMA)
        with pytest.raises(RewriteConflictError, match="deletion vector"):
            merge_into(host, path, src, ["k"], commit=commit)
        monkeypatch.undo()
        # the merge aborted atomically: key 1 untouched, the racing
        # delete of key 2 won
        got = {
            r.k: r.v
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got[1] == "v1" and 2 not in got
        # retry on fresh state plans THROUGH the new DV
        merge_into(host, path, src, ["k"], commit=commit)
        got2 = {
            r.k: r.v
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got2[1] == "N1" and 2 not in got2

    def test_zorder_conflicts_on_racing_dv_delete(
        self, spark, tmp_path, monkeypatch
    ):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        df = (
            spark.range(100)
            .selectExpr("id AS k", "id * 7 % 100 AS w")
            .repartitionByRange(4, "k")
            .sortWithinPartitions("k")
        )
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )

        def inject(store):
            delete_rows(
                store, path, _keys(spark, [50]), ["k"],
                commit=ManifestCommit(), mode="dv",
            )

        _inject_on_first_stage(monkeypatch, inject)
        with pytest.raises(RewriteConflictError, match="deletion vector"):
            zorder_compact(host, path, ["k", "w"], commit=commit)
        monkeypatch.undo()
        assert zorder_compact(host, path, ["k", "w"], commit=commit) == 4
        rows = {
            r.k for r in commit.read_table(host, path).collect()
        }
        assert 50 not in rows and len(rows) == 99


class TestDvOverlayPreservesConcurrentRestat:
    """ADVICE r14 (low): the DV attach merges ONLY the ``dv`` field
    onto the file's commit-time stats — a backfill landing between
    planning and commit survives."""

    def test_backfilled_rows_survive_dv_commit(
        self, spark, tmp_path, monkeypatch
    ):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        # the target file commits WITHOUT stats (pre-stats history)
        monkeypatch.setattr(
            ManifestCommit, "_file_stats", lambda self, *a, **k: {}
        )
        commit.append_tables(
            host, path,
            {"": spark.range(0, 100)
             .selectExpr("id AS k", "CAST(id AS STRING) AS v")
             .coalesce(1)},
        )
        monkeypatch.undo()

        def inject(store):
            assert backfill_file_stats(
                store, path, commit=ManifestCommit()
            ) == 1

        _inject_on_first_stage(monkeypatch, inject)
        st = delete_rows(
            host, path, _keys(spark, [3]), ["k"],
            commit=commit, mode="dv",
        )
        monkeypatch.undo()
        assert st.files_rewritten == 1
        (f,) = commit.member_files(host, path)
        blk = commit.member_file_stats(host, path)[f]
        # without the overlay, the plan-time block (rows: None)
        # clobbers the backfill and fast_count regresses to None
        assert blk["rows"] == 100
        assert blk["dv"]["count"] == 1
        assert blk["cols"]  # backfilled min/max survived too
        assert fast_count(host, path, commit=commit) == 99

    def test_plain_restat_blocks_still_replace_whole(
        self, spark, tmp_path
    ):
        """backfill_file_stats keeps whole-block semantics (it IS the
        authoritative re-derivation) — only the DV attach overlays."""
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path, {"": spark.range(10).coalesce(1)}
        )
        (f,) = commit.member_files(host, path)
        commit.rewrite_files(
            host, path, [], None,
            restat={f: {"rows": 10, "cols": {}, "marker": True}},
        )
        blk = commit.member_file_stats(host, path)[f]
        assert blk == {"rows": 10, "cols": {}, "marker": True}
