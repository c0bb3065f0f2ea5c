"""Exactly-once change-feed mirroring (``changefeed.mirror_changes``):
the consumer cursor commits atomically with the mirrored rows, so a
crash at any point replays to the uninterrupted state; non-append
source history triggers a cursor-correct full resync; unrelated
destination commits never wipe the cursor."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.changefeed import mirror_changes
from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError

SCHEMA = "k long, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def env(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    commit.append_table_with_meta(
        host, src, _df(spark, [(1, "a"), (2, "b")]), {}
    )
    return host, commit, src, dst


def _rows(spark, host, commit, path):
    return sorted(
        (r.k, r.v)
        for r in commit.read_table(host, path, SCHEMA).collect()
    )


class TestMirror:
    def test_initial_then_incremental_then_noop(self, spark, env):
        host, commit, src, dst = env
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("initial", 2)
        assert _rows(spark, host, commit, dst) == [(1, "a"), (2, "b")]
        commit.append_table_with_meta(host, src, _df(spark, [(3, "c")]), {})
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("incremental", 1)
        assert _rows(spark, host, commit, dst) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]
        m = mirror_changes(host, src, dst)
        assert m.mode == "noop"
        assert _rows(spark, host, commit, dst) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]

    def test_each_row_mirrored_exactly_once_across_many_steps(
        self, spark, env
    ):
        host, commit, src, dst = env
        mirror_changes(host, src, dst)
        for i in range(4, 10):
            commit.append_table_with_meta(
                host, src, _df(spark, [(i, f"v{i}")]), {}
            )
            if i % 2 == 0:
                mirror_changes(host, src, dst)
        mirror_changes(host, src, dst)
        want = [(1, "a"), (2, "b")] + [
            (i, f"v{i}") for i in range(4, 10)
        ]
        assert _rows(spark, host, commit, dst) == sorted(want)

    def test_crash_before_commit_replays_exactly_once(
        self, spark, env
    ):
        host, commit, src, dst = env
        mirror_changes(host, src, dst)
        commit.append_table_with_meta(host, src, _df(spark, [(3, "c")]), {})
        real = ManifestCommit._commit
        calls = {"n": 0}

        def crashy(self_, store, root, mutate):
            calls["n"] += 1
            raise RuntimeError("killed before commit")

        ManifestCommit._commit = crashy
        try:
            with pytest.raises(RuntimeError):
                mirror_changes(host, src, dst)
        finally:
            ManifestCommit._commit = real
        # nothing landed: neither rows nor cursor
        assert _rows(spark, host, commit, dst) == [(1, "a"), (2, "b")]
        # replay converges
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("incremental", 1)
        assert _rows(spark, host, commit, dst) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]

    def test_unrelated_dst_commit_keeps_cursor(self, spark, env):
        """Another writer appending to the destination root must not
        wipe the mirror cursor — app meta carries forward."""
        host, commit, src, dst = env
        mirror_changes(host, src, dst)
        commit.append_rows(host, [(100, "other")], SCHEMA, dst)
        commit.append_table_with_meta(host, src, _df(spark, [(3, "c")]), {})
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("incremental", 1)
        got = _rows(spark, host, commit, dst)
        assert (100, "other") in got and (3, "c") in got
        # (1,"a") present exactly once — no re-initial
        assert got.count((1, "a")) == 1

    def test_source_rewrite_triggers_full_resync(self, spark, env):
        host, commit, src, dst = env
        mirror_changes(host, src, dst)
        # compaction rewrites the source history: file diff impossible
        snap = commit.read_table(host, src, SCHEMA)
        rows = [(r.k, r.v) for r in snap.collect()] + [(3, "c")]
        commit.snapshot_rewrite(
            host, src,
            lambda tmp: _df(spark, rows)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp),
        )
        m = mirror_changes(host, src, dst)
        assert m.mode == "resync"
        assert _rows(spark, host, commit, dst) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]
        # and the world keeps turning incrementally afterwards
        commit.append_table_with_meta(host, src, _df(spark, [(4, "d")]), {})
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("incremental", 1)

    def test_transform_applies_to_delta(self, spark, env):
        from pyspark.sql import functions as F

        host, commit, src, dst = env
        keep_even = lambda df: df.where(F.col("k") % 2 == 0)  # noqa: E731
        mirror_changes(host, src, dst, transform=keep_even)
        commit.append_table_with_meta(
            host, src, _df(spark, [(3, "c"), (4, "d")]), {}
        )
        mirror_changes(host, src, dst, transform=keep_even)
        assert _rows(spark, host, commit, dst) == [(2, "b"), (4, "d")]

    def test_two_app_ids_track_independent_cursors(self, spark, env):
        host, commit, src, dst = env
        dst2 = dst + "2"
        mirror_changes(host, src, dst, app_id="a")
        commit.append_table_with_meta(host, src, _df(spark, [(3, "c")]), {})
        mirror_changes(host, src, dst2, app_id="b")  # initial sees all 3
        mirror_changes(host, src, dst, app_id="a")
        assert _rows(spark, host, commit, dst) == _rows(
            spark, host, commit, dst2
        )

    def test_unmanaged_source_raises(self, spark, tmp_path, env):
        host, commit, _, dst = env
        plain = str(tmp_path / "plain")
        _df(spark, [(1, "a")]).write.parquet(plain)
        with pytest.raises(ValidationError, match="manifest"):
            mirror_changes(host, plain, dst)

    def test_cursor_ahead_of_source_raises(self, spark, env):
        host, commit, src, dst = env
        commit.append_table_with_meta(host, src, _df(spark, [(3, "c")]), {})
        mirror_changes(host, src, dst)  # cursor = source version 1
        # simulate a rebuilt source log: cursor 1 vs fresh log at 0
        import shutil

        shutil.rmtree(src)
        commit.append_table_with_meta(
            host, src, _df(spark, [(9, "z")]), {}
        )
        with pytest.raises(ValidationError, match="ahead"):
            mirror_changes(host, src, dst)


class TestAppMetaConcurrency:
    def test_racing_meta_commits_both_survive(self, spark, env):
        """Two writers racing commits with different app keys: the
        optimistic-commit retry re-reads the current app map, so the
        loser's entry carries the winner's cursor forward — neither
        key is lost."""
        import threading

        host, commit, src, _ = env
        errs = []

        def writer(key):
            try:
                for i in range(3):
                    ManifestCommit().append_table_with_meta(
                        host, src,
                        _df(spark, [(1000 + i, key)]),
                        {key: i},
                    )
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        ts = [
            threading.Thread(target=writer, args=(k,))
            for k in ("cur:a", "cur:b")
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        app = commit.read_app_meta(host, src)
        assert app.get("cur:a") == 2 and app.get("cur:b") == 2


class TestVacuumedCursor:
    def test_lagging_mirror_resyncs_after_source_vacuum(
        self, spark, env
    ):
        """A mirror lagging past vacuum's retained horizon cannot
        read its delta — it must full-resync, not crash."""
        host, commit, src, dst = env
        mirror_changes(host, src, dst)
        # many source commits, then aggressive vacuum prunes history
        for i in range(4):
            commit.append_table_with_meta(
                host, src, _df(spark, [(10 + i, f"v{i}")]), {}
            )
        commit.vacuum(host, src, retain_versions=1)
        m = mirror_changes(host, src, dst)
        assert m.mode == "resync"
        assert _rows(spark, host, commit, dst) == _rows(
            spark, host, commit, src
        )
