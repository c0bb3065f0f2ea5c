"""Concurrency fuzz of the round-12 delta-log layer: racing
committers, racing vacuums, interval checkpoints, and in-flight
readers must never lose a commit, tear a snapshot, or leave a
retained version unreconstructible.

Protocol-level (raw ``_commit`` mutations, no Spark jobs): the
put-if-absent version race, the reconstruction walk, checkpoint
writing, the signature-keyed cache, and vacuum's anchor-then-prune
are exactly the code under test — data file IO would only slow the
interleavings down.
"""

from __future__ import annotations

import threading

from redis_lsm_timeseries_spark.commit import (
    CommitHost,
    ManifestCommit,
)
from redis_lsm_timeseries_spark.errors import ConcurrentMaintenanceError


def _fx(spark, tmp_path, name="t"):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / name)
    commit._target_for_write(host, path)
    return host, commit, path


def _add(commit, host, root, fname, retries=6):
    """One optimistic append commit, retried across exhausted races
    (the caller-level retry the protocol documents)."""
    def mutate(tables, f=fname):
        return {**tables, "": tables.get("", []) + [f]}

    for attempt in range(retries):
        try:
            return commit._commit(host, root, mutate)
        except ConcurrentMaintenanceError:
            if attempt == retries - 1:
                raise


class TestRacingCommitters:
    def test_no_commit_lost_versions_contiguous(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        threads_n, per = 3, 8
        errs = []

        def writer(tag):
            try:
                for i in range(per):
                    _add(commit, host, path, f"{tag}-{i:02d}.parquet")
            except Exception as exc:  # surfaced after join
                errs.append(exc)

        ts = [
            threading.Thread(target=writer, args=(f"w{t}",))
            for t in range(threads_n)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        versions = commit.table_versions(host, path)
        assert versions == list(range(threads_n * per))
        files = commit.member_files(host, path)
        assert len(files) == threads_n * per
        assert len(set(files)) == len(files)  # no duplicates
        # per-writer order preserved (each commit appends at the tail)
        for t in range(threads_n):
            own = [f for f in files if f.startswith(f"w{t}-")]
            assert own == sorted(own)
        # every version reconstructs to exactly version+1 files —
        # across checkpoint boundaries and cache hits alike
        for v in versions:
            assert len(
                commit.member_files(host, path, version=v)
            ) == v + 1

    def test_reader_snapshots_are_never_torn(self, spark, tmp_path):
        """A reader racing a committer sees, at every poll, a snapshot
        where file count == version+1 (each commit adds exactly one
        file) — never a partially-applied delta chain."""
        host, commit, path = _fx(spark, tmp_path)
        _add(commit, host, path, "seed.parquet")
        stop = threading.Event()
        bad = []

        def reader():
            r = ManifestCommit()  # separate instance: cold caches
            while not stop.is_set():
                entry = r._load_entry(host, path, path)
                v, files = entry["version"], entry["tables"].get("", [])
                if v >= 0 and len(files) != v + 1:
                    bad.append((v, len(files)))

        t = threading.Thread(target=reader)
        t.start()
        try:
            for i in range(25):
                _add(commit, host, path, f"f{i:02d}.parquet")
        finally:
            stop.set()
            t.join()
        assert not bad, bad


class TestVacuumRaces:
    def test_vacuum_racing_commits_keeps_everything_live(
        self, spark, tmp_path
    ):
        """Leaseless vacuums interleaved with commits (the
        rewrite_files shape): no commit lost, the current snapshot
        intact, every retained version reconstructible, log bounded."""
        host, commit, path = _fx(spark, tmp_path)
        errs = []

        def writer(tag, n=15):
            try:
                for i in range(n):
                    _add(commit, host, path, f"{tag}-{i:02d}.parquet")
            except Exception as exc:
                errs.append(exc)

        def vacuumer(n=10):
            v = ManifestCommit()
            try:
                for _ in range(n):
                    v.vacuum(host, path, grace_s=0)
            except Exception as exc:
                errs.append(exc)

        ts = [
            threading.Thread(target=writer, args=("a",)),
            threading.Thread(target=writer, args=("b",)),
            threading.Thread(target=vacuumer),
            threading.Thread(target=vacuumer),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        files = commit.member_files(host, path)
        assert len(files) == 30 and len(set(files)) == 30
        # one more vacuum settles retention; all survivors reconstruct
        commit.vacuum(host, path, grace_s=0)
        versions = commit.table_versions(host, path)
        assert len(versions) <= commit.KEEP_LOG_ENTRIES
        assert versions[-1] == 29
        for v in versions:
            got = commit.member_files(host, path, version=v)
            assert len(got) == v + 1

    def test_cache_never_serves_cross_table_state(self, spark, tmp_path):
        """Two roots committing concurrently: the process-wide
        reconstruction cache is keyed by root and never bleeds state
        across tables."""
        host, commit, pa = _fx(spark, tmp_path, "ta")
        _, _, pb = _fx(spark, tmp_path, "tb")
        errs = []

        def writer(root, tag, n=12):
            try:
                for i in range(n):
                    _add(commit, host, root, f"{tag}-{i:02d}.parquet")
            except Exception as exc:
                errs.append(exc)

        ts = [
            threading.Thread(target=writer, args=(pa, "a")),
            threading.Thread(target=writer, args=(pb, "b")),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        fa = commit.member_files(host, pa)
        fb = commit.member_files(host, pb)
        assert all(f.startswith("a-") for f in fa) and len(fa) == 12
        assert all(f.startswith("b-") for f in fb) and len(fb) == 12
