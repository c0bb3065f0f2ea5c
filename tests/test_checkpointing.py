"""Manifest checkpointing + delta log entries (round 12).

Every commit records only its DELTA (files added/removed per member,
their stats, app-map updates); a full-state checkpoint file lands
every ``CHECKPOINT_INTERVAL`` commits. Readers reconstruct a snapshot
from the newest anchor (checkpoint, or a legacy full entry) plus the
delta tail — the Delta checkpoint / Iceberg manifest-list structure.

Contract under test (the round-11 verdict's acceptance criterion):
entry size is bounded by the CHANGE, not the table — 200 commits
growing a member to ~5k files keep per-commit log writes O(delta) —
and reconstruction is byte-identical across entry forms, checkpoint
boundaries, vacuum horizons, and legacy full-entry history.
"""

from __future__ import annotations

import json
import os

import pytest

from redis_lsm_timeseries_spark.commit import (
    CHECKPOINT_SUFFIX,
    LOG_DIR,
    CommitHost,
    ManifestCommit,
)
from redis_lsm_timeseries_spark.errors import VersionNotFoundError

SCHEMA = "k string, v long"


def _fx(spark, tmp_path, name="t"):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / name)
    commit._target_for_write(host, path)  # create the managed root
    return host, commit, path


def _raw_commit(commit, host, root, add_files, member="", stats=None):
    """Protocol-level append of pre-named relpaths — exercises the log
    layer (delta encoding, checkpoints, reconstruction) without paying
    a Spark write per commit."""

    def mutate(tables):
        return {**tables, member: tables.get(member, []) + add_files}

    if stats:
        mutate.stats_add = {member: stats}
    return commit._commit(host, root, mutate)


def _log_files(path):
    return sorted(os.listdir(f"{path}/{LOG_DIR}"))


def _entries(path):
    return [
        f for f in _log_files(path)
        if f.endswith(".json") and f[:-5].isdigit()
    ]


def _checkpoints(path):
    return [f for f in _log_files(path) if f.endswith(CHECKPOINT_SUFFIX)]


class TestDeltaEntries:
    def test_200_commits_5k_files_entry_size_is_o_delta(
        self, spark, tmp_path
    ):
        """The verdict's acceptance test: 200 appends growing one
        member to 5,000 files. Every log entry's size must be bounded
        by the DELTA it records (25 files + stats), never by the
        accumulated table — the pre-r12 format re-serialized all ~5k
        file lists + stats in every entry."""
        host, commit, path = _fx(spark, tmp_path)
        expected: list[str] = []
        for i in range(200):
            batch = [f"part-{i:03d}-{j:02d}.parquet" for j in range(25)]
            stats = {
                f: {"rows": 100, "cols": {"v": {
                    "min": i * 100, "max": i * 100 + 99, "nulls": 0,
                }}}
                for f in batch
            }
            _raw_commit(commit, host, path, batch, stats=stats)
            expected.extend(batch)

        sizes = {
            int(f[:-5]): os.path.getsize(f"{path}/{LOG_DIR}/{f}")
            for f in _entries(path)
        }
        assert len(sizes) == 200
        # every entry bounded by its delta: the LAST entry (table at
        # ~5k files) must be no bigger than the FIRST (table at 25) —
        # both record exactly 25 files
        assert sizes[199] <= sizes[0] * 1.25
        assert max(sizes.values()) < 8_000  # ~25 files + stats as JSON
        # checkpoints exist; their MANIFESTS stay O(members) (r13
        # member-part format — the full state lives in content-
        # addressed part files readers assemble, so the every-10th-
        # commit manifest write never re-serializes the whole table)
        cps = _checkpoints(path)
        # versions 0..199: interval checkpoints at 10, 20, ..., 190
        assert len(cps) == 19
        cp_sizes = [
            os.path.getsize(f"{path}/{LOG_DIR}/{f}") for f in cps
        ]
        assert max(cp_sizes) < 500  # one part ref + app, not 5k files

        # reconstruction returns all 5,000 files in commit order
        files = commit.member_files(host, path)
        assert files == expected
        # stats survived reconstruction for skipping
        kept, total = commit.prune_files(
            host, path, {"v": (19_900, 19_950)}
        )
        assert total == 5_000 and kept == [
            f"part-199-{j:02d}.parquet" for j in range(25)
        ]

    def test_checkpoint_written_every_interval(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        for i in range(21):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        cps = _checkpoints(path)
        assert [int(f[: -len(CHECKPOINT_SUFFIX)]) for f in cps] == [10, 20]
        # a checkpoint is full state: its manifest + member parts
        # alone reconstruct version 10 (r13 parts format)
        state = commit._load_checkpoint(host, path, 10)
        assert len(state["tables"][""]) == 11

    def test_removal_deltas_and_order_preserved(self, spark, tmp_path):
        """A rewrite_files-shaped mutate (filter + extend) round-trips
        through the delta form preserving exact file order."""
        host, commit, path = _fx(spark, tmp_path)
        _raw_commit(commit, host, path, ["a.parquet", "b.parquet"])
        _raw_commit(commit, host, path, ["c.parquet"])

        def mutate(tables):
            kept = [f for f in tables[""] if f != "b.parquet"]
            return {**tables, "": kept + ["d.parquet"]}

        commit._commit(host, path, mutate)
        entry = json.loads(
            open(f"{path}/{LOG_DIR}/{2:020d}.json").read()
        )
        assert entry["delta"]["remove"][""] == ["b.parquet"]
        assert list(entry["delta"]["add"][""]) == ["d.parquet"]
        assert commit.member_files(host, path) == [
            "a.parquet", "c.parquet", "d.parquet"
        ]

    def test_inexpressible_mutate_falls_back_to_full_entry(
        self, spark, tmp_path
    ):
        """A mutate that REORDERS a member's files (no engine mutation
        does, but the protocol must stay correct for any mutate) is
        not delta-expressible — the entry falls back to the
        self-describing full form and anchors reconstruction."""
        host, commit, path = _fx(spark, tmp_path)
        _raw_commit(commit, host, path, ["a.parquet", "b.parquet"])
        commit._commit(
            host, path, lambda t: {**t, "": list(reversed(t[""]))}
        )
        entry = json.loads(
            open(f"{path}/{LOG_DIR}/{1:020d}.json").read()
        )
        assert "delta" not in entry
        assert entry["tables"][""] == ["b.parquet", "a.parquet"]
        assert commit.member_files(host, path) == [
            "b.parquet", "a.parquet"
        ]


class TestReconstruction:
    def test_time_travel_across_checkpoint_boundary(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        for i in range(25):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        for v in (0, 9, 10, 11, 19, 20, 24):
            files = commit.member_files(host, path, version=v)
            assert files == [f"f{i}.parquet" for i in range(v + 1)]

    def test_corrupt_checkpoint_falls_back_to_entry_chain(
        self, spark, tmp_path
    ):
        """Checkpoints are accelerators, not history: a corrupt one is
        skipped and the (intact) entry chain reconstructs the same
        state."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(12):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        cp = f"{path}/{LOG_DIR}/{10:020d}{CHECKPOINT_SUFFIX}"
        with open(cp, "w") as fh:
            fh.write("{corrupt")
        files = commit.member_files(host, path)
        assert files == [f"f{i}.parquet" for i in range(12)]

    def test_legacy_full_entry_history_reads_and_extends(
        self, spark, tmp_path
    ):
        """A log written by the pre-r12 engine (every entry a full
        snapshot, no checkpoints) reads unchanged, and new delta
        commits stack on top of it."""
        host, commit, path = _fx(spark, tmp_path)
        legacy = {
            "version": 0,
            "ts_ms": 1,
            "tables": {"": ["old0.parquet"]},
            "stats": {"": {"old0.parquet": {"rows": 5, "cols": {}}}},
            "app": {"cur": 7},
        }
        with open(f"{path}/{LOG_DIR}/{0:020d}.json", "w") as fh:
            fh.write(json.dumps(legacy))
        assert commit.member_files(host, path) == ["old0.parquet"]
        assert commit.read_app_meta(host, path) == {"cur": 7}
        _raw_commit(commit, host, path, ["new1.parquet"])
        assert commit.member_files(host, path) == [
            "old0.parquet", "new1.parquet"
        ]
        # legacy stats and app map carried through the delta commit
        stats = commit.member_file_stats(host, path)
        assert stats["old0.parquet"]["rows"] == 5
        assert commit.read_app_meta(host, path) == {"cur": 7}

    def test_app_map_merges_across_delta_entries(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)

        def with_meta(meta):
            def mutate(tables):
                return tables
            mutate.app_meta = meta
            return mutate

        commit._commit(host, path, with_meta({"a": 1}))
        commit._commit(host, path, with_meta({"b": 2}))
        commit._commit(host, path, with_meta({"a": 3}))
        assert commit.read_app_meta(host, path) == {"a": 3, "b": 2}
        # historical app states reconstruct too
        assert commit._load_entry(host, path, path, 1)["app"] == {
            "a": 1, "b": 2,
        }


class TestVacuumAnchoring:
    def test_vacuum_writes_anchor_at_oldest_retained(
        self, spark, tmp_path
    ):
        """Pruning entries below the horizon must leave the oldest
        retained version reconstructible: vacuum writes a checkpoint
        there first (delta entries alone cannot anchor)."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(15):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        commit.vacuum(host, path, grace_s=0)
        versions = commit.table_versions(host, path)
        assert versions == list(range(5, 15))
        # the anchor checkpoint exists at the oldest retained version
        assert os.path.exists(
            f"{path}/{LOG_DIR}/{5:020d}{CHECKPOINT_SUFFIX}"
        )
        # every retained version reconstructs exactly
        for v in versions:
            assert commit.member_files(host, path, version=v) == [
                f"f{i}.parquet" for i in range(v + 1)
            ]
        with pytest.raises(VersionNotFoundError):
            commit.member_files(host, path, version=4)

    def test_vacuum_aligns_cut_to_existing_anchor(self, spark, tmp_path):
        """The prune cut aligns DOWN to the newest checkpoint at or
        below the retention horizon (25 -> 20): vacuum prunes in
        interval-sized bursts and writes NO fresh anchor — the
        steady-state vacuum never pays an O(table) checkpoint write.
        The trailing versions 20..24 stay readable (a bounded bonus
        past the horizon)."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(35):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        assert [
            int(f[: -len(CHECKPOINT_SUFFIX)]) for f in _checkpoints(path)
        ] == [10, 20, 30]
        commit.vacuum(host, path, grace_s=0)
        # horizon is 25, but the cut aligns to checkpoint 20: 10 is
        # pruned, 20/30 survive, no new checkpoint appears
        assert [
            int(f[: -len(CHECKPOINT_SUFFIX)]) for f in _checkpoints(path)
        ] == [20, 30]
        assert commit.table_versions(host, path) == list(range(20, 35))
        for v in (20, 25, 34):
            assert commit.member_files(host, path, version=v) == [
                f"f{i}.parquet" for i in range(v + 1)
            ]

    def test_vacuum_respects_interval_checkpoint_anchor(
        self, spark, tmp_path
    ):
        """When the oldest retained version already sits ON an
        interval checkpoint, vacuum needs no extra anchor."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(20):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        commit.vacuum(host, path, retain_versions=10, grace_s=0)
        assert commit.table_versions(host, path) == list(range(10, 20))
        assert [
            int(f[: -len(CHECKPOINT_SUFFIX)]) for f in _checkpoints(path)
        ] == [10]


class TestEndToEndSpark:
    def test_real_appends_read_identically_across_the_boundary(
        self, spark, tmp_path
    ):
        """Twelve real Spark appends (spanning a checkpoint at v10),
        then a vacuum: full read, pruned read, and a time-travel read
        all reconstruct the same data as a plain union of the
        appended batches."""
        host, commit, path = _fx(spark, tmp_path)
        want = set()
        for i in range(12):
            commit.append_rows(host, [(f"k{i}", i)], SCHEMA, path)
            want.add((f"k{i}", i))
        got = {
            (r.k, r.v)
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got == want
        # version 9 predates the checkpoint at 10
        old = {
            (r.k, r.v)
            for r in commit.read_table(
                host, path, SCHEMA, version=9
            ).collect()
        }
        assert old == {(f"k{i}", i) for i in range(10)}
        pruned = {
            (r.k, r.v)
            for r in commit.read_table_pruned(
                host, path, SCHEMA, predicates={"v": (10, None)}
            ).collect()
        }
        assert pruned == {("k10", 10), ("k11", 11)}
        commit.vacuum(host, path, retain_versions=1, grace_s=0)
        got = {
            (r.k, r.v)
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got == want


class TestMemberPartCheckpoints:
    """r13 (VERDICT r12 #4): the every-INTERVAL checkpoint write is
    bounded by the members that CHANGED, not the table — a ~5k-file
    member sitting next to a busy small member is reused by reference
    across checkpoint generations; reconstruction stays byte-identical
    with and without the checkpoints; vacuum GCs parts exactly when no
    retained manifest references them."""

    def _manifest(self, path, v):
        return json.loads(
            open(f"{path}/{LOG_DIR}/{v:020d}{CHECKPOINT_SUFFIX}").read()
        )

    def _parts_dir(self, path):
        return f"{path}/{LOG_DIR}/parts"

    def test_unchanged_big_member_is_reused_by_reference(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        big = [f"big-{i:04d}.parquet" for i in range(5_000)]
        stats = {
            f: {"rows": 10, "cols": {"v": {"min": i, "max": i, "nulls": 0}}}
            for i, f in enumerate(big)
        }
        _raw_commit(commit, host, path, big, member="big", stats=stats)
        # drive to the first checkpoint (v10) with small-member churn
        for i in range(10):
            _raw_commit(
                commit, host, path, [f"s{i}.parquet"], member="small"
            )
        parts = sorted(os.listdir(self._parts_dir(path)))
        sizes_v10 = {
            p: os.path.getsize(f"{self._parts_dir(path)}/{p}")
            for p in parts
        }
        m10 = self._manifest(path, 10)
        big_sha = m10["parts"]["big"]
        # ten more small commits -> checkpoint v20
        for i in range(10, 20):
            _raw_commit(
                commit, host, path, [f"s{i}.parquet"], member="small"
            )
        m20 = self._manifest(path, 20)
        # the acceptance criterion: the big member's part is REUSED
        assert m20["parts"]["big"] == big_sha
        new_parts = {
            p: os.path.getsize(f"{self._parts_dir(path)}/{p}")
            for p in sorted(os.listdir(self._parts_dir(path)))
            if p not in sizes_v10
        }
        big_bytes = sizes_v10[f"{big_sha}.json"]
        # everything written for v20 is the small member's part —
        # orders of magnitude below the big part
        assert sum(new_parts.values()) < big_bytes / 50
        # and the manifest itself is O(members)
        assert os.path.getsize(
            f"{path}/{LOG_DIR}/{20:020d}{CHECKPOINT_SUFFIX}"
        ) < 400

    def test_reconstruction_identical_with_and_without_checkpoints(
        self, spark, tmp_path
    ):
        import shutil

        host, commit, path = _fx(spark, tmp_path)
        _raw_commit(
            commit, host, path,
            [f"b{i}.parquet" for i in range(50)], member="big",
        )
        for i in range(13):
            _raw_commit(
                commit, host, path, [f"s{i}.parquet"], member="small"
            )
        v, with_cp = commit._reconstruct(host, path)
        # clone the log WITHOUT checkpoints/parts into a fresh root:
        # same entries, forced full entry-chain walk, fresh cache keys
        alt = str(tmp_path / "alt")
        os.makedirs(f"{alt}/{LOG_DIR}")
        for f in os.listdir(f"{path}/{LOG_DIR}"):
            if f.endswith(".json") and f[:-5].isdigit():
                shutil.copy(
                    f"{path}/{LOG_DIR}/{f}", f"{alt}/{LOG_DIR}/{f}"
                )
        v2, without_cp = commit._reconstruct(host, alt)
        assert v2 == v
        assert without_cp == with_cp

    def test_vacuum_gcs_unreferenced_parts_keeps_referenced(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        big = [f"b{i}.parquet" for i in range(40)]
        _raw_commit(commit, host, path, big, member="big")
        for i in range(25):
            _raw_commit(
                commit, host, path, [f"s{i}.parquet"], member="small"
            )
        pd = self._parts_dir(path)
        before = set(os.listdir(pd))
        assert len(before) >= 3  # big part + small parts per interval
        commit.vacuum(host, path, grace_s=0)
        after = set(os.listdir(pd))
        # every surviving manifest's references are present...
        referenced = set()
        for f in _checkpoints(path):
            m = json.loads(open(f"{path}/{LOG_DIR}/{f}").read())
            referenced.update(
                f"{sha}.json" for sha in m.get("parts", {}).values()
            )
        assert referenced <= after
        # ...and nothing else survived
        assert after == referenced
        # reconstruction is intact after the GC
        files = commit.member_files(host, f"{path}/big")
        assert files == big

    def test_vacuum_sweeps_stale_claim_files(self, spark, tmp_path):
        """ADVICE r12: a crash between create_exclusive's temp write
        and its cleanup leaves `.claim-*` orphans in _log/ forever —
        vacuum sweeps those past the grace window."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(3):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        import time as _time

        claim = f"{path}/{LOG_DIR}/{99:020d}.json.claim-deadbeef"
        open(claim, "w").write("{}")
        # within the grace window (age_seconds is ctime-based, so a
        # just-created claim is always "fresh") the claim survives —
        # it may be an in-flight commit's temp. The sweep age is
        # FLOORED at VACUUM_GRACE_S even for grace_s=0 callers
        # (sweeping an in-flight temp would force the committer onto
        # the non-atomic fallback — the zero-byte-entry race), so the
        # "past the window" leg shrinks the class grace instead.
        commit.vacuum(host, path, grace_s=0)
        assert os.path.exists(claim)
        real = ManifestCommit.VACUUM_GRACE_S
        ManifestCommit.VACUUM_GRACE_S = 0.2
        try:
            _time.sleep(0.3)
            commit.vacuum(host, path, grace_s=0)
            assert not os.path.exists(claim)
        finally:
            ManifestCommit.VACUUM_GRACE_S = real

    def test_legacy_single_blob_checkpoint_still_loads(
        self, spark, tmp_path
    ):
        """A checkpoint written by the r12 engine (full state in one
        JSON blob) anchors reconstruction unchanged."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(12):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        legacy = {
            "version": 10,
            "ts_ms": 1,
            "tables": {"": [f"f{i}.parquet" for i in range(11)]},
        }
        cp = f"{path}/{LOG_DIR}/{10:020d}{CHECKPOINT_SUFFIX}"
        os.remove(cp)
        open(cp, "w").write(json.dumps(legacy))
        # bust the cache: reconstruct a version whose chain must use
        # the legacy anchor (fresh commit invalidates cached newest)
        _raw_commit(commit, host, path, ["f12.parquet"])
        assert commit.member_files(host, path) == [
            f"f{i}.parquet" for i in range(13)
        ]
        assert commit.member_files(host, path, version=11) == [
            f"f{i}.parquet" for i in range(12)
        ]

    def test_missing_part_falls_back_to_entry_chain(
        self, spark, tmp_path
    ):
        """A checkpoint whose part file vanished behaves like a
        corrupt checkpoint: skipped, entry chain reconstructs."""
        host, commit, path = _fx(spark, tmp_path)
        for i in range(12):
            _raw_commit(commit, host, path, [f"f{i}.parquet"])
        m = self._manifest(path, 10)
        os.remove(f"{self._parts_dir(path)}/{m['parts']['']}.json")
        _raw_commit(commit, host, path, ["f12.parquet"])  # bust cache
        assert commit.member_files(host, path, version=11) == [
            f"f{i}.parquet" for i in range(12)
        ]
