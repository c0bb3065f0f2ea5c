"""Manifest per-file column statistics + data skipping (round 11).

Every ``ManifestCommit`` mutation records min/max/null-count per file
(parquet footers + hive path segments) in the SAME atomic log entry as
the file list — the Delta ``stats``-per-add-action idiom — and
``read_table_pruned``/``prune_files`` plan scans over only the files
whose stats overlap a predicate. At 100 TB this is what keeps a
narrow range read over years of cold snapshots from listing/opening
every file ever evicted.

Contract under test: pruning is a SUPERSET guard — a file is dropped
only when its stats prove no row matches; files without stats always
survive; the caller's row filter is still mandatory and results are
bit-identical with and without skipping.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import LOG_DIR, ManifestCommit
from redis_lsm_timeseries_spark.config import EngineConfig
from redis_lsm_timeseries_spark.store import TimeseriesStore

SCHEMA = "k string, v long"


@pytest.fixture()
def mstore(spark, tmp_path):
    cfg = EngineConfig(root=str(tmp_path / "engine"), partition_width=5)
    s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
    s.initialize()
    return s


def _table(mstore, name="t"):
    return f"{mstore.config.base_path}/{name}"


def _newest_entry(path):
    logs = sorted(
        f for f in os.listdir(f"{path}/{LOG_DIR}")
        if f.endswith(".json") and f[:-5].isdigit()
    )
    return json.loads(open(f"{path}/{LOG_DIR}/{logs[-1]}").read())


def _snapshot(mstore, path):
    """Reconstructed current snapshot ({'tables','stats','app'}): log
    entries are DELTAS since round 12, so per-snapshot assertions go
    through the commit API's reconstruction, the readers' source of
    truth."""
    c = mstore.commit
    root, _ = c._resolve(mstore, path)
    return c._load_entry(mstore, path, root)


class TestStatsRecording:
    def test_append_records_min_max_nulls(self, mstore):
        c, path = mstore.commit, _table(mstore)
        c.append_rows(
            mstore, [("a", 1), ("b", 2), (None, 3)], SCHEMA, path
        )
        entry = _snapshot(mstore, path)
        (rel,) = entry["tables"][""]
        fstats = entry["stats"][""][rel]
        assert fstats["rows"] == 3
        st = fstats["cols"]
        assert st["v"] == {"min": 1, "max": 3, "nulls": 0}
        assert st["k"]["min"] == "a" and st["k"]["max"] == "b"
        assert st["k"]["nulls"] == 1

    def test_hive_partition_segments_become_stats(self, mstore):
        c, path = mstore.commit, _table(mstore)
        df = mstore.spark.createDataFrame(
            [("x", 1, 10), ("y", 2, 20)], "k string, p long, v long"
        )
        c.append_partitioned(mstore, df, path, ["p"])
        entry = _snapshot(mstore, path)
        for rel in entry["tables"][""]:
            st = entry["stats"][""][rel]["cols"]
            pval = int(rel.split("/")[0].split("=")[1])
            assert st["p"] == {"min": pval, "max": pval, "nulls": 0}

    def test_rewrite_sheds_dead_files_stats(self, mstore):
        """Stats keys track the file list exactly through a rewrite —
        no stats entries for vacuum-dead files accumulate in the log."""
        c, path = mstore.commit, _table(mstore)
        c.append_rows(mstore, [("a", 1)], SCHEMA, path)
        c.append_rows(mstore, [("b", 2)], SCHEMA, path)

        def write_snapshot(tmp):
            c.read_table(mstore, path, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)

        c.snapshot_rewrite(mstore, path, write_snapshot)
        entry = _snapshot(mstore, path)
        assert set(entry["stats"][""]) == set(entry["tables"][""])
        assert len(entry["tables"][""]) == 1

    def test_append_tables_stats_cover_every_member(self, mstore):
        c, root = mstore.commit, _table(mstore, "multi")
        a = mstore.spark.createDataFrame([("a", 1)], SCHEMA)
        b = mstore.spark.createDataFrame([("b", 9)], SCHEMA)
        c.append_tables(mstore, root, {"out": a, "digests": b})
        entry = _snapshot(mstore, root)
        for member in ("out", "digests"):
            assert set(entry["stats"][member]) == set(
                entry["tables"][member]
            )
        # the empty shuffle files are provably prunable by row count
        kept, total = c.prune_files(mstore, f"{root}/out", {})
        assert total == len(entry["tables"]["out"]) and len(kept) == 1


class TestPruning:
    def _two_file_table(self, mstore):
        c, path = mstore.commit, _table(mstore)
        c.append_rows(mstore, [("a", 1), ("b", 2)], SCHEMA, path)
        c.append_rows(mstore, [("y", 100), ("z", 200)], SCHEMA, path)
        return c, path

    def test_prunes_provably_disjoint_files(self, mstore):
        c, path = self._two_file_table(mstore)
        kept, total = c.prune_files(mstore, path, {"v": (50, None)})
        assert total == 2 and len(kept) == 1
        kept, total = c.prune_files(mstore, path, {"v": (None, 10)})
        assert len(kept) == 1
        # string column bounds prune too
        kept, _ = c.prune_files(mstore, path, {"k": ("x", "zz")})
        assert len(kept) == 1
        # both predicates together: empty intersection
        kept, _ = c.prune_files(
            mstore, path, {"v": (50, None), "k": ("a", "c")}
        )
        assert kept == []

    def test_pruned_read_equals_filtered_full_read(self, mstore):
        c, path = self._two_file_table(mstore)
        pred = {"v": (50, None)}
        full = {
            (r.k, r.v)
            for r in c.read_table(mstore, path, SCHEMA)
            .where("v >= 50")
            .collect()
        }
        pruned = {
            (r.k, r.v)
            for r in c.read_table_pruned(
                mstore, path, SCHEMA, predicates=pred
            )
            .where("v >= 50")
            .collect()
        }
        assert pruned == full == {("y", 100), ("z", 200)}

    def test_file_without_stats_always_survives(self, mstore):
        """Backward compatibility: entries written before the stats
        feature (or whose footers were unreadable) have no stats map —
        their files must never be pruned."""
        c, path = self._two_file_table(mstore)
        # strip the stats from every raw entry, both forms (full
        # entries carry a "stats" map, delta entries carry per-added-
        # file stats inline)
        logs = sorted(
            f for f in os.listdir(f"{path}/{LOG_DIR}")
            if f.endswith(".json") and f[:-5].isdigit()
        )
        for name in logs:
            raw = f"{path}/{LOG_DIR}/{name}"
            entry = json.loads(open(raw).read())
            entry.pop("stats", None)
            for m, fmap in entry.get("delta", {}).get("add", {}).items():
                entry["delta"]["add"][m] = {f: None for f in fmap}
            with open(raw, "w") as fh:
                fh.write(json.dumps(entry))
        kept, total = c.prune_files(mstore, path, {"v": (10_000, None)})
        assert kept == c.member_files(mstore, path) and total == 2

    def test_incomparable_predicate_type_keeps_file(self, mstore):
        c, path = self._two_file_table(mstore)
        # numeric bound against a string column: never prunes
        kept, total = c.prune_files(mstore, path, {"k": (0, 5)})
        assert len(kept) == total
        # unindexed column: never prunes
        kept, _ = c.prune_files(mstore, path, {"nope": (0, 5)})
        assert len(kept) == total

    def test_all_files_pruned_reads_empty_with_schema(self, mstore):
        c, path = self._two_file_table(mstore)
        df = c.read_table_pruned(
            mstore, path, SCHEMA, predicates={"v": (10_000, None)}
        )
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["k", "v"]

    def test_time_travel_prunes_against_that_versions_stats(self, mstore):
        c, path = self._two_file_table(mstore)
        # version 0 has only the low-v file: the high-v predicate
        # prunes everything AT THAT VERSION
        kept, total = c.prune_files(
            mstore, path, {"v": (50, None)}, version=0
        )
        assert total == 1 and kept == []
        kept, total = c.prune_files(
            mstore, path, {"v": (None, 10)}, version=0
        )
        assert total == 1 and len(kept) == 1


class TestColdTierSkipping:
    def test_range_read_plans_over_pruned_cold_files(self, spark, tmp_path):
        """The consumer integration: a hot∪cold range read passes its
        (tag, part_start) envelope to the cold read, and the manifest
        prunes cold snapshot files wholly outside it — correctness
        identical, file count strictly smaller."""
        from redis_lsm_timeseries_spark.tiering import (
            purge_ack_many,
            purge_scan,
        )

        cfg = EngineConfig(root=str(tmp_path / "e"), partition_width=10)
        s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        s.initialize()
        # two tags, far-apart time ranges, evicted to cold
        s.write([("A", t, f"a{t}") for t in range(0, 20)], ingest_ts=1)
        s.write(
            [("B", t, f"b{t}") for t in range(1000, 1020)], ingest_ts=2
        )
        marks = purge_scan(
            s, partition_age_threshold_s=0.0, max_partitions_to_mark=10
        )
        assert marks
        purge_ack_many(s, [m.purge_id for m in marks])
        # the A-range request must not plan over B's cold files
        parsed = [("A", 0, 19)]
        preds = s._range_file_predicates(parsed)
        kept, total = s.commit.prune_files(s, cfg.cold_path, preds)
        assert total >= 2 and len(kept) < total
        got = {
            (r.tag, r.ts): r.value
            for r in s.read_range({"A": (0, 19)}, include_cold=True)
            .collect()
        }
        assert got == {("A", t): f"a{t}" for t in range(0, 20)}


class TestMembershipPredicates:
    def test_set_predicate_prunes_nonmatching_partitions(self, mstore):
        c, path = mstore.commit, _table(mstore)
        df = mstore.spark.createDataFrame(
            [(f"k{i}", i % 4, i) for i in range(8)],
            "k string, p long, v long",
        )
        c.append_partitioned(mstore, df, path, ["p"])
        kept, total = c.prune_files(mstore, path, {"p": {1, 3}})
        assert total >= 4 and 0 < len(kept) < total
        got = {
            r.p
            for r in c.read_table_pruned(
                mstore, path, predicates={"p": {1, 3}}
            )
            .select("p")
            .distinct()
            .collect()
        }
        assert got == {1, 3}

    def test_rollup_refresh_carried_read_is_pruned(self, spark, tmp_path):
        """refresh_rollup's carried-bucket read plans over only the
        selected tags' partitions on a manifest backend — results
        identical to the full-table read the semi-join implied."""
        from redis_lsm_timeseries_spark.rollup import (
            read_rollup,
            refresh_rollup,
        )

        cfg = EngineConfig(root=str(tmp_path / "e"), partition_width=10)
        s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        s.initialize()
        s.write(
            [(f"T{i}", t, f"v{t}") for i in range(4) for t in range(5)],
            ingest_ts=1,
        )
        refresh_rollup(s, "r1", 10)
        # second refresh touches ONLY T0's bucket
        s.write([("T0", 6, "new")], ingest_ts=2)
        refresh_rollup(s, "r1", 10)
        rows = {
            (r.tag, r.bucket_start): r.n
            for r in read_rollup(s, "r1").collect()
        }
        assert rows[("T0", 0)] == 6
        assert all(rows[(f"T{i}", 0)] == 5 for i in (1, 2, 3))

    def test_rollup_new_work_probe_prunes_old_cold_files(
        self, spark, tmp_path
    ):
        """refresh_rollup's new-work probe passes the watermark as an
        ``ingest_ts`` floor to the cold read, so snapshot files wholly
        below it are skipped at plan time — at 100 TB that is nearly
        every cold file, since eviction moves OLD data cold. Results
        must equal a full recompute."""
        from redis_lsm_timeseries_spark.rollup import (
            read_rollup,
            refresh_rollup,
            rollup_full,
        )
        from redis_lsm_timeseries_spark.tiering import (
            purge_ack_many,
            purge_scan,
        )

        cfg = EngineConfig(root=str(tmp_path / "e"), partition_width=10)
        s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        s.initialize()
        # old history, evicted cold in two separate snapshots
        s.write([("A", t, f"a{t}") for t in range(0, 10)], ingest_ts=1)
        marks = purge_scan(
            s, partition_age_threshold_s=0.0, max_partitions_to_mark=10
        )
        purge_ack_many(s, [m.purge_id for m in marks])
        s.write([("B", t, f"b{t}") for t in range(0, 10)], ingest_ts=2)
        marks = purge_scan(
            s, partition_age_threshold_s=0.0, max_partitions_to_mark=10
        )
        purge_ack_many(s, [m.purge_id for m in marks])
        refresh_rollup(s, "r1", 10)  # watermark now 2
        # the probe's floor predicate prunes the wholly-older cold file
        kept, total = s.commit.prune_files(
            s, cfg.cold_path, {"ingest_ts": (2, None)}
        )
        assert total >= 2 and 0 < len(kept) < total
        # new work for ONE tag; incremental == full recompute
        s.write([("B", 11, "new")], ingest_ts=5)
        refresh_rollup(s, "r1", 10)
        got = {
            (r.tag, r.bucket_start): (r.n, r.n_distinct)
            for r in read_rollup(s, "r1").collect()
        }
        want = {
            (r.tag, r.bucket_start): (r.n, r.n_distinct)
            for r in rollup_full(s, 10).collect()
        }
        assert got == want

    def test_refresh_holds_watermark_when_no_new_work(
        self, spark, tmp_path
    ):
        """With the probe pruned to ingest_ts >= watermark, a refresh
        with no new rows must hold the watermark (never regress it to
        the pruned frame's empty max)."""
        from redis_lsm_timeseries_spark.rollup import refresh_rollup

        cfg = EngineConfig(root=str(tmp_path / "e"), partition_width=10)
        s = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        s.initialize()
        s.write([("A", t, f"a{t}") for t in range(5)], ingest_ts=7)
        m1 = refresh_rollup(s, "r1", 10)
        m2 = refresh_rollup(s, "r1", 10)
        assert m2.watermark_ingest_ts == m1.watermark_ingest_ts == 7
        assert m2.buckets_refreshed == 0


class TestStatsColumnCap:
    """r12: the Delta dataSkippingNumIndexedCols idiom, gated — a
    predicate on a column past the cap is SAFE (never prunes, results
    exact), and the cap is raisable per commit instance."""

    def _wide(self, mstore, commit=None):
        c = commit if commit is not None else mstore.commit
        path = _table(mstore, "wide")
        n = 40
        cols = ", ".join(f"c{i} long" for i in range(n))
        rows = [tuple(100 * r + i for i in range(n)) for r in range(4)]
        df = mstore.spark.createDataFrame(rows, cols).coalesce(1)
        c.append_rows(
            mstore, [tuple(r) for r in rows],
            cols, path,
        )
        return c, path, rows

    def test_column_past_cap_never_prunes_but_stays_correct(
        self, mstore
    ):
        c, path, rows = self._wide(mstore)
        stats = c.member_file_stats(mstore, path)
        (s,) = stats.values()
        assert "c31" in s["cols"] and "c35" not in s["cols"]
        # predicate on an un-statted column: file survives (no proof)
        kept, total = c.prune_files(mstore, path, {"c35": (10**9, None)})
        assert len(kept) == total == 1
        # and the pruned read still returns exact results
        got = (
            c.read_table_pruned(
                mstore, path, None, predicates={"c35": (135, 135)}
            )
            .where("c35 = 135")
            .count()
        )
        assert got == 1

    def test_raised_cap_records_and_prunes_past_32(self, mstore):
        from redis_lsm_timeseries_spark.commit import ManifestCommit

        wide_commit = ManifestCommit(stats_max_cols=64)
        c, path, rows = self._wide(mstore, commit=wide_commit)
        stats = c.member_file_stats(mstore, path)
        (s,) = stats.values()
        assert "c35" in s["cols"]
        kept, total = c.prune_files(
            mstore, path, {"c35": (10**9, None)}
        )
        assert total == 1 and kept == []


class TestReadRangePlanGate:
    """r12 stretch gate: ``read_range(include_cold=True)`` at a larger
    planted cold layout must PLAN over only the cold files whose
    (tag, part_start) stats overlap the request — asserted on the
    physical plan's input files, not just the row results."""

    def _planted(self, mstore, tags=6, parts=8):
        """A cold tier planted directly through the seam: one commit
        per (tag, partition) — file-per-partition with exact stats."""
        c, cold = mstore.commit, mstore.config.cold_path
        w = mstore.config.partition_width
        for t in range(tags):
            for p in range(parts):
                rows = [
                    (
                        f"pg-{t}-{p}", f"tag{t}", p * w,
                        p * w + i, f"v{i}", 1000 + i, "w0", i,
                    )
                    for i in range(3)
                ]
                df = mstore.spark.createDataFrame(
                    rows,
                    "purge_id string, tag string, part_start long, "
                    "ts long, value string, ingest_ts long, "
                    "writer_id string, seq long",
                ).coalesce(1)
                c.append_partitioned(
                    mstore, df, cold, ["purge_id", "tag", "part_start"]
                )
        return cold, w

    def test_cold_union_read_scans_only_envelope_files(self, mstore):
        cold, w = self._planted(mstore)
        # hot tier: one row so the union is non-trivial
        mstore.write({"tag1": {0: 1.0}})
        total_cold = mstore.commit.table_file_count(mstore, cold)
        assert total_cold == 6 * 8
        df = mstore.read_range(
            {"tag1": (0, w - 1), "tag4": (2 * w, 3 * w - 1)},
            include_cold=True,
        )
        cold_inputs = [
            f for f in df.inputFiles() if "/cold" in f
        ]
        # tag envelope: exactly the requested TAGS (set membership,
        # not the lexical range tag1..tag4 which would include
        # tag2/tag3), part_start envelope [0, 3w)
        assert 0 < len(cold_inputs) < total_cold
        for f in cold_inputs:
            assert "/tag=tag1/" in f or "/tag=tag4/" in f
            ps = int(f.split("/part_start=")[1].split("/")[0])
            assert 0 <= ps <= 3 * w - 1
        # and the read is still row-exact
        rows = {(r.tag, r.ts) for r in df.collect()}
        assert ("tag1", 0) in rows

    def test_sparse_tag_set_skips_between_tags(self, mstore):
        """The r12 upgrade from a lexical tag range to set membership:
        requesting the two extreme tags must not scan the tags
        between them."""
        cold, w = self._planted(mstore, tags=5, parts=2)
        mstore.write({"tag0": {0: 1.0}})
        df = mstore.read_range(
            {"tag0": (0, w - 1), "tag4": (0, w - 1)},
            include_cold=True,
        )
        cold_inputs = [f for f in df.inputFiles() if "/cold" in f]
        assert cold_inputs
        for f in cold_inputs:
            assert "/tag=tag0/" in f or "/tag=tag4/" in f

    def test_results_identical_with_and_without_skipping(self, mstore):
        """Superset law at the composed-read level: pruned cold union
        equals the unpruned read filtered by the same ranges."""
        cold, w = self._planted(mstore, tags=3, parts=4)
        mstore.write({"tag2": {w: 42.0}})
        ranges = {"tag2": (0, 2 * w - 1)}
        pruned = {
            (r.tag, r.ts, r.value)
            for r in mstore.read_range(
                ranges, include_cold=True
            ).collect()
        }
        full = {
            (r.tag, r.ts, r.value)
            for r in mstore.read_all(include_cold=True)
            .where(
                (F.col("tag") == "tag2")
                & F.col("ts").between(0, 2 * w - 1)
            )
            .collect()
        }
        assert pruned == full and pruned
