"""Round-12 hardening of the stats / CAS / merge-conflict layer:

- hive partition path values are UNESCAPED before being recorded as
  min==max stats (Spark writes ``tag='a:b'`` as ``tag=a%3Ab``; a
  verbatim stat would prove a FALSE non-overlap against predicates
  built from real column values and wrongly prune live files);
- ``fast_count``'s "every row matches" proof requires a known-zero
  null count (NULL rows never satisfy a predicate), and type
  incomparability is "cannot prove" (scan fallback), never proof of
  absence;
- consumer-cursor commits CAS on the cursor inside the atomic commit
  (two concurrent consumers sharing an app_id cannot both append the
  same delta);
- the merge family's commit guard extends to concurrent APPENDS whose
  stats overlap the key envelope (the Delta WriteSerializable
  merge/append conflict) — a racing key-overlapping append raises
  instead of silently leaving duplicate keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.changefeed import mirror_changes
from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import RewriteConflictError
from redis_lsm_timeseries_spark.maintenance import fast_count
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)

SCHEMA = "k long, v string"


def _fx(spark, tmp_path, name="t"):
    return CommitHost(spark), ManifestCommit(), str(tmp_path / name)


class TestPartitionValueUnescape:
    def test_escaped_partition_value_is_unescaped_in_stats(
        self, spark, tmp_path
    ):
        """tag='host:1' is written as dir ``tag=host%3A1``; the stat
        must record the REAL value or every predicate built from real
        column values would falsely prune the file."""
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [("host:1", 1), ("host:1", 2)], "tag string, v long"
        ).coalesce(1)
        commit.append_partitioned(host, df, path, ["tag"])
        (rel,) = commit.member_files(host, path)
        assert "%3A" in rel or "%3a" in rel  # Spark escaped the dir
        stats = commit.member_file_stats(host, path)[rel]
        assert stats["cols"]["tag"] == {
            "min": "host:1", "max": "host:1", "nulls": 0,
        }
        kept, total = commit.prune_files(
            host, path, {"tag": {"host:1"}}
        )
        assert kept == [rel] and total == 1
        kept2, _ = commit.prune_files(host, path, {"tag": {"other"}})
        assert kept2 == []
        # exact metadata-only count through the same stat
        assert fast_count(
            host, path, {"tag": {"host:1"}}, commit=commit
        ) == 2

    def test_literal_percent_round_trips(self, spark, tmp_path):
        """Spark escapes '%' itself as %25, so unescaping is exact for
        values containing literal percent signs."""
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [("50%", 1)], "tag string, v long"
        )
        commit.append_partitioned(host, df, path, ["tag"])
        (rel,) = commit.member_files(host, path)
        stats = commit.member_file_stats(host, path)[rel]
        assert stats["cols"]["tag"]["min"] == "50%"
        kept, _ = commit.prune_files(host, path, {"tag": {"50%"}})
        assert kept == [rel]

    def test_null_partition_records_no_stat_and_never_prunes(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [(None, 1), (None, 2)], "tag string, v long"
        ).coalesce(1)
        commit.append_partitioned(host, df, path, ["tag"])
        (rel,) = commit.member_files(host, path)
        assert "__HIVE_DEFAULT_PARTITION__" in rel
        stats = commit.member_file_stats(host, path)[rel]
        assert "tag" not in stats["cols"]  # NULL has no orderable stat
        # no stat -> never pruned on that column (superset-safe)
        kept, _ = commit.prune_files(host, path, {"tag": {"x"}})
        assert kept == [rel]

    def test_unescape_handles_malformed_sequences(self):
        u = ManifestCommit._unescape_partition
        assert u("plain") == "plain"
        assert u("a%3Ab") == "a:b"
        assert u("%2520") == "%20"  # double-escaped stays one level
        assert u("100%") == "100%"  # trailing bare percent: literal
        assert u("%zz") == "%zz"  # non-hex: literal


class TestFastCountNulls:
    def test_min_eq_max_with_nulls_falls_back_to_scan(
        self, spark, tmp_path
    ):
        """min==max inside the predicate used to count the file's FULL
        rows — but NULL rows never match, so a known nonzero null
        count must answer None (scan fallback), not overcount."""
        host, commit, path = _fx(spark, tmp_path)
        commit.append_rows(
            host, [("a", 5), ("b", 5), ("c", None)],
            "k string, x long", path,
        )
        stats = commit.member_file_stats(host, path)
        (s,) = stats.values()
        assert s["cols"]["x"] == {"min": 5, "max": 5, "nulls": 1}
        assert fast_count(host, path, {"x": (5, 5)}, commit=commit) is None
        # the scan fallback gives the true answer
        real = (
            commit.read_table(host, path)
            .where(F.col("x") == 5).count()
        )
        assert real == 2
        # without predicates the row count is still metadata-exact
        assert fast_count(host, path, commit=commit) == 3

    def test_zero_nulls_still_counts_exactly(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.append_rows(
            host, [("a", 5), ("b", 5)], "k string, x long", path
        )
        assert fast_count(host, path, {"x": (5, 5)}, commit=commit) == 2

    def test_no_overlap_still_proves_zero_despite_nulls(
        self, spark, tmp_path
    ):
        """NULLs never help a predicate match, so min/max disproving
        overlap remains a valid zero even with NULL rows present."""
        host, commit, path = _fx(spark, tmp_path)
        commit.append_rows(
            host, [("a", 5), ("b", None)], "k string, x long", path
        )
        assert fast_count(host, path, {"x": (9, 10)}, commit=commit) == 0


class TestFastCountTypeMismatch:
    def test_string_predicate_vs_int_parsed_partition_stat(
        self, spark, tmp_path
    ):
        """A string partition value that LOOKS numeric is recorded as
        an int stat; a string predicate is then incomparable — which
        is 'cannot prove' (None -> scan), never proof of absence
        (counting 0 would silently undercount the matching rows)."""
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [("7", 1), ("7", 2)], "tag string, v long"
        ).coalesce(1)
        commit.append_partitioned(host, df, path, ["tag"])
        (rel,) = commit.member_files(host, path)
        stats = commit.member_file_stats(host, path)[rel]
        assert stats["cols"]["tag"]["min"] == 7  # int-parsed
        got = fast_count(host, path, {"tag": {"7"}}, commit=commit)
        assert got is None  # cannot prove -> scan fallback
        real = (
            commit.read_table(host, path)
            .where(F.col("tag") == "7").count()
        )
        assert real == 2
        # prune_files keeps the file for the same reason
        kept, _ = commit.prune_files(host, path, {"tag": {"7"}})
        assert kept == [rel]

    def test_empty_predicate_set_proves_zero(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.append_rows(
            host, [("a", 5)], "k string, x long", path
        )
        assert fast_count(host, path, {"x": set()}, commit=commit) == 0


class TestCursorCAS:
    def test_expected_app_cas_blocks_stale_writer(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame([(1, "a")], SCHEMA)
        commit.append_table_with_meta(
            host, path, df, {"cur": 1}, expected_app={"cur": None}
        )
        # correct CAS advances
        commit.append_table_with_meta(
            host, path, None, {"cur": 2}, expected_app={"cur": 1}
        )
        # stale expectation (still thinks cursor is 1) must NOT land
        with pytest.raises(RewriteConflictError):
            commit.append_table_with_meta(
                host, path, df, {"cur": 2}, expected_app={"cur": 1}
            )
        assert commit.read_app_meta(host, path)["cur"] == 2
        # replace path enforces the same CAS
        with pytest.raises(RewriteConflictError):
            commit.replace_table_with_meta(
                host, path, df, {"cur": 9}, expected_app={"cur": 1}
            )

    def test_concurrent_mirror_runs_cannot_double_append(
        self, spark, tmp_path
    ):
        """Two mirror steps planned from the same cursor: the second
        to commit raises instead of appending the same delta twice.
        Simulated by advancing the cursor between the first run's
        planning read and its commit (the exact interleaving the CAS
        closes)."""
        host, commit = CommitHost(spark), ManifestCommit()
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        commit.append_table_with_meta(
            host, src, spark.createDataFrame([(1, "a")], SCHEMA), {}
        )
        mirror_changes(host, src, dst)  # initial
        commit.append_table_with_meta(
            host, src, spark.createDataFrame([(2, "b")], SCHEMA), {}
        )

        real = ManifestCommit.read_app_meta
        fired = {"done": False}

        def hijack(self_, store, path_):
            out = real(self_, store, path_)
            if path_ == dst and not fired["done"]:
                fired["done"] = True
                # a concurrent consumer completes a full step while
                # this run holds its planning-time cursor
                mirror_changes(host, src, dst)
            return out

        ManifestCommit.read_app_meta = hijack
        try:
            with pytest.raises(RewriteConflictError):
                mirror_changes(host, src, dst)
        finally:
            ManifestCommit.read_app_meta = real
        # exactly one copy of each row despite the race
        rows = sorted(
            (r.k, r.v)
            for r in commit.read_table(host, dst, SCHEMA).collect()
        )
        assert rows == [(1, "a"), (2, "b")]


class TestMergeEnvelopeGuard:
    def _seeded(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], SCHEMA
        ).repartitionByRange(4, "k").sortWithinPartitions("k")
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )
        return host, commit, path

    def _race_append(self, path, rows, done):
        """_stage_in wrapper landing a racing append once, after the
        merge staged its files but before it commits."""
        real = ManifestCommit._stage_in

        def racing(self_, store, root, member, write_fn):
            files = real(self_, store, root, member, write_fn)
            if not done["fired"]:
                done["fired"] = True
                ManifestCommit().append_rows(store, rows, SCHEMA, path)
            return files

        return real, racing

    def test_key_overlapping_racing_append_conflicts(
        self, spark, tmp_path
    ):
        host, commit, path = self._seeded(spark, tmp_path)
        done = {"fired": False}
        real, racing = self._race_append(path, [(1, "racer")], done)
        ManifestCommit._stage_in = racing
        try:
            src = spark.createDataFrame([(1, "N1")], SCHEMA)
            with pytest.raises(RewriteConflictError):
                merge_into(host, path, src, ["k"], commit=commit)
            # retry on fresh state reaches the raced file too
            merge_into(host, path, src, ["k"], commit=commit)
        finally:
            ManifestCommit._stage_in = real
        got = (
            commit.read_table(host, path, SCHEMA)
            .where(F.col("k") == 1).collect()
        )
        assert [r.v for r in got] == ["N1"]  # no duplicate key 1

    def test_outside_envelope_racing_append_lands_untouched(
        self, spark, tmp_path
    ):
        host, commit, path = self._seeded(spark, tmp_path)
        done = {"fired": False}
        real, racing = self._race_append(path, [(5000, "racer")], done)
        ManifestCommit._stage_in = racing
        try:
            src = spark.createDataFrame([(1, "N1")], SCHEMA)
            merge_into(host, path, src, ["k"], commit=commit)
        finally:
            ManifestCommit._stage_in = real
        got = {
            r.k: r.v
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got[5000] == "racer" and got[1] == "N1"

    def test_delete_guard_catches_racing_matching_append(
        self, spark, tmp_path
    ):
        host, commit, path = self._seeded(spark, tmp_path)
        done = {"fired": False}
        real, racing = self._race_append(path, [(2, "late")], done)
        ManifestCommit._stage_in = racing
        try:
            dk = spark.createDataFrame([(2,)], "k long")
            with pytest.raises(RewriteConflictError):
                delete_rows(host, path, dk, ["k"], commit=commit)
            delete_rows(host, path, dk, ["k"], commit=commit)
        finally:
            ManifestCommit._stage_in = real
        n = (
            commit.read_table(host, path, SCHEMA)
            .where(F.col("k") == 2).count()
        )
        assert n == 0  # the raced row did not survive the retry
