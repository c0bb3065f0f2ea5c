"""Streaming row-level change feed (r14):
``spark.readStream.format("rlts_table").option("readChangeFeed",
"true")`` — the Delta CDF streaming idiom. Where the plain append
stream fails loudly on any mutation, this source serves merges,
deletes and deletion-vector commits as typed change rows
(``_change_type`` insert|upsert|delete + ``_commit_version``), so a
continuously-running consumer maintains a keyed mirror without the
pull-based fallback. Pinned here:

- plain appends stream as insert rows, CDF commits as their typed
  change files (the replacement data files are NOT double-emitted);
- ``preserve`` maintenance is invisible mid-stream;
- an UNMARKED rewrite (raw restat without CDF rows) still fails the
  query loudly;
- mapped members serve the logical view in the change rows;
- applying the streamed feed by key reproduces the table exactly.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)
from redis_lsm_timeseries_spark.sources.manifest_stream import (
    read_table_stream,
)

SCHEMA = "k long, v long"
CDF_SCHEMA = "k long, v long, _change_type string, _commit_version long"


def _fx(spark, tmp_path, rows=((1, 10), (2, 20), (3, 30))):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / "t")
    commit.append_table_with_meta(
        host, path,
        spark.createDataFrame(list(rows), SCHEMA).coalesce(1),
        {},
    )
    return host, commit, path


def _start(spark, path, name, version, schema=CDF_SCHEMA, **opts):
    df = read_table_stream(
        spark, path, schema=schema,
        readchangefeed="true", startingversion=str(version), **opts,
    )
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )


def _wait_rows(spark, name, want, q, timeout_s=120):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if q.exception() is not None:
            raise AssertionError(f"query died: {q.exception()}")
        n = spark.sql(f"SELECT count(*) c FROM {name}").first().c
        if n >= want:
            return n
        time.sleep(0.3)
    raise AssertionError(f"timed out waiting for {want} rows in {name}")


def _ids(spark, vals):
    return spark.createDataFrame([(int(i),) for i in vals], "k long")


class TestChangeFeedStream:
    def test_typed_rows_across_mutations(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.maintenance import (
            compact_small_files,
        )

        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        q = _start(spark, path, "cdf1", v0)
        try:
            # append -> insert rows
            commit.append_table_with_meta(
                host, path,
                spark.createDataFrame([(4, 40)], SCHEMA).coalesce(1),
                {},
            )
            _wait_rows(spark, "cdf1", 1, q)
            # merge -> upsert row
            merge_into(
                host, path,
                spark.createDataFrame([(2, 99)], SCHEMA),
                ["k"], commit=commit,
            )
            _wait_rows(spark, "cdf1", 2, q)
            # preserve rewrite mid-stream: nothing, no error
            compact_small_files(
                host, path, min_group=1, commit=commit
            )
            # dv delete -> delete row
            delete_rows(
                host, path, _ids(spark, [1]), ["k"],
                commit=commit, mode="dv",
            )
            _wait_rows(spark, "cdf1", 3, q)
            assert q.exception() is None
            rows = {
                (r.k, r.v, r._change_type)
                for r in spark.sql("SELECT * FROM cdf1").collect()
            }
            assert rows == {
                (4, 40, "insert"),
                (2, 99, "upsert"),
                (1, 10, "delete"),
            }
            versions = [
                r._commit_version
                for r in spark.sql(
                    "SELECT _commit_version FROM cdf1"
                ).collect()
            ]
            assert all(v > v0 for v in versions)
        finally:
            q.stop()

    def test_cdf_commit_files_not_double_emitted(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        q = _start(spark, path, "cdf2", v0)
        try:
            # a rewrite-mode merge replaces files AND stages cdf rows:
            # the feed must serve ONLY the cdf rows, not the
            # replacement files' survivor contents
            merge_into(
                host, path,
                spark.createDataFrame([(1, -1), (9, 90)], SCHEMA),
                ["k"], commit=commit, mode="rewrite",
            )
            _wait_rows(spark, "cdf2", 2, q)
            time.sleep(1.0)
            rows = {
                (r.k, r.v, r._change_type)
                for r in spark.sql("SELECT * FROM cdf2").collect()
            }
            assert rows == {(1, -1, "upsert"), (9, 90, "upsert")}
        finally:
            q.stop()

    def test_earliest_replays_history_as_inserts(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99)], SCHEMA),
            ["k"], commit=commit,
        )
        q = _start(spark, path, "cdf3", "earliest")
        try:
            _wait_rows(spark, "cdf3", 4, q)
            rows = {
                (r.k, r.v, r._change_type)
                for r in spark.sql("SELECT * FROM cdf3").collect()
            }
            assert rows == {
                (1, 10, "insert"),
                (2, 20, "insert"),
                (3, 30, "insert"),
                (2, 99, "upsert"),
            }
        finally:
            q.stop()

    def test_unmarked_restat_fails_loudly(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        q = _start(spark, path, "cdf4", v0)
        try:
            (f,) = commit.member_files(host, path)
            blk = commit.member_file_stats(host, path)[f]
            blob = commit.stage_dv(
                host, path,
                spark.createDataFrame(
                    [(f, 0)], "file string, pos long"
                ),
            )
            commit.rewrite_files(
                host, path, [], None,
                restat={f: {**blk, "dv": {"path": blob, "count": 1}}},
            )
            t0 = time.time()
            while q.exception() is None and time.time() - t0 < 120:
                time.sleep(0.3)
            exc = q.exception()
            assert exc is not None
            assert "deletion vector" in str(exc) or "unmarked" in str(
                exc
            ) or "change metadata" in str(exc)
        finally:
            q.stop()

    def test_mapped_member_serves_logical_view(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "v", "val")
        v0 = commit.table_versions(host, path)[-1]
        q = _start(
            spark, path, "cdf5", v0,
            schema="k long, val long, _change_type string, "
            "_commit_version long",
        )
        try:
            delete_rows(
                host, path, _ids(spark, [3]), ["k"],
                commit=commit, mode="dv",
            )
            _wait_rows(spark, "cdf5", 1, q)
            r = spark.sql("SELECT * FROM cdf5").first()
            assert (r.k, r.val, r._change_type) == (3, 30, "delete")
        finally:
            q.stop()

    def test_inferred_schema_appends_cdf_columns(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        register_manifest_source(spark)
        df = (
            spark.readStream.format("rlts_table")
            .option("path", path)
            .option("readChangeFeed", "true")
            .load()
        )
        assert df.columns == ["k", "v", "_change_type", "_commit_version"]

    def test_batch_change_feed_read(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99)], SCHEMA),
            ["k"], commit=commit, mode="dv",
        )
        v1 = commit.table_versions(host, path)[-1]
        delete_rows(
            host, path, _ids(spark, [3]), ["k"],
            commit=commit, mode="dv",
        )
        df = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingversion=str(v0),
        )
        rows = {(r.k, r.v, r._change_type) for r in df.collect()}
        assert rows == {(2, 99, "upsert"), (3, 30, "delete")}
        # endingVersion bounds the range
        df2 = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingversion=str(v0),
            endingversion=str(v1),
        )
        assert {
            (r.k, r._change_type) for r in df2.collect()
        } == {(2, "upsert")}
        # earliest replays history as inserts
        df3 = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingversion="earliest",
        )
        assert df3.count() == 5  # 3 inserts + upsert + delete

    def test_batch_change_feed_on_mapped_member(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "v", "val")
        v0 = commit.table_versions(host, path)[-1]
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99)], "k long, val long"),
            ["k"], commit=commit, mode="dv",
        )
        df = read_table_batch(
            spark, path,
            schema="k long, val long, _change_type string, "
            "_commit_version long",
            readchangefeed="true", startingversion=str(v0),
        )
        rows = [(r.k, r.val, r._change_type) for r in df.collect()]
        assert rows == [(2, 99, "upsert")]

    def test_batch_timestamp_as_of(self, spark, tmp_path):
        import time as _t

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        _t.sleep(0.05)
        ts_between = int(_t.time() * 1000)
        _t.sleep(0.05)
        delete_rows(
            host, path, _ids(spark, [1]), ["k"],
            commit=commit, mode="dv",
        )
        old = read_table_batch(
            spark, path, schema=SCHEMA, timestampasof=str(ts_between)
        )
        assert old.count() == 3
        cur = read_table_batch(spark, path, schema=SCHEMA)
        assert cur.count() == 2
        with pytest.raises(Exception, match="mutually exclusive"):
            read_table_batch(
                spark, path, schema=SCHEMA, version=0,
                timestampasof=str(ts_between),
            ).count()

    def test_change_feed_timestamp_bounds(self, spark, tmp_path):
        import time as _t

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        _t.sleep(0.05)
        ts_mid = int(_t.time() * 1000)
        _t.sleep(0.05)
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99)], SCHEMA),
            ["k"], commit=commit, mode="dv",
        )
        _t.sleep(0.05)
        ts_after_merge = int(_t.time() * 1000)
        _t.sleep(0.05)
        delete_rows(
            host, path, _ids(spark, [3]), ["k"],
            commit=commit, mode="dv",
        )
        # changes committed at or after ts_mid
        df = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingtimestamp=str(ts_mid),
        )
        assert {
            (r.k, r._change_type) for r in df.collect()
        } == {(2, "upsert"), (3, "delete")}
        # ... and at or before ts_after_merge
        df2 = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingtimestamp=str(ts_mid),
            endingtimestamp=str(ts_after_merge),
        )
        assert {
            (r.k, r._change_type) for r in df2.collect()
        } == {(2, "upsert")}
        # a pre-history startingTimestamp replays from the earliest
        # — exact while version 0 is retained (genesis replay)
        df3 = read_table_batch(
            spark, path, schema=CDF_SCHEMA,
            readchangefeed="true", startingtimestamp="1",
        )
        assert df3.count() == 5

    def test_pre_retention_timestamp_raises_typed(self, spark, tmp_path):
        """r15 (ADVICE): once version 0 is vacuumed, a
        startingTimestamp predating retained history must raise the
        typed retention error instead of silently starting AFTER the
        earliest retained version (omitting its changes)."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99)], SCHEMA),
            ["k"], commit=commit, mode="dv",
        )
        root, _ = commit._resolve(host, path)
        commit.vacuum(host, root, retain_versions=1, grace_s=0)
        vs = commit.table_versions(host, path)
        assert vs and vs[0] > 0
        with pytest.raises(Exception, match="predates retained"):
            read_table_batch(
                spark, path, schema=CDF_SCHEMA,
                readchangefeed="true", startingtimestamp="1",
            ).collect()

    def test_file_caps_split_one_versions_change_files(
        self, spark, tmp_path
    ):
        """r17 (VERDICT r16 missing #5): ``maxFilesPerTrigger`` on
        the CDF stream splits at FILE granularity — one mega-merge's
        change files drain across bounded micro-batches with the same
        mid-version ``index`` offsets as the append stream (through
        r16 the cap stopped only on version boundaries), and a fresh
        planner replays the exact middle slice from offsets alone."""
        from pyspark.sql.types import StructType

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            ChangeFeedStreamReader,
        )

        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        # one CDF commit whose change rows land as 3 files
        cdf = spark.createDataFrame(
            [(int(k), int(k), "upsert") for k in range(300)],
            "k long, v long, _change_type string",
        ).repartition(3)
        commit.rewrite_files(host, path, [], None, cdf_df=cdf)
        v1 = commit.table_versions(host, path)[-1]
        reader = ChangeFeedStreamReader(
            StructType.fromDDL(CDF_SCHEMA),
            {
                "path": path,
                "startingversion": str(v0),
                "maxfilespertrigger": "1",
            },
        )
        o0 = reader.initialOffset()
        assert o0 == {"version": v0}
        all_files = [
            r
            for _v, _m, fs, _k in reader._meta.change_batches(v0, v1)
            for r in fs
        ]
        assert len(all_files) == 3
        offs = [o0]
        for _ in range(4):
            offs.append(reader.latestOffset())
        assert offs[1] == {"version": v1, "index": 1}
        assert offs[2] == {"version": v1, "index": 2}
        assert offs[3] == {"version": v1}  # version completes
        assert offs[4] == {"version": v1}  # drained: stable
        slices = [
            [r for p in reader.partitions(a, b) for r in p.relpaths]
            for a, b in zip(offs, offs[1:])
        ]
        # the slices cover every change file exactly once, log order
        assert slices[0] + slices[1] + slices[2] == all_files
        assert slices[3] == []
        # every partition carries the version const; cdf batches keep
        # the file's own _change_type (no 'insert' fill)
        for p in reader.partitions(o0, offs[1]):
            assert p.consts == {"_commit_version": v1}
        # checkpoint-resume mid-version: a FRESH planner replays the
        # exact middle slice
        r2 = ChangeFeedStreamReader(
            StructType.fromDDL(CDF_SCHEMA),
            {"path": path, "maxfilespertrigger": "1"},
        )
        assert [
            r for p in r2.partitions(offs[1], offs[2])
            for r in p.relpaths
        ] == slices[1]
        # UNCAPPED stays version-granular: offsets never carry an
        # index, one trigger drains everything pending
        r3 = ChangeFeedStreamReader(
            StructType.fromDDL(CDF_SCHEMA),
            {"path": path, "startingversion": str(v0)},
        )
        r3.initialOffset()
        assert r3.latestOffset() == {"version": v1}

    def test_file_capped_cdf_stream_end_to_end_exactly_once(
        self, spark, tmp_path
    ):
        """The capped CDF stream delivers every change row exactly
        once across the split micro-batches — inserts and a multi-file
        merge commit, mixed."""
        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        commit.append_table_with_meta(
            host, path,
            spark.createDataFrame([(50, 500)], SCHEMA).coalesce(1),
            {},
        )
        cdf = spark.createDataFrame(
            [(int(k), int(k) * 2, "upsert") for k in range(300)],
            "k long, v long, _change_type string",
        ).repartition(3)
        commit.rewrite_files(host, path, [], None, cdf_df=cdf)
        q = _start(
            spark, path, "cdf_cap", v0, maxfilespertrigger="1",
        )
        try:
            _wait_rows(spark, "cdf_cap", 301, q)
            time.sleep(1.0)
            rows = spark.sql(
                "SELECT k, v, _change_type FROM cdf_cap"
            ).collect()
            assert len(rows) == 301  # no duplicates after the drain
            got = {(r.k, r.v, r._change_type) for r in rows}
            want = {(50, 500, "insert")} | {
                (k, k * 2, "upsert") for k in range(300)
            }
            assert got == want
        finally:
            q.stop()

    def test_streamed_feed_reproduces_table_by_key(
        self, spark, tmp_path
    ):
        """Apply the streamed change rows keyed-last-wins: the result
        must equal the table snapshot — the streaming mirror
        contract."""
        host, commit, path = _fx(spark, tmp_path)
        merge_into(
            host, path,
            spark.createDataFrame([(2, 99), (7, 70)], SCHEMA),
            ["k"], commit=commit, mode="dv",
        )
        delete_rows(
            host, path, _ids(spark, [1]), ["k"],
            commit=commit, mode="dv",
        )
        q = _start(spark, path, "cdf6", "earliest")
        try:
            _wait_rows(spark, "cdf6", 3 + 2 + 1, q)
            feed = spark.sql("SELECT * FROM cdf6")
            w = feed.groupBy("k").agg(
                F.max(
                    F.struct("_commit_version", "_change_type", "v")
                ).alias("last")
            )
            mirror = w.where(F.col("last._change_type") != "delete") \
                .select("k", F.col("last.v").alias("v"))
            a = sorted(map(tuple, mirror.collect()))
            b = sorted(
                map(tuple, commit.read_table(host, path).collect())
            )
            assert a == b
        finally:
            q.stop()
