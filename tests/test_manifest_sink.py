"""Generic exactly-once manifest sink (``streaming/sink.py``): rows +
batch-id cursor in one atomic commit; replays skip; crashes replay to
the uninterrupted state; a real availableNow stream lands every input
row exactly once across restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.streaming.sink import (
    manifest_sink,
    sink_cursor,
)

SCHEMA = "k long, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(spark, path):
    host, commit = CommitHost(spark), ManifestCommit()
    return sorted(
        (r.k, r.v)
        for r in commit.read_table(host, path, SCHEMA).collect()
    )


class TestUnit:
    def test_batches_append_and_cursor_advances(self, spark, tmp_path):
        out = str(tmp_path / "out")
        sink = manifest_sink(out)
        sink(_df(spark, [(1, "a")]), 0)
        sink(_df(spark, [(2, "b")]), 1)
        assert _rows(spark, out) == [(1, "a"), (2, "b")]
        assert sink_cursor(spark, out) == 1

    def test_replayed_batch_skipped(self, spark, tmp_path):
        out = str(tmp_path / "out")
        sink = manifest_sink(out)
        batch = _df(spark, [(1, "a")])
        sink(batch, 0)
        sink(batch, 0)  # re-delivery after a post-commit crash
        assert _rows(spark, out) == [(1, "a")]

    def test_crash_before_commit_replays_exactly_once(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "out")
        sink = manifest_sink(out)
        sink(_df(spark, [(1, "a")]), 0)
        real = ManifestCommit._commit

        def crashy(self_, store, root, mutate):
            raise RuntimeError("killed")

        ManifestCommit._commit = crashy
        try:
            with pytest.raises(RuntimeError):
                sink(_df(spark, [(2, "b")]), 1)
        finally:
            ManifestCommit._commit = real
        assert _rows(spark, out) == [(1, "a")]  # nothing half-landed
        sink(_df(spark, [(2, "b")]), 1)  # engine re-delivers
        assert _rows(spark, out) == [(1, "a"), (2, "b")]
        assert sink_cursor(spark, out) == 1

    def test_empty_batch_advances_cursor(self, spark, tmp_path):
        out = str(tmp_path / "out")
        sink = manifest_sink(out)
        sink(_df(spark, [(1, "a")]), 0)
        sink(_df(spark, []), 1)
        assert sink_cursor(spark, out) == 1
        assert _rows(spark, out) == [(1, "a")]

    def test_out_of_order_batch_rejected(self, spark, tmp_path):
        out = str(tmp_path / "out")
        sink = manifest_sink(out)
        sink(_df(spark, [(1, "a")]), 5)
        with pytest.raises(ValidationError, match="app_id"):
            sink(_df(spark, [(2, "b")]), 3)

    def test_transform_applies(self, spark, tmp_path):
        out = str(tmp_path / "out")
        sink = manifest_sink(
            out, transform=lambda df: df.where(F.col("k") % 2 == 0)
        )
        sink(_df(spark, [(1, "a"), (2, "b")]), 0)
        assert _rows(spark, out) == [(2, "b")]

    def test_two_app_ids_independent(self, spark, tmp_path):
        out = str(tmp_path / "out")
        a = manifest_sink(out, app_id="a")
        b = manifest_sink(out, app_id="b")
        a(_df(spark, [(1, "a")]), 0)
        b(_df(spark, [(2, "b")]), 0)
        assert _rows(spark, out) == [(1, "a"), (2, "b")]
        assert sink_cursor(spark, out, "a") == 0
        assert sink_cursor(spark, out, "b") == 0


class TestEndToEnd:
    def test_stream_restart_lands_rows_exactly_once(
        self, spark, tmp_path
    ):
        input_dir = str(tmp_path / "in")
        out = str(tmp_path / "out")
        for i in range(3):
            _df(spark, [(i, f"v{i}")]).coalesce(1).write.mode(
                "append"
            ).parquet(f"{input_dir}/b{i}")

        def run():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{input_dir}/*")
            )
            q = (
                stream.writeStream.foreachBatch(manifest_sink(out))
                .option(
                    "checkpointLocation", str(tmp_path / "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        assert _rows(spark, out) == [(0, "v0"), (1, "v1"), (2, "v2")]
        # restart over the same checkpoint: nothing re-lands
        run()
        assert _rows(spark, out) == [(0, "v0"), (1, "v1"), (2, "v2")]
        # new input continues the stream
        _df(spark, [(9, "v9")]).coalesce(1).write.mode("append").parquet(
            f"{input_dir}/b9"
        )
        run()
        assert (9, "v9") in _rows(spark, out)


class TestMemberPaths:
    def test_two_sinks_on_members_of_one_root_share_the_app_map(
        self, spark, tmp_path
    ):
        """Member tables of one manifest root: each sink keys its own
        cursor in the SHARED root app map; commits interleave without
        clobbering either cursor or either member's rows."""
        root = str(tmp_path / "root")
        a = manifest_sink(f"{root}/events", app_id="ev")
        b = manifest_sink(f"{root}/metrics", app_id="me")
        a(_df(spark, [(1, "e1")]), 0)
        b(_df(spark, [(100, "m1")]), 0)
        a(_df(spark, [(2, "e2")]), 1)
        a(_df(spark, [(2, "e2")]), 1)  # replay skips
        assert _rows(spark, f"{root}/events") == [(1, "e1"), (2, "e2")]
        assert _rows(spark, f"{root}/metrics") == [(100, "m1")]
        assert sink_cursor(spark, f"{root}/events", "ev") == 1
        assert sink_cursor(spark, f"{root}/metrics", "me") == 0

    def test_mirror_between_members_of_one_root(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.changefeed import mirror_changes

        host, commit = CommitHost(spark), ManifestCommit()
        root = str(tmp_path / "root")
        src, dst = f"{root}/src", f"{root}/dst"
        commit.append_table_with_meta(host, src, _df(spark, [(1, "a")]), {})
        m = mirror_changes(host, src, dst)
        assert m.mode == "initial"
        commit.append_table_with_meta(host, src, _df(spark, [(2, "b")]), {})
        m = mirror_changes(host, src, dst)
        assert (m.mode, m.rows_mirrored) == ("incremental", 1)
        assert _rows(spark, dst) == [(1, "a"), (2, "b")]
