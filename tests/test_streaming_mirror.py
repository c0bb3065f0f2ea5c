"""Continuous keyed mirror (r14): the ``rlts_table`` change-feed
stream feeding a foreachBatch apply — a streaming materialized view
that converges through appends, merges, deletes and deletion vectors,
exactly-once under micro-batch replay."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)
from redis_lsm_timeseries_spark.streaming.mirror import (
    make_mirror_batch_handler,
    start_streaming_mirror,
)

SCHEMA = "k long, v long"
CDF = "_change_type"
VER = "_commit_version"


def _fx(spark, tmp_path, rows=((1, 10), (2, 20), (3, 30))):
    host, commit = CommitHost(spark), ManifestCommit()
    src = str(tmp_path / "src")
    commit.append_table_with_meta(
        host, src,
        spark.createDataFrame(list(rows), SCHEMA).coalesce(1),
        {},
    )
    return host, commit, src


def _ids(spark, vals):
    return spark.createDataFrame([(int(i),) for i in vals], "k long")


def _batch(spark, rows):
    """A typed change micro-batch as foreachBatch would deliver it."""
    return spark.createDataFrame(
        rows, f"k long, v long, {CDF} string, {VER} long"
    )


def _content(host, commit, path):
    return sorted(
        map(tuple, commit.read_table(host, path).collect())
    )


class TestBatchHandler:
    def test_first_batch_creates_mirror_atomically(
        self, spark, tmp_path
    ):
        host, commit = CommitHost(spark), ManifestCommit()
        dst = str(tmp_path / "dst")
        handle = make_mirror_batch_handler(
            spark, dst, ["k"], commit=commit
        )
        handle(
            _batch(spark, [(1, 10, "insert", 1), (2, 20, "insert", 1)]),
            0,
        )
        assert _content(host, commit, dst) == [(1, 10), (2, 20)]
        # one atomic entry: data + cursor landed together
        assert commit.read_app_meta(host, dst)[
            "stream-mirror:stream-mirror"
        ] == 0

    def test_replayed_batch_applies_nothing(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        dst = str(tmp_path / "dst")
        handle = make_mirror_batch_handler(
            spark, dst, ["k"], commit=commit
        )
        handle(_batch(spark, [(1, 10, "insert", 1)]), 0)
        v = commit.table_versions(host, dst)[-1]
        # the crash-replay: same batch id again
        handle(_batch(spark, [(1, 10, "insert", 1)]), 0)
        assert commit.table_versions(host, dst)[-1] == v
        assert _content(host, commit, dst) == [(1, 10)]

    def test_netting_within_a_batch(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        dst = str(tmp_path / "dst")
        handle = make_mirror_batch_handler(
            spark, dst, ["k"], commit=commit
        )
        handle(_batch(spark, [(1, 10, "insert", 1)]), 0)
        # one batch spanning three versions: upsert then delete nets
        # to delete for k=1; insert then upsert nets to upsert for k=5
        handle(
            _batch(spark, [
                (1, 11, "upsert", 2),
                (1, 11, "delete", 3),
                (5, 50, "insert", 2),
                (5, 55, "upsert", 4),
            ]),
            1,
        )
        assert _content(host, commit, dst) == [(5, 55)]

    def test_transform_filters_to_key_deletes(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        dst = str(tmp_path / "dst")
        handle = make_mirror_batch_handler(
            spark, dst, ["k"], commit=commit,
            transform=lambda df: df.where(F.col("v") < 100),
        )
        handle(
            _batch(spark, [(1, 10, "insert", 1), (2, 200, "insert", 1)]),
            0,
        )
        assert _content(host, commit, dst) == [(1, 10)]
        # an update pushing k=1 out of the subset deletes it
        handle(_batch(spark, [(1, 150, "upsert", 2)]), 1)
        # the mirror emptied (schema needed: zero committed files)
        assert commit.read_table(host, dst, SCHEMA).count() == 0


class TestStreamingMirrorEndToEnd:
    def test_converges_through_mutations(self, spark, tmp_path):
        host, commit, src = _fx(spark, tmp_path)
        dst = str(tmp_path / "dst")
        q = start_streaming_mirror(
            spark, src, dst, ["k"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            commit=commit,
        )
        try:
            def wait_equal(timeout_s=120):
                t0 = time.time()
                while time.time() - t0 < timeout_s:
                    if q.exception() is not None:
                        raise AssertionError(
                            f"stream died: {q.exception()}"
                        )
                    try:
                        if commit.table_exists(host, dst) and _content(
                            host, commit, dst
                        ) == _content(host, commit, src):
                            return
                    except Exception:
                        pass
                    time.sleep(0.4)
                raise AssertionError(
                    f"mirror never converged: "
                    f"{_content(host, commit, dst) if commit.table_exists(host, dst) else None}"
                    f" != {_content(host, commit, src)}"
                )

            wait_equal()
            commit.append_table_with_meta(
                host, src,
                spark.createDataFrame([(9, 90)], SCHEMA).coalesce(1),
                {},
            )
            wait_equal()
            merge_into(
                host, src,
                spark.createDataFrame([(2, 99)], SCHEMA),
                ["k"], commit=commit, mode="dv",
            )
            wait_equal()
            delete_rows(
                host, src, _ids(spark, [1]), ["k"],
                commit=commit, mode="dv",
            )
            wait_equal()
            assert _content(host, commit, dst) == [
                (2, 99), (3, 30), (9, 90),
            ]
        finally:
            q.stop()
