"""Incremental IVF index maintenance: extend_ivf_index appends new
assignments under the committed quantizer; sync_ivf_index keeps the
index in lock-step with a manifest corpus via an exactly-once
change-feed cursor in the index's own app map."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.ann_index import (
    IVF_CURSOR,
    VECTORS_MEMBER,
    build_ivf_index,
    extend_ivf_index,
    ivf_index_topk,
    read_ivf_vectors,
    sync_ivf_index,
)

SCHEMA = "vec_id long, embedding array<double>"


def _vecs(spark, ids, dim=8):
    rows = [
        (i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def env(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "ivf")
    commit.append_table_with_meta(
        host, corpus, _vecs(spark, range(40)), {}
    )
    return host, commit, corpus, index


class TestExtend:
    def test_appends_assignments_without_rewrite(self, spark, env):
        host, commit, corpus, index = env
        build_ivf_index(
            commit.read_table(host, corpus, SCHEMA), index, n_list=4
        )
        before = set(
            commit.member_files(host, f"{index}/{VECTORS_MEMBER}")
        )
        n = extend_ivf_index(_vecs(spark, range(100, 110)), index)
        assert n == 10
        after = set(
            commit.member_files(host, f"{index}/{VECTORS_MEMBER}")
        )
        assert before < after  # pure append: old files untouched
        assert read_ivf_vectors(spark, index).count() == 50
        # the new vectors are servable
        hits = ivf_index_topk(
            _vecs(spark, [100]), index, k=5, n_probe=4
        ).collect()
        assert len(hits) == 5

    def test_extend_without_index_raises(self, spark, env):
        host, commit, corpus, index = env
        with pytest.raises(ValidationError, match="build_ivf_index"):
            extend_ivf_index(_vecs(spark, [1]), index)


class TestSync:
    def test_build_then_incremental_then_noop(self, spark, env):
        host, commit, corpus, index = env
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "build" and r["n"] == 40
        commit.append_table_with_meta(
            host, corpus, _vecs(spark, range(200, 210)), {}
        )
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "incremental" and r["n"] == 10
        assert read_ivf_vectors(spark, index).count() == 50
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "noop"
        assert read_ivf_vectors(spark, index).count() == 50

    def test_crash_before_commit_never_double_indexes(
        self, spark, env
    ):
        host, commit, corpus, index = env
        sync_ivf_index(spark, index, corpus, n_list=4)
        commit.append_table_with_meta(
            host, corpus, _vecs(spark, range(300, 305)), {}
        )
        real = ManifestCommit._commit

        def crashy(self_, store, root, mutate):
            raise RuntimeError("killed")

        ManifestCommit._commit = crashy
        try:
            with pytest.raises(RuntimeError):
                sync_ivf_index(spark, index, corpus, n_list=4)
        finally:
            ManifestCommit._commit = real
        assert read_ivf_vectors(spark, index).count() == 40
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "incremental" and r["n"] == 5
        assert read_ivf_vectors(spark, index).count() == 45
        # exactly-once: every id present exactly once
        ids = [r.vec_id for r in read_ivf_vectors(spark, index).collect()]
        assert len(ids) == len(set(ids))

    def test_corpus_compaction_triggers_rebuild(self, spark, env):
        host, commit, corpus, index = env
        sync_ivf_index(spark, index, corpus, n_list=4)
        # compact the corpus: non-append history
        snap = commit.read_table(host, corpus, SCHEMA)
        rows = [(r.vec_id, list(r.embedding)) for r in snap.collect()]
        commit.snapshot_rewrite(
            host, corpus,
            lambda tmp: spark.createDataFrame(rows, SCHEMA)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp),
        )
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "build" and r["n"] == 40
        ids = [x.vec_id for x in read_ivf_vectors(spark, index).collect()]
        assert len(ids) == 40 and len(set(ids)) == 40

    def test_cursor_rides_the_build_swap(self, spark, env):
        host, commit, corpus, index = env
        sync_ivf_index(spark, index, corpus, n_list=4)
        app = commit.read_app_meta(host, index)
        assert app.get(IVF_CURSOR) == commit.table_versions(
            host, corpus
        )[-1]

    def test_unmanaged_corpus_raises(self, spark, tmp_path, env):
        host, commit, _, index = env
        plain = str(tmp_path / "plain")
        _vecs(spark, range(4)).write.parquet(plain)
        with pytest.raises(ValidationError, match="manifest"):
            sync_ivf_index(spark, index, plain)


class TestVacuumedCursor:
    def test_lagging_sync_rebuilds_after_corpus_vacuum(
        self, spark, env
    ):
        host, commit, corpus, index = env
        sync_ivf_index(spark, index, corpus, n_list=4)
        for i in range(4):
            commit.append_table_with_meta(
                host, corpus, _vecs(spark, range(500 + i, 501 + i)), {}
            )
        commit.vacuum(host, corpus, retain_versions=1)
        r = sync_ivf_index(spark, index, corpus, n_list=4)
        assert r["mode"] == "build" and r["n"] == 44
        ids = [x.vec_id for x in read_ivf_vectors(spark, index).collect()]
        assert len(ids) == 44 and len(set(ids)) == 44
