"""COPY INTO (r17): idempotent bulk-file ingest — load exactly the
not-yet-taken files from a landing directory, cursor and rows in one
CAS'd commit. Pinned here: exactly-once across re-runs and injected
races, incremental pickup of new files, glob patterns, name binding
with store-assignment casts + additive evolution, JSON sources, and
the facade statement."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import (
    RewriteConflictError,
    ValidationError,
)
from redis_lsm_timeseries_spark.operators.copy_into import copy_into
from redis_lsm_timeseries_spark.sql_dml import sql

SCHEMA = "id long, v long"


def _land(spark, base, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        f"{base}/{name}"
    )


def _fx(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    src = str(tmp_path / "landing")
    _land(spark, src, "d1", [(1, 10), (2, 20)])
    _land(spark, src, "d2", [(3, 30)])
    return host, commit, str(tmp_path / "t"), src


class TestCopyInto:
    def test_load_then_rerun_is_noop(self, spark, tmp_path):
        host, commit, path, src = _fx(spark, tmp_path)
        st = copy_into(host, path, src)
        assert (st.files_loaded, st.rows_loaded) == (2, 3)
        assert sorted(
            (r.id, r.v) for r in commit.read_table(host, path).collect()
        ) == [(1, 10), (2, 20), (3, 30)]
        st2 = copy_into(host, path, src)
        assert (st2.files_loaded, st2.rows_loaded) == (0, 0)
        assert st2.files_skipped == 2
        assert commit.read_table(host, path).count() == 3

    def test_new_file_loads_incrementally(self, spark, tmp_path):
        host, commit, path, src = _fx(spark, tmp_path)
        copy_into(host, path, src)
        _land(spark, src, "d3", [(4, 40), (5, 50)])
        st = copy_into(host, path, src)
        assert (st.files_loaded, st.rows_loaded, st.files_skipped) == (
            1, 2, 2,
        )
        assert commit.read_table(host, path).count() == 5

    def test_pattern_filters_listing(self, spark, tmp_path):
        host, commit, path, src = _fx(spark, tmp_path)
        st = copy_into(host, path, src, pattern="d1/*")
        assert st.files_loaded == 1
        assert commit.read_table(host, path).count() == 2
        # widening the pattern later picks up the rest, once
        st2 = copy_into(host, path, src)
        assert st2.files_loaded == 1
        assert commit.read_table(host, path).count() == 3

    def test_name_binding_cast_and_additive_column(
        self, spark, tmp_path
    ):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(1, 10)], SCHEMA).coalesce(1)},
        )
        src = str(tmp_path / "landing")
        # int ids (narrower) + an extra column, shuffled column order
        spark.createDataFrame(
            [("x", 7, 70)], "note string, id int, v int"
        ).coalesce(1).write.parquet(f"{src}/d1")
        st = copy_into(host, path, src)
        assert st.files_loaded == 1
        # additive columns read back under the EXPLICIT evolved
        # schema — the engine's documented posture (schema-less reads
        # take one footer and may miss late columns; mergeSchema's
        # every-footer scan is not a 100 TB default)
        df = commit.read_table(
            host, path, "id long, v long, note string"
        )
        assert dict(df.dtypes)["id"] == "bigint"  # cast to target
        rows = {(r.id, r.v, r.note) for r in df.collect()}
        assert rows == {(1, 10, None), (7, 70, "x")}

    def test_missing_target_column_refuses(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(1, 10)], SCHEMA).coalesce(1)},
        )
        src = str(tmp_path / "landing")
        spark.createDataFrame([(5,)], "id long").coalesce(
            1
        ).write.parquet(f"{src}/d1")
        with pytest.raises(ValidationError, match="lack target"):
            copy_into(host, path, src)
        # nothing committed, nothing marked loaded
        assert commit.read_table(host, path).count() == 1
        assert copy_into(
            host, path, src, pattern="nothing/*"
        ).files_loaded == 0

    def test_json_fileformat(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        src = tmp_path / "landing"
        src.mkdir()
        (src / "a.jsonl").write_text(
            '{"id": 1, "v": 10}\n{"id": 2, "v": 20}\n'
        )
        st = copy_into(host, path, str(src), file_format="json")
        assert (st.files_loaded, st.rows_loaded) == (1, 2)
        assert copy_into(
            host, path, str(src), file_format="json"
        ).files_loaded == 0

    def test_facade_statement(self, spark, tmp_path):
        host, commit, path, src = _fx(spark, tmp_path)
        r = sql(
            spark,
            f"COPY INTO `{path}` FROM '{src}' FILEFORMAT = PARQUET "
            "PATTERN = 'd*/*.parquet'",
        ).first()
        assert (r.num_files_loaded, r.num_rows_loaded) == (2, 3)
        r2 = sql(spark, f"COPY INTO `{path}` FROM '{src}'").first()
        assert r2.num_files_loaded == 0
        assert r2.num_files_skipped == 2

    def test_race_loses_cas_and_never_double_loads(
        self, spark, tmp_path, monkeypatch
    ):
        """A commit landing between plan and commit of another COPY
        INTO run trips the cursor CAS — the slow run raises instead of
        double-loading; its retry finds nothing new."""
        host, commit, path, src = _fx(spark, tmp_path)
        real = ManifestCommit.append_table_with_meta
        fired = {"done": False}

        def interleave(self, store, p, df, app_meta, expected_app=None):
            if not fired["done"]:
                fired["done"] = True
                # a competing run plans AND commits first
                copy_into(store, path, src, commit=ManifestCommit())
            return real(
                self, store, p, df, app_meta,
                expected_app=expected_app,
            )

        monkeypatch.setattr(
            ManifestCommit, "append_table_with_meta", interleave
        )
        with pytest.raises(RewriteConflictError):
            copy_into(host, path, src, commit=commit)
        monkeypatch.setattr(
            ManifestCommit, "append_table_with_meta", real
        )
        # the winner loaded everything exactly once; the loser's
        # retry is a no-op
        assert commit.read_table(host, path).count() == 3
        assert copy_into(host, path, src, commit=commit).files_loaded \
            == 0

    def test_unmanaged_path_refuses(self, spark, tmp_path):
        host = CommitHost(spark)
        plain = tmp_path / "plain"
        plain.mkdir()
        (plain / "x.txt").write_text("not a table")
        with pytest.raises(ValidationError, match="manifest-managed"):
            copy_into(host, str(plain), str(tmp_path / "landing"))

    def test_hive_partitioned_landing_keeps_path_columns(
        self, spark, tmp_path
    ):
        """A landing dir laid out hive-style (dt=.../) contributes
        its partition-path column as data (basePath discovery), and
        a later partition dir loads incrementally."""
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        src = str(tmp_path / "landing")
        spark.createDataFrame(
            [(1, 10)], SCHEMA
        ).coalesce(1).write.parquet(f"{src}/region=eu")
        st = copy_into(host, path, src)
        assert (st.files_loaded, st.rows_loaded) == (1, 1)
        spark.createDataFrame(
            [(2, 20)], SCHEMA
        ).coalesce(1).write.parquet(f"{src}/region=us")
        st2 = copy_into(host, path, src)
        assert (st2.files_loaded, st2.files_skipped) == (1, 1)
        rows = sorted(
            (r.id, r.v, r.region)
            for r in commit.read_table(
                host, path, "id long, v long, region string"
            ).collect()
        )
        assert rows == [(1, 10, "eu"), (2, 20, "us")]
