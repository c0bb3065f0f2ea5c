"""CHECK constraints (r14) — the Delta constraint idiom on the
manifest commit: a named SQL boolean over logical columns, validated
against existing data at ADD time and against every staged data write
before its commit lands. A violating batch aborts atomically (staged
files removed, nothing visible); CDF files and DV blobs are change
metadata, not table content, and stage unchecked; schema changes to a
referenced column refuse while the constraint stands."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)

SCHEMA = "id long, v long"


def _fx(spark, tmp_path, n=20):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / "t")
    commit.append_tables(
        host, path,
        {"": spark.range(n).selectExpr("id", "id * 2 AS v").coalesce(1)},
    )
    return host, commit, path


class TestCheckConstraints:
    def test_add_validates_existing_then_gates_appends(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        assert commit.table_constraints(host, path) == {
            "v_nonneg": "v >= 0"
        }
        # a violating append aborts atomically
        files_before = commit.member_files(host, path)
        v_before = commit.table_versions(host, path)[-1]
        with pytest.raises(ValidationError, match="v_nonneg"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame([(99, -1)], SCHEMA)
                 .coalesce(1)},
            )
        assert commit.member_files(host, path) == files_before
        assert commit.table_versions(host, path)[-1] == v_before
        # a clean append lands
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(99, 0)], SCHEMA).coalesce(1)},
        )
        assert commit.read_table(host, path).count() == 21

    def test_add_refuses_on_existing_violation(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        with pytest.raises(ValidationError, match="existing row"):
            commit.add_constraint(host, path, "small", "v < 10")
        assert commit.table_constraints(host, path) == {}

    def test_null_evaluations_are_violations(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_pos", "v >= 0")
        with pytest.raises(ValidationError, match="v_pos"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame(
                    [(1, None)], SCHEMA
                ).coalesce(1)},
            )

    def test_merge_and_replace_outputs_validate(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.operators.merge import (
            replace_range,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        with pytest.raises(ValidationError, match="v_nonneg"):
            merge_into(
                host, path,
                spark.createDataFrame([(5, -5)], SCHEMA),
                ["id"], commit=commit,
            )
        with pytest.raises(ValidationError, match="v_nonneg"):
            replace_range(
                host, path,
                spark.createDataFrame([(5, -5)], SCHEMA),
                "id", lo=0, hi=9, commit=commit,
            )
        # clean merge passes; dv mode passes too (appends validate)
        merge_into(
            host, path,
            spark.createDataFrame([(5, 500)], SCHEMA),
            ["id"], commit=commit, mode="dv",
        )
        assert commit.read_table(host, path).where(
            "id = 5"
        ).first()["v"] == 500

    def test_dv_delete_unaffected_by_constraints(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        # a DV delete stages only a positions blob (file/pos schema —
        # not table content); it must not trip the constraint scan
        delete_rows(
            host, path,
            spark.createDataFrame([(3,)], "id long"), ["id"],
            commit=commit, mode="dv",
        )
        assert commit.read_table(host, path).count() == 19

    def test_drop_constraint_reopens(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        commit.drop_constraint(host, path, "v_nonneg")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(99, -1)], SCHEMA).coalesce(1)},
        )
        assert commit.read_table(host, path).count() == 21
        commit.drop_constraint(host, path, "nope")  # idempotent

    def test_schema_changes_to_referenced_column_refuse(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        with pytest.raises(ValidationError, match="v_nonneg"):
            commit.rename_column(host, path, "v", "val")
        with pytest.raises(ValidationError, match="v_nonneg"):
            commit.drop_column(host, path, "v")
        # an unreferenced column still evolves
        commit.rename_column(host, path, "id", "ident")
        assert commit.read_table(host, path).columns == ["ident", "v"]

    def test_composes_with_schema_mapping(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "v", "val")
        commit.add_constraint(host, path, "val_nonneg", "val >= 0")
        # staged files carry PHYSICAL names; validation must run on
        # the logical view the expression references
        with pytest.raises(ValidationError, match="val_nonneg"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame(
                    [(1, -1)], "id long, val long"
                ).coalesce(1)},
            )
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(1, 1)], "id long, val long"
            ).coalesce(1)},
        )
        assert commit.read_table(host, path).count() == 21

    def test_connector_write_commits_on_pass(self, spark, tmp_path):
        """r15: the connector validates CHECK constraints task-side
        against the staged Arrow output instead of refusing — a
        passing write commits."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        register_manifest_source(spark)
        (
            spark.createDataFrame([(100, 7)], SCHEMA)
            .write.format("rlts_table")
            .option("path", path)
            .mode("append")
            .save()
        )
        got = {
            r.id: r.v for r in commit.read_table(host, path).collect()
        }
        assert got[100] == 7 and len(got) == 21

    def test_connector_write_aborts_on_violation(self, spark, tmp_path):
        """A violating row fails the job and leaves only invisible
        orphans — the table is untouched at both the row and the
        version level."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        register_manifest_source(spark)
        v0 = commit.table_versions(host, path)[-1]
        with pytest.raises(Exception, match="v_nonneg"):
            (
                spark.createDataFrame([(100, 7), (101, -1)], SCHEMA)
                .write.format("rlts_table")
                .option("path", path)
                .mode("append")
                .save()
            )
        assert commit.table_versions(host, path)[-1] == v0
        assert commit.read_table(host, path).count() == 20

    def test_connector_null_evaluation_violates(self, spark, tmp_path):
        """NULL constraint evaluations are violations on the connector
        path too — identical semantics to the engine's _violation."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        register_manifest_source(spark)
        with pytest.raises(Exception, match="v_nonneg"):
            (
                spark.createDataFrame([(100, None)], SCHEMA)
                .write.format("rlts_table")
                .option("path", path)
                .mode("append")
                .save()
            )
        assert commit.read_table(host, path).count() == 20

    def test_staged_write_conflicts_with_concurrent_add(
        self, spark, tmp_path, monkeypatch
    ):
        """ADVICE r14 (medium): a write STAGED before a concurrent
        add_constraint lands must not commit unvalidated rows behind
        the new constraint — the commit CAS-checks the constraint map
        it validated against."""
        from redis_lsm_timeseries_spark.errors import (
            RewriteConflictError,
        )

        host, commit, path = _fx(spark, tmp_path)
        # inject AFTER _stage_data validated (against the empty map)
        # and BEFORE the commit: _file_stats runs in that window
        real = ManifestCommit._file_stats
        raced = {"done": False}

        def racing(self_, store, root, member, files):
            out = real(self_, store, root, member, files)
            if not raced["done"] and member == "" and files:
                raced["done"] = True
                # the constraint lands while our violating rows sit
                # staged-invisible (its full-table scan cannot see
                # them) — the staged commit must CONFLICT
                ManifestCommit().add_constraint(
                    store, path, "v_nonneg", "v >= 0"
                )
            return out

        monkeypatch.setattr(ManifestCommit, "_file_stats", racing)
        with pytest.raises(RewriteConflictError, match="constraint"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame([(100, -5)], SCHEMA)},
            )
        monkeypatch.undo()
        assert raced["done"]
        # nothing landed; the constraint holds over the whole table
        cur = commit.read_table(host, path)
        assert cur.count() == 20
        assert cur.where("v < 0").isEmpty()
        # and a re-staged valid write passes through the new gate
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(100, 5)], SCHEMA)},
        )
        assert commit.read_table(host, path).count() == 21

    def test_staged_write_conflicts_with_concurrent_drop(
        self, spark, tmp_path, monkeypatch
    ):
        """The reverse direction: a write validated against a
        constraint that is concurrently DROPPED conflicts too (the
        map changed; re-staging sees the new truth)."""
        from redis_lsm_timeseries_spark.errors import (
            RewriteConflictError,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        real = ManifestCommit._file_stats
        raced = {"done": False}

        def racing(self_, store, root, member, files):
            out = real(self_, store, root, member, files)
            if not raced["done"] and member == "" and files:
                raced["done"] = True
                ManifestCommit().drop_constraint(store, path, "v_nonneg")
            return out

        monkeypatch.setattr(ManifestCommit, "_file_stats", racing)
        with pytest.raises(RewriteConflictError, match="constraint"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame([(100, 5)], SCHEMA)},
            )
        monkeypatch.undo()
        assert commit.read_table(host, path).count() == 20

    def test_concurrent_add_conflicts(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.errors import (
            RewriteConflictError,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "a", "v >= 0")
        # a second add planned against the pre-"a" entry must CAS-fail
        # rather than clobber: simulate by re-adding the same name
        with pytest.raises(ValidationError, match="already exists"):
            commit.add_constraint(host, path, "a", "v >= 1")


class TestDialectGateAndStaleCAS:
    """r16 (VERDICT r15 #3/#4): constraint expressions must live in
    the ANSI subset the connector's task-side validator parses, gated
    at ADD; and an abandoned stage's thread-local constraint snapshot
    must never trip a later unrelated commit."""

    def test_spark_only_expression_refuses_at_add(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        # '<=>' (null-safe equality) is Spark-only; without the ADD
        # gate the first signal would be a worker-side parse failure
        # in every subsequent connector write to the member
        with pytest.raises(ValidationError, match="does not parse"):
            commit.add_constraint(host, path, "nse", "v <=> 0")
        assert commit.table_constraints(host, path) == {}
        # so is RLIKE
        with pytest.raises(ValidationError, match="does not parse"):
            commit.add_constraint(host, path, "rl", "CAST(v AS STRING) rlike '0'")
        # an ANSI-subset expression still installs and still gates
        commit.add_constraint(host, path, "v_ok", "v >= 0")
        assert "v_ok" in commit.table_constraints(host, path)
        with pytest.raises(ValidationError, match="v_ok"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame([(1, -5)], SCHEMA).coalesce(1)},
            )

    def test_abandoned_stage_cannot_trip_a_later_commit(
        self, spark, tmp_path, monkeypatch
    ):
        """An exception between _stage_data and _commit leaves a
        pending constraint-CAS entry; because it is keyed by the
        staged FILE SET (orphans no commit ever adds), a later
        same-thread commit on the same member — even after the
        constraint map changed — must land cleanly, not raise a
        spurious RewriteConflictError."""
        import pyarrow as pa
        from pyspark.sql.types import StructType

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            ManifestArrowWriter,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.add_constraint(host, path, "v_nonneg", "v >= 0")
        real = ManifestCommit._commit
        state = {"boom": True}

        def flaky(self_, store, root, mutate):
            if state["boom"]:
                state["boom"] = False
                raise RuntimeError("injected between stage and commit")
            return real(self_, store, root, mutate)

        monkeypatch.setattr(ManifestCommit, "_commit", flaky)
        with pytest.raises(RuntimeError, match="injected"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame([(50, 1)], SCHEMA)
                 .coalesce(1)},
            )
        monkeypatch.undo()
        # the constraint map CHANGES after the abandoned stage...
        commit.add_constraint(host, path, "id_pos", "id >= 0")
        # ...then a same-thread commit that lands OTHER files on the
        # member (the connector's two-phase writer commits without
        # _stage_data) must not conflict against the stale snapshot
        w = ManifestArrowWriter(
            StructType.fromDDL(SCHEMA), False, {"path": path}
        )
        msg = w.write(
            iter(pa.Table.from_pylist([{"id": 60, "v": 6}]).to_batches())
        )
        w.commit([msg])
        got = commit.read_table(host, path).where("id = 60").collect()
        assert [(r.id, r.v) for r in got] == [(60, 6)]
        # and the RETRY of the original append lands cleanly too
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame([(50, 1)], SCHEMA).coalesce(1)},
        )
        assert commit.read_table(host, path).count() == 22
