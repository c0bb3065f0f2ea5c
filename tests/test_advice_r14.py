"""Adversarial hardening of the round-14 surfaces: the dropped-name
remint under racing schema evolutions, the sharded Bloom build's
crash-consistency (manifest-last protocol), and the manifest-hot
ingest cursor on empty micro-batches."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.commit import (
    CommitHost,
    ManifestCommit,
)

SCHEMA = "k long, v int, name string"


def _fx(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / "t")
    commit.append_table_with_meta(
        host, path,
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], SCHEMA)
        .coalesce(1),
        {},
    )
    return host, commit, path


class TestRemintRaces:
    def test_remint_retries_through_a_racing_evolution(
        self, spark, tmp_path, monkeypatch
    ):
        """A non-overlapping schema evolution landing between the
        remint's entry read and its CAS commit must not fail the
        append — the remint re-reads and retries, and the racing
        change survives alongside the minted id."""
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t4")
        commit.append_table_with_meta(
            host, path,
            spark.createDataFrame(
                [(1, 10, 100, "a"), (2, 20, 200, "b")],
                "k long, v int, w int, name string",
            ).coalesce(1),
            {},
        )
        commit.drop_column(host, path, "v")
        real = ManifestCommit._current_entry
        armed = {"n": 0}

        def racing(self_, store, root):
            v, entry = real(self_, store, root)
            # inject exactly one racing widen INSIDE the remint's
            # read-then-CAS window
            if armed["n"] == 0 and "__schema__:" in str(entry.get("app", {})):
                armed["n"] = 1
                monkeypatch.setattr(
                    ManifestCommit, "_current_entry", real
                )
                commit.widen_column(host, path, "w", "long")
                monkeypatch.setattr(
                    ManifestCommit, "_current_entry", racing
                )
            return v, entry

        monkeypatch.setattr(ManifestCommit, "_current_entry", racing)
        commit.append_table_with_meta(
            host, path,
            spark.createDataFrame(
                [(9, 99, 900, "z")], "k long, v int, w int, name string"
            ).coalesce(1),
            {},
        )
        monkeypatch.setattr(ManifestCommit, "_current_entry", real)
        meta = commit.schema_meta(host, path)
        assert meta["map"]["v"].startswith("v__r")  # the remint landed
        assert meta["widen"] == {"w": "long"}  # the racing widen too
        df = commit.read_table(host, path, None)
        assert dict(df.dtypes)["w"] == "bigint"
        got = sorted((r.k, r.v, r.w) for r in df.collect())
        assert got == [(1, None, 100), (2, None, 200), (9, 99, 900)]

    def test_rename_racing_a_stale_named_append_fails_loudly(
        self, spark, tmp_path
    ):
        """A writer appending under a column name a concurrent rename
        just retired gets a LOUD error (the Delta metadata-conflict
        posture), never a silent aliasing onto the renamed column's
        physical name."""
        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "name", "label")
        from redis_lsm_timeseries_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="PHYSICAL"):
            commit.append_table_with_meta(
                host, path,
                spark.createDataFrame([(9, 99, "z")], SCHEMA)
                .coalesce(1),
                {},
            )

    def test_two_writers_reusing_the_name_converge_on_one_id(
        self, spark, tmp_path
    ):
        """Sequential appends both carrying the re-added column: the
        second observes the first's minted id (no second remint)."""
        host, commit, path = _fx(spark, tmp_path)
        commit.drop_column(host, path, "v")
        for k in (8, 9):
            commit.append_table_with_meta(
                host, path,
                spark.createDataFrame([(k, k * 11, "x")], SCHEMA)
                .coalesce(1),
                {},
            )
        meta = commit.schema_meta(host, path)
        # exactly one minted id
        assert list(meta["phys_types"]) == [meta["map"]["v"]]
        got = sorted(
            (r.k, r.v)
            for r in commit.read_table(host, path, None).collect()
        )
        assert got == [(1, None), (2, None), (8, 88), (9, 99)]


class TestShardedBloomCrash:
    def test_crashed_rebuild_leaves_the_old_generation_probing(
        self, spark, tmp_path, monkeypatch
    ):
        """The manifest is written LAST: a build that dies after
        writing shard files but before the manifest leaves the OLD
        sidecar fully valid (old token dir untouched), so probes keep
        their no-false-negative guarantee."""
        from redis_lsm_timeseries_spark.fs import LOCAL_FS
        from redis_lsm_timeseries_spark.streaming import curation as C

        root = str(tmp_path / "admission")
        process = C.near_dup_admitting_batch(root)
        doc = " ".join(f"w{i}" for i in range(30))
        process(
            spark.createDataFrame([(1, doc)], "doc_id long, text string"),
            0,
        )
        C.build_digest_bloom(spark, root)
        bloom0 = C._load_bloom(root, LOCAL_FS)
        # admit more, then crash the rebuild at the manifest write
        doc2 = " ".join(f"q{i}" for i in range(30))
        process(
            spark.createDataFrame([(2, doc2)], "doc_id long, text string"),
            1,
        )
        real = type(LOCAL_FS).write_text

        def dying(self_, path, text):
            if path.endswith(C.BLOOM_SIDECAR):
                raise OSError("crash before the manifest write")
            return real(self_, path, text)

        monkeypatch.setattr(type(LOCAL_FS), "write_text", dying)
        with pytest.raises(OSError):
            C.build_digest_bloom(spark, root)
        monkeypatch.setattr(type(LOCAL_FS), "write_text", real)
        bloom1 = C._load_bloom(root, LOCAL_FS)
        assert bloom1["dir"] == bloom0["dir"]  # old manifest intact
        # every digest the old manifest covers still hits
        digests = [
            r.digest
            for r in C.read_admission_table(
                spark, root, C.DIGESTS_MEMBER
            ).collect()
        ]
        covered = set(bloom1["files"])
        assert any(covered)
        # the exact guard still blocks a replayed duplicate
        process(
            spark.createDataFrame([(3, doc)], "doc_id long, text string"),
            2,
        )
        out_ids = {
            r.doc_id
            for r in C.read_admitted(spark, root).select("doc_id").collect()
        }
        assert out_ids == {1, 2}
        # and a successful rebuild sweeps the crashed token dir
        C.build_digest_bloom(spark, root)
        bloom2 = C._load_bloom(root, LOCAL_FS)
        base = f"{root}/{C.BLOOM_SHARD_DIR}"
        assert LOCAL_FS.listdir(base) == [bloom2["dir"]]


class TestManifestHotIngestCursor:
    def test_empty_batch_advances_the_cursor(self, spark, tmp_path):
        """An empty micro-batch still lands a (metadata+empty) commit
        with its cursor, so replay detection never regresses."""
        from redis_lsm_timeseries_spark.config import EngineConfig
        from redis_lsm_timeseries_spark.store import TimeseriesStore
        from redis_lsm_timeseries_spark.streaming.ingest import (
            make_maintenance_batch_handler,
        )

        cfg = EngineConfig(
            root=str(tmp_path / "mh"), partition_width=5,
            manifest_hot=True,
        )
        store = TimeseriesStore(spark, cfg, commit=ManifestCommit())
        store.initialize()
        handler = make_maintenance_batch_handler(
            store, str(tmp_path / "ckpt"),
            partition_age_threshold_s=3600.0,
        )
        empty = spark.createDataFrame(
            [], "tag string, ts long, value string"
        )
        handler(empty, 0)
        hot = store.config.hot_path
        assert store.commit.read_app_meta(store, hot).get(
            "sink:hot-ingest:stream"
        ) == 0
        handler(
            spark.createDataFrame([("T", 1, "a")],
                                  "tag string, ts long, value string"),
            1,
        )
        assert store.commit.read_app_meta(store, hot).get(
            "sink:hot-ingest:stream"
        ) == 1
        assert store.hot().count() == 1
