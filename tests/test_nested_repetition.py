"""Nested evolution across REPETITION contexts (r16, VERDICT r15
#5): dotted paths step through array elements (``items.element.sku``)
and map values (``attrs.value.score``) for metadata-only rename/drop.
Reads rebuild per-element through ``transform()`` /
``transform_values()`` (never exploded), appends and the connector
writer translate back to the stable physical leaf names, the
connector's Arrow readers rewrap list/map buffers verbatim (per-
element identity, null slots and slices carry over), and schema
inference serves the logical shape. Dropped-name re-adds REMINT
(engine appends and connector writes alike); refusals stay loud for
map KEYS, nested widen across repetition, non-atomic re-adds, and
wrong repetition segments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError

SCHEMA = (
    "id long, "
    "items array<struct<sku: string, price: double, note: string, "
    "dims: struct<w: long, h: long>>>, "
    "attrs map<string, struct<tag: string, score: long>>"
)

POST_SCHEMA = (
    "id long, "
    "items array<struct<code: string, price: double, "
    "dims: struct<w: long, h: long>>>, "
    "attrs map<string, struct<tag: string, points: long>>"
)


def _rows(spark):
    return spark.createDataFrame(
        [
            (1, [("a", 1.0, "x", (10, 20)), ("b", 2.0, "y", (30, 40))],
             {"k1": ("m", 5)}),
            (2, None, None),
            (3, [], {}),
            (4, [("c", 3.0, "z", None)], {"k2": ("n", 7), "k3": ("o", 9)}),
        ],
        SCHEMA,
    ).coalesce(1)


def _fx(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / "t")
    commit.append_tables(host, path, {"": _rows(spark)})
    return host, commit, path


def _evolve(host, commit, path):
    commit.rename_column(host, path, "items.element.sku", "code")
    commit.drop_column(host, path, "items.element.note")
    commit.rename_column(host, path, "attrs.value.score", "points")


def _by_id(df):
    return {r.id: r.asDict(recursive=True) for r in df.collect()}


class TestRepetitionRenameDrop:
    def test_metadata_only_roundtrip(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        files = commit.member_files(host, path)
        _evolve(host, commit, path)
        assert commit.member_files(host, path) == files  # zero IO
        got = _by_id(commit.read_table(host, path))
        assert got[1]["items"] == [
            {"code": "a", "price": 1.0, "dims": {"w": 10, "h": 20}},
            {"code": "b", "price": 2.0, "dims": {"w": 30, "h": 40}},
        ]
        assert got[1]["attrs"] == {"k1": {"tag": "m", "points": 5}}
        # NULL containers stay NULL; empties stay empty
        assert got[2]["items"] is None and got[2]["attrs"] is None
        assert got[3]["items"] == [] and got[3]["attrs"] == {}
        # NULL element-struct field inside a live element
        assert got[4]["items"][0]["dims"] is None
        assert commit.schema_meta(host, path)["nested"] == {
            "items.element": {"map": {"code": "sku"}, "drop": ["note"]},
            "attrs.value": {"map": {"points": "score"}},
        }

    def test_struct_under_element_evolves_too(self, spark, tmp_path):
        """A plain-struct leaf BELOW the repetition context keeps the
        full dotted machinery: rename items.element.dims.w."""
        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "items.element.dims.w", "width")
        got = _by_id(commit.read_table(host, path))
        assert got[1]["items"][1]["dims"] == {"width": 30, "h": 40}
        assert commit.schema_meta(host, path)["nested"] == {
            "items.element.dims": {"map": {"width": "w"}}
        }

    def test_appends_after_evolution_write_physical(
        self, spark, tmp_path
    ):
        import pyarrow.parquet as pq

        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        before = set(commit.member_files(host, path))
        post = spark.createDataFrame(
            [(5, [("d", 4.0, (1, 2))], {"k5": ("p", 11)})], POST_SCHEMA
        ).coalesce(1)
        commit.append_tables(host, path, {"": post})
        got = _by_id(commit.read_table(host, path))
        assert got[5]["items"] == [
            {"code": "d", "price": 4.0, "dims": {"w": 1, "h": 2}}
        ]
        assert got[5]["attrs"] == {"k5": {"tag": "p", "points": 11}}
        # the new file stores the PHYSICAL leaf names under the
        # repetition contexts (sku / score), never the logical ones
        new = set(commit.member_files(host, path)) - before
        base = commit._member_root(*commit._resolve(host, path))
        s = pq.read_schema(f"{base}/{new.pop()}")
        flat = str(s)
        assert "sku" in flat and "code" not in flat
        assert "score" in flat and "points" not in flat

    def test_rename_back_and_feed(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        commit.rename_column(host, path, "items.element.sku", "code")
        commit.rename_column(host, path, "items.element.code", "sku")
        got = _by_id(commit.read_table(host, path))
        assert got[1]["items"][0]["sku"] == "a"
        # identity mapping elides from the meta entirely
        assert "nested" not in commit.schema_meta(host, path)

    def test_change_feed_serves_logical_view(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        v = commit.table_versions(host, path)[-1]
        post = spark.createDataFrame(
            [(6, [("e", 6.0, (3, 4))], {"k6": ("q", 13)})], POST_SCHEMA
        ).coalesce(1)
        commit.append_tables(host, path, {"": post})
        changes = commit.read_changes(host, path, v)
        rows = {r.id: r.asDict(recursive=True) for r in changes.collect()}
        assert rows[6]["items"][0]["code"] == "e"
        assert rows[6]["attrs"]["k6"]["points"] == 13

    def test_time_travel_sees_pre_change_view(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        _evolve(host, commit, path)
        old = _by_id(commit.read_table(host, path, None, version=v0))
        assert old[1]["items"][0]["sku"] == "a"
        assert old[1]["items"][0]["note"] == "x"
        assert old[1]["attrs"]["k1"]["score"] == 5


class TestRepetitionRefusals:
    def test_map_key_refuses(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        with pytest.raises(ValidationError, match="identity"):
            commit.rename_column(host, path, "attrs.key.x", "y")

    def test_widen_refuses_across_repetition(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        with pytest.raises(ValidationError, match="repetition"):
            commit.widen_column(
                host, path, "items.element.dims.w", "double"
            )

    def test_wrong_segment_names_refuse_with_remedy(
        self, spark, tmp_path
    ):
        host, commit, path = _fx(spark, tmp_path)
        with pytest.raises(ValidationError, match="'element' segment"):
            commit.rename_column(host, path, "items.sku", "code")
        with pytest.raises(ValidationError, match="'value' segment"):
            commit.rename_column(host, path, "attrs.score", "points")

    def test_move_between_parents_refuses(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        with pytest.raises(ValidationError, match="MOVE"):
            commit.rename_column(
                host, path, "items.element.sku", "attrs.value.sku"
            )

    def test_last_element_field_refuses_drop(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "one")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(1, [(7,)])], "id long, xs array<struct<v: long>>"
            ).coalesce(1)},
        )
        with pytest.raises(ValidationError, match="only field"):
            commit.drop_column(host, path, "xs.element.v")

    def test_dropped_name_reuse_remints_under_repetition(
        self, spark, tmp_path
    ):
        """r16: the nested remint works under array elements too —
        the re-added leaf mints ``note__r2`` inside the element
        struct, old per-element bytes stay hidden, pre-re-add
        elements read NULL."""
        host, commit, path = _fx(spark, tmp_path)
        commit.drop_column(host, path, "items.element.note")
        re_add = spark.createDataFrame(
            [(9, [("f", 1.0, "fresh", (0, 0))], None)], SCHEMA
        ).coalesce(1)
        commit.append_tables(host, path, {"": re_add})
        got = _by_id(commit.read_table(host, path))
        assert got[9]["items"][0]["note"] == "fresh"
        assert got[1]["items"][0]["note"] is None  # old bytes hidden
        spec = commit.schema_meta(host, path)["nested"]["items.element"]
        assert spec["map"]["note"] == "note__r2"
        assert spec["phys_types"]["note__r2"] == "string"
        # connector batch read agrees (Arrow-side NULL backfill under
        # the list rewrap)
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        cgot = _by_id(read_table_batch(spark, path))
        assert cgot[9]["items"][0]["note"] == "fresh"
        assert cgot[1]["items"][0]["note"] is None


class TestRepetitionConnector:
    def test_batch_read_inferred_and_explicit(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        # inferred schema (exercises _nested_type_any)
        inf = read_table_batch(spark, path)
        got = _by_id(inf)
        assert got[1]["items"][1] == {
            "code": "b", "price": 2.0, "dims": {"w": 30, "h": 40}
        }
        assert got[4]["attrs"]["k3"]["points"] == 9
        assert got[2]["items"] is None
        # explicit logical schema agrees
        exp = read_table_batch(spark, path, schema=POST_SCHEMA)
        assert _by_id(exp) == got

    def test_connector_write_translates_under_repetition(
        self, spark, tmp_path
    ):
        import pyarrow.parquet as pq

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        register_manifest_source(spark)
        before = set(commit.member_files(host, path))
        (
            spark.createDataFrame(
                [(7, [("g", 8.0, (5, 6))], {"k7": ("r", 17)})],
                POST_SCHEMA,
            )
            .write.format("rlts_table")
            .option("path", path)
            .mode("append")
            .save()
        )
        got = _by_id(commit.read_table(host, path))
        assert got[7]["items"] == [
            {"code": "g", "price": 8.0, "dims": {"w": 5, "h": 6}}
        ]
        assert got[7]["attrs"] == {"k7": {"tag": "r", "points": 17}}
        new = set(commit.member_files(host, path)) - before
        base = commit._member_root(*commit._resolve(host, path))
        flat = str(pq.read_schema(f"{base}/{new.pop()}"))
        assert "sku" in flat and "score" in flat

    def test_connector_write_remints_dropped_reuse(self, spark, tmp_path):
        """r16: a dropped-name re-add UNDER AN ARRAY ELEMENT remints
        at the connector's plan time — the write lands with the
        synthetic physical leaf, old per-element bytes stay hidden."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.drop_column(host, path, "items.element.note")
        register_manifest_source(spark)
        (
            spark.createDataFrame(
                [(8, [("h", 1.0, "new-note", (1, 1))], None)], SCHEMA
            )
            .write.format("rlts_table")
            .option("path", path)
            .mode("append")
            .save()
        )
        got = _by_id(commit.read_table(host, path))
        assert got[8]["items"][0]["note"] == "new-note"
        assert got[1]["items"][0]["note"] is None
        spec = commit.schema_meta(host, path)["nested"]["items.element"]
        assert spec["map"]["note"] == "note__r2"

    def test_stream_serves_repetition_view(self, spark, tmp_path):
        import time

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_stream,
        )

        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        df = read_table_stream(
            spark, path, schema=POST_SCHEMA, startingversion="earliest"
        )
        q = (
            df.selectExpr("id", "get(items, 0).code AS c0",
                          "get(map_values(attrs), 0).points AS p0")
            .writeStream.format("memory")
            .queryName("nested_rep_stream")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            t0 = time.time()
            while time.time() - t0 < 120:
                if q.exception() is not None:
                    raise AssertionError(q.exception())
                n = spark.sql(
                    "SELECT count(*) c FROM nested_rep_stream"
                ).first().c
                if n >= 4:
                    break
                time.sleep(0.3)
            rows = {
                r.id: (r.c0, r.p0)
                for r in spark.sql(
                    "SELECT * FROM nested_rep_stream"
                ).collect()
            }
            assert rows[1] == ("a", 5)
            assert rows[2] == (None, None)
        finally:
            q.stop()

    def test_merge_reads_through_repetition_mapping(
        self, spark, tmp_path
    ):
        """A row-level MERGE on the evolved member: planning reads the
        logical view (transform rebuild), the replacement files store
        physical leaves, and nothing resurrects."""
        from redis_lsm_timeseries_spark.operators.merge import merge_into

        host, commit, path = _fx(spark, tmp_path)
        _evolve(host, commit, path)
        src = spark.createDataFrame(
            [(1, [("A", 10.0, (9, 9))], {"K": ("M", 50)})], POST_SCHEMA
        )
        merge_into(
            host, path, src, ["id"], commit=commit, mode="rewrite"
        )
        got = _by_id(commit.read_table(host, path))
        assert got[1]["items"] == [
            {"code": "A", "price": 10.0, "dims": {"w": 9, "h": 9}}
        ]
        assert got[1]["attrs"] == {"K": {"tag": "M", "points": 50}}
        assert got[4]["items"][0]["code"] == "c"  # untouched row intact

    def test_inference_fills_reminted_leaf_missing_from_newest_footer(
        self, spark, tmp_path
    ):
        """Connector schema inference samples the NEWEST footer; when
        that file predates (or simply omits) the reminted leaf, the
        spec's phys_types forces it into the inferred logical shape
        and the Arrow read NULL-fills it."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _fx(spark, tmp_path)
        commit.drop_column(host, path, "items.element.note")
        # re-add -> remint note__r2
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(9, [("f", 1.0, "fresh", (0, 0))], None)], SCHEMA
            ).coalesce(1)},
        )
        # a LATER batch omitting the re-added leaf (additive contract)
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(10, [("g", 2.0, (3, 4))], None)],
                "id long, items array<struct<sku: string, "
                "price: double, dims: struct<w: long, h: long>>>, "
                "attrs map<string, struct<tag: string, score: long>>",
            ).coalesce(1)},
        )
        got = _by_id(read_table_batch(spark, path))  # inferred schema
        assert got[9]["items"][0]["note"] == "fresh"
        assert got[10]["items"][0]["note"] is None
        assert got[1]["items"][0]["note"] is None
