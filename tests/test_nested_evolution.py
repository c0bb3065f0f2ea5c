"""Nested-field schema evolution (r15, VERDICT r14 #5): the column
mapping extends to STRUCT FIELDS via dotted paths — the Delta
nested-column-mapping idiom on the manifest log. ``rename_column(...,
"props.device", "props.dev_kind")`` / ``drop_column(..., "props.x")``
land one metadata-only CAS-guarded commit each: zero data files move,
PRE-change files serve the new logical view, appends translate
logical -> physical leaf names, change feeds and the connector's
batch reader assemble the same view, and the directory backend
degrades to an eager rewrite. Since r16 paths may cross array
elements and map values (tests/test_nested_repetition.py); still
refused, each loudly: map KEY evolution, nested widen across
repetition, and a new field reusing a dropped nested name at append
(no nested remint)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from redis_lsm_timeseries_spark.commit import (
    CommitHost,
    ManifestCommit,
    ParquetLeaseCommit,
)
from redis_lsm_timeseries_spark.errors import ValidationError

SCHEMA = (
    "k long, props struct<device: string, os: string, "
    "geo: struct<cc: string, city: string>>"
)


def _rows(spark, data):
    return spark.createDataFrame(
        [
            (k, Row(device=d, os=o, geo=Row(cc=cc, city=city)))
            for k, d, o, cc, city in data
        ],
        SCHEMA,
    ).coalesce(1)


def _mfx(spark, tmp_path):
    host, commit = CommitHost(spark), ManifestCommit()
    path = str(tmp_path / "t")
    commit.append_tables(
        host, path,
        {"": _rows(spark, [(1, "ios", "17", "de", "ber"),
                           (2, "android", "14", "us", "nyc")])},
    )
    return host, commit, path


def _by_k(df):
    return {r.k: r.asDict(recursive=True) for r in df.collect()}


class TestNestedRename:
    def test_metadata_only_and_pre_change_files_serve(
        self, spark, tmp_path
    ):
        host, commit, path = _mfx(spark, tmp_path)
        files = commit.member_files(host, path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        assert commit.member_files(host, path) == files  # zero IO
        got = _by_k(commit.read_table(host, path))
        assert got[1]["props"] == {
            "dev_kind": "ios", "os": "17",
            "geo": {"cc": "de", "city": "ber"},
        }

    def test_dotted_new_name_must_share_parent(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(
            host, path, "props.device", "props.dev_kind"
        )
        assert "dev_kind" in _by_k(commit.read_table(host, path))[1][
            "props"
        ]
        with pytest.raises(ValidationError, match="MOVE"):
            commit.rename_column(host, path, "props.os", "other.os")

    def test_deep_rename_two_levels(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.geo.cc", "country")
        got = _by_k(commit.read_table(host, path))
        assert got[2]["props"]["geo"] == {"country": "us", "city": "nyc"}

    def test_appends_after_rename_write_physical(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(dev_kind="web", os="x",
                         geo=Row(cc="fr", city="par")))],
                "k long, props struct<dev_kind: string, os: string, "
                "geo: struct<cc: string, city: string>>",
            ).coalesce(1)},
        )
        got = _by_k(commit.read_table(host, path))
        assert got[3]["props"]["dev_kind"] == "web"
        assert got[1]["props"]["dev_kind"] == "ios"
        # old and new files share ONE physical struct schema: a raw
        # physical read of any file shows the original leaf name
        import pyarrow.parquet as pq

        root, member = commit._resolve(host, path)
        base = commit._member_root(root, member)
        for f in commit.member_files(host, path):
            names = [
                fld.name
                for fld in pq.read_schema(f"{base}/{f}").field(
                    "props"
                ).type
            ]
            assert "device" in names and "dev_kind" not in names

    def test_null_struct_rows_stay_null(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(1, Row(device="ios", os="17", geo=None)), (2, None)],
                SCHEMA,
            ).coalesce(1)},
        )
        commit.rename_column(host, path, "props.device", "dev_kind")
        got = _by_k(commit.read_table(host, path))
        assert got[2]["props"] is None
        assert got[1]["props"]["geo"] is None

    def test_rename_validations(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        with pytest.raises(ValidationError, match="no field"):
            commit.rename_column(host, path, "props.nope", "x")
        with pytest.raises(ValidationError, match="already exists"):
            commit.rename_column(host, path, "props.device", "os")
        with pytest.raises(ValidationError, match="no column"):
            commit.rename_column(host, path, "nope.device", "x")
        with pytest.raises(ValidationError, match="not a plain struct"):
            commit.rename_column(host, path, "k.x", "y")

    def test_rename_back_round_trips(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        commit.rename_column(host, path, "props.dev_kind", "device")
        got = _by_k(commit.read_table(host, path))
        assert got[1]["props"]["device"] == "ios"

    def test_constrained_nested_field_refuses(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.add_constraint(
            host, path, "dev_set", "props.device IS NOT NULL"
        )
        with pytest.raises(ValidationError, match="constraint"):
            commit.rename_column(host, path, "props.device", "d2")
        with pytest.raises(ValidationError, match="constraint"):
            commit.drop_column(host, path, "props.device")


class TestNestedDrop:
    def test_drop_hides_field_everywhere(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        files = commit.member_files(host, path)
        commit.drop_column(host, path, "props.os")
        assert commit.member_files(host, path) == files
        got = _by_k(commit.read_table(host, path))
        assert "os" not in got[1]["props"]
        assert got[1]["props"]["device"] == "ios"

    def test_appends_after_drop_never_carry_it(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.drop_column(host, path, "props.os")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(device="web", geo=Row(cc="fr", city="par")))],
                "k long, props struct<device: string, "
                "geo: struct<cc: string, city: string>>",
            ).coalesce(1)},
        )
        got = _by_k(commit.read_table(host, path))
        assert got[3]["props"] == {
            "device": "web", "geo": {"cc": "fr", "city": "par"},
        }

    def test_reusing_dropped_nested_name_remints(self, spark, tmp_path):
        """r16 (VERDICT r15 #6): re-adding a dropped nested field
        name mints a fresh synthetic physical leaf (``{name}__r{n}``)
        — old bytes stay hidden forever, pre-re-add files read the
        new leaf as NULL, and skipping stays superset-safe (old files
        carry no stats for the minted leaf, so they are never
        pruned)."""
        host, commit, path = _mfx(spark, tmp_path)
        commit.drop_column(host, path, "props.os")
        commit.append_tables(
            host, path,
            {"": _rows(spark, [(4, "x", "NEW", "zz", "w")])},
        )
        got = _by_k(commit.read_table(host, path))
        assert got[4]["props"]["os"] == "NEW"  # re-added leaf serves
        assert got[1]["props"]["os"] is None  # old bytes stay hidden
        spec = commit.schema_meta(host, path)["nested"]["props"]
        assert spec["map"]["os"] == "os__r2"
        assert spec["phys_types"]["os__r2"] == "string"
        assert "os" in spec["drop"]
        # skipping superset-safe: the dotted predicate translates to
        # the MINTED leaf; pre-re-add files carry no stats for it and
        # are kept, the new file's stats can still serve it
        kept, total = commit.prune_files(
            host, path, {"props.os": ("ZZZ", "ZZZ")}
        )
        assert total == 2 and len(kept) >= 1
        # the connector's batch reader serves the same view (NULL
        # backfill Arrow-side)
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        cgot = {
            r.k: r.asDict(recursive=True)
            for r in read_table_batch(spark, path).collect()
        }
        assert cgot[4]["props"]["os"] == "NEW"
        assert cgot[1]["props"]["os"] is None

    def test_reusing_dropped_complex_nested_name_refuses(
        self, spark, tmp_path
    ):
        """A re-added nested leaf of NON-ATOMIC type has no remint
        (a complex type cannot be forced into scan schemas
        session-free) — refuse loudly toward rewrite."""
        host, commit, path = _mfx(spark, tmp_path)
        commit.drop_column(host, path, "props.geo")
        with pytest.raises(ValidationError, match="non-atomic"):
            commit.append_tables(
                host, path, {"": _rows(spark, [(5, "a", "b", "c", "d")])}
            )

    def test_new_field_colliding_with_physical_name_refuses(
        self, spark, tmp_path
    ):
        """A new nested field named like an existing field's PHYSICAL
        name would alias its bytes — same refusal as top-level."""
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        with pytest.raises(ValidationError, match="PHYSICAL"):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame(
                    [(9, Row(dev_kind="x", device="SNEAKY", os="1",
                             geo=Row(cc="a", city="b")))],
                    "k long, props struct<dev_kind: string, "
                    "device: string, os: string, "
                    "geo: struct<cc: string, city: string>>",
                ).coalesce(1)},
            )

    def test_last_field_refuses(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.drop_column(host, path, "props.geo.cc")
        with pytest.raises(ValidationError, match="only field"):
            commit.drop_column(host, path, "props.geo.city")

    def test_nested_widen_rejects_lossy_sources(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        with pytest.raises(ValidationError, match="widening"):
            commit.widen_column(host, path, "props.device", "long")


class TestNestedWiden:
    """r15: nested struct leaves widen by mapping (int->long,
    float->double) — reads cast, appends store wide, the physical scan
    forces the wide leaf type so mixed-width struct generations read
    under one schema."""

    WSCHEMA = "k long, props struct<score: int, name: string>"

    def _fx(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(1, Row(score=10, name="a")),
                 (2, Row(score=20, name="b"))],
                self.WSCHEMA,
            ).coalesce(1)},
        )
        return host, commit, path

    def test_widen_reads_wide_and_mixes_generations(
        self, spark, tmp_path
    ):
        import pyarrow.parquet as pq

        host, commit, path = self._fx(spark, tmp_path)
        files0 = set(commit.member_files(host, path))
        commit.widen_column(host, path, "props.score", "long")
        assert commit.member_files(host, path) == sorted(files0) or set(
            commit.member_files(host, path)
        ) == files0  # metadata-only
        df = commit.read_table(host, path)
        leaf_type = df.select(F.col("props.score")).dtypes[0][1]
        assert leaf_type == "bigint"
        # post-widen append stores WIDE physically
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(score=2**40, name="c"))],
                "k long, props struct<score: long, name: string>",
            ).coalesce(1)},
        )
        got = {r.k: r.props.score for r in commit.read_table(
            host, path
        ).collect()}
        assert got == {1: 10, 2: 20, 3: 2**40}
        # the two generations genuinely mix physical widths
        root, member = commit._resolve(host, path)
        base = commit._member_root(root, member)
        widths = set()
        for f in commit.member_files(host, path):
            t = pq.read_schema(f"{base}/{f}").field("props").type
            widths.add(str({fl.name: str(fl.type) for fl in t}["score"]))
        assert widths == {"int32", "int64"}

    def test_widen_survives_nested_rename(self, spark, tmp_path):
        """The widen spec keys by the PHYSICAL leaf — renaming the
        leaf keeps the cast."""
        host, commit, path = self._fx(spark, tmp_path)
        commit.widen_column(host, path, "props.score", "long")
        commit.rename_column(host, path, "props.score", "points")
        df = commit.read_table(host, path)
        assert df.select(F.col("props.points")).dtypes[0][1] == "bigint"
        # and widening THEN renaming the parent composes too
        commit.rename_column(host, path, "props", "attrs")
        df2 = commit.read_table(host, path)
        assert df2.select(F.col("attrs.points")).dtypes[0][1] == "bigint"

    def test_prune_across_mixed_widths(self, spark, tmp_path):
        host, commit, path = self._fx(spark, tmp_path)
        commit.widen_column(host, path, "props.score", "long")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(score=1_000_000, name="c"))],
                "k long, props struct<score: long, name: string>",
            ).coalesce(1)},
        )
        kept, total = commit.prune_files(
            host, path, {"props.score": (500_000, None)}
        )
        assert (len(kept), total) == (1, 2)

    def test_drop_sheds_widen(self, spark, tmp_path):
        host, commit, path = self._fx(spark, tmp_path)
        commit.widen_column(host, path, "props.score", "long")
        commit.drop_column(host, path, "props.score")
        meta = commit.schema_meta(host, path)
        assert not meta["nested"]["props"].get("widen")
        got = {r.k: r.props.asDict() for r in commit.read_table(
            host, path
        ).collect()}
        assert got[1] == {"name": "a"}

    def test_connector_reads_widened_nested(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = self._fx(spark, tmp_path)
        commit.widen_column(host, path, "props.score", "long")
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(score=2**40, name="c"))],
                "k long, props struct<score: long, name: string>",
            ).coalesce(1)},
        )
        via = {
            r.k: r.props.score
            for r in read_table_batch(spark, path).collect()
        }
        assert via == {1: 10, 2: 20, 3: 2**40}

    def test_merge_through_widened_nested(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.operators.merge import (
            merge_into,
        )

        host, commit, path = self._fx(spark, tmp_path)
        commit.widen_column(host, path, "props.score", "long")
        src = spark.createDataFrame(
            [(2, Row(score=2**41, name="B"))],
            "k long, props struct<score: long, name: string>",
        )
        merge_into(host, path, src, ["k"], commit=commit)
        got = {r.k: r.props.score for r in commit.read_table(
            host, path
        ).collect()}
        assert got[2] == 2**41 and got[1] == 10

    def test_directory_backend_widens_eagerly(self, spark, tmp_path):
        host, commit = CommitHost(spark), ParquetLeaseCommit()
        path = str(tmp_path / "t")
        spark.createDataFrame(
            [(1, Row(score=10, name="a"))], self.WSCHEMA
        ).write.parquet(path)
        commit.widen_column(host, path, "props.score", "long")
        df = commit.read_table(host, path, None)
        assert df.select(F.col("props.score")).dtypes[0][1] == "bigint"
        assert df.first().props.name == "a"


class TestNestedComposition:
    def test_composes_with_top_level_rename(self, spark, tmp_path):
        """Top-level rename + nested rename: the nested spec keys by
        the PHYSICAL parent path, so it survives the parent's logical
        rename."""
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        commit.rename_column(host, path, "props", "attrs")
        got = _by_k(commit.read_table(host, path))
        assert got[1]["attrs"]["dev_kind"] == "ios"
        commit.rename_column(host, path, "attrs.os", "osv")
        got = _by_k(commit.read_table(host, path))
        assert got[1]["attrs"]["osv"] == "17"

    def test_change_feed_serves_logical_view(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        v0 = commit.table_versions(host, path)[-1]
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(dev_kind="web", os="x",
                         geo=Row(cc="fr", city="par")))],
                "k long, props struct<dev_kind: string, os: string, "
                "geo: struct<cc: string, city: string>>",
            ).coalesce(1)},
        )
        delta = commit.read_changes(host, path, v0)
        rows = {r.k: r.asDict(recursive=True) for r in delta.collect()}
        assert rows == {
            3: {"k": 3, "props": {"dev_kind": "web", "os": "x",
                                  "geo": {"cc": "fr", "city": "par"}}},
        }

    def test_merge_reads_through_nested_mapping(self, spark, tmp_path):
        """A row-level rewrite planned over pre-change files must
        carry the nested mapping through: survivors re-land physical,
        the logical view is unchanged."""
        from redis_lsm_timeseries_spark.operators.merge import (
            delete_rows,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        delete_rows(
            host, path,
            spark.createDataFrame([(1,)], "k long"), ["k"],
            commit=commit,
        )
        got = _by_k(commit.read_table(host, path))
        assert set(got) == {2}
        assert got[2]["props"]["dev_kind"] == "android"

    def test_merge_cdf_serves_nested_logical_view(self, spark, tmp_path):
        """A merge's row-level change feed on a nested-mapped member:
        CDF files store PHYSICAL leaf names (the member's one storage
        convention); read_row_changes assembles the logical view."""
        from redis_lsm_timeseries_spark.operators.merge import (
            merge_into,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        v0 = commit.table_versions(host, path)[-1]
        src = spark.createDataFrame(
            [(1, Row(dev_kind="tv", os="9",
                     geo=Row(cc="de", city="ber")))],
            "k long, props struct<dev_kind: string, os: string, "
            "geo: struct<cc: string, city: string>>",
        )
        merge_into(host, path, src, ["k"], commit=commit)
        ch = commit.read_row_changes(host, path, v0)
        rows = {
            (r.k, r[commit.CDF_TYPE_COL]): r.asDict(recursive=True)
            for r in ch.collect()
        }
        assert rows[(1, "upsert")]["props"]["dev_kind"] == "tv"
        got = _by_k(commit.read_table(host, path))
        assert got[1]["props"]["dev_kind"] == "tv"

    def test_connector_batch_read_assembles_nested_view(
        self, spark, tmp_path
    ):
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        commit.drop_column(host, path, "props.os")
        native = _by_k(commit.read_table(host, path))
        via = {
            r.k: r.asDict(recursive=True)
            for r in read_table_batch(spark, path).collect()
        }
        assert via == native
        assert via[1]["props"] == {
            "dev_kind": "ios", "geo": {"cc": "de", "city": "ber"},
        }

    def test_connector_writer_translates_nested(self, spark, tmp_path):
        """r15 (late): the connector writer translates struct leaves
        logical -> physical in Arrow — a write to a nested-mapped
        member commits and both read paths serve it."""
        import pyarrow.parquet as pq

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
            register_manifest_source,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        register_manifest_source(spark)
        before = set(commit.member_files(host, path))
        (
            spark.createDataFrame(
                [(3, Row(dev_kind="web", os="x",
                         geo=Row(cc="fr", city="par")))],
                "k long, props struct<dev_kind: string, os: string, "
                "geo: struct<cc: string, city: string>>",
            )
            .coalesce(1)
            .write.format("rlts_table")
            .option("path", path)
            .mode("append")
            .save()
        )
        native = _by_k(commit.read_table(host, path))
        assert native[3]["props"]["dev_kind"] == "web"
        via = {
            r.k: r.asDict(recursive=True)
            for r in read_table_batch(spark, path).collect()
        }
        assert via == native
        # the new file stores the PHYSICAL leaf name
        (new_f,) = set(commit.member_files(host, path)) - before
        root, member = commit._resolve(host, path)
        base = commit._member_root(root, member)
        names = [
            f.name
            for f in pq.read_schema(f"{base}/{new_f}").field("props").type
        ]
        assert "device" in names and "dev_kind" not in names

    def test_connector_writer_remints_dropped_nested_reuse(
        self, spark, tmp_path
    ):
        """r16: the connector's planner runs driver-side, so a
        dropped-nested-name re-add REMINTS there (one metadata commit
        before any task) instead of refusing toward the engine API —
        old bytes stay hidden, pre-re-add rows read NULL."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            register_manifest_source,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.drop_column(host, path, "props.os")
        register_manifest_source(spark)
        (
            spark.createDataFrame(
                [(9, Row(device="d", os="fresh",
                         geo=Row(cc="a", city="b")))],
                "k long, props struct<device: string, os: string, "
                "geo: struct<cc: string, city: string>>",
            )
            .coalesce(1)
            .write.format("rlts_table")
            .option("path", path)
            .mode("append")
            .save()
        )
        got = _by_k(commit.read_table(host, path))
        assert got[9]["props"]["os"] == "fresh"
        assert got[1]["props"]["os"] is None  # old bytes stay hidden
        spec = commit.schema_meta(host, path)["nested"]["props"]
        assert spec["map"]["os"] == "os__r2"

    def test_connector_read_survives_zero_row_files(
        self, spark, tmp_path
    ):
        """A zero-row parquet split (empty-partition append) in a
        nested-mapped member must not break the Arrow struct rebuild."""
        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_batch,
        )

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        # a 2-partition write of 1 row leaves one EMPTY split
        commit.append_tables(
            host, path,
            {"": spark.createDataFrame(
                [(3, Row(dev_kind="web", os="x",
                         geo=Row(cc="fr", city="par")))],
                "k long, props struct<dev_kind: string, os: string, "
                "geo: struct<cc: string, city: string>>",
            ).repartition(2)},
        )
        via = {
            r.k: r.asDict(recursive=True)
            for r in read_table_batch(spark, path).collect()
        }
        assert set(via) == {1, 2, 3}
        assert via[3]["props"]["dev_kind"] == "web"

    def test_time_travel_sees_pre_change_view(self, spark, tmp_path):
        host, commit, path = _mfx(spark, tmp_path)
        v0 = commit.table_versions(host, path)[-1]
        commit.rename_column(host, path, "props.device", "dev_kind")
        old = _by_k(commit.read_table(host, path, None, version=v0))
        assert "device" in old[1]["props"]


class TestNestedSkipping:
    """r15: per-file stats extend to PLAIN-STRUCT leaf paths (footer
    min/max under the dotted physical path), so predicates on nested
    payload fields prune files at plan time — with the dotted logical
    -> physical translation riding the same nested mapping."""

    NSCHEMA = (
        "k long, props struct<score: long, device: string, "
        "tags: array<string>>"
    )

    def _fx(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        for i, (lo, hi) in enumerate([(0, 99), (100, 199), (200, 299)]):
            commit.append_tables(
                host, path,
                {"": spark.createDataFrame(
                    [
                        (i * 100 + j, Row(
                            score=lo + j, device=f"d{i}", tags=["x"]
                        ))
                        for j in range(0, 100, 10)
                    ],
                    self.NSCHEMA,
                ).coalesce(1)},
            )
        return host, commit, path

    def test_struct_leaf_stats_recorded_and_prune(self, spark, tmp_path):
        host, commit, path = self._fx(spark, tmp_path)
        # staged relpaths are uuid-token-prefixed — find the 0-band
        # file by its stats, never by name order
        blk = next(
            s
            for s in commit.member_file_stats(host, path).values()
            if s["cols"]["props.score"]["min"] == 0
        )
        assert blk["cols"]["props.score"]["max"] == 90
        assert blk["cols"]["props.device"]["min"] == "d0"
        # list-typed leaves are never statted (repeated context)
        assert not any(k.startswith("props.tags") for k in blk["cols"])
        kept, total = commit.prune_files(
            host, path, {"props.score": (120, 150)}
        )
        assert (len(kept), total) == (1, 3)
        kept2, _ = commit.prune_files(
            host, path, {"props.device": {"d2"}}
        )
        assert len(kept2) == 1

    def test_prune_translates_through_nested_rename(
        self, spark, tmp_path
    ):
        host, commit, path = self._fx(spark, tmp_path)
        commit.rename_column(host, path, "props.score", "points")
        kept, total = commit.prune_files(
            host, path, {"props.points": (120, 150)}
        )
        assert (len(kept), total) == (1, 3)
        # and through a top-level rename on top
        commit.rename_column(host, path, "props", "attrs")
        kept2, _ = commit.prune_files(
            host, path, {"attrs.points": (120, 150)}
        )
        assert len(kept2) == 1

    def test_fast_min_max_on_nested_leaf(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.maintenance import (
            fast_min_max,
            restat_live_extrema,
        )
        from redis_lsm_timeseries_spark.operators.merge import (
            delete_rows,
        )

        host, commit, path = self._fx(spark, tmp_path)
        assert fast_min_max(
            host, path, "props.score", commit=commit
        ) == (0, 290)
        # an edge DV delete blocks the proof; the live restat (which
        # now stats nested leaves too) restores it
        delete_rows(
            host, path,
            spark.createDataFrame([(290,)], "k long"), ["k"],
            commit=commit, mode="dv",
        )
        assert fast_min_max(
            host, path, "props.score", commit=commit
        ) is None
        assert restat_live_extrema(host, path, commit=commit) == 1
        assert fast_min_max(
            host, path, "props.score", commit=commit
        ) == (0, 280)

    def test_unstatted_nested_predicate_never_prunes(
        self, spark, tmp_path
    ):
        """Superset safety: a predicate on a list-typed (unstatted)
        leaf keeps every file."""
        host, commit, path = self._fx(spark, tmp_path)
        kept, total = commit.prune_files(
            host, path, {"props.tags": ("a", "b")}
        )
        assert (len(kept), total) == (3, 3)

    def test_nested_pruning_survives_the_rebuild(self, spark, tmp_path):
        """Plan gate: the logical-view struct rebuild must not defeat
        Catalyst's nested schema pruning — projecting one renamed leaf
        reads ONLY that leaf's physical column from parquet (at 100 TB
        the difference between scanning a leaf and the whole payload
        struct)."""
        import re

        host, commit, path = _mfx(spark, tmp_path)
        commit.rename_column(host, path, "props.device", "dev_kind")

        def read_schema(df):
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")
            )
            return re.search(r"ReadSchema: (.*)", plan).group(1)

        only_k = read_schema(commit.read_table(host, path).select("k"))
        assert only_k == "struct<k:bigint>"
        leaf = read_schema(
            commit.read_table(host, path).select(F.col("props.dev_kind"))
        )
        assert leaf == "struct<props:struct<device:string>>"

    def test_fast_count_dotted_predicate(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.maintenance import fast_count

        host, commit, path = self._fx(spark, tmp_path)
        # a whole file provably matches (min==max impossible here per
        # row, but the band (100,199) covers file 1 entirely)
        assert fast_count(
            host, path, {"props.score": (100, 199)}, commit=commit
        ) == 10
        commit.rename_column(host, path, "props.score", "points")
        assert fast_count(
            host, path, {"props.points": (100, 199)}, commit=commit
        ) == 10

    def test_connector_stream_serves_nested_view(self, spark, tmp_path):
        """The rlts_table STREAM source assembles the nested logical
        view too (same Arrow partition reader as batch)."""
        import time as _time

        from redis_lsm_timeseries_spark.sources.manifest_stream import (
            read_table_stream,
        )

        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.append_tables(
            host, path,
            {"": _rows(spark, [(1, "ios", "17", "de", "ber")])},
        )
        commit.rename_column(host, path, "props.device", "dev_kind")
        commit.drop_column(host, path, "props.os")
        df = read_table_stream(
            spark, path,
            schema=(
                "k long, props struct<dev_kind: string, "
                "geo: struct<cc: string, city: string>>"
            ),
            startingversion="earliest",
        )
        q = (
            df.writeStream.format("memory")
            .queryName("nstream1")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            t0 = _time.time()
            while _time.time() - t0 < 120:
                if q.exception() is not None:
                    raise AssertionError(q.exception())
                if spark.sql(
                    "SELECT count(*) c FROM nstream1"
                ).first().c >= 1:
                    break
                _time.sleep(0.3)
            got = {
                r.k: r.asDict(recursive=True)
                for r in spark.sql("SELECT * FROM nstream1").collect()
            }
            assert got[1]["props"] == {
                "dev_kind": "ios",
                "geo": {"cc": "de", "city": "ber"},
            }
        finally:
            q.stop()


class TestDirectoryBackend:
    def test_eager_nested_rename_and_drop(self, spark, tmp_path):
        host, commit = CommitHost(spark), ParquetLeaseCommit()
        path = str(tmp_path / "t")
        _rows(spark, [(1, "ios", "17", "de", "ber")]).write.parquet(path)
        commit.rename_column(host, path, "props.device", "dev_kind")
        got = _by_k(commit.read_table(host, path, None))
        assert got[1]["props"]["dev_kind"] == "ios"
        commit.drop_column(host, path, "props.os")
        got = _by_k(commit.read_table(host, path, None))
        assert "os" not in got[1]["props"]
        assert got[1]["props"]["geo"]["cc"] == "de"
