"""Z-order clustering (``operators/zorder.py``): the Morton key
matches a pure-Python bit-interleave reference, and a Z-ordered
rewrite makes manifest stats prune on BOTH dimensions — where 1-D
range clustering prunes on only one."""

from __future__ import annotations

import pytest

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.zorder import (
    column_bounds,
    zorder_key,
    zorder_rewrite,
)

SCHEMA = "x long, y long, payload string"


def _grid(spark, n=32):
    rows = [
        (i, j, f"p{i}-{j}") for i in range(n) for j in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _py_morton(vals, bounds, bits, cols):
    top = (1 << bits) - 1
    key = 0
    n = len(cols)
    for j, c in enumerate(cols):
        lo, hi = float(bounds[c][0]), float(bounds[c][1])
        span = hi - lo
        v = vals[c]
        if span <= 0 or v is None:
            rank = 0
        else:
            rank = min(top, max(0, int((float(v) - lo) / span * top)))
        for i in range(bits):
            key |= ((rank >> i) & 1) << (i * n + j)
    return key


class TestKey:
    def test_matches_python_reference(self, spark):
        df = _grid(spark, n=16)
        b = {"x": (0, 15), "y": (0, 15)}
        got = {
            (r.x, r.y): r.z
            for r in df.select(
                "x", "y", zorder_key(["x", "y"], b, bits=8).alias("z")
            ).collect()
        }
        for (x, y), z in got.items():
            assert z == _py_morton(
                {"x": x, "y": y}, b, 8, ["x", "y"]
            ), (x, y)

    def test_nulls_and_out_of_bounds_clamp(self, spark):
        df = spark.createDataFrame(
            [(None, 5, "a"), (999, 5, "b"), (-999, 5, "c")], SCHEMA
        )
        b = {"x": (0, 10), "y": (0, 10)}
        rows = df.select(
            "payload", zorder_key(["x", "y"], b, bits=4).alias("z")
        ).collect()
        z = {r.payload: r.z for r in rows}
        assert z["a"] == z["c"]  # NULL ranks 0, like the clamped min
        assert all(0 <= v < 1 << 8 for v in z.values())

    def test_single_column_rejected(self, spark):
        with pytest.raises(ValidationError, match=">= 2"):
            zorder_key(["x"], {"x": (0, 1)})

    def test_too_many_bits_rejected(self, spark):
        with pytest.raises(ValidationError, match="bits"):
            zorder_key(
                ["a", "b", "c", "d"],
                {c: (0, 1) for c in "abcd"},
                bits=16,
            )

    def test_column_bounds_single_agg(self, spark):
        df = _grid(spark, n=4)
        assert column_bounds(df, ["x", "y"]) == {
            "x": (0, 3), "y": (0, 3),
        }


class TestRewrite:
    def test_prunes_on_both_dimensions(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        df = _grid(spark)  # 32x32
        # seed range-clustered on x ONLY: y stats are full-span
        seeded = df.repartitionByRange(16, "x").sortWithinPartitions("x")
        commit.rewrite_files(
            host, path, [],
            lambda tmp: seeded.write.mode("overwrite").parquet(tmp),
        )
        kept_x, total = commit.prune_files(host, path, {"x": (0, 3)})
        kept_y, _ = commit.prune_files(host, path, {"y": (0, 3)})
        assert len(kept_x) < total      # x prunes...
        assert len(kept_y) == total     # ...y cannot

        zorder_rewrite(host, path, ["x", "y"], target_files=16)
        kept_x2, total2 = commit.prune_files(host, path, {"x": (0, 3)})
        kept_y2, _ = commit.prune_files(host, path, {"y": (0, 3)})
        assert total2 == 16
        assert len(kept_x2) < total2
        assert len(kept_y2) < total2    # now BOTH dimensions prune
        # content unchanged
        got = {
            (r.x, r.y, r.payload)
            for r in commit.read_table(host, path, SCHEMA).collect()
        }
        assert got == {
            (i, j, f"p{i}-{j}") for i in range(32) for j in range(32)
        }
        # and a pruned 2-D read returns the right slice
        corner = commit.read_table_pruned(
            host, path, SCHEMA,
            predicates={"x": (0, 3), "y": (0, 3)},
        ).where("x <= 3 AND y <= 3")
        assert corner.count() == 16

    def test_missing_column_raises(self, spark, tmp_path):
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.rewrite_files(
            host, path, [],
            lambda tmp: _grid(spark, 4).write.parquet(tmp),
        )
        with pytest.raises(ValidationError, match="no column"):
            zorder_rewrite(host, path, ["x", "nope"], target_files=2)


class TestIncrementalCompact:
    """zorder_compact: cluster only the unclustered tail, cursor =
    stage tokens committed atomically with the pass."""

    def _fx(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.operators.zorder import (
            zorder_compact,
        )

        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        commit.rewrite_files(
            host, path, [],
            lambda tmp: _grid(spark, 16)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(tmp),
        )
        return host, commit, path, zorder_compact

    def test_first_pass_clusters_everything(self, spark, tmp_path):
        host, commit, path, compact = self._fx(spark, tmp_path)
        n = compact(host, path, ["x", "y"], commit=commit)
        assert n == 4
        # second pass: nothing pending
        assert compact(host, path, ["x", "y"], commit=commit) == 0

    def test_incremental_pass_leaves_clustered_files_alone(
        self, spark, tmp_path
    ):
        host, commit, path, compact = self._fx(spark, tmp_path)
        compact(host, path, ["x", "y"], commit=commit)
        clustered = set(commit.member_files(host, path))
        # new ingest lands unclustered
        extra = spark.createDataFrame(
            [(100 + i, 100 + i, f"n{i}") for i in range(8)], SCHEMA
        ).repartition(2)
        commit.rewrite_files(
            host, path, [],
            lambda tmp: extra.write.mode("overwrite").parquet(tmp),
        )
        n = compact(host, path, ["x", "y"], commit=commit)
        assert n == 2  # only the tail
        after = set(commit.member_files(host, path))
        assert clustered <= after  # first pass's files untouched
        # content intact
        got = commit.read_table(host, path, SCHEMA).count()
        assert got == 16 * 16 + 8

    def test_min_files_threshold(self, spark, tmp_path):
        host, commit, path, compact = self._fx(spark, tmp_path)
        compact(host, path, ["x", "y"], commit=commit)
        extra = spark.createDataFrame([(1, 1, "one")], SCHEMA)
        commit.rewrite_files(
            host, path, [],
            lambda tmp: extra.coalesce(1).write.parquet(tmp),
        )
        assert (
            compact(host, path, ["x", "y"], min_files=2, commit=commit)
            == 0
        )

    def test_concurrent_append_during_pass_stays_pending(
        self, spark, tmp_path
    ):
        """An append racing into the pass's own commit must NOT be
        marked clustered — it is next pass's tail (the token cursor's
        reason to exist)."""
        host, commit, path, compact = self._fx(spark, tmp_path)
        real_stage = ManifestCommit._stage_in
        raced = {"done": False}

        def racing_stage(self_, store, root, member, write_fn):
            files = real_stage(self_, store, root, member, write_fn)
            if not raced["done"]:
                raced["done"] = True
                ManifestCommit().append_rows(
                    store, [(500, 500, "racer")],
                    SCHEMA, path,
                )
            return files

        ManifestCommit._stage_in = racing_stage
        try:
            compact(host, path, ["x", "y"], commit=commit)
        finally:
            ManifestCommit._stage_in = real_stage
        # the racer's file is pending, min_files=1 picks it up
        n = compact(host, path, ["x", "y"], min_files=1, commit=commit)
        assert n == 1
        got = commit.read_table(host, path, SCHEMA).count()
        assert got == 16 * 16 + 1

    def test_cursor_prunes_dead_tokens(self, spark, tmp_path):
        from redis_lsm_timeseries_spark.operators.zorder import (
            ZORDER_TOKENS,
        )

        host, commit, path, compact = self._fx(spark, tmp_path)
        compact(host, path, ["x", "y"], commit=commit)
        t1 = set(commit.read_app_meta(host, path)[ZORDER_TOKENS])
        # a full snapshot rewrite replaces every clustered file
        snap = commit.read_table(host, path, SCHEMA)
        rows = [(r.x, r.y, r.payload) for r in snap.collect()]
        commit.snapshot_rewrite(
            host, path,
            lambda tmp: spark.createDataFrame(rows, SCHEMA)
            .repartition(3)
            .write.mode("overwrite")
            .parquet(tmp),
        )
        n = compact(host, path, ["x", "y"], commit=commit)
        assert n == 3  # everything re-clusters
        t2 = set(commit.read_app_meta(host, path)[ZORDER_TOKENS])
        assert t1.isdisjoint(t2)  # dead tokens pruned, not hoarded


class TestStringZorder:
    """r12: string columns rank by sampled range boundaries — the
    (tag, time) predicate pair this engine's own tables live on."""

    def test_string_rank_matches_bisect_reference(self, spark):
        from bisect import bisect_right

        from pyspark.sql import functions as F

        tags = [f"host-{i:02d}" for i in range(40)]
        rows = [(t, i) for i, t in enumerate(tags)] + [(None, 99)]
        df = spark.createDataFrame(rows, "tag string, v long")
        boundaries = [f"host-{i:02d}" for i in range(0, 40, 5)]
        b = {"tag": {"boundaries": boundaries}, "v": (0, 99)}
        got = {
            r.tag: r.z
            for r in df.select(
                "tag",
                zorder_key(["tag", "v"], b, bits=8).alias("z"),
            ).collect()
        }
        top = (1 << 8) - 1
        for t in tags:
            cnt = bisect_right(boundaries, t)
            want_rank = min(top, int(cnt / len(boundaries) * top))
            # extract column 0's rank back out of the interleave
            z = got[t]
            rank = 0
            for i in range(8):
                rank |= ((z >> (i * 2)) & 1) << i
            assert rank == want_rank, t
        # NULL ranks 0
        z_null = got[None]
        assert all(((z_null >> (i * 2)) & 1) == 0 for i in range(8))

    def test_string_dim_prunes_after_rewrite(self, spark, tmp_path):
        """The 2-D prune demo with a STRING first dimension: after the
        Z-order rewrite a tag-equality predicate skips files — before
        it (insertion-ordered by time), every file spans all tags and
        nothing prunes."""
        host, commit = CommitHost(spark), ManifestCommit()
        path = str(tmp_path / "t")
        rows = [
            (f"host-{i % 16:02d}", t, float(i))
            for t in range(64)
            for i in range(16)
        ]
        df = spark.createDataFrame(
            rows, "tag string, ts long, value double"
        ).repartitionByRange(8, "ts")  # time-clustered, tag-spread
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )
        kept0, total0 = commit.prune_files(
            host, path, {"tag": {"host-03"}}
        )
        assert len(kept0) == total0  # nothing prunes pre-rewrite
        zorder_rewrite(host, path, ["tag", "ts"], target_files=8,
                       commit=commit)
        kept, total = commit.prune_files(host, path, {"tag": {"host-03"}})
        assert total == 8 and len(kept) < total
        # both dims together prune harder than either alone
        kept2, _ = commit.prune_files(
            host, path, {"tag": {"host-03"}, "ts": (0, 7)}
        )
        assert len(kept2) <= len(kept)
        # correctness: pruned read == filtered full read
        sch = "tag string, ts long, value double"
        want = sorted(
            (r.tag, r.ts)
            for r in commit.read_table(host, path, sch)
            .where("tag = 'host-03'").collect()
        )
        got = sorted(
            (r.tag, r.ts)
            for r in commit.read_table_pruned(
                host, path, sch, predicates={"tag": {"host-03"}}
            ).where("tag = 'host-03'").collect()
        )
        assert got == want and len(want) == 64

    def test_column_bounds_mixes_kinds(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 9)], "tag string, v long"
        )
        b = column_bounds(df, ["tag", "v"])
        assert b["v"] == (1, 9)
        assert b["tag"] == {"boundaries": ["a", "b"]}

    def test_boundary_thinning_caps_literals(self, spark):
        from redis_lsm_timeseries_spark.operators.zorder import (
            MAX_STRING_BOUNDARIES,
            string_boundaries,
        )

        df = spark.createDataFrame(
            [(f"k{i:05d}",) for i in range(1000)], "tag string"
        )
        bl = string_boundaries(df, "tag")
        assert len(bl) <= MAX_STRING_BOUNDARIES
        assert bl == sorted(bl)
