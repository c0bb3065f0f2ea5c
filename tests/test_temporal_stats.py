"""Type-tagged temporal/decimal stats + batched footer reads
(round 12).

The r11 stats layer dropped timestamps and decimals ("no safe total
order across the JSON round-trip"), so a predicate on a raw
TimestampType column never pruned — the headline skipping feature was
silently absent for the most natural time-series column type a user
table would have. Stats now record timestamps as
``{"ts": epoch_micros}`` and dates as ``{"d": ordinal}`` (type-tagged,
so cross-kind comparisons stay 'cannot prove'); decimals widen to the
enclosing float bound. Footer reads of a commit's staged files run in
a small thread pool (the r11 lifecycle-bench stall).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.maintenance import fast_count


def _fx(spark, tmp_path, name="t"):
    return CommitHost(spark), ManifestCommit(), str(tmp_path / name)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _write_banded(spark, host, commit, path, schema, bands):
    """One commit per band -> one file per band with tight stats."""
    for rows in bands:
        df = spark.createDataFrame(rows, schema).coalesce(1)
        commit.rewrite_files(
            host, path, [],
            lambda tmp, d=df: d.write.mode("overwrite").parquet(tmp),
        )


class TestTimestampStats:
    def test_timestamp_predicates_prune_files(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        schema = "k long, ev timestamp_ntz"
        _write_banded(
            spark, host, commit, path, schema,
            [
                [(1, _ts("2020-01-01T00:00:00")),
                 (2, _ts("2020-01-31T23:59:59"))],
                [(3, _ts("2020-06-01T00:00:00")),
                 (4, _ts("2020-06-30T00:00:00"))],
            ],
        )
        stats = commit.member_file_stats(host, path)
        assert len(stats) == 2
        for s in stats.values():
            assert set(s["cols"]["ev"]["min"]) == {"ts"}  # tagged
        kept, total = commit.prune_files(
            host, path,
            {"ev": (_ts("2020-05-01T00:00:00"), None)},
        )
        assert total == 2 and len(kept) == 1
        # membership set of datetimes prunes too
        kept, _ = commit.prune_files(
            host, path, {"ev": {_ts("2020-01-15T12:00:00")}}
        )
        assert len(kept) == 1
        # pruned read equals filtered full read
        pred = F.col("ev") >= F.lit(_ts("2020-05-01T00:00:00"))
        full = {
            r.k for r in commit.read_table(host, path, schema)
            .where(pred).collect()
        }
        pruned = {
            r.k for r in commit.read_table_pruned(
                host, path, schema,
                predicates={"ev": (_ts("2020-05-01T00:00:00"), None)},
            ).where(pred).collect()
        }
        assert pruned == full == {3, 4}

    def test_fast_count_on_timestamp_range(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        schema = "k long, ev timestamp_ntz"
        _write_banded(
            spark, host, commit, path, schema,
            [
                [(1, _ts("2020-01-01T00:00:00")),
                 (2, _ts("2020-01-02T00:00:00"))],
                [(3, _ts("2021-01-01T00:00:00"))],
            ],
        )
        # whole second file inside the bound, first fully outside
        got = fast_count(
            host, path,
            {"ev": (_ts("2020-12-01T00:00:00"),
                    _ts("2021-12-31T00:00:00"))},
            commit=commit,
        )
        # min==max for the single-row file -> exact 1; other file
        # proves zero overlap
        assert got == 1

    def test_cross_kind_comparison_never_prunes(self, spark, tmp_path):
        """A numeric predicate against a timestamp stat (or vice
        versa) is 'cannot prove' — the file survives."""
        host, commit, path = _fx(spark, tmp_path)
        schema = "k long, ev timestamp_ntz"
        _write_banded(
            spark, host, commit, path, schema,
            [[(1, _ts("2020-01-01T00:00:00"))]],
        )
        kept, total = commit.prune_files(host, path, {"ev": (0, 10)})
        assert len(kept) == total == 1
        kept, _ = commit.prune_files(host, path, {"ev": {42}})
        assert len(kept) == 1

    def test_date_stats_tagged_and_pruning(self, spark, tmp_path):
        host, commit, path = _fx(spark, tmp_path)
        schema = "k long, d date"
        _write_banded(
            spark, host, commit, path, schema,
            [
                [(1, datetime.date(2020, 1, 1))],
                [(2, datetime.date(2021, 1, 1))],
            ],
        )
        kept, total = commit.prune_files(
            host, path,
            {"d": (datetime.date(2020, 12, 1), None)},
        )
        assert total == 2 and len(kept) == 1

    def test_ingest_style_timestamp_partition_pruning(
        self, spark, tmp_path
    ):
        """The engine's own canonical shape: an event-time column with
        appends arriving in time order — a trailing-window read plans
        over only the newest files."""
        host, commit, path = _fx(spark, tmp_path)
        schema = "tag string, ev timestamp_ntz, value double"
        base = datetime.datetime(2024, 1, 1)
        bands = []
        for day in range(10):
            bands.append([
                ("t1", base + datetime.timedelta(days=day, hours=h),
                 float(h))
                for h in range(4)
            ])
        _write_banded(spark, host, commit, path, schema, bands)
        lo = base + datetime.timedelta(days=8)
        kept, total = commit.prune_files(host, path, {"ev": (lo, None)})
        assert total == 10 and len(kept) == 2


class TestDecimalStats:
    def test_decimal_column_is_safe_and_other_columns_survive(
        self, spark, tmp_path
    ):
        """Spark writes decimal(18,2) as fixed-len-byte-array, whose
        footer statistics pyarrow cannot decode (the accessor RAISES).
        Contract: the failure voids only the decimal column's stats —
        sibling columns still record and prune — and the decimal
        column itself is never wrongly pruned. If a future pyarrow
        decodes them, the widened-float encoding takes over and
        pruning on the decimal becomes active (also superset-safe)."""
        host, commit, path = _fx(spark, tmp_path)
        schema = "k long, amt decimal(18,2)"
        _write_banded(
            spark, host, commit, path, schema,
            [
                [(1, Decimal("10.25")), (2, Decimal("19.99"))],
                [(3, Decimal("100.00")), (4, Decimal("250.50"))],
            ],
        )
        stats = commit.member_file_stats(host, path)
        assert len(stats) == 2
        for s in stats.values():
            assert s is not None
            # the long column's stats survived the decimal failure
            assert "k" in s["cols"]
            cs = s["cols"].get("amt")
            if cs is not None:  # decodable on this pyarrow version
                assert isinstance(cs["min"], float)
                assert cs["min"] <= cs["max"]
        # the long column prunes
        kept, total = commit.prune_files(host, path, {"k": (3, None)})
        assert total == 2 and len(kept) == 1
        # a decimal predicate is correct either way: exact when stats
        # decoded, never-prune when not — compare to the real filter
        pred = {"amt": (Decimal("50"), None)}
        want = {
            r.k for r in commit.read_table(host, path, schema)
            .where(F.col("amt") >= 50).collect()
        }
        got = {
            r.k for r in commit.read_table_pruned(
                host, path, schema, predicates=pred
            ).where(F.col("amt") >= 50).collect()
        }
        assert got == want == {3, 4}

    def test_stat_value_widens_decimals_conservatively(self):
        sv = ManifestCommit._stat_value
        # representable exactly: unchanged
        assert sv(Decimal("0.5"), 64, side="min") == 0.5
        # 0.1 rounds UP to float; as a MIN bound it must round DOWN
        lo = sv(Decimal("0.1"), 64, side="min")
        hi = sv(Decimal("0.1"), 64, side="max")
        assert lo <= Decimal("0.1") <= hi


class TestBatchedFooterReads:
    def test_many_file_commit_records_every_files_stats(
        self, spark, tmp_path
    ):
        """The thread-pooled path produces the same stats map as the
        serial path — keyed per file, none dropped or misattributed."""
        host, commit, path = _fx(spark, tmp_path)
        df = (
            spark.range(0, 1600)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 100).alias("v"),
            )
            .repartitionByRange(16, "k")
            .sortWithinPartitions("k")
        )
        commit.rewrite_files(
            host, path, [],
            lambda tmp: df.write.mode("overwrite").parquet(tmp),
        )
        stats = commit.member_file_stats(host, path)
        assert len(stats) == 16
        lo_hi = []
        for s in stats.values():
            assert s is not None and s["rows"] == 100
            cs = s["cols"]["k"]
            lo_hi.append((cs["min"], cs["max"]))
        lo_hi.sort()
        # contiguous non-overlapping key bands: stats kept per-file
        # identity through the parallel reads
        assert lo_hi[0][0] == 0 and lo_hi[-1][1] == 1599
        for (a_lo, a_hi), (b_lo, b_hi) in zip(lo_hi, lo_hi[1:]):
            assert a_hi < b_lo
