"""Salting for bucket-local self-joins (operators/skew.py): the salted
join must produce bit-identical pair sets while splitting a planted hot
bucket's pair enumeration across tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.dedup import lsh_candidate_pairs
from redis_lsm_timeseries_spark.operators.similarity import banded_pair_scores


def _skewed_bands(spark, n=300, hot_frac=0.8):
    """n ids in one band; hot_frac of them share ONE bucket key (the
    boilerplate-document profile), the rest get distinct keys."""
    n_hot = int(n * hot_frac)
    rows = [
        (i, 0, "hot" if i < n_hot else f"cold-{i}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, band_idx int, band_key string")


class TestSaltedCandidatePairs:
    def test_salted_equals_unsalted_on_planted_skew(self, spark):
        bands = _skewed_bands(spark)
        plain = {
            (r.a, r.b) for r in lsh_candidate_pairs(bands).collect()
        }
        salted = {
            (r.a, r.b)
            for r in lsh_candidate_pairs(bands, num_salts=4).collect()
        }
        n_hot = 240
        assert len(plain) == n_hot * (n_hot - 1) // 2
        assert salted == plain

    def test_salt_column_not_in_output(self, spark):
        bands = _skewed_bands(spark, n=50)
        out = lsh_candidate_pairs(bands, num_salts=3)
        assert out.columns == ["a", "b"]

    def test_salted_join_splits_the_hot_bucket(self, spark):
        """The physical join key must include the salt, so the hot
        bucket hashes into num_salts distinct shuffle keys."""
        bands = _skewed_bands(spark, n=50)
        plan = lsh_candidate_pairs(bands, num_salts=4)._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan


class TestSaltedBandedScores:
    def test_embedding_pairs_identical_under_salting(self, spark):
        # 60 vectors in one shared band bucket (planted hot bucket) +
        # 20 in singleton buckets; dim-4 normalized vectors.
        rows = []
        for i in range(80):
            v = [1.0, 0.0, 0.0, 0.0] if i < 60 else [0.0, 1.0, 0.0, 0.0]
            bucket = 7 if i < 60 else 100 + i
            rows.append((i, v, 0, bucket))
        banded = spark.createDataFrame(
            rows, "vec_id long, nv array<double>, band_idx int, band_bucket long"
        )
        plain = {
            (r.a, r.b, r.cosine_sim)
            for r in banded_pair_scores(banded).collect()
        }
        salted = {
            (r.a, r.b, r.cosine_sim)
            for r in banded_pair_scores(banded, num_salts=5).collect()
        }
        assert len(plain) == 60 * 59 // 2 + 0  # singleton buckets join nothing
        assert salted == plain


class TestOccupancyGatedSalting:
    """banded_pair_scores(auto_salt_occupancy=...): salting engages
    itself from a measured occupancy probe — no caller tuning — and
    only when some bucket is actually hot."""

    def _hot_banded(self, spark, n=100, hot_frac=0.3):
        """~hot_frac of vectors share ONE band bucket (boilerplate
        profile); the rest land in singleton buckets."""
        n_hot = int(n * hot_frac)
        rows = []
        for i in range(n):
            bucket = 7 if i < n_hot else 1000 + i
            rows.append((i, [1.0, 0.0, 0.0, 0.0], 0, bucket))
        return spark.createDataFrame(
            rows, "vec_id long, nv array<double>, band_idx int, band_bucket long"
        )

    def test_auto_salting_engages_and_preserves_results(self, spark):
        banded = self._hot_banded(spark)
        plain = {
            (r.a, r.b) for r in banded_pair_scores(banded).collect()
        }
        auto = banded_pair_scores(banded, auto_salt_occupancy=10)
        plan = auto._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # probe saw the 30-row bucket, salted
        assert {(r.a, r.b) for r in auto.collect()} == plain

    def test_auto_salting_stays_off_below_threshold(self, spark):
        banded = self._hot_banded(spark, n=20, hot_frac=0.3)
        out = banded_pair_scores(banded, auto_salt_occupancy=50)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" not in plan  # no bucket exceeds the threshold

    def test_salting_bounds_per_task_pair_work(self, spark):
        """The point of salting: no single join key owns the hot
        bucket's full quadratic pair enumeration. Max per-key work
        (|left| x |right| per physical join key) must drop by ~S."""
        from redis_lsm_timeseries_spark.operators.skew import (
            salted_pair_sides,
        )

        banded = self._hot_banded(spark, n=100, hot_frac=0.3)
        left = banded.select(
            F.col("vec_id").alias("a"), "band_idx", "band_bucket"
        )
        right = banded.select(
            F.col("vec_id").alias("b"), "band_idx", "band_bucket"
        )
        num_salts = 5
        l, r, keys = salted_pair_sides(
            left, right, ["band_idx", "band_bucket"], left_id_col="a",
            num_salts=num_salts,
        )
        lc = l.groupBy(*keys).count().withColumnRenamed("count", "nl")
        rc = r.groupBy(*keys).count().withColumnRenamed("count", "nr")
        work = {
            tuple(row[k] for k in keys): row.nl * row.nr
            for row in lc.join(rc, keys).collect()
        }
        hot = 30
        unsalted_work = hot * hot
        # xxhash64 spreads 30 left ids over 5 salts imperfectly; allow
        # 2x the perfect split but require a real reduction.
        assert max(work.values()) <= 2 * (hot // num_salts) * hot
        assert max(work.values()) < unsalted_work
        # Every hot-bucket pair is still enumerated exactly once (the
        # singleton cold buckets contribute 1x1 keys of their own).
        hot_work = sum(
            w for k, w in work.items() if k[1] == 7
        )
        assert hot_work == hot * hot
