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
