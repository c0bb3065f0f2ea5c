"""IVF ANN (operators/similarity.py): training determinism, the
map-only assignment plan, full-probe equivalence to brute force, and
partial-probe recall."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.similarity import (
    _assign_expr,
    _unit_rows,
    cosine_topk,
    ivf_topk,
    train_ivf_centroids,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
N_LIST = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return train_ivf_centroids(emb, n_list=N_LIST, iters=2)


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


class TestIVF:
    def test_training_is_deterministic(self, emb, centroids):
        again = train_ivf_centroids(emb, n_list=N_LIST, iters=2)
        assert again == centroids
        assert len(centroids) == N_LIST
        for c in centroids:
            assert len(c) == 64
            # spherical k-means: unit-norm centroids
            assert abs(sum(x * x for x in c) - 1.0) < 1e-9

    def test_assignment_is_map_only(self, emb, centroids):
        assigned = _unit_rows(emb, "vec_id", "embedding").select(
            "_id", _assign_expr("_nv", centroids).alias("list_id")
        )
        plan = assigned._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n_lists_used = assigned.select("list_id").distinct().count()
        assert n_lists_used > 1  # the quantizer actually partitions

    def test_full_probe_equals_brute_force(self, spark, emb, centroids):
        queries = emb.where(F.col("vec_id") < 5)
        exact = _topk_sets(cosine_topk(emb, queries, k=10).collect())
        full = _topk_sets(
            ivf_topk(emb, queries, centroids, k=10, n_probe=N_LIST).collect()
        )
        assert full == exact  # probing every list IS brute force

    def test_zero_norm_embedding_cannot_poison_training(self, spark, emb):
        """An all-zero embedding (broken encoder output) must be
        dropped by normalization, not divided into NaNs: one NaN vector
        in a list would make the whole IVF centroid NaN and silently
        zero that list's recall."""
        dim = len(emb.select("embedding").first().embedding)
        zero = spark.range(10_000_000, 10_000_001).select(
            F.col("id").alias("vec_id"),
            F.expr(f"array_repeat(CAST(0.0 AS FLOAT), {dim})").alias(
                "embedding"
            ),
        )
        poisoned = emb.limit(50).select("vec_id", "embedding").unionByName(
            zero
        )
        cents = train_ivf_centroids(poisoned, n_list=4, iters=2)
        for c in cents:
            assert all(x == x for x in c), "NaN leaked into a centroid"
        unit = _unit_rows(poisoned, "vec_id", "embedding")
        assert unit.where(F.col("_id") == 10_000_000).count() == 0
        queries = emb.where(F.col("vec_id") < 3)
        got = ivf_topk(poisoned, queries, cents, k=5, n_probe=4).collect()
        assert all(
            r.cosine_sim == r.cosine_sim for r in got
        ), "NaN similarity emitted"
        assert all(r.neighbor_id != 10_000_000 for r in got)
        # The exact baseline takes the same posture, so full-probe IVF
        # and brute force stay comparable on a poisoned corpus — and no
        # NaN (which Spark ranks above every real number) tops any list.
        exact = cosine_topk(poisoned, queries, k=5).collect()
        assert all(r.cosine_sim == r.cosine_sim for r in exact)
        assert all(r.neighbor_id != 10_000_000 for r in exact)

    def test_partial_probe_recall(self, spark, emb, centroids):
        queries = emb.where(F.col("vec_id") < 20)
        exact = _topk_sets(cosine_topk(emb, queries, k=10).collect())
        approx = _topk_sets(
            ivf_topk(emb, queries, centroids, k=10, n_probe=3).collect()
        )
        hits = sum(
            len(exact[q] & approx.get(q, set())) for q in exact
        )
        total = sum(len(v) for v in exact.values())
        recall = hits / total
        # synthetic near-uniform embeddings are a worst case for IVF
        # (no cluster structure); probing 3/8 lists must still beat
        # the random-scan floor and land most true neighbors.
        assert recall >= 0.5, f"recall {recall:.3f}"
