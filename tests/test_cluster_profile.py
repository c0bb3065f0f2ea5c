"""Corpus clustering profile: assignment determinism/partition
properties, profile consistency, map-only plan gate."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.similarity import (
    assign_clusters,
    cluster_profile,
    train_ivf_centroids,
    usable_norm,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return train_ivf_centroids(emb, n_list=8, iters=2)


@pytest.fixture(scope="module")
def assigned(emb, centroids):
    return assign_clusters(emb, centroids)


def test_assignment_partitions_usable_corpus(spark, emb, assigned):
    usable = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).where(usable_norm("v"))
    assert assigned.count() == usable.count()
    assert assigned.groupBy("vec_id").count().where("count > 1").count() == 0
    assert assigned.where(
        (F.col("cluster_id") < 0) | (F.col("cluster_id") >= 8)
    ).count() == 0


def test_assignment_is_deterministic(spark, emb, centroids):
    a = {r.vec_id: r.cluster_id for r in assign_clusters(emb, centroids).collect()}
    b = {r.vec_id: r.cluster_id for r in assign_clusters(emb, centroids).collect()}
    assert a == b


def test_assigned_centroid_is_argmax(spark, emb, centroids, assigned):
    """centroid_sim equals the dot with the ASSIGNED centroid, and no
    other centroid beats it — spot-check a sample driver-side."""
    rows = assigned.limit(20).collect()
    unit = {
        r.vec_id: r.v
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    for r in rows:
        v = unit[r.vec_id]
        nrm = math.sqrt(sum(x * x for x in v))
        sims = [
            sum(x / nrm * y for x, y in zip(v, c)) for c in centroids
        ]
        assert math.isclose(r.centroid_sim, max(sims), rel_tol=1e-9)
        assert sims.index(max(sims)) == r.cluster_id


def test_profile_shares_sum_to_one(spark, assigned):
    prof = cluster_profile(assigned).collect()
    assert math.isclose(sum(r.corpus_share for r in prof), 1.0, rel_tol=1e-12)
    assert sum(r.n_vectors for r in prof) == assigned.count()
    for r in prof:
        assert r.min_sim <= r.mean_sim <= 1.0 + 1e-12


def test_assignment_is_map_only(spark, emb, centroids):
    plan = (
        assign_clusters(emb, centroids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
