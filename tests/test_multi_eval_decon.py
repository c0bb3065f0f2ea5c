"""Multi-eval-set decontamination: per-set attribution agrees exactly
with the single-set operator applied per set (component agreement),
one corpus pass regardless of set count (plan shape)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.functions.portable import hashed_shingles_expr
from redis_lsm_timeseries_spark.operators.dedup import (
    multi_eval_contamination,
    ngram_overlap_contamination,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "doc_id", hashed_shingles_expr("text").alias("sh")
    ).localCheckpoint()


@pytest.fixture(scope="module")
def eval_sets(spark, corpus):
    """Three synthetic benchmarks: grams sampled from disjoint doc
    slices, so each set contaminates a different corpus region."""
    sets = []
    for i, pred in enumerate(
        ("doc_id % 10 = 0", "doc_id % 10 = 3", "doc_id % 10 = 7")
    ):
        grams = (
            corpus.where(pred)
            .select(F.explode("sh").alias("g"))
            .limit(200)
            .withColumn("eval_set", F.lit(f"bench_{i}"))
            .select("eval_set", "g")
        )
        sets.append(grams)
    out = sets[0]
    for s in sets[1:]:
        out = out.unionByName(s)
    return out.localCheckpoint()


def test_agrees_with_single_set_operator(spark, corpus, eval_sets):
    multi = {
        (r.doc_id, r.eval_set): (r.n_eval_hits, r.contam_frac)
        for r in multi_eval_contamination(corpus, eval_sets).collect()
    }
    assert multi  # the sampled grams do hit their source docs
    for name in ("bench_0", "bench_1", "bench_2"):
        single = {
            r.doc_id: (r.n_eval_hits, r.contam_frac)
            for r in ngram_overlap_contamination(
                corpus,
                eval_sets.where(F.col("eval_set") == name).select("g"),
            )
            .where("n_eval_hits > 0")
            .collect()
        }
        got = {
            d: v for (d, s), v in multi.items() if s == name
        }
        assert got == single, name


def test_output_is_contamination_bounded(spark, corpus, eval_sets):
    out = multi_eval_contamination(corpus, eval_sets)
    n_corpus = corpus.count()
    assert 0 < out.count() < n_corpus  # hits only, never corpus x sets
    assert out.where("n_eval_hits < 1 OR n_shingles < 1").count() == 0
    bad = out.where(
        (F.col("contam_frac") < 0) | (F.col("contam_frac") > 1)
    )
    assert bad.count() == 0


def test_single_corpus_pass_and_broadcast(spark, corpus, eval_sets):
    plan = (
        multi_eval_contamination(corpus, eval_sets)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    # the corpus shingle table feeds ONE explode regardless of set
    # count — Generate appears once
    assert plan.count("Generate") <= 1, plan
