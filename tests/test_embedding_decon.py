"""Embedding-space decontamination: planted-contamination recall,
exact-vs-LSH agreement, DuckDB differential for the exact path."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.similarity import (
    embedding_decontamination,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def eval_set(emb):
    """Held-out eval set: every 25th vector, re-identified."""
    return emb.where("vec_id % 25 = 0").select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )


@pytest.fixture(scope="module")
def corpus(emb):
    """The full corpus — which CONTAINS the eval originals (vec_id %
    25 = 0), i.e. planted exact contamination at 1-in-25."""
    return emb.select("vec_id", "embedding")


class TestEmbeddingDecontamination:
    def test_exact_path_flags_planted_rows(self, spark, corpus, eval_set):
        out = embedding_decontamination(
            corpus, eval_set, threshold=0.9999, use_lsh=False
        )
        flagged = {r.vec_id: r for r in out.where("is_contaminated").collect()}
        planted = [r.vec_id for r in corpus.where("vec_id % 25 = 0").collect()]
        # every planted original matches its eval copy at cosine 1
        assert set(planted) <= set(flagged)
        for vid in planted:
            assert flagged[vid].matched_eval_id == vid + 500_000
            assert math.isclose(flagged[vid].best_eval_sim, 1.0, rel_tol=1e-9)

    def test_lsh_path_recall_on_exact_copies(self, spark, corpus, eval_set):
        """Identical vectors share every band bucket — LSH recall on
        exact contamination is 1 by construction."""
        exact = embedding_decontamination(
            corpus, eval_set, threshold=0.9999, use_lsh=False
        )
        lsh = embedding_decontamination(
            corpus, eval_set, threshold=0.9999, use_lsh=True
        )
        exact_ids = {r.vec_id for r in exact.where("is_contaminated").collect()}
        lsh_ids = {r.vec_id for r in lsh.where("is_contaminated").collect()}
        assert exact_ids <= lsh_ids or exact_ids == lsh_ids
        assert exact_ids == lsh_ids  # exact copies: no LSH miss possible

    def test_clean_rows_stay_clean(self, spark, corpus, eval_set):
        out = embedding_decontamination(
            corpus, eval_set, threshold=0.9999, use_lsh=True
        )
        clean = out.where("NOT is_contaminated")
        assert clean.count() > 0
        assert clean.where("matched_eval_id IS NOT NULL").count() == 0
        assert clean.where("best_eval_sim >= 0.9999").count() == 0

    def test_exact_path_matches_duckdb(self, spark, corpus, eval_set, tmp_path):
        cp = str(tmp_path / "c.parquet")
        ep = str(tmp_path / "e.parquet")
        corpus.toPandas().to_parquet(cp)
        eval_set.toPandas().to_parquet(ep)
        con = duckdb.connect()
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(f"""
                WITH c AS (
                  SELECT vec_id, embedding::DOUBLE[] AS cv FROM '{cp}'
                  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[],
                        x -> x * x))) > 0
                ), e AS (
                  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS ev
                  FROM '{ep}'
                  WHERE sqrt(list_sum(list_transform(embedding::DOUBLE[],
                        x -> x * x))) > 0
                ), s AS (
                  SELECT c.vec_id, e.eval_id,
                         list_sum(list_transform(range(1, len(cv) + 1),
                             i -> cv[i] * ev[i]))
                         / (sqrt(list_sum(list_transform(cv, x -> x*x)))
                          * sqrt(list_sum(list_transform(ev, x -> x*x))))
                             AS sim
                  FROM c CROSS JOIN e
                )
                SELECT vec_id, sim AS best, eval_id AS eid
                FROM s
                QUALIFY row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, eval_id DESC
                ) = 1
            """).fetchall()
        }
        got = embedding_decontamination(
            corpus, eval_set, threshold=0.9999, use_lsh=False
        ).collect()
        assert len(got) == len(want)
        for r in got:
            best, eid = want[r.vec_id]
            assert math.isclose(
                r.best_eval_sim, best, rel_tol=1e-9, abs_tol=1e-12
            )
            if r.is_contaminated:
                assert r.matched_eval_id == eid
        con.close()

    def test_eval_side_broadcasts_no_python(self, spark, corpus, eval_set):
        for lsh in (True, False):
            plan = (
                embedding_decontamination(corpus, eval_set, use_lsh=lsh)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "BroadcastExchange" in plan
            assert "BatchEvalPython" not in plan
