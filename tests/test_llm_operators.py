"""Semantic tests for the LLM-pipeline operators — properties the
DuckDB differential check can't express: known-positive recall of the
near-dup pipelines, LSH-vs-exact agreement, multimodal stub
determinism."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.plans import REGISTRY
from redis_lsm_timeseries_spark.plans.llm_queries import NEAR_OFFSET

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def n_docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )


class TestDedupRecall:
    def test_exact_dedup_finds_every_copy(self, spark, n_docs):
        out = REGISTRY["dedup_exact"].fn(spark, SF_DIR)
        rows = out.collect()
        assert len(rows) == n_docs  # one group per distinct content
        assert all(r.n_copies == 2 for r in rows)

    def test_minhash_lsh_recall_on_near_dups(self, spark, n_docs):
        """Each doc and its one-token-appended copy share ~ (n-2)/(n-1)
        Jaccard; banded MinHash (4 bands x 3 rows) should surface almost
        all of them as candidates."""
        pairs = REGISTRY["dedup_minhash_lsh_pairs"].fn(spark, SF_DIR)
        hits = pairs.where(F.col("b") == F.col("a") + NEAR_OFFSET).count()
        assert hits >= 0.9 * n_docs, f"LSH recall too low: {hits}/{n_docs}"

    def test_jaccard_verification_scores_near_dups_high(self, spark, n_docs):
        jac = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR)
        true_pairs = jac.where(F.col("b") == F.col("a") + NEAR_OFFSET)
        rows = true_pairs.collect()
        assert len(rows) >= 0.9 * n_docs
        assert all(r.jaccard >= 0.8 for r in rows)

    def test_simhash_hamming_separates_near_from_random(self, spark):
        ham = REGISTRY["dedup_simhash_hamming"].fn(spark, SF_DIR)
        stats = ham.agg(
            F.max("hamming").alias("mx"), F.avg("hamming").alias("avg")
        ).first()
        # One appended token flips only a few of 60 bits. (The corpus
        # vocabulary is ~30 words, so each token carries real weight:
        # observed avg ~6, max ~14; a random pair averages ~30.)
        assert stats.mx <= 20
        assert stats.avg <= 10


class TestSimilarity:
    def test_lsh_topk_subset_of_bucket_and_scored_like_exact(self, spark):
        """Within a shared bucket, the LSH ranking must agree with the
        exact ranking (same cosine definition)."""
        exact = {
            (r.query_id, r.neighbor_id): r.cosine_sim
            for r in REGISTRY["ann_cosine_topk"].fn(spark, SF_DIR).collect()
        }
        lsh = REGISTRY["ann_cosine_topk_lsh"].fn(spark, SF_DIR).collect()
        assert len(lsh) > 0
        for r in lsh:
            key = (r.query_id, r.neighbor_id)
            if key in exact:
                assert abs(exact[key] - r.cosine_sim) < 1e-12

    def test_near_dup_pairs_contain_all_planted(self, spark):
        emb_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
        pairs = REGISTRY["embedding_near_dup_pairs"].fn(spark, SF_DIR)
        planted = pairs.where(F.col("b") == F.col("a") + NEAR_OFFSET).count()
        assert planted == emb_n  # every perturbed copy found


class TestMultimodal:
    def test_feature_extract_deterministic_and_shaped(self, spark):
        df = REGISTRY["multimodal_feature_extract"].fn(spark, SF_DIR)
        rows1 = {r.doc_id: r for r in df.collect()}
        rows2 = {r.doc_id: r for r in df.collect()}
        assert rows1.keys() == rows2.keys()
        some = next(iter(rows1.values()))
        feature = [int(t) for t in some.feature_csv.split(",")]
        assert len(feature) == 8
        # exact integer bucket counts: the histogram sums to the byte
        # count (the internal API exposes the normalized ratios).
        assert sum(feature) == some.n_bytes
        for k in rows1:
            assert rows1[k].mean_byte == rows2[k].mean_byte
        # n_bytes must equal the utf-8 length of the text.
        texts = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        }
        for k, r in rows1.items():
            assert r.n_bytes == len(texts[k].encode("utf-8"))
