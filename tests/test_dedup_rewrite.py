"""dedup_rewrite composition: paragraph + substring cuts in one call,
agreeing with the component operators, idempotent as a fixed point."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.dedup import (
    paragraph_dedup,
    substring_dedup,
)
from redis_lsm_timeseries_spark.operators.pipeline import dedup_rewrite

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

BOILER = "all rights reserved contact the webmaster for removal requests"
RUN20 = " ".join(f"tok{i}" for i in range(20))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # doc 1 owns both the boilerplate paragraph and the run
            (1, f"original body one {RUN20} more text\n{BOILER}"),
            # doc 2 repeats the paragraph (paragraph-aligned dup)
            (2, f"{BOILER}\nfresh content for document two entirely"),
            # doc 3 embeds the run mid-paragraph (substring dup)
            (3, f"unrelated opening here {RUN20} and a closing tail"),
            (4, "wholly novel document with none of the shared text"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def rewritten(corpus):
    return {r.doc_id: r for r in dedup_rewrite(corpus).collect()}


def test_both_granularities_cut(rewritten):
    # doc 2: paragraph stage removes the boilerplate block
    assert "rights reserved" not in rewritten[2].text
    assert rewritten[2].n_paragraphs_kept < rewritten[2].n_paragraphs
    # doc 3: substring stage removes the mid-paragraph run
    assert "tok0" not in rewritten[3].text
    assert rewritten[3].n_spans_cut == 1
    assert rewritten[3].dup_tokens_cut >= 20
    # first owner keeps everything (no cuts) — but its newline was
    # normalized away by the substring stage, so the byte-exact flag
    # is True (ADVICE r8: normalization-only changes count)
    assert "tok0" in rewritten[1].text and "rights reserved" in rewritten[1].text
    assert rewritten[1].n_spans_cut == 0
    assert rewritten[1].n_paragraphs_kept == rewritten[1].n_paragraphs
    assert rewritten[1].was_modified
    # single-paragraph, already-normalized doc: bytes untouched
    assert not rewritten[4].was_modified


def test_agrees_with_sequential_components(spark, corpus):
    p = paragraph_dedup(corpus)
    mid = p.select("doc_id", F.col("text_deduped").alias("text"))
    s = substring_dedup(mid.localCheckpoint())
    want = {r.doc_id: r.text_deduped for r in s.collect()}
    got = {r.doc_id: r.text for r in dedup_rewrite(corpus).collect()}
    assert got == want


def test_rewrite_is_a_fixed_point(spark, corpus):
    once = dedup_rewrite(corpus).select(
        "doc_id", "text"
    ).localCheckpoint()
    twice = {
        r.doc_id: r for r in dedup_rewrite(once).collect()
    }
    for r in once.collect():
        assert twice[r.doc_id].text == r.text
        assert not twice[r.doc_id].was_modified


def test_paragraph_only_keeps_casing(spark):
    df = spark.createDataFrame(
        [(1, f"Mixed CASE body\n{BOILER}"), (2, BOILER)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_rewrite(df, substring=False).collect()
    }
    assert out[1].text == f"Mixed CASE body\n{BOILER}"
    assert out[2].text == ""
    assert out[1].n_spans_cut == 0


def test_scale_smoke_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup_rewrite(docs)
    assert out.count() == docs.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_normalization_only_change_sets_modified_flag(spark):
    """ADVICE r8: the substring stage normalizes (lowercase,
    whitespace-collapse) even with zero spans cut — a doc whose bytes
    changed by normalization alone must report was_modified=True, or
    callers gating rewrites on the flag persist a mixed-normalization
    corpus. An already-normalized unique doc stays False."""
    df = spark.createDataFrame(
        [
            (1, "Hello World From The Rewriter"),
            (2, "already normalized unique content here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_rewrite(df).collect()}
    assert out[1].dup_tokens_cut == 0
    assert out[1].was_modified  # bytes changed: lowercased
    assert out[1].text == "hello world from the rewriter"
    assert not out[2].was_modified
    assert out[2].text == "already normalized unique content here"
