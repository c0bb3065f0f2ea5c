"""Span-level decontamination: contaminated n-gram regions are CUT
out of documents (redact-don't-discard), verified against an
independent pure-Python n-gram matcher, with the complement property
(clean docs normalized but untouched) and plan gates."""

from __future__ import annotations

import os

import pytest

from redis_lsm_timeseries_spark.operators.dedup import (
    contamination_spans,
    decontaminate_rewrite,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

K = 4

EVAL = [
    (1, "What is the capital of France Paris obviously"),
    (2, "Name the largest planet Jupiter of course friend"),
]
# doc 2 quotes an 8-token eval passage mid-text; doc 3 is clean; doc 4
# IS an eval item verbatim; doc 5 quotes a 3-token fragment (< K, no cut)
DOCS = [
    (1, "intro words here what is the capital of france paris obviously closing remark"),
    (2, "a wholly original passage about rivers and sediment transport over time"),
    (3, "name the largest planet jupiter of course friend"),
    (4, "short quote capital of france appears but under the gram floor"),
]


def _tokens(text):
    return [t for t in text.lower().split() if t]


def _expected_cut(doc_text, eval_texts, k=K):
    """Independent matcher: flag every doc position whose k-gram
    equals any eval k-gram (string equality, not hashes), merge runs,
    cut covered tokens."""
    toks = _tokens(doc_text)
    grams = {
        tuple(_tokens(e)[i:i + k])
        for e in eval_texts
        for i in range(len(_tokens(e)) - k + 1)
    }
    flagged = {
        i for i in range(len(toks) - k + 1)
        if tuple(toks[i:i + k]) in grams
    }
    covered = {j for i in flagged for j in range(i, i + k)}
    return " ".join(t for i, t in enumerate(toks) if i not in covered)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


@pytest.fixture(scope="module")
def out(frames):
    docs, ev = frames
    return {
        r.doc_id: r
        for r in decontaminate_rewrite(docs, ev, span_tokens=K).collect()
    }


class TestSemantics:
    def test_matches_independent_matcher_for_every_doc(self, out):
        eval_texts = [t for _, t in EVAL]
        for doc_id, text in DOCS:
            assert out[doc_id].text_clean == _expected_cut(
                text, eval_texts
            ), doc_id

    def test_quoted_passage_cut_rest_kept(self, out):
        r = out[1]
        assert "capital" not in r.text_clean
        assert r.text_clean == "intro words here closing remark"
        assert r.n_spans == 1 and r.contam_tokens == 8
        assert 0 < r.contam_frac < 1

    def test_clean_doc_untouched(self, out):
        r = out[2]
        assert r.n_spans == 0 and r.contam_tokens == 0
        assert r.text_clean == DOCS[1][1]

    def test_verbatim_eval_item_empties(self, out):
        r = out[3]
        assert r.text_clean == ""
        assert r.contam_frac == 1.0

    def test_sub_gram_fragment_survives(self, out):
        r = out[4]
        assert r.n_spans == 0
        assert "capital of france" in r.text_clean

    def test_spans_locate_the_quote(self, frames):
        docs, ev = frames
        spans = {
            r.doc_id: (r.span_start, r.span_end)
            for r in contamination_spans(docs, ev, span_tokens=K).collect()
        }
        # doc 1: quote occupies tokens [3, 11) of the normalized stream
        assert spans[1] == (3, 11)


class TestScaleAndPlan:
    def test_eval_side_broadcasts_no_cartesian(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ev = docs.where("doc_id % 50 = 0").select(
            (docs.doc_id + 10**6).alias("eval_id"), "text"
        )
        df = decontaminate_rewrite(docs.where("doc_id % 50 != 0"), ev)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan

    def test_planted_quote_recalled_at_scale(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        quote = " ".join(f"benchq{i}" for i in range(10))
        ev = spark.createDataFrame(
            [(1, f"prompt prefix {quote} answer suffix")],
            "eval_id long, text string",
        )
        planted = spark.createDataFrame(
            [(10**7, f"scraped page body {quote} more page body")],
            "doc_id long, text string",
        )
        corpus = docs.select("doc_id", "text").unionByName(planted)
        got = {
            r.doc_id: r
            for r in decontaminate_rewrite(corpus, ev)
            .where("n_spans > 0")
            .collect()
        }
        assert 10**7 in got
        assert "benchq0" not in got[10**7].text_clean
        assert "scraped page body" in got[10**7].text_clean
