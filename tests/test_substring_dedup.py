"""Substring-level dedup: duplicated token runs that do NOT align to
paragraph boundaries — semantics on a hand-built corpus, planted
mid-paragraph recall at scale, and the complement property vs
paragraph_dedup. (The DuckDB differential for the full operator runs
via the dedup_substring catalog entry in test_oracle_parity.py.)"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.dedup import (
    duplicate_substring_spans,
    paragraph_dedup,
    substring_dedup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


class TestSemantics:
    K = 4

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, RUN),
                # same 8-token run embedded mid-document, offset 3
                (2, f"intro words here {RUN} closing remark"),
                (3, "totally novel content with no duplicated run at all"),
                (4, ""),
                # two separated copies of a 4-token prefix -> 2 spans
                (5, f"alpha beta gamma delta XX YY ZZ QQ alpha beta "
                    f"gamma delta"),
                (6, "short"),
            ],
            "doc_id long, text string",
        )

    @pytest.fixture(scope="class")
    def out(self, corpus):
        return {
            r.doc_id: r
            for r in substring_dedup(corpus, span_tokens=self.K).collect()
        }

    def test_first_occurrence_untouched(self, out):
        assert out[1].n_spans == 0
        assert out[1].text_deduped == RUN

    def test_embedded_copy_cut_as_one_span(self, corpus, out):
        assert out[2].n_spans == 1
        assert out[2].dup_tokens == 8
        assert out[2].text_deduped == "intro words here closing remark"
        spans = {
            (r.span_start, r.span_end)
            for r in duplicate_substring_spans(
                corpus, span_tokens=self.K
            ).where(F.col("doc_id") == 2).collect()
        }
        assert spans == {(3, 11)}

    def test_novel_and_short_docs_untouched(self, out):
        assert out[3].n_spans == 0 and out[3].dup_frac == 0.0
        assert out[4].n_tokens == 0 and out[4].text_deduped == ""
        assert out[6].n_spans == 0  # < K tokens: no windows at all

    def test_separated_repeats_yield_separate_spans(self, out):
        # doc 5's second "alpha beta gamma delta" duplicates doc 1's
        # prefix AND its own first copy; the two dup regions in doc 5
        # are split by the novel XX YY ZZ QQ gap
        assert out[5].n_spans == 2
        assert out[5].text_deduped == "xx yy zz qq"

    def test_dup_frac_consistency(self, out):
        for r in out.values():
            assert r.dup_tokens <= r.n_tokens
            if r.n_tokens:
                assert r.dup_frac == r.dup_tokens / r.n_tokens


class TestAtScale:
    PLANT = (
        "shared boilerplate run one two three four five six seven eight "
        "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen"
    )  # 20 tokens

    def test_planted_midtext_duplicate_recall(self, spark):
        """Inject a 20-token run into the MIDDLE of every document's
        first line (never paragraph-aligned): exactly one document —
        the min doc_id — keeps the run."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        salted = docs.select(
            "doc_id",
            F.concat_ws(
                " ", F.lit("lead-in"), F.lit(self.PLANT), F.col("text")
            ).alias("text"),
        )
        out = substring_dedup(salted, span_tokens=20)
        survivors = out.where(
            F.col("text_deduped").contains("shared boilerplate run one")
        ).collect()
        assert len(survivors) == 1
        assert (
            survivors[0].doc_id
            == docs.agg(F.min("doc_id")).first()[0]
        )
        # every other doc was modified and lost >= the planted 20
        n_cut = out.where(F.col("dup_tokens") >= 20).count()
        assert n_cut == docs.count() - 1

    def test_complement_of_paragraph_dedup(self, spark):
        """A duplicate run embedded mid-paragraph is invisible to
        paragraph_dedup (its paragraphs differ) but cut by
        substring_dedup — the reason both passes exist."""
        a = "unique opening for document a " + self.PLANT + " tail a"
        b = "a different opening for b " + self.PLANT + " other tail"
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        para = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        assert para[2].n_kept == para[2].n_paragraphs  # nothing cut
        sub = {
            r.doc_id: r
            for r in substring_dedup(df, span_tokens=20).collect()
        }
        assert sub[1].n_spans == 0
        assert sub[2].n_spans == 1 and sub[2].dup_tokens >= 20
        assert "boilerplate" not in sub[2].text_deduped


class TestPlanShape:
    def test_no_python_udfs_and_bounded_exchanges(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        df = substring_dedup(docs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        # digest groupBy-min + join back + per-doc span merge: the text
        # never crosses more than the span machinery's exchanges
        assert plan.count("Exchange") <= 6, plan

    def test_winner_pick_is_not_a_digest_window(self, spark):
        """The first-occurrence winner must be groupBy-min + join back,
        never a window partitioned by the digest: WindowExec gets no
        map-side partial aggregation, so the hottest (= most duplicated)
        digest would land every occurrence in one straggler task. The
        only windows allowed are the per-document span-merge ones keyed
        by doc id."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        for df, digest in (
            (duplicate_substring_spans(docs), "wdigest"),
            (paragraph_dedup(docs), "pdigest"),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            for line in plan.splitlines():
                if "windowspecdefinition" in line:
                    assert digest not in line, line
            # partial aggregation collapses hot digests map-side
            assert "partial_min" in plan, plan


class TestPlantedSkew:
    def test_hot_digest_majority_of_rows(self, spark):
        """One window digest planted in >= 50% of all rows — the shape
        that makes Window.partitionBy(digest) a single straggler task.
        The groupBy-min path must still produce the exact winner rule
        (min (id, pos)) and cut every later copy."""
        hot = " ".join(f"tok{i}" for i in range(4))  # 4-token hot run
        rows = [(0, hot)]  # winner: doc 0, pos 0
        rows += [(i, f"unique{i}a unique{i}b {hot}") for i in range(1, 401)]
        rows += [
            (i, f"fresh{i}x fresh{i}y fresh{i}z fresh{i}w")
            for i in range(401, 501)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spans = {
            r.doc_id: r
            for r in duplicate_substring_spans(df, span_tokens=4).collect()
        }
        assert 0 not in spans  # first occurrence wins
        assert set(spans) == set(range(1, 401))
        assert all(
            (s.span_start, s.span_end) == (2, 6) for s in spans.values()
        )
        para = paragraph_dedup(
            spark.createDataFrame(
                [(i, hot) for i in range(500)], "doc_id long, text string"
            )
        ).collect()
        kept = [r for r in para if r.n_kept == 1]
        assert [r.doc_id for r in kept] == [0]
        assert all(r.text_deduped == "" for r in para if r.doc_id != 0)
