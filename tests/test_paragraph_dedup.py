"""Paragraph-level dedup: boilerplate-removal semantics on a
hand-built corpus plus a DuckDB differential on documents."""

from __future__ import annotations

import os

import duckdb
import pytest

from redis_lsm_timeseries_spark.operators.dedup import paragraph_dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

BOILER = "all rights reserved contact the webmaster"


class TestSemantics:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, f"unique one\n{BOILER}\nunique two"),
                (2, f"{BOILER}\nfresh content here"),
                (3, f"third doc body\n\n   \n{BOILER}"),
                (4, BOILER),           # nothing but boilerplate
                (5, ""),               # empty doc
                (6, "repeated inside\nrepeated inside\nother line"),
            ],
            "doc_id long, text string",
        )

    @pytest.fixture(scope="class")
    def out(self, corpus):
        return {r.doc_id: r for r in paragraph_dedup(corpus).collect()}

    def test_first_occurrence_survives(self, out):
        assert out[1].text_deduped == f"unique one\n{BOILER}\nunique two"
        assert not out[1].was_modified

    def test_later_copies_cut_and_reassembled_in_order(self, out):
        assert out[2].text_deduped == "fresh content here"
        assert out[2].was_modified
        assert out[3].text_deduped == "third doc body"
        assert out[3].n_paragraphs == 2  # blank lines dropped

    def test_all_boilerplate_doc_empties(self, out):
        assert out[4].text_deduped == ""
        assert out[4].n_kept == 0 and out[4].n_paragraphs == 1

    def test_empty_doc_passes_through(self, out):
        assert out[5].text_deduped == ""
        assert out[5].n_paragraphs == 0 and not out[5].was_modified

    def test_intra_document_repeat_kept_once(self, out):
        assert out[6].text_deduped == "repeated inside\nother line"
        assert out[6].was_modified

    def test_every_document_returns(self, corpus, out):
        assert len(out) == corpus.count()


class TestDifferential:
    ORACLE = """
        WITH split AS (
            SELECT doc_id, string_split(text, chr(10)) AS l
            FROM documents
        ), p0 AS (
            SELECT doc_id, i, trim(l[i]) AS para
            FROM split, unnest(range(1, len(l) + 1)) t(i)
            WHERE length(trim(l[i])) >= 1
        ), p AS (
            SELECT doc_id, para,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY i
                   ) - 1 AS pos
            FROM p0
        ), winners AS (
            SELECT doc_id, pos, para,
                   row_number() OVER (
                       PARTITION BY md5(para) ORDER BY doc_id, pos
                   ) = 1 AS keep
            FROM p
        ), agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_paragraphs,
                   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   coalesce(string_agg(
                       CASE WHEN keep THEN para END, chr(10)
                       ORDER BY pos
                   ), '') AS text_deduped
            FROM winners GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_paragraphs, 0) AS n_paragraphs,
               coalesce(a.n_kept, 0) AS n_kept,
               coalesce(a.text_deduped, '') AS text_deduped
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """

    def test_matches_duckdb(self, spark):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(self.ORACLE).fetchall()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = paragraph_dedup(docs).orderBy("doc_id").collect()
        assert len(got) == len(want) > 0
        for g, w in zip(got, want):
            assert (g.doc_id, g.n_paragraphs, g.n_kept) == tuple(w[:3])
            assert g.text_deduped == w[3], f"doc {g.doc_id} text mismatch"
        con.close()

    def test_cuts_planted_boilerplate_at_scale(self, spark):
        """Append a shared boilerplate paragraph to every doc: exactly
        one copy (the min doc_id's) survives the pass."""
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        salted = docs.select(
            "doc_id",
            F.concat("text", F.lit(f"\n{BOILER}")).alias("text"),
        )
        out = paragraph_dedup(salted)
        survivors = out.where(
            F.col("text_deduped").contains(BOILER)
        ).collect()
        assert len(survivors) == 1
        assert survivors[0].doc_id == docs.agg(F.min("doc_id")).first()[0]
