"""Blocklist filtering, hash splitting, corpus report: DuckDB
differentials where arithmetic is portable, semantic properties
elsewhere, plan gates for the broadcast/anti-join shapes."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.filtering import (
    corpus_report,
    filter_by_domain_blocklist,
)
from redis_lsm_timeseries_spark.operators.sampling import hash_split

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

HASH64 = "(('0x' || substr(md5(CAST({e} AS VARCHAR)), 1, 15))::BIGINT)"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield con
    con.close()


class TestHashSplit:
    FR = {"train": 800, "val": 100, "test": 100}

    def test_partition_of_corpus(self, spark, docs):
        out = hash_split(docs, self.FR, "doc_id")
        assert out.count() == docs.count()  # fractions cover denom
        assert (
            out.groupBy("doc_id").count().where("count > 1").count() == 0
        )

    def test_matches_duckdb_bucketing(self, spark, duck, docs):
        got = {
            r.doc_id: r.split
            for r in hash_split(docs, self.FR, "doc_id").collect()
        }
        rows = duck.execute(
            f"SELECT doc_id, {HASH64.format(e='doc_id')} % 1000 AS b "
            f"FROM documents"
        ).fetchall()
        assert len(rows) == len(got)
        for doc_id, b in rows:
            want = "test" if b < 100 else ("train" if b < 900 else "val")
            assert got[doc_id] == want, (doc_id, b, got[doc_id], want)

    def test_stability_under_corpus_growth(self, spark, docs):
        """A doc's split never changes when the corpus around it does."""
        full = {
            r.doc_id: r.split
            for r in hash_split(docs, self.FR, "doc_id").collect()
        }
        half = {
            r.doc_id: r.split
            for r in hash_split(
                docs.where("doc_id % 2 = 0"), self.FR, "doc_id"
            ).collect()
        }
        assert half and all(full[k] == v for k, v in half.items())

    def test_partial_fractions_drop_remainder(self, spark, docs):
        out = hash_split(docs, {"eval": 50}, "doc_id")
        assert 0 < out.count() < docs.count()
        assert out.select("split").distinct().collect()[0].split == "eval"

    def test_overcommitted_fractions_raise(self, spark, docs):
        with pytest.raises(ValueError):
            hash_split(docs, {"a": 700, "b": 700}, "doc_id")


class TestDomainBlocklist:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "see https://bad.example.com/x for details"),
                (2, "visit http://www.good.org/page today"),
                (3, "both https://bad.example.com/a and https://good.org/b"),
                (4, "no links at all"),
                (5, "https://BAD.EXAMPLE.COM/upper case host"),
            ],
            "doc_id long, text string",
        )

    @pytest.fixture(scope="class")
    def blocklist(self, spark):
        return spark.createDataFrame(
            [("bad.example.com",)], "domain string"
        )

    def test_drop_mode(self, spark, corpus, blocklist):
        kept = sorted(
            r.doc_id
            for r in filter_by_domain_blocklist(corpus, blocklist).collect()
        )
        assert kept == [2, 4]  # 1,3,5 cite the blocked domain

    def test_keep_mode_is_the_complement(self, spark, corpus, blocklist):
        kept = sorted(
            r.doc_id
            for r in filter_by_domain_blocklist(
                corpus, blocklist, mode="keep"
            ).collect()
        )
        assert kept == [1, 3, 5]

    def test_blocklist_broadcasts_and_text_avoids_shuffle(
        self, spark, corpus, blocklist
    ):
        plan = (
            filter_by_domain_blocklist(corpus, blocklist)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" in plan
        assert "BatchEvalPython" not in plan

    def test_real_corpus_passes_through_unblocked(self, spark, docs, blocklist):
        out = filter_by_domain_blocklist(docs, blocklist)
        assert out.count() <= docs.count()
        assert out.schema == docs.schema


class TestCorpusReport:
    ORACLE = """
        WITH base AS (
            SELECT lang, source, md5(text) AS dg,
                   len(list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t != '')) AS nt
            FROM documents
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               CAST(min(nt) AS BIGINT) AS min_tokens,
               CAST(max(nt) AS BIGINT) AS max_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT dg) AS BIGINT) AS n_distinct
        FROM base
    """

    def test_matches_duckdb(self, spark, duck, docs):
        got = corpus_report(docs, exact=True).first()
        want = duck.execute(self.ORACLE).fetchone()
        assert (
            got.n_docs,
            got.total_tokens,
            got.min_tokens,
            got.max_tokens,
            got.n_langs,
            got.n_sources,
            got.n_distinct_contents,
        ) == tuple(want)
        assert 0.0 <= got.dup_rate < 1.0
        assert got.min_tokens <= got.median_tokens <= got.max_tokens

    def test_single_row_and_no_python(self, spark, docs):
        rep = corpus_report(docs)
        assert rep.count() == 1
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan

    def test_approx_default_tracks_exact(self, spark, docs):
        """The default (approx) report: tiny cardinalities are exact
        under HLL, and the content-distinct estimate stays within the
        sketch's error band of the exact count."""
        approx = corpus_report(docs).first()
        exact = corpus_report(docs, exact=True).first()
        # identical non-distinct aggregates
        assert (approx.n_docs, approx.total_tokens, approx.max_tokens) == (
            exact.n_docs, exact.total_tokens, exact.max_tokens
        )
        # HLL estimates within the sketch's error band
        assert abs(approx.n_langs - exact.n_langs) <= max(
            1, 0.1 * exact.n_langs
        )
        assert abs(approx.n_sources - exact.n_sources) <= max(
            1, 0.1 * exact.n_sources
        )
        assert (
            abs(approx.n_distinct_contents - exact.n_distinct_contents)
            <= 0.1 * exact.n_distinct_contents
        )
        assert approx.dup_rate >= 0.0  # clamped

    def test_approx_plan_has_no_expand(self, spark, docs):
        """The reason approx is the default: multiple countDistincts
        force an Expand (row multiplication) before the shuffle; the
        HLL sketches do not."""
        approx_plan = (
            corpus_report(docs)._jdf.queryExecution().executedPlan()
            .toString()
        )
        exact_plan = (
            corpus_report(docs, exact=True)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Expand" not in approx_plan
        assert "Expand" in exact_plan


class TestCorpusReportBy:
    ORACLE = """
        WITH base AS (
            SELECT source, md5(text) AS dg,
                   len(list_filter(string_split_regex(lower(text), '\\s+'),
                       t -> t != '')) AS nt
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               CAST(min(nt) AS BIGINT) AS min_tokens,
               CAST(max(nt) AS BIGINT) AS max_tokens,
               CAST(count(DISTINCT dg) AS BIGINT) AS n_distinct
        FROM base GROUP BY source ORDER BY source
    """

    def test_matches_duckdb(self, spark, duck, docs):
        from redis_lsm_timeseries_spark.operators.filtering import (
            corpus_report_by,
        )

        got = {
            r.source: r
            for r in corpus_report_by(docs, ("source",), exact=True)
            .collect()
        }
        want = duck.execute(self.ORACLE).fetchall()
        assert len(got) == len(want) > 1
        for src, n, tot, mn, mx, nd in want:
            g = got[src]
            assert (g.n_docs, g.total_tokens, g.min_tokens, g.max_tokens,
                    g.n_distinct_contents) == (n, tot, mn, mx, nd)
            assert 0.0 <= g.dup_rate < 1.0

    def test_no_expand_in_approx_plan(self, spark, docs):
        from redis_lsm_timeseries_spark.operators.filtering import (
            corpus_report_by,
        )

        plan = (
            corpus_report_by(docs)._jdf.queryExecution().executedPlan()
            .toString()
        )
        assert "Expand" not in plan
        assert "BatchEvalPython" not in plan


class TestCorpusDiff:
    def test_verdicts(self, spark):
        from redis_lsm_timeseries_spark.operators.filtering import (
            corpus_diff,
        )

        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "will vanish")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "same text"), (2, "has changed"), (4, "brand new")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
        assert out == {
            1: "unchanged", 2: "changed", 3: "removed", 4: "added"
        }

    def test_matches_duckdb_on_documents(self, spark, duck, docs, tmp_path):
        from redis_lsm_timeseries_spark.operators.filtering import (
            corpus_diff,
        )

        # new snapshot: drop ids % 7 == 0, rewrite ids % 5 == 0, add
        # shifted copies
        import pyspark.sql.functions as F

        new = (
            docs.where("doc_id % 7 != 0")
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.col("text"), F.lit(" [edited]")),
                ).otherwise(F.col("text")),
            )
            .select("doc_id", "text")
            .unionByName(
                docs.limit(3).select(
                    (F.col("doc_id") + 900_000).alias("doc_id"), "text"
                )
            )
        )
        newp = str(tmp_path / "new.parquet")
        new.toPandas().to_parquet(newp)
        want = dict(
            duck.execute(f"""
                WITH o AS (SELECT doc_id, md5(text) AS d FROM documents),
                n AS (SELECT doc_id, md5(text) AS d FROM '{newp}')
                SELECT coalesce(o.doc_id, n.doc_id),
                       CASE WHEN o.d IS NULL THEN 'added'
                            WHEN n.d IS NULL THEN 'removed'
                            WHEN o.d = n.d THEN 'unchanged'
                            ELSE 'changed' END
                FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
            """).fetchall()
        )
        got = {
            r.doc_id: r.status
            for r in corpus_diff(docs, spark.read.parquet(newp)).collect()
        }
        assert got == want
        assert "added" in got.values() and "removed" in got.values()
        assert "changed" in got.values()
