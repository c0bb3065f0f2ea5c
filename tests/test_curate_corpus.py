"""curate_corpus composition: verdicts agree with each component
operator run standalone; reasons are sound (every reason reflects a
real failure) and complete (every failure is listed)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.dedup import exact_dedup
from redis_lsm_timeseries_spark.operators.filtering import (
    filter_by_domain_blocklist,
)
from redis_lsm_timeseries_spark.operators.pipeline import curate_corpus
from redis_lsm_timeseries_spark.operators.text import (
    with_lang_guess,
    with_quality_score,
    with_repetition_stats,
    with_token_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def curated(docs):
    return curate_corpus(docs).localCheckpoint()


def test_schema_and_partition(docs, curated):
    assert curated.count() == docs.count()
    for c in ("n_tokens", "quality_score", "lang_guess", "content_digest",
              "drop_reasons", "keep"):
        assert c in curated.columns
    # keep <-> empty reasons, exactly
    assert curated.where(
        (F.col("keep") & (F.size("drop_reasons") > 0))
        | (~F.col("keep") & (F.size("drop_reasons") == 0))
    ).count() == 0


def test_reasons_sound_and_complete(spark, docs, curated):
    """Cross-check every reason tag against the standalone operator."""
    from redis_lsm_timeseries_spark.functions.portable import (
        nonempty_tokens,
    )

    standalone = with_repetition_stats(
        with_quality_score(with_token_stats(docs, "text"), "text"), "text"
    ).select(
        "doc_id",
        # the pipeline's length gates count REAL tokens (nonempty),
        # not with_token_stats's phantom-including n_tokens
        F.size(nonempty_tokens("text")).cast("long").alias("nt"),
        F.col("quality_score").alias("qs"),
        F.col("is_repetitive").alias("rep"),
    )
    joined = curated.join(standalone, "doc_id").localCheckpoint()
    assert joined.where(
        F.array_contains("drop_reasons", "too_short") != (F.col("nt") < 5)
    ).count() == 0
    assert joined.where(
        F.array_contains("drop_reasons", "low_quality")
        != (F.col("qs") < 0.5)
    ).count() == 0
    assert joined.where(
        F.array_contains("drop_reasons", "repetitive") != F.col("rep")
    ).count() == 0


def test_duplicate_reason_matches_dedup_exact(docs, curated):
    winners = exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("w")
    )
    joined = curated.join(winners, "doc_id", "left")
    # a doc is tagged duplicate iff it is NOT its group's winner
    assert joined.where(
        F.array_contains("drop_reasons", "duplicate")
        != F.coalesce(F.col("w"), F.lit(False)).eqNullSafe(F.lit(False))
    ).count() == 0


def test_lang_gate(spark, docs):
    curated = curate_corpus(docs, allowed_langs=("en",))
    bad = curated.where(
        F.array_contains("drop_reasons", "lang")
        != (F.col("lang_guess") != "en")
    )
    assert bad.count() == 0


def test_blocklist_gate(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a fine doc with the words to pass and https://ok.org/x "
                "and more of the filler text to clear the length bar"),
            (2, "a fine doc with the words to pass and https://bad.io/x "
                "and more of the filler text to clear the length bar"),
        ],
        "doc_id long, text string",
    )
    bl = spark.createDataFrame([("bad.io",)], "domain string")
    out = {r.doc_id: r for r in curate_corpus(corpus, blocklist=bl).collect()}
    assert "blocked_domain" in out[2].drop_reasons
    assert "blocked_domain" not in out[1].drop_reasons
    # agreement with the standalone filter
    kept = {
        r.doc_id
        for r in filter_by_domain_blocklist(corpus, bl).collect()
    }
    assert kept == {
        d for d, r in out.items() if "blocked_domain" not in r.drop_reasons
    }


def test_single_shuffle_no_python(docs):
    plan = (
        curate_corpus(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # one digest-keyed window shuffle; no extra exchanges without
    # blocklist/lang options
    assert plan.count("Exchange") <= 2, plan
