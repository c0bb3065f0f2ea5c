"""Corpus language-model quality scoring (north star): the
CCNet/KenLM-style signal — score each document by the mean log
probability of its tokens under a unigram model fit on the corpus
itself. Documents full of rare junk tokens score low; fluent,
in-distribution text scores high. Used as a curation filter alongside
the heuristic scores in ``operators.text``.

Two passes over the corpus, both shuffle-light:

1. ``unigram_model`` — one (token -> count) hash aggregate with
   map-side combine. The vocabulary is corpus-bounded (Heaps' law:
   ~millions of distinct tokens at 100 TB, tens of MB as a two-column
   table), so the model fits a broadcast.
2. ``with_lm_score`` — explode tokens, broadcast-join the model,
   re-aggregate per document. The only corpus-keyed shuffle carries
   (doc_id, sum, count) after partial aggregation.

Out-of-vocabulary tokens (scoring corpus B against a model fit on
corpus A) take a floor probability of ``oov_count / total`` with
``oov_count`` = 1 — additive-smoothing-lite, deterministic and
oracle-reproducible. All arithmetic on the Spark side mirrors the
DuckDB oracle: counts stay exact integers; the single float step is
``ln(count / total)``, identical IEEE-754 doubles on both engines for
equal rational inputs (tests still compare with a 1e-9 tolerance to
stay libm-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.functions.portable import nonempty_tokens


def _doc_tokens(df: DataFrame, text_col: str) -> DataFrame:
    """Non-empty lowercase whitespace tokens, one row per token."""
    return df.select(
        "*", F.explode(nonempty_tokens(text_col)).alias("_tok")
    )


def unigram_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fit the unigram table: (token, n, logprob) with
    ``logprob = ln(n / total)``. One hash aggregate; ``total`` rides
    in as a scalar subquery-style cross-joined literal aggregate so
    the plan stays fully distributed (no driver collect)."""
    counts = (
        _doc_tokens(df, text_col)
        .groupBy(F.col("_tok").alias("token"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("long").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "logprob", F.log(F.col("n").cast("double") / F.col("_total"))
        )
        .select("token", "n", "_total", "logprob")
    )


def with_lm_score(
    corpus: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document under a fitted unigram model.

    Output: (id, n_tokens, n_oov, lm_score) where ``lm_score`` is the
    mean token log-probability (0.0 for zero-token documents — the
    neutral score; downstream filters treat those via length cuts).

    The model BROADCASTS (vocabulary-bounded); the left join keeps
    OOV tokens, floored at ln(1 / total)."""
    toks = _doc_tokens(
        corpus.select(F.col(id_col), F.col(text_col)), text_col
    ).select(id_col, F.col("_tok").alias("token"))
    # The model plan is consumed TWICE below (broadcast join + the
    # 1-row total aggregate); without materialization each consumer
    # re-runs the full corpus tokenize/count of unigram_model — the
    # same projection-collapse trap incremental_near_dup checkpoints
    # against. The model is vocabulary-bounded, so this is cheap.
    model = model.localCheckpoint(eager=False)
    # _total is constant across the model; ride it in as a 1-row
    # broadcast so OOV rows (left-join misses) can compute the floor
    # without a global window over the exploded token table.
    total_row = model.agg(F.max("_total").alias("_floor_total"))
    floor_lp = F.log(F.lit(1.0) / F.col("_floor_total"))
    scored = (
        toks.join(
            F.broadcast(model.select("token", "logprob")), "token", "left"
        )
        .crossJoin(F.broadcast(total_row))
        .withColumn("_lp", F.coalesce(F.col("logprob"), floor_lp))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("logprob").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
            F.sum("_lp").alias("_sum_lp"),
        )
        .join(corpus.select(id_col), id_col, "right")
        .withColumn(
            "n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
        )
        .withColumn(
            "n_oov", F.coalesce(F.col("n_oov"), F.lit(0)).cast("long")
        )
        .withColumn(
            "lm_score",
            F.when(
                F.col("n_tokens") > 0,
                F.col("_sum_lp") / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select(id_col, "n_tokens", "n_oov", "lm_score")
    )


def lm_quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-scoring convenience: fit on the corpus, score the corpus.
    (No OOV possible by construction — every token is in the model.)"""
    return with_lm_score(df, unigram_model(df, text_col), text_col, id_col)
