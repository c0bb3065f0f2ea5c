"""Text-analysis operators for the LLM-data-pipeline surface (north
star): token statistics, quality scoring, language-ID heuristic,
document fingerprinting.

All pure Column expressions (JVM-side, whole-stage-codegen'd) — no
Python UDFs in any hot path. Every computation has a portable DuckDB
twin in ``plans/llm_queries.py`` for differential checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from redis_lsm_timeseries_spark.functions.portable import tokens

# Tiny stopword lists for the language-ID heuristic. Order matters for
# the deterministic tie-break (first listed wins).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "los", "de", "y", "en", "es", "un", "con", "por"),
    "fr": ("le", "les", "et", "une", "est", "dans", "que", "pour", "sur", "au"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _in_list(arr_col: str, words: tuple) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({arr_col}, t -> t IN ({lst})))").cast("long")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and basic shape
    statistics."""
    return (
        df.withColumn("toks", tokens(text_col))
        .withColumn("n_tokens", F.size("toks").cast("long"))
        .withColumn(
            "n_distinct_tokens", F.size(F.array_distinct("toks")).cast("long")
        )
        .withColumn("n_chars_obs", F.length(text_col).cast("long"))
        .withColumn(
            "n_bpe_tokens",
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0
                )
            ).cast("long"),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation density, stopword ratio,
    mean token length. Composite score = weighted sum, all exact-integer
    ratios divided in double (deterministic across engines).

    Expects ``with_token_stats`` columns present."""
    punct = F.length(
        F.regexp_replace(F.col(text_col), "[a-z0-9\\s]", "")
    ).cast("long")
    en_hits = _in_list("toks", STOPWORDS["en"])
    return (
        df.withColumn("n_punct", punct)
        .withColumn("en_stopword_hits", en_hits)
        .withColumn(
            "punct_ratio",
            F.col("n_punct").cast("double") / F.col("n_chars_obs"),
        )
        .withColumn(
            "stopword_ratio",
            F.col("en_stopword_hits").cast("double") / F.col("n_tokens"),
        )
        .withColumn(
            "mean_token_len",
            (F.col("n_chars_obs") - (F.col("n_tokens") - F.lit(1))).cast("double")
            / F.col("n_tokens"),
        )
        .withColumn(
            "quality_score",
            F.col("stopword_ratio") * F.lit(0.4)
            + (F.lit(1.0) - F.col("punct_ratio")) * F.lit(0.3)
            + F.when(
                (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000),
                F.lit(0.3),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_lang_guess(df: DataFrame) -> DataFrame:
    """n-gram/stopword language-ID heuristic: count stopword hits per
    language, argmax with deterministic precedence en > de > es > fr.
    Expects a ``toks`` column (``with_token_stats``)."""
    hits = {lang: _in_list("toks", words) for lang, words in STOPWORDS.items()}
    out = df
    for lang, col in hits.items():
        out = out.withColumn(f"hits_{lang}", col)
    return out.withColumn(
        "lang_guess",
        F.when(
            (F.col("hits_en") >= F.col("hits_de"))
            & (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_fr")),
            F.lit("en"),
        )
        .when(
            (F.col("hits_de") >= F.col("hits_es"))
            & (F.col("hits_de") >= F.col("hits_fr")),
            F.lit("de"),
        )
        .when(F.col("hits_es") >= F.col("hits_fr"), F.lit("es"))
        .otherwise(F.lit("fr")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order- and repetition-insensitive, so reshuffled/duplicated-word
    variants collide (the classic key-collision fingerprint)."""
    return df.withColumn(
        "fingerprint",
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(tokens(text_col)))
            )
        ),
    )
