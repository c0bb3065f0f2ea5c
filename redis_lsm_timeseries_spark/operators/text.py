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


#: http(s) URLs as they appear in prose: scheme + host + optional path,
#: terminated before whitespace and closing brackets/quotes. Sentence
#: punctuation ('.', ',', ';', '!', '?') is legal INSIDE a path, so the
#: class admits it and ``with_urls`` strips it off the END of each
#: match instead — a URL cited mid-sentence and the same URL at a
#: sentence boundary must produce one dedup key, not two.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s<>\"')\]]*)?"


def with_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract http(s) URLs and their registrable-ish domains — the
    inputs to URL-level dedup and source/blocklist filtering in a
    training pipeline.

    - ``urls``: every match of ``URL_PATTERN``, in order (array<string>);
    - ``domains``: each URL's lowercased host with any leading ``www.``
      stripped and the port dropped (array<string>, same order — dedup
      with ``array_distinct`` as needed);
    - ``n_urls``: match count.

    All Column expressions (regexp_extract_all + transform), no UDFs;
    domain extraction is string surgery, not a PSL lookup — callers
    needing true eTLD+1 semantics plug in a suffix table join."""
    raw = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    # Trailing sentence punctuation belongs to the prose, not the URL
    # (the host class also admits a final '.' for "https://a.io." at a
    # sentence end) — strip it per match so dedup keys are stable.
    urls = F.expr(
        "transform(_url_raw, u -> regexp_replace(u, '[.,;!?]+$', ''))"
    )
    host = (
        "lower(regexp_replace(regexp_replace(u, '^https?://', ''), '[/:].*$', ''))"
    )
    domains = F.expr(
        f"transform(_url_list, u -> regexp_replace({host}, '^www\\\\.', ''))"
    )
    return (
        df.withColumn("_url_raw", F.coalesce(raw, F.expr("array()")))
        .withColumn("_url_list", urls)
        .drop("_url_raw")
        .withColumn("urls", F.col("_url_list"))
        .withColumn("domains", domains)
        .withColumn("n_urls", F.size("_url_list").cast("long"))
        .drop("_url_list")
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-style filters of
    Rae et al. 2021, §A1.1): highly repetitive documents — boilerplate,
    scraped navigation, degenerate generations — are poison for
    training corpora and invisible to length/stopword heuristics.

    All pure Column expressions over the document's own content:

    - ``dup_line_frac``: 1 - distinct/total over newline-split lines
      (0.0 for single-line docs);
    - ``top_2gram_frac``: occurrences of the most frequent token
      2-gram / total 2-grams (0.0 when fewer than 2 tokens);
    - ``is_repetitive``: either signal past the published thresholds
      (dup lines > 0.30, top 2-gram > 0.20).

    The 2-gram mode is computed per row as distinct x occurrences —
    O(d*n) in the document's own size, embarrassingly parallel, no
    shuffle; an exploded groupBy would shuffle every 2-gram of the
    corpus to count within one document."""
    lines = F.expr(
        f"filter(split({text_col}, '\\n'), l -> trim(l) != '')"
    )
    dup_line_frac = F.when(
        F.size(lines) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double")
        / F.size(lines).cast("double"),
    ).otherwise(F.lit(0.0))
    # The < 2 guard is load-bearing twice over: sequence(0, -1) infers
    # a NEGATIVE step (yielding [0, -1], not []), and the lambda would
    # then index past the array — an ANSI runtime error.
    grams = F.expr(
        "CASE WHEN _rs_toks IS NULL OR size(_rs_toks) < 2 "
        "THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE transform(sequence(0, size(_rs_toks) - 2), "
        "i -> concat(_rs_toks[i], ' ', _rs_toks[i + 1])) END"
    )
    top_2gram_frac = F.when(
        F.size(F.col("_rs_grams")) > 0,
        F.expr(
            "array_max(transform(array_distinct(_rs_grams), "
            "g -> size(filter(_rs_grams, x -> x = g))))"
        ).cast("double")
        / F.size(F.col("_rs_grams")).cast("double"),
    ).otherwise(F.lit(0.0))
    # Same phantom-empty-token filter as chunk_documents: edge
    # whitespace makes tokens() emit '' entries, and a gram containing
    # '' would count repetition that no real token stream has (a
    # whitespace-only doc would otherwise score top_2gram_frac = 1.0).
    toks = F.filter(tokens(text_col), lambda t: t != "")
    return (
        df.withColumn("_rs_toks", toks)
        .withColumn("_rs_grams", grams)
        .withColumn("dup_line_frac", dup_line_frac)
        .withColumn("top_2gram_frac", top_2gram_frac)
        .withColumn(
            "is_repetitive",
            (F.col("dup_line_frac") > 0.30)
            | (F.col("top_2gram_frac") > 0.20),
        )
        .drop("_rs_toks", "_rs_grams")
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 256,
    overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-length-bound preprocessing step of a training pipeline
    (each chunk fits a model's window; the overlap preserves cross-
    boundary context).

    Chunks are windows over the NORMALIZED token stream (``tokens``:
    lowercased, whitespace-collapsed, with the phantom empty tokens
    that edge whitespace produces filtered out), not byte offsets into
    the raw text — chunk_text joins tokens with single spaces, the way
    a tokenizer-fed pipeline consumes them. Callers needing the
    original casing/spacing should chunk by character ranges instead.
    NULL or empty text is one empty chunk row (``n_chunk_tokens`` 0)
    rather than silently vanishing from the output.

    1-in/N-out entirely in Column expressions: tokenize once, build the
    chunk-start sequence with ``sequence`` (stride = size - overlap),
    ``posexplode`` it, and slice the token array per chunk — no Python
    in the loop, and the explode is a map-side expansion (no shuffle).
    Short documents yield exactly one chunk. Chunk count per doc is
    ceil((n_tokens - overlap) / stride), matching the trailing partial
    chunk a tokenizer-based pipeline keeps.

    Output: one row per chunk — (id, chunk_idx, chunk_text,
    n_chunk_tokens) plus the carried-through input columns."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # split('', '\\s+') yields [''] and edge whitespace yields phantom
    # '' tokens — filter them so counts and windows see real tokens.
    toks = F.filter(
        F.coalesce(tokens(text_col), F.expr("CAST(array() AS ARRAY<STRING>)")),
        lambda t: t != "",
    )
    starts = F.expr(
        f"sequence(0, greatest(size(_toks) - {overlap} - 1, 0), {stride})"
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn("_starts", starts)
        .select(
            "*",
            F.posexplode("_starts").alias("chunk_idx", "_start"),
        )
        .withColumn(
            "chunk_text",
            F.concat_ws(
                " ", F.expr(f"slice(_toks, _start + 1, {chunk_size})")
            ),
        )
        .withColumn(
            "n_chunk_tokens",
            F.least(
                F.size("_toks") - F.col("_start"), F.lit(chunk_size)
            ).cast("long"),
        )
        .drop("_toks", "_starts", "_start")
    )


#: (pattern, replacement) pairs for the PII scrubber, applied in order.
#: Deliberately conservative patterns: emails, IPv4 addresses,
#: dash-formatted card numbers, 13+-digit runs, then phones.
#: Order is load-bearing: the phone pattern is the greediest digit
#: matcher, so the more specific shapes must claim their text first
#: (an IP or card number would otherwise half-match as a phone,
#: leaking the unmatched digits). Both the card and phone patterns
#: require unambiguous separators (``-``/``.``/parens/leading ``+``):
#: bare digit runs (epoch timestamps, record ids), space-separated
#: digit groups (``1914 1918 1939 1945``, ``4111 1111 1111 1111``),
#: year ranges followed by a count (``2023-2024 1500 staff``), and
#: groups spanning a sentence boundary all pass through verbatim, at
#: the cost of missing space-formatted phones/cards. That trade favors
#: corpus fidelity: an unredacted number is recoverable by a later,
#: stricter pass; a redacted year list or timestamp is data loss.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{4}-\d{4}-\d{4}-\d{1,7}\b", "<NUMBER>"),
    (r"\b\d{13,}\b", "<NUMBER>"),
    (
        r"\+\d{7,15}"
        r"|(?:\+\d{1,3}[-. ]?)?(?:\(\d{2,4}\)[-. ]?|\d{2,4}[-.])\d{3,4}[-.]\d{3,4}",
        "<PHONE>",
    ),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Regex PII redaction (emails, IPv4, long digit runs, phone
    numbers) — the standard pre-training hygiene pass. A chain of
    ``regexp_replace`` Column expressions, so the whole scrub runs
    inside whole-stage codegen; patterns apply in declaration order
    (see PII_PATTERNS — specific shapes before the greedy phone one).
    """
    col: Column = F.col(text_col)
    for pattern, replacement in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, replacement)
    return df.withColumn(out_col, col)
