"""Corpus admission filtering (north star): the rule-driven keep/drop
pass every curation pipeline runs — domain blocklists, quality
thresholds — plus the one-row corpus report card that makes a 100 TB
run auditable.

Shapes: blocklists are small dimensions (thousands to low millions of
domains) → broadcast semi/anti-joins against the exploded per-doc
domain arrays; threshold filters are pure Column predicates that push
down onto the scan; the report card is a single map-side-combined
aggregate emitting one row regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.functions.portable import nonempty_tokens
from redis_lsm_timeseries_spark.operators.dedup import content_digest
from redis_lsm_timeseries_spark.operators.text import with_urls


def filter_by_domain_blocklist(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "drop",
) -> DataFrame:
    """Drop (or keep, ``mode='keep'`` for allowlist audits) documents
    citing any blocklisted domain.

    ``blocklist`` is a one-column relation of lowercased domains
    (``www.``-less, port-less — the normalization ``with_urls``
    applies). Documents with no URLs never match, so ``drop`` keeps
    them and ``keep`` drops them.

    Plan: explode each doc's distinct domains, broadcast-join the
    blocklist, reduce to a per-doc verdict, then LEFT SEMI / ANTI join
    the verdict back — the corpus body (the wide text column) crosses
    no shuffle; only (id, domain) pairs do, and even those collapse
    map-side to (id) before the join back."""
    if mode not in ("drop", "keep"):
        raise ValueError(f"mode must be 'drop' or 'keep', got {mode!r}")
    bl = blocklist.select(
        F.lower(F.col(blocklist.columns[0])).alias("_bl_domain")
    ).distinct()
    hits = (
        with_urls(df.select(id_col, text_col), text_col)
        .select(
            id_col,
            F.explode(F.array_distinct("domains")).alias("_bl_domain"),
        )
        .join(F.broadcast(bl), "_bl_domain")
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if mode == "drop" else "left_semi"
    return df.join(hits, [id_col], how)


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    exact: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """One-row corpus report card: document and token totals, length
    distribution, language/source breadth, and duplicate-content rate.
    The number a pipeline owner reads before and after every curation
    stage.

    Default is ``approx_count_distinct`` (HyperLogLog++, ~2% rsd) for
    the three distinct counts: this report runs before and after EVERY
    stage, and exact distincts force an expand + full shuffle of
    (digest, lang, source) tuples at corpus scale, while the HLL
    sketches fold map-side into a one-row exchange (``rsd`` tunes the
    sketch's relative error). ``exact=True`` keeps the exact counts
    for tests and small corpora. ``dup_rate`` is clamped at 0 — an
    over-estimated distinct count would otherwise report a small
    negative rate."""
    n_tok = F.size(nonempty_tokens(text_col)).cast("long")
    digest = content_digest(text_col)

    def distinct(col: str):
        return (
            F.countDistinct(col)
            if exact
            else F.approx_count_distinct(col, rsd=float(rsd))
        )

    return df.select(
        F.col(lang_col),
        F.col(source_col),
        n_tok.alias("_nt"),
        digest.alias("_dg"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.min("_nt").cast("long").alias("min_tokens"),
        F.expr("percentile_approx(_nt, 0.5)").cast("long").alias(
            "median_tokens"
        ),
        F.max("_nt").cast("long").alias("max_tokens"),
        distinct(lang_col).cast("long").alias("n_langs"),
        distinct(source_col).cast("long").alias("n_sources"),
        distinct("_dg").cast("long").alias("n_distinct_contents"),
        F.greatest(
            F.lit(0.0),
            F.lit(1.0)
            - distinct("_dg").cast("double")
            / F.count(F.lit(1)).cast("double"),
        ).alias("dup_rate"),
    )


def corpus_report_by(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...] = ("source",),
    text_col: str = "text",
    exact: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """The report card per group (source, language, split, ...): one
    row per distinct ``group_cols`` tuple with document/token totals,
    length distribution, and duplicate-content rate WITHIN the group.
    The per-source view is what a mixing decision actually reads —
    the global one-row card hides a single bad source.

    Same plan shape as ``corpus_report``: one partial-aggregated pass,
    HLL distincts by default (no Expand), group count = output rows."""
    n_tok = F.size(nonempty_tokens(text_col)).cast("long")
    digest = content_digest(text_col)

    def distinct(col: str):
        return (
            F.countDistinct(col)
            if exact
            else F.approx_count_distinct(col, rsd=float(rsd))
        )

    return (
        df.select(
            *[F.col(c) for c in group_cols],
            n_tok.alias("_nt"),
            digest.alias("_dg"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("total_tokens"),
            F.min("_nt").cast("long").alias("min_tokens"),
            F.expr("percentile_approx(_nt, 0.5)").cast("long").alias(
                "median_tokens"
            ),
            F.max("_nt").cast("long").alias("max_tokens"),
            distinct("_dg").cast("long").alias("n_distinct_contents"),
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - distinct("_dg").cast("double")
                / F.count(F.lit(1)).cast("double"),
            ).alias("dup_rate"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions, content-aware: one
    row per document id present in either, with a verdict —
      'added'     id only in new
      'removed'   id only in old
      'changed'   id in both, content digest differs
      'unchanged' id in both, identical content
    The audit a pipeline owner runs between curation runs ("what did
    this config change actually do?").

    Plan: each side reduces to (id, digest) map-side — the text never
    crosses the exchange — then one full outer join keyed by id.
    Output: (id, status, old_digest, new_digest)."""
    o = old.select(
        F.col(id_col), content_digest(text_col).alias("old_digest")
    )
    n = new.select(
        F.col(id_col), content_digest(text_col).alias("new_digest")
    )
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(
            F.col("old_digest") == F.col("new_digest"), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, id_col, "full_outer")
        .withColumn("status", status)
        .select(id_col, "status", "old_digest", "new_digest")
    )
