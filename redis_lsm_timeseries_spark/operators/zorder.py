"""Z-order (Morton) clustering for multi-column data skipping.

Range clustering on ONE key gives that key tight per-file min/max
stats and the manifest prunes beautifully — on that key alone. A
second predicate column sees every file spanning its full domain and
prunes nothing. Interleaving the bits of several columns' normalized
ranks (the Morton curve) trades a little per-column tightness for
locality in ALL of them: a file covering a contiguous Z-range covers a
small hyper-rectangle, so min/max stats prune on EVERY interleaved
column — the Delta ``OPTIMIZE ZORDER BY`` idiom, here as a plain
column expression plus a seam-routed rewrite.

Scale posture: the Z-key is pure Column arithmetic (shift/mask/or —
whole-stage codegen, no UDF), normalization bounds come from ONE
narrow min/max aggregate (or caller-supplied at 100 TB, where bounds
are usually known), and the rewrite is a standard
``repartitionByRange`` + ``snapshot_rewrite`` — the same machinery
every other compaction uses. Linear rank scaling assumes roughly
uniform value spread between min and max; heavily skewed columns keep
correctness (the stats are still true bounds) but prune less —
quantile-based ranks would need a global sample and are not worth the
pass until a real workload shows the need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from redis_lsm_timeseries_spark.errors import ValidationError

#: bits of Z-key per interleaved column; 3 cols x 16 bits = 48-bit
#: key, comfortably inside a long
MAX_TOTAL_BITS = 60


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple],
    bits: int = 16,
) -> Column:
    """Morton key over ``cols``: each column scales linearly from its
    ``bounds`` (inclusive (lo, hi)) into a ``bits``-bit integer rank,
    and the ranks' bits interleave round-robin (column 0 owns bit
    positions 0, n, 2n, ...). NULLs rank 0 (they sort first, like a
    NULLS FIRST cluster). Values outside the bounds clamp — the key
    is a clustering aid, never a filter."""
    n = len(cols)
    if n < 2:
        raise ValidationError(
            "zorder_key needs >= 2 columns (use repartitionByRange "
            "for one)"
        )
    if n * bits > MAX_TOTAL_BITS:
        raise ValidationError(
            f"zorder_key: {n} cols x {bits} bits exceeds "
            f"{MAX_TOTAL_BITS} total"
        )
    ranks = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = bounds[c]
        lo_f, hi_f = float(lo), float(hi)
        span = hi_f - lo_f
        if span <= 0:
            ranks.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(lo_f))
            / F.lit(span)
            * F.lit(float(top))
        )
        rank = F.least(
            F.lit(top).cast("long"),
            F.greatest(F.lit(0).cast("long"), scaled.cast("long")),
        )
        ranks.append(F.coalesce(rank, F.lit(0).cast("long")))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, rank in enumerate(ranks):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """(min, max) per column in ONE narrow aggregate — the
    normalization bounds for ``zorder_key`` when the caller doesn't
    already know them. An all-NULL column gets (0, 0): its rank is
    constant and it contributes nothing to the interleave."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    r = df.agg(*aggs).first()
    out = {}
    for c in cols:
        lo, hi = r[f"_lo_{c}"], r[f"_hi_{c}"]
        out[c] = (0, 0) if lo is None else (lo, hi)
    return out


def zorder_rewrite(
    host,
    path: str,
    cols: list[str],
    target_files: int,
    bits: int = 16,
    bounds: dict[str, tuple] | None = None,
    commit=None,
) -> None:
    """Re-cluster the table at ``path`` along the Morton curve of
    ``cols`` — a compaction variant: content unchanged, file layout
    rewritten so per-file stats prune on every listed column. Commits
    through ``snapshot_rewrite`` (conflict-checked, crash-safe,
    retention-margin vacuum). Numeric columns only — the linear rank
    needs arithmetic; cluster strings by a leading numeric surrogate
    (e.g. their hash) or leave them to the residual filter."""
    from redis_lsm_timeseries_spark.commit import ManifestCommit

    commit = commit if commit is not None else ManifestCommit()
    cur = commit.read_table(host, path, None)
    for c in cols:
        if c not in cur.columns:
            raise ValidationError(f"zorder_rewrite: no column {c!r}")
    b = bounds if bounds is not None else column_bounds(cur, cols)
    clustered = (
        cur.withColumn("_zkey", zorder_key(cols, b, bits))
        .repartitionByRange(max(1, int(target_files)), "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
    commit.snapshot_rewrite(
        host, path,
        lambda tmp: clustered.write.mode("overwrite").parquet(tmp),
    )
