"""Skew handling for bucket-local self-joins (salting).

The LSH band self-joins (MinHash bands in ``dedup.lsh_candidate_pairs``,
hyperplane bands in the embedding near-dup pipeline) shuffle on a bucket
key. On boilerplate-heavy corpora many documents collapse into a few
buckets, and a bucket of m members costs O(m^2) pair work inside ONE
task — the classic hot-key skew that a 100 TB dedup run hits first.

Two mitigations compose here:

1. **AQE skew-join** (on by default, ``session.py``): splits oversized
   shuffle partitions at runtime and replicates the matching partition
   on the other side. Works for sort-merge joins without code changes —
   the first line of defense.
2. **Explicit salting** (this module): deterministically split each hot
   bucket's pair-space across ``num_salts`` sub-buckets BEFORE the
   shuffle, so no single task ever owns a whole hot bucket. Use when a
   planted/known skew profile exceeds what AQE's partition splitting can
   rebalance (AQE splits by partition size; salting splits the quadratic
   pair enumeration itself).

The salting scheme for a self-join producing unordered pairs (a, b):

- the LEFT side gets one salt per row: ``salt(a) = hash(a) mod S``;
- the RIGHT side is replicated S times with salts 0..S-1;
- the join adds ``_salt`` to the equi-join keys.

Every pair (a, b) sharing a bucket still matches EXACTLY once per
bucket — via the right-side replica whose salt equals ``salt(a)`` — so
the result set is bit-identical to the unsalted join; only the task
granularity changes. A bucket of m rows becomes S tasks of ~(m/S) x m
work at the cost of shuffling the right side S times. Salt derivation
uses Spark's xxhash64 — it never appears in the output, so it needs no
oracle portability.

Reference scale note: the reference engine caps partitions at 2,000
members by admission control (``index.js:12``) and never joins, so it
cannot hit this; the north-star dedup operators can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALTS = 8


def salted_pair_sides(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_id_col: str,
    num_salts: int = 1,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Prepare the two sides of a bucket-local pair self-join with
    optional salting.

    Returns ``(left', right', join_keys)``. With ``num_salts <= 1`` the
    inputs pass through unchanged (AQE-only posture). Otherwise the left
    side gains a deterministic ``_salt`` column and the right side is
    exploded into ``num_salts`` replicas, one per salt value; join on
    the returned keys and the output rows are identical to the unsalted
    join (each bucket-sharing pair matches exactly once per bucket).
    """
    if num_salts <= 1:
        return left, right, keys
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(left_id_col)), F.lit(num_salts)).cast("int"),
    )
    r = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    return l, r, keys + ["_salt"]
