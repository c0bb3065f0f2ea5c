"""Continuous rollups: incrementally-maintained time-bucket aggregates
over the store — the TimescaleDB "continuous aggregate" surface the
reference's consumers reach for once dashboards arrive, built on the
engine's own maintenance machinery.

Why incremental is correct here: the store's logical content (hot ∪
cold, member-identity-deduped, LWW-merged) only changes through writes,
and every write carries an ``ingest_ts`` — eviction moves rows between
tiers without changing the logical view (``test/consumer-test.js``'s
no-data-loss posture), and compaction rewrites keep LWW winners. So a
refresh needs to recompute exactly the (tag, bucket) groups touched by
members with ``ingest_ts`` past the last refresh watermark — work
proportional to the write rate, never a rescan of the corpus. An
update to an old key (late write, LWW supersede) re-touches its bucket
and the recompute re-derives that bucket from scratch, so updates and
tombstones are handled by construction, not by patch arithmetic.

100 TB shape: the new-member probe is one narrow (tag, ts, ingest_ts)
scan with the watermark predicate pushed down; the recompute reads
ONLY touched buckets via a broadcast semi-join on the (small) touched
set; the rollup table is partitioned by tag and rewritten via the
store's TableCommit seam (dynamic partition overwrite on touched tags
— on Delta/Iceberg, a MERGE). Numeric sums accumulate in DECIMAL and
surface as DOUBLE, so an incremental refresh is bit-identical to a
full recompute regardless of aggregation order.

All refreshes run under the namespace maintenance lease, like every
other mutation job (``tiering.py``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.lww import lww_latest
from redis_lsm_timeseries_spark.schema import MEMBER_IDENTITY_COLS
from redis_lsm_timeseries_spark.store import TimeseriesStore
from redis_lsm_timeseries_spark.tiering import maintenance_lease

META_NAME = "_rollup_meta.json"

#: exact, order-independent accumulation; cast to double on output
SUM_DECIMAL = "decimal(28,10)"


@dataclass(frozen=True)
class RollupMetrics:
    buckets_refreshed: int
    tags_touched: int
    watermark_ingest_ts: int


def _paths(store: TimeseriesStore, name: str) -> tuple[str, str]:
    base = f"{store.config.base_path}/rollups/{name}"
    return f"{base}/data", f"{base}/{META_NAME}"


def _raw_members(store: TimeseriesStore) -> DataFrame:
    """hot ∪ cold WITHOUT the identity dedup: the at-least-once
    duplicate window (same member snapshotted to cold but not yet
    acked out of hot) is still present. Use for aggregates that are
    INVARIANT under exact duplicates — max(ingest_ts), DISTINCT
    (tag, bucket) — where paying the full-corpus dedup shuffle would
    be pure waste."""
    return store.hot().unionByName(store.cold())


def _members(store: TimeseriesStore) -> DataFrame:
    """The logical member view: hot ∪ cold, exact duplicates dropped
    by identity — the same base relation
    ``read_range(include_cold=True)`` merges."""
    return _raw_members(store).dropDuplicates(MEMBER_IDENTITY_COLS)


def _bucket(step: int):
    return (F.col("ts") - F.pmod(F.col("ts"), F.lit(int(step)))).cast("long")


def _aggregate(winners: DataFrame, step: int) -> DataFrame:
    """Per-(tag, bucket) aggregate over LWW winners (tombstones —
    NULL-value winners — excluded, mirroring the read path). Values
    are opaque strings; numeric stats cover the castable subset."""
    # try_cast, not cast: values are OPAQUE strings (reference
    # semantics) and ANSI mode makes a plain cast throw on the first
    # non-numeric one; the numeric stats cover the castable subset
    num = F.col("value").try_cast("double")
    return (
        winners.where(F.col("value").isNotNull())
        .select(
            "tag",
            _bucket(step).alias("bucket_start"),
            F.col("value"),
            num.alias("_num"),
        )
        .groupBy("tag", "bucket_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("_num").cast("long").alias("n_numeric"),
            F.sum(F.col("_num").cast(SUM_DECIMAL))
            .cast("double")
            .alias("sum_num"),
            F.min("_num").alias("min_num"),
            F.max("_num").alias("max_num"),
        )
    )


def rollup_full(store: TimeseriesStore, step: int) -> DataFrame:
    """The full recompute — the semantic definition the incremental
    path must equal (and the test oracle for it)."""
    return _aggregate(lww_latest(_members(store)), step)


def refresh_rollup(
    store: TimeseriesStore, name: str, step: int
) -> RollupMetrics:
    """Create or incrementally refresh the named rollup.

    First call: full compute, persist, record the ingest watermark.
    Later calls: find members with ``ingest_ts`` past the watermark,
    recompute ONLY their (tag, bucket) groups, and rewrite only the
    touched tag partitions (old buckets of those tags carried over,
    touched buckets replaced — deletions of now-empty buckets
    included). Refreshing with a different ``step`` than the rollup
    was created with raises."""
    if step <= 0:
        raise ValidationError("step must be positive")
    store._require_init()
    with maintenance_lease(store):
        return _refresh_locked(store, name, int(step))


def _refresh_locked(
    store: TimeseriesStore, name: str, step: int
) -> RollupMetrics:
    data_path, meta_path = _paths(store, name)
    # Duplicate-invariant probes run on the RAW union — no full-corpus
    # identity-dedup shuffle for a watermark max or a distinct
    # touched-set; only the (touched-bucket-bounded) recompute slice
    # pays the dedup, after the semi-join has shrunk it.
    raw = _raw_members(store)
    # Watermark captured BEFORE the recompute scans, deliberately: a
    # write landing mid-refresh either misses this refresh entirely or
    # is partially seen, and in both cases its ingest_ts exceeds the
    # RECORDED watermark, so the next refresh re-touches its bucket —
    # at-least-once recompute, idempotent by construction. Capturing
    # the max afterwards could record a timestamp whose rows were
    # never aggregated.
    new_watermark = raw.agg(F.max("ingest_ts").alias("w")).first().w
    if new_watermark is None:
        new_watermark = -1

    if not store.fs.exists(meta_path):
        full = rollup_full(store, step).repartition("tag").localCheckpoint()
        n_buckets = full.count()
        n_tags = full.select("tag").distinct().count()
        if n_buckets:
            store.commit.overwrite_partitions(
                store, full, data_path, ["tag"]
            )
        store.fs.write_text(
            meta_path,
            json.dumps(
                {"step": step, "watermark_ingest_ts": int(new_watermark)}
            ),
        )
        return RollupMetrics(n_buckets, n_tags, int(new_watermark))

    meta = json.loads(store.fs.read_text(meta_path))
    if meta["step"] != step:
        raise ValidationError(
            f"rollup {name!r} was created with step={meta['step']}, "
            f"refresh requested step={step}"
        )
    w = meta["watermark_ingest_ts"]
    touched = (
        raw.where(F.col("ingest_ts") > F.lit(int(w)))
        .select("tag", _bucket(step).alias("bucket_start"))
        .distinct()
        .localCheckpoint()
    )
    n_touched = touched.count()
    if n_touched == 0:
        return RollupMetrics(0, 0, int(w))

    # Recompute ONLY touched buckets: raw members semi-joined on the
    # (small) touched set FIRST, identity-deduped on the shrunken
    # slice, LWW per key, re-aggregated.
    in_touched = (
        raw.withColumn("bucket_start", _bucket(step))
        .join(F.broadcast(touched), ["tag", "bucket_start"], "left_semi")
        .dropDuplicates(MEMBER_IDENTITY_COLS)
    )
    recomputed = _aggregate(lww_latest(in_touched), step)

    touched_tags = touched.select("tag").distinct()
    old = store.commit.read_table(store, data_path, recomputed.schema)
    # Touched tags' new content: untouched old buckets + recomputed
    # buckets (a touched bucket whose members became all-tombstone
    # simply has no recomputed row — the deletion case).
    carried = (
        old.join(F.broadcast(touched_tags), ["tag"], "left_semi")
        .join(F.broadcast(touched), ["tag", "bucket_start"], "left_anti")
    )
    merged = (
        carried.unionByName(recomputed)
        .repartition("tag")
        .localCheckpoint()  # materialize before overwriting its source
    )
    # Dynamic overwrite only rewrites tag partitions PRESENT in
    # merged: a touched tag whose every bucket emptied (fully
    # tombstoned) would otherwise keep its stale rollup rows — drop
    # those tag directories explicitly (bounded by touched tags).
    present = {r.tag for r in merged.select("tag").distinct().collect()}
    for r in touched_tags.collect():
        if r.tag not in present:
            store.commit.drop_partition_dir(
                store, f"{data_path}/tag={r.tag}"
            )
    if present:
        store.commit.overwrite_partitions(store, merged, data_path, ["tag"])
    store.fs.write_text(
        meta_path,
        json.dumps({"step": step, "watermark_ingest_ts": int(new_watermark)}),
    )
    return RollupMetrics(
        n_touched,
        touched_tags.count(),
        int(new_watermark),
    )


def read_rollup(store: TimeseriesStore, name: str) -> DataFrame:
    """The maintained rollup table (tag, bucket_start, n, n_numeric,
    sum_num, min_num, max_num)."""
    store._require_init()
    data_path, meta_path = _paths(store, name)
    if not store.fs.exists(meta_path):
        raise ValidationError(f"rollup {name!r} does not exist")
    empty = _aggregate(
        lww_latest(store.spark.createDataFrame([], store.hot().schema)),
        json.loads(store.fs.read_text(meta_path))["step"],
    )
    return store.commit.read_table(store, data_path, empty.schema)
