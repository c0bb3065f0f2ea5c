"""Hot->cold tiering: the reference's purge pipeline (O8-O11).

Reference lifecycle (SURVEY.md §3.3): an atomic Lua script takes the K
coldest partitions from the RecentActivity ZSET, snapshots each to a
Redis stream and removes it from RecentActivity (mark-once,
``enqueue-purge.lua:1-28``); a consumer persists the snapshot to cold
storage; an ack script removes exactly the snapshotted members from the
hot partition, dropping the partition's index entry only when it
emptied (``ack-purge.lua:1-28``).

Spark re-expression — two idempotent maintenance jobs + an append-only
``purge_log`` Parquet table as the protocol state:

- ``purge_scan``  coldness aggregate over hot -> snapshot each selected
  partition to the cold tier (partitioned by purge_id for exact-member
  ack) -> append a ``marked`` log row. "Removed from RecentActivity"
  becomes a predicate: a partition is eligible iff it was never marked
  or has been written since its last mark (the reference re-registers a
  marked partition on write, ``index.js:81``).
- ``purge_ack``   idempotency-gated anti-join delete: rewrite the hot
  partition as ``hot EXCEPT snapshot`` (exact member identity, so data
  written after the mark survives — ``test/consumer-test.js:936-989``),
  drop the directory when it empties, append an ``acked`` log row.

Semantics consciously fixed vs the reference (SURVEY.md §2.2.5): the
idle threshold is in SECONDS, one unit everywhere (the reference
divides a ms input by 1000 into a seconds comparison, making its
default 0).

Atomicity: the reference gets it from Redis single-threading; here
every transactional table operation routes through the store's
``TableCommit`` seam (``commit.py``): the namespace maintenance LEASE
(enforced — concurrent maintenance raises
``ConcurrentMaintenanceError``), the dynamic partition overwrite, the
protocol-log append, and the crash-repairable snapshot swap. The
default ``ParquetLeaseCommit`` implements them on plain Parquet; a
lakehouse deployment drops in a Delta/Iceberg implementation (MERGE /
DELETE / optimistic commit) without touching the logic here.
"""

from __future__ import annotations

import functools
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.schema import (
    COLD_SNAPSHOT_SCHEMA,
    LWW_ORDER_COLS,
    MEMBER_IDENTITY_COLS,
    PURGE_LOG_SCHEMA,
    SAMPLE_SCHEMA,
)
from redis_lsm_timeseries_spark.store import TimeseriesStore


@dataclass(frozen=True)
class PurgeMark:
    purge_id: str
    tag: str
    part_start: int
    n_rows: int


def _now_ms() -> int:
    return int(time.time() * 1000)


# Re-exported for callers/tests that import it from here.
from redis_lsm_timeseries_spark.commit import LEASE_FILE  # noqa: E402, F401


@contextmanager
def maintenance_lease(
    store: TimeseriesStore, ttl_s: float = 900.0, now_ms: int | None = None
):
    """Single-writer guard for the maintenance jobs — every
    maintenance entry point (``purge_scan``, ``purge_ack_many``,
    ``compact``, ``compact_purge_log``) acquires the namespace lock
    first, so two jobs racing the same namespace fail fast with
    ``ConcurrentMaintenanceError`` instead of corrupting a partition
    overwrite. Delegates to the store's ``TableCommit`` seam (the
    default ``ParquetLeaseCommit.maintenance_lock`` documents the
    lease-file protocol; a lakehouse implementation makes this a no-op
    and lets the table format's optimistic commit detect conflicts)."""
    with store.commit.maintenance_lock(store, ttl_s=ttl_s, now_ms=now_ms):
        yield


def _serialized_maintenance(fn):
    """Run a maintenance entry point under the namespace lease."""

    @functools.wraps(fn)
    def wrapper(store, *args, **kwargs):
        with maintenance_lease(store):
            return fn(store, *args, **kwargs)

    return wrapper


def purge_log(store: TimeseriesStore) -> DataFrame:
    """The append-only protocol table (the purge stream analog). Reads
    as empty only when never written; other read failures propagate.
    The snapshot resolution (including the Parquet backend's
    mid-compaction ``.compact-old`` fallback and the manifest backend's
    versioned file list) lives in ``TableCommit.read_table``."""
    store._require_init()
    return store.commit.read_table(
        store, store.config.purge_log_path, PURGE_LOG_SCHEMA
    )


def cold_snapshots(store: TimeseriesStore) -> DataFrame:
    """The cold tier WITH its purge-snapshot id — the raw eviction
    payloads (``enqueue-purge.lua:17-18``'s serialized partitions).
    ``store.cold()`` is this minus the id column."""
    store._require_init()
    return store.commit.read_table(
        store, store.config.cold_path, COLD_SNAPSHOT_SCHEMA
    )


def _append_log(store: TimeseriesStore, rows: list[tuple]) -> None:
    store.commit.repair_interrupted_rewrite(
        store, store.config.purge_log_path
    )
    store.commit.append_rows(
        store, rows, PURGE_LOG_SCHEMA, store.config.purge_log_path
    )


@_serialized_maintenance
def purge_scan(
    store: TimeseriesStore,
    partition_age_threshold_s: float = 300.0,
    max_partitions_to_mark: int = 10,
    now_ms: int | None = None,
    size_trigger_rows: int | None = None,
) -> list[PurgeMark]:
    """Mark up to K coldest idle partitions for eviction (reference
    ``purgeScan`` -> ``enqueue-purge.lua``). Returns the marks (the
    reference returns stream ids).

    ``size_trigger_rows`` is the memory-pressure analog the reference
    sketches but never implements (``write`` returning ``used_memory``
    as a back-pressure hint, ``index.js:91-93``; ``recipe:44-45``;
    SURVEY.md §4 P10): when set, a partition holding at least that many
    rows is eligible regardless of idle age, so hot-but-oversized
    partitions can be tiered out under pressure.

    Scale shape: one partial-aggregated groupBy over the partition
    columns + ingest_ts (metadata-narrow scan), a broadcast-joined
    eligibility check against the tiny purge log, and a global
    TakeOrdered of K rows. The snapshot write is one partition-pruned
    scan over the marked partitions.
    """
    store._require_init()
    if max_partitions_to_mark < 1:
        raise ValidationError("max_partitions_to_mark must be >= 1")
    if partition_age_threshold_s < 0:
        raise ValidationError("partition_age_threshold_s must be >= 0")
    if size_trigger_rows is not None and size_trigger_rows < 1:
        raise ValidationError("size_trigger_rows must be >= 1")
    if now_ms is None:
        now_ms = _now_ms()

    hot = store.hot()
    activity = hot.groupBy("tag", "part_start").agg(
        F.max("ingest_ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n"),
    )

    # Last mark per partition; a partition is "in RecentActivity" iff
    # never marked or written after its last mark (index.js:81).
    last_marks = (
        purge_log(store)
        .where(F.col("status") == "marked")
        .groupBy("tag", "part_start")
        .agg(F.max("event_ts").alias("last_marked"))
    )
    idle_or_oversized = (
        F.lit(now_ms) - F.col("last_seen")
    ) >= F.lit(int(partition_age_threshold_s * 1000))
    if size_trigger_rows is not None:
        idle_or_oversized = idle_or_oversized | (
            F.col("n") >= F.lit(size_trigger_rows)
        )
    eligible = (
        activity.join(F.broadcast(last_marks), ["tag", "part_start"], "left")
        .where(
            (F.col("last_marked").isNull() | (F.col("last_seen") > F.col("last_marked")))
            & idle_or_oversized
        )
        .orderBy(F.col("last_seen").asc(), F.col("tag").asc(), F.col("part_start").asc())
        .limit(max_partitions_to_mark)
    )
    selected = eligible.collect()
    if not selected:
        return []

    marks = [
        PurgeMark(
            purge_id=uuid.uuid4().hex[:16],
            tag=row.tag,
            part_start=row.part_start,
            n_rows=row.n,
        )
        for row in selected
    ]
    # Snapshot every selected partition's CURRENT members in ONE write
    # job — the exact sets the ack will remove (enqueue-purge.lua:17-18
    # serializes the whole partition into the stream entry). The mark
    # list is <= K rows, so the id assignment is a broadcast join; the
    # hot scan is partition-pruned to the marked partitions.
    mark_df = store.spark.createDataFrame(
        store.spark.sparkContext.parallelize(
            [(m.purge_id, m.tag, m.part_start) for m in marks], 1
        ),
        "purge_id string, tag string, part_start long",
    )
    snap = store.hot().join(F.broadcast(mark_df), ["tag", "part_start"])
    store.commit.append_partitioned(
        store,
        snap.select(
            "purge_id", *[f.name for f in SAMPLE_SCHEMA.fields]
        ).repartition("purge_id"),
        store.config.cold_path,
        ["purge_id", "tag", "part_start"],
    )
    _append_log(
        store,
        [(m.purge_id, m.tag, m.part_start, "marked", now_ms, m.n_rows) for m in marks],
    )
    return marks


def _hot_partition_prefixes(
    store: TimeseriesStore, parts: set[tuple], depth: int = 2
) -> list[str]:
    """Member-relative hive prefixes of the given partition-value
    tuples (``depth`` leading hive segments — (tag, part_start) pairs
    by default, tag-only with depth=1), derived from the manifest's
    OWN file paths (so hive ``%XX``-escaped values match byte-for-byte
    — a hand-built ``tag={tag}`` string would miss them)."""
    if not parts:
        return []
    from redis_lsm_timeseries_spark.commit import ManifestCommit

    want = {tuple(str(x) for x in t) for t in parts}
    prefixes: set[str] = set()
    for f in store.commit.member_files(store, store.config.hot_path) or []:
        segs = f.split("/")
        if len(segs) <= depth:
            continue
        vals = tuple(
            ManifestCommit._unescape_partition(s.partition("=")[2])
            for s in segs[:depth]
        )
        if vals in want:
            prefixes.add("/".join(segs[:depth]))
    return sorted(prefixes)


def purge_ack(
    store: TimeseriesStore, purge_id: str, now_ms: int | None = None
) -> bool:
    """Commit one eviction (reference ``purgeAck`` -> ``ack-purge.lua``).
    See ``purge_ack_many`` for semantics; this is the single-id form
    matching the reference API."""
    return purge_ack_many(store, [purge_id], now_ms=now_ms)[purge_id]


@_serialized_maintenance
def purge_ack_many(
    store: TimeseriesStore,
    purge_ids: list[str],
    now_ms: int | None = None,
    max_ids: int = 1000,
) -> dict[str, bool]:
    """Commit a batch of evictions in ONE delete job: remove exactly
    the snapshotted members from the hot partitions.

    Idempotent per id: maps to False if the purge id is unknown or
    already acked (``ack-purge.lua:7-8, 27``). Members written after
    the mark survive (``test/consumer-test.js:936-989``) because the
    delete is an anti-join on full member identity, not a partition
    drop. Hot partition directories are removed when they empty — the
    analog of dropping the tag-index entry for a vanished partition
    (``ack-purge.lua:21-23``).

    The reference acks one stream entry per Lua call; batching N acks
    into one partition-pruned anti-join + one dynamic-partition
    overwrite is the engine-level equivalent of its consumer loop, at
    1/N the job count. On a lakehouse table this whole function is one
    Delta ``MERGE ... WHEN MATCHED DELETE``."""
    store._require_init()
    # the ack's anti-join rewrites hot partitions — refuse under a
    # file-sink-managed L1 (see _require_l1_batch_writable)
    store._require_l1_batch_writable()
    if now_ms is None:
        now_ms = _now_ms()
    result = {pid: False for pid in purge_ids}
    # Dedupe while preserving order: a repeated id must ack (and log)
    # once, not write two 'acked' rows for one eviction.
    purge_ids = list(dict.fromkeys(purge_ids))
    # Bound the driver-side state like purge_scan's K bounds marks: the
    # ack map, the delete predicate, and the collect below are all
    # O(len(purge_ids)), so an unbounded request list is the one way
    # this job's driver memory scales with caller behavior.
    if len(purge_ids) > max_ids:
        raise ValueError(
            f"purge_ack_many: {len(purge_ids)} ids exceeds max_ids="
            f"{max_ids}; ack in batches (each batch is one delete job)"
        )

    # Aggregate the log BEFORE collecting: one row per requested id
    # regardless of log size, so a bloated log (many files / repeated
    # appends between compactions) cannot grow the collect past
    # len(purge_ids) rows. collect_set/max fold away duplicate rows the
    # append-only protocol may have accumulated.
    log = (
        purge_log(store)
        .where(F.col("purge_id").isin(list(purge_ids)))
        .groupBy("purge_id")
        .agg(
            F.collect_set("status").alias("statuses"),
            F.max(
                F.when(
                    F.col("status") == "marked",
                    F.struct("tag", "part_start", "n_rows"),
                )
            ).alias("mark"),
        )
    )
    states: dict[str, set] = {}
    marks: dict[str, tuple] = {}
    for r in log.collect():
        states[r.purge_id] = set(r.statuses)
        if r.mark is not None:
            marks[r.purge_id] = (r.mark.tag, r.mark.part_start, r.mark.n_rows)
    valid = [
        pid
        for pid in purge_ids
        if "marked" in states.get(pid, set()) and "acked" not in states[pid]
    ]
    if not valid:
        return result

    # Fold any L0 row-batch segments into the partitioned layout first:
    # the delete below rewrites L1 partition directories, and rows still
    # sitting in L0 (including writes made after the mark, which must
    # survive) have to be in those directories to be rewritten or kept.
    store.flush_l0()

    snapshot = (
        cold_snapshots(store)
        .where(F.col("purge_id").isin(valid))
        .select(*MEMBER_IDENTITY_COLS)
    )
    affected = {(marks[pid][0], marks[pid][1]) for pid in valid}
    part_pred = F.lit(False)
    for tag, part_start in affected:
        part_pred = part_pred | (
            (F.col("tag") == tag) & (F.col("part_start") == part_start)
        )
    hot_parts = store.hot().where(part_pred)
    if store.commit.tracks_changes(store, store.config.hot_path):
        # the manifest branch consumes the marked partitions TWICE
        # (the remainder anti-join and the evicted-rows semi-join for
        # the CDF) — materialize the slice once, lazily: the
        # nonempty-partition collect below is the materializing action
        # (r18, guide §2.3; single-consumer directory mode skips the
        # cache)
        hot_parts = hot_parts.localCheckpoint(eager=False)
    remainder = hot_parts.join(
        F.broadcast(snapshot), on=MEMBER_IDENTITY_COLS, how="left_anti"
    )
    # Materialize before overwriting the directories we just read
    # (Spark refuses / corrupts a self-overwrite otherwise). LAZY
    # checkpoint: the nonempty-partition collect right below is the
    # materializing action (r18, guide §1.2 — the r17 components
    # pattern), so the ack pays one job here instead of two; the
    # overwrite still reads materialized rows.
    remaining = remainder.select(
        *[f.name for f in SAMPLE_SCHEMA.fields]
    ).localCheckpoint(eager=False)
    nonempty = {
        (r.tag, r.part_start)
        for r in remaining.select("tag", "part_start").distinct().collect()
    }
    if store.commit.tracks_changes(store, store.config.hot_path):
        # Manifest backend: ONE atomic commit carries the partition
        # rewrites, the emptied-partition drops, AND the evicted rows
        # as typed CDF deletes — a keyed mirror of the hot table
        # consumes the eviction as O(evicted) row deletes instead of
        # a full resync, and no feed version ever shows a torn ack
        # (rows gone from one partition but not yet another).
        evicted = hot_parts.join(
            F.broadcast(snapshot), on=MEMBER_IDENTITY_COLS, how="left_semi"
        ).withColumn(store.commit.CDF_TYPE_COL, F.lit("delete"))
        n_rows = sum(marks[pid][2] for pid in valid)
        store.commit.overwrite_partitions(
            store,
            remaining if nonempty else None,
            store.config.hot_path,
            store.config.partition_cols,
            cdf_df=evicted.coalesce(max(1, min(32, n_rows // 1_000_000 + 1))),
            drop_prefixes=_hot_partition_prefixes(store, affected - nonempty),
        )
    else:
        for tag, part_start in affected - nonempty:
            # Partition fully evicted: dynamic overwrite rewrites only
            # partitions present in the output, so drop emptied ones
            # here.
            store.commit.drop_partition_dir(
                store,
                f"{store.config.hot_path}/tag={tag}/part_start={part_start}",
            )
        if nonempty:
            # Only the acked partitions' directories are replaced — see
            # ParquetLeaseCommit.overwrite_partitions for the per-write
            # dynamic-overwrite requirement.
            store.commit.overwrite_partitions(
                store, remaining, store.config.hot_path,
                store.config.partition_cols,
            )
    store.invalidate_hot_cache()
    _append_log(
        store,
        [
            (pid, marks[pid][0], marks[pid][1], "acked", now_ms, marks[pid][2])
            for pid in valid
        ],
    )
    for pid in valid:
        result[pid] = True
    return result


@_serialized_maintenance
def compact_purge_log(store: TimeseriesStore) -> int:
    """Snapshot the append-only purge log into a single file.

    Every ``purge_scan``/``purge_ack`` appends one small parquet file
    (one commit each, like the reference's one stream entry per Lua
    call), so after N maintenance cycles the log directory holds N
    files and every protocol read pays N file opens. The log is
    protocol metadata — two rows per eviction — so the whole table
    rewrites into one file; run via ``compact()``, the same maintenance
    job that does LWW segment hygiene.

    Swap order keeps a full copy on disk at every instant (the
    single-writer caveat in the module docstring applies — this is the
    maintenance job, not a concurrent writer): write the snapshot to a
    temp dir, rename live -> ``.compact-old``, rename temp -> live,
    delete old. ``purge_log`` falls back to ``.compact-old`` if a crash
    lands between the renames. Returns the number of data files
    replaced (0 = nothing to do)."""
    store._require_init()
    path = store.config.purge_log_path
    store.commit.repair_interrupted_rewrite(store, path)
    if not store.commit.table_exists(store, path):
        return 0
    n_files = store.commit.table_file_count(store, path)
    if n_files <= 1:
        return 0

    def write_snapshot(tmp: str) -> None:
        # Seam-routed read: the CURRENT committed snapshot regardless
        # of backend (directory vs manifest file list).
        (
            purge_log(store)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )

    store.commit.snapshot_rewrite(store, path, write_snapshot)
    return n_files


def _vacuum_locked(store: TimeseriesStore) -> dict:
    """Collect unreferenced physical files across every seam-managed
    table (purge log, cold snapshots, rollup stores). Deferred-delete
    backends (ManifestCommit) reclaim here; the directory backend's
    inherited no-op returns 0 everywhere. Caller holds the lease."""
    roots = [store.config.purge_log_path, store.config.cold_path]
    if store.commit.tracks_changes(store, store.config.hot_path):
        # manifest-hot mode (r13): L1 rewrites defer physical deletes
        # to vacuum like every other manifest table
        roots.append(store.config.hot_path)
    rollups_dir = f"{store.config.base_path}/rollups"
    if store.fs.exists(rollups_dir):
        roots.extend(
            f"{rollups_dir}/{name}/data"
            for name in store.fs.listdir(rollups_dir)
        )
    return {root: store.commit.vacuum(store, root) for root in roots}


@dataclass(frozen=True)
class CompactionMetrics:
    partitions_compacted: int
    rows_before: int
    rows_after: int


@_serialized_maintenance
def compact(
    store: TimeseriesStore, max_partitions: int | None = None
) -> CompactionMetrics:
    """LWW compaction: rewrite hot partitions that contain superseded
    members, keeping only each (tag, ts) key's LWW winner.

    The reference sketches exactly this as an open TODO
    (``recipe:43`` — "keep only the latest" when merging duplicate
    scores); reads are correct without it (the LWW merge runs at read
    time), so compaction is purely a storage/scan-cost maintenance job,
    like an LSM segment merge.

    Scale shape: one partial-aggregated duplicate-detection pass over
    (tag, part_start, ts); the rewrite then touches ONLY partitions
    that actually hold duplicates, selected via a broadcast semi-join
    on a small (tag, part_start) keys DataFrame — never a literal
    per-partition predicate, so neither the plan nor driver memory
    grows with the number of dirty partitions. ``max_partitions``
    bounds one run to the K partitions carrying the most superseded
    rows (like ``purge_scan``'s coldest-K); the rest compact on later
    runs. Tombstones (NULL-value winners) are KEPT: they still shadow
    older members in the cold tier on hot-union-cold reads.
    """
    store._require_init()
    store._require_l1_batch_writable()
    # Fold L0 row-batch segments into the partitioned layout first —
    # compaction IS the file-count hygiene for the chatty write() path,
    # and the duplicate rewrite below operates on L1 directories.
    store.flush_l0()
    # Same hygiene for the protocol table: one file per mark/ack append
    # otherwise accrues forever.
    compact_purge_log(store)
    # Under a manifest backend, rollup overwrites and retention drops
    # are manifest edits with deferred physical deletes — compaction
    # is the maintenance job that collects the orphans (no-op on the
    # directory backend, which deletes eagerly).
    _vacuum_locked(store)
    hot = store.hot()
    # One pass detects dup-holding partitions AND their row/key counts
    # (rows_before, dup excess) — a separate count() of the target
    # partitions would re-scan them.
    part_stats = (
        hot.groupBy("tag", "part_start", "ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("tag", "part_start")
        .agg(
            F.sum("n").alias("rows"),
            F.count(F.lit(1)).alias("keys"),
            F.max("n").alias("max_n"),
        )
        .where(F.col("max_n") > 1)
    )
    if max_partitions is not None:
        part_stats = (
            part_stats.orderBy(
                (F.col("rows") - F.col("keys")).desc(), "tag", "part_start"
            )
            .limit(max_partitions)
        )
    # Materialize once: at most K (or #dirty-partition) tiny rows —
    # reused for the semi-join keys AND the metrics aggregate. LAZY:
    # the totals aggregate right below doubles as the materializing
    # action (r18, guide §1.2 — one job, not two).
    part_stats = part_stats.localCheckpoint(eager=False)
    totals = part_stats.agg(
        F.count(F.lit(1)).alias("parts"), F.sum("rows").alias("rows")
    ).first()
    if totals.parts == 0:
        return CompactionMetrics(0, 0, 0)
    rows_before = totals.rows
    from redis_lsm_timeseries_spark.operators.lww import lww_latest

    target = hot.join(
        F.broadcast(part_stats.select("tag", "part_start")),
        ["tag", "part_start"],
        "left_semi",
    )
    winners = (
        lww_latest(target)
        .select(*[f.name for f in SAMPLE_SCHEMA.fields])
        .repartition("tag", "part_start")
        # lazy: the rows_after count below materializes it (the
        # checkpoint itself stays mandatory — the overwrite replaces
        # the directories this plan reads)
        .localCheckpoint(eager=False)
    )
    rows_after = winners.count()
    cdf = None
    if store.commit.tracks_changes(store, store.config.hot_path):
        # Tell row-level change feeds exactly which duplicates lost
        # the LWW race, staged ATOMICALLY with the rewrite: the
        # winners are content-identical to rows the feed already
        # delivered, so the change set nets to pure deletes and a
        # keyed mirror applies O(losers) work instead of a full
        # resync after every compaction pass. The anti-join keys on
        # the non-nullable member identity (key + full LWW order
        # tuple — `value` is nullable and equality-join-unsafe);
        # a physically duplicated identical member compacts with no
        # change rows, which is right: its content never changed.
        identity = ["tag", "ts", *LWW_ORDER_COLS]
        # losers come from the COMMITTED L1 snapshot, never the hot()
        # union: a leaseless write() landing rows in L0 mid-job must
        # not surface in the feed as deletes of rows the manifest
        # never held (they flush into L1 later, as inserts)
        l1 = store.commit.read_table(
            store, store.config.hot_path, SAMPLE_SCHEMA
        ).join(
            F.broadcast(part_stats.select("tag", "part_start")),
            ["tag", "part_start"],
            "left_semi",
        )
        losers = l1.join(
            winners.select(*identity), identity, "left_anti"
        ).withColumn(store.commit.CDF_TYPE_COL, F.lit("delete"))
        excess = max(0, rows_before - rows_after)
        cdf = losers.coalesce(max(1, min(32, excess // 1_000_000 + 1)))
    store.commit.overwrite_partitions(
        store, winners, store.config.hot_path,
        store.config.partition_cols, cdf_df=cdf,
    )
    store.invalidate_hot_cache()
    return CompactionMetrics(
        partitions_compacted=totals.parts,
        rows_before=rows_before,
        rows_after=rows_after,
    )


def purge_payload(store: TimeseriesStore, purge_id: str) -> DataFrame:
    """Decode a purge snapshot back into samples (reference
    ``parsePurgePayload``, ``index.js:350-355``), LWW-merged the same
    way a read would be (O6)."""
    from redis_lsm_timeseries_spark.operators.lww import lww_latest

    store._require_init()
    snap = (
        cold_snapshots(store)
        .where(F.col("purge_id") == purge_id)
        .select(*[f.name for f in SAMPLE_SCHEMA.fields])
    )
    return lww_latest(snap).select("tag", "ts", "value")


@dataclass(frozen=True)
class RetentionMetrics:
    partitions_dropped: int
    rows_dropped: int


@_serialized_maintenance
def apply_retention(
    store: TimeseriesStore,
    older_than_ms: int,
    drop_cold: bool = False,
    max_partitions: int = 10_000,
) -> RetentionMetrics:
    """Retention sweep (the TimescaleDB ``drop_chunks`` analog, and
    the hard-delete the reference sketches but never implements —
    ``recipe:22-23``): drop every HOT partition that lies ENTIRELY
    before the cutoff — ``part_start + W <= older_than_ms`` — as a
    whole-directory delete. A partition straddling the cutoff is
    KEPT in full: retention is partition-granular (chunk-granular in
    Timescale terms), never a row rewrite, so the sweep costs one
    metadata-narrow aggregate plus directory removals regardless of
    data volume.

    ``drop_cold=True`` extends the sweep to cold-tier snapshots whose
    partition lies before the cutoff (the archive is otherwise
    retained — tiering is not deletion). L0 is folded first so no
    pre-cutoff rows survive in the staging tier.

    Idempotent (a second sweep finds nothing) and serialized by the
    maintenance lease like every other mutation job. Interplay with
    the purge protocol: a marked-but-unacked partition that retention
    removes simply acks to an empty remainder later — the ack's
    anti-join sees no matching hot rows and the idempotency gate
    still records it.

    ``max_partitions`` bounds one run's driver-side state (the
    collected drop list), like ``purge_scan``'s coldest-K and
    ``compact``'s cap — oldest partitions drop first, the rest on
    later runs."""
    store._require_init()
    if older_than_ms < 0:
        raise ValidationError("older_than_ms must be >= 0")
    if max_partitions < 1:
        raise ValidationError("max_partitions must be >= 1")
    store._require_l1_batch_writable()
    w = store.config.partition_width
    store.flush_l0()
    doomed = (
        store.hot()
        .where(F.col("part_start") + F.lit(w) <= F.lit(int(older_than_ms)))
        .groupBy("tag", "part_start")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("part_start", "tag")
        .limit(int(max_partitions))
        .collect()
    )
    rows = sum(r.n for r in doomed)
    if doomed and store.commit.tracks_changes(store, store.config.hot_path):
        # manifest-hot (r13): ONE atomic commit drops every expired
        # partition and stages the dropped rows as typed CDF deletes —
        # a keyed mirror consumes retention as O(expired rows) instead
        # of a full resync, and no feed version shows a half-applied
        # sweep. The CDF read is bounded by what is being deleted
        # (exactly the mirror's delta), not the table.
        pairs = {(r.tag, r.part_start) for r in doomed}
        keys_df = store.spark.createDataFrame(
            sorted(pairs), "tag string, part_start long"
        )
        # committed L1 rows only (racing L0 rows were never in the
        # manifest; they flush later and survive as inserts)
        victims = store.commit.read_table(
            store, store.config.hot_path, SAMPLE_SCHEMA
        ).join(
            F.broadcast(keys_df), ["tag", "part_start"], "left_semi"
        ).withColumn(store.commit.CDF_TYPE_COL, F.lit("delete"))
        store.commit.overwrite_partitions(
            store,
            None,
            store.config.hot_path,
            store.config.partition_cols,
            cdf_df=victims.coalesce(max(1, min(32, rows // 1_000_000 + 1))),
            drop_prefixes=_hot_partition_prefixes(store, pairs),
        )
        store.invalidate_hot_cache()
    else:
        for r in doomed:
            store.commit.drop_partition_dir(
                store,
                f"{store.config.hot_path}/tag={r.tag}"
                f"/part_start={r.part_start}",
            )
        if doomed:
            store.invalidate_hot_cache()
    if drop_cold:
        cold_doomed = (
            cold_snapshots(store)
            .where(
                F.col("part_start") + F.lit(w) <= F.lit(int(older_than_ms))
            )
            .select("purge_id", "tag", "part_start")
            .distinct()
            .collect()
        )
        for r in cold_doomed:
            store.commit.drop_partition_dir(
                store,
                f"{store.config.cold_path}/purge_id={r.purge_id}"
                f"/tag={r.tag}/part_start={r.part_start}",
            )
    return RetentionMetrics(len(doomed), rows)


@dataclass(frozen=True)
class SeriesDeletionMetrics:
    hot_partitions_dropped: int
    cold_files_rewritten: int
    purge_log_rows_removed: int
    rollups_swept: int


@_serialized_maintenance
def delete_series(
    store: TimeseriesStore, tags: list[str]
) -> SeriesDeletionMetrics:
    """Erase every trace of the given tags across the WHOLE engine —
    hot tier, cold tier, purge log, and every rollup: the GDPR
    right-to-erasure path a 100 TB deployment eventually needs, which
    the reference (tags live inside Redis keys, ``index.js:121-122``)
    could only do with SCAN+DEL. Lease-serialized like every mutation
    job; idempotent (a second call finds nothing).

    Cost shape per tier:
    - hot: partition-dir drops — ``tag=X`` is a directory prefix, so
      erasure is metadata-only, no rewrite (L0 folded first so no
      staged rows survive);
    - cold: ``delete_rows`` on the manifest member — per-file tag
      stats (hive min==max) prune to exactly the tag's files, which
      drop without replacement (a cold file holds one partition of
      one tag);
    - purge log: the log ROWS name the tags (marked/acked history),
      so GDPR requires scrubbing them too — same stats-pruned
      row-level delete; an unacked mark for an erased tag simply
      acks to nothing later;
    - rollups: aggregates keyed by the tag are partition-dir drops;
      the watermark is untouched — erased rows cannot resurface
      because the base tiers no longer hold them.

    Erasure is physical only after ``vacuum``'s retention horizon
    passes (time-travel snapshots retain history by design — run
    ``vacuum(retain_versions=1)`` for immediate reclaim) and, on the
    hot tier, once streaming checkpoints replaying the erased range
    are gone; both are the documented deployment checklist, not
    engine gaps."""
    from redis_lsm_timeseries_spark.operators.merge import delete_rows

    store._require_init()
    store._require_l1_batch_writable()
    if not tags:
        return SeriesDeletionMetrics(0, 0, 0, 0)
    for t in tags:
        if not isinstance(t, str) or not t:
            raise ValidationError(f"delete_series: invalid tag {t!r}")
    store.flush_l0()

    # hot: drop each tag's partition directory tree
    hot_dropped = 0
    if store.commit.tracks_changes(store, store.config.hot_path):
        # manifest-hot (r13): a physical `{hot}/tag=X` probe would
        # MISS (data lives under the manifest's data/ root) and the
        # erasure would silently skip the hot tier. Resolve the tag's
        # committed files instead and erase them in ONE atomic commit
        # with typed CDF deletes — keyed mirrors consume the erasure
        # as O(erased rows).
        want = {str(t) for t in sorted(set(tags))}
        tag_prefixes = set(
            _hot_partition_prefixes(store, {(t,) for t in want}, depth=1)
        )
        # partition count = distinct 2-level prefixes under the tags
        part_prefixes = {
            "/".join(f.split("/")[:2])
            for f in store.commit.member_files(
                store, store.config.hot_path
            ) or []
            if f.split("/", 1)[0] in tag_prefixes and f.count("/") >= 2
        }
        if tag_prefixes:
            victims = store.commit.read_table(
                store, store.config.hot_path, SAMPLE_SCHEMA
            ).where(
                F.col("tag").isin(sorted(want))
            ).withColumn(store.commit.CDF_TYPE_COL, F.lit("delete"))
            store.commit.overwrite_partitions(
                store,
                None,
                store.config.hot_path,
                store.config.partition_cols,
                cdf_df=victims.coalesce(4),
                drop_prefixes=sorted(tag_prefixes),
            )
            hot_dropped = len(part_prefixes)
    else:
        for t in sorted(set(tags)):
            tag_dir = f"{store.config.hot_path}/tag={t}"
            if store.fs.exists(tag_dir):
                n_parts = len(store.fs.listdir(tag_dir))
                store.commit.drop_partition_dir(store, tag_dir)
                hot_dropped += n_parts
    if hot_dropped:
        store.invalidate_hot_cache()

    # cold + purge log: stats-pruned row-level deletes
    tag_df = store.spark.createDataFrame(
        [(t,) for t in sorted(set(tags))], "tag string"
    )
    from redis_lsm_timeseries_spark.commit import ManifestCommit

    cold_files = 0
    if store.commit.table_exists(store, store.config.cold_path):
        if isinstance(store.commit, ManifestCommit):
            st = delete_rows(
                store, store.config.cold_path, tag_df, ["tag"],
                commit=store.commit,
            )
            cold_files = max(0, st.files_rewritten)
        else:
            # directory mode: the cold layout is purge_id/tag/
            # part_start dirs — a tag erasure is a subtree drop per
            # snapshot, metadata-only and layout-preserving (a flat
            # row-rewrite would strip the hive dirs retention's
            # partition-granular sweep depends on)
            cp = store.config.cold_path
            for pid in sorted(store.fs.listdir(cp)):
                if not pid.startswith("purge_id="):
                    continue
                for t in sorted(set(tags)):
                    tdir = f"{cp}/{pid}/tag={t}"
                    if store.fs.exists(tdir):
                        store.commit.drop_partition_dir(store, tdir)
                        cold_files += 1
    log_removed = 0
    if store.commit.table_exists(store, store.config.purge_log_path):
        # metadata-first count: when every log file's stats PROVE its
        # match count (tag-clustered files), no scan runs; anything
        # unprovable falls back to the exact scan
        before = None
        if isinstance(store.commit, ManifestCommit):
            from redis_lsm_timeseries_spark.maintenance import fast_count

            before = fast_count(
                store, store.config.purge_log_path,
                {"tag": {str(t) for t in tags}},
                commit=store.commit,
            )
        if before is None:
            before = purge_log(store).where(
                F.col("tag").isin([str(t) for t in tags])
            ).count()
        if before:
            delete_rows(
                store, store.config.purge_log_path, tag_df, ["tag"],
                commit=store.commit,
            )
        log_removed = int(before)

    # rollups: tag-keyed partition drops in every maintained rollup
    swept = 0
    rollup_base = f"{store.config.base_path}/rollups"
    if store.fs.exists(rollup_base):
        for name in sorted(store.fs.listdir(rollup_base)):
            data_path = f"{rollup_base}/{name}/data"
            touched = False
            for t in sorted(set(tags)):
                tdir = f"{data_path}/tag={t}"
                if store.commit.table_exists(store, data_path):
                    store.commit.drop_partition_dir(store, tdir)
                    touched = True
            if touched:
                swept += 1
    return SeriesDeletionMetrics(
        hot_dropped, cold_files, log_removed, swept
    )
