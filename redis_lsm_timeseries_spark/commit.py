"""TableCommit — the atomic-commit seam for maintenance jobs.

The reference gets mark/ack atomicity from Redis running each Lua
script single-threaded (``enqueue-purge.lua:1-28``,
``ack-purge.lua:1-28``); a lakehouse deployment gets it from the table
format's optimistic commit protocol. This seam isolates every place
the engine needs transactional table semantics so the storage protocol
is swappable without touching the maintenance logic in ``tiering.py``:

=====================  ==========================  =====================
operation              ParquetLeaseCommit          Delta / Iceberg
=====================  ==========================  =====================
maintenance_lock       lease file (O_EXCL +        optimistic commit w/
                       nonce read-back)            conflict detection
append_rows            parquet append (one         transactional append
                       commit per job)
overwrite_partitions   dynamic partition           MERGE / replaceWhere
                       overwrite
drop_partition_dir     recursive delete            DELETE WHERE
snapshot_rewrite       write-tmp + two renames     OPTIMIZE / rewrite
                       (+ crash repair)            under snapshot
                                                   isolation
=====================  ==========================  =====================

``ParquetLeaseCommit`` is the default and preserves the exact protocol
the engine has shipped since round 5 — correct under the enforced
single-writer maintenance regime, with crash repair for the one
non-atomic window (the two-rename swap). A Delta/Iceberg
implementation would make each method a single table transaction and
turn ``maintenance_lock`` into a no-op (the commit itself detects
conflicts).
"""

from __future__ import annotations

import json
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame

from redis_lsm_timeseries_spark.errors import ConcurrentMaintenanceError

LEASE_FILE = "_maintenance_lease"
TMP_SUFFIX = ".compact-tmp"
OLD_SUFFIX = ".compact-old"


def _now_ms() -> int:
    return int(time.time() * 1000)


class TableCommit:
    """Interface. Subclasses provide the five operations above; every
    maintenance entry point in ``tiering.py`` routes through the
    store's instance (``store.commit``)."""

    @contextmanager
    def maintenance_lock(self, store, ttl_s: float = 900.0,
                         now_ms: int | None = None):
        raise NotImplementedError

    def append_rows(self, store, rows: list[tuple], schema, path: str) -> None:
        raise NotImplementedError

    def overwrite_partitions(
        self, store, df: DataFrame, path: str, partition_cols
    ) -> None:
        raise NotImplementedError

    def drop_partition_dir(self, store, path: str) -> None:
        raise NotImplementedError

    def snapshot_rewrite(self, store, path: str, write_snapshot) -> None:
        raise NotImplementedError

    def repair_interrupted_rewrite(self, store, path: str) -> None:
        raise NotImplementedError


class ParquetLeaseCommit(TableCommit):
    """Plain-Parquet implementation: lease-file mutual exclusion +
    directory-level commit idioms. See the module docstring for the
    lakehouse drop-in mapping."""

    @contextmanager
    def maintenance_lock(
        self, store, ttl_s: float = 900.0, now_ms: int | None = None
    ):
        """Single-writer guard for the maintenance jobs.

        Mechanics: atomic create-if-absent of
        ``{base}/_maintenance_lease`` through the fs seam (local
        ``O_EXCL``; conditional put on object stores). A lease older
        than its ``ttl_s`` horizon is presumed crashed and stolen.
        Steal = remove + re-create, which is NOT atomic (a second
        stealer's remove can delete the lease the first just created),
        so the create result alone is never trusted: after every
        acquisition the lease is READ BACK and must carry this
        acquisition's unique nonce, else the acquisition lost and
        raises. Release is guarded the same way — the file is removed
        only while it still holds this acquisition's nonce, so an
        expired holder exiting late cannot delete a stealer's fresh
        lease. A read-back/act window remains (this is a best-effort
        local-FS guard); a lakehouse deployment replaces the file with
        the table format's optimistic commit. Reentrant per store
        instance (``compact`` calls ``compact_purge_log``), and a
        lease left by a crashed run of the SAME instance re-acquires
        immediately."""
        store._require_init()
        depth = getattr(store, "_lease_depth", 0)
        if depth > 0:
            store._lease_depth = depth + 1
            try:
                yield
            finally:
                store._lease_depth -= 1
            return
        path = f"{store.config.base_path}/{LEASE_FILE}"
        if now_ms is None:
            now_ms = _now_ms()
        nonce = uuid.uuid4().hex
        payload = json.dumps(
            {
                "holder": store.writer_id,
                "nonce": nonce,
                "expires_ms": now_ms + int(ttl_s * 1000),
            }
        )

        def _held_by_me() -> bool:
            try:
                cur = json.loads(store.fs.read_text(path))
            except Exception:
                return False
            return (
                cur.get("holder") == store.writer_id
                and cur.get("nonce") == nonce
            )

        if not store.fs.create_exclusive(path, payload):
            try:
                cur = json.loads(store.fs.read_text(path))
            except Exception:
                # Vanished mid-race (holder just released) or
                # unreadable: fall through to the steal path, whose
                # read-back is the real arbiter.
                cur = None
            if (
                cur is not None
                and cur.get("holder") != store.writer_id
                and now_ms <= cur.get("expires_ms", 0)
            ):
                raise ConcurrentMaintenanceError(
                    f"maintenance lease held by {cur.get('holder')!r} "
                    f"until {cur.get('expires_ms')} (now {now_ms})"
                )
            store.fs.remove_file(path)
            store.fs.create_exclusive(path, payload)
        # Arbiter for every acquisition path: whatever create_exclusive
        # returned, we own the lease only if the file now carries OUR
        # nonce.
        if not _held_by_me():
            raise ConcurrentMaintenanceError(
                "lost the lease-steal race for " + path
            )
        store._lease_depth = 1
        try:
            yield
        finally:
            store._lease_depth = 0
            if _held_by_me():
                store.fs.remove_file(path)

    def append_rows(self, store, rows, schema, path: str) -> None:
        """One appended file per call — the one-stream-entry-per-Lua-
        call analog. Single-slice parallelize, NOT
        ``createDataFrame(rows).coalesce(1)``: createDataFrame spreads
        even a 4-row list over defaultParallelism partitions, and
        coalesce(1) then evaluates all 32 Python input partitions
        serially in one task (~0.15 s of worker round-trips each —
        measured 4.5 s per append). One input slice = one task."""
        rdd = store.spark.sparkContext.parallelize(rows, 1)
        df = store.spark.createDataFrame(rdd, schema)
        df.write.mode("append").parquet(path)

    def overwrite_partitions(self, store, df, path, partition_cols) -> None:
        """Dynamic partition overwrite: only partitions present in
        ``df`` are replaced. Set per-write (not just session-wide) —
        with a static-overwrite session default this writer would
        silently DELETE every other partition. On Delta this whole
        method is ``MERGE ... WHEN MATCHED`` / ``replaceWhere``."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    def drop_partition_dir(self, store, path: str) -> None:
        """Remove one partition directory (dynamic overwrite rewrites
        only partitions present in the output, so emptied ones are
        dropped explicitly). On a lakehouse table: DELETE WHERE."""
        store.fs.remove_tree(path)

    def snapshot_rewrite(self, store, path: str, write_snapshot) -> None:
        """Replace a table directory with a freshly-written snapshot,
        keeping a full copy on disk at every instant: write the
        snapshot to ``<path>.compact-tmp`` (via the ``write_snapshot``
        callback), rename live -> ``.compact-old``, rename tmp ->
        live, delete old. ``repair_interrupted_rewrite`` completes or
        rolls back a swap that crashed between the renames. Runs only
        under the maintenance lock."""
        tmp, old = path + TMP_SUFFIX, path + OLD_SUFFIX
        store.fs.remove_tree(tmp)
        store.fs.remove_tree(old)
        write_snapshot(tmp)
        store.fs.rename(path, old)
        store.fs.rename(tmp, path)
        store.fs.remove_tree(old)

    def repair_interrupted_rewrite(self, store, path: str) -> None:
        """Complete or roll back a ``snapshot_rewrite`` that crashed
        between its two renames (live dir absent; pre-swap copy at
        ``.compact-old``). Without this, the next append would
        recreate the live dir holding only the new rows, after which
        readers stop falling back to ``.compact-old`` and all
        pre-rewrite state is silently dropped. Callers hold the
        maintenance lock, so the renames cannot race another
        repairer."""
        tmp, old = path + TMP_SUFFIX, path + OLD_SUFFIX
        if store.fs.exists(path):
            return
        if store.fs.exists(tmp) and store.fs.exists(f"{tmp}/_SUCCESS"):
            # The snapshot committed: roll the swap forward.
            store.fs.rename(tmp, path)
            store.fs.remove_tree(old)
        elif store.fs.exists(old):
            # Snapshot incomplete or already promoted-and-lost: roll
            # back.
            store.fs.remove_tree(tmp)
            store.fs.rename(old, path)


DEFAULT_COMMIT = ParquetLeaseCommit()
