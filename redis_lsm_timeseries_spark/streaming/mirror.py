"""Continuous keyed mirror — a Structured Streaming materialized
view over a manifest table (r14).

The pull-based ``changefeed.mirror_changes(keys=...)`` applies the
row-level feed on whatever schedule the caller runs it; this module
closes the loop into a CONTINUOUS pipeline: the ``rlts_table``
change-feed stream (``readChangeFeed``) feeds a ``foreachBatch``
handler that applies each micro-batch's typed change rows to a
destination manifest table through the same netting + file-pruned
merge/delete machinery — so a mirror converges within a trigger
interval of every source commit, mutations included (merges, deletes,
deletion vectors), with routine maintenance invisible.

Exactly-once accounting: a per-app micro-batch cursor
(``stream-mirror:{app_id}``) rides the destination's app map. A
replayed batch whose id is at or below the cursor applies NOTHING;
a batch interrupted mid-apply replays its (idempotent, CAS-guarded)
merge/delete legs and then lands the cursor — the effect is
exactly-once even though a crash window can repeat idempotent work,
the same contract the pull-based mirror documents. Every
data-mutating commit carries the cursor CAS as an entry guard, so two
streams sharing an app_id conflict instead of double-applying.

Reference parity note: the reference has no derived-view machinery at
all (its read path recomputes per query, ``index.js:200-260``); this
is the lakehouse-tier continuous materialization the 100 TB story
needs — the Delta CDF + foreachBatch MERGE idiom, entirely on this
engine's own log and commit protocol.

100 TB shape: each micro-batch plans O(commits in range) of log JSON,
ships only the delta's insert + change files, nets per key (a shuffle
of the CHANGED rows only), and rewrites only destination files whose
stats overlap the changed keys."""

from __future__ import annotations

from redis_lsm_timeseries_spark.changefeed import (
    _apply_keyed_changes,
    _checked_transform,
    _net_changes,
)
from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit


def _cursor_key(app_id: str) -> str:
    return f"stream-mirror:{app_id}"


def make_mirror_batch_handler(
    spark,
    dst_path: str,
    keys: list[str],
    app_id: str = "stream-mirror",
    commit: ManifestCommit | None = None,
    transform=None,
):
    """The ``foreachBatch`` handler for a streaming keyed mirror —
    exposed separately so crash/replay semantics are directly
    testable (call it twice with one batch_id = a replay)."""
    commit = commit if commit is not None else ManifestCommit()
    host = CommitHost(spark)
    ckey = _cursor_key(app_id)

    def handle(batch_df, batch_id) -> None:
        bid = int(batch_id)
        cur = commit.read_app_meta(host, dst_path).get(ckey)
        if cur is not None and int(cur) >= bid:
            return  # replay of a fully-applied batch: exactly-once
        cas = {ckey: cur}
        if not commit.table_exists(host, dst_path):
            # first batch of a fresh mirror: the netted upserts land
            # WITH the cursor in one atomic entry — nothing to merge
            # against yet, deletes of absent keys are no-ops
            tcol, vcol = commit.CDF_TYPE_COL, commit.CDF_VERSION_COL
            upserts, _deletes = _net_changes(batch_df, keys, tcol, vcol)
            if transform is not None:
                upserts = _checked_transform(transform, upserts, keys)
            commit.append_table_with_meta(
                host, dst_path,
                upserts if not upserts.isEmpty() else None,
                {ckey: bid}, expected_app=cas,
            )
            return
        _apply_keyed_changes(
            host, commit, dst_path, keys, batch_df, ckey, bid, cas,
            transform,
        )

    return handle


def start_streaming_mirror(
    spark,
    src_path: str,
    dst_path: str,
    keys: list[str],
    checkpoint_dir: str,
    app_id: str = "stream-mirror",
    commit: ManifestCommit | None = None,
    transform=None,
    starting_version: str | int = "earliest",
    trigger_seconds: float = 0,
    **source_options,
):
    """Start the continuous keyed mirror: ``src_path``'s change-feed
    stream applied to ``dst_path`` every trigger. ``transform`` is the
    row-local reshape hook of ``mirror_changes`` (filtered-out rows
    become key deletes). ``starting_version="earliest"`` builds the
    mirror from the retained history's genesis replay (only while
    version 0 is retained — for an older source, batch-copy the
    snapshot and start from its version, the Delta backfill contract).
    Returns the ``StreamingQuery``."""
    from redis_lsm_timeseries_spark.sources.manifest_stream import (
        read_table_stream,
    )

    feed = read_table_stream(
        spark, src_path,
        readchangefeed="true",
        startingversion=str(starting_version),
        **source_options,
    )
    handle = make_mirror_batch_handler(
        spark, dst_path, keys, app_id=app_id, commit=commit,
        transform=transform,
    )
    return (
        feed.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
