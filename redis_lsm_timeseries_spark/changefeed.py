"""Exactly-once change-feed consumption: mirror a manifest table's
appends into a derived table with the consumer's cursor committed
ATOMICALLY with the rows it produced.

The primitive pair is ``ManifestCommit.read_changes`` (the rows added
between two retained versions, as the immutable-file diff) and
``append_table_with_meta`` (rows + an ``app``-map update in ONE log
entry — the Delta ``txn`` action idiom). A consumer that records the
source version it just processed inside the same commit as its output
is exactly-once by construction: a crash before the commit leaves the
cursor unmoved (replay re-reads the same delta), a crash after leaves
both (replay reads an empty delta). No external checkpoint store, no
two-phase anything — the destination table IS the checkpoint.

This is the incremental-pipeline backbone at 100 TB: downstream jobs
(a rollup over a curated corpus, a replica for a different cluster
layout, a feature extractor) run on O(new data) per invocation, with
the full-resync path reserved for the one case the file diff cannot
express — a compaction/rewrite in the source history, surfaced as the
typed ``NonAppendHistoryError`` rather than silently double-counting.
"""

from __future__ import annotations

from dataclasses import dataclass

from redis_lsm_timeseries_spark.commit import ManifestCommit
from redis_lsm_timeseries_spark.errors import (
    NonAppendHistoryError,
    ValidationError,
    VersionNotFoundError,
)


@dataclass(frozen=True)
class MirrorMetrics:
    #: source version this run advanced the cursor to
    src_version: int
    #: rows appended to the mirror this run (-1: full resync, count
    #: not taken — the mirror equals the source snapshot)
    rows_mirrored: int
    #: "initial" | "incremental" | "resync" | "noop"
    mode: str


def _cursor_key(app_id: str) -> str:
    return f"mirror:{app_id}"


def mirror_changes(
    host,
    src_path: str,
    dst_path: str,
    app_id: str = "default",
    transform=None,
    commit: ManifestCommit | None = None,
) -> MirrorMetrics:
    """One mirroring step: append to ``dst_path`` exactly the rows
    added to ``src_path`` since this consumer's recorded cursor, and
    advance the cursor in the same atomic commit. Safe to call on any
    schedule; idempotent under replay; concurrent source commits are
    fine (the cursor pins the exact version range read).

    ``transform``, if given, maps the delta DataFrame before writing —
    the incremental-ETL hook (filter/project/enrich); it must be
    deterministic and row-local for the exactly-once accounting to
    mean what it says (an aggregation over the delta is fine too — it
    commits atomically — but only row-local transforms make the
    mirror's CONTENT equal a transform of the source snapshot).

    First call copies the source snapshot as-of its newest version
    ("initial"). A non-append source history (compaction, overwrite,
    partition drop since the cursor) triggers a full RESYNC: the
    mirror is rewritten from the current source snapshot and the
    cursor jumps forward — the documented fallback the typed error
    exists for."""
    commit = commit if commit is not None else ManifestCommit()
    versions = commit.table_versions(host, src_path)
    if not versions:
        raise ValidationError(
            f"mirror_changes: source {src_path!r} is not a "
            "manifest-managed table (no version log)"
        )
    latest = versions[-1]
    cursor = commit.read_app_meta(host, dst_path).get(_cursor_key(app_id))

    # Every commit below CASes on the cursor still holding the value
    # read above: two concurrent runs sharing an app_id both pass the
    # planning-time check, but only one can land — the other raises
    # RewriteConflictError instead of double-appending the same delta
    # (the Delta txn idiom's transactional version re-check).
    cas = {_cursor_key(app_id): cursor}

    if cursor is None:
        snap = commit.read_table(host, src_path, None, version=latest)
        out = transform(snap) if transform is not None else snap
        n = out.count()
        commit.append_table_with_meta(
            host, dst_path, out, {_cursor_key(app_id): latest},
            expected_app=cas,
        )
        return MirrorMetrics(latest, n, "initial")

    since = int(cursor)
    if since == latest:
        return MirrorMetrics(latest, 0, "noop")
    if since > latest:
        raise ValidationError(
            f"mirror_changes: cursor {since} is ahead of the source's "
            f"newest version {latest} — the source log was rebuilt; "
            "delete the mirror (or use a new app_id) to restart"
        )
    try:
        delta = commit.read_changes(
            host, src_path, since, to_version=latest
        )
    except (NonAppendHistoryError, VersionNotFoundError):
        # Two resync triggers, same remedy: the file diff can't
        # express a rewrite, OR the consumer lagged so far behind
        # that vacuum pruned its cursor version from the source log.
        # Rebuild the mirror from the current snapshot, cursor riding
        # the same atomic entry.
        snap = commit.read_table(host, src_path, None, version=latest)
        out = transform(snap) if transform is not None else snap
        commit.replace_table_with_meta(
            host, dst_path, out, {_cursor_key(app_id): latest},
            expected_app=cas,
        )
        return MirrorMetrics(latest, -1, "resync")

    out = transform(delta) if transform is not None else delta
    n = out.count()
    commit.append_table_with_meta(
        host, dst_path,
        out if n else None,
        {_cursor_key(app_id): latest},
        expected_app=cas,
    )
    return MirrorMetrics(latest, n, "incremental")
