"""Validation errors mirroring the reference's admission control.

The reference raises plain ``Error`` with specific messages
(``index.js:102-119, 163-209``); we use typed exceptions so tests can
assert the failure class rather than string-match.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors."""


class NotInitializedError(EngineError):
    """Operation before ``initialize`` (reference ``index.js:66, 159``)."""


class ValidationError(EngineError):
    """Bad input shape/type (reference ``index.js:102-113, 163-199``)."""


class BatchTooLargeError(ValidationError):
    """> max samples per write (reference ``index.js:116-119``)."""


class TooManyTagsError(ValidationError):
    """> max tags per read (reference ``index.js:167-169``)."""


class KeyTooLongError(ValidationError):
    """Tag or page name over length cap (reference ``index.js:111, 240``)."""


class InvalidRangeError(ValidationError):
    """Missing/inverted/non-integer range bounds (reference ``index.js:196-199``)."""


class ConcurrentMaintenanceError(EngineError):
    """A maintenance job (purge scan/ack, compaction) found the
    namespace's maintenance lease held by another live writer. The
    reference serializes these through Redis single-threaded Lua
    (``enqueue-purge.lua`` / ``ack-purge.lua``); here the lease file is
    the guard (see ``tiering.maintenance_lease``)."""


class VersionNotFoundError(EngineError):
    """A time-travel read named a manifest version that does not exist
    or whose log entry was pruned by vacuum (``ManifestCommit.vacuum``
    keeps the newest ``retain_versions`` entries; older snapshots are
    unrecoverable history). Carries the retained range in the message."""


class RetentionError(EngineError):
    """A change-feed read named a starting timestamp (or version)
    that predates RETAINED history while version 0 is vacuumed:
    changes committed at or after the requested point were pruned, so
    serving "from the earliest retained version" would silently omit
    that version's own changes — under-reading an incremental
    consumer. Raised typed (the Delta CDF out-of-range posture);
    remediation is a full resync from the current snapshot, or
    ``startingVersion='earliest'`` when genesis replay is acceptable.
    Carries the earliest retained version in the message."""


class NonAppendHistoryError(EngineError):
    """A change-feed read (``ManifestCommit.read_changes``) spanned a
    version range that REMOVED files (a compaction rewrite, partition
    overwrite, or drop) — the added-files diff no longer equals the
    logical row delta, so the incremental consumer must fall back to a
    full recompute from the newer snapshot. Carries the first removed
    file in the message (the Delta change-data-feed posture for
    non-append commits without CDF)."""


class SinkManagedHotTierError(EngineError):
    """The hot table root carries a streaming file-sink commit log
    (``_spark_metadata``), which makes the sink the EXCLUSIVE committer
    of the L1 layout: batch reads of such a directory list files from
    the sink's log, so files appended by any other writer (bulk
    ``write_df``, an L0 fold, a compaction rewrite) are silently
    invisible — and a rewrite would physically delete log-referenced
    files. Batch L1 mutators refuse instead. Use
    ``start_hot_ingest_with_maintenance`` (foreachBatch -> ``write_df``)
    for a stream that must coexist with batch writes and maintenance."""


class RewriteConflictError(ConcurrentMaintenanceError):
    """A snapshot rewrite detected that a concurrent commit changed the
    member it was about to replace (``ManifestCommit.snapshot_rewrite``
    captures the file list before reading its source and refuses to
    land on different state). RETRYABLE by re-running the whole rewrite
    on fresh state — unlike its parent, which also covers
    non-retryable conditions (lease contention, exhausted CAS races,
    unreadable retained log entries)."""
