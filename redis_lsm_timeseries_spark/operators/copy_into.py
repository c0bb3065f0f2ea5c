"""Idempotent bulk-file ingest — Delta's ``COPY INTO`` on the
manifest log (r17).

``copy_into`` lists a source directory, loads exactly the files not
already ingested, and appends them to a manifest member atomically
WITH the updated loaded-file cursor — re-running after a crash or on
a schedule never double-loads (the Delta ``COPY INTO`` contract:
"load files exactly once, skip what you already took"). The
reference has nothing like it (ingest there is the live ``write``
call, ``index.js:64``); this is the lakehouse bulk-load surface a
100 TB training-data pipeline schedules hourly against a landing
bucket.

Exactly-once mechanics: the set of already-loaded source paths lives
in a SIDECAR json under ``{root}/_copy/`` (outside the data root, so
vacuum never touches it), referenced from the app-map key
``__copy_into__:{member}``. Each run plans against the cursor it
read, then commits the new rows and the new cursor in ONE log entry
with a CAS on the old cursor value (``append_table_with_meta``'s
``expected_app`` leg) — two racing runs cannot both load the same
file: the loser conflicts, re-plans on fresh state, and finds
nothing new. The previous sidecar is deleted only after the commit
lands; a planner that read it mid-swap CAS-fails and retries.

100 TB shape: a run costs one O(listing) driver walk of the source
directory (the same cost Delta's COPY INTO pays; pair with
date-partitioned landing prefixes and ``pattern`` to bound it), one
O(loaded-history) sidecar read/write (a single small file — path
strings only), and one distributed read+append of exactly the NEW
files' bytes. Nothing re-reads previously loaded data.

Idempotency key: the source file PATH (Delta's default — a file
re-written in place under the same name is NOT re-loaded; land new
data under new names, the universal object-store convention).
"""

from __future__ import annotations

import fnmatch
import json
import uuid
from dataclasses import dataclass

from redis_lsm_timeseries_spark.errors import ValidationError

#: app-map cursor key prefix; the value is
#: ``{"sidecar": "<relpath under root>", "n": <loaded count>}``
COPY_KEY = "__copy_into__:{member}"

_EXTS = {
    "parquet": (".parquet",),
    "json": (".json", ".jsonl"),
    "csv": (".csv",),
}


@dataclass(frozen=True)
class CopyStats:
    """One COPY INTO run: files loaded this run, rows they carried,
    files skipped as already-loaded."""

    files_loaded: int
    rows_loaded: int
    files_skipped: int


def _walk_files(fs, base: str, exts: tuple, rel: str = "") -> list:
    out = []
    full = f"{base}/{rel}" if rel else base
    if not fs.exists(full):
        return out
    if not fs.is_dir(full):
        return [rel] if full.endswith(exts) else []
    for name in sorted(fs.listdir(full)):
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS markers, hidden files
        child = f"{rel}/{name}" if rel else name
        if fs.is_dir(f"{base}/{child}"):
            out.extend(_walk_files(fs, base, exts, child))
        elif name.endswith(exts):
            out.append(child)
    return out


def _load_cursor(store, root: str, cur: dict | None) -> set:
    """Loaded-path set from the cursor's sidecar; a vanished sidecar
    (mid-swap read) degrades to empty — the planner then CAS-fails at
    commit and retries on fresh state, never double-loads."""
    if not cur or not cur.get("sidecar"):
        return set()
    try:
        return set(
            json.loads(
                store.fs.read_text(f"{root}/{cur['sidecar']}")
            )["paths"]
        )
    except (OSError, ValueError, KeyError):
        return set()


def copy_into(
    spark_or_host,
    path: str,
    source_dir: str,
    file_format: str = "parquet",
    pattern: str | None = None,
    commit=None,
) -> CopyStats:
    """Load every not-yet-ingested file under ``source_dir`` into the
    manifest member at ``path``, atomically and exactly once. See the
    module docstring for mechanics. ``pattern`` is a glob over the
    source-relative path (``events/2026-*/*.parquet``). Column
    binding when the target has data: by NAME with a store-assignment
    cast to the target's types; source columns beyond the target's
    ride through (the engine's additive-append evolution), a target
    column MISSING from the source refuses loudly."""
    from pyspark.sql import functions as F

    from redis_lsm_timeseries_spark.commit import ManifestCommit
    from redis_lsm_timeseries_spark.sql_dml import _host_of

    host = _host_of(spark_or_host)
    spark = host.spark
    commit = commit if commit is not None else ManifestCommit()
    fmt = file_format.lower()
    if fmt not in _EXTS:
        raise ValidationError(
            f"copy_into: FILEFORMAT {file_format!r} not supported — "
            "parquet | json | csv"
        )
    resolved = commit._target_for_write(host, path)
    if resolved is None:
        raise ValidationError(
            f"copy_into: {path!r} is not manifest-managed — the "
            "exactly-once cursor needs the log (append the directory "
            "with plain spark.write for unmanaged paths)"
        )
    root, member = resolved
    key = COPY_KEY.format(member=member)
    entry = commit._load_entry(host, path, root, None)
    cur = entry.get("app", {}).get(key)
    loaded = _load_cursor(host, root, cur)

    listed = _walk_files(host.fs, source_dir, _EXTS[fmt])
    if pattern is not None:
        listed = [r for r in listed if fnmatch.fnmatch(r, pattern)]
    fresh = [r for r in listed if f"{source_dir}/{r}" not in loaded]
    skipped = len(listed) - len(fresh)
    if not fresh:
        return CopyStats(0, 0, skipped)

    # basePath: an explicit file list disables Spark's partition
    # discovery — with it, a hive-laid-out landing directory
    # (dt=2026-08-17/part-*.parquet) still materializes its
    # partition-path columns
    reader = spark.read.format(fmt).option("basePath", source_dir)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "inferSchema", "true"
        )
    df = reader.load([f"{source_dir}/{r}" for r in fresh])
    has_data = bool(entry["tables"].get(member))
    if has_data:
        tgt = commit.read_table(host, path)
        tgt_types = {f.name: f.dataType for f in tgt.schema.fields}
        missing = [c for c in tgt.columns if c not in df.columns]
        if missing:
            raise ValidationError(
                f"copy_into: source files lack target column(s) "
                f"{missing} — COPY INTO binds by name; backfill the "
                "source or load through INSERT with explicit exprs"
            )
        extras = [c for c in df.columns if c not in tgt_types]
        df = df.select(
            *[
                F.col(c).cast(tgt_types[c]).alias(c)
                for c in tgt.columns
            ],
            *extras,  # additive evolution: new columns append through
        )
    # rows-loaded comes from the commit's OWN per-file stats delta
    # below (footer-derived during staging) — counting df here would
    # read every new file twice, a real 2x at bulk-ingest scale
    before = set(entry["tables"].get(member, []))

    new_paths = sorted(loaded | {f"{source_dir}/{r}" for r in fresh})
    side_rel = f"_copy/{uuid.uuid4().hex[:12]}.json"
    host.fs.makedirs(f"{root}/_copy")
    host.fs.write_text(
        f"{root}/{side_rel}",
        json.dumps({"paths": new_paths}),
    )
    try:
        from redis_lsm_timeseries_spark.operators.merge import (
            partition_cols_of,
        )

        pcols = partition_cols_of(entry["tables"].get(member) or [])
        app_meta = {key: {"sidecar": side_rel, "n": len(new_paths)}}
        if pcols:
            # hive-partitioned target: the layout-aware append (same
            # cursor CAS) — a flat file would be refused by the
            # commit layout invariant, and before r17 was silently
            # unreadable
            commit.append_partitioned(
                host, df, path, pcols,
                app_meta=app_meta, expected_app={key: cur},
            )
        else:
            commit.append_table_with_meta(
                host, path, df, app_meta, expected_app={key: cur},
            )
    except Exception:
        host.fs.remove_file(f"{root}/{side_rel}")
        raise
    if cur and cur.get("sidecar"):
        # the old sidecar is dead the instant the commit landed; any
        # planner that read it is CAS-guarded
        try:
            host.fs.remove_file(f"{root}/{cur['sidecar']}")
        except OSError:
            pass
    # reporting only: an unrelated append landing in this tiny window
    # would inflate the stat, never the data
    after = commit.member_file_stats(host, path) or {}
    n_rows = sum(
        int((s or {}).get("rows") or 0)
        for f, s in after.items()
        if f not in before
    )
    return CopyStats(len(fresh), n_rows, skipped)
