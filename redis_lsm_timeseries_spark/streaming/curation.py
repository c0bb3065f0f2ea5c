"""Streaming curation admission (north star): the continuous-ingest
form of the batch curation pass — as crawl documents arrive, score
quality, filter, scrub PII, and admit only first-seen content, all in
one Structured Streaming pipeline.

Composes the existing operators unchanged: the text scorers
(``operators/text.py``) are pure Column expressions, so they apply to
a streaming DataFrame exactly as to a batch one (same codegen, no
UDFs); the dedup stage is the watermark-bounded
``dropDuplicatesWithinWatermark`` from ``streaming/dedup.py``. The
result is the streaming twin of the batch pipeline, verified
equivalent to it in tests (same admitted set as quality-filter +
exact-dedup over the union of all micro-batches, up to watermark
horizon semantics).

Scale posture: stateless stages (scoring, filtering, scrubbing) are
map-only over each micro-batch; the only state is the dedup stage's
digest set, bounded by the watermark horizon — the same reasoning as
``streaming/dedup.py``. Batch exact dedup downstream remains the
idempotent backstop for re-admissions past the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from redis_lsm_timeseries_spark.functions.portable import nonempty_tokens
from redis_lsm_timeseries_spark.operators.pipeline import (
    DEFAULT_MIN_QUALITY,
    DEFAULT_MIN_TOKENS,
)
from redis_lsm_timeseries_spark.operators.text import (
    scrub_pii,
    with_quality_score,
    with_token_stats,
)
from redis_lsm_timeseries_spark.streaming.dedup import (
    dedup_stream_by_content,
)


def curate_stream(
    stream: DataFrame,
    event_time_col: str = "event_time",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    watermark: str = "10 minutes",
    scrub: bool = True,
) -> DataFrame:
    """Quality-gate, (optionally) PII-scrub, and dedup a document
    stream. Emits admitted rows with their audit columns
    (``n_tokens``, ``quality_score``, ``content_digest``).

    Stage order matters and mirrors the batch pipeline:
    1. score + threshold BEFORE dedup — junk never enters dedup
       state, so a flood of low-quality spam cannot evict real keys;
    2. scrub AFTER scoring (scrubbing changes punctuation ratios;
       scores must describe the document as crawled) but BEFORE
       digesting — two crawls differing only in a scrubbed email
       admit once, and the persisted text is the clean one."""
    # n_tokens is overridden with the REAL (nonempty) token count
    # after scoring, mirroring the batch pipeline: the length gate and
    # the persisted audit column must agree with packing/LM/report,
    # while quality_score still sees with_quality_score's definition.
    scored = (
        with_quality_score(with_token_stats(stream, text_col), text_col)
        .withColumn(
            "n_tokens", F.size(nonempty_tokens(text_col)).cast("long")
        )
        .where(
            (F.col("quality_score") >= F.lit(float(min_quality)))
            & (F.col("n_tokens") >= F.lit(int(min_tokens)))
        )
    )
    # drop the heavy intermediate array; keep scalar audit columns
    slim = scored.drop("toks")
    if scrub:
        # the scrubbed text REPLACES the original: the digest (and
        # anything persisted) must be over the clean form
        slim = (
            scrub_pii(slim, text_col)
            .drop(text_col)
            .withColumnRenamed("text_scrubbed", text_col)
        )
    return dedup_stream_by_content(
        slim, text_col, event_time_col, watermark
    )


# ---------------------------------------------------- near-dup admission
#
# The exact-dedup stage above is content-digest-keyed: a re-crawl that
# differs by one word sails through. Near-dup admission closes that
# gap with the SAME machinery the batch pipeline uses — the persisted
# MinHash band index (`operators.dedup.build_band_index`) probed per
# micro-batch via `incremental_near_dup` — wrapped in foreachBatch,
# because the probe joins against a growing external table, which the
# declarative streaming operators cannot express.
#
# Exactly-once: the admitted rows, their digests, and their band rows
# all live under ONE ManifestCommit root (members "output"/"digests"/
# "bands") and each micro-batch lands as ONE atomic log entry via
# `append_tables`. A crash anywhere inside the batch leaves only
# invisible staged orphans; on replay the exact guard sees precisely
# the committed digests, so either the whole batch re-admits (nothing
# was visible) or the whole batch drops (everything was) — no window
# where output exists without its index rows, which under the old
# three-separate-appends layout re-admitted content on replay.

MIN_SHINGLE_TOKENS = 3  # word-3-shingles need >= 3 tokens to exist

OUTPUT_MEMBER = "output"
DIGESTS_MEMBER = "digests"
BANDS_MEMBER = "bands"


def _bands_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("corpus_id", T.LongType()),
            T.StructField("band_idx", T.IntegerType()),
            T.StructField("band_key", T.StringType()),
            T.StructField("mhs", T.ArrayType(T.LongType())),
        ]
    )


def _host(spark, fs=None):
    from redis_lsm_timeseries_spark.commit import CommitHost

    return CommitHost(spark, fs)


def read_admission_table(spark, admission_path: str, member: str,
                         fs=None, predicates=None) -> DataFrame:
    """Committed snapshot of one admission member table (``output`` /
    ``digests`` / ``bands``). ``predicates`` enables manifest-stats
    file skipping (see ``ManifestCommit.prune_files``) — a probe that
    knows its key set plans over only the files that may contain it;
    pruning is a superset guard, so join semantics are unchanged."""
    from pyspark.sql import types as T

    from redis_lsm_timeseries_spark.commit import ManifestCommit

    schema = None
    if member == DIGESTS_MEMBER:
        schema = T.StructType([T.StructField("digest", T.StringType())])
    elif member == BANDS_MEMBER:
        schema = _bands_schema()
    return ManifestCommit().read_table_pruned(
        _host(spark, fs),
        f"{admission_path}/{member}",
        schema,
        predicates=predicates,
    )


def read_admitted(spark, admission_path: str, fs=None) -> DataFrame:
    """The admitted-documents table (committed snapshots only —
    in-flight or crashed batches are invisible by construction)."""
    return read_admission_table(spark, admission_path, OUTPUT_MEMBER, fs)


# ------------------------------------------------- Bloom pre-probe
#
# LSM posture for the exact guard: compaction builds a Bloom sidecar
# over every admitted digest (false negatives impossible by
# construction), so a micro-batch whose digests ALL miss the filter
# only scans the small post-compaction tail files instead of the full
# digest index. Any hit, an oversized batch, or a missing/stale
# sidecar falls back to the full scan — the filter is purely an
# optimization, never a correctness dependency. This sidecar is the
# local stand-in for what a lakehouse deployment gets from per-file
# Bloom metadata (Parquet bloom filters / Delta stats); positions are
# md5-derived in plain Python on both build and probe, so there is no
# cross-engine hash to keep consistent.

BLOOM_SIDECAR = "_bloom_digests.json"
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 7
#: batches with more distinct digests than this skip the Bloom path
#: (collecting them driver-side would defeat the point)
BLOOM_PROBE_MAX = 100_000


def _bloom_positions(digest: str, m: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{digest}|{i}".encode()).hexdigest()[:15], 16) % m
        for i in range(BLOOM_K)
    ]


def _bloom_hit(bloom: dict, digest: str) -> bool:
    bits = bloom["_bits"]
    return all(
        bits[p >> 3] & (1 << (p & 7))
        for p in _bloom_positions(digest, bloom["m"])
    )


def build_digest_bloom(spark, admission_path: str, fs=None) -> dict:
    """Build (or rebuild) the Bloom sidecar over the CURRENT digest
    index, recording the exact file set it covers — probes treat files
    outside that set as the uncovered tail. Called by
    ``compact_admission_index`` right after the digests rewrite, so
    the covered set is the freshly-compacted file.

    DISTRIBUTED build (r13, closing the one corpus-sized driver
    materialization): each partition hashes its digests into a partial
    bitmap (the same md5 position scheme the probe uses, so the
    sidecar format is byte-identical to the old driver-side build) and
    the partials are OR-merged through ``treeReduce`` — the driver
    sees one count and one m-bit bitmap, never the digest rows. The
    bitmap itself is O(index) BITS (10 per key), which is also the
    sidecar's size — inherent to a single-sidecar format, and ~100×
    smaller than the rows it replaces."""
    import base64
    import json as _json

    from redis_lsm_timeseries_spark.commit import ManifestCommit
    from redis_lsm_timeseries_spark.fs import LOCAL_FS

    fs = fs if fs is not None else LOCAL_FS
    host = _host(spark, fs)
    files = ManifestCommit().member_files(
        host, f"{admission_path}/{DIGESTS_MEMBER}"
    ) or []
    digest_rows = read_admission_table(
        spark, admission_path, DIGESTS_MEMBER, fs
    ).select("digest")
    n = digest_rows.count()
    m = max(1024, BLOOM_BITS_PER_KEY * max(1, n))
    nbytes = (m + 7) // 8

    def _partial(rows):
        import numpy as np

        part = np.zeros(nbytes, dtype=np.uint8)
        for row in rows:
            for p in _bloom_positions(row[0], m):
                part[p >> 3] |= np.uint8(1 << (p & 7))
        yield part.tobytes()

    def _or_bytes(a, b):
        import numpy as np

        return (
            np.frombuffer(a, dtype=np.uint8)
            | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    if n:
        bits = digest_rows.rdd.mapPartitions(_partial).treeReduce(
            _or_bytes
        )
    else:
        bits = bytes(nbytes)
    payload = {
        "m": m,
        "k": BLOOM_K,
        "n": n,
        "files": files,
        "bits": base64.b64encode(bits).decode("ascii"),
    }
    fs.write_text(
        f"{admission_path}/{BLOOM_SIDECAR}", _json.dumps(payload)
    )
    return {"n": n, "m": m, "files": len(files)}


def admission_stats(spark, admission_path: str, fs=None) -> dict:
    """Operational snapshot of an admission root — manifest version,
    per-member committed file counts, and Bloom sidecar coverage —
    without scanning any data (pure metadata reads), for monitoring
    and for deciding when to run ``compact_admission_index``."""
    from redis_lsm_timeseries_spark.commit import ManifestCommit
    from redis_lsm_timeseries_spark.fs import LOCAL_FS

    fs = fs if fs is not None else LOCAL_FS
    host = _host(spark, fs)
    commit = ManifestCommit()
    resolved = commit._resolve(host, admission_path)
    if resolved is None:
        return {"exists": False}
    version, tables = commit._current(host, admission_path)
    bloom = _load_bloom(admission_path, fs)
    out = {
        "exists": True,
        "version": version,
        "files": {m: len(fs_) for m, fs_ in tables.items()},
    }
    if bloom is not None:
        covered = set(bloom["files"])
        current = set(tables.get(DIGESTS_MEMBER, []))
        out["bloom"] = {
            "n_digests": bloom["n"],
            "m_bits": bloom["m"],
            "covered_files": len(covered & current),
            "tail_files": len(current - covered),
        }
    return out


def _load_bloom(admission_path: str, fs) -> dict | None:
    import base64
    import json as _json

    path = f"{admission_path}/{BLOOM_SIDECAR}"
    if not fs.exists(path):
        return None
    try:
        bloom = _json.loads(fs.read_text(path))
        bloom["_bits"] = base64.b64decode(bloom["bits"])
        return bloom
    except Exception:
        # An unreadable sidecar only disables the optimization.
        return None


def near_dup_admitting_batch(
    admission_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int | None = None,
    fs=None,
):
    """Build the ``foreachBatch`` function for near-dup-aware
    streaming admission. For each micro-batch:

    1. EXACT guard (idempotency): probe the admitted-digest index with
       ``incremental_exact_dedup`` — rows whose content was already
       admitted (including a re-delivered micro-batch after a restart:
       same content, same digests) drop here, so replays admit nothing
       twice and never grow the index. In-batch exact dups admit once
       (min id).
    2. NEAR guard: MinHash-probe the persisted band index with
       ``incremental_near_dup``; rows whose best signature agreement
       >= ``threshold`` drop. Documents too short to shingle
       (< 3 tokens) skip this stage — their max-init signatures would
       all collide — and rely on the exact guard alone.
    3. Admit the remainder: ONE atomic ``append_tables`` commit adds
       the rows to ``output``, their digests to ``digests``, and their
       band rows (signatures included) to ``bands`` — all visible
       together or not at all, which with the content-keyed guard in
       (1) makes admission EXACTLY-ONCE across crashes and replays
       (a crash mid-commit leaves nothing visible, so the replay
       re-admits once; a crash after the commit makes the replay drop
       everything at the exact guard).

    Batch-internal NEAR dups (two first-seen variants arriving in one
    micro-batch) admit ONCE: after the index probes, the surviving
    set's own band rows self-join (``in_batch_near_dup_losers``) and
    any doc agreeing with a smaller-id batchmate at >= ``threshold``
    drops — the near-dup extension of the exact guard's in-batch
    min-id rule. Deterministic per batch content, so replays recompute
    the same winners. State lives entirely in the manifest tables, not
    the streaming state store, so it survives restarts and is shared
    with batch admission jobs using the same index.

    100 TB shape: per batch, the (small) batch side broadcasts twice —
    digests against the digest index, band keys against the band index
    — and the indexes are scanned, never shuffled; appends are
    batch-sized. At deployment scale the band index is stored bucketed
    by (band_idx, band_key) so the probe is bucket-pruned
    (``compact_admission_index`` is the local stand-in)."""
    from redis_lsm_timeseries_spark.commit import ManifestCommit
    from redis_lsm_timeseries_spark.functions.portable import (
        nonempty_tokens as _net,
    )
    from redis_lsm_timeseries_spark.operators import dedup as D

    nh = D.NUM_HASHES if num_hashes is None else int(num_hashes)
    stats = {"bloom_skips": 0, "full_scans": 0, "pruned_scans": 0}

    def _digest_sample(batch):
        """The batch's distinct content digests, or None past the
        driver-side cap — shared by the Bloom probe and the stats
        prune (one bounded collect per micro-batch)."""
        rows = (
            batch.select(D.content_digest(text_col).alias("d"))
            .distinct()
            .limit(BLOOM_PROBE_MAX + 1)
            .collect()
        )
        if len(rows) > BLOOM_PROBE_MAX:
            return None
        return [r.d for r in rows]

    def _digest_index(spark, commit, host, batch):
        """The exact guard's probe side. With a Bloom sidecar whose
        digests ALL miss the batch, only the post-compaction tail
        files are scanned (false-negative-free: the sidecar covers the
        compacted set exactly, by file list); otherwise the committed
        index, stats-pruned to the files that may contain the batch's
        digests (the compacted file is range-clustered by digest, so
        a small batch touches a narrow digest band)."""
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField("digest", T.StringType())])
        sample = _digest_sample(batch)
        bloom = _load_bloom(admission_path, host.fs)
        if bloom is not None and sample is not None:
            current = commit.member_files(
                host, f"{admission_path}/{DIGESTS_MEMBER}"
            )
            if current is not None and not any(
                _bloom_hit(bloom, d) for d in sample
            ):
                covered = set(bloom["files"])
                tail = [f for f in current if f not in covered]
                stats["bloom_skips"] += 1
                if not tail:
                    return spark.createDataFrame([], schema)
                base = f"{admission_path}/data/{DIGESTS_MEMBER}"
                return spark.read.schema(schema).parquet(
                    *[f"{base}/{f}" for f in tail]
                )
        # Committed snapshots ONLY: a crashed batch's staged files are
        # invisible, so the guards see exactly what readers see. A
        # corrupt index propagates as an error — treated as empty it
        # would silently re-admit every duplicate. The exact guard
        # only ever JOINS this index against the batch's digests, so
        # pruning to files that may contain them changes nothing.
        if sample is not None:
            stats["pruned_scans"] += 1
            return read_admission_table(
                spark,
                admission_path,
                DIGESTS_MEMBER,
                host.fs,
                predicates={"digest": set(sample)},
            )
        stats["full_scans"] += 1
        return read_admission_table(
            spark, admission_path, DIGESTS_MEMBER, host.fs
        )

    def process(batch_df, batch_id: int) -> None:
        if not batch_df.columns:
            return
        spark = batch_df.sparkSession
        commit = ManifestCommit()
        host = _host(spark, fs)
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        digest_idx = _digest_index(spark, commit, host, batch)
        exact = D.incremental_exact_dedup(batch, digest_idx, text_col, id_col)
        novel_ids = exact.where("admit").select(id_col)
        novel = batch.join(novel_ids, id_col, "left_semi").localCheckpoint(
            eager=True
        )
        if novel.isEmpty():
            return
        long_enough = novel.where(
            F.size(_net(text_col)) >= MIN_SHINGLE_TOKENS
        )
        # Stats-prune the band index to files that may hold the
        # batch's band keys (compaction range-clusters by band_key).
        # The near-dup guard only ever JOINS the index on those keys,
        # so pruning is semantics-free; the key collection is bounded
        # by batch_rows x n_bands and capped. The batch's MinHash is
        # recomputed inside incremental_near_dup — accepted double
        # work on the (small) batch side to keep the index read, the
        # scale-dominant cost, to its matching file slice.
        probe_keys = None
        key_rows = (
            D.lsh_bands(
                D.with_minhash(
                    long_enough.select(id_col, text_col), text_col, nh
                ).select(id_col, "mhs"),
                id_col,
                nh,
            )
            .select("band_key")
            .distinct()
            .limit(BLOOM_PROBE_MAX + 1)
            .collect()
        )
        if len(key_rows) <= BLOOM_PROBE_MAX:
            probe_keys = {r.band_key for r in key_rows}
        band_idx_df = read_admission_table(
            spark,
            admission_path,
            BANDS_MEMBER,
            fs,
            predicates=(
                {"band_key": probe_keys}
                if probe_keys is not None
                else None
            ),
        )
        near = D.incremental_near_dup(
            long_enough.select(id_col, text_col),
            band_idx_df,
            text_col,
            id_col,
            threshold,
            nh,
        )
        dropped_ids = near.where("is_near_dup").select(id_col)
        admitted = novel.join(dropped_ids, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        if admitted.isEmpty():
            return
        # enforce the index schema (band_idx is int, ids long) so a
        # later probe's signature-width/type guard stays meaningful
        new_bands = D.build_band_index(
            admitted.where(F.size(_net(text_col)) >= MIN_SHINGLE_TOKENS),
            text_col,
            id_col,
            nh,
        ).select(
            F.col("corpus_id").cast("long"),
            F.col("band_idx").cast("int"),
            F.col("band_key"),
            F.col("mhs"),
        )
        # batch-internal near-dup closure: among the survivors, a doc
        # agreeing with a smaller-id batchmate drops (min-id wins,
        # same rule as the exact guard's in-batch stage)
        losers = D.in_batch_near_dup_losers(
            new_bands, "corpus_id", threshold, nh
        ).localCheckpoint(eager=True)
        if not losers.isEmpty():
            admitted = admitted.join(
                losers.select(F.col("corpus_id").alias(id_col)),
                id_col,
                "left_anti",
            ).localCheckpoint(eager=True)
            if admitted.isEmpty():
                return
            new_bands = new_bands.join(losers, "corpus_id", "left_anti")
        digests = admitted.select(
            D.content_digest(text_col).alias("digest")
        ).distinct()
        commit.append_tables(
            host,
            admission_path,
            {
                OUTPUT_MEMBER: admitted,
                DIGESTS_MEMBER: digests,
                BANDS_MEMBER: new_bands,
            },
        )

    process.stats = stats
    return process


def curate_stream_near_dup(
    stream: DataFrame,
    admission_path: str,
    checkpoint_path: str,
    event_time_col: str = "event_time",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    watermark: str = "10 minutes",
    scrub: bool = True,
    threshold: float = 0.5,
    trigger: dict | None = None,
):
    """The near-dup-aware streaming curation pipeline: the stateless
    ``curate_stream`` stages (score, filter, scrub, watermark-bounded
    exact dedup) feed a ``foreachBatch`` admission sink that drops
    near-duplicates of everything previously admitted and commits the
    rest — rows, digests, and band rows in one atomic manifest entry —
    under ``admission_path`` (read back via ``read_admitted``).
    Returns the started StreamingQuery. ``trigger`` passes through to
    ``writeStream.trigger`` (e.g. ``{"availableNow": True}`` for
    drain-and-stop runs)."""
    curated = curate_stream(
        stream, event_time_col, text_col, min_quality, min_tokens,
        watermark, scrub,
    )
    writer = curated.writeStream.foreachBatch(
        near_dup_admitting_batch(
            admission_path, text_col, threshold=threshold
        )
    ).option("checkpointLocation", checkpoint_path)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.outputMode("append").start()


def compact_admission_index(
    spark,
    admission_path: str,
    fs=None,
    target_files: int = 1,
    members: tuple = (DIGESTS_MEMBER, BANDS_MEMBER),
) -> dict:
    """Small-file hygiene for the admission tables: every micro-batch
    commits one file per member, so after N batches each probe pays N
    file opens — the same accretion the purge log suffers
    (``tiering.compact_purge_log``). Each member rewrites into
    ``target_files`` files through ``ManifestCommit.snapshot_rewrite``
    — one atomic manifest entry replaces the file list, then vacuum
    collects the old files, so a crash at ANY point leaves the table
    readable (a staged-but-uncommitted snapshot is invisible). The
    bands rewrite clusters by (band_idx, band_key), so probes touch
    co-located row groups — the local-FS stand-in for the bucketed
    layout a deployment stores the index in.

    After a digests rewrite the Bloom sidecar is rebuilt over the
    fresh (compacted) file set, so subsequent micro-batches can skip
    the full index scan (see ``build_digest_bloom``).

    Safe to run concurrently with the streaming sink (r10): the sink
    commits leaselessly, so ``snapshot_rewrite``'s conflict detection
    guards the race — a micro-batch landing between this job's
    snapshot read and its commit raises
    ``ConcurrentMaintenanceError`` instead of being silently dropped
    from the manifest, and the rewrite retries on fresh state. The
    snapshot source is resolved INSIDE the write callback (i.e. after
    the conflict baseline is captured), so an append in the
    capture-to-read window surfaces as a conflict too, never as data
    loss. Returns {member: files_before} (0 = nothing to do)."""
    from redis_lsm_timeseries_spark.commit import ManifestCommit
    from redis_lsm_timeseries_spark.errors import RewriteConflictError

    commit = ManifestCommit()
    host = _host(spark, fs)
    # RANGE clustering (not hash): each compacted file then covers a
    # contiguous key band, so its manifest min/max stats are tight and
    # a probe's key set prunes files at plan time — hash clustering
    # would give every file a full-span min/max. band_key leads for
    # the bands member because probes filter on it.
    cluster = {DIGESTS_MEMBER: ["digest"],
               BANDS_MEMBER: ["band_key", "band_idx"]}
    done = {}
    for name in members:
        path = f"{admission_path}/{name}"
        n = commit.table_file_count(host, path)
        if n <= target_files:
            done[name] = 0
            continue
        cols = cluster.get(name)

        def write_snapshot(tmp, name=name, cols=cols):
            cur = read_admission_table(spark, admission_path, name, fs)
            w = (
                cur.repartitionByRange(target_files, *cols)
                .sortWithinPartitions(*cols)
                if cols
                else cur.repartition(target_files)
            )
            w.write.mode("overwrite").parquet(tmp)

        # retry ONLY the typed rewrite conflict (a batch landed between
        # our snapshot read and commit) — other maintenance errors
        # (lease contention, exhausted CAS races, a vacuum abort on an
        # unreadable retained entry) are not fixed by re-staging a full
        # snapshot and would just orphan more files per attempt
        for attempt in range(3):
            try:
                commit.snapshot_rewrite(host, path, write_snapshot)
                break
            except RewriteConflictError:
                if attempt == 2:
                    raise
        done[name] = n
    if DIGESTS_MEMBER in members and commit.table_exists(
        host, f"{admission_path}/{DIGESTS_MEMBER}"
    ):
        build_digest_bloom(spark, admission_path, fs)
    return done
