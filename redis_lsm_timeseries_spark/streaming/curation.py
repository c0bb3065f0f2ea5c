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
BLOOM_SHARD_DIR = "_bloom_shards"
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 7
#: shard count for the sharded sidecar (r14): the bitmap is split by
#: digest shard, each shard a self-contained Bloom filter — a build
#: task allocates only the shards its partition holds (~m/256 bits
#: instead of the full m), and a probe loads only the shards its
#: digests hash to.
BLOOM_SHARDS = 256
#: batches with more distinct digests than this skip the Bloom path
#: (collecting them driver-side would defeat the point)
BLOOM_PROBE_MAX = 100_000


def _bloom_positions(digest: str, m: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{digest}|{i}".encode()).hexdigest()[:15], 16) % m
        for i in range(BLOOM_K)
    ]


def _bloom_shard(digest: str) -> int:
    """The digest's shard — computed in plain Python on BOTH build and
    probe (same posture as ``_bloom_positions``: no cross-engine hash
    to keep consistent, and a build/probe disagreement would be a
    false NEGATIVE, the one failure mode the filter must never have)."""
    import hashlib

    return int(hashlib.md5(digest.encode()).hexdigest()[:2], 16) % BLOOM_SHARDS


def _shard_bits(bloom: dict, s: int):
    """Lazily-loaded bitmap of shard ``s``: ``b""`` when the shard is
    provably empty (never written — no digest hashed there), None when
    the file is unreadable (the probe treats that as a HIT, falling
    back to the scan)."""
    import base64
    import json as _json

    cache = bloom.setdefault("_shard_cache", {})
    if s in cache:
        return cache[s]
    if s not in bloom["_written"]:
        cache[s] = b""
        return cache[s]
    try:
        payload = _json.loads(
            bloom["_fs"].read_text(
                f"{bloom['_root']}/{BLOOM_SHARD_DIR}/{bloom['dir']}"
                f"/{s:03d}.json"
            )
        )
        bits = base64.b64decode(payload["bits"])
    except Exception:
        bits = None  # vanished/torn shard: only disables the skip
    cache[s] = bits
    return bits


def _bloom_hit(bloom: dict, digest: str) -> bool:
    legacy = bloom.get("_bits")
    if legacy is not None:
        # pre-r14 single-bitmap sidecar: still probes (back-compat;
        # the next compaction rebuild writes the sharded format)
        return all(
            legacy[p >> 3] & (1 << (p & 7))
            for p in _bloom_positions(digest, bloom["m"])
        )
    s = _bloom_shard(digest)
    bits = _shard_bits(bloom, s)
    if bits == b"":
        return False  # empty shard: digest provably never admitted
    if bits is None:
        return True  # unreadable shard: force the fallback scan
    m = bloom["m_shard"]
    return all(
        bits[p >> 3] & (1 << (p & 7))
        for p in _bloom_positions(digest, m)
    )


def build_digest_bloom(spark, admission_path: str, fs=None) -> dict:
    """Build (or rebuild) the Bloom sidecar over the CURRENT digest
    index, recording the exact file set it covers — probes treat files
    outside that set as the uncovered tail. Called by
    ``compact_admission_index`` right after the digests rewrite, so
    the covered set is the freshly-compacted file.

    SHARDED distributed build (r14, removing the last O(index)-sized
    single object in the admission path): digests shuffle onto
    ``BLOOM_SHARDS`` shards by a Python md5 of the digest, each task
    builds ONLY the shards its partition holds (per-task allocation
    bounded by ~m/256 instead of the full m-bit bitmap — at 10⁹
    digests, ~5 MB per task instead of ~1.25 GB), and each shard is
    written as its own file under a fresh token directory. Probes
    load only the shards their digests hash to. Crash safety: the
    manifest sidecar is written LAST and names the token dir, so a
    crash mid-build leaves the old manifest pointing at the old
    (untouched) shard dir; older token dirs are swept only after the
    new manifest lands, and a prober mid-swap that loses a shard file
    degrades to the fallback scan, never a false negative."""
    import json as _json
    import uuid

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
    # uniform shard sizing from the global count: md5 sharding is
    # balanced (binomial), so per-shard counts deviate by a few
    # percent at scale — not worth a second counting pass
    m_shard = max(
        1024,
        (BLOOM_BITS_PER_KEY * max(1, n) + BLOOM_SHARDS - 1)
        // BLOOM_SHARDS,
    )
    nbytes = (m_shard + 7) // 8
    token = uuid.uuid4().hex[:12]

    def _partials(pairs):
        import numpy as np

        parts: dict = {}
        for s, d in pairs:
            buf = parts.get(s)
            if buf is None:
                buf = parts[s] = np.zeros(nbytes, dtype=np.uint8)
            for p in _bloom_positions(d, m_shard):
                buf[p >> 3] |= np.uint8(1 << (p & 7))
        for s, buf in parts.items():
            yield (s, buf.tobytes())

    def _or_bytes(a, b):
        import numpy as np

        return (
            np.frombuffer(a, dtype=np.uint8)
            | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    written: list[int] = []
    if n:
        pairs = (
            digest_rows.rdd.map(lambda r: (_bloom_shard(r[0]), r[0]))
            # identity partitioner: one shard per task, so a task's
            # bitmaps are bounded by its own shards' size
            .partitionBy(BLOOM_SHARDS, lambda s: s)
            .mapPartitions(_partials)
            .reduceByKey(_or_bytes)
            .collect()
        )
        import base64

        shard_dir = f"{admission_path}/{BLOOM_SHARD_DIR}/{token}"
        fs.makedirs(shard_dir)
        for s, bits in sorted(pairs):
            fs.write_text(
                f"{shard_dir}/{s:03d}.json",
                _json.dumps(
                    {"bits": base64.b64encode(bits).decode("ascii")}
                ),
            )
            written.append(int(s))
    payload = {
        "format": 2,
        "k": BLOOM_K,
        "n": n,
        "files": files,
        "shards": BLOOM_SHARDS,
        "m_shard": m_shard,
        "dir": token,
        "written": written,
    }
    fs.write_text(
        f"{admission_path}/{BLOOM_SIDECAR}", _json.dumps(payload)
    )
    # sweep superseded token dirs (a prober holding the old manifest
    # mid-sweep degrades to the fallback scan on a vanished shard)
    base_dir = f"{admission_path}/{BLOOM_SHARD_DIR}"
    if fs.exists(base_dir):
        for name in fs.listdir(base_dir):
            if name != token:
                fs.remove_tree(f"{base_dir}/{name}")
    return {
        "n": n,
        "m": m_shard * BLOOM_SHARDS,
        "files": len(files),
        "shards_written": len(written),
    }


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
            "m_bits": (
                bloom["m"]
                if "m" in bloom
                else bloom["m_shard"] * bloom["shards"]
            ),
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
        if "bits" in bloom:
            # legacy (pre-r14) single-bitmap sidecar
            bloom["_bits"] = base64.b64decode(bloom["bits"])
            return bloom
        # sharded sidecar (format 2): shard bitmaps load lazily,
        # only for the shards a probe's digests hash to
        bloom["_written"] = set(bloom["written"])
        bloom["m_shard"], bloom["dir"]  # key presence check
        bloom["_fs"] = fs
        bloom["_root"] = admission_path
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
