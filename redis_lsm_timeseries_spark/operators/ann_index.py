"""Persistent IVF ANN index through the ``TableCommit`` seam
(VERDICT r9 stretch): the trained coarse quantizer AND the corpus's
inverted-list assignment live as member tables of ONE manifest root,
committed together in one atomic log entry — the serving path survives
restarts (all state on disk, nothing cached in objects) and a rebuild
under a live reader is snapshot-isolated (the reader's resolved file
list stays valid through the manifest's vacuum retention; new readers
see the new generation).

Members of ``{index_path}``:

- ``centroids``: (list_id int, centroid array<double>) — n_list rows,
  the spherical k-means quantizer (broadcast at serve time; never
  inlined as plan literals, so n_list can grow to the thousands a
  100 TB corpus needs);
- ``vectors``: (<id>, list_id int, nv array<double>) — one row per
  usable corpus vector, UNIT-NORMALIZED at build time and
  RANGE-clustered by ``list_id``, so serving never rescans or
  renormalizes the corpus: the index IS the searchable copy. Each
  file covers a contiguous band of lists, so its manifest min/max
  stats are tight and a probe's list set prunes files at plan time
  (``read_table_pruned``) — a probe reads only its
  ~(probed / n_list) file slice, at 100 TB the difference between
  touching the whole member and a handful of files.

The two members must agree (assignments are meaningless under another
generation's centroids) — which is exactly what
``ManifestCommit.replace_tables``'s atomic multi-member swap
guarantees; the plain-directory fallback degrades to ordered
overwrites with a documented mixed-generation crash window.

Same posture as the streaming admission index (streaming/curation.py):
a standalone manifest table driven through ``CommitHost``, no
``TimeseriesStore`` required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.similarity import (
    _train_ivf,
    _unit_rows,
    assign_lists_join,
    centroids_df,
    dot,
    probe_lists_join,
)

CENTROIDS_MEMBER = "centroids"
VECTORS_MEMBER = "vectors"

#: serve-time file skipping collects the query batch's distinct
#: probed list_ids (bounded by n_queries x n_probe) to prune vector
#: files; a batch probing more lists than this reads the full member
#: (at that fan-out the full scan is the right plan regardless).
PROBE_PRUNE_MAX = 256


def _host(spark: SparkSession, fs=None) -> CommitHost:
    return CommitHost(spark, fs)


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    n_list: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
    app_meta: dict | None = None,
    expected_app: dict | None = None,
) -> dict:
    """Train the quantizer on ``corpus`` and commit centroids +
    normalized assignments as one atomic manifest entry. Rebuilding
    over an existing index REPLACES both members together; a reader
    that resolved the previous generation keeps scanning its retained
    files. Returns {n_list, n_vectors, version}."""
    spark = corpus.sparkSession
    if corpus.limit(1).count() == 0:
        # Fail the validatable precondition with a typed error instead
        # of committing an empty vectors member whose schema-less
        # read-back raises a raw FileNotFoundError (and before
        # train_ivf_centroids would seed zero centroids).
        raise ValidationError(
            f"build_ivf_index: corpus for {index_path!r} is empty — "
            "an IVF index needs at least one vector to train on"
        )
    # Train and keep the CHECKPOINTED normalized rows: the final
    # assignment below reads the same materialized (_id, _nv) frame
    # the Lloyd iterations used instead of re-scanning + re-normalizing
    # the corpus (r17, guide §2.3).
    centroids, unit = _train_ivf(
        corpus, n_list=n_list, iters=iters, id_col=id_col, vec_col=vec_col
    )
    cent_df = centroids_df(spark, centroids)
    # broadcast-join assignment (scales in n_list; the literal
    # expression path compiles O(n_list x dim) literals — see
    # assign_lists_join)
    #
    # Range-cluster by list_id (not hash): each written file then
    # covers a CONTIGUOUS narrow band of lists, so its manifest
    # min/max list_id stats are tight and a probe's list set prunes
    # files at plan time (hash clustering would spread e.g. lists
    # {0, 9} into one file, giving useless min=0/max=9 spans).
    # The assignment is checkpointed FIRST: repartitionByRange runs a
    # range-boundary SAMPLING pass over its child, so without the
    # materialization the whole corpus-wide assign shuffle executed
    # twice — once for the sample, once for the write (r17, guide §1).
    vectors = assign_lists_join(unit, cent_df).select(
        F.col("_id").alias(id_col),
        F.col("list_id"),
        F.col("_nv").alias("nv"),
    ).localCheckpoint(eager=False).repartitionByRange(
        max(1, min(n_list, 8)), "list_id"
    )
    host = _host(spark, fs)
    commit = ManifestCommit()
    commit.replace_tables(
        host,
        index_path,
        {CENTROIDS_MEMBER: cent_df, VECTORS_MEMBER: vectors},
        app_meta=app_meta,
        expected_app=expected_app,
    )
    version, tables = commit._current(host, index_path)
    # count from the COMMITTED files (parquet footer metadata), not the
    # build pipeline — counting `vectors` would re-run the whole
    # normalize+assign derivation a second time
    n_vectors = commit.read_table(
        host, f"{index_path}/{VECTORS_MEMBER}"
    ).count()
    return {"n_list": n_list, "n_vectors": n_vectors, "version": version}


def load_ivf_centroids(
    spark: SparkSession, index_path: str, fs=None
) -> list[list[float]]:
    """The committed quantizer, ordered by list_id — a bounded
    (n_list x dim) collect, same as the in-memory training path."""
    host = _host(spark, fs)
    rows = (
        ManifestCommit()
        .read_table(host, f"{index_path}/{CENTROIDS_MEMBER}")
        .orderBy("list_id")
        .collect()
    )
    return [list(r.centroid) for r in rows]


def read_ivf_vectors(
    spark: SparkSession, index_path: str, fs=None
) -> DataFrame:
    """The committed (id, list_id, nv) member — a snapshot: the
    returned DataFrame pins its manifest file list, unaffected by a
    concurrent rebuild."""
    host = _host(spark, fs)
    return ManifestCommit().read_table(
        host, f"{index_path}/{VECTORS_MEMBER}"
    )


def ivf_index_topk(
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
) -> DataFrame:
    """Serve top-k from the PERSISTED index — no corpus scan, no
    re-normalization, no retraining: the committed centroids broadcast
    against the (small) query batch to pick each query's n_probe
    lists, and the stored normalized vectors join on list_id. Output
    schema matches ``similarity.ivf_topk``:
    (query_id, list_id, neighbor_id, cosine_sim, rnk)."""
    spark = queries.sparkSession
    host = _host(spark, fs)
    commit = ManifestCommit()
    cent_df = commit.read_table(host, f"{index_path}/{CENTROIDS_MEMBER}")
    # probe-list expansion via the broadcast-join path — the committed
    # centroids never leave the cluster, and the plan stays small at
    # any n_list (the literal-expression probe compiles n_list x dim
    # literals per query projection)
    q = probe_lists_join(
        _unit_rows(queries, id_col, vec_col), cent_df, n_probe
    ).select(
        F.col("_id").alias("query_id"),
        F.col("_nv").alias("qv"),
        "list_id",
    )
    # Plan-time file skipping on the probed lists: the query side is
    # small by contract (it broadcasts below), so collecting its
    # distinct probed list_ids is bounded by n_queries x n_probe and
    # capped at PROBE_PRUNE_MAX + 1 rows — within the cap, the
    # range-clustered vectors member is read through the manifest's
    # stats prune and a probe scans only its ~(probed/n_list) file
    # slice; past the cap (a huge query batch probing most lists) the
    # full member is read, which is then the right plan anyway.
    probed = (
        q.select("list_id").distinct().limit(PROBE_PRUNE_MAX + 1).collect()
    )
    predicates = (
        {"list_id": {r.list_id for r in probed}}
        if len(probed) <= PROBE_PRUNE_MAX
        else None
    )
    vectors = commit.read_table_pruned(
        host, f"{index_path}/{VECTORS_MEMBER}", predicates=predicates
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "list_id",
        F.col("nv").alias("cv"),
    )
    scored = (
        vectors.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", dot("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "list_id", "neighbor_id", "cosine_sim", "rnk")
    )


def extend_ivf_index(
    new_vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
    app_meta: dict | None = None,
    expected_app: dict | None = None,
) -> int:
    """Index a batch of NEW vectors under the COMMITTED quantizer —
    assign via the broadcast join, normalize once, append to the
    vectors member: O(batch) work, no retrain, no member rewrite, and
    every untouched file carried forward. The quantizer drifts as the
    corpus grows (appended vectors do not move centroids) — the
    standard IVF posture; rebuild when recall degrades. Append-only
    ids by contract: re-adding an id duplicates it (use
    ``build_ivf_index`` for corrections). ``app_meta`` commits
    atomically with the rows (``sync_ivf_index``'s cursor). Returns
    the number of vectors added."""
    spark = new_vectors.sparkSession
    host = _host(spark, fs)
    commit = ManifestCommit()
    if not commit.table_exists(host, f"{index_path}/{CENTROIDS_MEMBER}"):
        raise ValidationError(
            f"extend_ivf_index: no index at {index_path!r} — run "
            "build_ivf_index first"
        )
    cent_df = commit.read_table(host, f"{index_path}/{CENTROIDS_MEMBER}")
    unit = _unit_rows(new_vectors, id_col, vec_col)
    assigned = assign_lists_join(unit, cent_df).select(
        F.col("_id").alias(id_col),
        F.col("list_id"),
        F.col("_nv").alias("nv"),
    ).localCheckpoint(eager=False)  # count + clustered write below
    n = assigned.count()
    # size the appended files to the batch (one tiny file for a
    # micro-batch, several list-banded files for a bulk backfill)
    n_files = max(1, min(64, n // 500_000 + 1))
    assigned = assigned.repartitionByRange(
        n_files, "list_id"
    ).sortWithinPartitions("list_id")
    if n == 0 and app_meta is None:
        return 0
    commit.append_table_with_meta(
        host,
        f"{index_path}/{VECTORS_MEMBER}",
        assigned if n else None,
        app_meta or {},
        expected_app=expected_app,
    )
    return n


#: app-map key recording the corpus manifest version the index covers
IVF_CURSOR = "ivf:corpus_version"


def sync_ivf_index(
    spark: SparkSession,
    index_path: str,
    corpus_path: str,
    n_list: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fs=None,
) -> dict:
    """Keep the persistent IVF index in lock-step with a manifest
    corpus table, exactly-once: the corpus version the index covers
    lives in the index root's ``app`` map, every sync reads ONLY the
    rows appended since it (``read_changes``), and the new
    assignments commit atomically with the advanced cursor — a crash
    replays to the uninterrupted state, never double-indexing.

    First sync (or a non-append corpus history — compaction,
    overwrite) trains/rebuilds from the full corpus snapshot at the
    pinned version, cursor riding the same atomic swap. Returns
    {"mode": "build" | "incremental" | "noop", "n": vectors added
    or indexed}."""
    from redis_lsm_timeseries_spark.errors import (
        NonAppendHistoryError,
        VersionNotFoundError,
    )

    host = _host(spark, fs)
    commit = ManifestCommit()
    versions = commit.table_versions(host, corpus_path)
    if not versions:
        raise ValidationError(
            f"sync_ivf_index: corpus {corpus_path!r} is not a "
            "manifest-managed table"
        )
    latest = versions[-1]
    cursor = commit.read_app_meta(host, index_path).get(IVF_CURSOR)

    def rebuild():
        snap = commit.read_table(
            host, corpus_path, None, version=latest
        )
        r = build_ivf_index(
            snap, index_path, n_list=n_list, iters=iters,
            id_col=id_col, vec_col=vec_col, fs=fs,
            app_meta={IVF_CURSOR: latest},
            expected_app={IVF_CURSOR: cursor},
        )
        return {"mode": "build", "n": r["n_vectors"]}

    if cursor is None:
        return rebuild()
    since = int(cursor)
    if since == latest:
        return {"mode": "noop", "n": 0}
    if since > latest:
        raise ValidationError(
            f"sync_ivf_index: cursor {since} is ahead of corpus "
            f"version {latest} — the corpus log was rebuilt; delete "
            "the index to restart"
        )
    try:
        delta = commit.read_changes(
            host, corpus_path, since, to_version=latest
        )
    except (NonAppendHistoryError, VersionNotFoundError):
        # non-append history OR a cursor so stale vacuum pruned its
        # version from the corpus log: rebuild from the snapshot
        return rebuild()
    n = extend_ivf_index(
        delta, index_path, id_col=id_col, vec_col=vec_col, fs=fs,
        app_meta={IVF_CURSOR: latest},
        expected_app={IVF_CURSOR: cursor},
    )
    return {"mode": "incremental", "n": n}
