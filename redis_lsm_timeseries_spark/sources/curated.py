"""Curated-corpus sink: persist the curation pipeline's output the
way a training job wants to read it back — Parquet partitioned by
(split, source), keeps-only, with the audit columns alongside and a
one-file JSON manifest recording what was written.

Scale notes:
- Partitioning by (split, source) gives the training reader free
  partition pruning ("train shard of source X" touches one
  directory) and matches the hot store's layout discipline
  (`store.py`: partition columns ARE the read predicate).
- The writer repartitions by the partition columns first so each
  (split, source) directory is written by the tasks owning its rows —
  without it every task appends a file into every directory
  (tasks × partitions small files, the classic 100 TB
  dynamic-partition mistake).
- The manifest is computed from the SAME DataFrame in one aggregate
  and written via the filesystem seam (`fs.py`), not collected row
  data — it carries counts, not content.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "_curation_manifest.json"


def write_curated(
    curated: DataFrame,
    path: str,
    split_col: str = "split",
    source_col: str = "source",
    keep_col: str = "keep",
) -> dict:
    """Write kept rows partitioned by (split, source); returns (and
    persists) the manifest: per-partition row counts plus the global
    kept/dropped tally.

    Rows where ``keep`` is false are NOT silently lost — they are
    counted into the manifest's ``n_dropped`` so the write is
    auditable against the curation report."""
    spark = curated.sparkSession
    kept = curated.where(F.col(keep_col))
    (
        kept.repartition(F.col(split_col), F.col(source_col))
        .write.partitionBy(split_col, source_col)
        .mode("overwrite")
        .parquet(path)
    )
    stats = (
        curated.groupBy(
            F.col(keep_col).alias("keep"),
            F.col(split_col).alias("split"),
            F.col(source_col).alias("source"),
        )
        .count()
        .collect()
    )
    partitions = {
        f"{r.split}/{r.source}": r["count"] for r in stats if r.keep
    }
    manifest = {
        "partitions": partitions,
        "n_kept": sum(partitions.values()),
        "n_dropped": sum(r["count"] for r in stats if not r.keep),
        "partition_cols": [split_col, source_col],
    }
    _write_manifest(spark, f"{path}/{MANIFEST_NAME}", manifest)
    return manifest


def read_curated(
    spark: SparkSession,
    path: str,
    split: str | None = None,
    source: str | None = None,
    split_col: str = "split",
    source_col: str = "source",
) -> DataFrame:
    """Read a curated corpus back, optionally pruned to one split /
    source — the filters land on the partition columns, so Spark
    lists only the matching directories."""
    df = spark.read.parquet(path)
    if split is not None:
        df = df.where(F.col(split_col) == split)
    if source is not None:
        df = df.where(F.col(source_col) == source)
    return df


def read_manifest(spark: SparkSession, path: str) -> dict:
    """Load the manifest written by ``write_curated``. Read through
    the Hadoop FS API (as written): Spark's readers skip
    underscore-prefixed files even when the path names one explicitly
    — the same convention that hides it from corpus reads."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{MANIFEST_NAME}")
    fs = hpath.getFileSystem(conf)
    stream = fs.open(hpath)
    try:
        # read JVM-side: py4j passes byte arrays BY VALUE, so a
        # readFully into a Python bytearray would mutate only a copy
        raw = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(raw)


def _write_manifest(spark: SparkSession, file_path: str, manifest: dict) -> None:
    # one tiny JSON file; go through the JVM Hadoop FS so the path
    # semantics match the parquet writer's (local, HDFS, object store)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = hpath.getFileSystem(conf)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True), "utf-8"))
    finally:
        out.close()
