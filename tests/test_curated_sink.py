"""Curated-corpus sink: end-to-end split -> curate -> write -> read
back with partition pruning, manifest consistency, drop accounting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.pipeline import curate_corpus
from redis_lsm_timeseries_spark.operators.sampling import hash_split
from redis_lsm_timeseries_spark.sources.curated import (
    read_curated,
    read_manifest,
    write_curated,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    split = hash_split(docs, {"train": 800, "val": 200}, "doc_id")
    return curate_corpus(split).localCheckpoint()


@pytest.fixture(scope="module")
def written(curated, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "corpus")
    manifest = write_curated(curated, path)
    return path, manifest


def test_manifest_accounts_for_every_row(curated, written):
    _, manifest = written
    assert (
        manifest["n_kept"] + manifest["n_dropped"] == curated.count()
    )
    assert manifest["n_kept"] == curated.where("keep").count()
    assert sum(manifest["partitions"].values()) == manifest["n_kept"]


def test_roundtrip_and_pruning(spark, curated, written):
    path, manifest = written
    back = read_curated(spark, path)
    assert back.count() == manifest["n_kept"]
    # keeps only
    kept_ids = {r.doc_id for r in curated.where("keep").collect()}
    assert {r.doc_id for r in back.collect()} == kept_ids
    # per-partition read matches the manifest count exactly
    some = next(iter(manifest["partitions"]))
    split, source = some.split("/")
    pruned = read_curated(spark, path, split=split, source=source)
    assert pruned.count() == manifest["partitions"][some]
    # the filter reaches the partition columns (pruned scan)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "partitionFilters" in plan


def test_manifest_readback(spark, written):
    path, manifest = written
    assert read_manifest(spark, path) == manifest


def test_manifest_invisible_to_corpus_reads(spark, written):
    path, _ = written
    back = read_curated(spark, path)
    assert "value" not in back.columns  # no stray text-file columns


def _parquet_files(dirpath: str) -> list[str]:
    return [
        os.path.join(root, f)
        for root, _, files in os.walk(dirpath)
        for f in files
        if f.endswith(".parquet")
    ]


def test_skewed_partition_written_by_many_tasks(spark, tmp_path):
    """The write-funnel guard: a (split, source) holding ~95% of the
    corpus must be written as multiple files (= by multiple tasks),
    bounded by the derived n_files — never one giant single-writer
    file, never an unbounded small-file spray."""
    rows = [(i, f"document body number {i}", "train", "web", True)
            for i in range(950)]
    rows += [(1000 + i, f"tail doc {i}", "val", "books", True)
             for i in range(50)]
    curated = spark.createDataFrame(
        rows, "doc_id long, text string, split string, source string, "
              "keep boolean",
    )
    path = str(tmp_path / "skew")
    manifest = write_curated(curated, path, target_rows_per_file=100)
    # 950 rows / 100 per file -> 10 shards for the hot partition
    assert manifest["n_files"]["train/web"] == 10
    assert manifest["n_files"]["val/books"] == 1
    hot_files = _parquet_files(f"{path}/split=train/source=web")
    cold_files = _parquet_files(f"{path}/split=val/source=books")
    assert 1 < len(hot_files) <= 10, hot_files
    assert len(cold_files) == 1, cold_files
    # layout change loses no rows
    back = read_curated(spark, path)
    assert back.count() == 1000
    assert read_curated(spark, path, split="train").count() == 950


def test_default_write_is_one_file_per_small_partition(spark, tmp_path):
    """With the default 1M-row target, small partitions still produce
    exactly one file each — the small-file control the shard key must
    not regress."""
    rows = [(i, f"doc {i}", "train" if i % 2 else "val", "web", True)
            for i in range(100)]
    curated = spark.createDataFrame(
        rows, "doc_id long, text string, split string, source string, "
              "keep boolean",
    )
    path = str(tmp_path / "small")
    manifest = write_curated(curated, path)
    assert set(manifest["n_files"].values()) == {1}
    for part in manifest["partitions"]:
        split, source = part.split("/")
        files = _parquet_files(f"{path}/split={split}/source={source}")
        assert len(files) == 1, (part, files)


def test_non_string_partition_columns_keep_shard_fanout(spark, tmp_path):
    """ADVICE r8: the shards_df join schema derives from the curated
    column types — with integer split/source columns the equi-join
    must still key correctly, preserving the multi-file fanout for
    skewed partitions instead of silently falling back to one writer."""
    rows = [(i, f"document body number {i}", 1, 7, True)
            for i in range(400)]
    rows += [(1000 + i, f"tail doc {i}", 2, 8, True) for i in range(40)]
    curated = spark.createDataFrame(
        rows, "doc_id long, text string, split int, source int, "
              "keep boolean",
    )
    path = str(tmp_path / "intkeys")
    manifest = write_curated(curated, path, target_rows_per_file=100)
    assert manifest["n_files"]["1/7"] == 4
    hot_files = _parquet_files(f"{path}/split=1/source=7")
    assert 1 < len(hot_files) <= 4, hot_files
    back = read_curated(spark, path)
    assert back.count() == 440
