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
