"""JSONL source: parquet -> JSONL -> parquet value-exact round-trip,
corrupt-line quarantine, schema-mismatch capture."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_SCHEMA,
    read_jsonl,
    write_jsonl,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_roundtrip_is_value_exact(spark, docs, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, num_shards=4)
    good, quarantined = read_jsonl(spark, path)
    assert quarantined.count() == 0
    assert good.schema == DOCUMENTS_SCHEMA
    # exact set equality both directions via exceptAll
    assert good.exceptAll(docs).count() == 0
    assert docs.exceptAll(good).count() == 0


def test_corrupt_lines_quarantine_without_poisoning(spark, docs, tmp_path):
    path = tmp_path / "dirty"
    path.mkdir()
    n_good = 0
    with open(path / "part-0.jsonl", "w") as f:
        for r in docs.limit(10).collect():
            f.write(json.dumps(r.asDict()) + "\n")
            n_good += 1
        f.write("{not json at all\n")
        f.write('["an", "array", "line"]\n')
        f.write("plain text line\n")
    good, quarantined = read_jsonl(spark, str(path))
    assert good.count() == n_good
    bad = sorted(r.raw_line for r in quarantined.collect())
    assert len(bad) == 3
    assert "{not json at all" in bad
    assert CORRUPT_COL not in good.columns
    # parsed values intact despite the junk neighbors
    assert (
        good.agg(F.sum("n_chars")).first()[0]
        == docs.limit(10).agg(F.sum("n_chars")).first()[0]
    )


def test_type_mismatch_lines_quarantine(spark, tmp_path):
    """A line that is valid JSON but mismatches the schema's types
    (string where a BIGINT is declared) quarantines too."""
    path = tmp_path / "mismatch"
    path.mkdir()
    with open(path / "part-0.jsonl", "w") as f:
        f.write(
            '{"doc_id": 1, "text": "ok", "lang": "en", '
            '"source": "s", "n_chars": 2}\n'
        )
        f.write(
            '{"doc_id": "NOT_A_NUMBER", "text": "bad", "lang": "en", '
            '"source": "s", "n_chars": 3}\n'
        )
    good, quarantined = read_jsonl(spark, str(path))
    assert good.count() == 1
    assert good.first().doc_id == 1
    assert quarantined.count() == 1
    assert "NOT_A_NUMBER" in quarantined.first().raw_line


def test_missing_fields_null_fill(spark, tmp_path):
    """JSONL with absent optional fields parses with nulls (schema
    evolution across dumps), not quarantine."""
    path = tmp_path / "sparse"
    path.mkdir()
    with open(path / "part-0.jsonl", "w") as f:
        f.write('{"doc_id": 7, "text": "hello world"}\n')
    good, quarantined = read_jsonl(spark, str(path))
    assert quarantined.count() == 0
    row = good.first()
    assert row.doc_id == 7 and row.text == "hello world"
    assert row.lang is None and row.n_chars is None
