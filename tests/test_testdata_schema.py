"""Testdata-schema canary: the driver regenerates the parquet testdata
between rounds and has already changed ``events.ts``'s physical type
once (TIMESTAMP(NANOS) -> timestamp[us]). These tests fail LOUDLY if
the shipped types drift outside what the adaptive loaders handle, and
verify — against DuckDB reading the very same file — that the
normalized epoch columns are bit-exact in the CURRENT representation.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redis_lsm_timeseries_spark.sources.testdata import (
    TABLES,
    events_epoch_us_sql,
    load_events,
    read_events_stream,
)

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


def _events_path(sf_dir: str) -> str:
    return f"{sf_dir}/events.parquet"


#: Column names every catalog query / oracle assumes. A driver-side
#: rename or drop should fail HERE, with the table named, not as a
#: scatter of AnalysisExceptions across 50 catalog entries.
EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_present_with_expected_columns(sf_dir):
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        assert os.path.exists(path), f"missing {t} in {sf_dir}"
        got = set(pq.read_schema(path).names)
        missing = EXPECTED_COLUMNS[t] - got
        assert not missing, f"{t} in {sf_dir} lost columns {sorted(missing)}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_dim_is_pinned(sf_dir):
    """The hyperplane LSH entries embed dim-64 plane literals in the
    plan (similarity.plane_components; the `array_repeat(nrm, 64)`
    normalization in llm_queries) — a driver-side regeneration with a
    different dimension must fail HERE with the table named, not as a
    subtle band mismatch across three embeddings catalog entries."""
    con = duckdb.connect()
    dims = con.execute(
        f"SELECT DISTINCT len(embedding) FROM "
        f"'{sf_dir}/embeddings.parquet'"
    ).fetchall()
    con.close()
    assert dims == [(64,)], (
        f"embeddings in {sf_dir} shipped dims {dims}; the LSH plane "
        f"literals and norm expressions assume 64 — update "
        f"similarity.NUM/dim call sites together"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_physical_type_is_handled(sf_dir):
    """The loader supports exactly: int64 (raw nanos), timestamp[ns]
    (read as int64 via nanosAsLong), timestamp[us/ms/s] (read as
    TIMESTAMP). Anything else must fail here, not as 20 silent catalog
    errors."""
    import pyarrow.types as pat

    t = pq.read_schema(_events_path(sf_dir)).field("ts").type
    ok = pat.is_int64(t) or pat.is_timestamp(t)
    assert ok, f"events.ts shipped as unhandled physical type {t} in {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_load_events_normalized_schema(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    got = {f.name: f.dataType for f in ev.schema.fields}
    assert isinstance(got["ts_ns"], T.LongType)
    assert isinstance(got["ts_ms"], T.LongType)
    assert isinstance(got["ts"], T.TimestampType)
    # events_epoch_us_sql must accept the type Spark actually infers
    raw_type = (
        spark.read.parquet(_events_path(sf_dir)).schema["ts"].dataType
    )
    assert events_epoch_us_sql(raw_type)


@pytest.mark.skipif(not SF_DIRS, reason="no testdata directories present")
def test_load_events_epoch_values_match_duckdb(spark):
    """Differential check of the normalization itself: Spark's ts_ms /
    ts_ns / ts against DuckDB reading the same file, joined on
    event_id, compared exactly."""
    sf_dir = SF_DIRS[0]
    ev = (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            "ts_ns",
            "ts_ms",
            F.unix_micros("ts").alias("ts_us"),
        )
        .orderBy("event_id")
        .limit(200)
        .collect()
    )
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"""
            SELECT event_id, epoch_ns(ts), epoch_ms(ts), epoch_us(ts)
            FROM '{_events_path(sf_dir)}'
            ORDER BY event_id LIMIT 200
            """
        ).fetchall()
    }
    assert len(ev) == len(want) > 0
    for r in ev:
        assert (r.ts_ns, r.ts_ms, r.ts_us) == want[r.event_id], r.event_id


def test_both_ts_representations_normalize_identically(spark, tmp_path):
    """The SAME logical events written as int64-nanos (the old driver
    format, TIMESTAMP(NANOS)-style) and as timestamp[us] (the current
    one) must load to identical normalized rows. The real testdata only
    exercises one branch at a time; this keeps the other from rotting."""
    import pyarrow as pa

    micros = [1_704_067_200_000_000, 1_704_067_200_123_456, 1_706_657_176_220_708]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(["x", "y", "z"]),
    }
    ns_dir = tmp_path / "ns_repr"
    us_dir = tmp_path / "us_repr"
    for d in (ns_dir, us_dir):
        d.mkdir()
    pq.write_table(
        pa.table({**cols, "ts": pa.array([m * 1000 for m in micros], pa.int64())}),
        str(ns_dir / "events.parquet"),
    )
    pq.write_table(
        pa.table({**cols, "ts": pa.array(micros, pa.timestamp("us"))}),
        str(us_dir / "events.parquet"),
    )

    def rows(sf_dir):
        return [
            (r.event_id, r.ts_ns, r.ts_ms, r.ts, r.user_id, r.event_type)
            for r in load_events(spark, str(sf_dir)).orderBy("event_id").collect()
        ]

    got_ns, got_us = rows(ns_dir), rows(us_dir)
    assert got_ns == got_us
    assert [r[1] for r in got_us] == [m * 1000 for m in micros]  # ts_ns
    assert [r[2] for r in got_us] == [m // 1000 for m in micros]  # ts_ms

    # The STREAMING reader's schema branch must agree in both worlds
    # too (the LongType branch is otherwise exercised by no real data).
    import uuid

    for d in (ns_dir, us_dir):
        sink = f"repr_{uuid.uuid4().hex[:8]}"
        q = (
            read_events_stream(spark, str(d))
            .select("event_id", F.unix_micros("ts").alias("us"), "ts_ms")
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        streamed = {
            r.event_id: (r.us, r.ts_ms)
            for r in spark.table(sink).collect()
        }
        assert streamed == {
            i + 1: (m, m // 1000) for i, m in enumerate(micros)
        }, d


@pytest.mark.skipif(not SF_DIRS, reason="no testdata directories present")
def test_stream_read_matches_batch_read(spark):
    """The streaming source's explicit schema must recover the same
    epoch micros as the batch loader — the round-5 silent-wrong-answer
    mode (LongType schema over timestamp[us] data) dies here."""
    import uuid

    sf_dir = SF_DIRS[0]
    sink = f"canary_{uuid.uuid4().hex[:8]}"
    agg = (
        read_events_stream(spark, sf_dir)
        .select(F.unix_micros("ts").alias("us"), "ts_ms")
        .groupBy()
        .agg(
            F.min("us").alias("mn_us"),
            F.max("us").alias("mx_us"),
            F.sum("ts_ms").alias("sum_ms"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(sink).collect()[0]
    want = (
        load_events(spark, sf_dir)
        .select(F.unix_micros("ts").alias("us"), "ts_ms")
        .groupBy()
        .agg(
            F.min("us").alias("mn_us"),
            F.max("us").alias("mx_us"),
            F.sum("ts_ms").alias("sum_ms"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert (got.mn_us, got.mx_us, got.sum_ms, got.n) == (
        want.mn_us,
        want.mx_us,
        want.sum_ms,
        want.n,
    )
