"""Loaders for the driver-generated testdata (TESTDATA.md).

Tables: TPC-H-ish star schema + an ``events`` stream table +
LLM-pipeline ``documents``/``embeddings``. All Parquet, one file per
table, read with pushdown enabled — filters and projections in the
query catalog reach the scan.

``events.ts`` has shipped in two representations across driver
versions: Parquet ``TIMESTAMP(NANOS)`` (which Spark 4 only reads as
int64 via ``spark.sql.legacy.parquet.nanosAsLong``) and plain
``timestamp[us]`` (which Spark infers as ``TIMESTAMP_NTZ``). The
loaders here are SCHEMA-ADAPTIVE: they branch on the type Spark
actually infers and normalize to the same output columns either way,
using exact int64 arithmetic (never a double round-trip) so epoch
values are bit-identical to what DuckDB computes on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Wall-clock micros since epoch for a TIMESTAMP_NTZ column, computed as
#: pure datetime arithmetic (no session-timezone dependence). Matches
#: DuckDB's ``epoch_us(ts)`` on the same naive-timestamp parquet column.
_NTZ_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}


def _read_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nanosAsLong is a no-op for non-NANOS files, so setting it
    # unconditionally keeps a single read path for both representations.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_epoch_us_sql(ts_type: T.DataType) -> str:
    """SQL expression yielding exact int64 epoch-MICROSECONDS for the
    ``ts`` column under whichever type the testdata shipped with."""
    if isinstance(ts_type, T.LongType):
        return "ts div 1000"  # raw int64 nanoseconds (legacy NANOS files)
    if isinstance(ts_type, T.TimestampNTZType):
        return _NTZ_EPOCH_US
    if isinstance(ts_type, T.TimestampType):
        return "unix_micros(ts)"
    raise TypeError(f"unsupported events.ts type: {ts_type}")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events normalized to ``ts_ns`` (int64 epoch ns), ``ts_ms``
    (int64 epoch ms), and ``ts`` (microsecond-precision TIMESTAMP) —
    matching what DuckDB sees when it reads the same file, whether the
    file stores int64-nanos or timestamp[us]."""
    raw = _read_events_raw(spark, sf_dir)
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # `div` is exact int64 division — a double round-trip would lose
        # precision above 2^53 and could flip a millisecond boundary.
        ts_ns = F.col("ts")
        ts_ms = F.expr("ts div 1000000")
        ts_out = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        us = events_epoch_us_sql(ts_type)
        ts_ns = F.expr(f"{us} * 1000")
        ts_ms = F.expr(f"{us} div 1000")
        ts_out = (
            F.col("ts").cast("timestamp")
            if isinstance(ts_type, T.TimestampType)
            else F.timestamp_micros(F.expr(us))
        )
    return raw.select(
        "event_id",
        ts_ns.alias("ts_ns"),
        ts_ms.alias("ts_ms"),
        ts_out.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_stream_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Explicit schema for ``readStream`` over the events file, adapted
    to the file's actual ``ts`` representation. For timestamp-typed
    files we declare ``TimestampType``: the parquet reader then yields
    the stored int64 micros as the timestamp's internal value verbatim
    (no timezone arithmetic), so ``unix_micros`` recovers the exact
    epoch micros DuckDB sees."""
    batch_ts = _read_events_raw(spark, sf_dir).schema["ts"].dataType
    ts_field = (
        T.LongType() if isinstance(batch_ts, T.LongType) else T.TimestampType()
    )
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming source over the events table, normalized to
    the same columns ``load_events`` emits (``ts`` microsecond
    TIMESTAMP, ``ts_ms`` int64 epoch ms) regardless of the file's ts
    representation. The file stream source requires a DIRECTORY;
    sf_dir holds one parquet file per table, so stream the directory
    with a glob that admits only the events file."""
    schema = events_stream_schema(spark, sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        ts_out = F.timestamp_micros(F.expr("ts div 1000"))
        ts_ms = F.expr("ts div 1000000")
    else:
        ts_out = F.col("ts")
        ts_ms = F.expr("unix_micros(ts) div 1000")
    return raw.select(
        "event_id",
        ts_out.alias("ts"),
        ts_ms.alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_as_samples(spark: SparkSession, sf_dir: str, partition_width: int = 120_000) -> DataFrame:
    """Map the driver's ``events`` table onto the engine sample schema
    (FIXTURES.md §6): ``tag := event_type``, ``ts := epoch ms``,
    ``value := props``, plus a numeric projection ``value_num`` for
    analytics. ``ingest_ts``/``writer_id``/``seq`` are synthesized
    deterministically from the event row so LWW ordering is stable."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        F.col("event_type").alias("tag"),
        F.col("ts_ms").alias("ts"),
        F.col("props").alias("value"),
        F.col("value").alias("value_num"),
        F.col("ts_ms").alias("ingest_ts"),
        F.lit("gen").alias("writer_id"),
        F.col("event_id").alias("seq"),
        (
            F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(partition_width))
        ).alias("part_start"),
        F.col("user_id"),
        F.col("event_id"),
    )
