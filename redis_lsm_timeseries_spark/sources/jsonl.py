"""JSONL document source: the wire format raw text corpora actually
arrive in (crawl dumps, API exports — one JSON object per line).

Design points for the 100 TB path:

- **Schema is explicit, never inferred.** `spark.read.json` without a
  schema runs a full extra pass over the data to infer one, and the
  inferred type can drift between dumps (a column that happens to be
  all-null in one shard becomes STRING in another). Callers pass a
  StructType (or use ``DOCUMENTS_SCHEMA``); the scan is single-pass.
- **Corrupt lines quarantine instead of poisoning the job.**
  PERMISSIVE mode routes unparseable lines into a corrupt-record
  column; ``read_jsonl`` splits the result into (good, quarantined)
  so ingestion proceeds and the junk is auditable — the same
  admission-control posture as the reference's write validation
  (``index.js:91-101`` rejects malformed pairs per-entry, not
  per-batch).
- **Line-splittable.** JSONL (unlike a JSON array) splits on newlines,
  so Spark assigns file ranges to tasks without coordination;
  ``maxPartitionBytes`` controls granularity exactly as for parquet.
- **Round-trip.** ``write_jsonl`` writes shards suitable for feeding
  back through ``read_jsonl`` (tests prove value-exact round-trips
  against the parquet originals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt_record"

# The documents table's wire schema (TESTDATA.md). The corrupt-record
# column must be declared in the read schema for PERMISSIVE capture.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with an explicit schema.

    Returns ``(good, quarantined)``:
    - ``good`` — rows that parsed, with exactly ``schema``'s columns;
    - ``quarantined`` — one ``raw_line`` string column holding each
      line that failed to parse (or that parsed to a JSON type
      mismatching the schema), for offline audit.

    Implementation: a TEXT scan + ``from_json``, not
    ``spark.read.json``. Two reasons: (a) Spark forbids querying only
    the corrupt-record column from a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) and its documented workaround
    is ``cache()`` — a non-starter for a 100 TB corpus; (b) the text
    scan keeps the ORIGINAL line for the quarantine verbatim, where
    the JSON reader's corrupt column holds a re-rendering. Both
    branches are map-side filters over the same single-pass scan."""
    raw = spark.read.text(path).withColumn(
        "_parsed",
        F.from_json(
            F.col("value"),
            _with_corrupt(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    data_cols = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    ok = F.col("_parsed").isNotNull() & F.col(
        f"_parsed.{CORRUPT_COL}"
    ).isNull()
    good = raw.where(ok).select(
        *[F.col(f"_parsed.{c}").alias(c) for c in data_cols]
    )
    quarantined = raw.where(~ok).select(F.col("value").alias("raw_line"))
    return good, quarantined


def write_jsonl(df: DataFrame, path: str, num_shards: int | None = None) -> None:
    """Write a corpus as JSONL shards. ``num_shards`` repartitions
    first (round-robin — shard sizing, not semantics); omit it to
    keep the upstream partitioning and avoid the shuffle."""
    out = df.repartition(num_shards) if num_shards else df
    out.write.mode("overwrite").json(path)
