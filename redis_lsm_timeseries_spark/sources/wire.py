"""Reference wire-format codecs, as distributed Column expressions.

The reference's microservice speaks three concrete formats
(``examples/wrap-it-into-microservice/service.js``):

- ``POST /set`` body: ``{tag: {sortKey: value}}`` (``service.js:22-31``)
- ``POST /get`` response: the same nested-map shape, rebuilt from the
  composed read (``service.js:41-54``)
- cold sink: per-partition text files of ``ts,entryTime,base64(value)``
  lines (``service.js:89-107``)

A user migrating from the reference has these payloads in flight (HTTP
bodies on a queue, cold ``.txt`` archives on disk); this module parses
and produces them as DataFrame transformations — ``from_json`` /
``to_json`` / ``base64`` built-ins, fully JVM-side, so a Kafka topic of
/set bodies or a directory of cold text files ingests at cluster
bandwidth with no driver-side JSON loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Cold-archive value field for a NULL tombstone. `-` is not in the
#: base64 alphabet, so no live value (including '') can collide.
#: FORMAT NOTE: earlier engine builds encoded tombstones as an empty
#: field, indistinguishable from a live ''. This sentinel supersedes
#: that; an archive written by the old encoder parses its tombstones
#: as live empty strings. No such archives persist (the format only
#: ever targeted throwaway test stores), so no migration shim is
#: carried — re-export any long-lived archive with the current encoder.
TOMBSTONE_FIELD = "-"

# {tag: {sortKey: value}} — JSON object keys are strings; the reference
# coerces the sort key with BigInt(time) (service.js:26) and we cast the
# same way. Values may be JSON null (tombstone).
WRITE_PAYLOAD_TYPE = T.MapType(
    T.StringType(), T.MapType(T.StringType(), T.StringType())
)

RANGES_PAYLOAD_TYPE = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("start", T.StringType()),
            T.StructField("end", T.StringType()),
        ]
    ),
)


def parse_write_payloads(
    payloads: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``/set`` bodies -> samples: one row per (tag, ts, value).

    Input: a DataFrame with a string column of JSON bodies (an HTTP
    access log, a Kafka topic's value column). Output columns
    ``tag, ts, value`` feed ``TimeseriesStore.write_df`` directly; every
    OTHER input column rides along unchanged (a Kafka offset or batch id
    stays attached to the samples it produced); rename any input column
    that collides with the output names (``tag``, ``ts``, ``value``)
    before parsing.
    Malformed JSON rows parse to NULL maps and drop out (the engine's
    admission-control analog of the reference's 500 response,
    ``service.js:36-38``); non-integer sort keys fail the cast to NULL
    ts (``try_cast`` — ANSI-safe) and are dropped the same way."""
    passthrough = [c for c in payloads.columns if c != payload_col]
    return (
        payloads.select(
            *passthrough,
            F.explode(
                F.from_json(F.col(payload_col), WRITE_PAYLOAD_TYPE)
            ).alias("tag", "series"),
        )
        .select(
            *passthrough,
            "tag",
            F.explode(F.col("series")).alias("ts_s", "value"),
        )
        .select(
            *passthrough,
            "tag",
            F.col("ts_s").try_cast("long").alias("ts"),
            "value",
        )
        .where(F.col("ts").isNotNull())
    )


def parse_range_payloads(
    payloads: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``/get`` bodies -> one row per (tag, start, end) requested range
    (``service.js:41-48``). Feed the distinct ranges to
    ``TimeseriesStore.read_range`` or join them against the hot table
    as a predicate relation."""
    return (
        payloads.select(
            F.explode(
                F.from_json(F.col(payload_col), RANGES_PAYLOAD_TYPE)
            ).alias("tag", "r")
        )
        .select(
            "tag",
            F.col("r.start").try_cast("long").alias("start"),
            F.col("r.end").try_cast("long").alias("end"),
        )
        .where(F.col("start").isNotNull() & F.col("end").isNotNull())
    )


def encode_read_result(samples: DataFrame) -> DataFrame:
    """Samples -> one ``/get``-response JSON object per tag:
    ``{tag: {ts: value}}`` rebuilt with ``map_from_entries`` + ``to_json``
    (the reference builds the same nested map driver-side,
    ``service.js:49-54``). One row per tag keeps the encode distributed;
    concatenating tags into a single body is the HTTP layer's job."""
    return (
        samples.groupBy("tag")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("ts").cast("string"), F.col("value"))
                    )
                )
            ).alias("series")
        )
        .select(
            "tag",
            F.to_json(F.map_from_arrays(F.array("tag"), F.array("series"))).alias(
                "payload"
            ),
        )
    )


def encode_cold_text_lines(
    samples: DataFrame, entry_time_ms: int
) -> DataFrame:
    """Samples -> the example consumer's cold-archive line format:
    ``ts,entryTime,base64(value)`` with the partition file name
    (``{tag}-{part_start}.txt``, ``service.js:95-98``). Writing is one
    ``partitionBy("file").text(...)`` job.

    Tombstones are an engine extension the reference format can't
    carry (``Buffer.from(String(v))`` never sees null), so a NULL
    value encodes as the out-of-band sentinel ``-`` — not a character
    base64 can emit, so no live value collides with it. A live empty
    string encodes as the reference's own empty field (base64('') is
    ''), and both round-trip losslessly through ``parse``."""
    return samples.select(
        F.concat_ws(
            "-", F.col("tag"), F.col("part_start").cast("string")
        ).alias("file"),
        F.concat_ws(
            ",",
            F.col("ts").cast("string"),
            F.lit(str(entry_time_ms)),
            F.coalesce(
                F.base64(F.col("value").cast("binary")),
                F.lit(TOMBSTONE_FIELD),
            ),
        ).alias("line"),
    )


def parse_cold_text_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Cold-archive lines back to samples (the inverse of
    ``encode_cold_text_lines``; ``split`` + ``unbase64``). ``entry_time``
    is surfaced as ``ingest_ts`` so re-imported archives participate in
    LWW with their archival timestamp."""
    parts = F.split(F.col(line_col), ",", 3)
    # The `-` sentinel (see encode) restores NULL tombstones exactly;
    # every other field — including the empty one a live '' produces —
    # decodes as a live value. A re-imported archive therefore neither
    # resurrects a deletion nor deletes a live empty string.
    return lines.select(
        parts.getItem(0).try_cast("long").alias("ts"),
        parts.getItem(1).try_cast("long").alias("ingest_ts"),
        F.when(
            parts.getItem(2) == TOMBSTONE_FIELD, F.lit(None).cast("string")
        )
        .otherwise(F.unbase64(parts.getItem(2)).cast("string"))
        .alias("value"),
    ).where(F.col("ts").isNotNull())
