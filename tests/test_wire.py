"""Reference wire-format codecs (sources/wire.py): /set and /get JSON
bodies and the example consumer's cold text-archive lines, round-tripped
as DataFrame transformations (service.js:22-54, 89-107)."""

from __future__ import annotations

import base64
import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.sources.wire import (
    encode_cold_text_lines,
    encode_read_result,
    parse_cold_text_lines,
    parse_range_payloads,
    parse_write_payloads,
)


def _payloads(spark, bodies):
    return spark.createDataFrame([(json.dumps(b),) for b in bodies], ["payload"])


class TestWritePayloads:
    def test_set_body_parses_to_samples(self, spark):
        bodies = [
            {"GapTag": {"1": "One", "2": "Two"}, "SerialTag": {"3": "Three"}},
            {"GapTag": {"10": "Ten"}},
        ]
        out = {
            (r.tag, r.ts): r.value
            for r in parse_write_payloads(_payloads(spark, bodies)).collect()
        }
        assert out == {
            ("GapTag", 1): "One",
            ("GapTag", 2): "Two",
            ("SerialTag", 3): "Three",
            ("GapTag", 10): "Ten",
        }

    def test_bigint_scale_keys_and_malformed_rows(self, spark):
        """BigInt-range sort keys survive the cast; malformed JSON and
        non-integer keys drop (the 500-response analog)."""
        big = str((1 << 60) + 7)
        df = spark.createDataFrame(
            [
                (json.dumps({"T": {big: "v"}}),),
                ("not json at all",),
                (json.dumps({"T": {"abc": "v"}}),),
            ],
            ["payload"],
        )
        rows = parse_write_payloads(df).collect()
        assert [(r.tag, r.ts, r.value) for r in rows] == [
            ("T", (1 << 60) + 7, "v")
        ]

    def test_feeds_write_df_roundtrip(self, spark, store):
        bodies = [{"WireTag": {"1": "a", "6": "b"}}]
        store.write_df(parse_write_payloads(_payloads(spark, bodies)), ingest_ts=1000)
        got = {
            (r.tag, r.ts): r.value
            for r in store.read_range({"WireTag": (0, 100)}).collect()
        }
        assert got == {("WireTag", 1): "a", ("WireTag", 6): "b"}


class TestRangeAndResult:
    def test_get_body_parses_to_ranges(self, spark):
        bodies = [{"A": {"start": "0", "end": "50"}, "B": {"start": "5", "end": "9"}}]
        out = {
            r.tag: (r.start, r.end)
            for r in parse_range_payloads(_payloads(spark, bodies)).collect()
        }
        assert out == {"A": (0, 50), "B": (5, 9)}

    def test_read_result_encodes_reference_shape(self, spark):
        samples = spark.createDataFrame(
            [("A", 2, "two"), ("A", 1, "one"), ("B", 9, "nine")],
            ["tag", "ts", "value"],
        )
        rows = {r.tag: json.loads(r.payload) for r in encode_read_result(samples).collect()}
        assert rows == {
            "A": {"A": {"1": "one", "2": "two"}},
            "B": {"B": {"9": "nine"}},
        }


_body = st.dictionaries(
    keys=st.text(alphabet="abzAB-.", min_size=1, max_size=8),
    values=st.dictionaries(
        keys=st.integers(min_value=0, max_value=1 << 60).map(str),
        values=st.text(alphabet="xyz09,\"\\", max_size=6),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)


class TestWireProperties:
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(bodies=st.lists(_body, min_size=1, max_size=3))
    def test_parse_recovers_every_sample(self, spark, bodies):
        """For ANY batch of /set bodies — tags with separators, values
        holding JSON metacharacters, BigInt-scale keys — the parsed
        sample multiset equals what a Python reader of the same JSON
        sees (per-payload maps collapse duplicate (tag, ts) to the
        JSON object's last key, as json.loads does)."""
        want = set()
        for i, b in enumerate(bodies):
            for tag, series in b.items():
                for ts_s, v in series.items():
                    want.add((i, tag, int(ts_s), v))
        df = spark.createDataFrame(
            [(i, json.dumps(b)) for i, b in enumerate(bodies)],
            ["body_id", "payload"],
        )
        got = {
            (r.body_id, r.tag, r.ts, r.value)
            for r in parse_write_payloads(df).select(
                "body_id", "tag", "ts", "value"
            ).collect()
        }
        assert got == want

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        samples=st.lists(
            st.tuples(
                st.sampled_from(("A", "B-1", "täg")),  # incl. '-' + unicode
                st.integers(min_value=-(10**15), max_value=10**15),
                st.one_of(
                    st.none(),  # tombstone
                    st.just(""),  # LIVE empty string — must stay live
                    st.text(max_size=8),  # arbitrary unicode values
                ),
            ),
            min_size=1,
            max_size=10,
            unique_by=lambda s: (s[0], s[1]),
        )
    )
    def test_cold_archive_roundtrip_lossless(self, spark, samples):
        """encode -> parse is the identity on (ts, value) for ANY
        sample set: tombstones come back as NULL, live empty strings as
        '', unicode values byte-exact — the two directions the sentinel
        format exists to keep apart."""
        from redis_lsm_timeseries_spark.sources.wire import (
            encode_cold_text_lines,
            parse_cold_text_lines,
        )

        df = spark.createDataFrame(
            [(t, ts, v, 0) for t, ts, v in samples],
            "tag STRING, ts LONG, value STRING, part_start LONG",
        )
        lines = encode_cold_text_lines(df, entry_time_ms=77).select("line")
        back = {
            (r.ts, r.value)
            for r in parse_cold_text_lines(lines).collect()
        }
        assert back == {(ts, v) for _, ts, v in samples}


class TestWireStreamingIngest:
    def test_set_body_stream_ingests_into_hot_store(self, spark, store, tmp_path):
        """The migration path end-to-end: a stream of reference /set
        JSON bodies (text files standing in for a Kafka topic) parses
        through the wire codec and ingests via start_hot_ingest; the
        composed range read returns every sample."""
        from redis_lsm_timeseries_spark.streaming.ingest import start_hot_ingest

        inp = tmp_path / "bodies"
        inp.mkdir()
        (inp / "b0.jsonl").write_text(
            json.dumps({"GapTag": {"1": "One", "2": "Two"}}) + "\n"
        )
        (inp / "b1.jsonl").write_text(
            json.dumps({"SerialTag": {"3": "Three"}}) + "\n"
        )
        stream = parse_write_payloads(
            spark.readStream.text(str(inp)), payload_col="value"
        )
        q = start_hot_ingest(store, stream, str(tmp_path / "ckpt"))
        assert q.awaitTermination(120)
        out = {
            (r.tag, r.ts): r.value
            for r in store.read_range(
                {"GapTag": (0, 100), "SerialTag": (0, 100)}
            ).collect()
        }
        assert out == {
            ("GapTag", 1): "One",
            ("GapTag", 2): "Two",
            ("SerialTag", 3): "Three",
        }


class TestColdTextArchive:
    def test_lines_match_reference_format_and_roundtrip(self, spark):
        samples = spark.createDataFrame(
            [
                ("GapTag", 1, "One", 0),
                ("GapTag", 7, None, 5),  # tombstone
                ("GapTag", 9, "", 5),  # LIVE empty string
            ],
            ["tag", "ts", "value", "part_start"],
        )
        lines = encode_cold_text_lines(samples, entry_time_ms=1234).collect()
        by_ts = {int(line.line.split(",")[0]): line for line in lines}
        assert by_ts[1].file == "GapTag-0"
        ts, entry, b64 = by_ts[1].line.split(",")
        assert (ts, entry) == ("1", "1234")
        assert base64.b64decode(b64).decode() == "One"
        assert by_ts[7].line.endswith(",1234,-")  # NULL -> sentinel
        assert by_ts[9].line.endswith(",1234,")  # '' -> reference empty

        back = parse_cold_text_lines(
            spark.createDataFrame([(line.line,) for line in lines], ["line"])
        ).collect()
        # Both directions must survive the round-trip: the tombstone as
        # NULL (an empty-string member would be a LIVE value that wins
        # LWW and resurrects the deletion on re-import), and the live
        # empty string as '' (a NULL would silently delete it).
        assert {(r.ts, r.ingest_ts, r.value) for r in back} == {
            (1, 1234, "One"),
            (7, 1234, None),
            (9, 1234, ""),
        }
