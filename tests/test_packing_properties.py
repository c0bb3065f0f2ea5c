"""Hypothesis fuzz of the packing layout: for ANY corpus (random
texts including empty/whitespace docs, random window size and shard
count), the layout invariants hold — gapless streams, correct window
arithmetic, manifest tiling, lossless reconstruction."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.packing import (
    materialize_windows,
    pack_documents,
    window_manifest,
)

_word = st.text(
    alphabet=st.sampled_from("abcxyz019"), min_size=1, max_size=6
)
_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(_word, min_size=1, max_size=30).map(" ".join),
    # irregular whitespace between words
    st.lists(_word, min_size=1, max_size=10).map("  \t ".join),
)
_doc = st.tuples(st.integers(0, 10_000), _text, st.sampled_from("pq"))


class TestPackingProperties:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(_doc, min_size=1, max_size=25, unique_by=lambda r: r[0]),
        window=st.integers(1, 40),
        shards=st.integers(1, 4),
    )
    def test_layout_invariants(self, spark, rows, window, shards):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        packed = pack_documents(
            df, window_tokens=window, num_shards=shards
        ).collect()

        # reconstruct each stream driver-side and check every doc's
        # placement against first-principles arithmetic
        streams: dict[tuple, list] = {}
        toks = {
            r[0]: [t for t in r[1].lower().split() if t] for r in rows
        }
        for p in sorted(packed, key=lambda r: (r.source, r.shard, r.doc_id)):
            streams.setdefault((p.source, p.shard), []).append(p)
        for stream in streams.values():
            offset = 0
            for p in stream:
                assert p.n_tokens == len(toks[p.doc_id])
                assert p.token_start == offset
                assert p.pack_id == p.token_start // window
                span = max(p.n_tokens, 1)
                assert p.pack_id_end == (p.token_start + span - 1) // window
                assert p.crosses_boundary == (p.pack_id_end > p.pack_id)
                offset += p.n_tokens

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(_doc, min_size=1, max_size=20, unique_by=lambda r: r[0]),
        window=st.integers(1, 24),
    )
    def test_materialized_windows_reconstruct(self, spark, rows, window):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        packed_df = pack_documents(df, window_tokens=window, num_shards=2)
        man = window_manifest(packed_df, window)
        wins = materialize_windows(df, man, window).collect()

        packed = packed_df.collect()
        toks = {
            r[0]: [t for t in r[1].lower().split() if t] for r in rows
        }
        want: dict[tuple, list] = {}
        for p in sorted(packed, key=lambda r: (r.source, r.shard, r.doc_id)):
            want.setdefault((p.source, p.shard), []).extend(toks[p.doc_id])

        got: dict[tuple, dict[int, list]] = {}
        for w in wins:
            got.setdefault((w.source, w.shard), {})[w.window_id] = list(
                w.toks
            )
        for key, stream in want.items():
            if not stream:
                assert key not in got
                continue
            by_win = got[key]
            flat = []
            for wid in sorted(by_win):
                chunk = by_win[wid]
                assert len(chunk) <= window
                assert wid == len(flat) // window
                flat.extend(chunk)
            assert flat == stream
