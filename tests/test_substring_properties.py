"""Property fuzz for substring dedup: random small corpora checked
against a pure-Python reference that works on window CONTENT (token
tuples) rather than hashes — so the test also proves the md5-derived
window digests are collision-faithful on these inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from redis_lsm_timeseries_spark.operators.dedup import (
    duplicate_substring_spans,
)

VOCAB = ["aa", "bb", "cc", "dd"]
K = 3


def _reference_spans(docs: dict[int, list[str]], k: int = K):
    """(doc_id -> token list) -> {(doc_id, span_start, span_end)}."""
    first_seen: dict[tuple, tuple] = {}
    dup_pos: dict[int, list[int]] = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id]
        for pos in range(len(toks) - k + 1):
            win = tuple(toks[pos:pos + k])
            if win not in first_seen:
                first_seen[win] = (doc_id, pos)
            else:
                dup_pos.setdefault(doc_id, []).append(pos)
    spans = set()
    for doc_id, positions in dup_pos.items():
        positions.sort()
        start = prev = positions[0]
        for p in positions[1:]:
            if p > prev + k:
                spans.add((doc_id, start, prev + k))
                start = p
            prev = p
        spans.add((doc_id, start, prev + k))
    return spans


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    return {
        i: draw(
            st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12)
        )
        for i in range(1, n_docs + 1)
    }


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpora())
def test_spans_match_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_substring_spans(df, span_tokens=K).collect()
    }
    assert got == _reference_spans(docs)
