"""Property-based model test of the core engine lifecycle.

The reference's suite is example-based only (SURVEY.md §5: no
property-based testing). This closes that gap: hypothesis generates
arbitrary multi-batch write schedules — duplicate keys within and
across batches, tombstones, tags containing the partition-name
separator — and the engine's composed read must equal a trivial
Python dict model of the semantics:

- batches apply in order; within a batch, the LAST entry for a
  duplicate (tag, ts) wins (JS-Map semantics, SURVEY.md §2.2.3);
- across batches, the later ingest_ts wins (LWW, §2.2.4);
- a NULL value is a tombstone: it shadows older values and is absent
  from reads (recipe:22-23 refinement);
- maintenance (L0 flush, LWW compaction — with and without a
  partition cap) interleaved anywhere in the schedule is
  READ-TRANSPARENT: the model ignores it entirely.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from redis_lsm_timeseries_spark.config import EngineConfig
from redis_lsm_timeseries_spark.store import TimeseriesStore

TAGS = ("A", "B-1", "longer.tag")  # includes the '-' page-name separator
T0 = 1_000_000

entry = st.tuples(
    st.sampled_from(TAGS),
    st.integers(min_value=0, max_value=47),  # spans ~10 partitions at W=5
    st.one_of(st.none(), st.text(alphabet="abcXYZ019", max_size=6)),
)

step = st.tuples(
    st.lists(entry, min_size=1, max_size=12),
    st.sampled_from(["none", "flush", "compact", "compact_capped"]),
)

schedule = st.lists(step, min_size=1, max_size=3)


def model_read(steps) -> dict:
    latest: dict = {}
    for batch, _maintenance in steps:  # maintenance is invisible to reads
        collapsed = {}
        for tag, ts, value in batch:  # intra-batch last-entry-wins
            collapsed[(tag, ts)] = value
        latest.update(collapsed)  # cross-batch LWW
    return {k: v for k, v in latest.items() if v is not None}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=schedule)
def test_write_read_matches_model(spark, steps):
    from redis_lsm_timeseries_spark.tiering import compact

    base = tempfile.mkdtemp(prefix="rlts_prop_")
    try:
        store = TimeseriesStore(
            spark, EngineConfig(root=base, partition_width=5)
        )
        store.initialize()
        for i, (batch, maintenance) in enumerate(steps):
            store.write(batch, ingest_ts=T0 + i)
            if maintenance == "flush":
                store.flush_l0()
            elif maintenance == "compact":
                compact(store)
            elif maintenance == "compact_capped":
                compact(store, max_partitions=1)
        got = {
            (r.tag, r.ts): r.value
            for r in store.read_range(
                {tag: (0, 100) for tag in TAGS}
            ).collect()
        }
        assert got == model_read(steps)
    finally:
        shutil.rmtree(base, ignore_errors=True)
