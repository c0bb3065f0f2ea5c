"""Custom stateful streaming operator: applyInPandasWithState.

The reference's hot store IS per-tag mutable state fed by a continuous
write stream (``index.js:64-94``); its read path reduces each (tag, ts)
to the latest member (O6). This module expresses that reduction as a
first-class Structured Streaming operator: a per-tag GroupState holding
the running latest sample, updated per micro-batch via Arrow-batched
Pandas — the engine's template for custom stateful operators that
``groupBy().agg()`` can't express (the state survives across batches
and could carry arbitrary Python structure: rate limiters, CEP automata,
decaying sketches).

Determinism: the state orders samples by the full (ts, seq) tuple, so
the emitted "latest" never depends on batch boundaries or arrival
order; running the same finite input through any micro-batch splitting
yields the same final answer — which is what makes the operator
oracle-checkable against a batch arg-max.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("tag", T.StringType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def latest_per_tag_stateful(grouped_stream) -> DataFrame:
    """Running latest-sample-per-tag over a grouped stream.

    Input groups: (tag, ts: long, seq: long, value: double). Each
    micro-batch emits the group's current (tag, last_ts, last_seq,
    last_value, n_seen); the final state is the arg-max over
    (ts, seq) of everything seen — the streaming form of the O6 LWW
    reduction.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        best: tuple[int, int, float] | None = None
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            if not len(pdf):
                continue
            # Vectorized arg-max over (ts, seq): rows at the max ts,
            # then the max seq among them — never a Python row loop.
            at_max_ts = pdf[pdf["ts"] == pdf["ts"].max()]
            row = at_max_ts.loc[at_max_ts["seq"].idxmax()]
            cand: Any = (int(row["ts"]), int(row["seq"]), float(row["value"]))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if state.exists:
            s_ts, s_seq, s_val, s_n = state.get
            if best is None or (s_ts, s_seq) > (best[0], best[1]):
                best = (s_ts, s_seq, s_val)
            n_total = s_n + n_new
        else:
            n_total = n_new
        assert best is not None
        state.update((best[0], best[1], best[2], n_total))
        yield _pd.DataFrame(
            {
                "tag": [key[0]],
                "last_ts": [best[0]],
                "last_seq": [best[1]],
                "last_value": [best[2]],
                "n_seen": [n_total],
            }
        )

    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
