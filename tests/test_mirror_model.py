"""Model-based fuzz of the keyed mirror: random interleavings of
appends, merges, deletes, compactions and Z-order passes on the
source, with mirror steps at random points — the mirror must equal a
plain dict model of the source after every step, with zero resyncs
(every maintenance commit is preserve-kind, every merge/delete emits
row-level CDF).
"""

from __future__ import annotations

import random

import pytest

from redis_lsm_timeseries_spark.changefeed import mirror_changes
from redis_lsm_timeseries_spark.commit import CommitHost, ManifestCommit
from redis_lsm_timeseries_spark.maintenance import compact_small_files
from redis_lsm_timeseries_spark.operators.merge import (
    delete_rows,
    merge_into,
)
from redis_lsm_timeseries_spark.operators.zorder import zorder_compact

SCHEMA = "k long, a long, v string"


@pytest.mark.parametrize("seed", [7, 23])
def test_keyed_mirror_tracks_source_through_random_ops(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    host, commit = CommitHost(spark), ManifestCommit()
    src = str(tmp_path / f"src{seed}")
    dst = str(tmp_path / f"dst{seed}")
    model: dict[int, tuple] = {}
    next_key = 0

    def mk(rows):
        return spark.createDataFrame(rows, SCHEMA).coalesce(1)

    def do_append():
        nonlocal next_key
        rows = []
        for _ in range(rng.randint(1, 4)):
            k = next_key
            next_key += 1
            rows.append((k, k * 10, f"a{k}"))
            model[k] = (k * 10, f"a{k}")
        commit.append_table_with_meta(host, src, mk(rows), {})

    def do_merge():
        keys = rng.sample(sorted(model) or [0], k=min(
            len(model), rng.randint(1, 3)
        )) if model else []
        nonlocal next_key
        rows = [(k, k * 10 + 1, f"m{k}") for k in keys]
        if rng.random() < 0.5:  # mix in an insert
            k = next_key
            next_key += 1
            rows.append((k, k * 10, f"mi{k}"))
        if not rows:
            return
        for k, a, v in rows:
            model[k] = (a, v)
        merge_into(host, src, mk(rows), ["k"], commit=commit)

    def do_delete():
        if not model:
            return
        keys = rng.sample(
            sorted(model), k=min(len(model), rng.randint(1, 2))
        )
        for k in keys:
            model.pop(k)
        delete_rows(
            host, src,
            spark.createDataFrame([(k,) for k in keys], "k long"),
            ["k"], commit=commit,
        )

    def do_compact():
        compact_small_files(host, src, commit=commit)

    def do_zorder():
        zorder_compact(host, src, ["k", "a"], min_files=1,
                       commit=commit)

    def check_mirror():
        m = mirror_changes(host, src, dst, keys=["k"], commit=commit)
        assert m.mode != "resync", "maintenance forced a resync"
        got = {
            r.k: (r.a, r.v)
            for r in commit.read_table(host, dst, SCHEMA).collect()
        }
        assert got == model

    do_append()
    check_mirror()  # initial
    ops = [do_append, do_merge, do_delete, do_compact, do_zorder]
    weights = [4, 3, 2, 1, 1]
    for step in range(14):
        rng.choices(ops, weights=weights)[0]()
        if rng.random() < 0.4:
            check_mirror()
    check_mirror()  # final convergence
    # and the source itself equals the model (sanity of the harness)
    src_rows = {
        r.k: (r.a, r.v)
        for r in commit.read_table(host, src, SCHEMA).collect()
    }
    assert src_rows == model
