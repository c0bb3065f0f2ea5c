"""SemDeDup (Abbas et al. 2023): cluster-scoped exact-cosine dedup.
Verified against an independent pure-Python reference (sequential
double accumulation, matching the engine's aggregate() order exactly)
on the natural embeddings table, plus planted-group semantics."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.errors import ValidationError
from redis_lsm_timeseries_spark.operators.similarity import (
    semantic_dedup,
    semantic_dedup_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _unit(v):
    acc = 0.0
    for x in v:
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in v] if n > 0 and not math.isnan(n) else None


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


# three well-separated cluster directions in 4-d
C0 = _unit([1.0, 0.05, 0.0, 0.0])
C1 = _unit([0.0, 1.0, 0.05, 0.0])
C2 = _unit([0.0, 0.0, 1.0, 0.05])
CENTROIDS = [C0, C1, C2]


def _planted(spark):
    """Two dup groups in cluster 0 (ids 1,2,3 and 4,5), a singleton in
    cluster 1, and a pair-free vector in cluster 2."""
    rows = [
        # group A: tiny perturbations of C0 (pairwise sim ~0.9999)
        (1, [1.0, 0.05, 0.001, 0.0]),
        (2, [1.0, 0.05, 0.0, 0.001]),
        (3, [1.0, 0.051, 0.0, 0.0]),
        # group B: a different direction inside cluster 0
        (4, [1.0, 0.30, 0.0, 0.0]),
        (5, [1.0, 0.31, 0.0, 0.0]),
        # singleton in cluster 1
        (6, [0.1, 1.0, 0.0, 0.0]),
        # pair-free in cluster 2
        (7, [0.0, 0.1, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


class TestPlanted:
    def test_pairs_are_cluster_scoped_and_thresholded(self, spark):
        pairs = semantic_dedup_pairs(
            _planted(spark), CENTROIDS, threshold=0.999
        ).collect()
        got = {(r.vec_id_a, r.vec_id_b) for r in pairs}
        assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
        assert all(r.cluster_id == 0 for r in pairs)
        assert all(r.cosine_sim >= 0.999 for r in pairs)

    def test_keeps_lowest_centroid_sim_per_group(self, spark):
        kept = semantic_dedup(
            _planted(spark), CENTROIDS, threshold=0.999
        )
        ids = {r.vec_id for r in kept.collect()}
        # group A winner: the member farthest from C0
        sims = {
            i: _dot(_unit(v), C0)
            for i, v in [
                (1, [1.0, 0.05, 0.001, 0.0]),
                (2, [1.0, 0.05, 0.0, 0.001]),
                (3, [1.0, 0.051, 0.0, 0.0]),
            ]
        }
        winner_a = min(sims, key=lambda i: (sims[i], i))
        sims_b = {
            i: _dot(_unit(v), C0)
            for i, v in [(4, [1.0, 0.30, 0.0, 0.0]),
                         (5, [1.0, 0.31, 0.0, 0.0])]
        }
        winner_b = min(sims_b, key=lambda i: (sims_b[i], i))
        assert ids == {winner_a, winner_b, 6, 7}

    def test_zero_norm_vector_survives_untouched(self, spark):
        df = _planted(spark).unionByName(
            spark.createDataFrame(
                [(99, [0.0, 0.0, 0.0, 0.0])],
                "vec_id long, embedding array<double>",
            )
        )
        kept = semantic_dedup(df, CENTROIDS, threshold=0.999)
        assert 99 in {r.vec_id for r in kept.collect()}

    def test_cluster_size_guard(self, spark):
        with pytest.raises(ValidationError, match="max_cluster_size"):
            semantic_dedup_pairs(
                _planted(spark), CENTROIDS, max_cluster_size=2
            )


class TestNaturalOracle:
    """Independent reference on the natural embeddings table: same
    assignment tie-break (max sim, lowest cluster id), same pairing,
    transitive closure, keep lowest centroid-sim then min id."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        rows = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in base.collect()
        ]
        # the natural table has no near-dups at this SF (max pairwise
        # sim ~0.48) — plant perturbed copies of every 25th vector so
        # the dup graph is non-trivial, deterministically
        planted = []
        for i, v in rows:
            if i % 25 == 0:
                w = list(v)
                w[i % len(v)] += 0.01 * (1 + i % 3)
                planted.append((100_000 + i, w))
        rows = rows + planted
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        return df, rows

    def test_matches_pure_python_reference(self, spark, corpus):
        df, rows = corpus
        dim = len(rows[0][1])
        import hashlib

        # deterministic pseudo-random unit centroids (seeded, no RNG)
        def centroid(j):
            v = [
                int.from_bytes(
                    hashlib.md5(f"sd{j}-{d}".encode()).digest()[:4],
                    "big",
                )
                / 2**31
                - 1.0
                for d in range(dim)
            ]
            return _unit(v)

        cents = [centroid(j) for j in range(8)]
        theta = 0.9  # catches exactly the planted perturbed copies

        # --- reference ---
        units = {i: _unit(v) for i, v in rows}
        units = {i: u for i, u in units.items() if u is not None}
        assign, csim = {}, {}
        for i, u in units.items():
            sims = [_dot(u, c) for c in cents]
            best = max(range(len(cents)), key=lambda j: (sims[j], -j))
            assign[i], csim[i] = best, sims[best]
        by_cluster: dict[int, list[int]] = {}
        for i, c in assign.items():
            by_cluster.setdefault(c, []).append(i)
        parent = {i: i for i in units}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        edges = set()
        for c, ids in by_cluster.items():
            ids = sorted(ids)
            for ai in range(len(ids)):
                for bi in range(ai + 1, len(ids)):
                    a, b = ids[ai], ids[bi]
                    if _dot(units[a], units[b]) >= theta:
                        edges.add((a, b))
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        groups: dict[int, list[int]] = {}
        for i in units:
            groups.setdefault(find(i), []).append(i)
        want_kept = set(i for i, _ in rows)
        for root, members in groups.items():
            if len(members) < 2:
                continue
            keep = min(members, key=lambda i: (csim[i], i))
            want_kept -= {m for m in members if m != keep}

        # --- engine ---
        pairs = semantic_dedup_pairs(df, cents, threshold=theta)
        got_edges = {
            (r.vec_id_a, r.vec_id_b) for r in pairs.collect()
        }
        assert got_edges == edges
        assert len(edges) > 0, "theta too high — test would be vacuous"
        kept = semantic_dedup(df, cents, threshold=theta)
        got_kept = {r.vec_id for r in kept.collect()}
        assert got_kept == want_kept

    def test_no_window_over_pair_graph(self, spark, corpus):
        df, _ = corpus
        cents = [[1.0] + [0.0] * (len(df.first().embedding) - 1)]
        plan = semantic_dedup(
            df, cents, threshold=0.99, max_cluster_size=10_000
        )._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition" not in plan.lower()
