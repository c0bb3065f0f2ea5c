"""Direct properties of ``in_batch_near_dup_losers`` (r10): the
pairwise min-id rule, stated as invariants over the band self-join —
soundness (every loser has a smaller-id batchmate agreeing at >=
threshold) and completeness (no two survivors band-collide at >=
threshold). The streaming suite covers the wired-in behavior; this
file pins the operator itself on synthetic corpora with known
collision structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redis_lsm_timeseries_spark.operators.dedup import (
    NUM_HASHES,
    build_band_index,
    in_batch_near_dup_losers,
)

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
)


def _variant(i: int, n_edits: int) -> str:
    toks = BASE.split()
    for j in range(n_edits):
        toks[(i * 3 + j) % len(toks)] = f"edit{i}x{j}"
    return " ".join(toks)


def _pair_est(spark, bands):
    """All band-colliding pairs with their signature-agreement score —
    the ground truth the loser rule quantifies over."""
    left = bands.select(
        F.col("corpus_id").alias("a"), "band_idx", "band_key",
        F.col("mhs").alias("am"),
    )
    right = bands.select(
        F.col("corpus_id").alias("b"), "band_idx", "band_key",
        F.col("mhs").alias("bm"),
    )
    est = (
        F.size(
            F.filter(F.zip_with("am", "bm", lambda x, y: x == y), lambda e: e)
        ).cast("double")
        / F.lit(float(NUM_HASHES))
    )
    return {
        (r.a, r.b): r.est
        for r in left.join(right, ["band_idx", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", est.alias("est"))
        .distinct()
        .collect()
    }


class TestLoserRule:
    @pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
    def test_sound_and_complete_on_mixed_clusters(self, spark, threshold):
        """A batch of: one tight near-dup cluster (1-2 token edits of a
        base), loose variants, and novel docs. For ANY threshold, the
        losers are exactly the docs with a smaller-id >= threshold
        band partner."""
        rows = [(0, BASE)]
        rows += [(i, _variant(i, 1)) for i in range(1, 5)]     # tight
        rows += [(i, _variant(i, 8)) for i in range(5, 9)]     # loose
        rows += [
            (i, " ".join(f"novel{i}w{j}" for j in range(20)))
            for i in range(9, 12)
        ]
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        bands = build_band_index(batch)
        pairs = _pair_est(spark, bands)
        losers = {
            r.corpus_id
            for r in in_batch_near_dup_losers(
                bands, threshold=threshold
            ).collect()
        }
        ids = {i for i, _ in rows}
        # soundness: every loser has a smaller-id partner at >= threshold
        for b in losers:
            assert any(
                a < b and est >= threshold
                for (a, bb), est in pairs.items()
                if bb == b
            ), (b, threshold)
        # completeness: no >= threshold pair survives intact
        for (a, b), est in pairs.items():
            if est >= threshold:
                assert b in losers, (a, b, est, threshold)
        # the minimum id of the batch is never a loser
        assert min(ids) not in losers
        # novel docs never lose (no colliding partner at all)
        for i in range(9, 12):
            partnered = any(
                b == i and est >= threshold
                for (a, b), est in pairs.items()
            )
            assert partnered == (i in losers)

    def test_deterministic_across_invocations(self, spark):
        rows = [(i, _variant(i, 1)) for i in range(8)]
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        bands = build_band_index(batch).localCheckpoint(eager=True)
        a = {r.corpus_id for r in in_batch_near_dup_losers(bands).collect()}
        b = {r.corpus_id for r in in_batch_near_dup_losers(bands).collect()}
        assert a == b

    def test_no_collisions_no_losers(self, spark):
        rows = [
            (i, " ".join(f"only{i}tok{j}" for j in range(15)))
            for i in range(6)
        ]
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        bands = build_band_index(batch)
        assert in_batch_near_dup_losers(bands).count() == 0

    def test_plan_broadcasts_and_keeps_no_window(self, spark):
        rows = [(i, _variant(i, 1)) for i in range(6)]
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        bands = build_band_index(batch).localCheckpoint(eager=True)
        df = in_batch_near_dup_losers(bands)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan
        assert "windowspecdefinition" not in plan
        assert "BatchEvalPython" not in plan
