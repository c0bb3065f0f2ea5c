"""Differential testing against DuckDB — a local replica of the
driver's correctness gate (BASELINE.md): for every catalog query with
an oracle, run the Spark plan and the DuckDB SQL on the same Parquet
tables and compare row count, schema shape, and values with columns
sorted by name and rows sorted canonically.

Comparison is EXACT for every cell (the driver hashes values); float
columns must therefore be bitwise-identical across engines, which the
catalog guarantees by accumulating in DECIMAL and casting to DOUBLE at
the end.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from redis_lsm_timeseries_spark.plans import REGISTRY
from redis_lsm_timeseries_spark.plans.reference_queries import (
    UNREGISTERED_ORACLES,
)
from redis_lsm_timeseries_spark.sources.testdata import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")

ORACLE_SPECS = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    got = _canon(spec.fn(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(spec.oracle).fetchdf())

    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    got_kinds = [got[c].dtype.kind for c in got.columns]
    want_kinds = [want[c].dtype.kind for c in want.columns]
    assert got_kinds == want_kinds, (
        f"{name}: dtype drift {list(zip(got.columns, got_kinds, want_kinds))}"
    )
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(ga, wa))
            if not _cell_equal(a, b)
        ]
        assert not bad, (
            f"{name}: column {col!r} mismatches (first 5 of {len(bad)}): {bad[:5]}"
        )


@pytest.mark.parametrize("name", sorted(UNREGISTERED_ORACLES))
def test_unregistered_oracle_parity(spark, duck, name):
    """Queries that lost their driver slot to the 50-entry cap keep
    the identical rows+schema+values parity check here."""
    fn, oracle = UNREGISTERED_ORACLES[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(oracle).fetchdf())
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        assert all(
            _cell_equal(a, b)
            for a, b in zip(got[col].tolist(), want[col].tolist())
        ), f"{name}: column {col!r} mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle must still run and return a stable schema."""
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
