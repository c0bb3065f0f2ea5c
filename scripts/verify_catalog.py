"""Replicate the grading driver's correctness gate locally: run every
catalog query AND its DuckDB oracle on the same Parquet tables and
compare row count + column set + order-insensitive value hash.

Usage:
    python scripts/verify_catalog.py [sf_dir ...]
Defaults to all three driver scale factors. Exit code 1 on any
mismatch. Round 8 note: sweeping MORE than the driver's sf0.01 is
what exposed the DuckDB HUGEINT->DOUBLE rounding landmine — keep
running all SFs.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_hash(df):
    import pandas as pd

    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:12]


def sweep(spark, sf_dir: str) -> list[str]:
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in sorted(qs.items()):
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            bad.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"  {name}: {len(got)} rows (rows-only)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok = len(got) == len(want) and canon_hash(got) == canon_hash(want)
        print(f"  {name}: {len(got)} rows {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            bad.append(name)
    con.close()
    return bad


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = {}
    for sf_dir in sf_dirs:
        print(f"== {sf_dir}")
        bad = sweep(spark, sf_dir)
        if bad:
            failures[sf_dir] = bad
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
