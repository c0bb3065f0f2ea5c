"""Engine benchmark: run the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "catalog_wall_time", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": 0.1}

Each query is forced through the noop sink (computes every output
column and row — ``count()`` would let Catalyst prune the projection
work away), timed wall-clock. The JSON line is the LAST line on stdout;
all other output goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redis_lsm_timeseries_spark.session import get_spark  # noqa: E402
from redis_lsm_timeseries_spark.plans import catalog  # noqa: E402
import redis_lsm_timeseries_spark.plans  # noqa: F401, E402  (populates REGISTRY)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    spark = get_spark("rlts-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(catalog.REGISTRY)
    # Warm the JVM/session on the smallest SF so the first measured
    # query doesn't pay one-time codegen/session costs.
    warm = catalog.REGISTRY["ts_range_read"].fn(spark, "/root/testdata/sf0.001")
    warm.write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    failures: dict[str, str] = {}
    total_t0 = time.perf_counter()
    for name in names:
        spec = catalog.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            per_query[name] = round(dt, 3)
            log(f"{name}: {dt:.3f}s")
        except Exception as exc:  # keep benching; report the failure
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            log(f"{name}: FAILED {failures[name]}")
    total = time.perf_counter() - total_t0

    result = {
        "metric": "catalog_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "n_queries": len(per_query),
        "failures": failures,
        "cpus": cpus,
    }
    print(json.dumps(result), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
