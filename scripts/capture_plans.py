"""Capture `.explain("formatted")` + a measured per-invocation Spark
job count for every declared catalog entry.

Usage:
    python scripts/capture_plans.py <out_dir> <suffix> [sf_dir] [names...]

Writes <out_dir>/<name>_<suffix>.txt with a two-line header (where the
plan came from, how many jobs one invocation runs) followed by the
formatted physical plan. Run it from the tree whose plans you want —
a worktree at the round-start commit for the "before" set, HEAD for
the "after" set.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])
    os.makedirs(out_dir, exist_ok=True)

    from redis_lsm_timeseries_spark.session import get_spark
    from redis_lsm_timeseries_spark.plans import catalog
    import redis_lsm_timeseries_spark.plans  # noqa: F401

    label = subprocess.run(
        ["git", "-C", HERE, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip() or "unknown"

    spark = get_spark("rlts-plan-capture", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    def njid() -> int:
        return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())

    for name in sorted(catalog.REGISTRY):
        if only and name not in only:
            continue
        spec = catalog.REGISTRY[name]
        try:
            redis_lsm_timeseries_spark.plans.clear_query_caches()
            j0 = njid()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            jobs = njid() - j0
            # a fresh build for the plan dump (mutation entries tear
            # down their temp store after materializing)
            redis_lsm_timeseries_spark.plans.clear_query_caches()
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # record the failure, keep going
            plan = f"CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
            jobs = -1
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as fh:
            fh.write(
                f"# {name} — captured from {HERE} at {label}\n"
                f"# spark_jobs_for_one_invocation: {jobs}\n\n{plan}"
            )
        print(f"{name}: jobs={jobs}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
