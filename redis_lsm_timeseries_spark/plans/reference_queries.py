"""Reference-parity queries: the SortedStore read/write/merge semantics
(SURVEY.md §2.1 O4-O7, §2.2) expressed over the driver's ``events``
table mapped onto the sample schema (``sources.testdata.events_as_samples``).

Every query here exercises a behavior the reference pins in its test
suite (file:line cited per query); the DuckDB oracle encodes the same
semantics in ANSI SQL so the driver's differential check validates the
Spark plan, not just its shape.

Determinism rules used throughout:
- float aggregates accumulate in DECIMAL(18,2) then cast to DOUBLE
  (order-independent, bitwise-equal across engines);
- every window/rank order ends in the unique ``seq`` (= event_id)
  tie-break;
- millisecond sort keys stay BIGINT end-to-end (no timestamp types in
  results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from redis_lsm_timeseries_spark.operators.lww import lww_latest
from redis_lsm_timeseries_spark.plans.catalog import register
from redis_lsm_timeseries_spark.sources.testdata import events_as_samples

# Fixed query window: 2024-01-05 .. 2024-01-12 UTC in epoch-ms (the
# events table spans 2024-01-01 .. 2024-01-30).
RS = 1_704_412_800_000
RE = 1_705_017_600_000
W = 120_000  # reference default partition width (index.js:46)

# The samples mapping as a DuckDB CTE — must stay in lockstep with
# sources.testdata.events_as_samples.
SAMPLES_CTE = f"""
WITH samples AS (
  SELECT event_type AS tag,
         epoch_ms(ts) AS ts,
         props AS value,
         "value" AS value_num,
         epoch_ms(ts) AS ingest_ts,
         'gen' AS writer_id,
         event_id AS seq,
         epoch_ms(ts) - epoch_ms(ts) % {W} AS part_start,
         user_id,
         event_id
  FROM events
)
"""


# --------------------------------------------------------------- O7 read
@register(
    "ts_range_read",
    oracle=SAMPLES_CTE
    + f"""
SELECT tag, ts, value FROM (
  SELECT tag, ts, value,
         row_number() OVER (
           PARTITION BY tag, ts
           ORDER BY ingest_ts DESC, writer_id DESC, seq DESC
         ) AS rn
  FROM samples
  WHERE tag IN ('purchase', 'error') AND ts BETWEEN {RS} AND {RE}
)
WHERE rn = 1 AND value IS NOT NULL
""",
    tags=("reference", "read"),
)
def ts_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical composed range read: prune + scan + residual filter +
    LWW merge (reference readData, test/consumer-test.js:1135-1162)."""
    s = events_as_samples(spark, sf_dir)
    hit = s.where(
        F.col("tag").isin("purchase", "error") & F.col("ts").between(RS, RE)
    )
    return (
        lww_latest(hit)
        .where(F.col("value").isNotNull())
        .select("tag", "ts", "value")
    )


# --------------------------------------------------------------- O4 index
# Unregistered in round 8 (after ts_page_scan): both entries pinned
# O4/O5 halves of the already-green composed ts_range_read; the freed
# slot carries rollup_incremental_lifecycle. Identical parity check
# retained via UNREGISTERED_ORACLES.
TS_READ_INDEX_ORACLE = (
    SAMPLES_CTE
    + f"""
SELECT tag, part_start,
       row_number() OVER (PARTITION BY tag ORDER BY part_start DESC)
         AS sort_weight
FROM (
  SELECT DISTINCT tag, part_start
  FROM samples
  WHERE tag IN ('purchase', 'error')
    AND part_start BETWEEN {RS} - {RS} % {W} AND {RE}
)
"""
)


def ts_read_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruning metadata query, newest-first with ascending
    sort_weight (reference readIndex, index.js:157-231; ordering pinned
    by test/consumer-test.js:345-384). Start floored to a partition
    boundary, end not (index.js:176-186)."""
    s = events_as_samples(spark, sf_dir)
    floored = RS - RS % W
    meta = (
        s.where(
            F.col("tag").isin("purchase", "error")
            & F.col("part_start").between(floored, RE)
        )
        .select("tag", "part_start")
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy(F.col("part_start").desc())
    return meta.withColumn(
        "sort_weight", F.row_number().over(w).cast("long")
    )


# ----------------------------------------------------------- O6 LWW merge
@register(
    "ts_lww_update",
    oracle=SAMPLES_CTE
    + f"""
, base AS (
  SELECT tag, ts, value, ingest_ts, writer_id, seq FROM samples
  WHERE tag = 'click' AND ts BETWEEN {RS} AND {RE}
), upd AS (
  SELECT tag, ts, 'UPDATED' AS value, ingest_ts + 60000 AS ingest_ts,
         writer_id, seq + 10000000 AS seq
  FROM base
  WHERE ts % 2 = 0
), unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd
)
SELECT tag, ts, value FROM (
  SELECT tag, ts, value,
         row_number() OVER (
           PARTITION BY tag, ts
           ORDER BY ingest_ts DESC, writer_id DESC, seq DESC
         ) AS rn
  FROM unioned
)
WHERE rn = 1
""",
    tags=("reference", "lww"),
)
def ts_lww_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch update semantics: a later batch re-writes half the
    keys; LWW returns the newer value (recipe:19-20, SURVEY.md §2.2.4;
    shape from test/consumer-test.js:738-765). The 'second batch' is
    synthesized from the first so the oracle can build the identical
    duplicate set."""
    s = events_as_samples(spark, sf_dir)
    base = s.where(
        (F.col("tag") == "click") & F.col("ts").between(RS, RE)
    ).select("tag", "ts", "value", "ingest_ts", "writer_id", "seq")
    upd = (
        base.where(F.col("ts") % 2 == 0)
        .withColumn("value", F.lit("UPDATED"))
        .withColumn("ingest_ts", F.col("ingest_ts") + F.lit(60_000))
        .withColumn("seq", F.col("seq") + F.lit(10_000_000))
    )
    return lww_latest(base.unionByName(upd)).select("tag", "ts", "value")


# ------------------------------------------------------------ O5 page scan
# Unregistered in round 8 to free a driver catalog slot for
# dedup_substring: ts_read_index and ts_page_scan pinned the O4/O5
# halves of the already-green composed ts_range_read, so this entry
# was redundant at the driver. It stays differentially verified via
# UNREGISTERED_ORACLES (tests/test_oracle_parity.py runs the same
# rows+schema+values comparison on it).
TS_PAGE_SCAN_ORACLE = (
    SAMPLES_CTE
    + f"""
SELECT tag, ts, value, part_start
FROM samples
WHERE tag = 'error'
  AND part_start BETWEEN {RS} AND {RS + 86_400_000}
  AND ts BETWEEN {RS + 1_000} AND {RS + 86_400_000}
"""
)


def ts_page_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition scan + residual predicate (reference readPage,
    index.js:233-266). The reference fetches the whole partition and
    filters client-side; this plan pushes both the partition predicate
    and the residual ts range into the Parquet scan (SURVEY.md §4 P9)."""
    s = events_as_samples(spark, sf_dir)
    return s.where(
        (F.col("tag") == "error")
        & F.col("part_start").between(RS, RS + 86_400_000)
        & F.col("ts").between(RS + 1_000, RS + 86_400_000)
    ).select("tag", "ts", "value", "part_start")


# ------------------------------------------------------- O8 purge ordering
@register(
    "ts_purge_candidates",
    oracle=SAMPLES_CTE
    + """
SELECT tag, part_start, last_seen, n FROM (
  SELECT tag, part_start,
         max(ingest_ts) AS last_seen,
         count(*) AS n
  FROM samples
  GROUP BY tag, part_start
)
ORDER BY last_seen ASC, tag ASC, part_start ASC
LIMIT 10
""",
    tags=("reference", "tiering"),
)
def ts_purge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K coldest partitions — the enqueue-purge scan's oldest-K
    selection over RecentActivity (enqueue-purge.lua:5-16) as an
    aggregate. Map-side partial max/count, then a global TakeOrdered of
    just K rows — no full sort at scale."""
    s = events_as_samples(spark, sf_dir)
    return (
        s.groupBy("tag", "part_start")
        .agg(
            F.max("ingest_ts").alias("last_seen"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("last_seen").asc(), F.col("tag").asc(), F.col("part_start").asc()
        )
        .limit(10)
    )


# ---------------------------------------------------------------- rollups
@register(
    "ts_rollup_hourly",
    oracle=SAMPLES_CTE
    + """
SELECT tag,
       ts - ts % 3600000 AS bucket_ms,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value_num AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       min(value_num) AS min_v,
       max(value_num) AS max_v
FROM samples
GROUP BY tag, ts - ts % 3600000
""",
    tags=("analytics", "rollup"),
)
def ts_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket rollup per tag (SURVEY.md §2.3 aggregations): the
    hourly bucket is the same floor-mod math as the partition function.
    Catalyst plans partial+final hash aggregation; at 100 TB the
    map-side combine means one row per (tag, hour) per task crosses the
    shuffle. n_users is the exact-distinct aggregation (Expand +
    two-phase under the hood) — the dedup-before-count primitive; the
    sketch alternative is approx_distinct_users."""
    s = events_as_samples(spark, sf_dir)
    return s.groupBy(
        "tag",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(3_600_000))).alias("bucket_ms"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.col("value_num").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_v"),
        F.min("value_num").alias("min_v"),
        F.max("value_num").alias("max_v"),
    )


# ------------------------------------------------------------ window fns
@register(
    "ts_moving_window",
    oracle=SAMPLES_CTE
    + f"""
SELECT tag, ts, value_num,
       value_num - lag(value_num) OVER (
         PARTITION BY tag ORDER BY ts ASC, seq ASC
       ) AS delta,
       CAST(sum(CAST(value_num AS DECIMAL(18,2))) OVER (
         PARTITION BY tag ORDER BY ts ASC, seq ASC
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS mov_sum,
       count(*) OVER (
         PARTITION BY tag ORDER BY ts ASC, seq ASC
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ) AS mov_n
FROM samples
WHERE ts BETWEEN {RS} AND {RE}
""",
    tags=("analytics", "window"),
)
def ts_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tag lag delta + moving 4-sample sum/count (SURVEY.md §2.3
    window functions: offset function and rowsBetween frame share ONE
    window sort, so Catalyst plans a single Window node — two catalog
    entries' coverage for one shuffle). The moving average is
    mov_sum/mov_n — kept as exact components so the differential hash
    is float-order-independent."""
    s = events_as_samples(spark, sf_dir).where(F.col("ts").between(RS, RE))
    order = [F.col("ts").asc(), F.col("seq").asc()]
    w = Window.partitionBy("tag").orderBy(*order)
    wf = w.rowsBetween(-3, 0)
    return s.select(
        "tag",
        "ts",
        "value_num",
        (F.col("value_num") - F.lag("value_num").over(w)).alias("delta"),
        F.sum(F.col("value_num").cast("decimal(18,2)"))
        .over(wf)
        .cast("double")
        .alias("mov_sum"),
        F.count(F.lit(1)).over(wf).alias("mov_n"),
    )


# -------------------------------------------------------------- as-of join
@register(
    "ts_asof_join",
    oracle=SAMPLES_CTE
    + f"""
, tagged AS (
  SELECT user_id, ts, seq,
         CASE WHEN tag = 'click' THEN 1 ELSE 0 END AS is_left,
         CASE WHEN tag = 'click' THEN value_num END AS click_value,
         CASE WHEN tag = 'purchase' THEN value_num END AS purchase_value
  FROM samples
  WHERE tag IN ('click', 'purchase') AND ts BETWEEN {RS} AND {RE}
), joined AS (
  SELECT user_id, ts, seq, is_left, click_value,
         last_value(purchase_value IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_left ASC, seq ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_purchase_value
  FROM tagged
)
SELECT user_id, ts AS click_ts, click_value, last_purchase_value
FROM joined WHERE is_left = 1
""",
    tags=("analytics", "join", "asof"),
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the latest purchase value
    of the same user at-or-before its timestamp — the canonical TSDB
    join the reference's model implies (SURVEY.md §2.3 joins).

    Implemented as union + ordered last(ignorenulls) window rather than
    a range join: one shuffle on user_id, no O(clicks x purchases)
    blow-up — this is the plan that survives 100 TB. Purchases sort
    before clicks at equal ts (at-or-before includes equality)."""
    s = events_as_samples(spark, sf_dir)
    both = s.where(
        F.col("tag").isin("click", "purchase") & F.col("ts").between(RS, RE)
    ).select(
        "user_id",
        "ts",
        "seq",
        F.when(F.col("tag") == "click", F.lit(1)).otherwise(F.lit(0)).alias("is_left"),
        F.when(F.col("tag") == "click", F.col("value_num")).alias("click_value"),
        F.when(F.col("tag") == "purchase", F.col("value_num")).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").asc(), F.col("seq").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        both.withColumn(
            "last_purchase_value",
            F.last("purchase_value", ignorenulls=True).over(w),
        )
        .where(F.col("is_left") == 1)
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            "click_value",
            "last_purchase_value",
        )
    )


# ------------------------------------------------------------- top-k/rank
# Unregistered in r15 (50-entry driver window): its arg-max window
# shape is already driver-covered by ts_lww_update (SURVEY §2.4), and
# the freed slot certifies deletion vectors (dv_row_mutation) in the
# driver's own CORRECTNESS artifact. Keeps the identical
# rows+schema+values parity check via UNREGISTERED_ORACLES below.
TS_TOP_K_PER_TAG_ORACLE = (
    SAMPLES_CTE
    + """
SELECT tag, ts, value_num, rn FROM (
  SELECT tag, ts, value_num,
         row_number() OVER (
           PARTITION BY tag ORDER BY value_num DESC, seq ASC
         ) AS rn
  FROM samples
)
WHERE rn <= 3
"""
)


def ts_top_k_per_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 samples by value per tag (SURVEY.md §2.3 sorts/limits)."""
    s = events_as_samples(spark, sf_dir)
    w = Window.partitionBy("tag").orderBy(
        F.col("value_num").desc(), F.col("seq").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("tag", "ts", "value_num", "rn")
    )


# ---------------------------------------------------------- sessionization
@register(
    "ts_sessionize",
    oracle=SAMPLES_CTE
    + """
, gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts ASC, seq ASC
              ) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM samples
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions
FROM gaps
GROUP BY user_id
""",
    tags=("analytics", "window", "session"),
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a >30-minute gap starts a new session; count
    sessions and events per user (lag + conditional sum — the batch
    analog of session_window in streaming)."""
    s = events_as_samples(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("seq").asc())
    gaps = s.select(
        "user_id",
        "ts",
        F.when(
            (F.col("ts") - F.lag("ts").over(w)) > 1_800_000, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("new_session") + F.lit(1)).alias("n_sessions"),
    )


#: Queries with full DuckDB oracles that hold no driver catalog slot
#: (the driver checks exactly 50 entries); the pytest parity harness
#: runs these through the identical comparison.
UNREGISTERED_ORACLES = {
    "ts_page_scan": (ts_page_scan, TS_PAGE_SCAN_ORACLE),
    "ts_read_index": (ts_read_index, TS_READ_INDEX_ORACLE),
    "ts_top_k_per_tag": (ts_top_k_per_tag, TS_TOP_K_PER_TAG_ORACLE),
}
