"""Similarity search over embedding columns (north star).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries broadcast (a handful of vectors); the corpus streams through
  one pass; per-query top-k via window rank. At 100 TB the corpus side
  stays partition-parallel and nothing but (query x k) rows survive
  the rank filter.
- ``lsh_bucket_topk``: random-hyperplane LSH — the scale path. Each
  vector reduces to a small signature; candidates only compete within
  their bucket, turning O(Q x N) into O(Q x N / 2^planes) expected.
  Hyperplanes are pseudo-random derived from the portable hash so the
  DuckDB oracle can reproduce them exactly.

All vector math happens in float64 over higher-order array functions
(zip_with + aggregate) — sequential, deterministic accumulation that
matches the oracle bitwise. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

NUM_PLANES = 8


def as_double_array(col: str) -> Column:
    return F.col(col).cast("array<double>")


def dot(a: str, b: str) -> Column:
    """Sequential-order dot product (deterministic for parity)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Output: (query_id, neighbor_id, cosine_sim, rnk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def plane_components(plane: int, dim: int) -> list[float]:
    """Plane ``plane``'s components: +1/-1 by md5 parity of
    'p{plane}:{i}' — the identical value the DuckDB oracle derives with
    its own md5, so buckets agree across engines. Computed ONCE on the
    driver; embedding them as literals keeps 64 x planes md5 calls per
    ROW out of the executors."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"p{plane}:{i}".encode()).hexdigest()[:15], 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def hyperplane_sign(vec_col: str, plane: int, dim: int) -> Column:
    """Sign bit for one pseudo-random hyperplane (0/1). The dot with
    the literal component array keeps the same sequential accumulation
    the oracle's list_reduce performs — bitwise-equal sign decisions."""
    comps = ", ".join(
        f"{c:.1f}D" for c in plane_components(plane, dim)
    )
    return (
        F.expr(
            f"aggregate(zip_with({vec_col}, array({comps}), (x, s) -> x * s), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        > 0
    ).cast("int")


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = NUM_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane bucket id (0 .. 2^num_planes - 1)."""
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    out = df.withColumn("_dv", F.expr(dv))
    bucket = None
    for p in range(num_planes):
        bit = hyperplane_sign("_dv", p, dim).cast("long") * F.lit(1 << p).cast(
            "long"
        )
        bucket = bit if bucket is None else bucket + bit
    return out.withColumn("lsh_bucket", bucket).drop("_dv")


def with_lsh_bands(
    df: DataFrame,
    vec_col: str = "embedding",
    num_bands: int = 4,
    planes_per_band: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Banded random-hyperplane LSH: explode each vector into
    ``num_bands`` (band_idx, band_bucket) rows, where band b's bucket is
    the sign pattern of planes [b*r, (b+1)*r). Near-dup candidates are
    pairs sharing >= 1 band bucket — misses require EVERY band to split
    the pair, so recall approaches 1 for high-cosine pairs while the
    join stays bucket-local (the MinHash-banding trick applied to
    hyperplane signatures).

    Output: the input columns + (band_idx, band_bucket)."""
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    out = df.withColumn("_dv", F.expr(dv))
    bands = []
    for b in range(num_bands):
        bucket = None
        for p in range(planes_per_band):
            bit = hyperplane_sign("_dv", b * planes_per_band + p, dim).cast(
                "long"
            ) * F.lit(1 << p).cast("long")
            bucket = bit if bucket is None else bucket + bit
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"), bucket.alias("band_bucket")
            )
        )
    return (
        out.withColumn("band", F.explode(F.array(*bands)))
        .select(*df.columns, "band.band_idx", "band.band_bucket")
    )


def banded_pair_scores(
    banded: DataFrame,
    id_col: str = "vec_id",
    nv_col: str = "nv",
    num_salts: int = 1,
) -> DataFrame:
    """Candidate pairs (a < b) sharing >= 1 (band_idx, band_bucket),
    scored by the dot of their pre-normalized vectors (= cosine).
    Output: (a, b, cosine_sim), one row per pair per shared band —
    callers dedup with ``distinct()`` after thresholding.

    ``num_salts > 1`` splits hot buckets' pair enumeration across tasks
    (``operators.skew``); the rows produced are identical."""
    from redis_lsm_timeseries_spark.operators.skew import salted_pair_sides

    left = banded.select(
        F.col(id_col).alias("a"), F.col(nv_col).alias("nva"),
        "band_idx", "band_bucket",
    )
    right = banded.select(
        F.col(id_col).alias("b"), F.col(nv_col).alias("nvb"),
        "band_idx", "band_bucket",
    )
    l, r, keys = salted_pair_sides(
        left, right, ["band_idx", "band_bucket"], left_id_col="a",
        num_salts=num_salts,
    )
    return (
        l.join(r, keys)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", dot("nva", "nvb").alias("cosine_sim"))
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = NUM_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: compete only within the query's LSH bucket.
    The bucket equi-join replaces the cross join — the shuffle key is
    the bucket id, so work scales with bucket occupancy, not corpus
    size."""
    qb = with_lsh_bucket(queries, vec_col, num_planes, dim).select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
        "lsh_bucket",
    )
    cb = with_lsh_bucket(corpus, vec_col, num_planes, dim).select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
        "lsh_bucket",
    )
    scored = (
        cb.join(F.broadcast(qb), "lsh_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", "lsh_bucket", "neighbor_id", "cosine_sim", "rnk")
    )
