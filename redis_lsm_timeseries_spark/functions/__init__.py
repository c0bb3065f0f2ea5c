"""Scalar helpers shared by operators and the query catalog."""

from redis_lsm_timeseries_spark.functions.portable import (
    HASH64_SQL,
    SHINGLES_SQL,
    TOKENS_SQL,
    hash64,
    shingles,
    tokens,
)

__all__ = [
    "HASH64_SQL",
    "SHINGLES_SQL",
    "TOKENS_SQL",
    "hash64",
    "shingles",
    "tokens",
]
