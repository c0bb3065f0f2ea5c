"""Scalar helpers shared by operators and the query catalog."""

from redis_lsm_timeseries_spark.functions.portable import (
    HASH64_SQL,
    TOKENS_SQL,
    hash64,
    hashed_shingles_expr,
    hashed_shingles_sql,
    token_hashes_sql,
    tokens,
)

__all__ = [
    "HASH64_SQL",
    "TOKENS_SQL",
    "hash64",
    "hashed_shingles_expr",
    "hashed_shingles_sql",
    "token_hashes_sql",
    "tokens",
]
