"""Portable primitives: the SAME function computed by Spark and by the
DuckDB oracle, so hash-based operators (minhash, simhash, LSH) are
differentially testable. Engine-native hashes (Spark murmur3 ``hash``,
DuckDB ``hash``) use different algorithms, so everything routes through
md5, which both engines implement identically.

Each primitive has a Spark Column form and a SQL-template form
(``*_SQL.format(...)``) that MUST stay in lockstep — tests compare
their outputs cell-exactly.

- ``hash64``  first 15 hex chars of md5 as a non-negative int64
  (60 bits — headroom so bit-position math stays under the sign bit)
- ``tokens``  lowercase whitespace tokenization
- ``shingles`` word k-grams over the token array
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ------------------------------------------------------------------ hash64
# Spark: conv(hex, 16, 10) yields a decimal string; cast to long.
# DuckDB: '0x'-prefixed hex string casts straight to BIGINT.


def hash64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


HASH64_SQL = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"

# hash64 usable inside Spark higher-order-function lambdas (expr string).
HASH64_SPARK_EXPR = "CAST(conv(substring(md5({e}), 1, 15), 16, 10) AS BIGINT)"


# ------------------------------------------------------------------ tokens
def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), r"\s+")


TOKENS_SQL = "string_split_regex(lower({e}), '\\s+')"


# ---------------------------------------------------------------- shingles
def shingles(tok_col: str, k: int = 3) -> Column:
    """Word k-grams over an existing array column (by NAME — the lambda
    body must reference a resolvable column). Spark arrays are 0-indexed
    in SQL-lambda land; guarded so short documents yield an empty array
    instead of a negative-length sequence error."""
    parts = ", ".join(f"{tok_col}[i + {j}]" for j in range(k))
    return F.when(
        F.size(F.col(tok_col)) >= k,
        F.expr(
            f"transform(sequence(0, size({tok_col}) - {k}), "
            f"i -> concat_ws(' ', {parts}))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_col: str, k: int = 3) -> str:
    """DuckDB twin of ``shingles`` — lists are 1-indexed; range(n<=0) is
    already an empty list, so no guard is needed."""
    parts = " || ' ' || ".join(f"{tok_col}[i + {j + 1}]" for j in range(k))
    return f"list_transform(range(len({tok_col}) - {k - 1}), i -> {parts})"


SHINGLES_SQL = shingles_sql  # alias for the functions/__init__ export
