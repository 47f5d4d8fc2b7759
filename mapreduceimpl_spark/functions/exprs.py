"""Reusable column expressions — all JVM-side (no Python UDFs).

The reference's entire scalar surface is split/parse/add/format/hash
(SURVEY.md §2.8).  Here every helper is a Catalyst expression so it
stays inside whole-stage codegen; several are written specifically so
the same computation is *bit-reproducible* in the DuckDB oracle:

- ``dec_sum``/``dec_avg``: sum doubles through DECIMAL(28,4) so the
  result is independent of partition/accumulation order (a float sum is
  not associative; at 100 TB the shuffle order is nondeterministic, so
  order-independent aggregates are a correctness feature, not a test
  convenience).
- ``md5_token_hash``: portable content hash (md5 hex) that any engine
  reproduces, used by MinHash/SimHash/fingerprinting instead of
  engine-private hash functions.
- ``dot``/``cosine_similarity``: sequential fold over the array in list
  order with a DOUBLE accumulator — deterministic and identical to a
  C++ loop over the same list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(28, s): wide enough for 100 TB-scale sums of money-like values
# (~1e14 rows * 1e5 max value = 1e19 << 1e24 headroom at s=4).
_DEC = "decimal(28,4)"


def dec_sum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double column, returned as DOUBLE.

    Oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG as exact-decimal-sum / count, as DOUBLE.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def revenue() -> Column:
    """TPC-H style extended revenue: price * (1 - discount).

    A double product is IEEE-deterministic (unlike a double sum), so it
    needs no decimal detour at row level.
    """
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def tokens(text_col: Column | str = "text") -> Column:
    """Whitespace tokenization shared by wordcount/dedup/text-analysis.

    Single-space split; identical to DuckDB ``string_split(text, ' ')``.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def md5_token_hash(col: Column, seed: int) -> Column:
    """Portable per-seed content hash: md5 hex of ``'<seed>#' || value``.

    Lowercase-hex md5 is identical across Spark/DuckDB/anything, so
    MinHash signatures built from its lexicographic MIN are
    engine-independent (the reference's FNV-1a at ``test.go:77-81``
    plays the same "stable hash" role for its shuffle).
    """
    return F.md5(F.concat(F.lit(f"{seed}#"), col))


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product of two ARRAY<DOUBLE> columns (JVM-side).

    ``aggregate(zip_with(a, b, *), 0.0D, +)`` — one pass, no UDF.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an ARRAY<DOUBLE> column (sqrt is IEEE-exact)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<DOUBLE> columns, fully JVM-side."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
