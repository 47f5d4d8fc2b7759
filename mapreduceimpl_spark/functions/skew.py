"""Skew-handling helpers for 100 TB joins and aggregations.

AQE's skew-join splitting (on by default in ``session.py``) handles
most skew at runtime; these helpers cover the cases AQE can't:
broadcast-ineligible medium dims joined on a hot key, and two-phase
aggregation over a hot group.

``salted_join``: the classic salt-and-explode.  The large side gets a
deterministic per-row salt in [0, n); the small side is replicated n
times (one row per salt value); the join key becomes (key, salt), so a
hot key's rows spread across n reducers instead of one.

``two_phase_agg``: pre-aggregate by (key, salt), then finish by key —
the map-side-combine idea (``test.go:22-25``) applied a second time
against key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def add_salt(df: DataFrame, n_salts: int, *, deterministic_by: Sequence[str] | None = None) -> DataFrame:
    """Add a salt column in [0, n_salts).

    By default the salt is a deterministic hash of the whole row
    (stable under retries/speculative execution — important: a random
    salt can double-count rows when a task is re-executed).  Pass
    ``deterministic_by`` to hash specific columns instead.
    """
    cols = [F.col(c) for c in (deterministic_by or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each row once per salt value (small side of a salted
    join).  Row count multiplies by n_salts — keep the side small."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


_SALTED_JOIN_HOWS = frozenset(
    {
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    }
)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``n_salts``
    reducers.  Result is identical to ``large.join(small, on, how)``
    (asserted in tests); only the shuffle distribution changes.

    ``how`` is restricted to inner/left/semi/anti: for right or full
    outer joins the exploded small side would emit each UNMATCHED
    small-side row once per salt value (n_salts phantom rows), so those
    modes are rejected rather than silently wrong.
    """
    if how not in _SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated small side "
            f"would duplicate unmatched rows; use one of {sorted(_SALTED_JOIN_HOWS)}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = add_salt(large, n_salts)
    s_salted = explode_salts(small, n_salts)
    out = l_salted.join(s_salted, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant aggregation: partial agg by (keys, salt), final
    agg by keys.  ``aggs`` = (func, col, alias) with func in
    {sum, count, min, max} (the re-aggregatable functions).
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for func, col, alias in aggs:
        p = f"__p_{alias}"
        if func == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif func == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif func == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(alias))
        elif func == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(alias))
        else:
            raise ValueError(f"non-reaggregatable func {func!r}")
    salted = add_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
