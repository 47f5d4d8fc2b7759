"""Physical-plan introspection: make scale properties testable.

The 100 TB posture is only real if the plans prove it.  These helpers
let tests (and operators' own assertions) check that:

- filters reached the parquet scan (``PushedFilters``),
- the scan reads only needed columns (``ReadSchema``),
- dimension joins broadcast instead of shuffling the fact side,
- nothing degenerated into a cartesian product.

The reference has no analogue (no optimizer, SURVEY.md §4.1); this is
the Spark-native replacement for "trust me": plan regression tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    """String form of the EXECUTED physical plan (post-AQE re-planning).

    ``explain_str`` shows the initial plan (``isFinalPlan=false``) until
    the query has run; runtime effects — exchange reuse, AQE join
    rewrites, coalesced partitions — are only visible here.  The caller
    must have executed the DataFrame first (e.g. ``df.collect()``).

    Centralizes the private ``_jdf.queryExecution().executedPlan()``
    JVM access (ADVICE r11: one place to fix on a Spark upgrade or
    under Spark Connect, instead of per-test).  AdaptiveSparkPlan's
    ``toString`` appends a pre-execution "Initial Plan" section where
    runtime reuse has not happened yet; it is cut off when present
    (absent on non-adaptive plans or if a future Spark renames it —
    callers then see the full string, and the ``isFinalPlan=true``
    assertion most callers make still guards staleness).
    """
    final = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    head, _sep, _tail = final.partition("Initial Plan")
    return head


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the scan's PushedFilters list."""
    plan = explain_str(df)
    pushed = "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter {frag!r} not pushed to scan; PushedFilters lines:\n{pushed}\nfull plan:\n{plan}"
            )


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(f.split(":")[0] for f in m.group(1).split(",") if f)
    return cols


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    """Assert >= ``expect`` broadcast joins in the physical plan."""
    plan = explain_str(df, "simple")
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < expect:
        raise AssertionError(f"expected >= {expect} broadcast joins, found {n}:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    if "CartesianProduct" in plan:
        raise AssertionError(f"unexpected CartesianProduct:\n{plan}")
