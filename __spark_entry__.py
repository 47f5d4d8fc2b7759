"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All definitions live in ``mapreduceimpl_spark.catalog``; this module is
the thin contract shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine package importable even when this module is loaded
# by file path from a different working directory
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from mapreduceimpl_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference parity: the word-frequency count of
    test.go:13-81) on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.queries()["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omissions = rows-only ops)."""
    return catalog.oracle_sql()
