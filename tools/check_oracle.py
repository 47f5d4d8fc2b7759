"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark AND its oracle SQL on DuckDB at the
given sf dir, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns — order
insensitive, exact equality; floats compared bitwise after
normalization to float64).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mapreduceimpl_spark import catalog, get_spark  # noqa: E402
from mapreduceimpl_spark.sources import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    a, b = _normalize(spark_df), _normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            neq = 0
            example = None
            for x, y in zip(av, bv):
                same = (
                    (x is None and y is None)
                    or (isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y))
                    or x == y
                )
                if not same:
                    neq += 1
                    if example is None:
                        example = (x, y)
            if neq:
                problems.append(f"col {c!r}: {neq} mismatched values, e.g. spark={example[0]!r} oracle={example[1]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name, spec in catalog.SPECS.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:500]}")
            n_fail += 1
            continue
        t1 = time.time()
        if spec.oracle is None:
            print(f"ok   {name}: rows={len(sdf)} (rows-only, {t1 - t0:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARNING {name}: 0 rows")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:500]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: rows={len(sdf)}")
            for p in problems:
                print(f"     {p}")
        else:
            mark = " (EMPTY)" if len(sdf) == 0 else ""
            print(f"PASS {name}: rows={len(sdf)}{mark} spark={t1 - t0:.1f}s duckdb={time.time() - t1:.1f}s")
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
