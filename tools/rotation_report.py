"""Catalog-rotation advisor: which entries still need a driver row?

Reads every CORRECTNESS_r*.json, computes the set of queries already
verified by the driver (green hash row, or an executed rows-only row),
and reports — against the CURRENT catalog order — which entries still
lack driver evidence and where they sit relative to the ~50-entry
recording window.  Print-only; reorder `catalog.SPECS` by hand per the
contract in its docstring (tests/test_catalog_contract.py enforces the
invariant afterwards).

Usage: python tools/rotation_report.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mapreduceimpl_spark import catalog  # noqa: E402

WINDOW = catalog.VERIFICATION_WINDOW


def main() -> int:
    verified = catalog.driver_verified_queries()

    names = list(catalog.SPECS)
    unverified = [n for n in names if n not in verified]
    in_window = [n for n in unverified if names.index(n) < WINDOW]
    past_window = [n for n in unverified if names.index(n) >= WINDOW]

    print(f"catalog entries: {len(names)}; driver-verified so far: "
          f"{len([n for n in names if n in verified])}")
    print(f"\nstill unverified, INSIDE window (will get rows next run): "
          f"{len(in_window)}")
    for n in in_window:
        print(f"  {names.index(n) + 1:3d}  {n}")
    print(f"\nstill unverified, PAST window (rotate these forward): "
          f"{len(past_window)}")
    for n in past_window:
        deferred = " [deferred]" if n in catalog.DEFERRED_TO_NEXT_ROUND else ""
        print(f"  {names.index(n) + 1:3d}  {n}{deferred}")
    if past_window:
        movable = [
            n for n in names[:WINDOW]
            if n in verified and "hash" in verified[n]
        ]
        print(f"\nwindow entries already hash-verified (candidates to rotate "
              f"out): {len(movable)}")
        for n in movable[: len(past_window) + 3]:
            print(f"  {names.index(n) + 1:3d}  {n}  ({verified[n]})")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped through head/less — not an error
        import os

        os._exit(0)
