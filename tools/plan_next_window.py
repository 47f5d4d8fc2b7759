"""Next-round window planner: prints the recommended catalog order.

Mechanizes the reorder the rotation contract demands at each round
start (catalog.py docstring; the six-round max-age policy and its
forward simulation in tests/test_catalog_contract.py): given the live
CORRECTNESS_r*.json evidence, emit the full SPECS name list in the
packing order the simulation assumes —

  1. never-driver-attested oracle-backed entries (the deferral set),
     in their current relative order;
  2. every other oracle-backed entry, stalest newest-row first
     (ties broken by current position, so cohorts stay contiguous);
  3. rows-only entries (no oracle — the driver records a weaker check
     whenever they run; they never consume a rotation slot), in
     current order, at the tail.

Paste the output as the next ``_ROUND{N}_ORDER`` literal and rename
the variable; ``DEFERRED_TO_NEXT_ROUND`` needs no edit — since round
9 it is DERIVED from the live CORRECTNESS files at catalog import
(exactly the oracle-backed entries past the window with no driver
row).  Run tests/test_catalog_contract.py — the simulation test
validates the result mechanically.

Usage: python tools/plan_next_window.py [--names-only]
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mapreduceimpl_spark import catalog  # noqa: E402

WINDOW = catalog.VERIFICATION_WINDOW


def newest_hash_rounds(repo_dir: str) -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    rounds = [0]
    for path in sorted(glob.glob(f"{repo_dir}/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:  # stray file (e.g. a _draft copy): skip, don't crash
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    newest[name] = max(newest.get(name, 0), rnd)
    return newest, max(rounds)


def planned_order() -> tuple[list[str], dict[str, int]]:
    """The packing policy over the live CORRECTNESS evidence —
    never-attested oracle-backed entries first (current relative
    order), then attested stalest-first (position tiebreak), rows-only
    at the tail.  tests/test_catalog_contract.py builds its simulated
    next-driver window from THIS function's output, so the simulation
    and the real round-start repack cannot disagree (review r10: the
    frozen-prefix simulation was the r7/8/9 round-start-red class)."""
    repo = str(Path(__file__).resolve().parents[1])
    newest, _ = newest_hash_rounds(repo)
    names = list(catalog.SPECS)
    pos = {n: i for i, n in enumerate(names)}
    oracle = [n for n in names if catalog.SPECS[n].oracle is not None]
    rows_only = [n for n in names if catalog.SPECS[n].oracle is None]
    never = [n for n in oracle if newest.get(n, 0) == 0]
    attested = [n for n in oracle if newest.get(n, 0) > 0]
    attested.sort(key=lambda n: (newest[n], pos[n]))
    return never + attested + rows_only, newest


def main() -> int:
    order, newest = planned_order()
    names_only = "--names-only" in sys.argv[1:]
    if not names_only:
        window = order[:WINDOW]
        print(f"# next-round window ({len(window)} slots): "
              f"{sum(1 for n in window if newest.get(n, 0) == 0)} "
              f"first-attestations + "
              f"{sum(1 for n in window if newest.get(n, 0) > 0)} refreshes")
        ages = sorted({newest.get(n, 0) for n in window})
        print(f"# newest-row rounds inside the window: {ages}")
        print(f"# paste below as the next _ROUND<N>_ORDER literal:")
    for i in range(0, len(order), 4):
        row = ", ".join(f"'{n}'" for n in order[i : i + 4])
        print(f"    {row},")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` closed the pipe: not an error
        raise SystemExit(0)
