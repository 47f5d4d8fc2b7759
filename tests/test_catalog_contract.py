"""Catalog-ordering contract guard.

The correctness driver records rows for the FIRST 50 catalog entries
in insertion order.  The standing contract (catalog.py docstring,
COVERAGE.md): every entry that has never received a green row in any
previous round's CORRECTNESS_r*.json must sit inside those 50
positions (or be a derived deferral awaiting the next repack), so
each round converts maximum unproven surface into driver evidence.
This test enforces the invariant mechanically for future rounds'
reorderings; since round 9 DEFERRED_TO_NEXT_ROUND is derived from
the live CORRECTNESS files, so the round-7/8 failure mode (driver
attests the entry the hand-maintained literal parked at position 50)
is unrepresentable.
"""

from __future__ import annotations

from mapreduceimpl_spark import catalog

WINDOW = catalog.VERIFICATION_WINDOW


def _previously_verified() -> set[str]:
    return set(catalog.driver_verified_queries())


def test_unverified_entries_lead_the_window():
    names = list(catalog.SPECS)
    verified = _previously_verified()
    stragglers = [
        (i + 1, n)
        for i, n in enumerate(names)
        if i >= WINDOW
        and n not in verified
        and n not in catalog.DEFERRED_TO_NEXT_ROUND
    ]
    assert not stragglers, (
        "catalog entries without a prior driver CORRECTNESS row sit past "
        f"the ~50-entry recording window: {stragglers} — reorder SPECS so "
        "they lead (see catalog.py docstring), or add a deliberate deferral "
        "to catalog.DEFERRED_TO_NEXT_ROUND"
    )


def test_no_oracle_backed_entry_goes_stale():
    """Max-age policy (VERDICT r5 #7, cycle widened r7): every
    oracle-backed entry must be re-attested by the driver at most every
    6 rounds.  Concretely, before round N runs, an oracle-backed entry
    must either (a) sit inside the recording window (gets a fresh row
    now), (b) have a driver row from round >= N-6, or (c) be a declared
    deferral.  Feasibility arithmetic at the round-7-final catalog
    (274 oracle-backed entries, ~49 recorded slots/round):
    steady-state re-attestation demand is 274/6 ~= 45.7 slots/round —
    the previous 4-round cycle would demand 68 slots/round,
    permanently above the window, so ANY schedule breaches it by
    round 8 (70 deferred first-attestations + 45 r3 refreshes = 115
    rows needed in 98 slots).  The 6-round cycle is the tightest
    feasible one, leaving ~4 slots/round of headroom for catalog
    growth (new-entry intake must be budgeted against this margin);
    rounds still pack windows stalest-first so realized ages stay
    well under the bound."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    newest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:  # stray file (e.g. a _draft copy): skip, don't crash
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    newest[name] = max(newest.get(name, 0), rnd)
    if not rounds:
        return
    upcoming = max(rounds) + 1
    names = list(catalog.SPECS)
    stale = [
        (i + 1, n, newest.get(n, 0))
        for i, n in enumerate(names)
        if i >= WINDOW
        and catalog.SPECS[n].oracle is not None
        and n not in catalog.DEFERRED_TO_NEXT_ROUND
        and newest.get(n, 0) < upcoming - 6
    ]
    assert not stale, (
        f"oracle-backed entries outside the window whose newest driver row "
        f"is older than round {upcoming - 6}: {stale} — rotate them into "
        "window positions (see catalog.py docstring)"
    )


def test_rotation_schedule_simulates_clean_for_future_rounds():
    """VERDICT r6 #2 made executable: simulate the next SIX driver
    windows under the documented packing policy (this round's window is
    the live SPECS prefix; every later round repacks its 50 slots
    stalest-first, never-verified entries first) and assert that no
    oracle-backed entry ever breaches the 6-round max-age and that no
    deferred entry waits more than one further round.  Any catalog
    addition that would make a FUTURE round's schedule infeasible fails
    here today, not two rounds from now in judge arithmetic."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    newest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:  # stray file (e.g. a _draft copy): skip, don't crash
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    newest[name] = max(newest.get(name, 0), rnd)
    if not rounds:
        return
    names = list(catalog.SPECS)
    tracked = [n for n in names if catalog.SPECS[n].oracle is not None]
    age = {n: newest.get(n, 0) for n in tracked}
    upcoming = max(rounds) + 1

    # the deferral contract: everything deferred now must be attested
    # in the FIRST repacked round, so it must fit one window
    deferred_now = [n for n in tracked if age[n] == 0 and n not in names[:WINDOW]]
    assert len(deferred_now) <= WINDOW, (
        f"{len(deferred_now)} deferred oracle-backed entries cannot all "
        f"fit the next {WINDOW}-slot window — the deferral would chain"
    )

    for r in range(upcoming, upcoming + 6):
        if r == upcoming:
            window = [n for n in names[:WINDOW] if n in age]
        else:
            window = sorted(age, key=lambda n: (age[n], n))[:WINDOW]
        for n in window:
            age[n] = r
        # age == 0 is a declared deferral (never attested), legal for
        # exactly one repack cycle — checked separately below
        breaches = [(n, age[n]) for n in age if 0 < age[n] < r - 6]
        assert not breaches, (
            f"simulated round {r} leaves oracle-backed entries past the "
            f"6-round max-age even under stalest-first packing: "
            f"{sorted(breaches)[:10]} — the catalog has outgrown the "
            "window; remove entries or widen the documented cycle"
        )
        if r > upcoming:
            never = sorted(n for n in age if age[n] == 0)
            assert not never, (
                f"deferred entries still unattested after the first "
                f"repacked window (round {r}): {never[:10]} — a deferral "
                "may wait at most one round"
            )


def test_deferred_set_self_cleans():
    """Once a deferred entry receives a driver CORRECTNESS row it must
    leave DEFERRED_TO_NEXT_ROUND (and, per the rotation contract, move
    into the window the round after it was added).  Since round 9 the
    set is DERIVED from the live CORRECTNESS files — this reddened in
    rounds 7 AND 8 because a hand-kept literal parked an entry at
    position 50 of a window planned one slot too small.  To avoid
    being a tautology (review r9: the catalog derivation subtracts the
    same verified set this test would intersect with), the expected
    set is RE-DERIVED here from the raw CORRECTNESS JSON — independent
    glob, independent hash_match/rows-only logic — and compared whole:
    a regression in either the catalog's derivation or
    driver_verified_queries' parsing fails the equality."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    verified: set[str] = set()
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        if not re.search(r"_r(\d+)\.json$", path):
            continue
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                ):
                    verified.add(name)
    names = list(catalog.SPECS)
    expected = (
        frozenset(
            n
            for i, n in enumerate(names)
            if i >= catalog.VERIFICATION_WINDOW
            and catalog.SPECS[n].oracle is not None
            and n not in verified
        )
        if verified
        else frozenset()
    )
    assert catalog.DEFERRED_TO_NEXT_ROUND == expected
    unknown = sorted(catalog.DEFERRED_TO_NEXT_ROUND - set(catalog.SPECS))
    assert not unknown, f"deferred names not in SPECS: {unknown}"


def test_embedding_fixture_dim_matches_lsh_oracles(embeddings):
    """The LSH oracles generate their seeded hyperplane matrices at
    catalog.EMBEDDING_FIXTURE_DIM while the Spark side derives dim from
    the data; if the embeddings fixture ever changes width, this is the
    alarm that the two would silently desync (ADVICE r2)."""
    from mapreduceimpl_spark.operators.similarity import derive_dim

    assert derive_dim(embeddings) == catalog.EMBEDDING_FIXTURE_DIM


def test_catalog_names_unique_and_oracles_subset():
    names = list(catalog.SPECS)
    assert len(names) == len(set(names))
    assert set(catalog.oracle_sql()) <= set(catalog.queries())


def test_every_spec_has_runnable_shape():
    for name, spec in catalog.SPECS.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name


def test_catalog_queries_pin_utc_under_hostile_session(spark):
    """A caller session in a non-UTC timezone must get identical
    results from catalog.queries() (which pins UTC per query) — the
    derived dates/strings in the oracle contract are UTC instants."""
    q = catalog.queries()["scalar_case_date"]
    sf = "/root/testdata/sf0.001"

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    baseline = {tuple(r) for r in q(spark, sf).collect()}

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        hostile = {tuple(r) for r in q(spark, sf).collect()}
        # the pin must also leave the session in UTC afterwards is NOT
        # promised — only the query's own results are
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert hostile == baseline and len(baseline) > 0


def test_events_tumbling_pins_utc_too(spark):
    """Window boundaries over the nanos-timestamp events table are the
    timezone-sensitive worst case — same hostile-session check."""
    q = catalog.queries()["events_tumbling"]
    sf = "/root/testdata/sf0.001"

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    baseline = {tuple(r) for r in q(spark, sf).collect()}
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
    try:
        hostile = {tuple(r) for r in q(spark, sf).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert hostile == baseline and len(baseline) > 0


def test_catalog_plan_lint_no_cartesian_bounded_bnlj(spark):
    """Plan lint over the ENTIRE catalog: no entry may plan a
    CartesianProduct, and BroadcastNestedLoopJoin may appear only
    where a bounded side is deliberately broadcast — 1-row
    totals/thresholds riding a crossJoin (corpus statistics,
    scalar-subquery decorrelations), the broadcast query side of the
    ANN/k-NN scorers, and the intentionally tiny join_cross.  A new
    entry that accidentally degenerates to a nested loop fails here
    before it can reach a 100 TB plan."""
    from mapreduceimpl_spark.plans import explain_str

    # every name here is a reviewed, bounded nested-loop: the
    # broadcast side is 1 row (aggregate total / threshold / ref
    # date) or the small query batch; join_cross is the explicit
    # bounded cartesian parity entry
    bnlj_ok = {
        "sales_opportunity",   # scalar AVG subquery broadcast (Q22)
        "revenue_share",       # 1-row threshold (Q11)
        "heavy_hitters",       # 1-row token total
        "text_bigram_logprob", # 1-row token total
        "lm_quality_buckets",  # same 1-row token total via the shared
                               # bigram scorer
        "collocations_pmi",    # 1-row pair + token totals
        "revenue_pareto",      # 1-row revenue total
        "customer_rfm",        # 1-row reference date
        "knn_classify",        # broadcast query batch vs corpus scan
        "ann_topk",            # broadcast query batch vs corpus scan
        "retrieval_metrics",   # ann_topk's broadcast query batch feeds
                               # the evaluated ranked lists
        "hybrid_search_rrf",   # composes ann_topk's broadcast query batch
                               # + bm25's 1-row corpus stats (both above)
        "triplet_mining",      # broadcast anchor batch vs corpus scan
        "tfidf_topterms",      # 1-row doc-count denominator
        "text_unigram_logprob",# 1-row token total
        "join_cross",          # intentional bounded cross join
        "bm25_search",         # 1-row corpus stats (N, sum dl)
        "basket_rules",        # 1-row order total
        "dq_expectations",     # 1-row n_checked total riding the RI rule
        "histogram_drift",     # 1-row global (min,max) + 1-row totals
        "cuped_adjustment",    # 1-row pooled moments (theta, mean_x)
        "bpe_train_merges",    # 1-row argmax merge pair per round
        "unigram_lm_train",    # 1-row inventory total for count/total
        "classifier_eval",     # 1-row confusion x 1-row rank aggregate
        "ams_join_size",       # 1-row exact x 1-row sketch x 1-row sketch
        "grid_quantiles",      # 1-row min/max stats + bounded |qs| x bins pick
        "markov_stationary",   # 1-row type count onto the bounded type set
        "survival_km",         # 1-row corpus-end ts + 1-row total onto bounded days
        "ann_recall_eval",     # composes ann_topk's broadcast query batch
        "pq_recall_eval",      # same broadcast query batch on its exact side
        "vocab_keyness",       # 1-row corpus totals (n_t, n_r, |V|)
        "bpe_apply",           # same 1-row argmax broadcast, +1 round
        "bpe_vocab",           # same 1-row argmax broadcast, +1 round
        "dsir_weights",        # 1-row target/pool bucket-mass totals
        "dsir_select",         # same 1-row totals via dsir_weights
        "skipgram_negatives",  # 1-row CDF grand total W
        "heaps_law_growth",    # broadcast n_checkpoints-row cutoff
                               # frame fans the two aggregates out
                               # (bounded x10, never corpus x corpus)
        "unigram_kl",          # 1-row corpus totals (tt, tp, |V|)
        "kmv_set_ops",         # G-row strata grid self-paired
                               # (G = #languages, bounded C(G,2))
        "rouge_pairs",         # 2-row broadcast n-grid onto the pair frame
        "bpe_fertility",       # rides bpe_apply's 1-row argmax broadcasts
        "lm_heldout_perplexity",  # 1-row train totals (N, V) broadcast
        "cramers_v",           # 1-row grand-total (n, r, c) broadcast
        "aspect_buckets",      # 7-row bucket list broadcast onto images
        "t_closeness",         # bounded classes x sources grid +
                               # 1-row global total broadcast
        "kmeans_ari",          # 1-row x 1-row x 1-row ARI sums +
                               # the Lloyd chain's k*dim broadcasts
        "kmeans_silhouette",   # the Lloyd chain's k*dim broadcasts
        "benford_digits",      # 1-row total onto the 9-digit counts
        "psi_drift",           # 1-row (lo,hi) + 1-row totals broadcast
        "curriculum_phases",   # 1-row cutoffs + 1-row token total, on
                               # top of unigram_logprob's 1-row total
        "deletion_cascade",    # three 1-row x 1-row count pairs
        "session_depth_hist",  # 1-row session total onto the bounded
                               # depth histogram
        "qlm_search",          # bm25's broadcast query vocab + 1-row
                               # collection total
        "bloom_fp_eval",       # 1-row ghost stats x 1-row key count,
                               # over bloom_membership's broadcast bits
        "countmin_error_eval", # 1-row probe stats x 1-row token total,
                               # over countmin's broadcast query rows
        "bpe_train_batched",   # 1-row sorted merge-array broadcast per
                               # pass (the rank-ordered replace fold)
        "mmr_rerank",          # composes ann_topk's broadcast query batch
                               # (candidate top-pool), then bounded frames
        "kneser_ney_bigram",   # 1-row N1+(*,*) pair-type total broadcast
                               # onto the scored pair stream
    }
    sf = "/root/testdata/sf0.001"
    cart, bad_bnlj = [], []
    for name, spec in {**catalog.SPECS, **catalog.RETIRED_SPECS}.items():
        plan = explain_str(spec.fn(spark, sf), "simple")
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad_bnlj.append(name)
    assert not cart, f"cartesian products in: {cart}"
    assert not bad_bnlj, f"unreviewed nested-loop joins in: {bad_bnlj}"


def test_contract_stays_green_after_next_driver_run(tmp_path):
    """The round-7/8 failure mode was HEAD reddening the moment the
    driver's CORRECTNESS file landed.  Simulate exactly that: copy the
    live evidence, synthesize the next round's file (hash rows for one
    full window — 50 rows, the demonstrated driver behavior), and
    assert the whole contract holds against it: the derived deferral
    set self-cleans to exactly the past-window unattested entries, no
    oracle-backed entry breaches the 6-round max-age, and the
    stalest-first repack schedule stays feasible for six further
    rounds.

    The simulated window is the PLANNER'S repacked order
    (tools.plan_next_window.planned_order over the live evidence —
    never-attested first, then stalest-first), NOT the frozen SPECS
    prefix: each round starts by pasting exactly that repack, so
    simulating the frozen prefix re-attests the previous window and
    falsely breaches max-age the moment the current round's
    CORRECTNESS file lands (the round-9 red, third of its class —
    VERDICT r9 #1).  Mid-round the two coincide (the live prefix IS
    the planner's output); after the file lands only the planner
    window models what the next round-start will actually run."""
    import glob
    import json
    import re
    import shutil
    from pathlib import Path

    from tools.plan_next_window import planned_order

    repo = Path(__file__).resolve().parents[1]
    rounds = []
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rounds.append(int(m.group(1)))
        shutil.copy(path, tmp_path / Path(path).name)
    if not rounds:
        return
    nxt = max(rounds) + 1
    names = list(catalog.SPECS)
    window = planned_order()[0][: catalog.VERIFICATION_WINDOW]
    synthetic = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
        for n in window
    }
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(
        json.dumps(synthetic)
    )

    verified = catalog.driver_verified_queries(repo_dir=str(tmp_path))
    assert set(window) <= set(verified)

    # derived deferral against the simulated evidence: exactly the
    # oracle-backed past-window entries with no LIVE row that the
    # simulated window did not just attest (the planner packs
    # never-attested entries first, so any deferral it can reach gets
    # a synthetic row and must leave the set) — computed from the live
    # evidence so the expectation survives future repacks instead of
    # hardcoding names (the round-7/8 hand-maintenance mistake in
    # miniature)
    live_verified = set(catalog.driver_verified_queries())
    expected_deferred = {
        n
        for i, n in enumerate(names)
        if i >= catalog.VERIFICATION_WINDOW
        and catalog.SPECS[n].oracle is not None
        and n not in live_verified
        and n not in window
    }
    deferred = {
        n
        for i, n in enumerate(names)
        if i >= catalog.VERIFICATION_WINDOW
        and catalog.SPECS[n].oracle is not None
        and n not in verified
    }
    assert deferred == expected_deferred
    # and the simulated run strictly shrank-or-held the unattested set
    assert deferred <= {
        n for n in names if n not in live_verified
    }

    # max-age at the simulated next-round start: nothing outside the
    # deferral set may be older than nxt+1 - 6 (checked before the
    # round AFTER the simulated one runs, mirroring the live test)
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(str(tmp_path / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    tracked = [n for n in names if catalog.SPECS[n].oracle is not None]
    age = {n: newest.get(n, 0) for n in tracked}
    breaches = [
        n for n in tracked
        if n not in deferred and 0 < age[n] < (nxt + 1) - 6
    ]
    assert not breaches, breaches

    # six simulated repacked rounds stay feasible (stalest-first,
    # never-attested first — the planner's policy)
    for r in range(nxt + 1, nxt + 7):
        w = sorted(age, key=lambda n: (age[n], n))[: catalog.VERIFICATION_WINDOW]
        for n in w:
            age[n] = r
        late = [(n, a) for n, a in age.items() if 0 < a < r - 6]
        assert not late, (r, sorted(late)[:10])
        if r > nxt + 1:
            assert not [n for n, a in age.items() if a == 0]
