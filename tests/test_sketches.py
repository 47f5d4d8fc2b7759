"""KMV distinct sketch + Bloom membership (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import sketches

# `docs` fixture comes from conftest (sf0.001)


def _kmv(docs, k):
    return {r["lang"]: r for r in sketches.kmv_distinct(docs, k=k).collect()}


def test_kmv_estimator_definition_and_accuracy(docs):
    k = 64
    rows = _kmv(docs, k)
    for lang, r in rows.items():
        assert r["exact_distinct"] > k  # fixture sanity: sketch regime
        # estimator is exactly (k-1)/kth_u
        assert r["est_distinct"] == (k - 1) / r["kth_u"]
        # KMV relative error ~ 1/sqrt(k) = 12.5%; allow 5 sigma
        rel = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 0.625, (lang, rel)


def test_kmv_small_stratum_null_estimate(spark):
    df = spark.createDataFrame(
        [(1, "xx", "a b c d")], ["doc_id", "lang", "text"]
    )  # 2 shingles < k
    row = sketches.kmv_distinct(df, k=64).collect()[0]
    assert row["exact_distinct"] == 2
    assert row["kth_u"] is None and row["est_distinct"] is None


def test_kmv_partition_invariant(docs):
    a = _kmv(docs, 64)
    b = _kmv(docs.repartition(11), 64)
    assert {(r["lang"], r["kth_u"]) for r in a.values()} == {
        (r["lang"], r["kth_u"]) for r in b.values()
    }


def test_kmv_mergeable_summary(docs):
    """The union's k minimum values are recoverable by merging the two
    halves' k minimum values and re-truncating — the property partial
    aggregation relies on."""
    k = 32
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    # collect the distinct hash sets via the operator's own hashing scheme
    def hashes(df):
        from mapreduceimpl_spark.functions.exprs import tokens
        from mapreduceimpl_spark.operators.sampling import hash_uniform

        pre = df.select(tokens("text").alias("t"), "lang").filter(F.size("t") >= 3)
        m = F.size("t") - 2
        sh = F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i + 1, 3))),
        )
        ex = pre.select(F.explode(F.array_distinct(sh)).alias("s")).filter(
            F.lit(True)
        )
        return sorted(
            {r["u"] for r in ex.select(hash_uniform(F.col("s")).alias("u")).distinct().collect()}
        )

    full = hashes(docs)[:k]
    merged = sorted(set(hashes(half_a)[:k]) | set(hashes(half_b)[:k]))[:k]
    assert full == merged


def test_bloom_no_false_negatives_and_fp_regime(docs):
    corpus = docs.select(F.sha2(F.col("text"), 256).alias("key"))
    bits = sketches.bloom_build(corpus, "key", m_bits=4096, n_hashes=3)
    assert bits.count() <= 4096
    members = docs.select(
        F.col("doc_id").cast("string").alias("probe_id"),
        F.sha2(F.col("text"), 256).alias("key"),
    )
    res = sketches.bloom_probe(bits, members, m_bits=4096, n_hashes=3)
    assert res.filter(~F.col("bloom_member")).count() == 0  # no FN, ever


def test_bloom_ghosts_mostly_rejected(spark, docs):
    corpus = docs.select(F.sha2(F.col("text"), 256).alias("key"))
    bits = sketches.bloom_build(corpus, "key", m_bits=8192, n_hashes=3)
    ghosts = spark.range(500).select(
        F.concat(F.lit("g-"), F.col("id").cast("string")).alias("probe_id"),
        F.concat(F.lit("g-"), F.col("id").cast("string")).alias("key"),
    )
    res = sketches.bloom_probe(bits, ghosts, m_bits=8192, n_hashes=3)
    fp = res.filter(F.col("bloom_member")).count()
    # 50 docs x3 lanes <= 150/8192 bits set -> FP ~ (150/8192)^3 ~ 6e-6
    assert fp <= 2


def test_bloom_bits_union_merges(docs):
    """bits(A union B) == bits(A) union bits(B): the filter is mergeable
    across corpus shards by construction."""
    corpus = docs.select(F.sha2(F.col("text"), 256).alias("key"))
    a = corpus.limit(20)
    full = sketches.bloom_build(corpus, "key", m_bits=2048, n_hashes=3)
    pa = {r["pos"] for r in sketches.bloom_build(a, "key", m_bits=2048, n_hashes=3).collect()}
    rest = corpus.exceptAll(a)
    pb = {r["pos"] for r in sketches.bloom_build(rest, "key", m_bits=2048, n_hashes=3).collect()}
    assert {r["pos"] for r in full.collect()} == pa | pb


def test_countmin_one_sided_error_and_exact_when_sparse(spark, docs):
    """est >= true for every queried token (Count-Min's contract), and
    with a huge width vs tiny vocab the estimates are exact."""
    from mapreduceimpl_spark.operators.sketches import countmin_estimate

    rows = countmin_estimate(docs, d=3, w=1024, k=20).collect()
    assert len(rows) == 20
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)

    tiny = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d")], ["doc_id", "text"]
    )
    exact = {r["token"]: r for r in
             countmin_estimate(tiny, d=3, w=65536, k=10).collect()}
    assert all(r["est_cnt"] == r["true_cnt"] for r in exact.values())
    assert exact["a"]["true_cnt"] == 4


def test_countmin_build_bounded_and_mergeable(docs):
    """The sketch never exceeds d*w rows, and summing cell counts per
    lane reproduces the total token count (each instance lands in
    exactly one bucket per lane) — the property that makes two
    sketches mergeable by cell-wise addition."""
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.sketches import countmin_build

    sk = countmin_build(docs, d=3, w=256)
    assert sk.count() <= 3 * 256
    per_lane = {r["lane"]: r["s"] for r in
                sk.groupBy("lane").agg(F.sum("cnt").alias("s")).collect()}
    total = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert per_lane == {0: total, 1: total, 2: total}


def test_countmin_build_validates(spark):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.sketches import countmin_build

    tiny = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        countmin_build(tiny, d=0)


def test_kmv_set_ops_exact_regime_and_counts(spark):
    """k larger than any merged set: exact columns are the truth,
    union/intersection estimates are NULL (the return-the-exact-set
    regime), rho equals the exact intersection."""
    from mapreduceimpl_spark.operators import sketches

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "en"),   # trigrams: abc bcd cde
            (2, "c d e f", "fr"),     # trigrams: cde def
            (3, "x y z", "zh"),       # trigram: xyz
        ],
        ["doc_id", "text", "lang"],
    )
    rows = {
        (r["grp_a"], r["grp_b"]): r
        for r in sketches.kmv_set_ops(docs, k=64).collect()
    }
    assert set(rows) == {("en", "fr"), ("en", "zh"), ("fr", "zh")}
    ef = rows[("en", "fr")]
    assert ef["exact_union"] == 4          # abc bcd cde def
    assert ef["exact_inter"] == 1          # cde
    assert ef["rho"] == 1
    assert ef["tau"] is None and ef["est_union"] is None
    ez = rows[("en", "zh")]
    assert ez["exact_union"] == 4 and ez["exact_inter"] == 0 and ez["rho"] == 0


def test_kmv_set_ops_estimation_regime_identities(docs):
    """With k below the per-language shingle counts, the estimator
    identities hold exactly (deterministic md5 hashes) and the union
    estimate lands near the exact union."""
    from mapreduceimpl_spark.operators import sketches

    out = sketches.kmv_set_ops(docs, k=32).collect()
    assert out  # at least one pair
    for r in out:
        if r["tau"] is None:
            continue
        assert 0.0 < r["tau"] < 1.0
        assert abs(r["est_union"] - 31 / r["tau"]) < 1e-12
        assert abs(r["est_inter"] - r["rho"] * r["est_union"] / 32) < 1e-9
        assert abs(r["est_jaccard"] - r["rho"] / 32) < 1e-12
        assert 0 <= r["rho"] <= 32
        # KMV relative error ~ 1/sqrt(k-1) ~ 18%; allow generous 3x
        assert r["est_union"] > r["exact_union"] * 0.4
        assert r["est_union"] < r["exact_union"] * 2.5


def test_ams_f2_exact_and_replayed_estimate(spark):
    """f2_exact equals the hand-computed self-join size; f2_est equals
    an independent Python replay of the signed-sum/median construction
    (hashlib md5, no Spark expressions)."""
    import datetime as dt
    import hashlib

    from mapreduceimpl_spark.operators.sketches import ams_f2

    # skewed key frequencies: user u appears u+1 times
    rows = []
    eid = 0
    for u in range(12):
        for _ in range(u + 1):
            rows.append((eid, dt.datetime(2024, 1, 1), u, "view", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = ams_f2(events, counters=9).collect()[0]

    freqs = {u: u + 1 for u in range(12)}
    assert got["f2_exact"] == sum(c * c for c in freqs.values())

    def sign(c, k):
        h = int(hashlib.md5(f"{c}#{k}".encode()).hexdigest()[:8], 16)
        return 1 - 2 * (h % 2)

    ests = sorted(
        sum(sign(c, u) * f for u, f in freqs.items()) ** 2 for c in range(9)
    )
    assert got["f2_est"] == ests[4]  # median of 9
    import math

    want_err = math.floor(
        abs(ests[4] - got["f2_exact"]) / got["f2_exact"] * 1e9 + 0.5
    ) / 1e9
    assert got["rel_err"] == want_err


def test_ams_f2_validates_counters(spark):
    import pytest

    from mapreduceimpl_spark.operators.sketches import ams_f2

    df = spark.range(1)
    with pytest.raises(ValueError):
        ams_f2(df, counters=0, key_col="id")
    with pytest.raises(ValueError):
        ams_f2(df, counters=4, key_col="id")


def test_ams_f2_partition_invariant(spark, tables):
    from mapreduceimpl_spark.operators.sketches import ams_f2

    a = ams_f2(tables["events"], counters=9).collect()[0]
    b = ams_f2(tables["events"].repartition(17), counters=9).collect()[0]
    assert a == b
    assert a["f2_exact"] > 0 and a["f2_est"] >= 0


def test_ams_join_size_exact_and_replayed(spark):
    """join_exact equals the hand-computed sum of f_k*g_k; join_est
    equals the hashlib replay of the sketch inner product."""
    import datetime as dt
    import hashlib
    import math

    from mapreduceimpl_spark.operators.sketches import ams_join_size

    lf = {k: k % 3 + 1 for k in range(1, 15)}       # left frequencies
    rf = {k: (k * 7) % 4 + 1 for k in range(5, 25)}  # right, overlapping 5..14
    left = spark.createDataFrame(
        [(k,) for k, f in lf.items() for _ in range(f)], ["o_orderkey"]
    )
    right = spark.createDataFrame(
        [(k,) for k, f in rf.items() for _ in range(f)], ["l_orderkey"]
    )
    got = ams_join_size(left, right, counters=9).collect()[0]
    want_exact = sum(lf[k] * rf[k] for k in set(lf) & set(rf))
    assert got["join_exact"] == want_exact

    def sign(c, k):
        h = int(hashlib.md5(f"{c}#{k}".encode()).hexdigest()[:8], 16)
        return 1 - 2 * (h % 2)

    ests = sorted(
        sum(sign(c, k) * f for k, f in lf.items())
        * sum(sign(c, k) * f for k, f in rf.items())
        for c in range(9)
    )
    assert got["join_est"] == ests[4]
    want_err = math.floor(
        abs(ests[4] - want_exact) / want_exact * 1e9 + 0.5
    ) / 1e9
    assert got["rel_err"] == want_err


def test_ams_join_size_validates_counters(spark):
    import pytest

    from mapreduceimpl_spark.operators.sketches import ams_join_size

    df = spark.range(1)
    with pytest.raises(ValueError):
        ams_join_size(df, df, counters=2, left_key="id", right_key="id")


def test_grid_quantiles_hand_case_and_error_bound(spark):
    """Uniform 1..200: every estimate is the lower edge of the cell
    holding rank ceil(q*n).  The one-cell-width bound is pinned
    against the DISCRETE rank-ceil(q*n) order statistic — the value
    the claim actually covers (ADVICE r6) — computed directly from
    the sorted fixture."""
    import math

    from mapreduceimpl_spark.operators.sketches import grid_quantiles

    vals = sorted(float(i) for i in range(1, 201))
    df = spark.createDataFrame([(v,) for v in vals], ["l_extendedprice"])
    rows = {r["q"]: r for r in grid_quantiles(df, bins=20).collect()}
    assert set(rows) == {0.25, 0.5, 0.75, 0.9, 0.99}
    for q, r in rows.items():
        assert r["n"] == 200
        assert 0 <= r["bin_idx"] <= 19
        # structural bound: the discrete quantile sits in the picked
        # cell -> disc in [est, est + width] (+1 ulp slack)
        disc = vals[math.ceil(q * len(vals)) - 1]
        assert r["est_q"] - 1e-6 <= disc <= r["est_q"] + r["bin_width"] + 1e-6
    # median of 1..200 on a [1,200] 20-cell grid: rank 100 -> value 100
    # lands in cell floor((100-1)/9.95) = 9 -> est edge 1 + 9*9.95
    assert rows[0.5]["bin_idx"] == 9
    assert abs(rows[0.5]["est_q"] - (1 + 9 * 9.95)) < 1e-6


def test_grid_quantiles_discrete_bound_holds_where_interpolation_escapes(spark):
    """The ADVICE-r6 counterexample: values [0,0,10,10], q=0.5 — the
    interpolated median is 5 and lands far outside the picked cell
    (est 0, width 0.5), but the discrete rank-2 order statistic is 0
    and honors the one-cell-width bound.  Pins both facts so the
    docstring's scoping stays honest."""
    from mapreduceimpl_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame(
        [(0.0,), (0.0,), (10.0,), (10.0,)], ["l_extendedprice"]
    )
    r = {row["q"]: row for row in grid_quantiles(df, bins=20).collect()}[0.5]
    assert r["est_q"] == 0.0 and abs(r["bin_width"] - 0.5) < 1e-9
    # discrete rank-ceil(0.5*4)=2 order statistic = 0 -> inside the cell
    assert r["est_q"] <= 0.0 <= r["est_q"] + r["bin_width"]
    # interpolated value escapes the cell — why no bound is claimed
    assert r["exact_q"] == 5.0
    assert r["exact_q"] > r["est_q"] + r["bin_width"]


def test_grid_quantiles_validates(spark):
    import pytest

    from mapreduceimpl_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame([(1.0,)], ["l_extendedprice"])
    with pytest.raises(ValueError):
        grid_quantiles(df, bins=1)
    with pytest.raises(ValueError):
        grid_quantiles(df, qs=(0.5, 1.5))


def test_grid_quantiles_constant_column(spark):
    """All-equal values: the degenerate grid is one cell at the value —
    every quantile estimate equals it, never a NaN/inf bin."""
    from mapreduceimpl_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame([(42.0,)] * 10, ["l_extendedprice"])
    rows = grid_quantiles(df, bins=16).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["bin_idx"] == 0
        assert r["est_q"] == 42.0
        assert r["exact_q"] == 42.0
        assert r["bin_width"] == 0.0


def test_bloom_fp_eval_measured_within_reason_of_bound(spark, tmp_path):
    """On the sf0.001 fixture the measured ghost FP rate must sit in a
    loose band around the analytic expectation (binomial noise over
    200 ghosts), and the exact counts must reconcile."""
    from mapreduceimpl_spark.catalog import SPECS

    r = SPECS["bloom_fp_eval"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_ghosts"] == 200
    assert r["measured_fp"] == r["n_fp"] / 200
    assert 0.0 <= r["expected_fp"] <= 1.0
    # 200 Bernoulli trials: allow a wide band (5 sigma-ish) around p
    import math

    p = r["expected_fp"]
    sigma = math.sqrt(max(p * (1 - p), 1e-9) / 200)
    assert abs(r["measured_fp"] - p) < max(5 * sigma, 0.05)


def test_countmin_error_eval_consistency(spark):
    """Overestimate summary must reconcile with a direct recount of
    countmin_estimate's rows, honor the one-sided-error contract, and
    carry the analytic bound."""
    from mapreduceimpl_spark.catalog import SPECS
    from mapreduceimpl_spark.operators import sketches
    from mapreduceimpl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    r = SPECS["countmin_error_eval"].fn(spark, sf).collect()[0]
    est = sketches.countmin_estimate(
        load_table(spark, sf, "documents"), d=3, w=1024, k=20
    ).collect()
    overs = [e["est_cnt"] - e["true_cnt"] for e in est]
    assert all(o >= 0 for o in overs)  # one-sided error
    assert r["n_probed"] == len(est) == 20
    assert r["max_overest"] == max(overs)
    assert r["sum_overest"] == sum(overs)
    assert r["n_exact"] == sum(1 for o in overs if o == 0)
    assert r["eps_bound"] > 0


# ---------------------------------------------------------------------------
# HyperLogLog (staged round 11): deterministic md5-lane HLL with an
# exact-integer harmonic-mean denominator — the value-checked sibling
# of the rows-only agg_approx entry
# ---------------------------------------------------------------------------


def test_hll_matches_duckdb_oracle(docs):
    """Staged round-11 entry, driver-equivalent compare: the full
    hash -> register -> scaled-integer harmonic sum -> estimator plan
    equals its SQL replay value-exactly at fixture scale."""
    import duckdb

    from tools.check_oracle import compare

    sdf = sketches.hll_distinct(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(sketches.hll_distinct_sql()).fetchdf()
    con.close()
    problems = compare("hll_distinct", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_hll_accuracy_and_register_regime(docs):
    """HLL's documented relative error 1.04/sqrt(m) = 6.5% at m=256
    holds with a 5-sigma band in the raw-estimator regime; small
    strata (the fixture has langs with a few dozen distinct tokens)
    sit in the linear-counting regime where the estimate is
    near-exact.  At least one stratum must exercise EACH regime so
    both estimator branches are fixture-covered."""
    rows = {r["lang"]: r for r in sketches.hll_distinct(docs).collect()}
    assert rows
    regimes = set()
    for lang, r in rows.items():
        rel = abs(r["rel_err"])
        if r["exact_distinct"] > 640:
            regimes.add("raw")
            assert rel < 5 * 1.04 / 16.0, (lang, rel)
        else:
            regimes.add("lc")
            assert rel < 0.15, (lang, rel)
        assert r["rel_err"] == round(
            (r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"], 6
        )
    # the tiny fixture's strata all sit below the 2.5m threshold —
    # the raw-estimator branch is exercised by the synthetic stratum
    # in test_hll_raw_regime_accuracy below
    assert regimes == {"lc"}, regimes


def test_hll_raw_regime_accuracy(spark):
    """The raw harmonic-mean estimator branch (past the paper's 2.5m
    small-range threshold): 5000 distinct tokens in one stratum must
    estimate within HLL's 5-sigma band and must NOT take the
    linear-counting branch."""
    df = spark.range(5000).selectExpr(
        "id AS doc_id", "'xx' AS lang", "concat('tok', id) AS text"
    )
    r = sketches.hll_distinct(df).collect()[0]
    assert r["exact_distinct"] == 5000
    assert abs(r["rel_err"]) < 5 * 1.04 / 16.0, r["rel_err"]
    # raw branch: with 5000 >> m=256 the sketch saturates most
    # registers; if any are empty, LC would have needed raw <= 640,
    # impossible at this cardinality (est is far above)
    assert r["est_distinct"] > 640


def test_hll_small_range_linear_counting(spark):
    """A stratum with few distinct tokens lands in the paper's
    linear-counting regime: est = m * ln(m / V) with V = empty
    registers — check the exact formula and that the estimate is
    close to exact (LC is near-exact when V ~ m)."""
    import math

    df = spark.createDataFrame(
        [(1, "xx", "a b c d e f g h"), (2, "xx", "a b c d i j")],
        ["doc_id", "lang", "text"],
    )
    r = sketches.hll_distinct(df).collect()[0]
    assert r["exact_distinct"] == 10
    m, v = 256, r["n_empty"]
    assert v > 0
    assert r["est_distinct"] == round(float(m) * math.log(float(m) / v), 6)
    assert abs(r["est_distinct"] - 10) <= 1.0


def test_hll_partition_invariant(docs):
    """Register maxima are order/partition-free: a repartitioned
    corpus yields the identical sketch rows."""
    a = {tuple(r) for r in sketches.hll_distinct(docs).collect()}
    b = {tuple(r) for r in sketches.hll_distinct(docs.repartition(13)).collect()}
    assert a == b


def test_hll_nondefault_p_matches_oracle_and_stays_finite(docs):
    """Review r10: the 2^(wbits+1) scaling must keep the integer
    denominator overflow-free and the shift count non-negative across
    the WHOLE validated p range — p=4 (rank can reach 57) and p=12
    (4096 registers, mostly empty at fixture scale) both replay
    value-exactly in DuckDB, where the old 2^53 scaling errored with
    negative-shift / int64-overflow respectively."""
    import duckdb

    from tools.check_oracle import compare

    for p in (4, 12):
        sdf = sketches.hll_distinct(docs, p=p).toPandas()
        assert (sdf["est_distinct"] > 0).all(), (p, sdf)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        odf = con.execute(sketches.hll_distinct_sql(p=p)).fetchdf()
        con.close()
        problems = compare(f"hll_distinct_p{p}", sdf, odf)
        assert not problems, (p, problems)
