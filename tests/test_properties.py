"""Hypothesis property tests for the pure-logic kernels.

These check the driver-side algorithms (packing recurrence, block
partitioning, hash→uniform mapping) against independent pure-Python
references across randomized inputs — no Spark session needed, so
hundreds of cases run in milliseconds.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from mapreduceimpl_spark.operators import dedup
from mapreduceimpl_spark.operators.packing import _pack_one_group


# --- greedy packing recurrence --------------------------------------------


def _pack_reference(sizes: list[int], budget: int) -> list[int]:
    bins, bin_id, fill = [], 0, 0
    for n in sizes:
        if fill > 0 and fill + n > budget:
            bin_id += 1
            fill = 0
        fill += n
        bins.append(bin_id)
    return bins


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=200),
    budget=st.integers(min_value=1, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_pack_one_group_matches_reference(sizes, budget):
    pdf = pd.DataFrame(
        {"doc_id": range(len(sizes)), "n_tokens": pd.Series(sizes, dtype="int64")}
    )
    out = _pack_one_group(pdf, budget)
    assert list(out["bin_id"]) == _pack_reference(sizes, budget)
    # invariants independent of the reference:
    # bins are non-decreasing in doc order and dense from 0
    bins = list(out["bin_id"])
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # no multi-doc bin exceeds budget
    per_bin: dict[int, list[int]] = {}
    for b, n in zip(bins, sizes):
        per_bin.setdefault(b, []).append(n)
    for members in per_bin.values():
        assert sum(members) <= budget or len(members) == 1


# --- simhash block partitioning -------------------------------------------


@given(
    max_hamming=st.integers(min_value=0, max_value=31),
    bits=st.sampled_from([32, 64]),
)
@settings(max_examples=100, deadline=None)
def test_simhash_block_ranges_partition_bits(max_hamming, bits):
    ranges = dedup.simhash_block_ranges(max_hamming, bits)
    assert len(ranges) == max_hamming + 1
    covered = [bit for off, width in ranges for bit in range(off, off + width)]
    assert covered == list(range(bits))  # disjoint, complete, in order
    widths = [w for _, w in ranges]
    assert max(widths) - min(widths) <= 1  # balanced


@given(
    sig_a=st.integers(min_value=0, max_value=2**32 - 1),
    flip_bits=st.sets(st.integers(min_value=0, max_value=31), min_size=0, max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_simhash_pigeonhole_guarantee(sig_a, flip_bits):
    """Any pair within hamming distance 3 shares at least one of the
    4 blocks exactly — the recall guarantee the round-1 half-blocking
    violated."""
    sig_b = sig_a
    for b in flip_bits:
        sig_b ^= 1 << b
    shared = False
    for off, width in dedup.simhash_block_ranges(3, 32):
        mask = ((1 << width) - 1) << off
        if (sig_a & mask) == (sig_b & mask):
            shared = True
            break
    assert shared


# --- md5 uniform mapping ---------------------------------------------------


@given(key=st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_hash_uniform_python_replica_in_range(key):
    """The md5-prefix uniform lands in [0, 1) and matches an
    independent Python computation of the same definition (the Spark
    and DuckDB expressions mirror this exact arithmetic)."""
    h = hashlib.md5(str(key).encode()).hexdigest()[:8]
    u = int(h, 16) / 4294967296.0
    assert 0.0 <= u < 1.0


# --- media header parsers never crash on arbitrary bytes ------------------


@given(payload=st.binary(min_size=0, max_size=512))
@settings(max_examples=300, deadline=None)
def test_media_parsers_total_on_arbitrary_bytes(payload):
    """The container parsers must be TOTAL over byte strings: any
    payload — truncated, corrupt, adversarial — parses to a tuple or
    None, never an exception (at 100 TB every possible corruption
    exists in the corpus)."""
    from mapreduceimpl_spark.operators import multimodal

    for fn in (
        multimodal.parse_image_header,
        multimodal.parse_audio_header,
        multimodal.parse_video_header,
    ):
        out = fn(payload)
        assert out is None or isinstance(out, tuple)


@given(payload=st.binary(min_size=0, max_size=256))
@settings(max_examples=200, deadline=None)
def test_media_parsers_total_on_magic_prefixed_bytes(payload):
    """Same totality with valid magics spliced in front — exercises the
    deep parse paths (chunk walks) on garbage bodies."""
    from mapreduceimpl_spark.operators import multimodal

    magics = [
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8\xff", b"RIFF????WEBP",
        b"RIFF????WAVE", b"fLaC", b"OggS", b"\x00\x00\x00\x18ftypisom",
        b"BM", b"II*\x00", b"MM\x00*",
    ]
    for m in magics:
        blob = m + payload
        for fn in (
            multimodal.parse_image_header,
            multimodal.parse_audio_header,
            multimodal.parse_video_header,
        ):
            out = fn(blob)
            assert out is None or isinstance(out, tuple)


# --- SQL packing recurrence == Python on the empty-first-bin edge ---------


def test_pack_sql_keeps_oversized_doc_in_empty_bin():
    """A 0-token document opening a bin followed by an over-budget
    document: Python's overflow check (`fill > 0 and fill + n >
    budget`) keeps the oversized doc in the EMPTY bin 0 — the shared
    _pack_sql recursion must agree (its stay condition carries the
    explicit bin_fill = 0 clause for exactly this case)."""
    import duckdb

    from mapreduceimpl_spark.catalog import _pack_sql
    from mapreduceimpl_spark.operators.packing import _pack_one_group

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, NULL, 'en'), (2, trim(repeat('x ', 200)), 'en')"
        ") t(doc_id, text, lang)"
    )
    sql_rows = con.execute(
        f"WITH RECURSIVE {_pack_sql('documents', 128, n_shards=1)} ORDER BY doc_id"
    ).fetchall()
    # (group_key, shard, doc_id, n_tokens, bin_id, bin_fill)
    assert [(r[2], r[3], r[4], r[5]) for r in sql_rows] == [
        (1, 0, 0, 0),
        (2, 200, 0, 200),  # stays in the empty bin 0, not a new bin 1
    ]
    py = _pack_one_group(
        pd.DataFrame(
            {"group_key": ["en", "en"], "shard": [0, 0],
             "doc_id": [1, 2], "n_tokens": [0, 200]}
        ),
        128,
    )
    assert list(zip(py["doc_id"], py["bin_id"], py["bin_fill"])) == [
        (1, 0, 0), (2, 0, 200),
    ]


def test_dq_expectations_detects_planted_violations(spark, tables):
    """Planting a duplicate PK and an orphan lineitem flips exactly the
    two affected rules to failed with the right violation counts."""
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.relational import q_dq_expectations

    orders = tables["orders"]
    li = tables["lineitem"]
    dup = orders.limit(1)
    orphan = li.limit(1).withColumn("l_orderkey", F.lit(-999).cast("long"))
    t2 = dict(tables)
    t2["orders"] = orders.unionByName(dup)
    t2["lineitem"] = li.unionByName(orphan)
    rows = {r["rule"]: r for r in q_dq_expectations(t2).collect()}
    assert rows["orders_pk_unique"]["n_violations"] == 1
    assert not rows["orders_pk_unique"]["passed"]
    assert rows["lineitem_orderkey_ri"]["n_violations"] == 1
    assert not rows["lineitem_orderkey_ri"]["passed"]
    assert rows["lineitem_qty_1_50"]["passed"]


def test_dq_expectations_fixture_verdicts(tables):
    """The synthetic fixture satisfies the structural rules (PK, RI,
    range, null) but ships lines independently of the order date — the
    temporal rule correctly FAILS, proving the suite detects real
    violations rather than rubber-stamping."""
    from mapreduceimpl_spark.operators.relational import q_dq_expectations

    rows = {r["rule"]: r for r in q_dq_expectations(tables).collect()}
    assert len(rows) == 5
    for name in (
        "orders_pk_unique",
        "lineitem_orderkey_ri",
        "lineitem_qty_1_50",
        "customer_acctbal_not_null",
    ):
        assert rows[name]["passed"], name
    assert not rows["ship_gte_orderdate"]["passed"]
    assert rows["ship_gte_orderdate"]["n_violations"] > 0
    assert all(r["n_checked"] > 0 for r in rows.values())


def test_histogram_drift_shares_sum_to_one(tables):
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.relational import q_histogram_drift

    out = q_histogram_drift(tables).collect()
    assert abs(sum(r["share_a"] for r in out) - 1.0) < 1e-9
    assert abs(sum(r["share_b"] for r in out) - 1.0) < 1e-9
    assert all(0 <= r["bin"] <= 19 for r in out)
    for r in out:
        assert abs(r["share_gap"] - abs(r["share_a"] - r["share_b"])) < 1e-15


def test_histogram_drift_detects_shifted_half(spark):
    """A delta half shifted to the top of the range concentrates its
    mass in the high bins — the gap exposes it."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.relational import q_histogram_drift

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # even ids (half A): uniform low values; odd ids (half B): high
        (i, t0, i, "e", float(i % 50) if i % 2 == 0 else 950.0 + (i % 50), "{}")
        for i in range(400)
    ]
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = q_histogram_drift({"events": e}).collect()
    # total variation distance = 0.5 * sum |pa - pb| should be ~1.0
    tvd = 0.5 * sum(r["share_gap"] for r in out)
    assert tvd > 0.95


def test_incremental_agg_equals_full_recompute(tables):
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.relational import q_incremental_agg

    e = tables["events"]
    full = (
        e.groupBy("event_type", F.to_date("ts").cast("string").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("sum_value"),
        )
    )
    inc = q_incremental_agg(tables)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, inc.collect()))
    assert a == b  # bit-exact, incl. the decimal-routed double sums


def test_alignment_funnel_invariants(spark):
    """Every emitted pair comes from quality-surviving, dedup-keeper
    docs of the same (lang, source) group, chosen beats rejected, and
    the split column only takes the three split values."""
    from mapreduceimpl_spark.catalog import _q_alignment_funnel
    from mapreduceimpl_spark.operators import dedup, text_analysis
    from mapreduceimpl_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = _q_alignment_funnel(spark, sf).collect()
    assert len(out) > 0
    assert {r["split"] for r in out} <= {"train", "val", "test"}

    docs = load_table(spark, sf, "documents")
    kept = (
        text_analysis.corpus_filter(docs)
        .filter("keep")
        .select("doc_id")
        .join(docs, "doc_id")
    )
    keeper_ids = {
        r["keep_id"] for r in dedup.dedup_exact(kept).select("keep_id").collect()
    }
    meta = {r["doc_id"]: (r["lang"], r["source"]) for r in docs.collect()}
    for r in out:
        assert r["chosen_id"] in keeper_ids
        assert r["rejected_id"] in keeper_ids
        assert meta[r["chosen_id"]] == (r["lang"], r["source"])
        assert meta[r["rejected_id"]] == (r["lang"], r["source"])
        assert r["margin"] > 0


def test_k_anonymity_flags_small_classes(spark):
    from mapreduceimpl_spark.operators.relational import q_k_anonymity

    rows = (
        [(i, "en", "web", 50) for i in range(10)]       # class of 10: safe
        + [(100 + i, "fr", "web", 150) for i in range(2)]  # class of 2: violates
    )
    d = spark.createDataFrame(rows, ["doc_id", "lang", "source", "n_chars"])
    out = {
        (r["lang"], r["len_bucket"]): r
        for r in q_k_anonymity({"documents": d}, k=5).collect()
    }
    assert not out[("en", 0)]["violates_k"] and out[("en", 0)]["class_size"] == 10
    assert out[("fr", 1)]["violates_k"] and out[("fr", 1)]["class_size"] == 2


def test_k_anonymity_classes_partition_corpus(tables):
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.relational import q_k_anonymity

    out = q_k_anonymity(tables).collect()
    assert sum(r["class_size"] for r in out) == tables["documents"].count()
    assert all(0 <= r["len_bucket"] <= 9 for r in out)


def test_mad_outliers_hand_case(spark):
    """Planted extreme values: MAD ignores them (median-based) while
    flagging exactly the planted rows."""
    from mapreduceimpl_spark.operators.relational import q_mad_outliers

    vals = [10, 11, 12, 13, 14, 15, 16, 17, 18, 1000, 2000]
    rows = [(i, "A", float(v)) for i, v in enumerate(vals)]
    li = spark.createDataFrame(rows, ["rid", "l_returnflag", "l_quantity"])
    out = q_mad_outliers({"lineitem": li}).collect()[0]
    assert out["median_qty"] == 15.0   # unmoved by the two giants
    assert out["mad"] == 3.0           # |x-15| medians at 3
    assert out["n_outliers"] == 2      # only 1000 and 2000 exceed 15+9
    assert out["n"] == 11


def test_mad_outliers_fixture_robust(tables):
    from mapreduceimpl_spark.operators.relational import q_mad_outliers

    for r in q_mad_outliers(tables).collect():
        # uniform 1..50 quantities: MAD ~ 12-13, no 3-MAD outliers
        assert r["n_outliers"] == 0
        assert 0 < r["mad"] <= 15


def test_histogram_drift_degenerate_range_single_bin(spark):
    """All-equal values (hi == lo): everything lands in bin 0 with no
    NaN/Inf from the zero-width division (ADVICE r4)."""
    import datetime as dt

    from mapreduceimpl_spark.operators.relational import q_histogram_drift

    rows = [
        (i, dt.datetime(2024, 1, 1), i, "view", 7.5, "{}") for i in range(10)
    ]
    e = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = q_histogram_drift({"events": e}).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 0 and r["cnt_a"] + r["cnt_b"] == 10
    assert r["share_a"] == 1.0 and r["share_b"] == 1.0 and r["share_gap"] == 0.0


def test_winsorize_mad_clips_planted_outlier(spark):
    """A wild value is clamped to the 3-MAD fence: clip counts move,
    the winsorized mean sits between median and raw mean."""
    from mapreduceimpl_spark.operators.relational import q_winsorize_mad

    rows = [("A", float(q)) for q in [10, 11, 12, 13, 14, 500]]
    li = spark.createDataFrame(rows, ["l_returnflag", "l_quantity"])
    r = q_winsorize_mad({"lineitem": li}).collect()[0]
    assert r["n"] == 6 and r["n_clipped_high"] == 1 and r["n_clipped_low"] == 0
    assert r["mean_winsorized"] < r["mean_raw"]
    # no outliers -> means agree
    calm = spark.createDataFrame(rows[:5], ["l_returnflag", "l_quantity"])
    c = q_winsorize_mad({"lineitem": calm}).collect()[0]
    assert c["n_clipped_low"] == 0 and c["n_clipped_high"] == 0
    assert c["mean_winsorized"] == c["mean_raw"]


def test_dp_noisy_counts_deterministic_and_centered(spark):
    """Noise replays exactly across runs/partitionings; the mechanism
    is a real Laplace draw (noise != 0 for essentially every group,
    bounded tails at eps=1 over ~100 groups), and epsilon scales it."""
    from mapreduceimpl_spark.operators.relational import q_dp_noisy_counts

    docs = spark.createDataFrame(
        [(i, f"t {i}", f"l{i % 7}", f"s{i % 13}", 10) for i in range(500)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    a = {(r["lang"], r["source"]): r["n_noisy"]
         for r in q_dp_noisy_counts({"documents": docs}).collect()}
    b = {(r["lang"], r["source"]): r["n_noisy"]
         for r in q_dp_noisy_counts({"documents": docs.repartition(11)}).collect()}
    assert a == b and len(a) == 7 * 13

    rows = q_dp_noisy_counts({"documents": docs}).collect()
    noises = [r["n_noisy"] - r["n_true"] for r in rows]
    assert any(n != 0 for n in noises)
    # Laplace(b=1): |noise| > 10 has probability e^-10/2 per group
    assert all(abs(n) < 12 for n in noises)
    # both signs occur across 91 md5-uniform draws
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)

    tight = {(r["lang"], r["source"]): r["n_noisy"] - r["n_true"]
             for r in q_dp_noisy_counts({"documents": docs}, epsilon=10.0).collect()}
    loose = {(r["lang"], r["source"]): r["n_noisy"] - r["n_true"] for r in rows}
    # higher epsilon -> smaller |noise| for every group (same uniform u)
    for k in tight:
        assert abs(tight[k]) <= abs(loose[k]) + 1e-12

    import pytest as _pytest
    with _pytest.raises(ValueError):
        q_dp_noisy_counts({"documents": docs}, epsilon=0.0)


def test_cramers_v_hand_cases(spark):
    """Perfect association (a == b diagonal) gives V = 1; independence
    (balanced full cross) gives chi2 = 0, V = 0; a single-category
    column pins V to 0 rather than NaN."""
    from mapreduceimpl_spark.operators.relational import cramers_v

    # perfect: each a maps to exactly one b, equal masses
    perfect = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, ["ca", "cb"]
    )
    r = cramers_v(perfect, "ca", "cb").collect()[0]
    assert (r["n"], r["r"], r["c"]) == (10, 2, 2)
    assert r["cramers_v"] == 1.0 and r["chi2"] == 10.0

    # independent: all four cells equal
    indep = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3, ["ca", "cb"]
    )
    r = cramers_v(indep, "ca", "cb").collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0

    # degenerate: one category on one side
    degen = spark.createDataFrame([("x", "p"), ("x", "q")], ["ca", "cb"])
    r = cramers_v(degen, "ca", "cb").collect()[0]
    assert r["cramers_v"] == 0.0


def test_mannwhitney_u_hand_case(spark):
    """Clean separation: target values {10, 20} all above rest {1, 2}
    -> U1 = n1*n2 = 4 (every target-rest pair won), z > 0.  Perfect
    overlap of identical values -> all ties, variance degenerates to
    the tie-corrected value and z = 0 via U1 = n1*n2/2."""
    from mapreduceimpl_spark.operators.relational import mannwhitney_u

    sep = spark.createDataFrame(
        [(10, "en"), (20, "en"), (1, "fr"), (2, "fr")], ["val", "lang"]
    )
    r = mannwhitney_u(sep, "val", "lang", "en").collect()[0]
    assert (r["n1"], r["n2"]) == (2, 2)
    assert r["u1"] == 4.0 and r["z"] > 0

    # reversed separation flips the sign
    r2 = mannwhitney_u(sep, "val", "lang", "fr").collect()[0]
    assert r2["u1"] == 0.0 and r2["z"] < 0 and r2["z"] == -r["z"]

    # all values identical: total tie, z pinned to 0
    tied = spark.createDataFrame(
        [(5, "en"), (5, "en"), (5, "fr"), (5, "fr")], ["val", "lang"]
    )
    r3 = mannwhitney_u(tied, "val", "lang", "en").collect()[0]
    assert r3["u1"] == 2.0  # n1*n2/2: midranks split evenly
    assert r3["z"] == 0.0


def test_ols_by_group_hand_case(spark):
    """Exact line y = 2x + 1 recovers slope 2, intercept 1, r² = 1;
    a constant-x stratum degenerates to zeros; noise keeps r² < 1."""
    from mapreduceimpl_spark.operators.relational import ols_by_group

    rows = (
        [(x, 2 * x + 1, "line") for x in (1, 2, 3, 4)]
        + [(5, 7, "flat"), (5, 9, "flat")]               # constant x
        + [(1, 3, "noisy"), (2, 5, "noisy"), (3, 6, "noisy")]
    )
    df = spark.createDataFrame(rows, ["x", "y", "g"])
    got = {r["g"]: r for r in ols_by_group(df, "x", "y", "g").collect()}

    line = got["line"]
    assert (line["slope"], line["intercept"], line["r2"]) == (2.0, 1.0, 1.0)
    flat = got["flat"]
    assert (flat["slope"], flat["intercept"], flat["r2"]) == (0.0, 0.0, 0.0)
    noisy = got["noisy"]
    assert 0 < noisy["r2"] < 1 and noisy["slope"] > 0


def test_ks_two_sample_hand_cases(spark):
    """Disjoint supports give D = 1 (maximal divergence); identical
    samples give D = 0; same-location different-shape distributions
    still fire (the case Mann-Whitney misses)."""
    from mapreduceimpl_spark.operators.relational import ks_two_sample

    disjoint = spark.createDataFrame(
        [(1, "en"), (2, "en"), (10, "fr"), (11, "fr")], ["val", "lang"]
    )
    r = ks_two_sample(disjoint, "val", "lang", "en").collect()[0]
    assert (r["n1"], r["n2"], r["d_stat"]) == (2, 2, 1.0)
    assert r["ks_stat"] == 1.0  # sqrt(4/4) * 1

    same = spark.createDataFrame(
        [(5, "en"), (7, "en"), (5, "fr"), (7, "fr")], ["val", "lang"]
    )
    r2 = ks_two_sample(same, "val", "lang", "en").collect()[0]
    assert r2["d_stat"] == 0.0 and r2["ks_stat"] == 0.0

    # same median (0), en tight {-1, 0, 1}, fr spread {-9, 0, 9}:
    # U-test sees no shift, KS sees the shape gap at v in [-9, -1)
    shape = spark.createDataFrame(
        [(-1, "en"), (0, "en"), (1, "en"), (-9, "fr"), (0, "fr"), (9, "fr")],
        ["val", "lang"],
    )
    r3 = ks_two_sample(shape, "val", "lang", "en").collect()[0]
    assert r3["d_stat"] == round(1 / 3, 9)


def test_t_closeness_flags_skewed_class(spark):
    """Global split is 50/50 (web/books).  A class mirroring it has
    TVD 0; a class that is 100% web has TVD 0.5 and violates t=0.3
    even though it passes l-diversity's distinct-count... (it has 1
    distinct value here, but the point is SKEW: a 90/10 class with 2
    distinct values still leaks)."""
    from mapreduceimpl_spark.operators.relational import q_t_closeness

    rows = (
        # class (en, bucket 0): 2 web + 2 books — mirrors global
        [(1, "en", 50, "web"), (2, "en", 50, "web"),
         (3, "en", 60, "books"), (4, "en", 70, "books")]
        # class (fr, bucket 0): 4 web only — maximally skewed
        + [(10 + i, "fr", 80, "web") for i in range(4)]
        # balance the global to exactly 50/50 (6 web, 6 books):
        # 4 more books in (de, 1)
        + [(20 + i, "de", 150 + i, "books") for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, ["doc_id", "lang", "n_chars", "source"]
    )
    got = {(r["lang"], r["len_bucket"]): r
           for r in q_t_closeness({"documents": docs}).collect()}

    en = got[("en", 0)]
    assert en["tvd"] == 0.0 and not en["violates_t"]
    fr = got[("fr", 0)]
    # p_class = (web 1.0, books 0.0) vs global (0.5, 0.5): TVD = 0.5
    assert fr["tvd"] == 0.5 and fr["violates_t"]


def test_funnel_windowed_horizon_excludes_late_stages(spark):
    """A purchase 25h after the first view converts in the unbounded
    funnel but NOT in the 24h-windowed one; an in-window journey
    converts in both; the strict > rule still applies at the view."""
    import datetime as dt

    from mapreduceimpl_spark.operators.relational import (
        q_funnel,
        q_funnel_windowed,
    )

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid, et):
        return (eid, base + dt.timedelta(minutes=minutes), uid, et, 1.0, "{}")

    rows = [
        # user 1: all within 24h -> converts in both
        ev(1, 0, 1, "view"), ev(2, 30, 1, "click"), ev(3, 60, 1, "purchase"),
        # user 2: click at 10min, purchase at 25h -> windowed loses it
        ev(4, 0, 2, "view"), ev(5, 10, 2, "click"), ev(6, 25 * 60, 2, "purchase"),
        # user 3: click 25h after view -> windowed loses click AND purchase
        ev(7, 0, 3, "view"), ev(8, 25 * 60, 3, "click"), ev(9, 25 * 60 + 10, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    unbounded = q_funnel({"events": df}).collect()[0]
    windowed = q_funnel_windowed({"events": df}).collect()[0]

    assert unbounded["n_purchased_after_click"] == 3
    assert (windowed["n_users"], windowed["n_viewed"]) == (3, 3)
    assert windowed["n_clicked_in_window"] == 2  # users 1, 2
    assert windowed["n_purchased_in_window"] == 1  # user 1 only


def test_benford_deviation_follows_planted_distribution(spark):
    """A corpus planted to EXACTLY Benford proportions scores ~0
    deviation on every digit; a uniform-digit corpus deviates most on
    digit 1 (expected 0.301 vs observed 1/9)."""
    import math

    from mapreduceimpl_spark.operators.relational import benford_deviation

    rows = []
    rid = 0
    # plant: digit d appears round(1000 * log10(1+1/d)) times
    planted_counts = {d: round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    for d, c in planted_counts.items():
        for _ in range(c):
            rows.append((rid, float(d) * 10 + 0.5),)
            rid += 1
    df = spark.createDataFrame(rows, ["rid", "amount"])
    got = {r["digit"]: r for r in benford_deviation(df, "amount").collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d]["abs_dev"] < 0.001
        assert got[d]["cnt"] == planted_counts[d]

    uni = spark.createDataFrame(
        [(i, float(d)) for i, d in enumerate(list(range(1, 10)) * 10)],
        ["rid", "amount"],
    )
    gu = {r["digit"]: r for r in benford_deviation(uni, "amount").collect()}
    assert gu[1]["abs_dev"] == max(r["abs_dev"] for r in gu.values())


def test_psi_drift_identical_halves_zero(spark):
    """Mirrored halves (same values on even and odd event_ids) give
    PSI exactly 0 and zero max gap; shifting one half inflates both."""
    from mapreduceimpl_spark.operators.relational import q_psi_drift

    same = spark.createDataFrame(
        [(2 * i, float(i % 10)) for i in range(200)]
        + [(2 * i + 1, float(i % 10)) for i in range(200)],
        ["event_id", "value"],
    )
    r = q_psi_drift({"events": same}).collect()[0]
    assert r["psi"] == 0.0 and r["max_bin_gap"] == 0.0

    shifted = spark.createDataFrame(
        [(2 * i, float(i % 10)) for i in range(200)]
        + [(2 * i + 1, float(i % 10) + 5.0) for i in range(200)],
        ["event_id", "value"],
    )
    r2 = q_psi_drift({"events": shifted}).collect()[0]
    assert r2["psi"] > 0.1 and r2["max_bin_gap"] > 0.0


def test_attribution_time_decay_ordering_and_conservation(spark):
    """Within a journey: newer clicks get strictly larger shares; a
    click AT purchase time gets weight 1; shares sum to ~1 per
    purchase; an organic purchase (no clicks) emits no rows — the
    same journey rule as the linear model."""
    import datetime as dt

    from mapreduceimpl_spark.operators.relational import (
        q_attribution_time_decay,
    )

    base = dt.datetime(2024, 1, 1)

    def ev(eid, days, uid, et):
        return (eid, base + dt.timedelta(days=days), uid, et, 1.0, "{}")

    rows = [
        ev(1, 0, 1, "click"),     # 14 days before purchase
        ev(2, 7, 1, "click"),     # 7 days before (one halflife)
        ev(3, 14, 1, "click"),    # at purchase time
        ev(4, 14, 1, "purchase"),
        ev(5, 0, 2, "purchase"),  # organic
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["click_id"]: r for r in
           q_attribution_time_decay({"events": df}).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3]["w9"] == 1.0
    assert got[2]["w9"] == 0.5          # exactly one halflife
    assert got[1]["w9"] == 0.25         # two halflives
    assert got[1]["share"] < got[2]["share"] < got[3]["share"]
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-5
    assert all(r["n_touch"] == 3 for r in got.values())


def test_conversion_latency_hand_case(spark):
    """Three converting users with view->purchase latencies of exactly
    1h/2h/4h: the median interpolates to 2h, p25/p75 to the exact
    quantile_cont positions; a non-converter is excluded."""
    import datetime as dt

    from mapreduceimpl_spark import catalog

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, hours in ((1, 1), (2, 2), (3, 4)):
        rows += [
            (eid, base, uid, "view", 1.0, "{}"),
            (eid + 1, base + dt.timedelta(minutes=5), uid, "click", 1.0, "{}"),
            (eid + 2, base + dt.timedelta(hours=hours), uid, "purchase", 1.0, "{}"),
        ]
        eid += 3
    rows.append((eid, base, 9, "view", 1.0, "{}"))  # never converts
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    r = catalog.SPECS["conversion_latency"].fn(spark, d).collect()[0]
    h = 3_600_000_000  # 1h in micros
    assert r["n_converted"] == 3
    assert r["p50_us"] == 2 * h
    assert r["p25_us"] == 1.5 * h  # interpolated between 1h and 2h
    assert r["p90_us"] == 3.6 * h  # between 2h and 4h at frac 0.8


def test_dow_uniformity_hand_cases(spark):
    """A perfectly uniform 7-day week gives chi2 = 0 and zero share
    deviation; piling everything on one day gives chi2 = 6n (the
    degenerate maximum for 7 cells)."""
    import datetime as dt

    from mapreduceimpl_spark.operators.relational import q_dow_uniformity

    base = dt.datetime(2024, 1, 1)  # Monday
    uniform = spark.createDataFrame(
        [(i, base + dt.timedelta(days=i % 7), 1, "view", 1.0, "{}")
         for i in range(70)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    r = q_dow_uniformity({"events": uniform}).collect()[0]
    assert (r["n"], r["days_seen"]) == (70, 7)
    assert r["chi2"] == 0.0 and r["max_share_dev"] == 0.0

    single = spark.createDataFrame(
        [(i, base, 1, "view", 1.0, "{}") for i in range(70)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    r2 = q_dow_uniformity({"events": single}).collect()[0]
    assert r2["days_seen"] == 1
    # chi2 = (7/n)*n^2 - n = 6n
    assert r2["chi2"] == 6.0 * 70


def test_cramers_v_drops_null_categories(spark):
    """NULL categories would inflate contingency cells while being
    excluded from the r/c cardinalities — they must be dropped so the
    two views stay consistent."""
    from mapreduceimpl_spark.operators.relational import cramers_v

    df = spark.createDataFrame(
        [("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"), (None, "p"), ("x", None)],
        "ca string, cb string",
    )
    r = cramers_v(df, "ca", "cb").collect()[0]
    assert (r["n"], r["r"], r["c"]) == (4, 2, 2)
    assert r["cramers_v"] == 1.0


def test_deletion_cascade_referential_consistency(spark, tables):
    """The cascade counts must equal direct recounts: every order of a
    cohort customer is deleted, every lineitem of a deleted order is
    deleted, and fractions are exact count ratios."""
    from mapreduceimpl_spark.operators.relational import q_deletion_cascade

    rows = {r["table_name"]: r for r in q_deletion_cascade(tables).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert 0 <= r["rows_to_delete"] <= r["rows_total"]
        assert r["delete_frac"] == r["rows_to_delete"] / r["rows_total"]
    # direct recount: cascade counts equal a hand-built semi-join chain
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.sampling import hash_uniform

    cohort = tables["customer"].filter(
        hash_uniform(
            F.concat(F.lit("erasure-v1:"), F.col("c_custkey").cast("string"))
        )
        < 0.01
    )
    n_c = cohort.count()
    assert rows["customer"]["rows_to_delete"] == n_c
    del_o = tables["orders"].join(
        cohort.select("c_custkey"),
        tables["orders"].o_custkey == F.col("c_custkey"),
        "left_semi",
    )
    assert rows["orders"]["rows_to_delete"] == del_o.count()
    n_li = tables["lineitem"].join(
        del_o.select("o_orderkey"),
        tables["lineitem"].l_orderkey == F.col("o_orderkey"),
        "left_semi",
    ).count()
    assert rows["lineitem"]["rows_to_delete"] == n_li
    # at sf0.001 the 1% cohort may legitimately be empty; the cascade
    # must then be empty too
    if n_c == 0:
        assert rows["lineitem"]["rows_to_delete"] == 0


def test_session_depth_hist_hand_case(spark):
    """User A: 3 events within 30min (one session of depth 3) then a
    2h gap and 1 event (depth 1); user B: 2 events in one session.
    Histogram: depth 1 x1, depth 2 x1, depth 3 x1; shares sum to 1;
    n_events reconciles with the input row count."""
    import datetime as dt

    from mapreduceimpl_spark.operators.relational import q_session_depth_hist

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(eid, minutes, uid):
        return (eid, base + dt.timedelta(minutes=minutes), uid, "view", 1.0, "{}")

    rows = [
        ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1),   # session depth 3
        ev(4, 140, 1),                              # lone session
        ev(5, 0, 2), ev(6, 5, 2),                   # depth 2
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r["depth"]: r for r in q_session_depth_hist({"events": df}).collect()}
    assert {d: r["n_sessions"] for d, r in got.items()} == {1: 1, 2: 1, 3: 1}
    assert abs(sum(r["session_share"] for r in got.values()) - 1.0) < 1e-12
    assert sum(r["n_events"] for r in got.values()) == 6


def test_iqr_fences_hand_case(spark):
    """Tight cluster 100..109 with two planted extremes: exactly the
    extremes fall outside the 1.5-IQR fences."""
    from mapreduceimpl_spark.operators.relational import q_iqr_fences

    rows = [(i, "t", "en", 100 + i) for i in range(10)]
    rows += [(90, "t", "en", 1), (91, "t", "en", 10_000)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    r = q_iqr_fences({"documents": docs}).collect()[0]
    assert r["n"] == 12 and r["n_outliers"] == 2
    assert r["lo"] < 100 and r["hi"] > 109
    assert abs(r["outlier_frac"] - 2 / 12) < 1e-12


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    rgb=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
    split=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
@settings(max_examples=100, deadline=None)
def test_png_roundtrip_property(w, h, rgb, seed, split, data):
    """For ALL image shapes, pixel contents, per-row filter choices,
    and IDAT splits: png_stats(png_encode(x)) recovers the EXACT
    stats of x — the compressed-decode analogue of the md5/sha
    replayability properties above (pure functions, no Spark)."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import png_encode, png_stats

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    filters = data.draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=h, max_size=h)
    )
    got = png_stats(png_encode(arr, row_filters=filters, idat_split=split))
    flat = arr.astype(np.int64).reshape(-1)
    weights = np.arange(1, flat.size + 1, dtype=np.int64)
    assert got == {
        "width": w,
        "height": h,
        "color_type": 2 if rgb else 0,
        "n_channels": 3 if rgb else 1,
        "pix_sum": int(flat.sum()),
        "pix_min": int(flat.min()),
        "pix_max": int(flat.max()),
        "checksum": int((flat * weights).sum()),
    }


@given(blob=st.binary(max_size=256), with_sig=st.booleans())
@settings(max_examples=300, deadline=None)
def test_png_stats_total_on_arbitrary_bytes(blob, with_sig):
    """png_stats is TOTAL: arbitrary bytes (with or without a valid
    signature prefix) return None or a valid dict, never raise — the
    drop-don't-crash contract a 100 TB crawl of hostile payloads
    needs."""
    from mapreduceimpl_spark.operators.multimodal import _PNG_SIG, png_stats

    b = (_PNG_SIG + blob) if with_sig else blob
    got = png_stats(b)
    assert got is None or (
        set(got) == {"width", "height", "color_type", "n_channels",
                     "pix_sum", "pix_min", "pix_max", "checksum"}
        and got["width"] >= 1 and got["height"] >= 1
    )


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    p=st.integers(min_value=2, max_value=256),
    seed=st.integers(min_value=0, max_value=2**31),
)
# the falsifying case hypothesis found in the first LZW draft (the
# encoder emitted END at the pre-widen width when the decoder's append
# after the FINAL data code crossed 2^width) — pinned so the
# regression is deterministic, not re-findable-by-search-only
@example(w=4, h=4, p=3, seed=2)
@settings(max_examples=100, deadline=None)
def test_gif_lzw_roundtrip_property(w, h, p, seed):
    """For ALL image shapes, palette sizes (2..256 — spanning every
    min-code-size), and pixel contents: gif_stats(gif_encode(x))
    recovers x's exact stats through the from-scratch LZW codec."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import gif_encode, gif_stats

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, p, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(p, 3), dtype=np.uint8)
    got = gif_stats(gif_encode(idx, pal))
    flat = idx.astype(np.int64).reshape(-1)
    wts = np.arange(1, flat.size + 1, dtype=np.int64)
    assert got is not None
    assert (got["width"], got["height"]) == (w, h)
    assert got["palette_size"] >= p
    assert got["idx_sum"] == int(flat.sum())
    assert got["idx_min"] == int(flat.min())
    assert got["idx_max"] == int(flat.max())
    assert got["checksum"] == int((flat * wts).sum())
    assert got["rgb_sum"] == int(pal[idx].astype(np.int64).sum())


@given(blob=st.binary(max_size=200), with_sig=st.booleans())
@settings(max_examples=300, deadline=None)
def test_gif_stats_total_on_arbitrary_bytes(blob, with_sig):
    """gif_stats is TOTAL: arbitrary bytes return None or a valid
    dict, never raise (drop-don't-crash on hostile crawl payloads)."""
    from mapreduceimpl_spark.operators.multimodal import gif_stats

    b = (b"GIF89a" + blob) if with_sig else blob
    got = gif_stats(b)
    assert got is None or (got["width"] >= 1 and got["height"] >= 1)


@given(
    data=st.binary(min_size=0, max_size=600),
    mcs=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_lzw_codec_roundtrip_property(data, mcs):
    """The LZW pair is exact for ALL byte strings whose values fit the
    code space (the alphabet 0..2^mcs-1), including empty input and
    long repetition runs (the KwKwK case)."""
    from mapreduceimpl_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    clipped = bytes(x % (1 << mcs) for x in data)
    out = _lzw_decompress(_lzw_compress(clipped, mcs), mcs, len(clipped))
    assert out == clipped


_warc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


@given(
    recs=st.lists(
        st.tuples(_warc_text, _warc_text, _warc_text, _warc_text,
                  st.binary(max_size=120)),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_warc_render_parse_roundtrip_property(recs):
    """For ALL record lists — header values with CR/LF/NUL (sanitized
    to spaces so they can't corrupt the framing), payloads containing
    the record separator and 'WARC/1.0' itself — parsing the rendered
    stream recovers every record exactly and in order."""
    from mapreduceimpl_spark.sources.warc import (
        _render_record,
        parse_warc_records,
    )

    stream = b"".join(_render_record(t, r, u, d, p) for t, r, u, d, p in recs)
    got = parse_warc_records(stream)
    assert len(got) == len(recs)

    def clean(s):
        return str(s).translate({0x0D: " ", 0x0A: " ", 0x00: " "}).strip()

    for (t, r, u, d, p), g in zip(recs, got):
        assert g["payload"] == p and g["content_length"] == len(p)
        assert g["warc_type"] == clean(t)
        assert g["record_id"] == clean(r)
        assert g["target_uri"] == clean(u)
        assert g["warc_date"] == clean(d)


@given(
    recs=st.lists(
        st.tuples(_warc_text, st.binary(max_size=60)), min_size=1, max_size=6
    ),
    cut=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_warc_truncation_yields_clean_prefix(recs, cut):
    """Cutting the stream at ANY byte yields a clean PREFIX of the
    full record list — complete records before the cut survive, the
    cut record and everything after vanish, nothing is understated or
    garbled."""
    from mapreduceimpl_spark.sources.warc import (
        _render_record,
        parse_warc_records,
    )

    stream = b"".join(
        _render_record("conversion", f"<urn:{i}>", u, "d", p)
        for i, (u, p) in enumerate(recs)
    )
    full = parse_warc_records(stream)
    got = parse_warc_records(stream[: min(cut, len(stream))])
    assert got == full[: len(got)]


@given(blob=st.binary(max_size=300), with_magic=st.booleans())
@settings(max_examples=300, deadline=None)
def test_warc_parse_total_on_arbitrary_bytes(blob, with_magic):
    """parse_warc_records is TOTAL and self-consistent on arbitrary
    bytes: never raises, and every emitted record's payload length
    equals its content_length."""
    from mapreduceimpl_spark.sources.warc import parse_warc_records

    b = (b"WARC/1.0\r\n" + blob) if with_magic else blob
    for r in parse_warc_records(b):
        assert len(r["payload"]) == r["content_length"]


@given(
    payloads=st.lists(st.binary(max_size=200), min_size=0, max_size=8),
    cut=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=150, deadline=None)
def test_gzip_member_offsets_roundtrip_and_clean_prefix(payloads, cut):
    """For ALL member lists: the gzip boundary walk recovers exactly
    one contiguous extent per member (offset chain re-inflates to the
    original payload), and cutting the blob at ANY byte yields a
    clean PREFIX of the member list — the decoder-contract trio
    (roundtrip, totality, truncation) for the index builder."""
    import gzip as _gzip
    import zlib as _zlib

    from mapreduceimpl_spark.sources.shardindex import gzip_member_offsets

    members = [_gzip.compress(p, mtime=0) for p in payloads]
    blob = b"".join(members)
    got = gzip_member_offsets(blob)
    assert [(i, o) for i, o, _ in got] == [
        (i, sum(len(m) for m in members[:i])) for i in range(len(members))
    ]
    for (i, off, ln), p in zip(got, payloads):
        d = _zlib.decompressobj(16 + _zlib.MAX_WBITS)
        assert d.decompress(blob[off : off + ln]) + d.flush() == p
    # truncation: a cut blob indexes a clean prefix (never a partial
    # or phantom member)
    trunc = gzip_member_offsets(blob[: min(cut, len(blob))])
    assert trunc == got[: len(trunc)]
    assert all(o + ln <= min(cut, len(blob)) for _, o, ln in trunc)


@given(blob=st.binary(max_size=2048), pad=st.booleans())
@settings(max_examples=150, deadline=None)
def test_member_offset_walkers_total_on_arbitrary_bytes(blob, pad):
    """gzip_member_offsets / tar_member_offsets are TOTAL on arbitrary
    bytes and only ever report extents inside the blob."""
    from mapreduceimpl_spark.sources.shardindex import (
        gzip_member_offsets,
        tar_member_offsets,
    )

    b = blob + (b"\x00" * 1024 if pad else b"")
    for walk in (gzip_member_offsets, tar_member_offsets):
        for _, off, ln in walk(b):
            assert 0 <= off and off + ln <= len(b) and ln > 0


@given(blob=st.binary(max_size=4096), pad=st.booleans())
@settings(max_examples=150, deadline=None)
def test_parse_tar_members_total_on_arbitrary_bytes(blob, pad):
    """parse_tar_members is TOTAL and self-consistent on arbitrary
    bytes (the drop-don't-crash contract shared with WARC and the
    media decoders): never raises, and every emitted member's payload
    length equals its n_bytes."""
    from mapreduceimpl_spark.sources.webdataset import parse_tar_members

    b = blob + (b"\x00" * 1024 if pad else b"")
    for r in parse_tar_members(b):
        assert len(r["payload"]) == r["n_bytes"]


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=120
    ),
    rate=st.integers(min_value=1, max_value=192_000),
    channels=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_wav_pcm_stats_roundtrip_property(samples, rate, channels):
    """For ALL sample vectors (full int16 range incl. -32768), rates,
    and channel counts: the RIFF render parses back to exact-integer
    stats."""
    import struct

    from mapreduceimpl_spark.operators.multimodal import wav_pcm_stats

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 16 + len(data) + 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got = wav_pcm_stats(wav)
    assert got == {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": len(samples),
        "peak_abs": max((abs(s) for s in samples), default=0),
        "sum_abs": sum(abs(s) for s in samples),
        "sum_sq": sum(s * s for s in samples),
    }


@given(short_csz=st.integers(min_value=0, max_value=15))
@settings(max_examples=16, deadline=None)
def test_wav_pcm_stats_drops_malformed_fmt_chunk(short_csz):
    """A fmt chunk declaring fewer than the 16 canonical PCM bytes
    must DROP (None), never read the following chunk's bytes as fmt
    fields — the 'drop, never understate' contract (ADVICE r7).  The
    payload is built so that misreading WOULD produce plausible
    fields: the bytes right after the short fmt chunk decode to
    fmt_code=1 / bits=16 at the fixed offsets."""
    import struct

    from mapreduceimpl_spark.operators.multimodal import wav_pcm_stats

    data = struct.pack("<hh", 7, -7)
    # short fmt chunk: declared size < 16, padded to even length
    short_body = bytes(short_csz)
    decoy = struct.pack("<HHIIHH", 1, 2, 44_100, 176_400, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", short_csz) + short_body
        + (b"\x00" if short_csz % 2 else b"")
        + b"JUNK" + struct.pack("<I", len(decoy)) + decoy
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert wav_pcm_stats(wav) is None


@given(
    w=st.integers(min_value=1, max_value=10),
    h=st.integers(min_value=1, max_value=10),
    out_side=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=200, deadline=None)
def test_ppm_resize_stats_roundtrip_property(w, h, out_side, seed):
    """For ALL geometries and pixel contents: P6 render -> decode ->
    the (dst*size)//out nearest-neighbor convention, computed
    independently here with plain loops."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import ppm_resize_stats

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    b = f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()
    got = ppm_resize_stats(b, out_side)
    expect = [
        int(arr[(y * h) // out_side, (x * w) // out_side, c])
        for y in range(out_side) for x in range(out_side) for c in range(3)
    ]
    assert got is not None
    assert (got["width"], got["height"], got["out_side"]) == (w, h, out_side)
    assert got["checksum"] == sum(v * (1 + i) for i, v in enumerate(expect))
    assert got["top_left_r"] == expect[0]
    assert got["bottom_right_b"] == expect[-1]


@given(
    w=st.sampled_from([2, 4, 6, 8]),
    h=st.sampled_from([2, 4, 6]),
    n_frames=st.integers(min_value=0, max_value=7),
    every=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31),
    cut=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_y4m_frame_stats_roundtrip_and_truncation_property(
    w, h, n_frames, every, seed, cut
):
    """For ALL even geometries, frame counts, cadences, and plane
    contents: the frame walk samples exactly frames 0, every, 2*every,
    ... with exact luma stats — and cutting the stream at ANY byte
    yields a clean prefix of the sampled-frame list."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import y4m_frame_stats

    rng = np.random.default_rng(seed)
    planes = [
        rng.integers(0, 256, size=w * h * 3 // 2, dtype=np.uint8)
        for _ in range(n_frames)
    ]
    b = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode() + b"".join(
        b"FRAME\n" + p.tobytes() for p in planes
    )
    got = y4m_frame_stats(b, every)
    assert [g["frame_idx"] for g in got] == list(range(0, n_frames, every))
    for g in got:
        y = planes[g["frame_idx"]][: w * h].astype(np.int64)
        assert (g["y_sum"], g["y_min"], g["y_max"]) == (
            int(y.sum()), int(y.min()), int(y.max()),
        )
    truncated = y4m_frame_stats(b[: min(cut, len(b))], every)
    assert truncated == got[: len(truncated)]


@given(blob=st.binary(max_size=200), fmt=st.sampled_from(["wav", "ppm", "y4m"]))
@settings(max_examples=300, deadline=None)
def test_uncompressed_decoders_total_on_arbitrary_bytes(blob, fmt):
    """wav_pcm_stats / ppm_resize_stats / y4m_frame_stats are TOTAL on
    arbitrary bytes (magic prefix included): None/empty or valid
    output, never an exception — the same drop-don't-crash contract
    the PNG/GIF/WARC fuzzes pin."""
    from mapreduceimpl_spark.operators.multimodal import (
        ppm_resize_stats,
        wav_pcm_stats,
        y4m_frame_stats,
    )

    if fmt == "wav":
        wav_pcm_stats(b"RIFF" + blob)
        wav_pcm_stats(blob)
    elif fmt == "ppm":
        ppm_resize_stats(b"P6" + blob, 2)
        ppm_resize_stats(blob, 2)
    else:
        y4m_frame_stats(b"YUV4MPEG2 " + blob, 2)
        y4m_frame_stats(blob, 2)


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=5, deadline=None)
def test_lzw_roundtrip_through_4096_cap_reset(seed):
    """Force the 4096-code table-full CLEAR-reset branch — the
    subtlest path in both halves of the LZW pair — and prove the
    roundtrip survives it.  The test PROVES the cap was reached with
    an independent textbook phrase segmentation (greedy
    longest-match, one new phrase per emitted code): if that counter
    crosses 4090 before resetting, the encoder must have taken the
    reset branch on the same input."""
    import numpy as np

    from mapreduceimpl_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 4, size=80_000, dtype=np.uint8))

    # independent greedy segmentation: phrases == dictionary adds
    table = {bytes([i]) for i in range(4)}
    cur, adds, capped = b"", 6, False  # 4 literals + clear + end
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        if adds < 4096:
            table.add(nxt)
            adds += 1
        else:
            capped = True
            table = {bytes([i]) for i in range(4)}
            adds = 6
        cur = bytes([byte])
    assert capped, "fixture too small to force the cap — enlarge it"

    out = _lzw_decompress(_lzw_compress(data, 2), 2, len(data))
    assert out == data


def test_plan_member_splits_partitions_members_exactly(spark, tmp_path):
    """Randomized member layouts: for ANY sidecar and ANY split
    target, the planned byte ranges are contiguous within each shard
    (start_{k+1} = start_k + length_k), begin at the first member's
    offset, sum to the exact member-byte total, and cover every member
    index exactly once — the arithmetic that makes indexed range reads
    lossless at any scale."""
    import random

    from mapreduceimpl_spark.sources.shardindex import (
        local_path,
        plan_member_splits,
    )

    rng = random.Random(823)
    shards = {}
    for s in range(3):
        lens = [rng.randint(1, 5000) for _ in range(rng.randint(1, 60))]
        offs, pos = [], 0
        for ln in lens:
            offs.append(pos)
            pos += ln
        path = tmp_path / f"shard-{s:05d}.bin"
        path.write_bytes(b"\x00" * pos)
        (tmp_path / f"shard-{s:05d}.bin.idx").write_text(
            "".join(f"{i}\t{o}\t{ln}\n" for i, (o, ln) in enumerate(zip(offs, lens)))
        )
        shards[str(path)] = (offs, lens)

    for target in (1, 777, 10_000, 10**9):
        rows = plan_member_splits(
            spark, f"{tmp_path}/shard-*.bin", target
        ).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(local_path(r["shard"]), []).append(r)
        assert set(by_shard) == set(shards)
        for shard, splits in by_shard.items():
            offs, lens = shards[shard]
            splits.sort(key=lambda r: r["start"])
            assert splits[0]["start"] == offs[0]
            assert splits[0]["first_member"] == 0
            pos = offs[0]
            members_covered = 0
            for sp in splits:
                assert sp["start"] == pos, (shard, target)
                assert sp["length"] >= 1
                pos += sp["length"]
            assert pos == offs[-1] + lens[-1]  # exact byte coverage
            firsts = [sp["first_member"] for sp in splits]
            assert firsts == sorted(firsts) and len(set(firsts)) == len(firsts)
            if target >= sum(lens):
                assert len(splits) == 1


# --- HyperLogLog register arithmetic (round 10) ----------------------------


def _hll_reference(tokens: set[str], p: int) -> tuple[float, int]:
    """Pure-Python HLL on the md5 60-bit lane — independent reference
    for the Spark/DuckDB register arithmetic (same construction as
    sketches.hll_distinct, implemented from the paper, no Spark)."""
    import math

    from mapreduceimpl_spark.operators.sketches import _hll_constants

    m, scaled_alpha = _hll_constants(p)
    wbits = 60 - p
    regs: dict[int, int] = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        j, w = h % m, h >> p
        rank = (wbits + 1) if w == 0 else (wbits + 1) - w.bit_length()
        regs[j] = max(regs.get(j, 0), rank)
    s = sum(1 << ((wbits + 1) - r) for r in regs.values())
    v = m - len(regs)
    s += v * (1 << (wbits + 1))
    raw = scaled_alpha / float(s)
    if raw <= 2.5 * m and v > 0:
        return round(m * math.log(m / v), 6), v
    return round(raw, 6), v


@settings(max_examples=30, deadline=None)
@given(
    words=st.sets(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                  min_size=1, max_size=200),
    p=st.sampled_from([4, 8, 12]),
)
def test_hll_reference_shift_counts_never_negative(words, p):
    """The 2^(wbits+1) scaling keeps every shift count in range and
    the estimate finite/positive across random token sets and the
    whole p range (review r10 — the 2^53 scaling violated both)."""
    est, v = _hll_reference(words, p)
    assert est > 0
    assert 0 <= v <= (1 << p)


def test_hll_spark_matches_python_reference(spark):
    """The distributed register fold equals the pure-Python reference
    on a corpus with duplicate, multi-doc and unicode tokens."""
    texts = [
        "alpha beta gamma alpha",
        "beta delta epsilon zeta",
        "héllo wörld alpha",
    ]
    from mapreduceimpl_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [(i, "xx", t) for i, t in enumerate(texts)],
        ["doc_id", "lang", "text"],
    )
    toks = {t for s in texts for t in s.split(" ")}
    for p in (4, 8, 12):
        row = hll_distinct(df, p=p).collect()[0]
        # exact is over the hash domain; no collisions at this size
        assert row["exact_distinct"] == len(toks)
        est, v = _hll_reference(toks, p)
        assert row["est_distinct"] == est, (p, row["est_distinct"], est)
        assert row["n_empty"] == v


# --- adjacent-pair construction (round 10) ---------------------------------


def test_adjacent_pairs_matches_zip(spark):
    """The shared lag-1 pair expr (text_analysis.adjacent_pairs)
    equals python zip(words, words[1:]) — evaluated THROUGH Spark on
    rows covering repeats, empties-from-double-space, unicode and a
    2-token minimum."""
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.text_analysis import adjacent_pairs

    texts = ["a b a b a", "x  y", "héllo wörld", "p q"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = (
        df.select("doc_id", F.split("text", " ").alias("__toks"))
        .select("doc_id", adjacent_pairs().alias("pc"))
        .select("doc_id", "pc.prev", "pc.cur")
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["prev"], r["cur"]))
    for i, t in enumerate(texts):
        w = t.split(" ")
        assert got[i] == list(zip(w, w[1:])), (i, got[i])


# --- label propagation vs a pure-Python synchronous reference -------------


def _lpa_reference(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n, ns in nbrs.items():
            freq: dict[int, int] = {}
            for m in ns:
                freq[labels[m]] = freq.get(labels[m], 0) + 1
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_matches_python_reference_random_graphs(spark):
    """Five seeded random graphs: the Spark plan's labels equal the
    pure-Python synchronous-LPA reference exactly (same smallest-label
    tie-break), across different densities and iteration counts."""
    import random

    from mapreduceimpl_spark.operators import graph

    for seed, n_nodes, n_edges, iters in (
        (1, 12, 18, 3),
        (2, 25, 30, 4),
        (3, 8, 28, 2),
        (4, 40, 45, 5),
        (5, 6, 5, 1),
    ):
        rng = random.Random(seed)
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, iterations=iters).collect()
        }
        assert got == _lpa_reference(edges, iters), (seed, got)


# --- readability counts vs a pure-Python reference ------------------------


def _readability_reference(texts: list[str]) -> tuple[int, int, int]:
    import re

    w = s = y = 0
    for t in texts:
        words = [x for x in t.lower().split(" ") if x != ""]
        w += max(1, len(words))
        s += max(1, len(re.findall(r"[.!?]+", t)))
        y += sum(max(1, len(re.findall(r"[aeiouy]+", x))) for x in words)
    return w, s, y


def test_readability_counts_match_python_reference_random_text(spark):
    """Seeded random token soup (mixed punctuation, case, empty and
    no-vowel tokens): the Spark scalar counting expressions equal the
    pure-Python reference — the same reference the streaming twin
    replays row-locally."""
    import random

    from mapreduceimpl_spark.operators.text_analysis import readability_scores

    rng = random.Random(7)
    vocab = ["The", "cat", "RAN!", "x.y?z", "qqq", "", "a...b", "myth",
             "HELLO!!!", "ok?", "u", "zzz!"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)], ["doc_id", "text", "lang"]
    )
    row = readability_scores(docs).collect()[0]
    w, s, y = _readability_reference(texts)
    assert (row["n_words"], row["n_sentences"], row["n_syllables"]) == (w, s, y)
