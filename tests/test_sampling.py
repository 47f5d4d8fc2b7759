

def test_token_budget_mix_greedy_prefix(spark):
    """Budget semantics: docs taken in hash order until the budget is
    crossed; the crossing doc is included; later docs are cut; strata
    without a budget are dropped; a zero budget selects nothing (the
    prev-cum < budget guard is strict)."""
    import pytest as _pytest

    from mapreduceimpl_spark.operators.sampling import token_budget_mix

    rows = [(i, "en" if i < 6 else "xx", "w " * 10) for i in range(9)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    with _pytest.raises(ValueError):
        token_budget_mix(docs, {})
    with _pytest.raises(ValueError):
        token_budget_mix(docs, {"en": -1})

    out = token_budget_mix(docs, {"en": 25}).collect()
    # each doc has 11 tokens ("w "*10 -> 10 w's + trailing '' counts as 1)
    per_doc = out[0]["n_tokens"]
    assert all(r["stratum"] == "en" for r in out)
    # greedy prefix: cum - n_tokens < 25 -> exactly ceil(25/per_doc) docs
    import math

    assert len(out) == math.ceil(25 / per_doc)
    assert max(r["cum_tokens"] for r in out) >= 25  # crossed
    # zero budget -> empty selection
    assert token_budget_mix(docs, {"en": 0}).count() == 0
    # determinism
    a = sorted(r["key"] for r in out)
    b = sorted(r["key"] for r in token_budget_mix(docs, {"en": 25}).collect())
    assert a == b


def test_token_budget_mix_two_phase_matches_single_window(spark):
    """Byte-identity of the ADVICE-r6 two-phase plan against the
    round-6 single-window reference form, on a fixture with variable
    token counts and two strata — the decomposition (per-shard totals
    -> bounded prefix sum -> offset intra-shard cumsum) must reproduce
    the stratum-wide (h, key)-ordered running sum EXACTLY, including
    the crossing doc and the cum_tokens values."""
    from pyspark.sql import Window

    import pyspark.sql.functions as F

    from mapreduceimpl_spark.functions import tokens
    from mapreduceimpl_spark.operators.sampling import token_budget_mix

    rows = [(i, "en" if i % 3 else "fr", "tok " * (1 + i % 17)) for i in range(500)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    budgets = {"en": 700, "fr": 300}
    out = token_budget_mix(docs, budgets).collect()

    b_expr = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    scored = docs.filter(F.col("lang").isin(*budgets.keys())).select(
        F.col("doc_id").alias("key"),
        F.col("lang").alias("stratum"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("stratum").orderBy("h", "key")
    ref = (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("budget", F.element_at(b_expr, F.col("stratum")))
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < F.col("budget"))
        .select("key", "stratum", "n_tokens", "cum_tokens")
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, ref))
    assert len(out) > 2  # fixture actually exercises multiple docs/strata


def test_token_budget_mix_no_stratum_wide_sort(spark):
    """Plan shape (ADVICE r6): the running-sum window over the full
    document relation must partition by (stratum, shard), never by
    stratum alone — a stratum-only partition means one task sorts an
    entire language at 100 TB.  The only stratum-only window allowed
    is the shard-offset prefix sum, which runs on the bounded
    aggregated (stratum, shard) grid — distinguishable in the plan
    because its sort orders by shard, not by the md5 column h."""
    import re

    from mapreduceimpl_spark.operators.sampling import token_budget_mix
    from mapreduceimpl_spark.plans import explain_str

    rows = [(i, "en", "w " * 5) for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    plan = explain_str(token_budget_mix(docs, {"en": 25}), "simple")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        if re.search(r"\bh#", spec):
            # the per-document window: must also partition by shard
            assert re.search(r"\bshard#", spec), plan


def test_domain_frequency_cap_matches_naive_window(spark):
    """Byte-identity of the two-phase plan against the naive
    per-domain row_number it decomposes, plus cap semantics: exactly
    min(cap, |domain|) rows per domain, dom_rank dense 1..k within
    each domain, deterministic across reruns."""
    from pyspark.sql import Window

    import pyspark.sql.functions as F

    from mapreduceimpl_spark.operators.sampling import domain_frequency_cap

    rows = [(i, f"d{i % 7}") for i in range(300)] + [(1000, "solo")]
    # NULL domains form ONE group, like the naive window's PARTITION BY
    # (a null-unsafe join-back would silently drop them — review r7)
    rows += [(2000 + i, None) for i in range(15)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = domain_frequency_cap(docs, cap=10).collect()

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ref = (
        docs.select(
            F.col("doc_id").alias("key"),
            F.col("source").alias("domain"),
            F.row_number().over(w).cast("long").alias("dom_rank"),
        )
        .filter(F.col("dom_rank") <= 10)
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, ref))
    per_dom: dict = {}
    for r in out:
        per_dom.setdefault(r["domain"], []).append(r["dom_rank"])
    assert None in per_dom  # NULL-domain docs retained and capped
    for dom, ranks in per_dom.items():
        expect = 1 if dom == "solo" else 10
        assert sorted(ranks) == list(range(1, expect + 1)), dom
    # rerun-stable
    again = domain_frequency_cap(docs, cap=10).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        domain_frequency_cap(docs, cap=0)


def test_domain_frequency_cap_no_domain_wide_sort(spark):
    """Plan shape: the row_number window over the full document
    relation must partition by (domain, shard), never domain alone
    (same contract as token_budget_mix — the h-ordered windowspec
    must carry the shard column)."""
    import re

    from mapreduceimpl_spark.operators.sampling import domain_frequency_cap
    from mapreduceimpl_spark.plans import explain_str

    docs = spark.createDataFrame([(i, "web") for i in range(10)], ["doc_id", "source"])
    plan = explain_str(domain_frequency_cap(docs, cap=3), "simple")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        if re.search(r"\bh#", spec):
            assert re.search(r"\bshard#", spec), plan


def test_shard_balance_consistency_with_sharded_shuffle(spark):
    """shard_balance's per-shard populations must equal a direct
    recount of epoch_shuffle_sharded's shard column (same epoch,
    same n_shards); skew >= 1 with equality iff perfectly even;
    n_shards validated."""
    import pytest

    from mapreduceimpl_spark.operators.sampling import (
        epoch_shuffle_sharded,
        shard_balance,
    )

    df = spark.createDataFrame(
        [(i, "web" if i % 3 else "books") for i in range(300)],
        ["doc_id", "source"],
    )
    bal = {r["strata"]: r for r in shard_balance(df, epoch=1, n_shards=8).collect()}
    direct = (
        epoch_shuffle_sharded(df, epoch=1, n_shards=8)
        .groupBy("source", "shard")
        .count()
        .groupBy("source")
        .agg(
            {"count": "max", "*": "count"}
        )
        .collect()
    )
    for r in direct:
        b = bal[r["source"]]
        assert b["max_shard_rows"] == r["max(count)"]
        assert b["n_shards_used"] == r["count(1)"]
        assert b["skew"] >= 1.0
        assert b["min_shard_rows"] <= b["max_shard_rows"]

    with pytest.raises(ValueError):
        shard_balance(df, n_shards=0)


def test_sample_size_plan_hand_case(spark):
    """A low-variance stratum needs fewer samples than a high-variance
    one at the same mean; a constant stratum needs 0; the formula
    matches an independent recomputation."""
    import math

    import pytest

    from mapreduceimpl_spark.operators.sampling import sample_size_plan

    rows = (
        [(i, 100 + (i % 2), "tight") for i in range(50)]      # sd ~ 0.5
        + [(100 + i, 100 + 50 * (i % 2), "wide") for i in range(50)]
        + [(200 + i, 42, "const") for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "val", "lang"])
    got = {r["strata"]: r for r in
           sample_size_plan(df, "val", "lang").collect()}

    assert got["const"]["n_required"] == 0 and got["const"]["sd"] == 0.0
    assert 0 < got["tight"]["n_required"] < got["wide"]["n_required"]

    t = got["tight"]
    xs = [100 + (i % 2) for i in range(50)]
    n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
    mean = sx / n
    sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    expect = math.ceil((1.96 * sd / (0.05 * mean)) ** 2)
    assert t["n_required"] == expect

    with pytest.raises(ValueError):
        sample_size_plan(df, "val", "lang", rel_margin=0.0)
