

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
