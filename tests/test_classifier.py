"""Logistic-regression quality classifier: learning sanity, exact
equality with an independent Decimal-arithmetic reference, and input
validation.  The catalog oracle (chained-CTE DuckDB replay) covers
engine parity; these tests cover semantics."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from mapreduceimpl_spark.operators.classifier import (
    logreg_train_scores,
    logreg_weights,
)

# en docs are stopword-heavy, xx docs are stopword-free — a separable
# fixture (single-space texts so str.split(' ') == Spark split ' ')
_DOCS = [
    (0, "the cat sat on the mat and the dog", "en"),
    (1, "a tale of two cities is a classic", "en"),
    (2, "to be or not to be is the question", "en"),
    (3, "rain in spain falls on the plain", "en"),
    (4, "zug vogel berg tal fluss wald", "xx"),
    (5, "mer soleil plage sable vague bateau", "xx"),
    (6, "sol luna cielo tierra fuego agua", "xx"),
    (7, "yama kawa umi sora hoshi tsuki", "xx"),
]

_STOP = {"the", "a", "of", "and", "to", "in", "is", "on"}


def _r9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def _dec18(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("1e-18"), rounding=ROUND_HALF_UP)


def _reference(docs, iterations=3, lr=0.5):
    """Pure-Python replay: same features, same DECIMAL(38,18)-routed
    sums, same floor-based half-up rounding, zero init."""
    rows = []
    for _doc_id, text, lang in docs:
        toks = text.split(" ")
        n_tok = len(toks)
        fs = [
            1.0,
            n_tok / 100.0,
            (len(text) - (n_tok - 1)) / n_tok,
            sum(t in _STOP for t in toks) / n_tok,
            len(set(toks)) / n_tok,
        ]
        rows.append((fs, 1.0 if lang == "en" else 0.0))
    dims = len(rows[0][0])
    w = [0.0] * dims
    for _ in range(iterations):
        ps = []
        for fs, _y in rows:
            z = float(sum(_dec18(x * wj) for x, wj in zip(fs, w)))
            ps.append(_r9(1.0 / (1.0 + math.exp(-z))))
        for j in range(dims):
            g = float(
                sum(_dec18((p - y) * fs[j]) for (fs, y), p in zip(rows, ps))
            )
            w[j] = _r9(w[j] - lr * g / len(rows))
    scores = []
    for fs, y in rows:
        z = float(sum(_dec18(x * wj) for x, wj in zip(fs, w)))
        p = _r9(1.0 / (1.0 + math.exp(-z)))
        scores.append((int(y), math.floor(p * 1e6 + 0.5) / 1e6, p >= 0.5))
    return w, scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text", "lang"])


def test_logreg_matches_decimal_reference(spark, docs_df):
    ref_w, ref_scores = _reference(_DOCS)
    got_w = {
        r["dim"]: r["w"] for r in logreg_weights(docs_df).collect()
    }
    assert got_w == {j: wj for j, wj in enumerate(ref_w)}
    got = {
        r["doc_id"]: (r["y"], r["score"], r["pred"])
        for r in logreg_train_scores(docs_df).collect()
    }
    assert got == {i: ref_scores[i] for i in range(len(_DOCS))}


def test_logreg_learns_separation(spark, docs_df):
    rows = logreg_train_scores(docs_df, iterations=5).collect()
    pos = [r["score"] for r in rows if r["y"] == 1]
    neg = [r["score"] for r in rows if r["y"] == 0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg)
    # and the model moved off the zero init
    ws = [r["w"] for r in logreg_weights(docs_df).collect()]
    assert any(w != 0.0 for w in ws)


def test_logreg_validates(spark, docs_df):
    with pytest.raises(ValueError):
        logreg_train_scores(docs_df, iterations=0)
    with pytest.raises(ValueError):
        logreg_weights(docs_df, lr=0.0)


def _ref_metrics(scores):
    """Midrank Mann-Whitney AUC + confusion metrics from (y, score,
    pred) triples, independent of the Spark expressions."""
    n = len(scores)
    tp = sum(1 for y, _s, p in scores if p and y == 1)
    fp = sum(1 for y, _s, p in scores if p and y == 0)
    fn = sum(1 for y, _s, p in scores if not p and y == 1)
    tn = sum(1 for y, _s, p in scores if not p and y == 0)
    ordered = sorted(s for _y, s, _p in scores)
    rank = {}
    i = 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j] == ordered[i]:
            j += 1
        rank[ordered[i]] = (i + 1 + j) / 2.0  # midrank of ties i+1..j
        i = j
    n_pos = sum(1 for y, _s, _p in scores if y == 1)
    n_neg = n - n_pos
    rsum = sum(rank[s] for y, s, _p in scores if y == 1)
    auc = (
        _r9((rsum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
        if n_pos and n_neg
        else None
    )
    prec = _r9(tp / (tp + fp)) if tp + fp else None
    rec = _r9(tp / (tp + fn)) if tp + fn else None
    f1 = (
        _r9(2.0 * prec * rec / (prec + rec))
        if prec is not None and rec is not None and prec + rec > 0
        else None
    )
    return {
        "n": n, "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "accuracy": _r9((tp + tn) / n), "prec": prec, "recall": rec,
        "f1": f1, "auc": auc,
    }


def test_logreg_eval_matches_reference(spark, docs_df):
    from mapreduceimpl_spark.operators.classifier import logreg_eval

    triples = [
        (r["y"], r["score"], r["pred"])
        for r in logreg_train_scores(docs_df).collect()
    ]
    want = _ref_metrics(triples)
    got = logreg_eval(docs_df).collect()[0].asDict()
    assert got == want
    # separable fixture after training: AUC must beat coin-flip
    assert got["auc"] is not None and got["auc"] > 0.5


def test_logreg_eval_single_class_null_auc(spark):
    from mapreduceimpl_spark.operators.classifier import logreg_eval

    docs = spark.createDataFrame(
        [(i, t, "en") for i, (_, t, _l) in enumerate(_DOCS)],
        ["doc_id", "text", "lang"],
    )
    r = logreg_eval(docs).collect()[0]
    assert r["auc"] is None  # no negatives -> rank-sum undefined
    assert r["fp"] == 0 and r["tn"] == 0


def test_logreg_calibration_bins_partition_corpus(spark, docs_df):
    from mapreduceimpl_spark.operators.classifier import logreg_calibration

    rows = logreg_calibration(docs_df).collect()
    assert sum(r["n"] for r in rows) == len(_DOCS)
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["frac_pos"] <= 1.0
        # mean score lies inside (or on the closed edges of) its bin
        assert r["bin"] / 10.0 - 1e-9 <= r["mean_score"] <= (r["bin"] + 1) / 10.0 + 1e-9

    with pytest.raises(ValueError):
        logreg_calibration(docs_df, bins=0)


def test_logreg_pr_curve_monotone_and_consistent(spark, docs_df):
    """Raising the threshold can only shrink the kept set: keep_frac
    and recall are non-increasing in threshold; each row's counts
    reconcile with an independent recount from the scored output."""
    from mapreduceimpl_spark.operators.classifier import logreg_pr_curve

    triples = [
        (r["y"], r["score"])
        for r in logreg_train_scores(docs_df).collect()
    ]
    rows = sorted(
        logreg_pr_curve(docs_df).collect(), key=lambda r: r["threshold"]
    )
    assert len(rows) == 9
    for r in rows:
        t = r["threshold"]
        tp = sum(1 for y, s in triples if s >= t and y == 1)
        fp = sum(1 for y, s in triples if s >= t and y == 0)
        fn = sum(1 for y, s in triples if s < t and y == 1)
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
    keeps = [r["keep_frac"] for r in rows]
    recs = [r["recall"] for r in rows]
    assert all(a >= b for a, b in zip(keeps, keeps[1:]))
    assert all(a >= b for a, b in zip(recs, recs[1:]))

    with pytest.raises(ValueError):
        logreg_pr_curve(docs_df, thresholds=(0.5, 1.0))


def test_feature_mi_bias_zero_and_signal_ranked(spark, docs_df):
    """Bias dim (constant feature) has exactly zero MI; the stopword
    ratio — the feature that separates this fixture by construction —
    carries strictly positive MI; values match an independent recount."""
    import math

    from mapreduceimpl_spark.operators.classifier import (
        feature_mi,
        logreg_features,
    )

    got = {r["dim"]: r["mi"] for r in feature_mi(docs_df, bins=8).collect()}
    assert got[0] == 0.0  # bias: one cell, MI identically 0
    assert got[3] > 0.0   # stopword ratio separates en from xx

    # independent recount of one dim (the stopword ratio, dim 3)
    rows = logreg_features(docs_df).collect()
    cells = {}
    for r in rows:
        x = r["fs"][3]
        b = min(int(math.floor(max(x, 0.0) * 8)), 7)
        y = int(r["y"])
        cells[(b, y)] = cells.get((b, y), 0) + 1
    n = sum(cells.values())
    cb = {}
    cy = {}
    for (b, y), c in cells.items():
        cb[b] = cb.get(b, 0) + c
        cy[y] = cy.get(y, 0) + c
    acc = 0
    for (b, y), c in sorted(cells.items()):
        acc += math.floor(
            (c / n) * math.log((n * c) / (cb[b] * cy[y])) * 1e12 + 0.5
        )
    want = math.floor((acc / 1e12) * 1e9 + 0.5) / 1e9
    assert got[3] == want

    import pytest as _p

    with _p.raises(ValueError):
        feature_mi(docs_df, bins=1)


def test_auc_rank_window_is_bounded(spark, docs_df):
    """The AUC rank-sum's single-partition window is scale-safe ONLY
    because it runs over the distinct-QUANTIZED-score relation, never
    per document (VERDICT r8 #4).  Two pins: (a) every emitted score
    sits exactly on the 1e-6 grid, so the windowed relation can never
    exceed 1e6+1 rows however large the eval corpus grows; (b) the
    window's child in the optimized plan is the post-groupBy aggregate
    (grouping key = score), not the raw scored rows."""
    scored = logreg_train_scores(docs_df)
    for r in scored.collect():
        s = r["score"]
        assert s == math.floor(s * 1e6 + 0.5) / 1e6, s

    from mapreduceimpl_spark.operators.classifier import logreg_eval
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(logreg_eval(docs_df), "simple")
    # the score-ordered Window must consume an aggregate keyed on
    # score (the bounded grid), not the per-document scored rows: in
    # the simple plan the child prints directly below the Window, so
    # the first HashAggregate after the score-windowspec line must be
    # keyed on score
    lines = plan.splitlines()
    win_at = next(
        i for i, l in enumerate(lines)
        if "Window" in l and "windowspecdefinition(score" in l
    )
    child_agg = next(
        l for l in lines[win_at + 1:] if "HashAggregate" in l
    )
    assert "keys=[score" in child_agg, child_agg
