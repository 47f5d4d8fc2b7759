"""Deterministic corpus sampling: stratified rates and domain mixing.

Training-data pipelines sample constantly — per-language quotas,
source up/down-weighting, debug subsets — and at 100 TB a sample must
be (a) reproducible across reruns and engines (no ``rand()``) and
(b) a narrow map over the scan (no shuffle just to sample).  Both
operators here key every keep/drop decision off an md5 content hash
of the row's id, mapped to a uniform [0, 1) value that DuckDB
reproduces bit-exactly (``conv(hex, 16, 10)`` == DuckDB
``CAST('0x' || hex AS BIGINT)``), so the *exact row set* — not just
the expected size — is engine-independent and rerun-stable.

The reference's data plane has no sampler; this extends its
capability surface for the LLM-pipeline north star (the same role
hash-mod partitioning plays in its sink, ``test.go:28-40``).

Scale: ``stratified_sample`` is filter-only (zero shuffles, predicate
evaluated in whole-stage codegen on the scan).  ``domain_mix`` adds
one tiny aggregate (|distinct strata| rows) broadcast back onto the
corpus — the corpus itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32: the hash prefix is 8 hex digits.
_HASH_SPAN = 4294967296.0


def hash_uniform(col: Column) -> Column:
    """Uniform [0, 1) from the first 8 md5 hex digits of ``col``.

    Exact integer parse then ONE float division — both engines produce
    the identical double for the identical input string.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(_HASH_SPAN)
    )


def hash_uniform_sql(expr: str) -> str:
    """DuckDB mirror of :func:`hash_uniform` for oracle SQL."""
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" / {_HASH_SPAN!r}"
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata not
    listed use ``default_rate`` (default: drop).  A row is kept iff
    ``hash_uniform(key) < rate`` — rerun-stable, engine-portable, and
    (unlike ``df.sample``) independent of partitioning, so the same
    rows survive on a laptop and on a 1000-executor cluster.
    """
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_uniform(F.col(key_col)) < rate)


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Downsample strata so the output matches target mix proportions.

    ``weights`` maps stratum -> target share (need not sum to 1; only
    ratios matter).  The most-constrained stratum m (min n_s / w_s) is
    kept in full; every other stratum s is hash-downsampled at
    ``rate_s = (w_s * (n_m / w_m)) / n_s`` so expected counts follow
    the target ratios exactly.  Strata not in ``weights`` are dropped.
    Output: the surviving rows plus their stratum's ``keep_rate``.

    Scale: one groupBy over the corpus producing |strata| rows, a
    global MIN window over those few rows, then a BROADCAST join back
    onto the corpus — the corpus is scanned twice (count + filter) but
    never shuffled.  At 100 TB prefer persisting per-stratum counts
    from a previous pipeline stage and calling
    :func:`stratified_sample` with precomputed rates.
    """
    from pyspark.sql import Window

    target = df.filter(F.col(strata_col).isin(*weights))
    w_expr: Column = F.lit(None).cast("double")
    for value, wt in sorted(weights.items()):
        w_expr = F.when(F.col(strata_col) == value, F.lit(float(wt))).otherwise(w_expr)

    counts = (
        target.groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .withColumn("w", w_expr)
        .withColumn("cap", F.col("n") / F.col("w"))
    )
    # rate = scale / cap (== w * scale / n algebraically, but the
    # most-constrained stratum divides its own cap by itself and gets
    # EXACTLY 1.0 instead of a 1-ulp-under value)
    rates = counts.withColumn(
        "scale", F.min("cap").over(Window.partitionBy())
    ).select(
        strata_col,
        F.least(F.lit(1.0), F.col("scale") / F.col("cap")).alias("keep_rate"),
    )
    return (
        target.join(F.broadcast(rates), strata_col)
        .filter(hash_uniform(F.col(key_col)) < F.col("keep_rate"))
    )


def stratified_fixed_n(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (or all of a smaller
    stratum), chosen deterministically: rank rows inside each stratum
    by their md5 uniform (key tiebreak) and keep the first n.

    Unlike rate-based sampling, the output size is exact — the shape
    eval sets and per-domain quotas need.  The hash ranking makes the
    selection a fixed pseudo-random subset, stable across reruns,
    partitionings, and engines.

    Scale: one shuffle (the per-stratum window).  For very large
    strata, pre-filter with ``stratified_sample`` at ~2x the target
    rate first, then rank only the survivors — same result, window
    input cut by orders of magnitude.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_uniform(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Importance sampling: keep each row with ITS OWN probability
    (``weight_col``, clamped to [0, 1]) — quality-weighted corpus
    selection, where a doc's keep chance rides its quality/length/
    source score instead of a per-stratum rate.

    Same determinism contract as ``stratified_sample``: the keep
    decision is ``hash_uniform(key) < weight``, a pure per-row
    predicate — zero shuffles, exact row SET reproducible across
    engines, reruns, and partitionings.  Weights outside [0, 1] are
    clamped (w <= 0 never keeps, w >= 1 always keeps); a NULL weight
    is treated as 0 (explicitly dropped, not silently
    null-propagated).
    """
    w = F.least(
        F.lit(1.0),
        F.greatest(F.lit(0.0), F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))),
    )
    return df.filter(hash_uniform(F.col(key_col)) < w)


def train_val_test_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic dataset split assignment: each row lands in the
    first named split whose cumulative weight exceeds its md5 uniform.

    The uniform is hashed from (salt, id), never ``rand()``, so the
    assignment is (a) reproducible across reruns/retries — a retried
    task re-derives the identical split, no shuffle-order or seed
    plumbing; (b) stable under corpus growth — adding documents never
    moves an existing document between splits, the property that keeps
    yesterday's eval set leak-free when the corpus is re-snapshotted;
    (c) a zero-shuffle narrow transform at any scale.  Changing the
    salt re-rolls every assignment at once (intentional: version the
    salt with the dataset release).

    ``weights`` maps split name -> fraction, in iteration order;
    fractions must sum to ~1.  Default 90/5/5 train/val/test.
    """
    if weights is None:
        weights = {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_uniform(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        expr = (
            F.when(u < F.lit(cum), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(cum), F.lit(name))
        )
    split = (
        expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn("split", split)


def weighted_topk_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact-size weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, the distributed-reservoir standard):
    each row draws an exponential race time ``-ln(1 − u) / w`` from
    its deterministic hash uniform, and the ``k`` smallest draws win —
    inclusion probability rides the weight, the sample is exactly
    ``k`` rows, and the top-k is ``TakeOrderedAndProject`` (per-
    partition heaps, no global sort, no shuffle of losers).

    ``1 − u`` (not ``u``) keeps the log argument inside (0, 1]: Spark
    returns NULL for ``log(0)`` while DuckDB returns -inf, so the
    u = 0 hash bucket would otherwise diverge between engines.
    Rows with weight <= 0 or NULL never sample (filtered, mirroring
    ``weighted_sample``'s clamp contract).

    Determinism: the race key is rounded at 9 decimals before ranking
    with a ``key_col`` tiebreak (rounded-then-ranked rule), so the
    exact winning SET is engine-/rerun-/partitioning-stable.
    """
    if k <= 0:
        raise ValueError(f"weighted_topk_sample: k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    race = F.round(
        -F.log(F.lit(1.0) - hash_uniform(F.col(key_col))) / w, 9
    )
    return (
        df.filter(w > 0)
        .select(key_col, *extra_cols, race.alias("race"))
        .orderBy(F.asc("race"), F.asc(key_col))
        .limit(k)
    )


def weighted_topk_sample_sql(
    k: int, weight_expr: str, key: str = "doc_id", extra: str = ""
) -> str:
    """DuckDB mirror of :func:`weighted_topk_sample` over
    ``documents`` (ln / division / rounding replayed literally)."""
    u = hash_uniform_sql(key)
    cols = f"{key}{', ' + extra if extra else ''}"
    return f"""SELECT {cols}, race FROM (
  SELECT {cols},
         round(-ln(1.0 - ({u})) / CAST({weight_expr} AS DOUBLE), 9) AS race
  FROM documents
  WHERE CAST({weight_expr} AS DOUBLE) > 0
) ORDER BY race ASC, {key} ASC LIMIT {k}"""


def temperature_mix(
    df: DataFrame,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened stratum rebalancing at T=2 (alpha=0.5),
    the multilingual-pretraining mix rule (sample language l with
    probability proportional to p_l^alpha): keep rate for stratum s is
    ``sqrt(n_min / n_s)``, so expected counts become the geometric mean
    ``sqrt(n_min * n_s)`` — big strata are damped toward the smallest
    stratum without ever upsampling it.

    alpha = 0.5 is not just the common choice, it is the ENGINE-PORTABLE
    one: IEEE-754 ``sqrt`` is correctly rounded (unlike ``pow``, whose
    libm implementations differ in the last ulp across engines), so
    ``sqrt(n_min)/sqrt(n_s)`` is bit-identical in Spark and DuckDB and
    the kept row SET — not just its expected size — matches exactly.
    The smallest stratum's rate is x/x == 1.0 exactly: kept in full.

    Scale: one tiny groupBy (|strata| rows), a global MIN over those few
    rows, then a BROADCAST join back — the corpus never shuffles, and the
    keep decision is the same zero-shuffle md5-uniform predicate as
    :func:`stratified_sample`.  Extends the reference's data plane the
    same way the samplers above do (its sink's hash-mod partitioning,
    ``test.go:28-40``, is the closest native analogue).
    """
    from pyspark.sql import Window

    # NULL strata are excluded EXPLICITLY: the equi-join below would
    # silently drop them anyway (NULL never equals NULL) while the
    # counts aggregate still priced them into n_min — filter first so
    # "dropped" is a documented contract, not a join artifact
    df = df.filter(F.col(strata_col).isNotNull())
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n"))
    rates = counts.withColumn(
        "n_min", F.min("n").over(Window.partitionBy())
    ).select(
        strata_col,
        (
            F.sqrt(F.col("n_min").cast("double")) / F.sqrt(F.col("n").cast("double"))
        ).alias("keep_rate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_uniform(F.col(key_col)) < F.col("keep_rate"))
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "cv-v1",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment:
    ``fold = floor(hash_uniform(salt:id) * k)`` in [0, k).

    Same contract as :func:`train_val_test_split` (whose two-sided CASE
    thresholds this generalizes to k equal bins): rerun-stable,
    growth-stable (new rows never move old rows between folds),
    zero-shuffle, and salted so a new CV round re-rolls every
    assignment at once.  ``u * k`` and ``floor`` are single IEEE ops on
    identical doubles — engine-portable bit-for-bit, and u < 1 keeps
    every fold id strictly below k.
    """
    if k <= 1:
        raise ValueError(f"kfold_assign: k must be >= 2, got {k}")
    u = hash_uniform(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return df.withColumn("fold", F.floor(u * F.lit(float(k))).cast("long"))


def epoch_shuffle(
    df: DataFrame,
    epoch: int = 0,
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: rank each row
    inside its stratum by a salted md5 uniform (key tiebreak).  Reading
    the output ``ORDER BY (shuffle_rank, strata)`` round-robin
    interleaves the strata — every epoch sees each domain spread evenly
    through the schedule instead of clumped, and ``epoch`` salts the
    uniform so each epoch gets a fresh, reproducible permutation (the
    seeded-shuffle contract training-reproducibility needs; no
    ``rand()``, no zipWithIndex, no driver involvement).

    Scale: ONE window Exchange on ``strata_col``.  The global order is
    never materialized as a single sequence — downstream writers sort by
    (shuffle_rank, strata), a range-partitioned sort.  With few, huge
    strata the per-stratum window sort is the hot spot: salt the stratum
    into hash shards first and interleave (shard, rank) instead.
    """
    from pyspark.sql import Window

    u = hash_uniform(
        F.concat(F.lit(f"epoch-{epoch}:"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(key_col).asc())
    return df.withColumn("shuffle_rank", F.row_number().over(w).cast("long"))


def epoch_shuffle_sharded(
    df: DataFrame,
    epoch: int = 0,
    strata_col: str = "source",
    key_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """``epoch_shuffle`` for FEW, HUGE strata (the variant its
    docstring promises): salt each stratum into ``n_shards`` hash
    shards and rank within (stratum, shard), so the per-partition
    window sort handles 1/n_shards of a stratum instead of all of it —
    a web-scale corpus with 5 source domains sorts 5*n_shards bounded
    partitions, not 5 monsters.

    The shard is md5-derived from (epoch, key) — deterministic,
    epoch-fresh, and uniform — and the reader interleaves with
    ``ORDER BY (shuffle_rank, strata, shard)``, which spreads every
    stratum AND every shard evenly through the training schedule.
    Same reproducible-permutation contract as ``epoch_shuffle``, one
    window Exchange on (strata, shard).
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"epoch_shuffle_sharded: n_shards must be >= 1, got {n_shards}")
    salted = F.concat(F.lit(f"epoch-{epoch}:"), F.col(key_col).cast("string"))
    u = hash_uniform(salted)
    shard = F.floor(u * F.lit(float(n_shards))).cast("long")
    out = df.withColumn("shard", shard)
    w = Window.partitionBy(strata_col, "shard").orderBy(u.asc(), F.col(key_col).asc())
    return out.withColumn("shuffle_rank", F.row_number().over(w).cast("long"))


# Poisson(1) CDF thresholds for the deterministic bootstrap: weight w
# is the smallest k with u < P(X <= k), capped at 5.  The repr() of
# each constant is interpolated into BOTH engines' expressions, so the
# CASE boundaries are bit-identical.
_POISSON1_CDF = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,   # P(<=1)
    0.9196986029286058,   # P(<=2)
    0.9810118431238462,   # P(<=3)
    0.9963401531726563,   # P(<=4)
)


def _poisson_weight(u: Column) -> Column:
    w: Column = F.lit(5)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def poisson_weight_sql(u_expr: str) -> str:
    """DuckDB mirror of :func:`_poisson_weight`."""
    cases = " ".join(
        f"WHEN ({u_expr}) < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


def bootstrap_se(
    df: DataFrame,
    value_col: str = "n_chars",
    strata_col: str = "lang",
    key_col: str = "doc_id",
    n_boot: int = 20,
) -> DataFrame:
    """Bootstrap standard error of the per-stratum mean — uncertainty
    quantification for corpus statistics WITHOUT distributional
    assumptions, in one distributed pass.

    The classic bootstrap resamples n rows with replacement; the
    distributed form is the POISSON BOOTSTRAP (each row enters
    resample b with an independent Poisson(1) multiplicity — the
    large-n limit of Binomial(n, 1/n)), which needs no global count
    and no shuffle of the resample itself.  Multiplicities are
    DETERMINISTIC: the md5 uniform of (b, key) inverted through the
    Poisson(1) CDF — rerun-/engine-/partition-stable like every
    sampler here.

    Portability: each resample mean is one division of a DECIMAL-
    routed weighted sum by an exact weight total, ROUNDED at 9; the
    across-resample variance folds those rounded means through decimal
    moments, so the SE is bit-identical across engines.  Plan: the
    corpus explodes x n_boot (the honest cost — n_boot is small), one
    Exchange on (stratum, b), then a |strata| x n_boot -> |strata|
    re-aggregate.
    """
    b = F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("b")
    u = hash_uniform(
        F.concat(F.col("b").cast("string"), F.lit(":"), F.col(key_col).cast("string"))
    )
    weighted = (
        df.select(strata_col, key_col, F.col(value_col).cast("long").alias("v"), b)
        .withColumn("w", _poisson_weight(u))
    )
    means = (
        weighted.groupBy(strata_col, "b")
        .agg(
            F.sum(F.col("w") * F.col("v")).cast("long").alias("wsum"),
            F.sum("w").cast("long").alias("wtot"),
        )
        .filter(F.col("wtot") > 0)
        .select(
            strata_col,
            F.round(F.col("wsum").cast("double") / F.col("wtot").cast("double"), 9)
            .alias("m"),
        )
    )

    def dsum(expr: Column) -> Column:
        return F.sum(expr.cast("decimal(28,9)")).cast("double")

    # n_boot > 1 guards the (n-1) divisor (a 1-doc stratum can lose 19
    # of 20 resamples to weight 0 — ANSI Spark would crash, DuckDB
    # would NULL); GREATEST(.., 0) clamps the ~-1e-9 the rounded-m*m
    # folding can leave, where Spark's sqrt(neg)=NaN but DuckDB ERRORS
    agg = means.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("n_boot"),
        dsum(F.col("m")).alias("s1"),
        dsum(F.round(F.col("m") * F.col("m"), 9)).alias("s2"),
    ).filter(F.col("n_boot") > 1)
    se = F.sqrt(
        F.greatest(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_boot"))
            / (F.col("n_boot") - 1),
            F.lit(0.0),
        )
    )
    return agg.select(
        strata_col,
        "n_boot",
        F.round(F.col("s1") / F.col("n_boot"), 6).alias("boot_mean"),
        F.round(se, 6).alias("boot_se"),
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble a training mix to a TOKEN budget per stratum — the
    final step before tokenization in a pretraining pipeline: within
    each stratum, documents are taken in deterministic md5-hash order
    until the stratum's token budget is exhausted (the first document
    that CROSSES the budget is still taken, so every non-empty
    stratum with a positive budget emits at least one doc and the
    realized total overshoots by at most one document — the standard
    greedy-prefix rule).

    ``budgets`` maps stratum -> whitespace-token budget; strata not
    listed are dropped.  Output: (key, stratum, n_tokens, cum_tokens)
    for every selected document.

    Determinism: the order is (md5(key), key) — rerun-stable and
    engine-portable; the running sum is an exact BIGINT.

    Scale (two-phase exact plan, ADVICE r6): the global hash-order
    prefix sum is computed WITHOUT ever sorting a whole stratum in one
    task.  Because the shard id is the md5 string's first two hex
    chars, lexicographic (h, key) order within a stratum is exactly
    (shard, h, key) order, so the stratum-wide running sum decomposes
    into (a) per-(stratum, shard) token totals — one hash aggregate,
    no sort, (b) an exclusive prefix sum of those totals over the
    bounded |strata| x 256 relation — the only global window, O(256)
    rows per stratum, (c) the intra-shard running sum on partitions
    1/256th of a stratum, offset by (b).  Byte-identical to the
    single-window form (regression-tested), with a bonus prune:
    shards whose starting offset already meets the budget are filtered
    out BEFORE the intra-shard sort (a doc's prev-cum is >= its shard
    offset), so only the boundary shard and earlier ones sort at all —
    at 100 TB the sorted volume is ~budget tokens, not corpus tokens.
    """
    from pyspark.sql import Window

    if not budgets:
        raise ValueError("token_budget_mix: budgets must be non-empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError(f"token_budget_mix: budgets must be >= 0, got {budgets}")
    from mapreduceimpl_spark.functions import tokens

    b_expr = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    scored = df.filter(F.col(strata_col).isin(*budgets.keys())).select(
        F.col(key_col).alias("key"),
        F.col(strata_col).alias("stratum"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    ).withColumn("shard", F.substring("h", 1, 2))
    # (a) per-shard totals; (b) exclusive prefix over the bounded
    # (stratum, shard) grid -> each shard's starting offset
    w_shards = (
        Window.partitionBy("stratum")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        scored.groupBy("stratum", "shard")
        .agg(F.sum("n_tokens").cast("long").alias("shard_tokens"))
        .withColumn(
            "shard_offset",
            F.coalesce(F.sum("shard_tokens").over(w_shards), F.lit(0)).cast("long"),
        )
        .withColumn("budget", F.element_at(b_expr, F.col("stratum")))
        # prune: a doc's prev-cum >= its shard offset, so a shard that
        # STARTS at/past the budget can never contribute a selected doc
        .filter(F.col("shard_offset") < F.col("budget"))
        .select("stratum", "shard", "shard_offset", "budget")
    )
    # (c) intra-shard running sum on 256x smaller partitions; the
    # offsets relation is bounded (|strata| x 256) -> broadcast join
    w_intra = Window.partitionBy("stratum", "shard").orderBy("h", "key")
    cum = F.col("shard_offset") + F.sum("n_tokens").over(w_intra)
    return (
        scored.join(F.broadcast(offsets), ["stratum", "shard"])
        .withColumn("cum_tokens", cum.cast("long"))
        # keep while the PREVIOUS cumulative total was under budget:
        # the crossing doc is included, everything after is cut
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < F.col("budget"))
        .select("key", "stratum", "n_tokens", "cum_tokens")
    )


def domain_frequency_cap(
    df: DataFrame,
    cap: int = 15,
    domain_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Frequency-cap documents per domain — the C4/RefinedWeb rule
    that stops a single boilerplate-heavy domain from dominating a
    pretraining mix: within each domain, keep the first ``cap``
    documents in deterministic (md5(key), key) order and drop the
    rest.  Output: (key, domain, dom_rank) for every kept document,
    dom_rank 1-based within the domain.

    Determinism: md5-hash order — rerun-stable, engine-portable, and
    unbiased w.r.t. document content (the same uniform-order device
    every sampling entry uses).

    Scale (the ``token_budget_mix`` two-phase pattern generalized):
    a per-domain row_number would sort each whole domain in one task —
    at 100 TB a mega-domain is tens of TB through a single partition.
    Instead: (a) per-(domain, shard=md5-prefix) row counts — one hash
    aggregate, (b) an exclusive prefix sum over the bounded
    |domains| x 256 grid — the only domain-wide window, (c) shards
    whose starting offset already reaches the cap are PRUNED before
    any sort (a doc's rank exceeds its shard offset), so at most
    ~cap rows per domain are ever sorted, (d) intra-shard row_number
    on 256x-smaller partitions, offset by (b).  Byte-identical to the
    naive per-domain window (the oracle IS that naive form).

    The offsets relation after the prune still scales with distinct
    domains (1..min(256, cap) rows per domain) — for web-scale domain
    columns that is millions of rows, so the join-back carries NO
    forced broadcast hint: AQE broadcasts it at runtime when it is
    actually small and falls back to a shuffle join when it is not
    (the grid and the docs relation share (domain, shard) keys, so
    the shuffle path is a plain co-partitioned equi-join).
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"domain_frequency_cap: cap must be >= 1, got {cap}")
    scored = df.select(
        F.col(key_col).alias("key"),
        F.col(domain_col).alias("domain"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    ).withColumn("shard", F.substring("h", 1, 2))
    w_shards = (
        Window.partitionBy("domain")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        scored.groupBy("domain", "shard")
        .agg(F.count("*").cast("long").alias("shard_n"))
        .withColumn(
            "shard_offset",
            F.coalesce(F.sum("shard_n").over(w_shards), F.lit(0)).cast("long"),
        )
        # prune: a doc's dom_rank is > its shard's starting offset, so
        # a shard that STARTS at/past the cap cannot contribute
        .filter(F.col("shard_offset") < F.lit(cap))
        .select("domain", "shard", "shard_offset")
    )
    w_intra = Window.partitionBy("domain", "shard").orderBy("h", "key")
    rnk = (F.col("shard_offset") + F.row_number().over(w_intra)).cast("long")
    # null-SAFE domain key: the naive window (and the oracle's
    # PARTITION BY) treats NULL domains as one group, so the join-back
    # must too — a plain equi-join would silently drop every
    # NULL-domain document (review r7)
    off = offsets.select(
        F.col("domain").alias("o_domain"),
        F.col("shard").alias("o_shard"),
        "shard_offset",
    )
    return (
        scored.join(
            # no broadcast hint: |off| ~ |domains| (unbounded for web
            # corpora) — AQE picks broadcast when it measures small
            off,
            F.col("domain").eqNullSafe(F.col("o_domain"))
            & (F.col("shard") == F.col("o_shard")),
        )
        .withColumn("dom_rank", rnk)
        .filter(F.col("dom_rank") <= F.lit(cap))
        .select("key", "domain", "dom_rank")
    )


def shard_balance(
    df: DataFrame,
    epoch: int = 0,
    strata_col: str = "source",
    key_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Balance audit of :func:`epoch_shuffle_sharded`'s shard
    assignment — the check a sharded training run reads BEFORE
    launching: a skewed shard becomes the epoch's straggler (the
    whole point of sharding was bounding the per-partition sort, so
    an imbalanced split silently un-bounds it).

    Per stratum: rows, shards actually used, min/max shard
    populations, and skew = max_shard * n_shards_used / n_rows (1.0 =
    perfectly even; the straggler's relative slowdown).  All counts
    exact longs; skew one exact-long-product division — hash-exact.

    Scale: one groupBy(strata, shard) over the md5-derived shard ids
    (no window, unlike the shuffle itself), then an O(strata) rollup.
    """
    if n_shards < 1:
        raise ValueError(f"shard_balance: n_shards must be >= 1, got {n_shards}")
    salted = F.concat(F.lit(f"epoch-{epoch}:"), F.col(key_col).cast("string"))
    shard = F.floor(hash_uniform(salted) * F.lit(float(n_shards))).cast("long")
    per_shard = df.groupBy(
        F.col(strata_col).alias("strata"), shard.alias("shard")
    ).agg(F.count("*").cast("long").alias("rows"))
    agg = per_shard.groupBy("strata").agg(
        F.sum("rows").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_shards_used"),
        F.min("rows").cast("long").alias("min_shard_rows"),
        F.max("rows").cast("long").alias("max_shard_rows"),
    )
    skew = (F.col("max_shard_rows") * F.col("n_shards_used")) / F.col("n_rows")
    return agg.select(
        "strata",
        "n_rows",
        "n_shards_used",
        "min_shard_rows",
        "max_shard_rows",
        F.round(skew, 9).alias("skew"),
    )


# z for a 95% two-sided normal interval — repr-interpolated into both
# engines so the planning arithmetic is bit-identical
Z_95 = 1.96


def sample_size_plan(
    df: DataFrame,
    value_col: str,
    strata_col: str = "lang",
    rel_margin: float = 0.05,
) -> DataFrame:
    """Per-stratum sample-size calculator: the planning step BEFORE
    any sampling entry runs — how many rows per stratum does a mean
    estimate need for a ±``rel_margin`` relative 95% CI
    (n = (z * sd / (margin * mean))², the classic survey-sampling
    formula).  Strata whose required n exceeds their population tell
    you sampling cannot hit the target there at all.

    Variance comes from the exact integer sufficient statistics
    (n·Σx² − (Σx)²) / (n·(n−1)) — the ``ols_by_group`` pattern — so
    mean/sd/required-n are fixed-order float expressions over exact
    longs; required n is one ceil.  Degenerate strata (n < 2, zero
    variance, zero mean) report required_n = 0.

    Scale: ONE map-side-combined aggregate per stratum; O(strata)
    output.
    """
    if not 0.0 < rel_margin < 1.0:
        raise ValueError(f"sample_size_plan: rel_margin in (0,1); got {rel_margin}")
    g = df.select(
        F.col(strata_col).alias("strata"),
        F.col(value_col).cast("long").alias("x"),
    )
    agg = g.groupBy("strata").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / (F.col("n") * F.greatest(F.col("n") - F.lit(1), F.lit(1)))
    )
    sd = F.sqrt(var)
    ok = (F.col("n") > 1) & (var > 0) & (F.col("sx") > 0)
    n_req = F.ceil(
        (F.lit(Z_95) * sd / (F.lit(rel_margin) * mean))
        * (F.lit(Z_95) * sd / (F.lit(rel_margin) * mean))
    ).cast("long")
    return agg.select(
        "strata",
        "n",
        mean.alias("mean_value"),
        F.round(sd, 9).alias("sd"),
        F.when(ok, n_req).otherwise(F.lit(0)).cast("long").alias("n_required"),
        F.when(ok, n_req / F.col("n")).otherwise(F.lit(0.0)).alias("required_frac"),
    )
