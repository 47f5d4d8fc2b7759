"""Deterministic, mergeable sketches: KMV distinct-count and Bloom
membership.

Both are the hash-space half of the classic approximate-query toolkit,
built so the SKETCH ITSELF is engine-portable: every hash is an md5 of
the element (never a seeded JVM hash), so DuckDB replays the exact bit
pattern and the driver's oracle can verify the ESTIMATE value-exactly —
unlike ``approx_count_distinct`` (HLL, JVM-internal hashing, rows-only
check by design).

Why these two shapes matter at 100 TB:

* KMV (k minimum values): per-group distinct-count estimation where the
  shuffle carries k doubles per group instead of the distinct value set.
  The k smallest hashes of a set are a MERGEABLE summary (union = merge
  + re-truncate), the property that makes partial aggregation and
  cross-partition combining work; the estimator (k-1)/u_(k) is the
  standard unbiased KMV form (Bar-Yossef et al. 2002).

* Bloom membership: a corpus-fingerprint bit set probed by an incoming
  batch — the "have we seen this content before" pre-filter in front of
  exact dedup, sized m bits with k hash lanes.  Positions are derived
  from md5 lanes of the key, so build and probe are pure column
  expressions; the bit set is |distinct positions| <= m rows, broadcast
  onto the probe stream.

The reference has no sketch surface; this extends its data plane the
way its hash-mod-R partitioning (``test.go:28-40``) extrapolates to
content-hash keying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduceimpl_spark.functions.exprs import tokens
from mapreduceimpl_spark.operators.sampling import hash_uniform, hash_uniform_sql


def kmv_distinct(
    docs: DataFrame,
    k: int = 256,
    n: int = 3,
    strata_col: str = "lang",
) -> DataFrame:
    """Per-stratum distinct n-gram-shingle count: KMV estimate next to
    the exact count, plus the k-th minimum hash the estimate derives
    from.

    The element hash is the md5-prefix uniform (``sampling.
    hash_uniform``), so distinctness is taken over HASH VALUES (the
    sketch's own domain — a hash collision folds two elements, which is
    the estimator's documented bias, not an implementation wart).
    Estimate = (k-1) / u_(k): one division of an exact integer by a
    replayable double — engine-exact.

    Plan: explode shingles once; DISTINCT (stratum, u) is one Exchange;
    the k-th smallest per stratum is a row_number window over the
    distinct hashes (second Exchange, same key).  At 100 TB the window
    input is already the DISTINCT hash set — for very hot strata, keep
    only per-partition top-k candidates first (any partition's k-th
    minimum bounds the global one), the same two-phase trim
    ``heavy_hitters`` uses.  Strata with fewer than k distinct hashes
    have no k-th minimum and are reported with a NULL estimate (the
    sketch's "return the exact set" regime).
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    pre = docs.select(F.col(strata_col), tokens("text").alias("__toks")).filter(
        F.size("__toks") >= n
    )
    m = F.size(F.col("__toks")) - (n - 1)
    shingles = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))),
    )
    sh = pre.select(
        F.col(strata_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )
    u = hash_uniform(F.col("shingle"))
    hashes = sh.select(strata_col, u.alias("u")).distinct()
    w = Window.partitionBy(strata_col).orderBy(F.col("u").asc())
    kth = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == k)
        .select(strata_col, F.col("u").alias("kth_u"))
    )
    exact = hashes.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    return exact.join(kth, strata_col, "left").select(
        strata_col,
        "exact_distinct",
        "kth_u",
        (F.lit(float(k - 1)) / F.col("kth_u")).alias("est_distinct"),
    )


def _hll_constants(p: int) -> tuple[int, float]:
    """(m, alpha_m * m^2 * 2^(61-p)) for the HLL estimator — the
    scaled constant is ONE python double injected via repr into both
    engines so the raw estimate is a single identical IEEE division.

    The 2^(61-p) = 2^(wbits+1) scale is chosen so the harmonic-mean
    denominator stays an exact, overflow-free BIGINT for EVERY
    p in [4, 16] (review r10): rank M_j is at most wbits+1, so the
    per-register exponent (wbits+1) - M_j is never negative, present
    registers sum to at most m * 2^wbits = 2^60, and the v empty
    registers add at most m * 2^(wbits+1) = 2^61 — total < 2^62.
    (At the p=8 default this is the same 2^53 scale as before.)"""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, alpha * m * m * 2.0 ** (61 - p)


def hll_distinct(
    docs: DataFrame, p: int = 8, strata_col: str = "lang"
) -> DataFrame:
    """Per-stratum distinct-token count by HyperLogLog (Flajolet,
    Fusy, Gandouet, Meunier 2007), replayed value-exactly: the
    deterministic, oracle-checkable sibling of the rows-only
    ``agg_approx`` entry (Spark's approx_count_distinct is HLL++ with
    an engine-private hash, so only THIS construction can be
    hash-verified; ``kmv_distinct`` is the order-statistics sibling).

    Construction (all integer until the final division):

    - element hash: 60-bit integer from the md5 15-hex prefix (the
      repo's portable hash lane); distinctness is over HASH VALUES —
      a collision folds two tokens, the sketch's documented bias;
    - register index = h % m (m = 2^p), w = h >> p (a (60-p)-bit
      field), rank = leftmost-1 position of w = (60-p)+1 - bitlen(w)
      via the binary-string length (integer string ops, no float
      log2), w = 0 -> (60-p)+1;
    - register M_j = MAX(rank) — the only corpus-sized aggregate,
      one shuffle on (stratum, register) then a <= m-row rollup;
    - indicator sum scaled by 2^(wbits+1) (= 2^53 at the p=8
      default): present registers contribute 1 << ((wbits+1) - M_j)
      (BIGINT-exact; M_j <= wbits+1 so the shift count is never
      negative), the V empty registers contribute 1 << (wbits+1)
      each — the harmonic-mean denominator is an EXACT integer
      (< 2^62 at every p in [4, 16] — see _hll_constants) and the
      raw estimate alpha*m^2*2^(wbits+1) / S is one IEEE division;
    - small-range correction per the paper: raw <= 2.5m and V > 0
      -> linear counting m * ln(m/V) (the only transcendental,
      rounded with the result at 1e-6).  The 64-bit large-range
      correction is unnecessary: the hash space is 2^60 and the
      estimator here never approaches it.

    Output: (stratum, exact_distinct, n_empty, est_distinct,
    rel_err) with exact counted over the same hash domain, so
    rel_err isolates SKETCH error — the alerting number that says
    whether p is sized right before trusting HLL unions at 100 TB.

    Scale: one distinct-hash Exchange (uniform md5 keys), one
    (stratum, register) aggregate, then <= m rows per stratum; union
    of two sketches is register-wise MAX, which this layout makes a
    plain groupBy — the mergeability HLL exists for.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"hll_distinct: p must be in [4, 16], got {p}")
    m, scaled_alpha = _hll_constants(p)
    wbits = 60 - p
    toks = docs.select(
        F.col(strata_col), F.explode(tokens("text")).alias("token")
    )
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    hashes = toks.select(strata_col, h.alias("h")).distinct()
    rank = F.when(
        F.col("w") == 0, F.lit(wbits + 1)
    ).otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("w"))))
    regs = (
        hashes.select(
            strata_col,
            F.pmod(F.col("h"), F.lit(m)).alias("register"),
            F.shiftright(F.col("h"), p).alias("w"),
        )
        .select(strata_col, "register", rank.alias("rank"))
        .groupBy(strata_col, "register")
        .agg(F.max("rank").alias("mj"))
    )
    per = regs.groupBy(strata_col).agg(
        # shiftleft's bit-count arg must be a literal in the python
        # API — the expr form takes the per-register column
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {wbits + 1} - mj)"))
        .cast("long")
        .alias("s_present"),
        F.count("*").cast("long").alias("n_present"),
    )
    exact = hashes.groupBy(strata_col).agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    v = (F.lit(m) - F.col("n_present")).cast("long")
    s = (F.col("s_present") + v * F.lit(1 << (wbits + 1))).cast("double")
    raw = F.lit(scaled_alpha) / s
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(raw),
        6,
    )
    return (
        exact.join(per, strata_col)
        .select(
            strata_col,
            "exact_distinct",
            v.alias("n_empty"),
            est.alias("est_distinct"),
        )
        .select(
            strata_col,
            "exact_distinct",
            "n_empty",
            "est_distinct",
            F.round(
                (F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_distinct_sql(p: int = 8, strata_col: str = "lang") -> str:
    """DuckDB mirror of :func:`hll_distinct` over ``documents`` —
    same md5 lane, same integer register/rank arithmetic (bitlen via
    the binary-string length both engines), same repr-injected
    estimator constant, same fixed rounding points."""
    m, scaled_alpha = _hll_constants(p)
    wbits = 60 - p
    return f"""WITH hl_tok AS (
  SELECT {strata_col}, unnest(string_split(text, ' ')) AS token
  FROM documents
),
hl_hash AS (
  SELECT DISTINCT {strata_col},
         CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
  FROM hl_tok
),
hl_rank AS (
  SELECT {strata_col}, h % {m} AS register,
         CASE WHEN (h >> {p}) = 0 THEN {wbits + 1}
              ELSE {wbits + 1} - length(bin(h >> {p})) END AS rank
  FROM hl_hash
),
hl_reg AS (
  SELECT {strata_col}, register, MAX(rank) AS mj
  FROM hl_rank GROUP BY 1, 2
),
hl_per AS (
  SELECT {strata_col},
         CAST(SUM(CAST(1 AS BIGINT) << ({wbits + 1} - mj)) AS BIGINT) AS s_present,
         CAST(COUNT(*) AS BIGINT) AS n_present
  FROM hl_reg GROUP BY 1
),
hl_exact AS (
  SELECT {strata_col}, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM hl_hash GROUP BY 1
),
hl_est AS (
  SELECT e.{strata_col}, e.exact_distinct,
         CAST({m} - n_present AS BIGINT) AS n_empty,
         round(CASE WHEN ({scaled_alpha!r}
                          / CAST(s_present
                                 + ({m} - n_present)
                                   * (CAST(1 AS BIGINT) << {wbits + 1}) AS DOUBLE))
                         <= {2.5 * m!r}
                     AND ({m} - n_present) > 0
               THEN {float(m)!r}
                    * ln({float(m)!r}
                         / CAST({m} - n_present AS DOUBLE))
               ELSE {scaled_alpha!r}
                    / CAST(s_present
                           + ({m} - n_present)
                             * (CAST(1 AS BIGINT) << {wbits + 1}) AS DOUBLE)
               END, 6) AS est_distinct
  FROM hl_exact e JOIN hl_per USING ({strata_col})
)
SELECT {strata_col}, exact_distinct, n_empty, est_distinct,
       round((est_distinct - exact_distinct)
             / CAST(exact_distinct AS DOUBLE), 6) AS rel_err
FROM hl_est"""


def kmv_distinct_sql(k: int = 256, n: int = 3, strata_col: str = "lang") -> str:
    """DuckDB mirror of :func:`kmv_distinct` over ``documents``."""
    u = hash_uniform_sql(f"md5(array_to_string(toks[i + 1 : i + {n}], ' '))")
    return f"""WITH t AS (
  SELECT {strata_col}, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {n}
),
sh AS (
  SELECT DISTINCT {strata_col}, {u} AS u
  FROM t, unnest(range(0, len(toks) - {n - 1})) AS q(i)
),
kth AS (
  SELECT {strata_col}, u AS kth_u FROM (
    SELECT {strata_col}, u,
           ROW_NUMBER() OVER (PARTITION BY {strata_col} ORDER BY u ASC) AS rn
    FROM sh
  ) WHERE rn = {k}
),
exact AS (
  SELECT {strata_col}, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM sh GROUP BY {strata_col}
)
SELECT e.{strata_col}, e.exact_distinct, k.kth_u,
       {float(k - 1)!r} / k.kth_u AS est_distinct
FROM exact e LEFT JOIN kth k USING ({strata_col})"""


def _bloom_positions(key: F.Column, n_hashes: int, m_bits: int) -> F.Column:
    """Array of ``n_hashes`` bit positions for ``key``: lane i hashes
    ``'i:' || key`` through the md5-prefix integer, mod ``m_bits``.
    Pure column expressions — identical in Spark and DuckDB."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for i in range(n_hashes)
        ]
    )


def _bloom_positions_sql(key_expr: str, n_hashes: int, m_bits: int) -> str:
    lanes = ", ".join(
        f"CAST('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {m_bits}"
        for i in range(n_hashes)
    )
    return f"[{lanes}]"


def bloom_build(
    keys: DataFrame, key_col: str = "key", m_bits: int = 8192, n_hashes: int = 3
) -> DataFrame:
    """The Bloom filter's set-bit table: DISTINCT positions touched by
    any key — at most ``m_bits`` rows regardless of corpus size, the
    broadcastable index a probe batch joins against.  Persist it
    (parquet) to serve many probe batches, the same build-once contract
    as the ANN indexes."""
    return (
        keys.select(
            F.explode(_bloom_positions(F.col(key_col), n_hashes, m_bits)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    probe_col: str = "probe_id",
    key_col: str = "key",
    m_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Probe a built bit table: a key is a (claimed) member iff ALL of
    its ``n_hashes`` positions are set — no false negatives, false
    positives at the designed rate.  The bit table (< m_bits rows)
    BROADCASTs onto the probe stream; membership is a per-key aggregate
    counting missed positions (SUM of misses == 0, portable where
    bool_and is not).
    """
    pr = probes.select(
        F.col(probe_col),
        F.explode(
            F.array_distinct(_bloom_positions(F.col(key_col), n_hashes, m_bits))
        ).alias("pos"),
    )
    hit = F.broadcast(bits.withColumn("__set", F.lit(1)))
    return (
        pr.join(hit, "pos", "left")
        .groupBy(probe_col)
        .agg(
            F.sum(F.when(F.col("__set").isNull(), 1).otherwise(0)).alias("__miss")
        )
        .select(F.col(probe_col), (F.col("__miss") == 0).alias("bloom_member"))
    )


def _cm_bucket(key: F.Column, lane: int, w: int) -> F.Column:
    """Count-Min bucket for ``key`` in ``lane``: md5-prefix integer of
    ``'<lane>:' || key`` mod ``w`` — the same portable lane-hash family
    as the Bloom positions."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{lane}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(w),
    )


def countmin_build(
    docs: DataFrame, d: int = 3, w: int = 1024, text_col: str = "text"
) -> DataFrame:
    """Count-Min sketch of the token stream: a (lane, bucket, cnt)
    table of AT MOST d*w rows regardless of vocabulary size — the
    fixed-memory frequency summary that answers point queries with
    one-sided error (est >= true, overshoot bounded by collisions).

    One explode of d cells per token instance, then the wordcount
    aggregate on (lane, bucket) — map-side combined, one shuffle whose
    key space is the FIXED d*w grid, so the reduce side is constant
    regardless of corpus size (the Misra-Gries alternative when you
    need arbitrary point queries, not just the top tail).
    """
    if d < 1 or w < 1:
        raise ValueError(f"countmin_build: need d >= 1 and w >= 1, got d={d} w={w}")
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    cells = toks.select(
        F.posexplode(
            F.array(*[_cm_bucket(F.col("token"), i, w) for i in range(d)])
        ).alias("lane", "bucket")
    )
    return cells.groupBy("lane", "bucket").agg(F.count("*").cast("long").alias("cnt"))


def countmin_estimate(
    docs: DataFrame,
    d: int = 3,
    w: int = 1024,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch and point-query it for the ``k`` highest
    true-frequency tokens, reporting estimate next to truth — the
    one-sided-error contract (est_cnt >= true_cnt always; equality
    when the token's d cells saw no collisions) made value-checkable.

    The query side is k rows broadcast onto the d*w sketch; the truth
    side is the plain wordcount aggregate.  At 100 TB the sketch is
    what you persist — point queries then never touch the corpus.
    """
    sketch = countmin_build(docs, d=d, w=w, text_col=text_col)
    truth = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(k)
    )
    qpos = truth.select(
        "token",
        "true_cnt",
        F.posexplode(
            F.array(*[_cm_bucket(F.col("token"), i, w) for i in range(d)])
        ).alias("lane", "bucket"),
    )
    return (
        F.broadcast(qpos)
        .join(sketch, ["lane", "bucket"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


def _kmv_hashes(
    docs: DataFrame, n: int, strata_col: str
) -> DataFrame:
    """Distinct (stratum, shingle-hash-uniform) pairs — the shared
    input of :func:`kmv_distinct` and :func:`kmv_set_ops`."""
    pre = docs.select(F.col(strata_col), tokens("text").alias("__toks")).filter(
        F.size("__toks") >= n
    )
    m = F.size(F.col("__toks")) - (n - 1)
    shingles = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))),
    )
    sh = pre.select(
        F.col(strata_col).alias("grp"),
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    )
    return sh.select("grp", hash_uniform(F.col("shingle")).alias("u")).distinct()


def kmv_set_ops(
    docs: DataFrame, k: int = 256, n: int = 3, strata_col: str = "lang"
) -> DataFrame:
    """KMV sketch SET OPERATIONS between corpus strata: for every
    unordered stratum pair, the union and intersection cardinality of
    their n-gram shingle sets, estimated FROM THE MERGED k-MIN
    SKETCHES alone — the mergeable-sketch workflow that matters at
    100 TB: sketch each stratum once (k rows each), answer any pair's
    union/intersection/Jaccard later WITHOUT re-reading the corpus.

    Estimators (Beyer et al. 2007): merge two k-min sketches, re-take
    the k smallest; est_union = (k-1)/tau with tau the merged k-th
    minimum; rho = how many of those k smallest occur in BOTH input
    sketches; est_inter = rho/k * est_union; est_jaccard = rho/k.
    Exact union/intersection counts ride along from the full hash
    sets (the verification columns, same posture as ``kmv_distinct``).
    Hashes are md5-prefix uniforms, so every estimate is a replayable
    pure function of the corpus — engine-identical, no randomness.

    Pairs where the merged sketch has fewer than k hashes report NULL
    union/intersection estimates (the "return the exact set" regime,
    as kmv_distinct); est_jaccard = rho/k is still emitted there but
    is an UNDERESTIMATE (fixed denominator k exceeds the union size —
    use exact_inter/exact_union in that regime).

    Output: (grp_a, grp_b, exact_union, exact_inter, tau, rho,
    est_union, est_inter, est_jaccard), grp_a < grp_b.

    Scale: per-stratum sketches are k rows each (ONE bounded window
    over the distinct hash set); all pair work happens on G * k rows
    — G strata, never corpus-sized; the exact columns reuse the
    distinct hash set with a per-pair flag aggregate (drop them in
    production and nothing corpus-sized survives the sketch step).
    """
    if k < 2:
        raise ValueError(f"kmv_set_ops: k must be >= 2, got {k}")
    hashes = _kmv_hashes(docs, n, strata_col)
    w = Window.partitionBy("grp").orderBy(F.col("u").asc())
    sk = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("grp", "u")
    )
    grps = hashes.select("grp").distinct()
    pairs = (
        grps.select(F.col("grp").alias("grp_a"))
        .crossJoin(grps.select(F.col("grp").alias("grp_b")))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )

    def _pair_flags(src: DataFrame) -> DataFrame:
        ga = pairs.join(
            src.select(F.col("grp").alias("grp_a"), "u"), "grp_a"
        ).select("grp_a", "grp_b", "u", F.lit(1).alias("a"), F.lit(0).alias("b"))
        gb = pairs.join(
            src.select(F.col("grp").alias("grp_b"), "u"), "grp_b"
        ).select("grp_a", "grp_b", "u", F.lit(0).alias("a"), F.lit(1).alias("b"))
        return (
            ga.unionByName(gb)
            .groupBy("grp_a", "grp_b", "u")
            .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
        )

    exact = _pair_flags(hashes).groupBy("grp_a", "grp_b").agg(
        F.count("*").cast("long").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("exact_inter"),
    )

    wm = Window.partitionBy("grp_a", "grp_b").orderBy(F.col("u").asc())
    merged = _pair_flags(sk).withColumn("__rn", F.row_number().over(wm))
    tau = merged.filter(F.col("__rn") == k).select(
        "grp_a", "grp_b", F.col("u").alias("tau")
    )
    rho = (
        merged.filter(F.col("__rn") <= k)
        .groupBy("grp_a", "grp_b")
        .agg(F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("rho"))
    )
    est_union = F.lit(float(k - 1)) / F.col("tau")
    return (
        exact.join(tau, ["grp_a", "grp_b"], "left")
        .join(rho, ["grp_a", "grp_b"], "left")
        .select(
            "grp_a",
            "grp_b",
            "exact_union",
            "exact_inter",
            "tau",
            "rho",
            est_union.alias("est_union"),
            (F.col("rho").cast("double") * est_union / F.lit(float(k))).alias(
                "est_inter"
            ),
            (F.col("rho").cast("double") / F.lit(float(k))).alias("est_jaccard"),
        )
    )


def kmv_set_ops_sql(k: int = 256, n: int = 3, strata_col: str = "lang") -> str:
    """DuckDB mirror of :func:`kmv_set_ops` over ``documents``."""
    u = hash_uniform_sql(f"md5(array_to_string(toks[i + 1 : i + {n}], ' '))")
    return f"""WITH kst AS (
  SELECT {strata_col} AS grp, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= {n}
),
ksh AS (
  SELECT DISTINCT grp, {u} AS u
  FROM kst, unnest(range(0, len(toks) - {n - 1})) AS q(i)
),
ksk AS (
  SELECT grp, u FROM (
    SELECT grp, u, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY u ASC) AS rn
    FROM ksh
  ) WHERE rn <= {k}
),
kpairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM ksh) a, (SELECT DISTINCT grp FROM ksh) b
  WHERE a.grp < b.grp
),
kfull AS (
  SELECT grp_a, grp_b, u, MAX(a) AS in_a, MAX(b) AS in_b FROM (
    SELECT p.grp_a, p.grp_b, s.u, 1 AS a, 0 AS b
    FROM kpairs p JOIN ksh s ON s.grp = p.grp_a
    UNION ALL
    SELECT p.grp_a, p.grp_b, s.u, 0 AS a, 1 AS b
    FROM kpairs p JOIN ksh s ON s.grp = p.grp_b
  ) GROUP BY grp_a, grp_b, u
),
kexact AS (
  SELECT grp_a, grp_b, CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter
  FROM kfull GROUP BY grp_a, grp_b
),
kmrg AS (
  SELECT grp_a, grp_b, u, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY u ASC) AS rn
  FROM (
    SELECT grp_a, grp_b, u, MAX(a) AS in_a, MAX(b) AS in_b FROM (
      SELECT p.grp_a, p.grp_b, s.u, 1 AS a, 0 AS b
      FROM kpairs p JOIN ksk s ON s.grp = p.grp_a
      UNION ALL
      SELECT p.grp_a, p.grp_b, s.u, 0 AS a, 1 AS b
      FROM kpairs p JOIN ksk s ON s.grp = p.grp_b
    ) GROUP BY grp_a, grp_b, u
  )
),
ktau AS (
  SELECT grp_a, grp_b, u AS tau FROM kmrg WHERE rn = {k}
),
krho AS (
  SELECT grp_a, grp_b, CAST(SUM(in_a * in_b) AS BIGINT) AS rho
  FROM kmrg WHERE rn <= {k} GROUP BY grp_a, grp_b
)
SELECT e.grp_a, e.grp_b, e.exact_union, e.exact_inter, t.tau, r.rho,
       {float(k - 1)!r} / t.tau AS est_union,
       CAST(r.rho AS DOUBLE) * ({float(k - 1)!r} / t.tau) / {float(k)!r}
         AS est_inter,
       CAST(r.rho AS DOUBLE) / {float(k)!r} AS est_jaccard
FROM kexact e
LEFT JOIN ktau t ON e.grp_a = t.grp_a AND e.grp_b = t.grp_b
LEFT JOIN krho r ON e.grp_a = r.grp_a AND e.grp_b = r.grp_b"""


def _ams_sign(key: F.Column, counter: int) -> F.Column:
    """AMS sign hash for ``key`` in ``counter``: +1/-1 from the parity
    of the md5-prefix integer of ``'<counter>#' || key`` — the same
    portable lane-hash family as the Bloom/Count-Min buckets, so the
    DuckDB oracle replays the identical bit pattern."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{counter}#"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.lit(1) - F.lit(2) * F.pmod(h, F.lit(2))


def ams_f2(
    events: DataFrame, counters: int = 9, key_col: str = "user_id"
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-moment sketch of the key
    frequency vector: estimates F2 = sum_k f_k^2 — the SELF-JOIN SIZE
    of the stream on ``key_col`` — from ``counters`` signed sums, the
    third classic sketch family next to the shipped Count-Min (point
    frequency) and KMV (distinct count).

    Why F2 matters in this engine: it is the optimizer's join-size /
    skew oracle.  At 100 TB, Σ f_k² of a join key decides whether the
    shuffle partner is safe or needs salting (``functions/skew.py``)
    BEFORE the join runs, and each AMS counter is one signed integer —
    mergeable across partitions (map-side combinable), O(counters)
    state total.

    Estimator: per counter c, S_c = Σ_k sign(c,k)·f_k (exact integer
    arithmetic end-to-end), est_c = S_c²; the reported estimate is the
    MEDIAN over an odd number of counters (row-number middle pick, a
    bounded ``counters``-row sort, never a percentile interpolation).
    E[S_c²] = F2 exactly (pairwise sign independence); the median
    bounds the variance.  Output is ONE row: (f2_exact, f2_est,
    rel_err) with rel_err half-up-rounded at 1e-9 — exact truth rides
    along because the whole point of the entry is to make the sketch's
    error VALUE-CHECKABLE, same contract as ``countmin_estimate``.

    Plan: one (key → cnt) aggregate, a ``counters``-way column fan-out
    (no row explosion before the aggregate — the sign-weighted sums
    for ALL counters ride one groupBy as separate columns), then a
    single-row reduce.  Nothing reaches the driver.
    """
    if counters < 1 or counters % 2 == 0:
        raise ValueError(
            f"ams_f2: counters must be a positive odd number, got {counters}"
        )
    cnts = events.groupBy(key_col).agg(F.count("*").alias("cnt"))
    per_key = cnts.select(
        (F.col("cnt") * F.col("cnt")).alias("sq"),
        *[
            (_ams_sign(F.col(key_col), c) * F.col("cnt")).alias(f"t{c}")
            for c in range(counters)
        ],
    )
    totals = per_key.agg(
        F.sum("sq").cast("long").alias("f2_exact"),
        *[F.sum(f"t{c}").cast("long").alias(f"s{c}") for c in range(counters)],
    )
    ests = totals.select(
        "f2_exact",
        F.explode(
            F.array(*[F.col(f"s{c}") * F.col(f"s{c}") for c in range(counters)])
        ).alias("est"),
    )
    w = Window.partitionBy("f2_exact").orderBy("est")  # bounded: `counters` rows
    mid = (counters + 1) // 2
    return (
        ests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == mid)
        .select(
            "f2_exact",
            F.col("est").cast("long").alias("f2_est"),
            (
                F.floor(
                    F.abs(F.col("est") - F.col("f2_exact"))
                    / F.col("f2_exact")
                    * 1e9
                    + F.lit(0.5)
                )
                / 1e9
            ).alias("rel_err"),
        )
    )


def ams_f2_sql(counters: int = 9, key_col: str = "user_id") -> str:
    """DuckDB mirror of :func:`ams_f2` over ``events``."""
    sign = lambda c: (
        f"(1 - 2 * (CAST('0x' || substr(md5('{c}#' || "
        f"CAST({key_col} AS VARCHAR)), 1, 8) AS BIGINT) % 2))"
    )
    terms = ",\n         ".join(
        f"CAST(SUM({sign(c)} * cnt) AS BIGINT) AS s{c}" for c in range(counters)
    )
    est_list = ", ".join(f"s{c} * s{c}" for c in range(counters))
    mid = (counters + 1) // 2
    return f"""WITH acnt AS (
  SELECT {key_col}, COUNT(*) AS cnt FROM events GROUP BY {key_col}
),
atot AS (
  SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact,
         {terms}
  FROM acnt
),
aest AS (
  SELECT f2_exact, CAST(u.est AS BIGINT) AS est
  FROM atot, unnest([{est_list}]) AS u(est)
),
amid AS (
  SELECT f2_exact, est,
         ROW_NUMBER() OVER (PARTITION BY f2_exact ORDER BY est) AS rn
  FROM aest
)
SELECT f2_exact, est AS f2_est,
       floor(abs(est - f2_exact) / CAST(f2_exact AS DOUBLE) * 1e9 + 0.5) / 1e9
         AS rel_err
FROM amid WHERE rn = {mid}"""


def ams_join_size(
    left: DataFrame,
    right: DataFrame,
    counters: int = 9,
    left_key: str = "o_orderkey",
    right_key: str = "l_orderkey",
) -> DataFrame:
    """Join-cardinality estimation from AMS sketches of the TWO sides:
    |L ⋈ R| = Σ_k f_k·g_k, and E[S_c(L)·S_c(R)] equals it exactly
    (the same pairwise-independent signs cancel across counters) — the
    classic sketch-based join-size estimator (Alon, Gibbons, Matias,
    Szegedy 1999).  This is the planning primitive :func:`ams_f2`
    generalizes to two relations: sketch each table ONCE (9 signed
    integers each, mergeable, persistable next to the table), then
    answer "how big is this join" for any pair of sketched tables
    without touching either — at 100 TB that answer decides
    broadcast-vs-shuffle and salting BEFORE the join runs.

    The sign hash keys on the JOIN VALUE (not the column name), so two
    different column names over the same domain sketch compatibly.
    Estimate = median over the odd ``counters`` of S_c(L)·S_c(R);
    exact join size rides along via one real count for the
    value-checked rel_err contract of the sketch family.

    Plan: one per-key aggregate per side, a bounded counters-row
    product + median pick; the exact side is the one real join.
    """
    if counters < 1 or counters % 2 == 0:
        raise ValueError(
            f"ams_join_size: counters must be a positive odd number, got {counters}"
        )

    def side_sums(df: DataFrame, key: str, out_prefix: str) -> DataFrame:
        cnts = df.groupBy(key).agg(F.count("*").alias("cnt"))
        per_key = cnts.select(
            *[
                (_ams_sign(F.col(key), c) * F.col("cnt")).alias(f"t{c}")
                for c in range(counters)
            ]
        )
        return per_key.agg(
            *[
                F.sum(f"t{c}").cast("long").alias(f"{out_prefix}{c}")
                for c in range(counters)
            ]
        )

    ls = side_sums(left, left_key, "ls")
    rs = side_sums(right, right_key, "rs")
    exact = (
        left.select(F.col(left_key).alias("__k"))
        .join(right.select(F.col(right_key).alias("__k")), "__k")
        .agg(F.count("*").cast("long").alias("join_exact"))
    )
    ests = (
        exact.crossJoin(ls)
        .crossJoin(rs)  # 1 x 1 x 1 rows
        .select(
            "join_exact",
            F.explode(
                F.array(
                    *[
                        F.col(f"ls{c}") * F.col(f"rs{c}")
                        for c in range(counters)
                    ]
                )
            ).alias("est"),
        )
    )
    w = Window.partitionBy("join_exact").orderBy("est")  # bounded rows
    mid = (counters + 1) // 2
    return (
        ests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == mid)
        .select(
            "join_exact",
            F.col("est").cast("long").alias("join_est"),
            (
                F.floor(
                    F.abs(F.col("est") - F.col("join_exact"))
                    / F.col("join_exact")
                    * 1e9
                    + F.lit(0.5)
                )
                / 1e9
            ).alias("rel_err"),
        )
    )


def ams_join_size_sql(
    counters: int = 9,
    left_table: str = "orders",
    right_table: str = "lineitem",
    left_key: str = "o_orderkey",
    right_key: str = "l_orderkey",
) -> str:
    """DuckDB mirror of :func:`ams_join_size`."""
    def sign(c: int, key: str) -> str:
        return (
            f"(1 - 2 * (CAST('0x' || substr(md5('{c}#' || "
            f"CAST({key} AS VARCHAR)), 1, 8) AS BIGINT) % 2))"
        )

    lterms = ",\n         ".join(
        f"CAST(SUM({sign(c, left_key)} * cnt) AS BIGINT) AS ls{c}"
        for c in range(counters)
    )
    rterms = ",\n         ".join(
        f"CAST(SUM({sign(c, right_key)} * cnt) AS BIGINT) AS rs{c}"
        for c in range(counters)
    )
    est_list = ", ".join(f"ls{c} * rs{c}" for c in range(counters))
    mid = (counters + 1) // 2
    return f"""WITH jlc AS (
  SELECT {left_key}, COUNT(*) AS cnt FROM {left_table} GROUP BY {left_key}
),
jls AS (
  SELECT {lterms}
  FROM jlc
),
jrc AS (
  SELECT {right_key}, COUNT(*) AS cnt FROM {right_table} GROUP BY {right_key}
),
jrs AS (
  SELECT {rterms}
  FROM jrc
),
jex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS join_exact
  FROM {left_table} l JOIN {right_table} r ON l.{left_key} = r.{right_key}
),
jest AS (
  SELECT join_exact, CAST(u.est AS BIGINT) AS est
  FROM jex, jls, jrs, unnest([{est_list}]) AS u(est)
),
jmid AS (
  SELECT join_exact, est,
         ROW_NUMBER() OVER (PARTITION BY join_exact ORDER BY est) AS rn
  FROM jest
)
SELECT join_exact, est AS join_est,
       floor(abs(est - join_exact) / CAST(join_exact AS DOUBLE) * 1e9 + 0.5)
         / 1e9 AS rel_err
FROM jmid WHERE rn = {mid}"""


def grid_quantiles(
    lineitem: DataFrame,
    bins: int = 1024,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    value_col: str = "l_extendedprice",
) -> DataFrame:
    """Fixed-grid quantile sketch: estimate any quantile of a column
    from a ``bins``-cell equi-width histogram — the mergeable summary
    (cell counts add across partitions AND across days) that answers
    percentile dashboards at 100 TB where the exact sort-based
    percentile cannot run continuously.  Estimate = lower edge of the
    first cell whose cumulative count reaches ceil(q·n).  The one-
    cell-width error bound applies to the DISCRETE rank-ceil(q·n)
    order statistic ONLY: that value provably lies inside the picked
    cell (pytest pins it, including on a clustered fixture).  The
    ``exact_q`` column is the INTERPOLATED percentile and is
    informational — for sparse/clustered data interpolation can land
    outside the picked cell (values [0,0,10,10] at q=0.5: the rank-2
    order statistic is 0 and sits in the picked cell, but the
    interpolated median is 5), so no bound is claimed for it
    (ADVICE r6).

    Interpolated quantiles ride along (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, identical lower+(upper−lower)·frac
    formula over doubles) for the family's value-checked parity
    contract; both est and exact are half-up rounded at 1e-9.

    Plan: one min/max/exact-percentile aggregate, one histogram
    aggregate on a ≤``bins`` key space, a cumulative window over the
    BOUNDED cell relation, and a bounded |qs|×bins pick — the raw
    column is read by three column-pruned single-column scans (the
    1-row stats subplan is consumed twice) and never sorted globally.
    """
    if bins < 2:
        raise ValueError(f"grid_quantiles: bins must be >= 2, got {bins}")
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"grid_quantiles: every q must be in (0, 1], got {qs}")
    src = lineitem.select(F.col(value_col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    stats = src.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count("*").cast("long").alias("n"),
        F.expr(
            "percentile(x, array("
            + ", ".join(repr(float(q)) for q in qs)
            + "))"
        ).alias("exq"),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(bins))
    # constant column: zero width would send (x - mn)/width to NaN/inf
    # — define the degenerate grid as one cell at the single value
    binned = src.crossJoin(F.broadcast(stats.select("mn", "mx"))).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("x") - F.col("mn")) / width).cast("long"),
                F.lit(bins - 1),
            )
        )
        .cast("long")
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").cast("long").alias("c"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", F.sum("c").over(wcum).cast("long").alias("cum"))
    qrows = stats.select(
        "mn", "mx", "n", F.posexplode(q_arr).alias("qi", "q"),
        F.element_at("exq", F.col("qi") + 1).alias("ex"),
    ).select(
        "mn", "mx", "n", "q",
        F.ceil(F.col("q") * F.col("n")).cast("long").alias("rank_r"),
        "ex",
    )
    picked = (
        qrows.join(F.broadcast(cum), F.col("cum") >= F.col("rank_r"))
        .groupBy("q", "mn", "mx", "n", "ex")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.col("mn") + F.col("bin") * ((F.col("mx") - F.col("mn")) / F.lit(float(bins)))
    r9 = lambda c: F.floor(c * 1e9 + F.lit(0.5)) / 1e9
    return picked.select(
        "q",
        "n",
        F.col("bin").cast("long").alias("bin_idx"),
        r9(est).alias("est_q"),
        r9(F.col("ex")).alias("exact_q"),
        r9((F.col("mx") - F.col("mn")) / F.lit(float(bins))).alias("bin_width"),
    )


def grid_quantiles_sql(
    bins: int = 1024,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    value_col: str = "l_extendedprice",
    table: str = "lineitem",
) -> str:
    """DuckDB mirror of :func:`grid_quantiles`."""
    q_list = ", ".join(repr(float(q)) for q in qs)
    q_vals = ", ".join(f"({float(q)!r}, {i + 1})" for i, q in enumerate(qs))
    return f"""WITH gq_src AS (
  SELECT CAST({value_col} AS DOUBLE) AS x FROM {table} WHERE {value_col} IS NOT NULL
),
gq_stats AS (
  SELECT MIN(x) AS mn, MAX(x) AS mx, CAST(COUNT(*) AS BIGINT) AS n,
         quantile_cont(x, [{q_list}]) AS exq
  FROM gq_src
),
gq_hist AS (
  SELECT CASE WHEN mx = mn THEN 0
              ELSE LEAST(CAST(floor((x - mn) / ((mx - mn) / {float(bins)!r}))
                              AS BIGINT),
                         {bins - 1}) END AS bin,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM gq_src, gq_stats
  GROUP BY 1
),
gq_cum AS (
  SELECT bin, CAST(SUM(c) OVER (ORDER BY bin
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM gq_hist
),
gq_q AS (
  SELECT v.q, s.mn, s.mx, s.n,
         CAST(ceil(v.q * s.n) AS BIGINT) AS rank_r,
         s.exq[v.qi] AS ex
  FROM gq_stats s, (VALUES {q_vals}) AS v(q, qi)
),
gq_pick AS (
  SELECT q, mn, mx, n, ex, MIN(bin) AS bin
  FROM gq_q JOIN gq_cum ON cum >= rank_r
  GROUP BY q, mn, mx, n, ex
)
SELECT q, n, CAST(bin AS BIGINT) AS bin_idx,
       floor((mn + bin * ((mx - mn) / {float(bins)!r})) * 1e9 + 0.5) / 1e9
         AS est_q,
       floor(ex * 1e9 + 0.5) / 1e9 AS exact_q,
       floor(((mx - mn) / {float(bins)!r}) * 1e9 + 0.5) / 1e9 AS bin_width
FROM gq_pick"""
