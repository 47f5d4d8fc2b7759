"""Full-text retrieval: BM25 scoring over an inverted index.

The standard lexical-retrieval operator for RAG / training-data
curation pipelines: given a query term set, rank documents by

    score(q, d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

(the Robertson/Sparck-Jones BM25+ idf that stays positive for
df > N/2).

Spark shape — designed so the expensive side never moves:
  * the inverted index (term-frequency table) is ONE wordcount-shaped
    aggregate over the exploded token stream (map-side combined);
  * doc lengths and corpus stats (N, Σ|d|) derive from the tf table,
    never re-scanning text;
  * the query term set is BROADCAST onto the tf table, so only
    postings of queried terms survive — the corpus-sized tf table is
    filtered before any further join;
  * per-term df stats join on the (tiny) queried-vocabulary keys;
  * final ranking is a per-query top-k window over candidate docs.

At 100 TB the tf/dl tables are the persistable index (write once,
bucketed by token via ``sinks.write_bucketed``); each query batch is
a broadcast probe — the same build-once/serve-many contract as the
ANN indexes in ``operators/similarity.py``.

Determinism / oracle parity: constants (k1, b, 1−b, k1+1) are
repr-interpolated into the DuckDB oracle so both engines evaluate the
IDENTICAL double expressions; per-term scores are rounded at 9
decimals then decimal-summed (order-free), final scores rounded at 6
and ranked with a doc_id tiebreak (rounded-then-ranked rule).

Reference parity: the reference engine has no retrieval surface; the
inverted index is its word-count shuffle (``test.go:22-25``) keyed by
(token, doc) instead of token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceimpl_spark.functions.exprs import tokens


def bm25_index(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build the BM25 index: (tf, dl) tables.

    tf: (token, doc_id, tf) — postings with term frequencies.
    dl: (doc_id, dl) — document token lengths, derived from tf so the
    text is scanned exactly once.
    """
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf, dl


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (index built inline).

    ``query_terms``: (query_id, term) — duplicate terms within a query
    are deduplicated (set-of-terms semantics, the standard bag-free
    formulation).

    Output: (query_id, rank, doc_id, score).
    """
    tf, dl = bm25_index(docs)
    return bm25_search(tf, dl, query_terms, k, k1, b, round_digits)


def bm25_search(
    tf: DataFrame,
    dl: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """BM25 over a PREBUILT (tf, dl) index — the serve-many-batches
    half of the build/search split: persist the index once with
    ``sinks.write_bucketed(tf, ..., ["token"])`` and every query
    batch probes it without re-tokenizing the corpus (round-trip
    equality + plan proven in ``tests/test_retrieval.py``).
    """
    n_docs_df = dl.agg(
        F.count("*").cast("long").alias("n"), F.sum("dl").cast("long").alias("s")
    )
    qterms = query_terms.select("query_id", "term").distinct()

    # corpus-sized tf filtered by the broadcast query vocabulary FIRST
    cand = tf.join(
        F.broadcast(qterms), tf["token"] == qterms["term"], "inner"
    ).select("query_id", "doc_id", "token", "tf")
    # df over the queried vocabulary only (broadcast back onto cand)
    dfreq = (
        cand.select("token", "doc_id")
        .distinct()
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        cand.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs_df))
    )

    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    avgdl = F.col("s").cast("double") / F.col("n").cast("double")
    norm = F.lit(one_minus_b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    denom = F.col("tf").cast("double") + F.lit(k1) * norm
    num = F.col("tf").cast("double") * F.lit(k1p1)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = F.round(idf * (num / denom), 9)

    per_doc = (
        scored.select("query_id", "doc_id", term_score.alias("ts"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(F.col("ts").cast("decimal(28,9)")).cast("double"),
                round_digits,
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_oracle_sql(
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> str:
    """DuckDB replay with repr-interpolated constants and identical
    expression parenthesization (see module docstring)."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in queries)
    a_k1, a_b = repr(k1), repr(b)
    a_omb, a_k1p1 = repr(1.0 - b), repr(k1 + 1.0)
    toks = "string_split(text, ' ')"
    return f"""WITH qterms AS (
  SELECT DISTINCT * FROM (VALUES {vals}) AS q(query_id, term)
),
tf AS (
  SELECT token, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({toks}) AS token FROM documents)
  GROUP BY token, doc_id
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s FROM dl
),
cand AS (
  SELECT q.query_id, t.doc_id, t.token, t.tf
  FROM tf t JOIN qterms q ON t.token = q.term
),
dfreq AS (
  SELECT token, COUNT(*) AS df
  FROM (SELECT DISTINCT token, doc_id FROM cand) GROUP BY token
),
scored AS (
  SELECT c.query_id, c.doc_id,
         round(
           ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5))
           * ((CAST(c.tf AS DOUBLE) * {a_k1p1})
              / (CAST(c.tf AS DOUBLE)
                 + {a_k1} * ({a_omb} + {a_b} * (CAST(d.dl AS DOUBLE)
                     / (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))))),
           9) AS ts
  FROM cand c
  JOIN dfreq f USING (token)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats st
),
per_doc AS (
  SELECT query_id, doc_id,
         round(CAST(SUM(CAST(ts AS DECIMAL(28,9))) AS DOUBLE), {round_digits})
           AS score
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM per_doc
) WHERE rank <= {k}"""


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = 5,
    c: int = 60,
    lex_id: str = "doc_id",
    sem_id: str = "vec_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two ranked
    retrieval lists — the standard hybrid-search combiner for a
    lexical (BM25) and a semantic (embedding cosine) ranking: fused
    score = sum over lists of 1 / (c + rank), c = 60 the canonical
    constant; documents missing from one list simply contribute
    nothing for it.

    Inputs carry (query_id, <id>, rank); output is the fused top-``k``
    per query: (query_id, doc_id, rrf, lex_rank, sem_rank, rank),
    ranked by (rrf DESC, doc_id) — rank-only fusion, so the two
    score scales never need calibrating.

    Scale: both inputs are already top-k-per-query (bounded), so the
    full-outer join and the per-query ranking window touch at most
    2k rows per query — the expensive work lives in the upstream
    retrievers, fusion is O(queries x k).
    """
    if k < 1 or c < 1:
        raise ValueError(f"rrf_fuse: need k >= 1 and c >= 1, got k={k} c={c}")
    l = lex.select(
        "query_id", F.col(lex_id).alias("doc_id"), F.col("rank").alias("lex_rank")
    )
    s = sem.select(
        "query_id", F.col(sem_id).alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    fused = l.join(s, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
        "lex_rank",
        "sem_rank",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "lex_rank", "sem_rank", "rank")
    )


def retrieval_metrics(
    ranked: DataFrame,
    rels: DataFrame,
    k: int = 5,
    ranked_id: str = "vec_id",
) -> DataFrame:
    """Ranking-quality metrics per query — recall@k, MRR, nDCG@k —
    the evaluation half of a retrieval stack (what you compute after
    ``bm25_topk``/``brute_force_topk``/``rrf_fuse`` against a
    relevance-judgment table).

    ``ranked``: (query_id, <id>, rank) top-k lists; ``rels``:
    (query_id, doc_id, n_rel) — the judged-relevant pairs plus each
    query's TOTAL relevant count (recall's denominator, which the
    top-k list alone cannot know).

    Determinism: binary gains, so DCG terms are 1/log2(rank+1) —
    each term rounded to 1e-9 then decimal-summed (libm-ulp-free, the
    ``text_token_entropy`` recipe); ideal DCG sums the first
    min(n_rel, k) terms the same way; ndcg/recall round to 1e-6.
    MRR is an exact rational (1/first-hit-rank).

    Scale: one equi-join of the bounded top-k lists against the
    judgment table, then a per-query aggregate — O(queries x k).
    """
    import math

    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")

    def log2_term(rank_col: F.Column) -> F.Column:
        return F.round(
            F.lit(1.0) / F.log(2.0, rank_col.cast("double") + F.lit(1.0)),
            9,
        )

    hits = (
        ranked.filter(F.col("rank") <= k)
        .select("query_id", F.col(ranked_id).alias("doc_id"), "rank")
        .join(rels.select("query_id", "doc_id"), ["query_id", "doc_id"])
    )
    per_q = hits.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("rank").alias("first_rank"),
        F.sum(log2_term(F.col("rank")).cast("decimal(28,9)"))
        .cast("double")
        .alias("dcg"),
    )
    # ideal DCG depends only on min(n_rel, k): a bounded k-case expression
    idcg_prefix = [0.0]
    for i in range(1, k + 1):
        idcg_prefix.append(
            idcg_prefix[-1] + round(1.0 / math.log2(i + 1.0), 9)
        )
    n_eff = F.least(F.col("n_rel"), F.lit(k))
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in idcg_prefix]), (n_eff + 1).cast("int")
    )
    qstats = rels.select("query_id", "n_rel").distinct()
    return (
        qstats.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.col("n_rel").cast("long").alias("n_rel"),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ).alias("recall_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_rank").cast("double"), F.lit(0.0)
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg_at_k"),
        )
    )


def qlm_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    mu: float = 2000.0,
    round_digits: int = 6,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001) — the language-modeling ranking function next to ``bm25``:
    score(q, d) = Σ_t ln((tf + μ·p(t|C)) / (dl + μ)), the second
    classic lexical model a retrieval stack A/B-tests against BM25.

    Candidates are docs matching >= 1 query term (the BM25 posting
    semantics); ABSENT query terms still score through the collection
    prior, so each candidate meets the full per-query term grid (a
    bounded |candidates| x |q| fan-out, never corpus x queries).
    Query terms unseen in the whole corpus are skipped (their ln(0)
    prior is non-discriminative).  Per-term lns round to 9 then
    decimal-sum (the ``bm25`` determinism recipe); ties rank by
    doc_id.

    Output: (query_id, rank, doc_id, score).
    """
    tf, dl = bm25_index(docs)
    qterms = query_terms.select("query_id", "term").distinct()
    cand_docs = (
        tf.join(F.broadcast(qterms), tf["token"] == qterms["term"])
        .select("query_id", "doc_id")
        .distinct()
    )
    ctf = (
        tf.join(F.broadcast(qterms.select("term").distinct()),
                tf["token"] == F.col("term"))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("ctf"))
    )
    totals = dl.agg(F.sum("dl").cast("long").alias("c_total"))
    grid = (
        cand_docs.join(qterms, "query_id")
        .join(F.broadcast(ctf), "term")  # inner: drops corpus-unseen terms
        .join(
            tf.select(
                F.col("token").alias("term"), "doc_id", F.col("tf").alias("tf0")
            ),
            ["term", "doc_id"],
            "left",
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    prior = F.lit(mu) * (F.col("ctf") / F.col("c_total"))
    term_score = F.round(
        F.log(
            (F.coalesce("tf0", F.lit(0)) + prior) / (F.col("dl") + F.lit(mu))
        ),
        9,
    )
    per_doc = (
        grid.select("query_id", "doc_id", term_score.alias("ts"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(F.col("ts").cast("decimal(28,9)")).cast("double"),
                round_digits,
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def qlm_oracle_sql(
    queries: list[tuple[int, str]],
    k: int = 5,
    mu: float = 2000.0,
    round_digits: int = 6,
) -> str:
    """DuckDB replay of :func:`qlm_topk` with repr-interpolated mu and
    identical expression parenthesization."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in queries)
    a_mu = repr(mu)
    toks = "string_split(text, ' ')"
    return f"""WITH qterms AS (
  SELECT DISTINCT * FROM (VALUES {vals}) AS q(query_id, term)
),
tf AS (
  SELECT token, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({toks}) AS token FROM documents)
  GROUP BY token, doc_id
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
totals AS (SELECT CAST(SUM(dl) AS BIGINT) AS c_total FROM dl),
cand AS (
  SELECT DISTINCT q.query_id, t.doc_id
  FROM tf t JOIN qterms q ON t.token = q.term
),
ctf AS (
  SELECT t.token AS term, CAST(SUM(t.tf) AS BIGINT) AS ctf
  FROM tf t JOIN (SELECT DISTINCT term FROM qterms) q ON t.token = q.term
  GROUP BY t.token
),
grid AS (
  SELECT c.query_id, c.doc_id, q.term, f.ctf,
         COALESCE(t.tf, 0) AS tf0, d.dl
  FROM cand c
  JOIN qterms q ON c.query_id = q.query_id
  JOIN ctf f ON q.term = f.term
  LEFT JOIN tf t ON t.token = q.term AND t.doc_id = c.doc_id
  JOIN dl d ON c.doc_id = d.doc_id
),
scored AS (
  SELECT query_id, doc_id,
         round(ln((tf0 + {a_mu} * (ctf / CAST(c_total AS DOUBLE)))
                  / (dl + {a_mu})), 9) AS ts
  FROM grid CROSS JOIN totals
),
per_doc AS (
  SELECT query_id, doc_id,
         round(CAST(SUM(CAST(ts AS DECIMAL(28,9))) AS DOUBLE), {round_digits})
           AS score
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM per_doc
) WHERE rank <= {k}"""
