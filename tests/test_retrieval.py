"""BM25 retrieval: hand-computed scores, OOV terms, ranking
determinism, and the broadcast-probe plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _queries(spark, pairs):
    return spark.createDataFrame(pairs, "query_id long, term string")


def _bm25_ref(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))


def test_bm25_hand_computed(spark):
    docs = _docs(spark, [(1, "cat dog cat"), (2, "dog fish"), (3, "fish fish fish")])
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in retrieval.bm25_topk(docs, _queries(spark, [(0, "cat")])).collect()
    }
    # N=3, avgdl=8/3; 'cat': df=1, tf(doc1)=2, dl(doc1)=3
    want = round(
        round(_bm25_ref(2, 1, 3, 3, 8 / 3.0), 9), 6
    )
    assert got == {(0, 1): (1, want)}


def test_bm25_oov_term_contributes_nothing(spark):
    docs = _docs(spark, [(1, "cat dog"), (2, "dog fish")])
    with_oov = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_topk(
            docs, _queries(spark, [(0, "cat"), (0, "zebra")])
        ).collect()
    }
    without = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_topk(docs, _queries(spark, [(0, "cat")])).collect()
    }
    assert with_oov == without and len(with_oov) == 1


def test_bm25_duplicate_query_terms_deduped(spark):
    docs = _docs(spark, [(1, "cat dog"), (2, "dog fish")])
    once = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_topk(docs, _queries(spark, [(0, "cat")])).collect()
    }
    twice = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_topk(
            docs, _queries(spark, [(0, "cat"), (0, "cat")])
        ).collect()
    }
    assert once == twice


def test_bm25_rarer_term_ranks_higher(spark):
    # doc 1 matches the rare term, doc 2 the common term; same tf/dl
    docs = _docs(
        spark,
        [(1, "rare pad"), (2, "common pad"), (3, "common x"), (4, "common y")],
    )
    rows = retrieval.bm25_topk(
        docs, _queries(spark, [(0, "rare"), (0, "common")]), k=4
    ).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked[0] == 1  # rare-term doc on top


def test_bm25_rank_ties_break_by_doc_id(spark):
    docs = _docs(spark, [(5, "cat dog"), (2, "cat dog"), (9, "cat dog")])
    rows = retrieval.bm25_topk(docs, _queries(spark, [(0, "cat")]), k=3).collect()
    ordered = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ordered == [2, 5, 9]


def test_bm25_k_limits_results(spark, docs):
    out = retrieval.bm25_topk(
        docs, _queries(spark, [(0, "spark"), (1, "hash")]), k=3
    )
    per_q = {
        r["query_id"]: r["cnt"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_q == {0: 3, 1: 3}


def test_bm25_query_side_broadcast(spark, docs):
    """The query vocabulary must broadcast onto the tf table — the
    corpus-sized postings list is filtered in place, never shuffled
    against the query set."""
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(
        retrieval.bm25_topk(docs, _queries(spark, [(0, "spark")])), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_persisted_index_round_trip(spark, docs):
    """Build-once/serve-many: bm25_index -> write_bucketed (tf by
    token, dl by doc_id) -> re-read from disk -> bm25_search equals
    the inline bm25_topk bit-for-bit."""
    from mapreduceimpl_spark.operators.retrieval import (
        bm25_index,
        bm25_search,
        bm25_topk,
    )
    from mapreduceimpl_spark.sources.sinks import write_bucketed

    q = _queries(spark, [(0, "spark"), (0, "shuffle"), (1, "hash"), (1, "join")])
    tf, dl = bm25_index(docs)
    try:
        write_bucketed(tf, "t_bm25_tf_rt", ["token"], n_buckets=8)
        write_bucketed(dl, "t_bm25_dl_rt", ["doc_id"], n_buckets=8)
        from_disk = bm25_search(
            spark.table("t_bm25_tf_rt"), spark.table("t_bm25_dl_rt"), q
        )
        inline = bm25_topk(docs, q)
        assert sorted(map(tuple, from_disk.collect())) == sorted(
            map(tuple, inline.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bm25_tf_rt")
        spark.sql("DROP TABLE IF EXISTS t_bm25_dl_rt")


def test_rrf_fuse_hand_case(spark):
    """RRF arithmetic and edge semantics: a doc in both lists outranks
    single-list docs with better single ranks; one-list docs carry a
    NULL rank for the missing side."""
    from mapreduceimpl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], ["query_id", "doc_id", "rank"]
    )
    sem = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1)], ["query_id", "vec_id", "rank"]
    )
    out = {r["doc_id"]: r for r in rrf_fuse(lex, sem, k=3).collect()}
    # doc 10: 1/61 + 1/62; doc 12: 1/61; doc 11: 1/62
    assert out[10]["rank"] == 1 and out[12]["rank"] == 2 and out[11]["rank"] == 3
    assert abs(out[10]["rrf"] - (1 / 61 + 1 / 62)) < 1e-12
    assert out[12]["lex_rank"] is None and out[11]["sem_rank"] is None


def test_rrf_fuse_validates_and_ties_break_on_doc_id(spark):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(0, 5, 1), (0, 3, 1)], ["query_id", "doc_id", "rank"])
    sem = spark.createDataFrame([], "query_id long, vec_id long, rank long")
    with _pytest.raises(ValueError):
        rrf_fuse(lex, sem, k=0)
    rows = rrf_fuse(lex, sem, k=2).collect()
    # equal rrf -> lower doc_id wins the tie
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [3, 5]


def test_retrieval_metrics_hand_case(spark):
    """Worked example: query 0 has 3 relevant docs; the ranked list
    hits two of them at ranks 1 and 3.  recall@5 = 2/3, MRR = 1,
    nDCG = (1 + 1/log2(4)) / (1 + 1/log2(3) + 1/log2(4)).  Query 1
    (1 relevant, no hits) zeroes every metric."""
    import math

    from mapreduceimpl_spark.operators.retrieval import retrieval_metrics

    ranked = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
        ["query_id", "vec_id", "rank"],
    )
    rels = spark.createDataFrame(
        [(0, 10, 3), (0, 12, 3), (0, 99, 3), (1, 98, 1)],
        ["query_id", "doc_id", "n_rel"],
    )
    out = {r["query_id"]: r for r in retrieval_metrics(ranked, rels, k=5).collect()}
    assert out[0]["n_hits"] == 2 and out[0]["mrr"] == 1.0
    assert abs(out[0]["recall_at_k"] - round(2 / 3, 6)) < 1e-12
    dcg = round(1 / math.log2(2), 9) + round(1 / math.log2(4), 9)
    idcg = sum(round(1 / math.log2(i + 1), 9) for i in (1, 2, 3))
    assert abs(out[0]["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9
    assert out[1]["n_hits"] == 0 and out[1]["mrr"] == 0.0
    assert out[1]["recall_at_k"] == 0.0 and out[1]["ndcg_at_k"] == 0.0


def test_qlm_topk_ranks_matching_docs(spark):
    """A doc dense in the query term outranks a sparse one and both
    outrank candidates matching only the other term; absent terms
    score through the prior (so every candidate gets |q| terms);
    corpus-unseen query terms are skipped, not ln(0)."""
    from mapreduceimpl_spark.operators.retrieval import qlm_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pie"),
            (2, "apple tart"),
            (3, "banana split banana"),
            (4, "carrot cake"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame(
        [(1, "apple"), (1, "banana"), (2, "unseen_token"), (2, "carrot")],
        ["query_id", "term"],
    )
    rows = qlm_topk(docs, q, k=3).collect()
    q1 = [r["doc_id"] for r in rows if r["query_id"] == 1]
    # doc 3 matches banana; docs 1,2 match apple; doc 4 matches neither
    assert set(q1) <= {1, 2, 3} and len(q1) == 3
    assert q1[0] in (1, 3)  # densest matches lead
    q2 = [r for r in rows if r["query_id"] == 2]
    # unseen term skipped; carrot ranks doc 4 first with finite score
    assert q2[0]["doc_id"] == 4
    assert all(r["score"] < 0 for r in rows)  # log-probs are negative
