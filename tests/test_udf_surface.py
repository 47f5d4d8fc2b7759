"""UDF-surface parity: the two-function API (mp/worker.go:14-17)
expressed on mapInPandas/applyInPandas must agree with the columnar
plans."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import udf_surface, wordcount


def test_udf_wordcount_matches_columnar(docs):
    """U1+U2 wordcount == built-in groupBy().count() exactly."""
    via_udf = udf_surface.udf_wordcount(docs)
    via_columnar = wordcount.word_count(docs)
    assert via_udf.exceptAll(via_columnar).count() == 0
    assert via_columnar.exceptAll(via_udf).count() == 0


def test_map_partitions_generic(docs):
    """Arbitrary per-partition transform: char count per doc."""

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n": pdf["text"].str.len()}
            )

    out = udf_surface.map_partitions(
        docs.select("doc_id", "text"), fn, "doc_id long, n long"
    )
    joined = out.join(docs, "doc_id")
    mismatches = joined.filter(F.col("n") != F.length("text")).count()
    assert mismatches == 0


def test_group_reduce_sees_full_group(tables):
    """The reducer UDF receives the complete group (all shards merged),
    like TestReduce (test.go:53-65): per-group row count == group size."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderstatus": [pdf["o_orderstatus"].iloc[0]], "n": [len(pdf)]}
        )

    out = udf_surface.group_reduce(
        tables["orders"], ["o_orderstatus"], fn, "o_orderstatus string, n long"
    )
    expected = tables["orders"].groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    assert out.exceptAll(expected).count() == 0


def test_grouped_agg_udaf_vs_group_reduce_high_cardinality(spark):
    """The measured basis for group_reduce's high-cardinality warning:
    at 50k tiny groups, per-group applyInPandas pays one pandas
    DataFrame + one Python dispatch per key, while the grouped-agg
    pandas UDF amortizes dispatch across Arrow batches.  Results must
    be identical; the UDAF path must not be slower."""
    import time

    df = (
        spark.range(100_000)
        .select((F.col("id") % 50_000).alias("k"), (F.col("id") * 1.0).alias("v"))
        .cache()
    )
    df.count()
    try:
        def sum_fn(s: pd.Series) -> float:  # hints drive pandas_udf's
            return float(s.sum())           # grouped-agg inference

        t0 = time.perf_counter()
        via_udaf = {
            (r["k"], r["s"])
            for r in udf_surface.grouped_agg_udaf(
                df, ["k"], "v", sum_fn, alias="s"
            ).collect()
        }
        t_udaf = time.perf_counter() - t0

        def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"k": [pdf["k"].iloc[0]], "s": [float(pdf["v"].sum())]}
            )

        t0 = time.perf_counter()
        via_reduce = {
            (r["k"], r["s"])
            for r in udf_surface.group_reduce(
                df, ["k"], reduce_fn, "k long, s double"
            ).collect()
        }
        t_reduce = time.perf_counter() - t0
    finally:
        df.unpersist()
    assert via_udaf == via_reduce
    assert t_udaf < t_reduce, (
        f"grouped_agg_udaf {t_udaf:.2f}s should beat per-key "
        f"applyInPandas {t_reduce:.2f}s at 50k groups"
    )


def test_grouped_agg_udaf(tables):
    def mean_fn(s: pd.Series) -> float:
        return float(s.mean())

    out = udf_surface.grouped_agg_udaf(
        tables["orders"], ["o_orderstatus"], "o_totalprice", mean_fn, "m"
    )
    expected = tables["orders"].groupBy("o_orderstatus").agg(
        F.avg("o_totalprice").alias("m")
    )
    pairs = {r["o_orderstatus"]: r["m"] for r in out.collect()}
    for r in expected.collect():
        assert abs(pairs[r["o_orderstatus"]] - r["m"]) < 1e-6


def test_udtf_chunks_equal_columnar_chunker(spark, docs):
    """The Python @udtf LATERAL expansion is value-identical to the
    columnar chunk_documents (same recurrence, same null/short edges)."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents
    from mapreduceimpl_spark.operators.udf_surface import udtf_chunk_documents

    key = lambda r: (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
    a = sorted(map(key, chunk_documents(docs).collect()))
    b = sorted(map(key, udtf_chunk_documents(spark, docs).collect()))
    assert a == b and len(a) > 0


def test_udtf_chunks_null_and_short_edges(spark):
    from mapreduceimpl_spark.operators.udf_surface import udtf_chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, "a b"), (3, " ".join(["t"] * 70))], ["doc_id", "text"]
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in udtf_chunk_documents(spark, df).collect()
    )
    # null -> one empty 1-token chunk; 2 tokens -> one chunk;
    # 70 tokens -> chunks at 0 and 56 (stride 56), second has 14
    assert rows == [(1, 0, 1), (2, 0, 2), (3, 0, 64), (3, 1, 14)]


def test_udtf_chunks_rejects_bad_overlap(spark, docs):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.udf_surface import udtf_chunk_documents

    with _pytest.raises(ValueError):
        udtf_chunk_documents(spark, docs, chunk_tokens=64, overlap=64)


def test_udtf_chunk_documents_interleaved_calls_do_not_clobber(spark, docs):
    """Two lazily-built UDTF plans over DIFFERENT inputs must each
    chunk their own input when executed later (per-call view names —
    ADVICE r4)."""
    from mapreduceimpl_spark.operators.udf_surface import udtf_chunk_documents

    small = docs.limit(3)
    plan_a = udtf_chunk_documents(spark, small)
    plan_b = udtf_chunk_documents(spark, docs.limit(7))  # overwrites? no:
    a_docs = {r["doc_id"] for r in plan_a.select("doc_id").distinct().collect()}
    b_docs = {r["doc_id"] for r in plan_b.select("doc_id").distinct().collect()}
    assert len(a_docs) == 3 and len(b_docs) == 7 and a_docs <= b_docs


def test_udtf_chunk_documents_eager_cleanup_drops_registrations(spark, docs):
    """eager_cleanup=True must return correct rows AND leave no trace
    in the session catalog (ADVICE r5: heavy call volume grew temp
    view/function state without bound in lazy mode)."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents
    from mapreduceimpl_spark.operators.udf_surface import udtf_chunk_documents

    views_before = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    out = udtf_chunk_documents(spark, docs, eager_cleanup=True)
    views_after = {v.name for v in spark.catalog.listTables() if v.isTemporary}
    assert views_after - views_before == set(), "temp view leaked"

    key = lambda r: (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
    a = sorted(map(key, chunk_documents(docs).collect()))
    b = sorted(map(key, out.collect()))
    assert a == b and len(a) > 0
