"""Text-analysis operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import text_analysis


def test_lang_id_deterministic_and_total(docs):
    out = text_analysis.lang_id(docs)
    assert out.count() == docs.count()
    preds = {r["pred_lang"] for r in out.select("pred_lang").distinct().collect()}
    assert preds <= set(text_analysis.LANG_MARKERS) | {"und"}


def test_lang_id_marker_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and a dog", "en"),
            (2, "der hund und die katze und das haus", "de"),
            (3, "el perro y la casa y los gatos", "es"),
            (4, "xyzzy plugh qwerty", "xx"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text_analysis.lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_quality_score_ranges(docs):
    q = text_analysis.quality_score(docs)
    bad = q.filter(
        (F.col("stopword_ratio") < 0)
        | (F.col("stopword_ratio") > 1)
        | (F.col("diversity") <= 0)
        | (F.col("diversity") > 1)
        | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0


def test_token_stats_totals(docs):
    stats = text_analysis.token_stats(docs)
    total_docs = stats.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == docs.count()
    total_tokens = stats.agg(F.sum("total_tokens")).collect()[0][0]
    direct = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert total_tokens == direct


def test_fingerprint_subset_of_shingle_hashes(docs):
    """Winnowing selects a subset of each doc's shingle hashes, and
    every doc with >= k+window-1 tokens gets at least one fingerprint."""
    fp = text_analysis.fingerprint_winnow(docs, k=5, window=4)
    per_doc = fp.groupBy("doc_id").agg(F.count("*").alias("n"))
    eligible = docs.filter(F.size(F.split("text", " ")) >= 8).count()
    assert per_doc.count() == eligible
    # winnowing compresses: selected << total shingles
    total_sh = docs.select(F.sum(F.size(F.split("text", " ")) - 4)).collect()[0][0]
    assert fp.count() < total_sh
