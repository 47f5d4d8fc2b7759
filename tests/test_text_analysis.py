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


def test_repetition_stats_flags_degenerate_docs(spark):
    """A looping document scores high on every repetition metric and is
    dropped; a diverse document keeps low fractions and survives."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "buy now buy now buy now buy now"),
            (3, "the quick brown fox jumps over a lazy dog tonight"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_analysis.repetition_stats(docs).collect()}
    assert rows[1]["top_unigram_frac"] == 1.0
    assert rows[1]["dup_trigram_frac"] > 0.5
    assert not rows[1]["keep"]
    assert rows[2]["top_bigram_frac"] > 0.5
    assert not rows[2]["keep"]
    assert rows[3]["top_unigram_frac"] <= 0.2
    assert rows[3]["dup_trigram_frac"] == 0.0
    assert rows[3]["keep"]


def test_repetition_stats_short_docs_zero_not_null(spark):
    """Docs too short for bi/trigrams coalesce those fractions to 0.0
    (nothing repeats) instead of null-poisoning the keep flag."""
    docs = spark.createDataFrame([(1, "solo"), (2, "two words")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in text_analysis.repetition_stats(docs).collect()}
    assert rows[1]["dup_trigram_frac"] == 0.0
    assert rows[1]["top_bigram_frac"] == 0.0
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[1]["keep"] is not None


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@corp.co.uk today"),
            (2, "call 555-123-4567 or +1 555 987 6543 now"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_analysis.pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 2
    assert "<EMAIL>" in rows[1]["clean_text"]
    assert "alice@example.com" not in rows[1]["clean_text"]
    assert rows[2]["n_phones"] >= 1
    assert "<PHONE>" in rows[2]["clean_text"]
    assert "555-123-4567" not in rows[2]["clean_text"]
    assert rows[3]["clean_text"] == "no pii here at all"
    assert rows[3]["n_emails"] == 0 and rows[3]["n_phones"] == 0


def test_contamination_check_finds_planted_overlap(spark):
    """A training doc sharing an 8-gram with the benchmark set is
    flagged; disjoint docs are not; benchmark docs are excluded."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            (0, bench_text),                                      # doc_id % 97 == 0 -> benchmark
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
            (2, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_analysis.contamination_check(docs).collect()}
    assert 0 not in rows  # benchmark docs excluded from scoring
    assert rows[1]["is_contaminated"] and rows[1]["n_contaminated"] >= 1
    assert not rows[2]["is_contaminated"] and rows[2]["n_contaminated"] == 0


def test_pii_scrub_phone_inside_email_not_double_counted(spark):
    """A phone-shaped string consumed by <EMAIL> must not also count
    as a removed phone (audit counts describe the placeholders)."""
    docs = spark.createDataFrame(
        [(1, "reach me at 555-123-4567@mail.com ok")], ["doc_id", "text"]
    )
    r = text_analysis.pii_scrub(docs).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_phones"] == 0
    assert "<EMAIL>" in r["clean_text"] and "<PHONE>" not in r["clean_text"]


def test_repetition_stats_single_scan(docs):
    """The gram pipeline must scan/tokenize the corpus once (round-2
    review: three union branches re-scanned it three times)."""
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(text_analysis.repetition_stats(docs), "simple")
    assert plan.count("Scan parquet") == 1, plan


def test_compression_ratio_separates_boilerplate(spark):
    """Looping text compresses far better than diverse text — the
    ratio flags it; the keep threshold splits them."""
    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 200),
            (2, "the quick brown fox jumps over the lazy dog while zebras quarrel"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_analysis.compression_ratio(docs).collect()}
    assert rows[1]["ratio"] > 10  # degenerate repetition
    assert rows[2]["ratio"] < 2   # natural-ish prose
    assert not rows[1]["keep"] and rows[2]["keep"]
    assert rows[1]["n_compressed"] < rows[1]["n_bytes"]


def test_compression_ratio_deterministic(docs):
    a = {(r["doc_id"], r["n_compressed"]) for r in text_analysis.compression_ratio(docs).collect()}
    b = {(r["doc_id"], r["n_compressed"]) for r in text_analysis.compression_ratio(docs).collect()}
    assert a == b and len(a) == docs.count()


def test_chunk_documents_exact_windows(docs):
    """Chunk i's tokens are exactly orig_tokens[i*stride : i*stride+64];
    every token of every doc is covered."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents

    orig = {r["doc_id"]: r["text"].split(" ") for r in docs.limit(50).collect()}
    got = chunk_documents(docs.limit(50)).collect()
    stride = 64 - 8
    seen = {}
    for r in got:
        toks = orig[r["doc_id"]]
        start = r["chunk_idx"] * stride
        expect = toks[start : start + 64]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)
        seen.setdefault(r["doc_id"], set()).update(range(start, start + len(expect)))
    for did, toks in orig.items():
        assert seen[did] == set(range(len(toks))), f"doc {did} has uncovered tokens"


def test_chunk_documents_zero_shuffle(docs):
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(chunk_documents(docs), "simple")
    assert "Exchange" not in plan, plan


def test_chunk_documents_rejects_bad_overlap(docs):
    import pytest

    from mapreduceimpl_spark.operators.text_analysis import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_chunk_documents_boundary_lengths(spark):
    """Edge lengths: empty text (1 empty token), single token, exactly
    chunk_tokens, chunk_tokens + 1 (forces a short overlap-bearing
    second chunk)."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_documents

    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    rows = [(1, ""), (2, "solo"), (3, mk(64)), (4, mk(65))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {}
    for r in chunk_documents(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert len(got[1]) == 1 and got[1][0]["n_tokens"] == 1  # split('') -> ['']
    assert len(got[2]) == 1 and got[2][0]["chunk_text"] == "solo"
    assert len(got[3]) == 1 and got[3][0]["n_tokens"] == 64
    two = sorted(got[4], key=lambda r: r["chunk_idx"])
    assert len(two) == 2
    assert two[0]["n_tokens"] == 64
    # second chunk starts at stride 56: tokens 56..64 = 9 tokens
    assert two[1]["n_tokens"] == 9
    assert two[1]["chunk_text"].split(" ")[0] == "t56"


def test_vocab_top_terms_ranked_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b b c", "en"),
            (2, "b z z", "en"),
            (3, "x y", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = text_analysis.vocab_top_terms(df, k=2).collect()
    en = sorted([(r["rank"], r["token"], r["cnt"]) for r in out if r["lang"] == "en"])
    de = sorted([(r["rank"], r["token"], r["cnt"]) for r in out if r["lang"] == "de"])
    # en counts: a=3, b=3, c=1, z=2 -> top2 = a (tiebreak asc) then b
    assert en == [(1, "a", 3), (2, "b", 3)]
    # de counts: x=1, y=1 -> tiebreak alphabetical
    assert de == [(1, "x", 1), (2, "y", 1)]


def test_vocab_top_terms_respects_k(docs):
    out = text_analysis.vocab_top_terms(docs, k=5)
    per_lang = out.groupBy("lang").count().collect()
    for r in per_lang:
        assert r["count"] <= 5
    assert out.filter(F.col("rank") > 5).count() == 0


def test_quality_percentile_keeps_top_quartile_per_lang(docs):
    kept = text_analysis.quality_percentile_filter(docs, quantile=0.75)
    total = docs.groupBy("lang").count().withColumnRenamed("count", "n_total")
    kept_n = kept.groupBy("lang").count().withColumnRenamed("count", "n_kept")
    joined = {r["lang"]: r for r in total.join(kept_n, "lang", "left").collect()}
    for lang, r in joined.items():
        n_kept = r["n_kept"] or 0
        # rank-based cutoff keeps at most 25% + ties, at least one doc
        # unless every doc shares the max diversity... fixture has spread
        assert n_kept <= max(1, int(r["n_total"] * 0.30) + 1), lang
        assert n_kept >= 1, lang


def test_quality_percentile_threshold_is_per_lang(spark):
    """A low-diversity doc in a low-diversity language survives while
    the same score in a high-diversity language is dropped."""
    rows = [
        # lang 'aa': diversities 0.25, 0.5 -> keep only 0.5
        (1, "a a a a", "aa"),
        (2, "a b a b", "aa"),
        # lang 'bb': diversities 0.5, 0.75, 1.0 1.0 -> cume_dist 0.25,0.5,1,1
        (3, "a b a b", "bb"),
        (4, "a b c a", "bb"),
        (5, "a b c d", "bb"),
        (6, "e f g h", "bb"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    kept = {r["doc_id"] for r in text_analysis.quality_percentile_filter(df, 0.75).collect()}
    assert 2 in kept          # 0.5 survives in lang aa (cume_dist 1.0)
    assert 3 not in kept      # 0.5 dropped in lang bb (cume_dist 0.25)
    assert kept >= {5, 6}     # the 1.0-diversity pair (cume_dist 1.0)


def test_token_pair_counts_bpe_merge_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "lo w lo w er", "en"),
            (2, "lo w", "en"),
            (3, "x", "en"),      # single token: no pairs
            (4, "", "de"),       # empty-string doc: 1 empty token, no pairs
        ],
        ["doc_id", "text", "lang"],
    )
    out = text_analysis.token_pair_counts(df, k=3).collect()
    en = {(r["rank"], r["pair"], r["cnt"]) for r in out if r["lang"] == "en"}
    # pairs: doc1 -> (lo w), (w lo), (lo w), (w er); doc2 -> (lo w)
    # counts: "lo w"=3, "w er"=1, "w lo"=1 -> rank by cnt desc, pair asc
    assert en == {(1, "lo w", 3), (2, "w er", 1), (3, "w lo", 1)}
    assert not [r for r in out if r["lang"] == "de"]


def test_token_entropy_known_values(spark):
    """Hand-computable entropies: uniform 4-token doc -> 2 bits;
    single repeated token -> 0 bits; 'a a b b' -> 1 bit."""
    df = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "x x x x", "en"), (3, "a a b b", "en")],
        ["doc_id", "text", "lang"],
    )
    got = {r["doc_id"]: r for r in text_analysis.token_entropy(df).collect()}
    assert got[1]["entropy_bits"] == 2.0 and got[1]["n_tokens"] == 4
    assert got[2]["entropy_bits"] == 0.0
    assert got[3]["entropy_bits"] == 1.0


def test_heavy_hitters_exact_and_recall_guaranteed(docs):
    """MG candidates + exact recount must equal plain wordcount +
    threshold filter — including at a tiny capacity where eviction
    churn is constant (the recall guarantee, not luck)."""
    from mapreduceimpl_spark.operators.text_analysis import heavy_hitters

    for frac in (0.002, 0.02):
        got = {
            r["token"]: r["cnt"] for r in heavy_hitters(docs, min_frac=frac).collect()
        }
        toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
        n = toks.count()
        exact = {
            r["t"]: r["c"]
            for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
            if r["c"] >= n * frac
        }
        assert got == exact, f"frac={frac}"


def test_heavy_hitters_rejects_bad_frac(docs):
    import pytest

    from mapreduceimpl_spark.operators.text_analysis import heavy_hitters

    with pytest.raises(ValueError):
        heavy_hitters(docs, min_frac=0.0)


def test_heavy_hitters_candidate_set_broadcast(docs):
    """The recount joins the token stream against a BROADCAST
    candidate set — the full vocabulary never shuffles."""
    from mapreduceimpl_spark.operators.text_analysis import heavy_hitters
    from mapreduceimpl_spark.plans import assert_broadcast_join

    assert_broadcast_join(heavy_hitters(docs), expect=2)  # candidates + total


def test_bigram_logprob_known_values(spark):
    """Hand-checked two-doc corpus: 'a b a b' and 'a b'. Unigram
    counts a=3 b=3 N=6; bigrams ab=3 ba=1. p(b|a)=0.7*1+0.3*0.5=0.85,
    p(a|b)=0.7*(1/3)+0.3*0.5."""
    import math

    from mapreduceimpl_spark.operators.text_analysis import bigram_logprob

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_logprob(d).collect()}
    p_ab = 0.7 * (3 / 3) + 0.30000000000000004 * (3 / 6)
    p_ba = 0.7 * (1 / 3) + 0.30000000000000004 * (3 / 6)
    lp = lambda p: round(math.log(p), 9)
    exp1 = round(-(lp(p_ab) + lp(p_ba) + lp(p_ab)) / 3, 6)
    exp2 = round(-lp(p_ab) / 1, 6)
    assert got[1]["n_pairs"] == 3 and got[1]["avg_neg_logprob"] == exp1
    assert got[2]["n_pairs"] == 1 and got[2]["avg_neg_logprob"] == exp2


def test_bigram_logprob_orders_predictable_below_scrambled(spark):
    """Within one corpus, a doc made of the dominant repeated bigram
    chain must score more probable (lower avg neg logprob) than a doc
    pairing the SAME tokens in never-repeated combinations — the
    word-order signal unigram stats cannot express.  Also: the score
    is partition-count invariant (decimal-routed sum)."""
    from mapreduceimpl_spark.operators.text_analysis import bigram_logprob

    rows = [(i, "a b c d a b c d a b c d") for i in range(10)]
    rows.append((100, "a d c b d a b d c a d b"))  # same tokens, odd pairs
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_neg_logprob"] for r in bigram_logprob(d).collect()}
    assert got[100] > got[0]
    re_got = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in bigram_logprob(d.repartition(7)).collect()
    }
    assert re_got == got


def test_collocations_pmi_known_corpus(spark):
    """'new york' appears 6x and its parts appear nowhere else ->
    highest PMI; 'the the' (frequent independent token) ranks below."""
    import math

    from mapreduceimpl_spark.operators.text_analysis import collocations_pmi

    rows = [(i, "new york " + "the the the " * 4) for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations_pmi(d, min_count=5, k=10).collect()
    assert got[0]["tok_a"] == "new" and got[0]["tok_b"] == "york"
    n_tok = d.selectExpr("sum(size(split(text, ' ')))").first()[0]
    n_pair = d.selectExpr("sum(size(split(text, ' ')) - 1)").first()[0]
    exp = round(math.log((6 / n_pair) / ((6 / n_tok) * (6 / n_tok))), 6)
    assert got[0]["pmi"] == exp
    pmis = {(r["tok_a"], r["tok_b"]): r["pmi"] for r in got}
    assert pmis[("the", "the")] < pmis[("new", "york")]


def test_collocations_min_count_drops_rare(spark):
    from mapreduceimpl_spark.operators.text_analysis import collocations_pmi

    d = spark.createDataFrame(
        [(1, "rare pair common common common common common common")],
        "doc_id long, text string",
    )
    got = {(r["tok_a"], r["tok_b"]) for r in collocations_pmi(d, min_count=5).collect()}
    assert ("rare", "pair") not in got
    assert ("common", "common") in got


def test_span_corruption_reconstruction_invariant(docs):
    """For every doc: replacing each input sentinel with its target
    span reconstructs the original text exactly — masking must be
    lossless."""
    from mapreduceimpl_spark.operators.text_analysis import span_corruption_pairs

    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = span_corruption_pairs(docs).collect()
    assert len(rows) == len(originals)
    masked_docs = 0
    for r in rows:
        # parse target: "<extra_id_0> a b <extra_id_1> c" -> spans
        spans = {}
        cur = None
        for tok in r["target_text"].split(" ") if r["target_text"] else []:
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        out = []
        for tok in r["input_text"].split(" "):
            if tok.startswith("<extra_id_"):
                out.extend(spans[tok])
            else:
                out.append(tok)
        assert " ".join(out) == originals[r["doc_id"]], r["doc_id"]
        if r["n_masked"] > 0:
            masked_docs += 1
        assert r["n_masked"] == sum(len(v) for v in spans.values())
    # at 15% token mask rate virtually every doc has a masked span
    assert masked_docs > len(rows) * 0.8


def test_span_corruption_mask_rate_and_determinism(docs):
    from mapreduceimpl_spark.operators.text_analysis import span_corruption_pairs

    a = span_corruption_pairs(docs).collect()
    b = span_corruption_pairs(docs.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    total_tokens = sum(len(r["text"].split(" ")) for r in docs.collect())
    total_masked = sum(r["n_masked"] for r in a)
    assert 0.10 <= total_masked / total_tokens <= 0.20  # ~15%


def test_span_corruption_single_exchange(docs):
    from mapreduceimpl_spark.operators.text_analysis import span_corruption_pairs
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(span_corruption_pairs(docs), "simple")
    assert plan.count("Exchange") == 1, plan  # one doc_id partition, no join


def test_vocab_coverage_hand_computed(spark):
    from mapreduceimpl_spark.operators.text_analysis import vocab_coverage

    df = spark.createDataFrame(
        [
            (1, "a a a b"),     # 'a' x3, 'b' x1
            (2, "a b c"),       # 'c' is rarest
            (3, "c a"),
        ],
        ["doc_id", "text"],
    )
    # vocab_size=2 -> counts: a=5, b=2, c=2; tie b vs c broken token ASC -> {a, b}
    out = {r["doc_id"]: r for r in vocab_coverage(df, vocab_size=2).collect()}
    assert out[1]["n_oov"] == 0 and out[1]["n_tokens"] == 4
    assert out[2]["n_oov"] == 1 and out[2]["oov_rate"] == 1.0 / 3.0
    assert out[3]["n_oov"] == 1 and out[3]["oov_rate"] == 0.5


def test_vocab_coverage_full_vocab_zero_oov(docs):
    from mapreduceimpl_spark.operators.text_analysis import vocab_coverage

    out = vocab_coverage(docs, vocab_size=10_000_000)
    assert out.filter(F.col("n_oov") > 0).count() == 0


def test_preference_pairs_hand_computed(spark):
    from mapreduceimpl_spark.operators.text_analysis import preference_pairs

    df = spark.createDataFrame(
        [
            (1, "en", "web", "a b c d"),    # diversity 1.0
            (2, "en", "web", "a a a a"),    # diversity 0.25
            (3, "en", "web", "a b a b"),    # diversity 0.5
            (4, "fr", "web", "x x"),        # single-group all-equal -> dropped
            (5, "fr", "web", "y y"),
        ],
        ["doc_id", "lang", "source", "text"],
    )
    rows = preference_pairs(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["chosen_id"], r["rejected_id"]) == (1, 2)
    assert r["margin"] == 0.75


def test_preference_pairs_singleton_group_dropped(spark):
    from mapreduceimpl_spark.operators.text_analysis import preference_pairs

    df = spark.createDataFrame(
        [(1, "en", "web", "a b c")], ["doc_id", "lang", "source", "text"]
    )
    assert preference_pairs(df).count() == 0


def test_preference_pairs_chosen_beats_rejected(docs):
    from mapreduceimpl_spark.operators.text_analysis import preference_pairs

    for r in preference_pairs(docs).collect():
        assert r["chosen_score"] > r["rejected_score"]
        assert r["chosen_id"] != r["rejected_id"]
        assert r["margin"] > 0


def test_preference_pairs_null_text_excluded(spark):
    """A null-text doc must not hijack the rejected slot (Spark sorts
    nulls first on ASC; DuckDB defaults nulls last)."""
    from mapreduceimpl_spark.operators.text_analysis import preference_pairs

    df = spark.createDataFrame(
        [
            (1, "en", "web", "a b c d"),
            (2, "en", "web", "a a a a"),
            (3, "en", "web", None),
        ],
        ["doc_id", "lang", "source", "text"],
    )
    rows = preference_pairs(df).collect()
    assert len(rows) == 1
    assert (rows[0]["chosen_id"], rows[0]["rejected_id"]) == (1, 2)


def test_bpe_train_merges_greedy_loop(spark):
    """The chained merge rounds follow BPE's greedy non-overlapping
    rule: 'a a a a' yields two 'a a' pairs in round 1, and round 2
    counts pairs of the MERGED corpus (merged symbols participate)."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a b"), (3, "c b")], ["doc_id", "text"]
    )
    rows = {r["round"]: r for r in bpe_train_merges(docs, rounds=2).collect()}
    # round 1 COUNTS all adjacent positions (overlap allowed): doc1 has
    # 3 'a a' positions + 1 in doc2 = 4; only the MERGE is non-overlap
    assert rows[1]["pair"] == "a a" and rows[1]["cnt"] == 4
    # merged corpus: doc1 = (a a)(a a) b, doc2 = (a a) b -> the pair
    # '(a a) b' appears twice; '(a a) (a a)' once; 'c b' once
    assert rows[2]["pair"] == "a a b" and rows[2]["cnt"] == 2


def test_bpe_train_merges_persist_path_identical(docs):
    from mapreduceimpl_spark.operators.text_analysis import bpe_train_merges

    lazy = {tuple(r) for r in bpe_train_merges(docs, rounds=3).collect()}
    persisted = {
        tuple(r)
        for r in bpe_train_merges(docs, rounds=3, persist_levels=True).collect()
    }
    assert lazy == persisted and len(lazy) == 3


def test_bpe_train_merges_validates_rounds(spark):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.text_analysis import bpe_train_merges

    docs = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bpe_train_merges(docs, rounds=0)


def test_bpe_apply_consistent_with_train(spark):
    """Applying the learned merges must shrink token counts by exactly
    the number of merge hits, and n_merged tracks multi-word symbols."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_apply

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a b"), (3, "c b")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bpe_apply(docs, rounds=2).collect()}
    # round 1 merges 'a a'; round 2 merges '(a a) b'
    # doc1: a a a a b -> (aa)(aa) b -> (aa) (aab)     => 2 symbols, 2 merged
    assert (out[1]["n_symbols"], out[1]["n_merged"]) == (2, 2)
    # doc2: a a b -> (aa) b -> (aab)                  => 1 symbol, merged
    assert (out[2]["n_symbols"], out[2]["n_merged"]) == (1, 1)
    # doc3: c b unchanged
    assert (out[3]["n_symbols"], out[3]["n_merged"]) == (2, 0)


def test_l_diversity_flags_homogeneous_class(spark):
    from mapreduceimpl_spark.operators.relational import q_l_diversity

    rows = [
        (1, "x", "en", "web", 50),
        (2, "x", "en", "books", 50),
        (3, "x", "en", "wiki", 50),
        (4, "x", "de", "web", 50),
        (5, "x", "de", "web", 50),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {(r["lang"], r["len_bucket"]): r for r in
           q_l_diversity({"documents": d}, l=3).collect()}
    assert out[("en", 0)]["n_sensitive"] == 3 and not out[("en", 0)]["violates_l"]
    assert out[("de", 0)]["n_sensitive"] == 1 and out[("de", 0)]["violates_l"]


def test_bpe_vocab_reflects_merges(spark):
    """After training, merged symbols appear in the vocabulary as
    space-joined words with their post-merge frequencies."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_vocab

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a b"), (3, "c b")], ["doc_id", "text"]
    )
    rows = {r["symbol"]: r for r in bpe_vocab(docs, rounds=2, k=10).collect()}
    # post-merge corpus: doc1 = (aa) (aab), doc2 = (aab), doc3 = c b
    assert rows["a a b"]["cnt"] == 2
    assert rows["a a"]["cnt"] == 1
    assert rows["b"]["cnt"] == 1 and rows["c"]["cnt"] == 1
    assert "a" not in rows  # every bare 'a' was merged away
    ranks = sorted(r["rank"] for r in rows.values())
    assert ranks == list(range(1, len(rows) + 1))


def test_bpe_merges_are_symbol_aligned(spark):
    """Round-5 review: the winner pair (a,b) must NOT match inside the
    distinct symbols 'ca' (suffix) or 'bc' (prefix) — the full-wrap
    representation makes every replace symbol-aligned."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_apply

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "ca b"), (4, "a bc")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bpe_apply(docs, rounds=1).collect()}
    # winner is ('a','b') with count 2; docs 1-2 merge to one symbol
    assert (out[1]["n_symbols"], out[1]["n_merged"]) == (1, 1)
    assert (out[2]["n_symbols"], out[2]["n_merged"]) == (1, 1)
    # 'ca b' and 'a bc' contain 'a...b' only as unaligned substrings
    assert (out[3]["n_symbols"], out[3]["n_merged"]) == (2, 0)
    assert (out[4]["n_symbols"], out[4]["n_merged"]) == (2, 0)


def test_bpe_empty_round_is_noop_not_corpus_delete(spark):
    """Round-5 review: a round with no mergeable pair (all docs have
    one symbol) must keep every doc, not crossJoin them away."""
    from mapreduceimpl_spark.operators.text_analysis import (
        bpe_apply,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "word"), (3, "")], ["doc_id", "text"]
    )
    assert bpe_train_merges(docs, rounds=2).collect() == []
    out = {r["doc_id"]: r for r in bpe_apply(docs, rounds=2).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r["n_symbols"] == 1 and r["n_merged"] == 0 for r in out.values())


def test_contamination_containment_scores_embedded_benchmark(spark):
    """A benchmark doc fully embedded in a training doc scores 1.0;
    partial overlap scores the exact shingle fraction; disjoint pairs
    are absent."""
    from mapreduceimpl_spark.operators.text_analysis import (
        contamination_containment,
    )

    bench_text = " ".join(f"b{i}" for i in range(10))  # 3 8-gram shingles
    rows = [
        (0, bench_text),                                   # benchmark (id % 97 == 0)
        (1, "pre " + bench_text + " post"),                # fully contains it
        (2, " ".join(f"b{i}" for i in range(9))),          # 2 of 3 shingles
        (3, "completely different words " * 4),            # disjoint
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           contamination_containment(docs, min_containment=0.5).collect()}
    assert out[1]["containment"] == 1.0 and out[1]["bench_id"] == 0
    assert out[2]["containment"] == round(2 / 3, 6)
    assert 3 not in out


def _bpe_reference(texts, rounds):
    """Pure-Python reference BPE: symbol lists, positional pair counts,
    lexicographic-min argmax of max count, greedy left-to-right
    non-overlapping merge.  Independent of the string-replace
    representation the Spark operator uses."""
    corpora = [t.split(" ") for t in texts]
    merges = []
    for _ in range(rounds):
        counts = {}
        for syms in corpora:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        # deterministic tiebreak: highest count, then lexicographically
        # SMALLEST boundary-joined pair (mirrors the operator's ORDER BY)
        top_cnt = max(counts.values())
        cands = [p for p, c in counts.items() if c == top_cnt]
        pair = min(cands, key=lambda p: "\x03\x02".join(p))
        merges.append((" ".join(pair).replace("\x1e", " "), top_cnt))
        merged_sym = pair[0] + "\x1e" + pair[1]
        new_corpora = []
        for syms in corpora:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_corpora.append(out)
        corpora = new_corpora
    return merges, corpora


def test_bpe_matches_pure_python_reference(spark):
    """Property-style check: on randomized small corpora the
    distributed string-replace BPE must equal an independent
    symbol-list reference implementation (merge table AND final
    per-doc symbol counts)."""
    import random

    from mapreduceimpl_spark.operators.text_analysis import (
        bpe_apply,
        bpe_train_merges,
    )

    rng = random.Random(42)
    vocab = ["a", "b", "c", "ab", "ba", "aa", "x"]
    for trial in range(4):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(3, 10))
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        rounds = rng.randint(1, 3)
        ref_merges, ref_corpora = _bpe_reference(texts, rounds)

        got_merges = [
            (r["pair"], r["cnt"])
            for r in bpe_train_merges(docs, rounds=rounds)
            .orderBy("round")
            .collect()
        ]
        exp_merges = [(p.replace("\x1e", " "), c) for p, c in ref_merges]
        assert got_merges == exp_merges, (trial, texts, got_merges, exp_merges)

        got_counts = {
            r["doc_id"]: r["n_symbols"]
            for r in bpe_apply(docs, rounds=rounds).collect()
        }
        exp_counts = {i: len(syms) for i, syms in enumerate(ref_corpora)}
        assert got_counts == exp_counts, (trial, texts)


def test_bpe_batched_m1_equals_sequential(spark):
    """At max_per_pass=1 the non-domination selection degenerates to
    the plain argmax, so bpe_train_batched must reproduce
    bpe_train_merges row-for-row (pass_no==round, rank always 1) —
    the equivalence anchor that pins the batched variant to the
    hash-verified sequential trainer."""
    from mapreduceimpl_spark.operators.text_analysis import (
        bpe_train_batched,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a b"), (3, "c b a a")], ["doc_id", "text"]
    )
    seq = [
        (r["round"], r["pair"], r["cnt"])
        for r in bpe_train_merges(docs, rounds=3).orderBy("round").collect()
    ]
    bat = bpe_train_batched(docs, passes=3, max_per_pass=1).orderBy("pass_no")
    got = [(r["pass_no"], r["pair"], r["cnt"]) for r in bat.collect()]
    assert got == seq
    assert all(r["rank"] == 1 for r in bat.collect())


def test_bpe_batched_selects_conflict_free_set(spark):
    """Hand fixture where the top candidates conflict: pairs sharing a
    side symbol with a higher-ranked candidate must be rejected
    (rank gap visible in the output), disjoint ones accepted, and all
    selected merges applied in ONE pass (pass-2 counts reflect every
    pass-1 merge)."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_train_batched

    # pair counts in pass 1: 'a b' x3 (docs 1,2,3), 'b c' x2 (1,2),
    # 'x y' x2 (4,5) -> ranked: (a b), (b c), (x y).  (b c) shares 'b'
    # with rank-1 -> rejected; (x y) is disjoint -> selected at rank 3.
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c"),
            (3, "a b"),
            (4, "x y"),
            (5, "x y"),
        ],
        ["doc_id", "text"],
    )
    out = bpe_train_batched(docs, passes=2, max_per_pass=3).collect()
    p1 = sorted(
        [(r["rank"], r["pair"], r["cnt"]) for r in out if r["pass_no"] == 1]
    )
    assert p1 == [(1, "a b", 3), (3, "x y", 2)]
    # pass 2 sees the rewritten corpus: docs 1,2 = '(a b) c' -> pair
    # '(a b) c' x2 is the new top; no other pair repeats
    p2 = [(r["rank"], r["pair"], r["cnt"]) for r in out if r["pass_no"] == 2]
    assert (1, "a b c", 2) in p2


def test_bpe_batched_validates_and_persist_identical(spark):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.text_analysis import bpe_train_batched

    docs = spark.createDataFrame(
        [(i, "a b c d e a b c d") for i in range(6)], ["doc_id", "text"]
    )
    with _pytest.raises(ValueError):
        bpe_train_batched(docs, passes=0)
    with _pytest.raises(ValueError):
        bpe_train_batched(docs, max_per_pass=0)
    lazy = {tuple(r) for r in bpe_train_batched(docs, passes=2, max_per_pass=4).collect()}
    caches: list = []
    persisted = {
        tuple(r)
        for r in bpe_train_batched(
            docs, passes=2, max_per_pass=4, persist_levels=True, caches=caches
        ).collect()
    }
    assert lazy == persisted and len(lazy) >= 2
    for c in caches:
        c.unpersist()


def test_bpe_deep_tier_checkpoints_and_matches(docs, monkeypatch):
    """Past BPE_CHECKPOINT_ROUNDS the persisted path must switch to
    localCheckpoint: persist bounds only EXECUTION, while the ANALYZED
    plan still doubles per level (each level is referenced twice), and
    a measured 12-pass run OOMed the JVM during plan analysis before
    any task ran.  With the threshold lowered, the deep tier must (a)
    re-root levels as LogicalRDD scans — visible as 'Scan ExistingRDD'
    against the parquet-backed fixture, which otherwise plans parquet
    scans only — and (b) return values identical to the lazy path, for
    BOTH the batched and the sequential trainer."""
    from mapreduceimpl_spark.operators import text_analysis as ta
    from mapreduceimpl_spark.plans import explain_str

    lazy_b = {
        tuple(r)
        for r in ta.bpe_train_batched(
            docs, passes=4, max_per_pass=2, persist_levels=False
        ).collect()
    }
    lazy_s = {
        tuple(r)
        for r in ta.bpe_train_merges(docs, rounds=4, persist_levels=False).collect()
    }
    monkeypatch.setattr(ta, "BPE_CHECKPOINT_ROUNDS", 3)
    deep_b = ta.bpe_train_batched(docs, passes=4, max_per_pass=2, persist_levels=True)
    assert "Scan ExistingRDD" in explain_str(deep_b, "simple")
    assert {tuple(r) for r in deep_b.collect()} == lazy_b
    deep_s = ta.bpe_train_merges(docs, rounds=4, persist_levels=True)
    assert "Scan ExistingRDD" in explain_str(deep_s, "simple")
    assert {tuple(r) for r in deep_s.collect()} == lazy_s


def test_bpe_batched_depth8_engages_checkpoint_tier(docs):
    """Round-8 regression: 8 persisted BATCHED passes OOM'd an 8 GiB
    driver merely stringifying the doubled plan inside AQE's
    explainString (the batched per-level expressions are M x larger
    than the sequential trainer's, so the old threshold of 8 left the
    worst legal persist-tier depth unrenderable).  With the threshold
    at 6, this depth must run the checkpoint tier: LogicalRDD-rooted
    levels and a plan string that stays small."""
    from mapreduceimpl_spark.operators import text_analysis as ta
    from mapreduceimpl_spark.plans import explain_str

    out = ta.bpe_train_batched(docs, passes=8, max_per_pass=4,
                               persist_levels=True)
    plan = explain_str(out, "simple")
    assert "Scan ExistingRDD" in plan
    assert len(plan) < 2_000_000, len(plan)


def test_bpe_deep_tier_plan_size_linear_in_passes(docs, monkeypatch):
    """Plan-depth regression at high pass counts (VERDICT r7 #4): the
    deep tier's promise is CONSTANT plan size per level (each level
    re-roots as a LogicalRDD), so the analyzed plan of the returned
    merge rows grows ~linearly with passes.  Without the re-root each
    level references the previous twice and 4 extra passes would
    multiply the plan ~2^4 x; linear growth stays under ~2x."""
    from mapreduceimpl_spark.operators import text_analysis as ta
    from mapreduceimpl_spark.plans import explain_str

    monkeypatch.setattr(ta, "BPE_CHECKPOINT_ROUNDS", 3)
    len6 = len(explain_str(
        ta.bpe_train_batched(docs, passes=6, max_per_pass=2,
                             persist_levels=True), "simple"))
    len10 = len(explain_str(
        ta.bpe_train_batched(docs, passes=10, max_per_pass=2,
                             persist_levels=True), "simple"))
    assert len10 < 2 * len6, (len6, len10)


def test_bpe_deep_tier_uses_reliable_checkpoint_when_dir_set(
    docs, monkeypatch, tmp_path
):
    """ADVICE r7: localCheckpoint blocks live only on executors — on
    executor loss the severed lineage cannot recompute and a deep
    training dies.  When the session has a RELIABLE checkpoint dir
    configured, the deep tier must route through checkpoint(eager)
    instead: blocks land in the checkpoint dir (asserted non-empty),
    values stay identical to the lazy path."""
    from mapreduceimpl_spark.operators import text_analysis as ta

    lazy = {
        tuple(r)
        for r in ta.bpe_train_merges(docs, rounds=4, persist_levels=False).collect()
    }
    monkeypatch.setattr(ta, "BPE_CHECKPOINT_ROUNDS", 3)
    sc = docs.sparkSession.sparkContext
    ckpt_dir = str(tmp_path / "bpe_ckpt")
    sc.setCheckpointDir(ckpt_dir)
    try:
        deep = {
            tuple(r)
            for r in ta.bpe_train_merges(
                docs, rounds=4, persist_levels=True
            ).collect()
        }
        written = list((tmp_path / "bpe_ckpt").rglob("*"))
        assert any(p.is_file() for p in written), written
    finally:
        # Option(null) -> None on the Scala side: restores the
        # no-checkpoint-dir default for the shared session
        sc.setCheckpointDir(None)
    assert deep == lazy
    assert sc.getCheckpointDir() is None


def test_bpe_auto_persist_engages_and_bounds_lineage(spark):
    """VERDICT r5 'what's wrong' #1: beyond BPE_AUTO_PERSIST_ROUNDS the
    loop must persist each merge level by default, truncating the
    O(2^rounds) lineage replay — the physical plan of the final merge
    row reads an InMemoryRelation, not a doubled-per-round replay tree.
    The caches out-param hands back every persisted frame (one per-round
    argmax + the final corpus level) so callers can release them
    (ADVICE r5)."""
    from mapreduceimpl_spark.operators import text_analysis as ta
    from mapreduceimpl_spark.plans import explain_str

    docs = spark.createDataFrame(
        [(i, "a a b c d e f g a a") for i in range(8)], ["doc_id", "text"]
    )
    rounds = ta.BPE_AUTO_PERSIST_ROUNDS + 2

    # plan the unpersisted postures FIRST: once the auto run persists
    # its levels, Spark's cache manager substitutes matching fragments
    # into any later plan over the same input, which would contaminate
    # the no-cache assertions
    lazy = ta.bpe_train_merges(docs, rounds=rounds, persist_levels=False)
    lazy_plan = explain_str(lazy, "simple")
    assert "InMemoryTableScan" not in lazy_plan
    # the exponential-replay witness the auto path exists to prevent:
    # each round references the previous level twice (pair count +
    # rewrite), so the unpersisted plan replays the base scan
    # O(2^rounds) times
    assert lazy_plan.count("Scan ExistingRDD") >= 2 ** (rounds - 1)
    # at/below the threshold the default stays the zero-cache path
    small = ta.bpe_train_merges(docs, rounds=ta.BPE_AUTO_PERSIST_ROUNDS)
    assert "InMemoryTableScan" not in explain_str(small, "simple")
    lazy_vals = {tuple(r) for r in lazy.collect()}

    caches: list = []
    auto = ta.bpe_train_merges(docs, rounds=rounds, caches=caches)
    auto_plan = explain_str(auto, "simple")
    assert "InMemoryTableScan" in auto_plan, "auto-persist did not engage"
    # rounds argmax frames + the final persisted level
    assert len(caches) == rounds + 1
    assert all(c.storageLevel.useMemory for c in caches)
    # bounded-lineage proof at the EXECUTION level: every merge row in
    # the returned union reads its round's cached argmax, so the plan
    # hits one InMemoryTableScan per round instead of replaying the
    # uncached level chain.  (Plan-STRING size is not a valid metric
    # here: InMemoryRelation renders its full child tree, so even the
    # persisted plan's rendering is exponential — only execution is
    # bounded.)
    assert auto_plan.count("InMemoryTableScan") >= rounds

    # values identical across postures, and the handles release cleanly
    assert {tuple(r) for r in auto.collect()} == lazy_vals
    for c in caches:
        c.unpersist()
    assert not any(c.storageLevel.useMemory for c in caches)


def test_lm_quality_buckets_thirds_and_policy(spark):
    """Head/middle/tail are per-language thirds by score rank; keep
    drops exactly the tail; docs without a bigram score are absent."""
    from mapreduceimpl_spark.operators.text_analysis import lm_quality_buckets

    rows = [(i, "en", " ".join(["the quick fox"] * (1 + i % 3)) + f" w{i}") for i in range(9)]
    rows.append((99, "en", "solo"))  # 1 token -> no bigram -> absent
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = lm_quality_buckets(docs).collect()
    assert {r["doc_id"] for r in out} == set(range(9))
    buckets = {}
    for r in out:
        buckets.setdefault(r["ppl_bucket"], []).append(r)
    assert {len(buckets["head"]), len(buckets["middle"]), len(buckets["tail"])} == {3}
    assert all(r["keep"] for r in buckets["head"] + buckets["middle"])
    assert not any(r["keep"] for r in buckets["tail"])
    # ranking is by score: every head score <= every tail score
    assert max(r["avg_neg_logprob"] for r in buckets["head"]) <= min(
        r["avg_neg_logprob"] for r in buckets["tail"]
    )


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target split's vocabulary must outscore docs
    with alien vocabulary; selection is a deterministic subset."""
    import pytest

    # ids 0 and 97 land in the default benchmark split (id % 97 == 0)
    rows = [
        (0, "alpha beta gamma delta"),
        (97, "alpha beta gamma epsilon"),
        (1, "alpha beta gamma delta"),   # target-like
        (2, "zeta eta theta iota"),      # alien
        (3, "alpha zeta beta eta"),      # mixed
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    w = {
        r["doc_id"]: r["log_w"]
        for r in text_analysis.dsir_weights(docs, n_buckets=64).collect()
    }
    assert set(w) == {1, 2, 3}  # pool only — split docs are not scored
    assert w[1] > w[3] > w[2]

    sel = text_analysis.dsir_select(docs, k=2, n_buckets=64).collect()
    assert len(sel) == 2
    assert all(r["doc_id"] in w for r in sel)
    again = text_analysis.dsir_select(docs, k=2, n_buckets=64).collect()
    assert [r["doc_id"] for r in sel] == [r["doc_id"] for r in again]

    with pytest.raises(ValueError):
        text_analysis.dsir_weights(docs, n_buckets=1)
    with pytest.raises(ValueError):
        text_analysis.dsir_select(docs, k=0)


def test_dsir_explicit_target_scores_whole_corpus(spark):
    """An explicit target table scores EVERY corpus doc (no carve-out),
    matching the decontamination operators' contract."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "zeta eta")], ["doc_id", "text"]
    )
    target = spark.createDataFrame([(100, "alpha beta gamma")], ["doc_id", "text"])
    w = {
        r["doc_id"]: r["log_w"]
        for r in text_analysis.dsir_weights(docs, target=target, n_buckets=64).collect()
    }
    assert set(w) == {1, 2}
    assert w[1] > w[2]


def test_skipgram_pairs_window_and_edges(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    got = {
        (r["pos"], r["offset"], r["center"], r["context"])
        for r in text_analysis.skipgram_pairs(docs, window=1).collect()
    }
    assert got == {
        (0, 1, "a", "b"),
        (1, -1, "b", "a"),
        (1, 1, "b", "c"),
        (2, -1, "c", "b"),
    }
    with pytest.raises(ValueError):
        text_analysis.skipgram_pairs(docs, window=0)


def test_skipgram_negatives_one_draw_per_pair_from_vocab(spark):
    """Every (pair, j) draw maps into exactly ONE CDF interval (the
    half-open bucket filter can't double-count), negatives come from
    the corpus vocabulary, and the draw set is rerun-stable."""
    docs = spark.createDataFrame(
        [(0, "a a a a b"), (20, "b c c a a")], ["doc_id", "text"]
    )
    out = text_analysis.skipgram_negative_samples(
        docs, window=1, k_neg=2, n_cdf_buckets=8
    ).collect()
    n_pairs = text_analysis.skipgram_pairs(docs, window=1).count()
    assert len(out) == n_pairs * 2  # exactly one negative per draw
    keys = [(r["doc_id"], r["pos"], r["offset"], r["j"]) for r in out]
    assert len(set(keys)) == len(keys)
    assert {r["negative"] for r in out} <= {"a", "b", "c"}
    again = text_analysis.skipgram_negative_samples(
        docs, window=1, k_neg=2, n_cdf_buckets=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_glove_cooccurrence_weights_and_symmetry(spark):
    docs = spark.createDataFrame([(1, "a b c a")], ["doc_id", "text"])
    got = {
        (r["word"], r["context"]): (r["weight"], r["n_pairs"])
        for r in text_analysis.glove_cooccurrence(docs, window=2).collect()
    }
    # tokens a0 b1 c2 a3; within distance 2:
    #   (a,b): a0->b d1 + a3->b d2 = 1.5 over 2 pairs
    #   (a,c): a0->c d2 + a3->c d1 = 1.5 over 2 pairs
    #   (b,c): d1 only = 1.0 over 1 pair; mirrors identical
    assert got[("a", "b")] == (1.5, 2)
    assert got[("b", "a")] == (1.5, 2)
    assert got[("a", "c")] == (1.5, 2)
    assert got[("c", "a")] == (1.5, 2)
    assert got[("b", "c")] == (1.0, 1)
    # symmetry: X_ij == X_ji for every observed pair
    for (w, c), (wt, n) in got.items():
        assert got[(c, w)] == (wt, n)


def test_zipf_law_fit_two_point_slope(spark):
    # vocab {a: 4, b: 2}: ranks (1, 2); slope = (ln2-ln4)/(ln2-ln1) = -1
    docs = spark.createDataFrame(
        [(1, "a a a a b b")], ["doc_id", "text"]
    )
    row = text_analysis.zipf_law_fit(docs).collect()[0]
    assert row["n_vocab"] == 2
    assert row["n_tokens"] == 6
    assert abs(row["slope"] - (-1.0)) < 1e-6
    # round9 quantization of the four products bounds the r2 error at
    # ~1e-8, not machine epsilon
    assert abs(row["r2"] - 1.0) < 1e-7
    # intercept = mean(y) - slope*mean(x) = (ln4+ln2)/2 + (ln1+ln2)/2
    import math

    expect_b = (math.log(4) + math.log(2)) / 2 + (0 + math.log(2)) / 2
    assert abs(row["intercept"] - expect_b) < 1e-6


def test_heaps_law_growth_checkpoints(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (4, "d d")], ["doc_id", "text"]
    )
    got = {
        r["checkpoint"]: (r["cutoff_doc_id"], r["tokens_seen"], r["vocab_size"])
        for r in text_analysis.heaps_law_growth(docs, n_checkpoints=4).collect()
    }
    # max_doc=4, cutoffs 1,2,3,4
    assert got[1] == (1, 2, 2)  # doc1: tokens a,b
    assert got[2] == (2, 4, 3)  # +doc2: c new, a repeat
    assert got[3] == (3, 4, 3)  # no doc3
    assert got[4] == (4, 6, 4)  # +doc4: d new (counted once in vocab)
    with pytest.raises(ValueError):
        text_analysis.heaps_law_growth(docs, n_checkpoints=0)


def test_unigram_kl_identical_slices_zero_kl(spark):
    # same token distribution on both sides -> p == q -> KL == 0
    docs = spark.createDataFrame(
        [(1, "a a b", "en"), (2, "a a b", "fr")],
        ["doc_id", "text", "lang"],
    )
    row = text_analysis.unigram_kl(docs, target="en").collect()[0]
    assert row["target_tokens"] == 3
    assert row["pool_tokens"] == 3
    assert row["vocab_size"] == 2
    assert row["kl_nats"] == 0.0
    assert row["cross_entropy"] == row["target_entropy"]
    # smoothed p = ((2+1)/5, (1+1)/5) -> H(p) = -(0.6 ln 0.6 + 0.4 ln 0.4)
    import math

    expect_h = -(0.6 * math.log(0.6) + 0.4 * math.log(0.4))
    assert abs(row["target_entropy"] - expect_h) < 1e-9


def test_unigram_kl_divergent_slices_positive(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a", "en"), (2, "b b b b", "fr")],
        ["doc_id", "text", "lang"],
    )
    row = text_analysis.unigram_kl(docs, target="en").collect()[0]
    assert row["kl_nats"] > 0.5  # heavily divergent
    # exact identity by construction: kl = cross_entropy - target_entropy
    assert abs(row["kl_nats"] - (row["cross_entropy"] - row["target_entropy"])) < 1e-12


def test_vocab_overlap_jaccard(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en"),
            (2, "b c d", "fr"),
            (3, "x y", "zh"),
        ],
        ["doc_id", "text", "lang"],
    )
    got = {
        (r["grp_a"], r["grp_b"]): (
            r["vocab_a"], r["vocab_b"], r["intersection"], r["jaccard"]
        )
        for r in text_analysis.vocab_overlap(docs).collect()
    }
    # en={a,b,c}, fr={b,c,d}: inter 2, union 4 -> 0.5
    assert got[("en", "fr")] == (3, 3, 2, 0.5)
    # zh shares nothing -> pair omitted
    assert set(got) == {("en", "fr")}


def test_contamination_bloom_no_false_negatives(docs):
    """Bloom guarantee: every doc the exact check flags is a bloom
    candidate, and candidate counts dominate exact counts doc-for-doc."""
    exact = {
        r["doc_id"]: r["n_contaminated"]
        for r in text_analysis.contamination_check(docs).collect()
    }
    bloom = {
        r["doc_id"]: r["n_candidates"]
        for r in text_analysis.contamination_bloom(docs).collect()
    }
    assert set(bloom) == set(exact)  # same corpus split, same coverage
    for doc_id, n_exact in exact.items():
        assert bloom[doc_id] >= n_exact


def test_contamination_bloom_planted_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            (0, bench_text),  # doc_id % 97 == 0 -> benchmark
            (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
            (2, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text_analysis.contamination_bloom(docs).collect()}
    assert 0 not in rows  # benchmark excluded
    # doc 1 embeds exactly one of the benchmark's two 8-grams
    assert rows[1]["maybe_contaminated"] and rows[1]["n_candidates"] == 1
    # with m_bits=65536 and a handful of shingles, no false positives
    assert not rows[2]["maybe_contaminated"]
    # short doc: present with zero shingles
    short = spark.createDataFrame(
        [(0, bench_text), (1, "too short")], ["doc_id", "text"]
    )
    r1 = {r["doc_id"]: r for r in text_analysis.contamination_bloom(short).collect()}
    assert r1[1]["n_ngrams"] == 0 and not r1[1]["maybe_contaminated"]


def test_ngram_novelty_duplicate_vs_unique(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),          # exact dup of 1 -> zero novelty both
            (3, "p q r s t"),        # fully unique -> novelty 1
            (4, "a b c d e"),        # shares 'a b c' with 1/2, adds new
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_novel"], r["novelty"])
        for r in text_analysis.ngram_novelty(docs, n=3).collect()
    }
    assert got[1] == (2, 0, 0.0)          # both trigrams shared with 2 and 4/2
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (3, 3, 1.0)
    # doc 4: trigrams {abc, bcd, cde}: abc df=3, bcd df=3, cde df=1
    assert got[4] == (3, 1, 1 / 3)


def test_gopher_rules_hand_cases(spark):
    """One doc per rule violation + one clean doc; each rejection flips
    exactly its own rule bit."""
    from mapreduceimpl_spark.operators.text_analysis import gopher_rules

    docs = spark.createDataFrame(
        [
            # clean: 8 words, mean len ~3.9, no symbols, all alpha, 3 stopwords
            (0, "the cat sat on the mat tonight friends"),
            # too few words (min_words=5)
            (1, "tiny doc here"),
            # mean word length too high (one 60-char word)
            (2, "a " * 4 + "x" * 60),
            # symbol ratio: 2 of 6 words are #-prefixed
            (3, "#tag #tag the cat is here"),
            # alpha fraction: 3 of 6 words are pure digits
            (4, "12 34 56 the cat sat"),
            # stopwords: 6 words, zero stopword hits
            (5, "cats dogs birds fish mice deer"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[0]["keep"]
    assert all(
        got[0][c]
        for c in ("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
                  "rule_alpha_frac", "rule_stopwords")
    )
    assert not got[1]["rule_word_count"] and not got[1]["keep"]
    assert not got[2]["rule_mean_word_len"] and not got[2]["keep"]
    assert not got[3]["rule_symbol_ratio"] and not got[3]["keep"]
    assert not got[4]["rule_alpha_frac"] and not got[4]["keep"]
    assert not got[5]["rule_stopwords"] and not got[5]["keep"]
    # the single-failure docs still pass every OTHER rule
    assert got[1]["rule_mean_word_len"] and got[1]["rule_alpha_frac"]
    assert got[3]["rule_word_count"] and got[3]["rule_stopwords"]


def test_langid_eval_hand_case(spark):
    """Two labeled langs, one doc misdetected as 'und': the matrix rows
    normalize to 1 and the cells match a hand count."""
    from mapreduceimpl_spark.operators.text_analysis import LANG_MARKERS, langid_eval

    en_marker = LANG_MARKERS["en"][0]
    docs = spark.createDataFrame(
        [
            (1, f"{en_marker} aaa bbb", "en"),     # detected en
            (2, f"{en_marker} ccc ddd", "en"),     # detected en
            (3, "zzz yyy xxx", "en"),              # no markers -> und
            (4, f"{en_marker} eee", "xx"),         # xx labeled, en detected
        ],
        ["doc_id", "text", "lang"],
    )
    got = {(r["true_lang"], r["pred_lang"]): (r["n"], r["frac_of_true"])
           for r in langid_eval(docs).collect()}
    import math
    third = math.floor(1 / 3 * 1e9 + 0.5) / 1e9
    assert got[("en", "en")] == (2, math.floor(2 / 3 * 1e9 + 0.5) / 1e9)
    assert got[("en", "und")] == (1, third)
    assert got[("xx", "en")] == (1, 1.0)
    # each true_lang row sums to ~1
    rows = {}
    for (t, _p), (_n, f) in got.items():
        rows[t] = rows.get(t, 0.0) + f
    assert all(abs(v - 1.0) < 1e-6 for v in rows.values())


def test_vocab_keyness_separates_planted_markers(spark):
    """Tokens exclusive to the en stratum surface with positive z,
    exclusive rest-tokens with negative z; a perfectly balanced token
    scores |z| below both."""
    from mapreduceimpl_spark.operators.text_analysis import vocab_keyness

    docs = spark.createDataFrame(
        [(i, "hello common word " + ("alpha " * 5).strip(), "en") for i in range(10)]
        + [(100 + i, "bonjour common word " + ("beta " * 5).strip(), "fr")
           for i in range(10)],
        ["doc_id", "text", "lang"],
    )
    rows = vocab_keyness(docs, target_lang="en", k=10).collect()
    z = {r["token"]: r["z"] for r in rows}
    assert z["alpha"] > 0 and z["hello"] > 0
    assert z["beta"] < 0 and z["bonjour"] < 0
    assert abs(z["alpha"]) > abs(z["hello"])  # more evidence -> larger |z|
    if "common" in z:
        assert abs(z["common"]) < abs(z["hello"])
    # ranking is by |z| desc
    zs = [abs(r["z"]) for r in rows]
    assert zs == sorted(zs, reverse=True)

    import pytest

    with pytest.raises(ValueError):
        vocab_keyness(docs, k=0)


def test_token_gini_uniform_vs_skewed(spark):
    """A stratum where every type has equal count ginis to exactly 0;
    a head-dominated stratum is strictly positive and matches the
    hand-computed ranked-weighted-sum formula."""
    from mapreduceimpl_spark.operators.text_analysis import token_gini

    docs = spark.createDataFrame(
        # uniform: 4 types x 3 occurrences each
        [(i, "a b c d", "uni") for i in range(3)]
        # skewed: counts a=9, b=2, c=1
        + [(10 + i, "a a a", "skew") for i in range(3)]
        + [(20, "b b c", "skew")],
        ["doc_id", "text", "lang"],
    )
    got = {r["lang"]: r for r in token_gini(docs).collect()}

    u = got["uni"]
    assert (u["v"], u["n_tokens"]) == (4, 12)
    assert u["gini"] == 0.0

    s = got["skew"]
    assert (s["v"], s["n_tokens"]) == (3, 12)
    # ranks asc by (count, token): c=1 i=1, b=2 i=2, a=9 i=3
    # G = 2*(1*1 + 2*2 + 3*9)/(3*12) - 4/3 = 64/36 - 48/36 = 16/36
    assert s["gini"] == round(16 / 36, 9)


def test_rouge_n_eval_hand_case(spark):
    """One pair with hand-computable overlaps: ref 'a b a c',
    cand 'a b a b'.  ROUGE-1 multiset overlap: min counts a=2, b=1,
    c=0 -> o=3, P=3/4, R=3/4, F1=0.75.  ROUGE-2: ref bigrams
    {ab, ba, ac}, cand {ab, ba, ab} -> overlap ab=1, ba=1 -> o=2,
    P=2/3, R=2/3, F1=2/3."""
    from mapreduceimpl_spark.operators.text_analysis import rouge_n_eval

    pairs = spark.createDataFrame(
        [(1, "en", "a b a c", "a b a b")],
        ["pair_id", "lang", "ref_text", "cand_text"],
    )
    got = {r["n"]: r for r in rouge_n_eval(pairs).collect()}
    r1, r2 = got[1], got[2]
    assert (r1["micro_p"], r1["micro_r"], r1["micro_f1"]) == (0.75, 0.75, 0.75)
    assert r1["macro_f1"] == 0.75
    assert r2["micro_p"] == 2 / 3 and r2["micro_r"] == 2 / 3
    assert abs(r2["macro_f1"] - round(2 / 3, 6)) < 1e-9
    assert r1["n_pairs"] == r2["n_pairs"] == 1


def test_rouge_n_eval_disjoint_and_short(spark):
    """Disjoint texts score 0 everywhere; a 1-token pair has no
    bigrams -> ROUGE-2 is 0 with zero totals, not an error; identical
    texts score exactly 1."""
    from mapreduceimpl_spark.operators.text_analysis import rouge_n_eval
    import pytest

    pairs = spark.createDataFrame(
        [
            (1, "en", "x y z", "p q r"),      # disjoint
            (2, "fr", "w", "w"),              # identical, 1 token
            (3, "de", "a b c", "a b c"),      # identical
        ],
        ["pair_id", "lang", "ref_text", "cand_text"],
    )
    got = {(r["lang"], r["n"]): r for r in rouge_n_eval(pairs).collect()}
    assert got[("en", 1)]["micro_f1"] == 0.0
    assert got[("en", 2)]["micro_f1"] == 0.0
    assert got[("fr", 1)]["micro_f1"] == 1.0
    assert got[("fr", 2)]["micro_f1"] == 0.0  # no bigrams at all
    assert got[("de", 2)]["micro_f1"] == 1.0 and got[("de", 2)]["macro_f1"] == 1.0

    with pytest.raises(ValueError):
        rouge_n_eval(pairs, ns=())
    with pytest.raises(ValueError):
        rouge_n_eval(pairs, ns=(0,))


def test_bpe_fertility_hand_case(spark):
    """Corpus where round-1 learns the merge (a, b): docs 'a b' twice
    in en, 'c d e' once in fr.  After 1 round each en doc collapses to
    one merged symbol — en: 4 words -> 2 symbols, fertility 0.5,
    merged_frac 1.0; fr untouched: fertility 1.0, merged_frac 0.0."""
    from mapreduceimpl_spark.operators.text_analysis import bpe_fertility

    docs = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a b", "en"), (3, "c d e", "fr")],
        ["doc_id", "text", "lang"],
    )
    got = {r["lang"]: r for r in bpe_fertility(docs, rounds=1).collect()}
    en, fr = got["en"], got["fr"]
    assert (en["n_docs"], en["sum_words"], en["sum_symbols"]) == (2, 4, 2)
    assert en["fertility"] == 0.5 and en["merged_frac"] == 1.0
    assert en["sum_chars"] == 6  # 'a b' is 3 chars, twice
    assert en["chars_per_symbol"] == 3.0
    assert (fr["sum_words"], fr["sum_symbols"]) == (3, 3)
    assert fr["fertility"] == 1.0 and fr["merged_frac"] == 0.0


def test_heldout_perplexity_oov_and_floors(spark):
    """Force the split with a corpus large enough that both sides are
    non-empty, then verify: every test pair gets a finite lp (the
    Laplace floor), OOV rate counts exactly the test tokens absent
    from the train vocabulary, and test_frac is validated."""
    from mapreduceimpl_spark.operators.text_analysis import heldout_perplexity
    import pytest

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat", "en") for i in range(40)]
        + [(100 + i, "wholly novel tokens here", "en") for i in range(10)],
        ["doc_id", "text", "lang"],
    )
    rows = heldout_perplexity(docs, test_frac=0.3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_scored_docs"] > 0 and r["n_pairs"] > 0
    # avg_neg_logprob is finite and positive (probabilities < 1)
    assert r["avg_neg_logprob"] > 0
    assert 0.0 <= r["oov_rate"] <= 1.0

    with pytest.raises(ValueError):
        heldout_perplexity(docs, test_frac=0.0)
    with pytest.raises(ValueError):
        heldout_perplexity(docs, test_frac=1.0)


def test_fim_render_reconstructs_and_bounds(spark):
    """The three rendered parts re-concatenate to the original token
    sequence (order PSM -> prefix+middle+suffix = doc); cut points
    honor 0 <= a <= b <= n."""
    from mapreduceimpl_spark.operators.text_analysis import fim_render

    docs = spark.createDataFrame(
        [(i, "t%d " % i * 5 % i if False else "alpha beta gamma delta epsilon")
         for i in range(20)],
        ["doc_id", "text"],
    )
    rows = fim_render(docs).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["cut_a"] <= r["cut_b"] <= r["n_tokens"] == 5
        body = r["fim_text"]
        assert body.startswith("<PRE> ")
        pre, rest = body[len("<PRE> "):].split(" <SUF> ", 1)
        suf, mid = rest.split(" <MID> ", 1)
        reassembled = " ".join(x for x in (pre, mid, suf) if x)
        assert reassembled == "alpha beta gamma delta epsilon"
    # cut diversity: not all docs split at the same points
    assert len({(r["cut_a"], r["cut_b"]) for r in rows}) > 3


def test_code_detect_separates_code_from_prose(spark):
    """A code-shaped doc (braces, semicolon line ends, indented block)
    flags is_code; plain prose does not; ratios are exact."""
    from mapreduceimpl_spark.operators.text_analysis import code_detect

    code = "int main() {\n  int x = 1;\n  return x;\n}"
    prose = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, code), (2, prose)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in code_detect(docs).collect()}
    c, p = got[1], got[2]
    assert c["is_code"] and not p["is_code"]
    assert c["symbol_ratio"] > 0.03 and p["n_symbols"] == 0
    # 4 lines, 2 start with two spaces, 2 end with ';'
    assert c["indent_ratio"] == 0.5 and c["semicolon_rate"] == 0.5
    assert p["symbol_ratio"] == 0.0


def test_curriculum_phases_orders_by_difficulty(spark):
    """Common-word docs land in phase 1, rare-word docs in phase 3;
    phases partition the corpus; mean difficulty is monotone in
    phase; n_phases != 3 is rejected."""
    import pytest

    from mapreduceimpl_spark.operators.text_analysis import curriculum_phases

    docs = spark.createDataFrame(
        # easy: the same common words everywhere
        [(i, "the the the common common") for i in range(12)]
        # medium: half common, half unique
        + [(100 + i, "the common unique%d token%d" % (i, i)) for i in range(12)]
        # hard: all-unique vocabulary
        + [(200 + i, "zz%d qq%d ww%d vv%d" % (i, i, i, i)) for i in range(12)],
        ["doc_id", "text"],
    )
    rows = curriculum_phases(docs).collect()
    got = {r["phase"]: r for r in rows}
    assert set(got) == {1, 2, 3}
    assert sum(r["n_docs"] for r in rows) == 36
    assert got[1]["mean_difficulty"] < got[2]["mean_difficulty"] < got[3]["mean_difficulty"]
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-9

    with pytest.raises(ValueError):
        curriculum_phases(docs, n_phases=4)


def test_effective_domains_hand_cases(spark):
    """A uniform 4-source stratum has exactly 4.0 effective sources;
    a heavily skewed one reports far fewer than its distinct count;
    a single-source stratum reports exactly 1.0."""
    from mapreduceimpl_spark.operators.text_analysis import effective_domains

    rows = (
        [(i, "t", "uni", "s%d" % (i % 4)) for i in range(40)]
        + [(100 + i, "t", "skew", "big" if i < 37 else "s%d" % i) for i in range(40)]
        + [(200 + i, "t", "mono", "only") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    got = {r["lang"]: r for r in effective_domains(docs).collect()}
    assert got["uni"]["n_sources"] == 4
    assert got["uni"]["effective_sources"] == 4.0
    assert got["mono"]["effective_sources"] == 1.0 and got["mono"]["entropy"] == 0.0
    assert got["skew"]["n_sources"] == 4
    assert got["skew"]["effective_sources"] < 2.0


def test_feature_hashing_hand_computed(spark):
    """Signed hashing-trick vectors recomputed token-by-token with the
    same md5 lanes: buckets, signs, and weights all exact; repeated
    tokens accumulate; empty tokens dropped."""
    from mapreduceimpl_spark.operators.text_analysis import feature_hashing

    docs = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "dog")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in feature_hashing(docs, dim=8).collect()
    }
    import hashlib

    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want: dict = {}
    for doc_id, text in [(0, "cat cat dog"), (1, "dog")]:
        for t in text.split(" "):
            b = md5int(f"fh:{t}") % 8
            s = 1 if md5int(f"fhs:{t}") % 2 == 0 else -1
            want[(doc_id, b)] = want.get((doc_id, b), 0) + s
    assert got == want


def test_feature_hashing_partition_invariant_and_validates(spark, docs):
    from mapreduceimpl_spark.operators.text_analysis import feature_hashing

    a = {tuple(r) for r in feature_hashing(docs.coalesce(1), dim=16).collect()}
    b = {tuple(r) for r in feature_hashing(docs.repartition(7), dim=16).collect()}
    assert a == b and len(a) > 0
    import pytest

    with pytest.raises(ValueError):
        feature_hashing(docs, dim=0)


def test_fh_cosine_topk_self_retrieval_and_shape(spark, docs):
    """Retrieval sanity over the hashed vectors: every query's rank-1
    hit is itself at cosine 1.0 (exact — integer dot over its own
    norm squared), ranks are 1..k dense per query, and scores are
    non-increasing down each ranked list."""
    from mapreduceimpl_spark.operators.text_analysis import fh_cosine_topk

    rows = fh_cosine_topk(docs, n_queries=5, k=4).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, lst in by_q.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        assert lst[0]["doc_id"] == qid and lst[0]["cosine"] == 1.0
        scores = [r["cosine"] for r in lst]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_fh_cosine_topk_corpus_not_shuffled_for_join(spark, docs):
    """The query side must broadcast onto the corpus vectors: the
    bucket join plans as a BroadcastHashJoin, never a SortMergeJoin
    shuffling the corpus."""
    from mapreduceimpl_spark.operators.text_analysis import fh_cosine_topk
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(fh_cosine_topk(docs), "simple")
    assert "BroadcastHashJoin" in plan


def test_chunk_retrieval_maxp_matches_duckdb_oracle(spark, docs):
    """Staged round-10 entry, pre-verified at fixture scale with the
    driver-equivalent compare: the full chunk -> hash-embed -> cosine
    -> MaxP -> rank plan equals its composed SQL replay value-exactly."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        chunk_retrieval_maxp,
        chunk_retrieval_maxp_sql,
    )
    from tools.check_oracle import compare

    sdf = chunk_retrieval_maxp(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(chunk_retrieval_maxp_sql()).fetchdf()
    con.close()
    problems = compare("chunk_retrieval_maxp", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_chunk_retrieval_maxp_invariants(spark, docs):
    """MaxP semantics: dense 1..k ranks per query, never the query's
    own document, scores non-increasing down each list and within
    [-1, 1]."""
    from mapreduceimpl_spark.operators.text_analysis import chunk_retrieval_maxp

    rows = chunk_retrieval_maxp(docs, n_queries=4, k=3).collect()
    by_q: dict = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        assert -1.0 <= r["score"] <= 1.0
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for lst in by_q.values():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        scores = [r["score"] for r in lst]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_feature_hashing_and_maxp_parity_on_hostile_text(spark, tmp_path):
    """Engine parity for the round-9/10 SQL generators beyond the
    fixture: control characters (incl. U+0001), unicode, repeated
    runs, and a null text must hash and chunk identically in Spark
    and DuckDB (md5 operates on the same UTF-8 bytes in both)."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        chunk_retrieval_maxp,
        chunk_retrieval_maxp_sql,
        feature_hashing,
        feature_hashing_sql,
    )
    from tools.check_oracle import compare

    texts = [
        "spark sparks park parks",
        "a\x01b a\x01b \x01\x01 héllo héllo",
        ("tok" + "e" * 40 + " ") * 30 + "tail",  # long tokens, many chunks
        None,
        "ünïcode ünïcode 中文 中文 emoji🙂 emoji🙂",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    for name, sdf, sql in (
        ("feature_hashing", feature_hashing(docs, dim=16),
         feature_hashing_sql(dim=16)),
        ("chunk_retrieval_maxp",
         chunk_retrieval_maxp(docs, n_queries=3, k=4, chunk_tokens=8, overlap=2),
         chunk_retrieval_maxp_sql(n_queries=3, k=4, chunk_tokens=8, overlap=2)),
    ):
        problems = compare(name, sdf.toPandas(), con.execute(sql).fetchdf())
        assert not problems, (name, problems)
    con.close()


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram scoring (staged round 11)
# ---------------------------------------------------------------------------


def test_kneser_ney_matches_duckdb_oracle(spark, docs):
    """Staged round-11 entry, driver-equivalent compare on the
    fixture corpus: the KN plan equals its SQL replay value-exactly."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        kneser_ney_bigram,
        kneser_ney_sql,
    )
    from tools.check_oracle import compare

    sdf = kneser_ney_bigram(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(kneser_ney_sql()).fetchdf()
    con.close()
    problems = compare("kneser_ney_bigram", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_kneser_ney_oracle_parity_on_hostile_text(spark, tmp_path):
    """Beyond the fixture: control chars, unicode, repeated runs and
    a single-token doc (must be ABSENT from output) replay exactly."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        kneser_ney_bigram,
        kneser_ney_sql,
    )
    from tools.check_oracle import compare

    rows = [
        (0, "a b a b a c"),
        (1, "a\x01b a\x01b héllo a\x01b"),
        (2, "single"),
        (3, "b b b b"),
        (4, "héllo a b c a b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    sdf = kneser_ney_bigram(docs).toPandas()
    assert 2 not in set(sdf["doc_id"])  # < 2 tokens: unscoreable
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    odf = con.execute(kneser_ney_sql()).fetchdf()
    con.close()
    problems = compare("kneser_ney_bigram", sdf, odf)
    assert not problems, problems


def test_kneser_ney_is_a_proper_distribution(spark):
    """KN's defining algebra on a tiny enumerable corpus: for every
    observed context, the discounted mass plus the backoff mass over
    the WHOLE vocabulary sums to exactly 1 (the absolute-discount
    bookkeeping), and the operator's per-doc score equals a pure
    Python replay of the same formula."""
    import math
    from collections import Counter

    from mapreduceimpl_spark.operators.text_analysis import (
        KN_DISCOUNT,
        kneser_ney_bigram,
    )

    texts = {0: "the cat sat on the mat", 1: "the cat ate the rat", 2: "a cat"}
    docs = spark.createDataFrame(
        list(texts.items()), ["doc_id", "text"]
    )
    pairs = [
        (w[i], w[i + 1])
        for w in (t.split(" ") for t in texts.values())
        for i in range(len(w) - 1)
    ]
    bi = Counter(pairs)
    cprev = Counter(p for p, _ in pairs)
    n1p = Counter(p for p, _ in set(pairs))
    n1c = Counter(c for _, c in set(pairs))
    n_types = len(set(pairs))
    vocab = {t for pc in pairs for t in pc}
    D = KN_DISCOUNT

    def p_kn(prev, cur):
        disc = (bi[(prev, cur)] - D) / cprev[prev] if bi[(prev, cur)] else 0.0
        return disc + (D * n1p[prev]) / cprev[prev] * (n1c[cur] / n_types)

    for prev in cprev:
        total = sum(p_kn(prev, cur) for cur in vocab)
        assert math.isclose(total, 1.0, rel_tol=1e-12), (prev, total)

    got = {r["doc_id"]: r for r in kneser_ney_bigram(docs).collect()}
    for doc_id, text in texts.items():
        w = text.split(" ")
        lps = [
            round(math.log(p_kn(w[i], w[i + 1])), 9) for i in range(len(w) - 1)
        ]
        assert got[doc_id]["n_pairs"] == len(lps)
        expect = round(-math.fsum(lps) / len(lps), 6)
        assert math.isclose(
            got[doc_id]["avg_neg_logprob"], expect, abs_tol=2e-6
        ), (doc_id, got[doc_id]["avg_neg_logprob"], expect)


# ---------------------------------------------------------------------------
# Good-Turing unseen mass (staged round 11)
# ---------------------------------------------------------------------------


def test_good_turing_matches_duckdb_oracle(spark, docs):
    """Staged round-11 entry, driver-equivalent compare."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        good_turing_mass,
        good_turing_sql,
    )
    from tools.check_oracle import compare

    sdf = good_turing_mass(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(good_turing_sql()).fetchdf()
    con.close()
    problems = compare("good_turing_mass", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_good_turing_estimator_definition(spark):
    """The estimator on an enumerable corpus: counts, singleton mass
    and r*(1) are exactly the textbook quantities; a singleton-free
    stratum reports NULL r_star_1 (undefined regime, not 0)."""
    from mapreduceimpl_spark.operators.text_analysis import good_turing_mass

    rows = {
        r["lang"]: r
        for r in good_turing_mass(
            spark.createDataFrame(
                [
                    (1, "aa", "x x y y z w"),  # z,w singletons; x,y doubles
                    (2, "bb", "p p q q"),      # no singletons
                ],
                ["doc_id", "lang", "text"],
            )
        ).collect()
    }
    a = rows["aa"]
    assert (a["n_tokens"], a["n_types"], a["n1"], a["n2"]) == (6, 4, 2, 2)
    assert a["unseen_mass"] == round(2 / 6, 6)
    assert a["r_star_1"] == round(2.0 * 2 / 2, 6)
    b = rows["bb"]
    assert (b["n1"], b["r_star_1"]) == (0, None)
    assert b["unseen_mass"] == 0.0


# ---------------------------------------------------------------------------
# readability: Flesch reading ease / FK grade (staged round 12)
# ---------------------------------------------------------------------------


def test_readability_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare on the fixture corpus."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        readability_scores,
        readability_sql,
    )
    from tools.check_oracle import compare

    sdf = readability_scores(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(readability_sql()).fetchdf()
    con.close()
    problems = compare("readability_scores", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_readability_formula_hand_computed(spark):
    """Hand-checkable corpus: 'The cat sat. The dog ran.' = 6 words,
    2 sentences, 6 one-vowel-group words -> FRE and grade from the
    published constants in the operator's fixed order."""
    docs = spark.createDataFrame(
        [(0, "The cat sat. The dog ran.", "en")], ["doc_id", "text", "lang"]
    )
    from mapreduceimpl_spark.operators.text_analysis import readability_scores

    row = readability_scores(docs).collect()[0]
    assert (row["n_words"], row["n_sentences"], row["n_syllables"]) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert row["flesch_re"] == round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    assert row["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 4)


def test_readability_oracle_parity_on_hostile_text(spark, tmp_path):
    """Beyond the fixture: uppercase, double spaces, punctuation runs,
    a no-vowel token, an empty doc and a single-word doc replay
    exactly (the per-word and per-doc clamps on both engines)."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        readability_scores,
        readability_sql,
    )
    from tools.check_oracle import compare

    rows = [
        (0, "SHOUTING TEXT!!! with   runs... of? punctuation", "en"),
        (1, "", "en"),
        (2, "word", "fr"),
        (3, "xyz qqq zzz", "fr"),
        (4, "rhythm myth gym", "de"),
        (5, "a. b! c? d", "de"),
        # a NULL text is a counted doc on BOTH engines: the greatest
        # clamps give w=1, s=1 and the coalesced/sum-skipped syllable
        # term gives 0
        (6, None, "zh"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    sdf = readability_scores(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    odf = con.execute(readability_sql()).fetchdf()
    con.close()
    problems = compare("readability_scores", sdf, odf)
    assert not problems, problems
    # the empty doc clamps: 1 word, 1 sentence, 0 syllables
    en = sdf[sdf.lang == "en"].iloc[0]
    assert en["n_sentences"] == 3 + 1  # '!!!' '...' '?' runs + empty doc clamp


def test_readability_plan_shape(spark, docs):
    """Staged plan pin: scalar expressions + ONE aggregate — no join
    at all in the plan."""
    from mapreduceimpl_spark.operators.text_analysis import readability_scores
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(readability_scores(docs), "simple")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# winnowing density eval (staged round 12/13)
# ---------------------------------------------------------------------------


def test_winnow_density_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare on the fixture corpus."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        winnow_density_eval,
        winnow_density_sql,
    )
    from tools.check_oracle import compare

    sdf = winnow_density_eval(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(winnow_density_sql()).fetchdf()
    con.close()
    problems = compare("winnow_density_eval", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_winnow_density_near_analytic_on_fixture(spark, docs):
    """The SIGMOD'03 theorem: expected density 2/(w+1) for random
    hashes. md5 over the fixture shingles behaves near-randomly, so
    every language lands within a few percent of 0.4 (slightly BELOW:
    repeated shingles in the small-vocab fixture compress the
    selected set, the effect the entry exists to measure)."""
    from mapreduceimpl_spark.operators.text_analysis import winnow_density_eval

    rows = winnow_density_eval(docs).collect()
    assert rows
    for r in rows:
        assert 0.3 <= r["density"] <= 0.45, (r["lang"], r["density"])
        assert r["analytic_density"] == 0.4
        # selection can never exceed one position per window nor the
        # position count
        assert r["n_selected"] <= r["n_windows"] <= r["n_positions"]


def test_winnow_density_rightmost_tie_rule(spark):
    """A constant-token doc: every shingle hash is identical, so every
    window selects its RIGHTMOST position (robust winnowing's rule) —
    n_selected == n_windows (each window end is selected)."""
    from mapreduceimpl_spark.operators.text_analysis import winnow_density_eval

    docs = spark.createDataFrame(
        [(0, " ".join(["tok"] * 12), "en")], ["doc_id", "text", "lang"]
    )
    row = winnow_density_eval(docs).collect()[0]
    # 12 tokens, k=5 -> 8 positions, window=4 -> 5 windows; all hashes
    # equal -> rightmost = window end, 5 distinct selections
    assert (row["n_positions"], row["n_windows"], row["n_selected"]) == (8, 5, 5)
    # ... but the fingerprint INDEX stores one hash (review r10: the
    # two densities move in opposite directions under repetition —
    # position density 0.625 > 2/(w+1)=0.4, hash density 0.125 < 0.4)
    assert row["n_selected_hashes"] == 1
    assert row["density"] > row["analytic_density"] > row["hash_density"]


def test_winnow_density_plan_shape(spark, docs):
    """Staged plan pin: one doc-partitioned window pass feeding one
    per-doc aggregate — NO join in the plan at all (positions, windows
    and selections come out of the same pass)."""
    from mapreduceimpl_spark.operators.text_analysis import winnow_density_eval
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(winnow_density_eval(docs), "simple")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Katz backoff bigram (staged round 13)
# ---------------------------------------------------------------------------


def test_katz_backoff_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare on the fixture corpus."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        katz_backoff_bigram,
        katz_backoff_sql,
    )
    from tools.check_oracle import compare

    sdf = katz_backoff_bigram(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(katz_backoff_sql()).fetchdf()
    con.close()
    problems = compare("katz_backoff_bigram", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_katz_backoff_oracle_parity_on_hostile_text(spark, tmp_path):
    """Control chars, unicode, repeated runs and a single-token doc
    (absent from output) replay exactly — the KN hostile fixture."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        katz_backoff_bigram,
        katz_backoff_sql,
    )
    from tools.check_oracle import compare

    rows = [
        (0, "a b a b a c"),
        (1, "a\x01b a\x01b héllo a\x01b"),
        (2, "single"),
        (3, "b b b b"),
        (4, "héllo a b c a b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sdf = katz_backoff_bigram(docs).toPandas()
    assert 2 not in set(sdf["doc_id"])  # < 2 tokens: unscoreable
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    odf = con.execute(katz_backoff_sql()).fetchdf()
    con.close()
    problems = compare("katz_backoff_hostile", sdf, odf)
    assert not problems, problems


def test_katz_backoff_against_pure_python_reference(spark):
    """A seeded random corpus scored by an independent pure-Python
    Katz implementation (textbook formulas, no Spark/SQL in sight)
    must reproduce every per-doc mean to 1e-6 — the same
    randomized-reference harness as label_propagation/readability."""
    import math
    import random
    from collections import Counter

    from mapreduceimpl_spark.operators.text_analysis import (
        KATZ_K,
        katz_backoff_bigram,
    )

    rng = random.Random(1113)
    vocab = [f"w{i}" for i in range(12)]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))))
        for i in range(25)
    ]

    pairs_by_doc = {
        i: [
            (toks[j], toks[j + 1])
            for j in range(len(toks) - 1)
        ]
        for i, text in corpus
        for toks in [text.split(" ")]
        if len(toks) >= 2
    }
    all_pairs = [p for ps in pairs_by_doc.values() for p in ps]
    bi = Counter(all_pairs)
    cprev = Counter(p for p, _ in all_pairs)
    coc = Counter(bi.values())
    k = KATZ_K
    n = {c: coc.get(c, 0) for c in range(1, k + 2)}

    def d_of(c: int) -> float:
        if c > k:
            return 1.0
        if n[1] == 0 or n[c] == 0 or n[c + 1] == 0:
            return 1.0
        a = (k + 1.0) * n[k + 1] / n[1]
        if a >= 1.0:
            return 1.0
        raw = ((c + 1.0) * n[c + 1] / (float(c) * n[c]) - a) / (1.0 - a)
        return 1.0 if (raw <= 0.0 or raw > 1.0) else raw

    want = {}
    for i, ps in pairs_by_doc.items():
        lps = [
            round(math.log(d_of(bi[p]) * (bi[p] / cprev[p[0]])), 9)
            for p in ps
        ]
        want[i] = (len(ps), round(-sum(lps) / len(lps), 6))

    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_neg_logprob"])
        for r in katz_backoff_bigram(
            spark.createDataFrame(corpus, ["doc_id", "text"])
        ).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) <= 1e-6, (i, got[i], want[i])


def test_katz_discount_is_a_true_discount_on_fixture(spark, docs):
    """On the real corpus the Katz score can only DISCOUNT seen-bigram
    probabilities, so every doc's Katz mean neg-logprob >= its raw-ML
    mean (d_c <= 1 after the degenerate-regime fallbacks) — and the
    two models agree on n_pairs."""
    import pyspark.sql.functions as F
    from mapreduceimpl_spark.operators.text_analysis import (
        katz_backoff_bigram,
    )
    from mapreduceimpl_spark.operators.text_analysis import (
        tokens as _tokens,
    )

    katz = {
        r["doc_id"]: (r["n_pairs"], r["avg_neg_logprob"])
        for r in katz_backoff_bigram(docs).collect()
    }
    # raw-ML sibling: same pipeline with d_c == 1 (log(c/cprev))
    from mapreduceimpl_spark.operators.text_analysis import (
        _avg_neg_logprob_tail,
        adjacent_pairs,
    )

    pre = docs.select("doc_id", _tokens("text").alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    pairs = pre.select("doc_id", adjacent_pairs().alias("pc")).select(
        "doc_id", "pc.prev", "pc.cur"
    )
    bi = pairs.groupBy("prev", "cur").agg(F.count("*").alias("cnt_pc"))
    cprev = pairs.groupBy("prev").agg(F.count("*").alias("cnt_prev"))
    scored = (
        pairs.join(bi, ["prev", "cur"])
        .join(cprev, "prev")
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.col("cnt_pc").cast("double")
                    / F.col("cnt_prev").cast("double")
                ),
                9,
            ).alias("lp"),
        )
    )
    ml = {
        r["doc_id"]: (r["n_pairs"], r["avg_neg_logprob"])
        for r in _avg_neg_logprob_tail(scored, 9).collect()
    }
    assert set(katz) == set(ml)
    for d in katz:
        assert katz[d][0] == ml[d][0]
        assert katz[d][1] >= ml[d][1] - 1e-9, (d, katz[d], ml[d])


# ---------------------------------------------------------------------------
# bigram draft acceptance (staged round 13)
# ---------------------------------------------------------------------------


def test_ngram_draft_acceptance_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare on the fixture corpus."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        ngram_draft_acceptance,
        ngram_draft_acceptance_sql,
    )
    from tools.check_oracle import compare

    sdf = ngram_draft_acceptance(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(ngram_draft_acceptance_sql()).fetchdf()
    con.close()
    problems = compare("ngram_draft_acceptance", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_ngram_draft_acceptance_semantics(spark):
    """Enumerable corpus: the argmax table, the tie rule and the
    banding are exactly the documented ones."""
    from mapreduceimpl_spark.operators.text_analysis import (
        ngram_draft_acceptance,
    )

    # lang 'aa': pairs (a,b) x2, (b,a) x2, (a,c) x1
    #   draft(a) = b (2 > 1), draft(b) = a
    #   positions with prev=a: 3 (2 accepted), prev=b: 2 (2 accepted)
    #   all contexts have cnt_prev < 10 -> band '1-9'; rate 4/5
    # lang 'tt': "x y x z" -> draft(x) = y (tie 1,1 -> smallest 'y');
    #   prev-x positions: 2, accepted 1; prev-y: 1 accepted 1 (y->x)
    #   wait: pairs are (x,y), (y,x), (x,z): draft(y)=x -> accepted;
    #   total 3 positions, accepted = (x,y):1 + (y,x):1 = 2
    rows = [
        (1, "aa", "a b a b a c"),
        (2, "tt", "x y x z"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {
        (r["lang"], r["band"]): (
            r["n_positions"],
            r["n_accepted"],
            r["acceptance_rate"],
        )
        for r in ngram_draft_acceptance(docs).collect()
    }
    assert got == {
        ("aa", "1-9"): (5, 4, round(4 / 5, 6)),
        ("tt", "1-9"): (3, 2, round(2 / 3, 6)),
    }


# ---------------------------------------------------------------------------
# Moore-Lewis cross-entropy data selection (staged round 14)
# ---------------------------------------------------------------------------


def test_cross_entropy_selection_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare on the fixture corpus."""
    import duckdb

    from mapreduceimpl_spark.operators.text_analysis import (
        cross_entropy_selection,
        cross_entropy_selection_sql,
    )
    from tools.check_oracle import compare

    sdf = cross_entropy_selection(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(cross_entropy_selection_sql()).fetchdf()
    con.close()
    problems = compare("cross_entropy_selection", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_cross_entropy_selection_semantics(spark):
    """Enumerable corpus: add-one model probabilities, the rounded log
    difference, and the decile order are exactly the documented ones."""
    import math

    from mapreduceimpl_spark.operators.text_analysis import (
        cross_entropy_selection,
    )

    rows = [
        (1, "src1", "aa aa"),
        (2, "src9", "bb bb"),
        (3, "src9", "aa bb"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["ml_score"], r["decile"])
        for r in cross_entropy_selection(docs).collect()
    }
    # c_gen: aa=3, bb=3; c_in: aa=2, bb=0; N_gen=6, N_in=2, V=2
    lp_aa = round(math.log(3 / 4) - math.log(4 / 8), 9)   # ln 1.5
    lp_bb = round(math.log(1 / 4) - math.log(4 / 8), 9)   # ln 0.5
    assert got[1] == (2, round(lp_aa, 6), 1)
    assert got[2] == (2, round(lp_bb, 6), 3)
    assert got[3] == (2, round((lp_aa + lp_bb) / 2, 6), 2)
    # the in-domain doc outranks the general one
    assert got[1][1] > got[3][1] > got[2][1]


# ---------------------------------------------------------------------------
# Katz model relations + per-context mass (staged round 14 serving)
# ---------------------------------------------------------------------------


def test_katz_model_mass_sums_to_one_per_context(spark):
    """Katz 1987's whole point: the discounted seen mass plus the
    alpha-scaled unseen-unigram mass is EXACTLY the unit — replayed in
    pure Python from the model relations for every context WITH an
    unseen tail; a full-vocabulary-coverage context (alpha emitted 0,
    the SRILM zero-denominator rule) is deficient by exactly its
    reserved mass, pinned too."""
    from mapreduceimpl_spark.operators.text_analysis import (
        KATZ_K,
        katz_model,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a c d d"),
            (2, "b a b c a a d b"),
            (3, "c c a b d a b a"),
        ],
        ["doc_id", "text"],
    )
    bi, cprev, uni, coc, alpha = katz_model(docs)
    bi_m = {(r["prev"], r["cur"]): r["cnt_pc"] for r in bi.collect()}
    cprev_m = {r["prev"]: r["cnt_prev"] for r in cprev.collect()}
    uni_rows = uni.collect()
    n_uni = uni_rows[0]["n_uni"]
    uni_m = {r["cur"]: r["c_uni"] for r in uni_rows}
    alpha_m = {r["prev"]: r["alpha"] for r in alpha.collect()}
    k = KATZ_K

    def d_of(c: int) -> float:
        if c > k:
            return 1.0
        if coc[1] == 0 or coc[c] == 0 or coc[c + 1] == 0:
            return 1.0
        a = (k + 1.0) * coc[k + 1] / coc[1]
        if a >= 1.0:
            return 1.0
        raw = ((c + 1.0) * coc[c + 1] / (float(c) * coc[c]) - a) / (1.0 - a)
        return 1.0 if (raw <= 0.0 or raw > 1.0) else raw

    vocab = list(uni_m)
    n_full_coverage = 0
    for prev in cprev_m:
        total, seen_disc, has_tail = 0.0, 0.0, False
        for w in vocab:
            c = bi_m.get((prev, w))
            if c is not None:
                p = d_of(c) * (c / cprev_m[prev])
                total += p
                seen_disc += p
            else:
                has_tail = True
                total += alpha_m[prev] * (uni_m[w] / n_uni)
        if has_tail:
            assert abs(total - 1.0) <= 1e-9, (prev, total)
        else:
            # full vocabulary coverage: alpha is 0 (SRILM rule) and
            # the context is deficient by exactly the reserved mass
            n_full_coverage += 1
            assert alpha_m[prev] == 0.0
            assert abs(total - seen_disc) <= 1e-12, (prev, total)
            assert total < 1.0
    # the fixture exercises BOTH regimes ('a' saw every vocab word)
    assert n_full_coverage >= 1
    assert n_full_coverage < len(cprev_m)
