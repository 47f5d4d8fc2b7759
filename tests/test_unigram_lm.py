"""Unigram-LM tokenizer training (Kudo, ACL 2018 — hard-EM variant):
pure-DP optimality vs brute-force enumeration, the exact-tie rule,
M-step smoothing/pruning invariants, segmentation coverage, and
cross-partitioning determinism."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators.unigram_lm import (
    MAX_PIECE_LEN,
    seed_piece_counts,
    unigram_lm_segment,
    unigram_lm_train,
    viterbi_word,
    word_frequencies,
)


def _all_segmentations(word: str, maxl: int):
    if not word:
        yield []
        return
    for d in range(1, min(maxl, len(word)) + 1):
        for rest in _all_segmentations(word[d:], maxl):
            yield [word[:d]] + rest


def _score(pieces, probs):
    s = 1.0
    for q in pieces:  # same left-to-right order as the DP accumulates
        s = s * probs[q]
    return s


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=8),
    extra=st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=MAX_PIECE_LEN),
        st.floats(min_value=0.001, max_value=0.999),
        max_size=8,
    ),
)
def test_viterbi_is_optimal_vs_bruteforce(word, extra):
    """The DP's score equals the max over ALL segmentations (exact
    double equality — identical multiplication order), and its path is
    a valid segmentation achieving that score."""
    probs = {"a": 0.25, "b": 0.125, "c": 0.0625, **extra}
    pieces, score = viterbi_word(word, probs, MAX_PIECE_LEN)
    assert "".join(pieces) == word
    assert _score(pieces, probs) == score
    best = max(
        _score(seg, probs)
        for seg in _all_segmentations(word, MAX_PIECE_LEN)
        if all(q in probs for q in seg)
    )
    assert score == best


def test_viterbi_exact_tie_prefers_longer_piece():
    """0.5 * 0.5 == 0.25 exactly in binary, so ['a','a'] and ['aa']
    tie bit-for-bit — the documented rule (and the SQL CASE order)
    picks the longer piece."""
    pieces, score = viterbi_word("aa", {"a": 0.5, "aa": 0.25})
    assert pieces == ["aa"]
    assert score == 0.25
    # and the longer piece wins at every position, not just the root
    pieces, _ = viterbi_word("aaaa", {"a": 0.5, "aa": 0.25})
    assert pieces == ["aa", "aa"]


def test_viterbi_prefers_strictly_better_short_split():
    pieces, score = viterbi_word("ab", {"a": 0.5, "b": 0.4, "ab": 0.1})
    assert pieces == ["a", "b"]
    assert score == 0.5 * 0.4


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_seed_counts_hand_computed(spark):
    docs = _docs(spark, ["ab ab b"])
    words = word_frequencies(docs)
    got = {r["piece"]: r["count"] for r in seed_piece_counts(words).collect()}
    # words: ab freq 2, b freq 1; substrings of 'ab': a, b, ab
    assert got == {"a": 2, "b": 3, "ab": 2}


def test_em_prunes_unused_multichar_and_floors_chars(spark):
    """After training, every surviving multi-char piece was used by
    some Viterbi path, and every character of the vocabulary survives
    with count >= 1 (so any future word stays segmentable)."""
    docs = _docs(spark, ["abc abc abc ab ab d"] * 3)
    final = unigram_lm_train(docs, iterations=2).toPandas()
    pieces = set(final["piece"])
    chars = {"a", "b", "c", "d"}
    assert chars <= pieces
    assert (final["count"] >= 1).all()
    seg = unigram_lm_segment(docs, iterations=2).toPandas()
    used = {q for row in seg["pieces"] for q in row.split(" ")}
    assert {q for q in pieces if len(q) > 1} <= used


def test_segment_reconstructs_every_word(spark):
    docs = _docs(spark, ["spark group spark filter", "group by key filter"])
    seg = unigram_lm_segment(docs, iterations=2).toPandas()
    assert len(seg) == 5  # distinct words: spark group filter by key
    for _, r in seg.iterrows():
        assert r["pieces"].replace(" ", "") == r["word"]
        assert r["n_pieces"] == len(r["pieces"].split(" "))
        assert r["score"] > 0


def test_train_is_partitioning_invariant(spark):
    """Same corpus through 1 and 7 input partitions: identical piece
    inventory, counts, and probabilities (bit-exact) — the counts are
    order-free integer sums and the EM runs on collected exact ints."""
    texts = ["spark group filter key", "group group spark", "filter key spark"] * 4
    a = unigram_lm_train(_docs(spark, texts).coalesce(1)).toPandas()
    b = unigram_lm_train(_docs(spark, texts).repartition(7)).toPandas()
    a = a.sort_values("piece").reset_index(drop=True)
    b = b.sort_values("piece").reset_index(drop=True)
    assert a.equals(b)


def test_train_probs_are_count_over_total(spark):
    final = unigram_lm_train(_docs(spark, ["ab ba ab"]), iterations=1).toPandas()
    total = int(final["count"].sum())
    for _, r in final.iterrows():
        assert r["prob"] == r["count"] / total
    assert abs(final["prob"].sum() - 1.0) < 1e-9


def test_oracle_parity_beyond_catalog_depth(spark, tmp_path):
    """The SQL generator unrolls ARBITRARY iteration counts; the
    catalog pins T=2, so this guards the generator's generality:
    train + segment at T=3 must stay bit-exact against DuckDB on a
    corpus the catalog never sees."""
    import duckdb

    from mapreduceimpl_spark.operators.unigram_lm import unigram_lm_oracle_sql

    # deliberately hostile text: control chars (incl. U+0001, which a
    # packed-string path encoding would fracture), unicode, long runs
    texts = [
        "spark sparks park parks", "spark park spa", "parks spark spark",
        "a\x01b a\x01b \x01\x01 héllo héllo aaaaaaaaaaaa",
    ]
    docs = _docs(spark, texts)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    for segment, fn, key in (
        (False, unigram_lm_train, "piece"),
        (True, unigram_lm_segment, "word"),
    ):
        a = fn(docs, iterations=3).toPandas()
        b = con.execute(unigram_lm_oracle_sql(iterations=3, segment=segment)).fetchdf()
        a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
        b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
        assert a.equals(b), f"iteration-3 {'segment' if segment else 'train'} diverged"


def test_max_vocab_words_cap_is_deterministic(spark):
    """The Heaps-cap keeps the top-N words by (freq DESC, word ASC) —
    the documented web-scale bound on the EM's vocab table — and plans
    as a distributed TakeOrderedAndProject, never a single-task global
    sort."""
    from mapreduceimpl_spark.plans import explain_str

    docs = _docs(spark, ["aa bb aa cc aa bb dd"])
    capped_df = word_frequencies(docs, max_vocab_words=2)
    assert "TakeOrderedAndProject" in explain_str(capped_df, "simple")
    capped = capped_df.collect()
    assert {(r["word"], r["freq"]) for r in capped} == {("aa", 3), ("bb", 2)}


def test_viterbi_total_on_oov_text():
    """Ship-the-model reality: characters the model never saw degrade
    to zero-probability single-char UNK pieces — the DP never crashes,
    the path still covers the word, and score == 0.0 flags the OOV."""
    probs = {"c": 0.2, "a": 0.2, "f": 0.2, "ca": 0.3}
    pieces, score = viterbi_word("café", probs)
    assert "".join(pieces) == "café"
    assert score == 0.0
    assert "é" in pieces  # the OOV char is its own piece
    # a fully in-vocab word is unaffected by the fallback
    pieces, score = viterbi_word("caf", probs)
    assert score > 0.0 and "".join(pieces) == "caf"


@settings(max_examples=100, deadline=None)
@given(word=st.text(alphabet="abé", min_size=1, max_size=10))
def test_viterbi_oov_totality_property(word):
    """For ANY word: the path reconstructs the word, and score == 0.0
    exactly when it contains an out-of-inventory character."""
    probs = {"a": 0.5, "b": 0.25, "ab": 0.3}
    pieces, score = viterbi_word(word, probs)
    assert "".join(pieces) == word
    assert (score == 0.0) == ("é" in word)


def test_target_vocab_prunes_to_size_and_renormalizes(spark):
    """SentencePiece --vocab_size semantics: every single-char piece
    survives (coverage), multi-char pieces keep the top slots by
    (count DESC, piece ASC), and probabilities renormalize over the
    survivors."""
    docs = _docs(spark, ["abc abc abc ab ab abcd d dd dd"] * 2)
    full = unigram_lm_train(docs).toPandas()
    chars = {p for p in full["piece"] if len(p) == 1}
    v = len(chars) + 2
    pruned = unigram_lm_train(docs, target_vocab=v).toPandas()
    assert len(pruned) == v
    assert chars <= set(pruned["piece"])
    kept_multi = sorted(
        (p for p in pruned["piece"] if len(p) > 1),
    )
    top2 = [
        r["piece"]
        for _, r in full[full["piece"].str.len() > 1]
        .sort_values(["count", "piece"], ascending=[False, True])
        .head(2)
        .iterrows()
    ]
    assert kept_multi == sorted(top2)
    assert abs(pruned["prob"].sum() - 1.0) < 1e-9
    total = int(pruned["count"].sum())
    for _, r in pruned.iterrows():
        assert r["prob"] == r["count"] / total


# ---------------------------------------------------------------------------
# deep EM tier (VERDICT r8 #3): production-depth rounds + progressive
# pruning, anchored to the hash-verified 2-round path
# ---------------------------------------------------------------------------

_DEEP_TEXTS = [
    "spark group filter key value spark",
    "group group spark window join",
    "filter key spark value window",
    "join window group filter value",
] * 3


def test_deep_equals_train_at_default_depth(spark):
    """unigram_lm_train_deep at em_rounds=2 with no pruning must equal
    the oracle-backed unigram_lm_train(iterations=2) row-for-row —
    the deep tier EXTENDS the hash-verified path, it doesn't fork it
    (counts exact-integer equal, probs the same float-cast division)."""
    from mapreduceimpl_spark.operators.unigram_lm import unigram_lm_train_deep

    docs = _docs(spark, _DEEP_TEXTS)
    deep, _ = unigram_lm_train_deep(docs, em_rounds=2)
    base = unigram_lm_train(docs, iterations=2)
    assert {tuple(r) for r in deep.collect()} == {tuple(r) for r in base.collect()}


def test_deep_ll_non_decreasing_without_pruning(spark):
    """The hard-EM objective (corpus log-likelihood under each round's
    input probabilities) is non-decreasing across rounds while no
    pruning fires — the textbook Viterbi-EM guarantee; the char floor
    perturbs the M-step maximizer only by the unused-char unit counts,
    measured well under monotonicity here."""
    from mapreduceimpl_spark.operators.unigram_lm import unigram_lm_train_deep

    _, hist = unigram_lm_train_deep(_docs(spark, _DEEP_TEXTS), em_rounds=5)
    lls = [r["corpus_ll"] for r in hist.orderBy("round").collect()]
    assert len(lls) == 5
    assert all(b >= a for a, b in zip(lls, lls[1:])), lls


def test_deep_pruning_schedule_reaches_target(spark):
    """With target_vocab set, the final inventory lands exactly on the
    target (chars + top multis), every single char survives (coverage
    floor), n_multi shrinks monotonically once pruning starts, and the
    probabilities renormalize over the survivors."""
    from mapreduceimpl_spark.operators.unigram_lm import unigram_lm_train_deep

    docs = _docs(spark, _DEEP_TEXTS)
    chars = {c for t in _DEEP_TEXTS for c in t if c != " "}
    target = len(chars) + 4
    pieces, hist = unigram_lm_train_deep(
        docs, em_rounds=4, target_vocab=target, shrink_factor=0.5
    )
    pdf = pieces.toPandas()
    assert len(pdf) == target
    assert chars <= set(pdf["piece"])
    assert abs(pdf["prob"].sum() - 1.0) < 1e-9
    multis = [r["n_multi"] for r in hist.orderBy("round").collect()]
    assert all(b <= a for a, b in zip(multis, multis[1:])), multis


def test_deep_validates_params(spark):
    import pytest

    from mapreduceimpl_spark.operators.unigram_lm import unigram_lm_train_deep

    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        unigram_lm_train_deep(docs, em_rounds=0)
    with pytest.raises(ValueError):
        unigram_lm_train_deep(docs, shrink_factor=0.0)
    with pytest.raises(ValueError):
        unigram_lm_train_deep(docs, target_vocab=0)


def test_deep_estep_plan_size_constant(spark):
    """The per-round E-step job must not grow with round number or
    inventory size: probabilities travel as broadcast closure data in
    the pandas UDF, never as plan nodes, and lineage restarts at the
    persisted words table every round — so the round-1000 plan is the
    round-1 plan.  Pinned by comparing plan text for a 3-piece and a
    30k-piece probability table."""
    from mapreduceimpl_spark.operators.unigram_lm import (
        MAX_PIECE_LEN,
        _estep_used_counts,
    )
    from mapreduceimpl_spark.plans import explain_str

    words = word_frequencies(_docs(spark, _DEEP_TEXTS))
    small = {"a": 0.5, "b": 0.25, "c": 0.25}
    big = {f"w{i:05d}"[-MAX_PIECE_LEN:] + str(i % 7): 1e-5 for i in range(30000)}
    big.update(small)
    plan_small = explain_str(_estep_used_counts(words, small, MAX_PIECE_LEN), "simple")
    plan_big = explain_str(_estep_used_counts(words, big, MAX_PIECE_LEN), "simple")
    assert len(plan_small.splitlines()) == len(plan_big.splitlines())


def test_unigram_fertility_hand_computed(spark):
    """Fertility on a corpus where the segmentation is predictable:
    totals recomputed from the segment table row-for-row."""
    from mapreduceimpl_spark.operators.unigram_lm import unigram_fertility

    docs = _docs(spark, ["spark spark group", "group filter spark"])
    seg = unigram_lm_segment(docs, iterations=2).collect()
    n_words = len(seg)
    total_words = sum(r["freq"] for r in seg)
    total_pieces = sum(r["freq"] * r["n_pieces"] for r in seg)
    row = unigram_fertility(docs, iterations=2).collect()[0]
    assert row["n_words"] == n_words
    assert row["total_words"] == total_words
    assert row["total_pieces"] == total_pieces
    assert row["max_pieces"] == max(r["n_pieces"] for r in seg)
    import math

    assert row["fertility"] == math.floor(
        (total_pieces / total_words) * 1e6 + 0.5
    ) / 1e6


def test_deep_trainer_matches_duckdb_oracle_at_depth_4(spark):
    """Staged round-10 entry: the deep trainer AT DEPTH (em_rounds=4,
    no pruning) against the oracle generator unrolled to T=4 — the
    driver-equivalent compare that will back `unigram_lm_train_deep4`
    when it enters the catalog (DuckDB replays T=6 at sf0.01 in
    ~0.3 s, so depth itself is not an oracle limitation)."""
    import duckdb

    from mapreduceimpl_spark.operators.unigram_lm import (
        unigram_lm_oracle_sql,
        unigram_lm_train_deep,
    )
    from tools.check_oracle import compare

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    pieces, _ = unigram_lm_train_deep(docs, em_rounds=4)
    sdf = pieces.toPandas()
    odf = con.execute(unigram_lm_oracle_sql(iterations=4)).fetchdf()
    con.close()
    problems = compare("unigram_lm_train_deep4", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


# ---------------------------------------------------------------------------
# subword regularization: FFBS sampled segmentation (staged round 10)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=8),
    extra=st.dictionaries(
        st.text(alphabet="abc", min_size=2, max_size=MAX_PIECE_LEN),
        st.floats(min_value=0.001, max_value=0.999),
        max_size=8,
    ),
    u=st.floats(min_value=0.0, max_value=0.999999),
)
def test_ffbs_forward_mass_and_draw_validity(word, extra, u):
    """The sampler's forward mass equals the brute-force sum over ALL
    viable segmentations (tolerance only for summation order), and any
    constant-u draw returns a VALID segmentation whose probability is
    the product of its pieces — i.e. a member of the enumerated
    support whenever the mass is positive."""
    import math

    from mapreduceimpl_spark.operators.unigram_lm import sample_segment_word

    probs = {"a": 0.25, "b": 0.125, "c": 0.0625, **extra}
    total = 0.0
    support = {}
    for seg in _all_segmentations(word, MAX_PIECE_LEN):
        if all(q in probs for q in seg):
            p = _score(seg, probs)
            support[tuple(seg)] = p
            total += p
    # forward mass vs brute force (different summation order -> tol)
    L = len(word)
    A = [0.0] * (L + 1)
    A[0] = 1.0
    for j in range(1, L + 1):
        acc = 0.0
        for d in range(MAX_PIECE_LEN, 0, -1):
            if d > j:
                continue
            p = probs.get(word[j - d : j])
            if p is None:
                continue
            acc += A[j - d] * p
        A[j] = acc
    assert math.isclose(A[L], total, rel_tol=1e-9)

    pieces, sp = sample_segment_word(
        word, probs, MAX_PIECE_LEN, u_at=lambda w, j: u
    )
    assert "".join(pieces) == word
    if total > 0:
        assert tuple(pieces) in support
        assert sp > 0


def test_ffbs_threshold_semantics_exact():
    """Inverse-CDF check on the 2-segmentation word 'aa': with the
    d-descending scan, the LONGER piece 'aa' owns the low-u mass
    [0, p_aa / A) and the char split owns the rest — the flip happens
    at exactly u*A < p_aa (threshold multiplication, no division)."""
    from mapreduceimpl_spark.operators.unigram_lm import sample_segment_word

    probs = {"a": 0.4, "aa": 0.2}
    A2 = 0.2 + 0.4 * 0.4  # d-descending: aa first, then a*a
    thresh = 0.2 / A2
    for u, want in [
        (0.0, ["aa"]),
        (thresh - 1e-9, ["aa"]),
        (thresh + 1e-9, ["a", "a"]),
        (0.999999, ["a", "a"]),
    ]:
        pieces, sp = sample_segment_word(
            "aa", probs, u_at=lambda w, j, u=u: u
        )
        assert pieces == want, (u, pieces)
        assert sp == (0.2 if want == ["aa"] else 0.4 * 0.4)


def test_sample_segment_reconstructs_and_varies_by_epoch(spark):
    """Driver-visible sanity: every drawn segmentation reconstructs
    its word; different epochs re-salt the uniforms and must produce a
    different draw for at least one word of a corpus whose posterior
    is spread (repeated bigram-friendly words)."""
    from mapreduceimpl_spark.operators.unigram_lm import (
        unigram_lm_sample_segment,
    )

    # words LONGER than max_piece_len force cut points, so the
    # posterior has several comparable-mass segmentations to draw from
    docs = _docs(spark, ["ababab bababa ab ba abababab", "ababab ab ba"] * 3)
    draws = {}
    for epoch in (0, 1, 2):
        rows = unigram_lm_sample_segment(docs, epoch=epoch).collect()
        for r in rows:
            assert r["pieces"].replace(" ", "") == r["word"]
            assert r["n_pieces"] == len(r["pieces"].split(" "))
        draws[epoch] = {r["word"]: r["pieces"] for r in rows}
    assert any(draws[0] != draws[e] for e in (1, 2)), draws


def test_sample_segment_matches_duckdb_oracle_hostile(spark, tmp_path):
    """Staged round-10 entry: bit-exact FFBS parity against the
    recursive-CTE replay on hostile text (control chars, unicode,
    ambiguous repeats) at two epochs."""
    import duckdb

    from mapreduceimpl_spark.operators.unigram_lm import (
        unigram_lm_sample_oracle_sql,
        unigram_lm_sample_segment,
    )
    from tools.check_oracle import compare

    texts = [
        "abab abab ab ab abab ba baba",
        "a\x01b a\x01b \x01\x01 héllo héllo",
        "aaaa aaaa aa aa a",
    ]
    docs = _docs(spark, texts)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    for epoch in (0, 3):
        sdf = unigram_lm_sample_segment(docs, epoch=epoch).toPandas()
        odf = con.execute(
            unigram_lm_sample_oracle_sql(epoch=epoch)
        ).fetchdf()
        problems = compare(f"sample_segment_e{epoch}", sdf, odf)
        assert not problems, (epoch, problems)
        # the ambiguous corpus must actually exercise multi-piece draws
        assert (sdf["n_pieces"] > 1).any()
    con.close()


# ---------------------------------------------------------------------------
# posterior-expected fertility (staged round 10)
# ---------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=8),
    extra=st.dictionaries(
        st.text(alphabet="ab", min_size=2, max_size=MAX_PIECE_LEN),
        st.floats(min_value=0.001, max_value=0.999),
        max_size=6,
    ),
)
def test_expected_pieces_equals_bruteforce(word, extra):
    """C[L]/A[L] equals the enumerated posterior mean of n_pieces
    (tolerance only for summation order), and the expectation always
    lies within the [min, max] of the enumerated segmentation
    lengths."""
    import math

    from mapreduceimpl_spark.operators.unigram_lm import expected_pieces_word

    probs = {"a": 0.3, "b": 0.2, **extra}
    mass, num = 0.0, 0.0
    lens = []
    for seg in _all_segmentations(word, MAX_PIECE_LEN):
        if all(q in probs for q in seg):
            p = _score(seg, probs)
            mass += p
            num += p * len(seg)
            lens.append(len(seg))
    a, c = expected_pieces_word(word, probs)
    assert math.isclose(a, mass, rel_tol=1e-9)
    assert math.isclose(c, num, rel_tol=1e-9)
    if mass > 0:
        e = c / a
        assert min(lens) - 1e-9 <= e <= max(lens) + 1e-9


def test_expected_fertility_matches_duckdb_oracle(spark, tmp_path):
    """Staged round-10 entry: driver-equivalent compare of the
    expected-fertility plan against its recursive-CTE replay, on an
    ambiguous corpus plus hostile text."""
    import duckdb

    from mapreduceimpl_spark.operators.unigram_lm import (
        unigram_expected_fertility,
        unigram_expected_fertility_oracle_sql,
    )
    from tools.check_oracle import compare

    texts = [
        "ababab bababa ab ba abababab",
        "a\x01b a\x01b héllo héllo",
        "aaaa aaaa aa aa a",
    ] * 2
    docs = _docs(spark, texts)
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    sdf = unigram_expected_fertility(docs).toPandas()
    odf = con.execute(unigram_expected_fertility_oracle_sql()).fetchdf()
    con.close()
    problems = compare("unigram_expected_fertility", sdf, odf)
    assert not problems, problems
    # ambiguity signal: some word's expectation strictly exceeds 1
    assert (sdf["expected_pieces"].dropna() > 1.0).any()
