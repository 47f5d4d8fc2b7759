"""SentencePiece-style unigram language-model tokenizer training.

The OTHER half of modern subword tokenization, next to this repo's BPE
pair (``text_analysis.bpe_train_merges`` / ``bpe_tokenize``): Kudo
(ACL 2018, "Subword Regularization") trains a unigram LM over a seed
piece inventory by EM — segment the corpus under current piece
probabilities (E-step, Viterbi), re-estimate piece probabilities from
the segmentation counts (M-step), prune useless pieces — and tokenizes
by max-likelihood Viterbi segmentation.  This module implements the
hard-EM (Viterbi-count) variant with deterministic, engine-portable
arithmetic so every step replays bit-exactly in SQL:

- all counts are exact BIGINT sums (word frequencies x path
  multiplicities);
- a piece's probability is ONE division of the two exact integer
  counts, each cast to double FIRST (operand-for-operand the oracle's
  ``CAST(cnt AS DOUBLE)/CAST(total AS DOUBLE)`` — identical in any
  IEEE engine, including past 2^53);
- a segmentation's likelihood is a product of those doubles multiplied
  in FIXED left-to-right path order — no transcendentals anywhere, so
  Spark, Python, and DuckDB produce bit-identical doubles;
- the Viterbi tie rule is explicit: on exact score ties prefer the
  LONGER last piece (candidates scanned d = max_piece_len .. 1 with
  strict-greater replacement).

Reference capability anchor: the reference framework's UDF surface
(``mp/worker.go:14-17``) exists to run exactly this kind of iterative
corpus computation; its k-means sketch (``kmeans.go:14-25``) is the
same collect-refine-broadcast loop this trainer uses.

Scale design (the 100 TB question): the ONLY corpus-sized work is the
word-frequency count — one wordcount-shaped shuffle, after which the
corpus is never touched again.  EM runs on the DISTINCT-WORD table
(Heaps-law-bounded; millions of rows for web text, not trillions) with
the piece inventory collected to the driver each iteration — the same
bounded collect-and-broadcast contract as ``kmeans.py`` centroids
(piece inventory <= |vocab| x max_piece_len x mean word length; cap
the vocabulary with ``max_vocab_words`` when distinct words are
unbounded, keeping the top-N by frequency like SentencePiece's own
seed pruning).  Per-word Viterbi is an Arrow-batched ``mapInPandas``
over the vocab table — per-row imperative DP is the documented pandas
UDF escape hatch (same class as EWMA/packing recurrences).  The
``words``/``pieces`` persists are vocab-sized and not unpersisted
(the package's documented bounded-leak class — same as the funnel
entries' kept-branch caches).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 4
EM_ITERATIONS = 2


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_vocab_words: int | None = None
) -> DataFrame:
    """(word, freq) over space-split tokens — the one corpus-sized
    stage (wordcount-shaped: partial agg -> shuffle -> final agg).
    ``max_vocab_words`` keeps the top-N by (freq DESC, word ASC) —
    deterministic, SentencePiece-style seed cap for unbounded
    vocabularies."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if max_vocab_words is not None:
        # orderBy + limit plans as TakeOrderedAndProject — a
        # distributed top-N, never a single-task sort of the whole
        # vocabulary (a global row_number window would be one)
        words = words.orderBy(F.col("freq").desc(), F.col("word")).limit(
            max_vocab_words
        )
    return words


def _substring_grid(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, freq, piece, l) for every in-word substring of length
    1..max_piece_len — vocab-sized x word length, never corpus-sized."""
    return (
        words.select(
            "word", "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(
            "word", "freq", "i",
            F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("l"),
        )
        .filter(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(
            "word", "freq", F.expr("substring(word, i, l)").alias("piece"),
            "l",
        )
    )


def seed_piece_counts(words: DataFrame, max_piece_len: int = MAX_PIECE_LEN) -> DataFrame:
    """Seed inventory: every substring of length 1..max_piece_len with
    count = sum over words of freq x in-word occurrences."""
    return (
        _substring_grid(words, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )


def viterbi_word(
    word: str, probs: dict, max_piece_len: int = MAX_PIECE_LEN
) -> tuple[list, float]:
    """PURE per-word max-product Viterbi — the one DP both engines
    replay, exposed for direct property testing: (pieces, score).

    Bit-deterministic by construction: candidates for position j are
    the pieces ending at j with length d = max_piece_len..1;
    score(d) = best[j-d] * p(piece) (one IEEE multiply), absent
    multi-char pieces score -1.0; strict-greater replacement scanning
    d DESCENDING makes exact ties prefer the longer piece (the SQL
    oracle's CASE-branch order).

    TOTAL over arbitrary text: a single character ABSENT from the
    inventory degrades to a zero-probability UNK piece (char-fallback,
    the real tokenizers' move), so a path always exists and an
    OOV-containing word is detectable by score == 0.0.  For training-
    vocabulary words the M-step's char floor keeps every char present,
    so the fallback never fires there and best[j] > 0 — the SQL
    oracle mirrors the same ``coalesce(p1, 0.0)`` semantics."""
    L = len(word)
    best = [0.0] * (L + 1)
    best[0] = 1.0
    back: list = [None] * (L + 1)
    for j in range(1, L + 1):
        b, choice = -2.0, None
        for d in range(max_piece_len, 0, -1):
            if d > j:
                s: float = -1.0
                cand = None
            else:
                piece = word[j - d : j]
                p = probs.get(piece)
                if p is None and d > 1:
                    s, cand = -1.0, None
                else:  # d == 1 is always viable: OOV char -> p = 0.0
                    s, cand = best[j - d] * (p if p is not None else 0.0), piece
            if s > b:
                b, choice = s, cand
        best[j] = b
        back[j] = choice
    pieces: list = []
    j = L
    while j > 0:
        pieces.append(back[j])
        j -= len(back[j])
    pieces.reverse()
    return pieces, best[L]


def _map_words(
    words: DataFrame, schema: str, per_word: Callable[[str], dict]
) -> DataFrame:
    """THE Arrow-batched scaffold for per-word pure DPs over the vocab
    table (review r9: one copy instead of three): emit (word, freq,
    **per_word(word)) rows under ``schema``.  Empty Arrow batches are
    skipped so the extra columns never go missing on a 0-row batch."""
    import pandas as pd

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols: dict[str, list] = {}
            for word in pdf["word"]:
                for k, v in per_word(word).items():
                    cols.setdefault(k, []).append(v)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], **cols}
            )

    return words.mapInPandas(run, schema)


def _viterbi_pandas(words: DataFrame, probs: dict, max_piece_len: int) -> DataFrame:
    """Best segmentation per word under ``probs`` via the pure
    ``viterbi_word`` DP, Arrow-batched: (word, freq, path
    array<string>, score double)."""

    def per_word(word: str) -> dict:
        pieces, score = viterbi_word(word, probs, max_piece_len)
        return {"path": pieces, "score": score}

    return _map_words(
        words, "word string, freq long, path array<string>, score double",
        per_word,
    )


def _em_step(
    words: DataFrame, chars: DataFrame, probs: dict, max_piece_len: int
) -> DataFrame:
    """One hard-EM iteration: Viterbi-segment every word, count piece
    usage weighted by word frequency, keep multi-char pieces that were
    used, floor every single-char piece at count 1 (coverage: any word
    stays segmentable, so Viterbi scores stay positive)."""
    used = (
        _viterbi_pandas(words, probs, max_piece_len)
        .select("freq", F.explode("path").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )
    multi = used.filter(F.length("piece") > 1)
    single = chars.join(used, "piece", "left").select(
        "piece",
        F.greatest(F.coalesce(F.col("count"), F.lit(0)), F.lit(1)).alias("count"),
    )
    return multi.unionByName(single)


def _probs_from_rows(rows) -> dict:
    """float(count) / float(total): CAST each exact integer to DOUBLE
    FIRST, then one IEEE division — operand-for-operand what the
    oracle's CAST(cnt AS DOUBLE)/CAST(total AS DOUBLE) computes.
    Python's bare ``count / total`` divides the exact rationals and
    rounds once, which differs in the last ulp when either operand
    exceeds 2^53 (review r8) — reachable for web-scale total piece
    occurrences, and a one-ulp prob difference can flip a Viterbi
    exact-tie."""
    total = float(sum(r["count"] for r in rows))
    return {r["piece"]: float(r["count"]) / total for r in rows}


def _em_loop(
    docs: DataFrame,
    iterations: int,
    max_piece_len: int,
    text_col: str,
    max_vocab_words: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Run the hard-EM loop; returns (words persisted, final pieces
    lazy).  Each iteration collects the CURRENT inventory to the
    driver (bounded, the k-means-centroid contract) and broadcasts the
    probabilities into the next Viterbi pass, so the returned pieces
    frame is always exactly ONE viterbi+count lineage deep — plan size
    constant in ``iterations``, never a nested-EM tower."""
    words = word_frequencies(docs, text_col, max_vocab_words).persist()
    chars = _substring_grid(words, 1).select("piece").distinct()
    pieces = seed_piece_counts(words, max_piece_len)
    for _ in range(iterations):
        pieces = _em_step(
            words, chars, _probs_from_rows(pieces.collect()), max_piece_len
        )
    return words, pieces


def unigram_lm_train(
    docs: DataFrame,
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
    target_vocab: int | None = None,
) -> DataFrame:
    """Train the unigram-LM piece inventory: (piece, count, prob)
    after ``iterations`` hard-EM rounds over the seed inventory.

    ``target_vocab`` is SentencePiece's ``--vocab_size``: after the
    EM, keep EVERY single-char piece (coverage — any text stays
    segmentable via the char fallback) plus the top multi-char pieces
    by (count DESC, piece ASC) until the inventory is ``target_vocab``
    pieces; probabilities are renormalized over the survivors so the
    shipped model is a distribution.  Deterministic — no
    likelihood-loss estimation, the hard-EM counts ARE the usage
    statistic the paper's pruning approximates.

    ``prob`` is the final ``count / total`` double — bit-portable
    because both operands are exact integers.  The total rides in as a
    broadcast 1-row aggregate (the package's bounded-crossJoin
    pattern), keeping the result a single lazy plan."""
    _, pieces = _em_loop(docs, iterations, max_piece_len, text_col, max_vocab_words)
    # persist BEFORE the pruning branch (ADVICE r8): chars_only.count(),
    # both union legs, and the rows+total fan-out below all re-read this
    # frame — unpersisted, each re-ran the full final-EM lineage (an
    # extra Viterbi mapInPandas pass apiece, up to 3x redundant compute
    # at large vocabs).  Nothing is unpersisted, per the package's
    # documented bounded-leak convention (the frame is inventory-sized).
    pieces = pieces.persist()
    if target_vocab is not None:
        chars_only = pieces.filter(F.length("piece") == 1)
        multi = pieces.filter(F.length("piece") > 1)
        # distributed top-N (TakeOrderedAndProject), never a global sort
        keep_multi = multi.orderBy(
            F.col("count").desc(), F.col("piece")
        ).limit(max(0, target_vocab - chars_only.count()))
        pieces = chars_only.unionByName(keep_multi)
    total = pieces.agg(F.sum("count").cast("long").alias("_total"))
    return pieces.crossJoin(F.broadcast(total)).select(
        "piece",
        "count",
        (F.col("count").cast("double") / F.col("_total").cast("double")).alias(
            "prob"
        ),
    )


def _estep_used_counts(
    words: DataFrame, probs: dict, max_piece_len: int
) -> DataFrame:
    """One E-step's freq-weighted piece-usage counts (piece, count) —
    the per-round Spark job of the deep trainer.  The probs dict is
    broadcast data inside the pandas-UDF closure, NOT plan nodes, so
    the plan is the same size at round 1 and round 1000 (pinned by
    tests/test_unigram_lm.py::test_deep_estep_plan_size_constant)."""
    return (
        _viterbi_pandas(words, probs, max_piece_len)
        .select("freq", F.explode("path").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("count"))
    )


def _probs_from_counts(counts: dict) -> dict:
    """Dict twin of :func:`_probs_from_rows` — identical arithmetic
    (float-cast each exact integer FIRST, one IEEE division)."""
    total = float(sum(counts.values()))
    return {p: float(c) / total for p, c in counts.items()}


def unigram_lm_train_deep(
    docs: DataFrame,
    em_rounds: int = 8,
    target_vocab: int | None = None,
    shrink_factor: float = 0.75,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Production-depth hard-EM (VERDICT r8 #3): run ``em_rounds`` EM
    rounds with SentencePiece's progressive pruning schedule instead
    of the oracle entry's 2 unrolled rounds.  Returns ``(pieces,
    history)``: the final inventory (piece, count, prob) and one
    diagnostics row per round (round, n_pieces, n_multi, corpus_ll).

    Depth design — why this stays O(em_rounds) wall with a CONSTANT
    plan, where BPE needed localCheckpoint: BPE rewrites the CORPUS
    each pass, so lineage compounds and must be re-rooted; here the
    corpus is touched once (the ``word_frequencies`` shuffle, then
    ``words`` is persisted) and every round is ONE fresh job over that
    cached vocab table — Viterbi ``mapInPandas`` + one count aggregate
    + a bounded inventory collect (the k-means-centroid contract, same
    as ``_em_loop``).  The M-step (char floor, probability
    re-estimation, pruning) runs driver-side on the collected
    inventory — inventory-sized work on data we collect anyway, which
    also makes the per-round corpus log-likelihood EXACT (the Spark
    floor in ``_em_step`` can't distinguish a floored char from a
    truly-once-used one).

    ``corpus_ll`` for round r is sum(freq * ln best-score) under the
    round's INPUT probabilities = sum over used pieces of count * ln p
    — the hard-EM objective.  It is non-decreasing across rounds while
    no pruning fires (M-step maximizes it for the fixed segmentation,
    Viterbi maximizes it for the fixed probabilities; the char floor
    perturbs the maximizer by at most the unused-char mass, measured
    well under monotonicity on the fixtures — pytest-pinned);
    pruning rounds may pay likelihood for vocabulary size, exactly as
    in Kudo (ACL 2018) §3.2.

    Pruning schedule: while the inventory exceeds ``target_vocab``,
    keep every single-char piece (coverage floor) and the top multi
    pieces by (count DESC, piece ASC), shrinking the multi set by
    ``shrink_factor`` per round but never below what the target
    allows; the FINAL round prunes exactly to ``target_vocab``.

    At ``em_rounds=EM_ITERATIONS`` with no pruning the final inventory
    equals :func:`unigram_lm_train` row-for-row (pytest-pinned) — the
    deep tier extends the hash-verified path, it doesn't fork it.

    Bounded-collect contract (ADVICE r9): every EM round collects the
    per-round piece-usage dict (and, once, the seed inventory), whose
    size is bounded ONLY by the ``max_vocab_words`` cap — the default
    ``None`` is for fixture/oracle-parity scale.  Deep training over
    a web-scale corpus MUST pass a finite ``max_vocab_words`` (the
    same valve ``_em_loop`` documents); the Heaps-law distinct-word
    count at 100 TB is otherwise a driver-memory risk, not a
    correctness one.
    """
    import math

    if em_rounds < 1:
        raise ValueError(f"em_rounds must be >= 1, got {em_rounds}")
    if not (0.0 < shrink_factor <= 1.0):
        raise ValueError(f"shrink_factor must be in (0, 1], got {shrink_factor}")
    if target_vocab is not None and target_vocab < 1:
        raise ValueError(f"target_vocab must be >= 1, got {target_vocab}")

    spark = docs.sparkSession
    words = word_frequencies(docs, text_col, max_vocab_words).persist()
    # bounded collects: alphabet + seed inventory (the same rows
    # _em_loop collects; see the module docstring's bounded-collect
    # contract and max_vocab_words cap)
    chars = sorted(
        r["piece"]
        for r in _substring_grid(words, 1).select("piece").distinct().collect()
    )
    counts = {
        r["piece"]: r["count"]
        for r in seed_piece_counts(words, max_piece_len).collect()
    }

    history: list[tuple[int, int, int, float]] = []
    for r in range(1, em_rounds + 1):
        probs = _probs_from_counts(counts)
        used = {
            row["piece"]: row["count"]
            for row in _estep_used_counts(words, probs, max_piece_len).collect()
        }
        # every used piece is in probs with p > 0: multi candidates
        # come from the inventory, chars are floored at count >= 1
        corpus_ll = sum(c * math.log(probs[p]) for p, c in used.items())
        multi = {p: c for p, c in used.items() if len(p) > 1}
        if target_vocab is not None:
            budget = max(target_vocab - len(chars), 0)
            if len(multi) > budget:
                keep = (
                    budget
                    if r == em_rounds
                    else max(budget, int(len(multi) * shrink_factor))
                )
                kept = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:keep]
                multi = dict(kept)
        counts = {
            **multi,
            **{ch: max(used.get(ch, 0), 1) for ch in chars},
        }
        history.append((r, len(counts), len(multi), corpus_ll))

    total = float(sum(counts.values()))
    pieces = spark.createDataFrame(
        [(p, c, float(c) / total) for p, c in sorted(counts.items())],
        "piece string, count long, prob double",
    )
    hist = spark.createDataFrame(
        history, "round long, n_pieces long, n_multi long, corpus_ll double"
    )
    return pieces, hist


def unigram_lm_segment(
    docs: DataFrame,
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
) -> DataFrame:
    """Tokenize the vocabulary with the trained model: per distinct
    word, the max-likelihood segmentation — (word, freq, pieces
    space-joined, n_pieces, score).  The apply half of the pair, like
    ``bpe_tokenize`` is to ``bpe_train_merges``."""
    words, pieces = _em_loop(
        docs, iterations, max_piece_len, text_col, max_vocab_words
    )
    seg = _viterbi_pandas(
        words, _probs_from_rows(pieces.collect()), max_piece_len
    )
    return seg.select(
        "word",
        "freq",
        F.array_join("path", " ").alias("pieces"),
        F.size("path").cast("long").alias("n_pieces"),
        "score",
    )


def sample_uniform_at(epoch: int, word: str, j: int) -> float:
    """Deterministic [0,1) uniform for the backward-sampling decision
    at position ``j`` of ``word`` — first 8 md5 hex digits of the
    salted key, exact integer parse, ONE float division (the repo's
    ``hash_uniform`` recipe, bit-identical in DuckDB)."""
    h = hashlib.md5(f"sr{epoch}:{word}:{j}".encode()).hexdigest()[:8]
    return float(int(h, 16)) / 4294967296.0


def sample_segment_word(
    word: str,
    probs: dict,
    max_piece_len: int = MAX_PIECE_LEN,
    u_at=None,
) -> tuple[list, float]:
    """PURE forward-filter / backward-sample segmentation draw — the
    subword-regularization sampler of Kudo (ACL 2018) at alpha = 1:
    a segmentation s of ``word`` is drawn with probability
    P(s) / sum over segmentations P(s'), exactly (no n-best
    truncation), via the standard FFBS decomposition.

    Bit-deterministic by construction, so a SQL engine replays the
    SAME draw: the forward mass A[j] = sum over pieces ending at j of
    A[j-d] * p(piece) accumulates in FIXED d-descending order; the
    backward step at j compares target = u_j * A[j] against the SAME
    fixed-order cumulative sums (no division — thresholds multiply
    instead, keeping every comparison an exact IEEE product of the
    operands both engines hold).  Because the backward cumulative sum
    repeats the forward accumulation order, its final value equals
    A[j] BITWISE, and u < 1 guarantees a branch is taken for any
    normal A[j] > 0; the ELSE branch (zero mass at an OOV char, or a
    subnormal-A rounding tie) deterministically degrades to the
    single char — ``viterbi_word``'s fallback, mirrored by the SQL
    CASE's ELSE.  ``sample_prob`` multiplies the chosen pieces'
    probabilities in SELECTION (right-to-left) order — the order the
    SQL recursion folds them in.

    Returns (pieces, sample_prob)."""
    if u_at is None:
        u_at = lambda w, j: sample_uniform_at(0, w, j)  # noqa: E731
    L = len(word)
    A = [0.0] * (L + 1)
    A[0] = 1.0
    for j in range(1, L + 1):
        acc = 0.0
        for d in range(max_piece_len, 0, -1):
            if d > j:
                continue
            p = probs.get(word[j - d : j])
            if p is None:
                if d != 1:
                    continue
                p = 0.0  # OOV char: zero-mass fallback candidate
            acc = acc + A[j - d] * p
        A[j] = acc
    pieces: list = []
    sample_prob = 1.0
    j = L
    while j > 0:
        target = u_at(word, j) * A[j]
        cum = 0.0
        choice, p_choice = None, 0.0
        for d in range(max_piece_len, 0, -1):
            if d > j:
                continue
            piece = word[j - d : j]
            p = probs.get(piece)
            if p is None:
                if d != 1:
                    continue
                p = 0.0
            cum = cum + A[j - d] * p
            if target < cum:
                choice, p_choice = piece, p
                break
        if choice is None:  # zero mass / rounding tie: char fallback
            choice = word[j - 1 : j]
            p_choice = probs.get(choice, 0.0)
        pieces.append(choice)
        sample_prob = sample_prob * p_choice
        j -= len(choice)
    pieces.reverse()
    return pieces, sample_prob


def _sample_pandas(
    words: DataFrame, probs: dict, max_piece_len: int, epoch: int
) -> DataFrame:
    """Sampled segmentation per word via the pure FFBS draw,
    Arrow-batched: (word, freq, path array<string>, sample_prob)."""
    u_at = lambda w, j: sample_uniform_at(epoch, w, j)  # noqa: E731

    def per_word(word: str) -> dict:
        pieces, sp = sample_segment_word(word, probs, max_piece_len, u_at)
        return {"path": pieces, "sample_prob": sp}

    return _map_words(
        words,
        "word string, freq long, path array<string>, sample_prob double",
        per_word,
    )


def unigram_lm_sample_segment(
    docs: DataFrame,
    iterations: int = EM_ITERATIONS,
    epoch: int = 0,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
) -> DataFrame:
    """Subword regularization — the headline feature of Kudo (ACL
    2018): instead of the single max-likelihood Viterbi segmentation
    (``unigram_lm_segment``), draw a segmentation per word from the
    FULL posterior P(s | word) under the trained unigram LM, exactly
    (FFBS over the same DP lattice, no n-best truncation).  Varying
    ``epoch`` re-salts the per-position uniforms, giving each training
    epoch an independent segmentation draw — the regularization that
    the paper shows improves downstream model robustness.

    Deterministic given (corpus, iterations, epoch), so the DuckDB
    oracle (``unigram_lm_sample_oracle_sql``) replays every draw
    bit-exactly.  Output: (word, freq, pieces, n_pieces, sample_prob)
    with sample_prob the product of the drawn pieces' probabilities
    in selection order.

    Scale: identical posture to ``unigram_lm_segment`` — one corpus
    wordcount shuffle, then an Arrow-batched per-word DP over the
    Heaps-bounded vocab table."""
    words, pieces = _em_loop(
        docs, iterations, max_piece_len, text_col, max_vocab_words
    )
    seg = _sample_pandas(
        words, _probs_from_rows(pieces.collect()), max_piece_len, epoch
    )
    return seg.select(
        "word",
        "freq",
        F.array_join("path", " ").alias("pieces"),
        F.size("path").cast("long").alias("n_pieces"),
        "sample_prob",
    )


def expected_pieces_word(
    word: str, probs: dict, max_piece_len: int = MAX_PIECE_LEN
) -> tuple[float, float]:
    """PURE posterior-expected segmentation length — the exact mean of
    n_pieces over ALL segmentations weighted by P(s), no sampling, no
    enumeration: alongside the forward mass A[j] carry
    C[j] = sum over partial segmentations ending at j of P(s) * n(s),
    via C[j] = sum_d (C[j-d] + A[j-d]) * p(piece) (one more piece adds
    1 to every path it extends).  E[n_pieces] = C[L] / A[L].

    Same portability discipline as the rest of the module: both
    accumulators sum in fixed d-descending order with 0.0 for absent
    pieces, and the ONE division happens at the end.  Returns
    (mass A[L], expectation-numerator C[L]); the caller divides so the
    rounding site is shared with the SQL replay.  A[L] == 0 (an OOV
    char anywhere) makes the expectation undefined — callers emit
    NULL, mirroring the oracle's NULLIF."""
    L = len(word)
    A = [0.0] * (L + 1)
    C = [0.0] * (L + 1)
    A[0] = 1.0
    for j in range(1, L + 1):
        acc_a = 0.0
        acc_c = 0.0
        for d in range(max_piece_len, 0, -1):
            if d > j:
                continue
            p = probs.get(word[j - d : j])
            if p is None:
                if d != 1:
                    continue
                p = 0.0
            acc_a = acc_a + A[j - d] * p
            acc_c = acc_c + (C[j - d] + A[j - d]) * p
        A[j] = acc_a
        C[j] = acc_c
    return A[L], C[L]


def unigram_expected_fertility(
    docs: DataFrame,
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
) -> DataFrame:
    """Posterior-EXPECTED fertility per word under the trained unigram
    LM: (word, freq, expected_pieces) with expected_pieces =
    C[L]/A[L] rounded at 1e-9 — the exact mean segmentation length
    over the full posterior, completing the family's three stances:
    ``unigram_lm_segment`` (argmax), ``unigram_lm_sample_segment``
    (a draw), and this (the mean).  The gap between Viterbi n_pieces
    and the expectation is the segmentation-ambiguity signal Kudo's
    subword regularization exploits.

    Scale: identical posture to the other apply halves — one corpus
    wordcount shuffle, then an Arrow-batched per-word DP over the
    Heaps-bounded vocab table."""
    import math

    words, pieces = _em_loop(
        docs, iterations, max_piece_len, text_col, max_vocab_words
    )
    probs = _probs_from_rows(pieces.collect())

    def per_word(word: str) -> dict:
        a, c = expected_pieces_word(word, probs, max_piece_len)
        if a == 0.0:
            return {"expected_pieces": None}  # OOV char (oracle NULLIF)
        return {"expected_pieces": math.floor((c / a) * 1e9 + 0.5) / 1e9}

    return _map_words(
        words, "word string, freq long, expected_pieces double", per_word
    )


def unigram_fertility(
    docs: DataFrame,
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
    max_vocab_words: int | None = None,
) -> DataFrame:
    """Corpus fertility report for the trained unigram LM — the
    tokenizer-quality headline every tokenizer ships with (pieces per
    word; ``bpe_fertility`` is the BPE twin): ONE row of

    - ``n_words``: distinct vocabulary words segmented,
    - ``total_words``: corpus word occurrences (freq-weighted),
    - ``total_pieces``: corpus piece count under the model
      (freq x per-word path length, exact BIGINT),
    - ``max_pieces``: worst single-word segmentation length,
    - ``fertility``: total_pieces / total_words, rounded at 1e-6.

    Composes :func:`unigram_lm_segment` (the hash-verified apply
    half); the aggregate reads the vocab-sized segmentation table, so
    the only corpus-sized work remains the wordcount shuffle inside
    the trainer."""
    seg = unigram_lm_segment(
        docs, iterations, max_piece_len, text_col, max_vocab_words
    )
    totals = seg.agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("freq").cast("long").alias("total_words"),
        F.sum(F.col("freq") * F.col("n_pieces")).cast("long").alias("total_pieces"),
        F.max("n_pieces").cast("long").alias("max_pieces"),
    )
    return totals.select(
        "n_words",
        "total_words",
        "total_pieces",
        "max_pieces",
        F.round(
            F.col("total_pieces").cast("double")
            / F.col("total_words").cast("double"),
            6,
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle replay — kept in this module so the Viterbi DP and its
# SQL twin can only be edited together.  The DP recursion carries
# (best DOUBLE[], path VARCHAR[][]) per word — the path at each
# position is a NATIVE list of pieces, never a packed string, so
# parity holds for arbitrary text including control characters; each
# level j+1 scores the <= max_piece_len candidate pieces ending there.  Candidate
# probabilities are PRE-JOINED per (word, position) into a pivoted
# cg{t} grid OUTSIDE the recursion (they depend only on the word, not
# on DP state) — correlated scalar subqueries inside the recursive
# member mis-evaluate under DuckDB's expression dedup, and lateral
# left-joins on correlated columns are unsupported; a plain equi-join
# against the materialized grid sidesteps both.  Every non-recursive
# CTE is MATERIALIZED so engines can't re-inline a whole EM iteration
# per reference (the pretrain_funnel oracle precedent).
# ---------------------------------------------------------------------------


def _sql_cand(d: int) -> str:
    if d == 1:
        # d=1 is always viable: an OOV char degrades to a
        # zero-probability UNK piece (viterbi_word's char-fallback),
        # keeping the DP total over arbitrary text
        return "(list_extract(d.best, d.j + 1) * coalesce(c.p1, 0.0))"
    return (
        f"CASE WHEN c.p{d} IS NOT NULL THEN "
        f"list_extract(d.best, d.j + 2 - {d}) * c.p{d} ELSE -1.0 END"
    )


def _sql_path(d: int) -> str:
    # native list state (VARCHAR[] per position): no packed-string
    # separator, so parity holds for ARBITRARY text — a chr(1)-joined
    # encoding silently fractured pieces containing U+0001 (review r8)
    return (
        f"list_append(list_extract(d.path, d.j + 2 - {d}), "
        f"substr(d.word, d.j + 2 - {d}, {d}))"
    )


def _sql_cand_grid(name: str, probs_cte: str, max_piece_len: int) -> str:
    cols = ",\n         ".join(
        f"MAX(CASE WHEN l = {d} THEN p END) AS p{d}"
        for d in range(max_piece_len, 0, -1)
    )
    return f"""{name} AS MATERIALIZED (
  SELECT word, jnext,
         {cols}
  FROM (
    SELECT g.word, g.i + g.l - 1 AS jnext, g.l, pr.p
    FROM grid g JOIN {probs_cte} pr ON pr.piece = g.piece
  )
  GROUP BY word, jnext
)"""


def _sql_dp(name: str, cg_cte: str, max_piece_len: int) -> str:
    # the CASE scans d descending with >= — exact ties prefer the
    # longer piece, mirroring the Python DP's strict-greater
    # replacement over d = max..1
    cands = {d: _sql_cand(d) for d in range(max_piece_len, 0, -1)}
    branches = []
    ds = sorted(cands, reverse=True)
    for i, d in enumerate(ds[:-1]):
        conds = " AND ".join(f"{cands[d]} >= {cands[e]}" for e in ds[i + 1:])
        branches.append(f"WHEN {conds} THEN {_sql_path(d)}")
    branches.append(f"ELSE {_sql_path(ds[-1])}")
    case = "\n             ".join(branches)
    greatest = ", ".join(cands[d] for d in ds)
    return f"""{name} AS (
  SELECT word, freq, 0 AS j,
         [CAST(1.0 AS DOUBLE)] AS best, [CAST([] AS VARCHAR[])] AS path
  FROM w
  UNION ALL
  SELECT d.word, d.freq, d.j + 1,
         list_append(d.best, greatest({greatest})),
         list_append(d.path,
           CASE
             {case} END)
  FROM {name} d JOIN {cg_cte} c ON c.word = d.word AND c.jnext = d.j + 1
  WHERE d.j < length(d.word)
)"""


def _sql_em_iter(t: int, prev_probs: str, max_piece_len: int) -> str:
    return f"""{_sql_cand_grid(f"cg{t}", prev_probs, max_piece_len)},
{_sql_dp(f"dp{t}", f"cg{t}", max_piece_len)},
f{t} AS MATERIALIZED (
  SELECT word, freq, list_extract(path, length(word) + 1) AS path
  FROM dp{t} WHERE j = length(word)
),
u{t} AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS count
  FROM (SELECT freq, unnest(path) AS piece FROM f{t})
  GROUP BY piece
),
p{t} AS MATERIALIZED (
  SELECT piece, count FROM u{t} WHERE length(piece) > 1
  UNION ALL
  SELECT c.piece,
         GREATEST(COALESCE(u{t}.count, CAST(0 AS BIGINT)), CAST(1 AS BIGINT))
  FROM chars c LEFT JOIN u{t} USING (piece)
),
probs{t} AS MATERIALIZED (
  SELECT piece,
         CAST(count AS DOUBLE) / CAST((SELECT SUM(count) FROM p{t}) AS DOUBLE) AS p
  FROM p{t}
)"""


def _sql_head_and_iters(iterations: int, max_piece_len: int) -> tuple[str, str]:
    """Shared WITH-chain prefix of every unigram-LM oracle: word
    frequencies, substring grid, seed probabilities, and the
    ``iterations`` unrolled EM rounds (probs{T} is the trained model)."""
    head = f"""WITH RECURSIVE w AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) > 0 GROUP BY word
),
grid AS MATERIALIZED (
  SELECT word, freq, i, l, substr(word, i, l) AS piece
  FROM (
    SELECT word, freq, i, unnest(range(1, {max_piece_len} + 1)) AS l
    FROM (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i FROM w)
  )
  WHERE i + l - 1 <= length(word)
),
chars AS MATERIALIZED (SELECT DISTINCT piece FROM grid WHERE l = 1),
p0 AS MATERIALIZED (SELECT piece, CAST(SUM(freq) AS BIGINT) AS count FROM grid GROUP BY piece),
probs0 AS MATERIALIZED (
  SELECT piece,
         CAST(count AS DOUBLE) / CAST((SELECT SUM(count) FROM p0) AS DOUBLE) AS p
  FROM p0
),
"""
    iters = ",\n".join(
        _sql_em_iter(t, f"probs{t-1}", max_piece_len)
        for t in range(1, iterations + 1)
    )
    return head, iters


def unigram_lm_oracle_sql(
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
    segment: bool = False,
) -> str:
    """Full chained-CTE DuckDB replay of ``unigram_lm_train`` (or,
    with ``segment=True``, ``unigram_lm_segment``) at their DEFAULT
    parameters: seed counts -> ``iterations`` unrolled hard-EM rounds
    (candidate grid -> recursive Viterbi -> usage counts ->
    smoothed/pruned inventory) -> final probabilities / segmentation.
    Bit-exact, not approximate: both engines do the same integer
    counts, the same count/total division, and the same fixed-order
    double products.

    Scope (ADVICE r8): the ``target_vocab`` and ``max_vocab_words``
    code paths of the Spark trainer have no counterpart here — the
    catalog registers only the default path, so driver parity covers
    exactly what this SQL replays; the pruning/cap branches are
    covered by pytest invariants (tests/test_unigram_lm.py) instead.
    A top-N CTE keyed by (count DESC, piece ASC) could extend the
    replay if a pruned entry is ever registered."""
    head, iters = _sql_head_and_iters(iterations, max_piece_len)
    T = iterations
    if not segment:
        return head + iters + f"""
SELECT piece, count,
       CAST(count AS DOUBLE) / CAST((SELECT SUM(count) FROM p{T}) AS DOUBLE) AS prob
FROM p{T}"""
    final_path = "list_extract(path, length(word) + 1)"
    return head + iters + f""",
{_sql_cand_grid("cgseg", f"probs{T}", max_piece_len)},
{_sql_dp("dpseg", "cgseg", max_piece_len)}
SELECT word, freq,
       array_to_string({final_path}, ' ') AS pieces,
       CAST(len({final_path}) AS BIGINT) AS n_pieces,
       list_extract(best, length(word) + 1) AS score
FROM dpseg WHERE j = length(word)"""


def _sql_fwd_term(d: int) -> str:
    """Forward-mass term for a length-``d`` piece ending at position
    d.j + 1 (0.0 when the piece is absent — adding 0.0 is the IEEE
    identity the Python side exploits by skipping)."""
    if d == 1:
        return "(list_extract(d.fa, d.j + 1) * coalesce(c.p1, 0.0))"
    return (
        f"CASE WHEN c.p{d} IS NOT NULL THEN "
        f"list_extract(d.fa, d.j + 2 - {d}) * c.p{d} ELSE 0.0 END"
    )


def _sql_exp_terms(d: int) -> tuple[str, str]:
    """(mass term, expectation term) for a length-``d`` piece ending
    at position d.j + 1 in the expected-fertility forward recursion.
    The mass half IS :func:`_sql_fwd_term` (one definition — review
    r9), so the sampled-segmentation and expected-fertility oracles
    can never compute different forward masses for the same model."""
    if d == 1:
        cc = (
            "((list_extract(d.fc, d.j + 1) + list_extract(d.fa, d.j + 1))"
            " * coalesce(c.p1, 0.0))"
        )
    else:
        cc = (
            f"CASE WHEN c.p{d} IS NOT NULL THEN "
            f"(list_extract(d.fc, d.j + 2 - {d}) + "
            f"list_extract(d.fa, d.j + 2 - {d})) * c.p{d} ELSE 0.0 END"
        )
    return _sql_fwd_term(d), cc


def unigram_expected_fertility_oracle_sql(
    iterations: int = EM_ITERATIONS,
    max_piece_len: int = MAX_PIECE_LEN,
) -> str:
    """Bit-exact DuckDB replay of ``unigram_expected_fertility``: the
    shared unrolled-EM head, then ONE forward recursion carrying both
    the mass list ``fa`` and the expectation-numerator list ``fc``
    (fixed d-descending sums), finishing with the single shared
    rounding site floor((C/A) * 1e9 + 0.5) / 1e9 and NULLIF for the
    zero-mass (OOV) case."""
    head, iters = _sql_head_and_iters(iterations, max_piece_len)
    T = iterations
    ds = list(range(max_piece_len, 0, -1))
    a0, c0 = _sql_exp_terms(ds[0])
    sum_a, sum_c = a0, c0
    for d in ds[1:]:
        a_t, c_t = _sql_exp_terms(d)
        sum_a = f"({sum_a} + {a_t})"
        sum_c = f"({sum_c} + {c_t})"
    return head + iters + f""",
{_sql_cand_grid("cgexp", f"probs{T}", max_piece_len)},
fexp AS (
  SELECT word, freq, 0 AS j,
         [CAST(1.0 AS DOUBLE)] AS fa, [CAST(0.0 AS DOUBLE)] AS fc
  FROM w
  UNION ALL
  SELECT d.word, d.freq, d.j + 1,
         list_append(d.fa, {sum_a}),
         list_append(d.fc, {sum_c})
  FROM fexp d JOIN cgexp c ON c.word = d.word AND c.jnext = d.j + 1
  WHERE d.j < length(d.word)
)
SELECT word, freq,
       floor((list_extract(fc, length(word) + 1)
              / NULLIF(list_extract(fa, length(word) + 1), 0.0))
             * 1000000000 + 0.5) / 1000000000 AS expected_pieces
FROM fexp WHERE j = length(word)"""


def _sql_bwd_term(d: int) -> str:
    """Backward-sampling term for a length-``d`` piece ending at
    position ``j`` — written over the UNPREFIXED (fa, j, p{d}) columns
    the inner projection of the bwd recursion exposes."""
    if d == 1:
        return "(list_extract(fa, j) * coalesce(p1, 0.0))"
    return (
        f"CASE WHEN p{d} IS NOT NULL THEN "
        f"list_extract(fa, j + 1 - {d}) * p{d} ELSE 0.0 END"
    )


def unigram_lm_sample_oracle_sql(
    iterations: int = EM_ITERATIONS,
    epoch: int = 0,
    max_piece_len: int = MAX_PIECE_LEN,
) -> str:
    """Bit-exact DuckDB replay of ``unigram_lm_sample_segment`` —
    train probs{T} via the shared unrolled-EM chain, then FFBS:

    - ``fwd`` recursion carries the forward-mass list A as ``fa``,
      each level appending the fixed-order sum of candidate terms
      (d descending, 0.0 for absent pieces — the same chain the
      Python accumulates);
    - ``bwd`` recursion walks j downward, choosing the piece whose
      d-descending cumulative sum first exceeds
      target = u_j * A[j] (the threshold-multiplication form — no
      division anywhere), with the ELSE falling back to the single
      char exactly like :func:`sample_segment_word`; the chosen
      piece's probability folds into ``sp`` in the same selection
      order the Python multiplies.
    """
    head, iters = _sql_head_and_iters(iterations, max_piece_len)
    T = iterations
    ds = list(range(max_piece_len, 0, -1))
    fwd_sum = _sql_fwd_term(ds[0])
    for d in ds[1:]:
        fwd_sum = f"({fwd_sum} + {_sql_fwd_term(d)})"
    # backward: cumulative thresholds in the SAME d-descending order
    u_expr = (
        f"(CAST('0x' || substr(md5('sr{epoch}:' || b.word || ':' || "
        f"CAST(b.j AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
    )
    target = f"({u_expr} * list_extract(b.fa, b.j + 1))"
    p_cols = ", ".join(f"c.p{d} AS p{d}" for d in ds)
    piece_br, prob_br = [], []
    cum = None
    for d in ds:
        cum = _sql_bwd_term(d) if cum is None else f"({cum} + {_sql_bwd_term(d)})"
        piece = f"substr(word, j + 1 - {d}, {d})"
        p_d = f"p{d}" if d > 1 else "coalesce(p1, 0.0)"
        piece_br.append(f"WHEN __t < {cum} THEN {piece}")
        prob_br.append(f"WHEN __t < {cum} THEN {p_d}")
    piece_case = (
        "CASE\n      "
        + "\n      ".join(piece_br)
        + "\n      ELSE substr(word, j, 1) END"
    )
    prob_case = (
        "CASE\n      "
        + "\n      ".join(prob_br)
        + "\n      ELSE coalesce(p1, 0.0) END"
    )
    return head + iters + f""",
{_sql_cand_grid("cgsmp", f"probs{T}", max_piece_len)},
fwd AS (
  SELECT word, freq, 0 AS j, [CAST(1.0 AS DOUBLE)] AS fa FROM w
  UNION ALL
  SELECT d.word, d.freq, d.j + 1, list_append(d.fa, {fwd_sum})
  FROM fwd d JOIN cgsmp c ON c.word = d.word AND c.jnext = d.j + 1
  WHERE d.j < length(d.word)
),
ffinal AS MATERIALIZED (
  SELECT word, freq, fa FROM fwd WHERE j = length(word)
),
bwd AS (
  SELECT word, freq, fa, length(word) AS j,
         CAST([] AS VARCHAR[]) AS rpieces, CAST(1.0 AS DOUBLE) AS sp
  FROM ffinal
  UNION ALL
  SELECT word, freq, fa,
         j - length(__piece) AS j,
         list_append(rpieces, __piece) AS rpieces,
         sp * __p AS sp
  FROM (
    SELECT word, freq, fa, j, rpieces, sp,
           {piece_case} AS __piece,
           {prob_case} AS __p
    FROM (
      SELECT b.word AS word, b.freq AS freq, b.fa AS fa, b.j AS j,
             b.rpieces AS rpieces, b.sp AS sp,
             {target} AS __t,
             {p_cols}
      FROM bwd b JOIN cgsmp c ON c.word = b.word AND c.jnext = b.j
      WHERE b.j > 0
    )
  )
)
SELECT word, freq,
       array_to_string(list_reverse(rpieces), ' ') AS pieces,
       CAST(len(rpieces) AS BIGINT) AS n_pieces,
       sp AS sample_prob
FROM bwd WHERE j = 0"""
