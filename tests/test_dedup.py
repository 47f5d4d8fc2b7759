"""Dedup operator invariants (beyond the DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import dedup


def test_exact_dedup_idempotent(docs):
    """Dedup of an already-deduped corpus keeps every row."""
    first = dedup.dedup_exact(docs)
    assert first.count() == docs.select("text").distinct().count()
    kept = docs.join(
        first.select(F.col("keep_id").alias("doc_id")), "doc_id", "inner"
    )
    second = dedup.dedup_exact(kept)
    assert second.count() == kept.count()
    assert second.agg(F.max("n_copies")).collect()[0][0] == 1


def test_exact_dedup_finds_planted_duplicates(docs):
    """Exact copies (identical text) collapse to one keeper."""
    clone = docs.limit(20).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(clone)
    result = dedup.dedup_exact(corpus)
    dups = result.filter(F.col("n_copies") == 2)
    assert dups.count() == 20
    # keeper is always the original (lower id)
    assert dups.agg(F.max("keep_id")).collect()[0][0] < 500_000


def test_minhash_recall_on_mutated_corpus(docs):
    """Every planted near-dup (original, original+suffix) must surface
    as a candidate pair with high estimated Jaccard."""
    corpus = dedup.with_mutated_copies(docs, every=10)
    n_planted = docs.filter(F.col("doc_id") % 10 == 0).count()
    pairs = dedup.minhash_lsh_pairs(corpus).collect()
    planted_found = {
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if r["doc_b"] == r["doc_a"] + 100_000
    }
    recall = len(planted_found) / n_planted
    assert recall >= 0.9, f"minhash recall {recall} over {n_planted} planted pairs"
    for r in pairs:
        if r["doc_b"] == r["doc_a"] + 100_000:
            assert r["est_jaccard"] >= 0.5


def test_minhash_xxhash64_path_equivalent_recall(docs):
    """The production hash (seeded xxhash64, no hex formatting) must
    find the planted near-dups just like the oracle-portable md5 path
    — same operating point, different hash family."""
    corpus = dedup.with_mutated_copies(docs, every=10)
    n_planted = docs.filter(F.col("doc_id") % 10 == 0).count()
    pairs = dedup.minhash_lsh_pairs(corpus, hash_fn="xxhash64").collect()
    planted_found = {
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if r["doc_b"] == r["doc_a"] + 100_000
    }
    recall = len(planted_found) / n_planted
    assert recall >= 0.9, f"xxhash64 minhash recall {recall} over {n_planted}"
    for r in pairs:
        if r["doc_b"] == r["doc_a"] + 100_000:
            assert r["est_jaccard"] >= 0.5


def test_simhash_blocking_finds_cross_block_pairs(spark):
    """Round-1 regression: a hamming-2 pair with one differing bit in
    each 16-bit half shared neither half-block and was silently
    dropped.  The (max_hamming + 1)-block scheme must find every pair
    within the promised distance — planted signatures exercise
    distances 2 and 3 spread across the old halves, plus a
    distance-4 candidate that must be verified away."""
    sigs = spark.createDataFrame(
        [
            (1, 0),
            (2, (1 << 3) | (1 << 20)),              # d(1,2)=2, one bit per old half
            (3, (1 << 5) | (1 << 13) | (1 << 27)),  # d(1,3)=3, spread over 3 blocks
            (4, 0b1111 << 14),                      # d(1,4)=4 -> candidate, verified out
        ],
        ["doc_id", "simhash"],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs_from_signatures(sigs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 2
    assert pairs[(1, 3)] == 3
    assert (1, 4) not in pairs


def test_simhash_block_ranges_cover_all_bits():
    ranges = dedup.simhash_block_ranges(3, 32)
    assert len(ranges) == 4
    covered = sorted(
        bit for off, width in ranges for bit in range(off, off + width)
    )
    assert covered == list(range(32))


def test_simhash64_block_ranges_16bit_wide():
    """The 64-bit configuration's pigeonhole blocks are 16 bits wide
    (65536 values) — the property that keeps candidate buckets
    O(n / 65536) at billion-doc scale."""
    assert dedup.simhash_block_ranges(3, 64) == [(0, 16), (16, 16), (32, 16), (48, 16)]


def test_simhash64_sign_bit_is_blocked_and_verified(spark):
    """Bit 63 lands in the BIGINT sign bit: a negative signature must
    still block correctly (arithmetic shift's sign-extension is masked
    off) and verify via xor/popcount."""
    hi = -(1 << 63)  # only bit 63 set, as a signed long
    sigs = spark.createDataFrame(
        [(1, hi), (2, hi | (1 << 5)), (3, 1 << 5)],
        "doc_id long, simhash long",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs_from_signatures(sigs, max_hamming=3, bits=64).collect()
    }
    assert pairs[(1, 2)] == 1   # differ only in bit 5
    assert pairs[(2, 3)] == 1   # differ only in sign bit
    assert pairs[(1, 3)] == 2


def test_simhash_64_vs_32_operating_point(docs):
    """32-bit and 64-bit signatures are different operating points at
    the same max_hamming: a given text edit flips ~2x the bits in a
    64-bit signature, so d<=3 on 64 bits (the Manku et al. WWW'07
    web-dedup configuration) is STRICTER.  Invariants that hold by
    construction: exact copies collide at hamming 0 in both widths,
    and the 64-bit pair set at the same threshold is higher-precision
    (never more candidates) on the fixture corpus."""
    exact = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = dedup.with_mutated_copies(docs).unionByName(exact)
    p32 = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup.simhash_pairs(corpus).collect()}
    p64 = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup.simhash_pairs(corpus, bits=64).collect()}
    for base in range(20):  # every exact copy found at distance 0, both widths
        assert p32[(base, base + 500_000)] == 0
        assert p64[(base, base + 500_000)] == 0
    assert len(p64) <= len(p32)  # 256x keyspace -> fewer incidental candidates


def test_simhash_exact_copy_distance_zero(docs):
    """An exact copy has the identical simhash (hamming 0)."""
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 500_000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    pairs = dedup.simhash_pairs(corpus, max_hamming=0)
    exact = {
        (r["doc_a"], r["doc_b"]) for r in pairs.collect() if r["doc_b"] == r["doc_a"] + 500_000
    }
    assert len(exact) == 20


def test_ngram_jaccard_self_similarity(docs):
    """jaccard(doc, exact copy) == 1.0 via the inverted index."""
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 500_000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    pairs = dedup.ngram_jaccard_pairs(corpus, min_jaccard=0.99)
    perfect = [r for r in pairs.collect() if r["doc_b"] == r["doc_a"] + 500_000]
    assert len(perfect) == 10
    assert all(abs(r["jaccard"] - 1.0) < 1e-12 for r in perfect)


def test_embedding_neardup_finds_perturbed(embeddings):
    """Label-blocked mode: exactly the perturbed-copy pairs whose true
    cosine clears the threshold are returned — verified against a
    NumPy recomputation — and no unrelated pair sneaks in."""
    import numpy as np

    corpus = dedup.with_perturbed_vectors(embeddings, every=10)
    pairs = dedup.embedding_neardup_pairs(corpus, min_cosine=0.9, block_col="label").collect()

    base = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }
    expected = 0
    for vid, v in base.items():
        if vid % 10 != 0:
            continue
        w = v.copy()
        w[0] += 0.5
        cos = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        if round(cos, 6) >= 0.9:
            expected += 1
    planted = [r for r in pairs if r["vec_b"] == r["vec_a"] + 100_000]
    assert len(planted) == expected > 0
    # blocking + threshold: every returned pair is a planted one
    assert len(pairs) == len(planted)
    assert all(r["cosine"] >= 0.9 for r in pairs)


def test_embedding_neardup_lsh_default_recall(embeddings):
    """The label-free default (sign-LSH bucket blocking) is the
    production path: it must stay threshold-correct (no pair below
    min_cosine) and recover a measured fraction of the label-blocked
    reference pairs — the recall cost of not needing labels."""
    corpus = dedup.with_perturbed_vectors(embeddings, every=10)
    ref = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_neardup_pairs(
            corpus, min_cosine=0.9, block_col="label"
        ).collect()
    }
    got_rows = dedup.embedding_neardup_pairs(corpus, min_cosine=0.9).collect()
    assert all(r["cosine"] >= 0.9 for r in got_rows)
    got = {(r["vec_a"], r["vec_b"]) for r in got_rows}
    recall = len(ref & got) / len(ref)
    assert recall >= 0.5, f"LSH-bucket recall {recall} vs label blocking over {len(ref)} pairs"


def test_ngram_stop_shingle_cap(spark):
    """Docs that share ONLY a hot boilerplate shingle pair up without
    the df cap and stop pairing with it; genuinely similar docs
    (sharing a rare shingle) survive the cap."""
    boiler = [(i, f"lorem ipsum dolor u{i} v{i} w{i}") for i in range(12)]
    near = [(100, "aa bb cc dd"), (101, "aa bb cc ee")]
    docs = spark.createDataFrame(boiler + near, ["doc_id", "text"])

    uncapped = dedup.ngram_jaccard_pairs(docs, min_jaccard=0.1).collect()
    boiler_pairs = [r for r in uncapped if r["doc_a"] < 100 and r["doc_b"] < 100]
    assert len(boiler_pairs) == 12 * 11 // 2  # quadratic blowup on the hot shingle

    capped = dedup.ngram_jaccard_pairs(docs, min_jaccard=0.1, max_shingle_df=5).collect()
    assert [r for r in capped if r["doc_a"] < 100 and r["doc_b"] < 100] == []
    kept = [(r["doc_a"], r["doc_b"]) for r in capped]
    assert (100, 101) in kept  # rare-shingle pair survives


def test_connected_components_bounded_cache_and_warning(spark):
    """The label-propagation loop must not accumulate cached plans
    (round-1 leak: one cache per round) and must warn when it exits
    without a convergence witness."""
    import pytest

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["doc_a", "doc_b"]
    )
    comp = dedup.connected_components(chain)
    assert {r["component"] for r in comp.collect()} == {0}
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 1  # only the final label set may stay cached

    with pytest.warns(RuntimeWarning, match="no convergence witness"):
        dedup.connected_components(chain, max_iter=2)


def test_connected_components_known_graph(spark):
    """Chain 1-2-3, pair 10-11, triangle 20-21-22 + isolated-by-absence
    nodes collapse to min-label components."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    comp = {r["doc_id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_decision_end_to_end(docs):
    """Pairs from MinHash -> components -> exactly one canonical doc
    per component; every planted mutated copy is non-canonical."""
    corpus = dedup.with_mutated_copies(docs, every=10)
    pairs = dedup.minhash_lsh_pairs(corpus).filter(F.col("est_jaccard") >= 0.5)
    decision = dedup.dedup_decision(corpus, pairs)
    rows = decision.collect()
    assert len(rows) == corpus.count()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp_rows in by_comp.values():
        canonicals = [r for r in comp_rows if r["is_canonical"]]
        assert len(canonicals) == 1
        assert canonicals[0]["doc_id"] == min(r["doc_id"] for r in comp_rows)
    # A planted copy (id >= 100k) can only be canonical if LSH missed
    # its pair entirely (it is then its own singleton component) — the
    # hard guarantee is that every PAIRED copy is non-canonical (its
    # original has the lower id), and misses stay within the measured
    # LSH recall bound (>= 0.9; 48/50 with the round-3 lane hashes —
    # candidate probability is 1-(1-j^4)^4, borderline pairs are coin
    # flips by design).
    n_planted = sum(1 for r in rows if r["doc_id"] >= 100_000)
    planted_canonical = [
        r for r in rows if r["doc_id"] >= 100_000 and r["is_canonical"]
    ]
    assert len(planted_canonical) <= 0.1 * n_planted
    for r in planted_canonical:  # only-singleton escape hatch
        assert len(by_comp[r["component"]]) == 1


def test_normalize_text_canonicalizes(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   World "), (2, "hello world")], ["doc_id", "text"]
    )
    out = df.select(dedup.normalize_text(F.col("text")).alias("t")).collect()
    assert out[0]["t"] == out[1]["t"] == "hello world"


def test_connected_components_string_ids(spark):
    """Doc ids are often content hashes (strings): the convergence
    witness must be type-agnostic (round-2 review: SUM over string
    labels crashed under ANSI, silently mis-converged otherwise)."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["doc_a", "doc_b"]
    )
    comp = {r["doc_id"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_incremental_dedup_verdicts(docs):
    """Exact copies label 'exact', mutated copies mostly 'near' (LSH
    recall bound), novel synthetic docs 'new'; one verdict per batch
    doc."""
    corpus = docs.select("doc_id", "text")
    exact_b = corpus.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 200_000).alias("doc_id"), "text"
    )
    near_b = corpus.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix tokens")).alias("text"),
    )
    new_b = corpus.filter(F.col("doc_id") % 10 == 7).select(
        (F.col("doc_id") + 300_000).alias("doc_id"),
        F.concat(
            F.lit("entirely novel synthetic document body number "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    batch = exact_b.unionByName(near_b).unionByName(new_b)
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in dedup.incremental_dedup(corpus, batch).collect()
    }
    assert len(verdicts) == batch.count()

    exact_ids = [r["doc_id"] for r in exact_b.select("doc_id").collect()]
    near_ids = [r["doc_id"] for r in near_b.select("doc_id").collect()]
    new_ids = [r["doc_id"] for r in new_b.select("doc_id").collect()]
    assert all(verdicts[i] == "exact" for i in exact_ids)
    assert all(verdicts[i] == "new" for i in new_ids)
    # mutated copies: never 'exact'; 'near' at >= the measured LSH
    # recall bound (borderline est_jaccard pairs are coin flips by
    # design, identical coin flips in the oracle)
    assert all(verdicts[i] != "exact" for i in near_ids)
    n_near = sum(1 for i in near_ids if verdicts[i] == "near")
    assert n_near >= 0.9 * len(near_ids), f"{n_near}/{len(near_ids)} near"


def test_incremental_dedup_short_docs_exact_only(spark):
    """Docs below shingle width have no signature: byte-identical short
    docs still label 'exact', distinct short docs fall through to
    'new' (never crash, never near-match)."""
    corpus = spark.createDataFrame([(1, "hi"), (2, "tiny doc")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(100, "hi"), (101, "yo"), (102, "tiny doc")], ["doc_id", "text"]
    )
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in dedup.incremental_dedup(corpus, batch).collect()
    }
    assert verdicts == {100: "exact", 101: "new", 102: "exact"}


def test_incremental_dedup_persisted_corpus_sigs(docs, tmp_path):
    """Production path: a persisted corpus signature + hash table
    (written to disk, re-read) yields verdicts identical to
    recomputing from corpus text — the batch is the only side that
    ever pays shingling cost."""
    spark = docs.sparkSession
    corpus = docs.select("doc_id", "text")
    batch = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra suffix tokens")).alias("text"),
    )

    sig_dir = str(tmp_path / "corpus_sigs")
    hash_dir = str(tmp_path / "corpus_hashes")
    dedup.minhash_signatures(corpus).write.parquet(sig_dir)
    corpus.select(
        F.sha2(F.col("text"), 256).alias("content_sha")
    ).distinct().write.parquet(hash_dir)

    from_disk = dedup.incremental_dedup(
        corpus,
        batch,
        corpus_sigs=spark.read.parquet(sig_dir),
        corpus_hashes=spark.read.parquet(hash_dir),
    )
    recomputed = dedup.incremental_dedup(corpus, batch)
    key = lambda r: (r["doc_id"], r["verdict"])
    assert sorted(map(key, from_disk.collect())) == sorted(
        map(key, recomputed.collect())
    )


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_merges_overlapping_windows(spark):
    """A 12-token run shared by two docs is one span of length 12 —
    the 5 overlapping 8-token windows merge, they don't re-count."""
    shared = " ".join(f"s{i}" for i in range(12))
    d = _span_docs(
        spark,
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(6))),
            (2, " ".join(f"b{i}" for i in range(6)) + " " + shared),
        ],
    )
    got = {r["doc_id"]: r for r in dedup.duplicate_spans(d, min_len=8).collect()}
    assert set(got) == {1, 2}
    for doc_id in (1, 2):
        assert got[doc_id]["n_dup_spans"] == 1
        assert got[doc_id]["dup_tokens"] == 12
        assert got[doc_id]["n_tokens"] == 18
        assert got[doc_id]["dup_frac"] == round(12 / 18, 6)


def test_duplicate_spans_gap_yields_two_spans(spark):
    """Two shared 8-token runs separated by unique middles are two
    spans per doc, not one merged blob."""
    run1 = " ".join(f"x{i}" for i in range(8))
    run2 = " ".join(f"y{i}" for i in range(8))
    d = _span_docs(
        spark,
        [
            (1, f"{run1} m1 m2 m3 {run2}"),
            (2, f"{run2} n1 n2 n3 n4 {run1}"),
        ],
    )
    got = {r["doc_id"]: r for r in dedup.duplicate_spans(d, min_len=8).collect()}
    assert got[1]["n_dup_spans"] == 2
    assert got[1]["dup_tokens"] == 16
    assert got[2]["n_dup_spans"] == 2


def test_duplicate_spans_ignores_within_doc_repeats_and_short_docs(spark):
    """A run repeated only inside ONE doc is not cross-doc duplicated;
    docs shorter than min_len never produce shingles."""
    run = " ".join(f"r{i}" for i in range(8))
    d = _span_docs(
        spark,
        [
            (1, f"{run} mid {run}"),  # within-doc repeat only
            (2, "tiny doc"),  # < min_len tokens
            (3, " ".join(f"u{i}" for i in range(20))),  # all unique
        ],
    )
    assert dedup.duplicate_spans(d, min_len=8).count() == 0


def test_duplicate_spans_single_join_no_cartesian(docs):
    from mapreduceimpl_spark.plans import assert_no_cartesian

    assert_no_cartesian(dedup.duplicate_spans(docs))


def test_duplicate_spans_randomized_vs_python_reference(spark):
    """30 seeded random docs with planted shared runs: the Spark
    pipeline must equal an independent pure-Python computation of
    cross-doc duplicated 8-gram interval unions."""
    import random

    rng = random.Random(4242)
    shared = [
        [f"run{r}_{i}" for i in range(rng.randint(8, 20))] for r in range(6)
    ]
    docs = []
    for d in range(30):
        toks = [f"u{d}_{i}" for i in range(rng.randint(0, 40))]
        for r in rng.sample(range(6), rng.randint(0, 3)):
            pos = rng.randint(0, len(toks))
            toks = toks[:pos] + shared[r] + toks[pos:]
        docs.append((d, " ".join(toks)))

    L = 8
    occ: dict[tuple, list] = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(max(0, len(toks) - L + 1)):
            occ.setdefault(tuple(toks[i : i + L]), []).append((doc_id, i))
    expected: dict[int, list] = {}
    for gram, hits in occ.items():
        if len({d for d, _ in hits}) > 1:
            for d, i in hits:
                expected.setdefault(d, []).append((i, i + L - 1))
    exp_rows = {}
    for d, ivals in expected.items():
        ivals.sort()
        merged = [list(ivals[0])]
        for lo, hi in ivals[1:]:
            if lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        n_tok = len(docs[d][1].split(" "))
        exp_rows[d] = (
            n_tok,
            len(merged),
            sum(hi - lo + 1 for lo, hi in merged),
        )

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"])
        for r in dedup.duplicate_spans(sdf, min_len=8).collect()
    }
    assert got == exp_rows


def test_fuzzy_join_finds_typos_not_strangers(spark):
    """Classic record-linkage fixture: typo'd names match their
    source above 0.5, unrelated names don't; normalization makes
    case/whitespace-only variants score 1.0."""
    left = spark.createDataFrame(
        [(1, "Acme Corporation"), (2, "Globex Industries"), (3, "Initech LLC")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [
            (10, "acme  corporation"),   # normalization-equal to 1
            (11, "Globex Industies"),    # typo of 2
            (12, "Umbrella Group"),      # stranger
        ],
        "id long, text string",
    )
    got = {
        (r["l_id"], r["r_id"]): r["jaccard"]
        for r in dedup.fuzzy_join(left, right, min_jaccard=0.5).collect()
    }
    assert got[(1, 10)] == 1.0
    assert 0.5 <= got[(2, 11)] < 1.0
    assert all(r != 12 for (_, r) in got)


def test_fuzzy_join_stop_shingle_cap(spark):
    """With a df cap, a gram shared by every row (' co') is dropped
    from BOTH sides' universes; the distinguishing grams still match
    the true pair."""
    left = spark.createDataFrame(
        [(1, "alpha co"), (2, "beta co")], "id long, text string"
    )
    right = spark.createDataFrame(
        [(11, "alpha co"), (12, "gamma co")], "id long, text string"
    )
    capped = {
        (r["l_id"], r["r_id"])
        for r in dedup.fuzzy_join(
            left, right, min_jaccard=0.9, max_shingle_df=3
        ).collect()
    }
    assert (1, 11) in capped
    assert (2, 12) not in capped


def test_fuzzy_join_no_cartesian(spark):
    from mapreduceimpl_spark.plans import assert_no_cartesian

    left = spark.createDataFrame([(1, "abc def")], "id long, text string")
    right = spark.createDataFrame([(2, "abc xyz")], "id long, text string")
    assert_no_cartesian(dedup.fuzzy_join(left, right))


def test_minhash_verified_subset_of_candidates(docs):
    """Verification can only REMOVE candidate pairs, and every
    surviving pair carries an exact Jaccard >= the threshold."""
    corpus = dedup.with_mutated_copies(docs)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(corpus).collect()
    }
    verified = dedup.minhash_verified_pairs(corpus, min_jaccard=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in verified} <= cands
    assert all(r["jaccard"] >= 0.5 for r in verified)
    assert len(verified) > 0


def test_minhash_verified_jaccard_matches_exact_pass(docs):
    """The exact Jaccard computed per candidate (array intersection)
    must equal the inverted-index formulation on shared pairs — same
    shingle universe, same ratio."""
    corpus = dedup.with_mutated_copies(docs)
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in dedup.ngram_jaccard_pairs(corpus, min_jaccard=0.5).collect()
    }
    for r in dedup.minhash_verified_pairs(corpus, min_jaccard=0.5).collect():
        key = (r["doc_a"], r["doc_b"])
        assert key in exact, key
        assert r["jaccard"] == exact[key], key


def test_minhash_verified_drops_low_jaccard_candidates(spark):
    """A pair that collides on one band but shares few shingles must
    be admitted as a candidate yet rejected by verification."""
    # identical first 3 tokens (one shared shingle region), divergent tails
    base = "alpha beta gamma " + " ".join(f"x{i}" for i in range(30))
    other = "alpha beta gamma " + " ".join(f"y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    verified = dedup.minhash_verified_pairs(df, min_jaccard=0.5).collect()
    assert verified == []  # true jaccard ~ 1/63, must not survive


def test_fuzzy_join_verified_levenshtein_filter(spark):
    """A transposition-level typo passes verification; a different
    string that happens to share many grams (high Jaccard, high edit
    distance) is rejected — the case the verify tier exists for."""
    left = spark.createDataFrame(
        [(1, "acme corporation"), (2, "abc abc abc abc")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        # 11: one-char typo of 1.  22: same gram SET as 2 but rotated
        # (shared 3-gram vocabulary, large edit distance)
        [(11, "acme corporatoin"), (22, "bca bca bca bca")],
        "id long, text string",
    )
    got = {
        (r["l_id"], r["r_id"]): r
        for r in dedup.fuzzy_join_verified(
            left, right, min_jaccard=0.2, min_similarity=0.8
        ).collect()
    }
    assert (1, 11) in got
    assert got[(1, 11)]["edit_distance"] == 2  # transposed 'oi'
    assert (2, 22) not in got  # gram-similar, edit-far


def test_fuzzy_join_verified_subset_of_candidates(spark):
    left = spark.createDataFrame(
        [(i, f"item number {i} common suffix words") for i in range(20)],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [(i + 100, f"item number {i} common sufix words") for i in range(20)],
        "id long, text string",
    )
    cands = {
        (r["l_id"], r["r_id"])
        for r in dedup.fuzzy_join(left, right, min_jaccard=0.3).collect()
    }
    verified = dedup.fuzzy_join_verified(
        left, right, min_jaccard=0.3, min_similarity=0.9
    ).collect()
    assert {(r["l_id"], r["r_id"]) for r in verified} <= cands
    assert all(r["similarity"] >= 0.9 for r in verified)
    # every true typo pair survives
    assert {(i, i + 100) for i in range(20)} <= {
        (r["l_id"], r["r_id"]) for r in verified
    }


def test_prefix_filter_equals_inverted_index(docs):
    """Prefix filtering is EXACT: same pairs, same jaccard values as the
    full inverted-index formulation."""
    corpus = dedup.with_mutated_copies(docs)
    a = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.prefix_filter_pairs(corpus, min_jaccard=0.5).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(corpus, min_jaccard=0.5).collect()
    }
    assert a == b and len(a) > 0


def test_prefix_filter_prunes_candidates(docs):
    """The prefix join materializes strictly fewer candidate pairs than
    the full shingle join (the point of the technique)."""
    corpus = dedup.with_mutated_copies(docs)
    sh = dedup.ngram_shingles(corpus, 3)
    full = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    kept = dedup.prefix_filter_pairs(corpus, min_jaccard=0.5).count()
    # reconstruct candidate count: run the internal prefix join by reusing
    # the operator at threshold 0 on candidates is awkward; instead assert
    # the final output is a small fraction of the full candidate space and
    # equals the exact answer (exactness proven in the sibling test)
    assert kept < full


def test_prefix_filter_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # shingles: abc bcd cde def
            (2, "a b c d e z"),      # shingles: abc bcd cde dez -> inter 3, union 5
            (3, "q r s t u v"),
        ],
        ["doc_id", "text"],
    )
    rows = dedup.prefix_filter_pairs(df, min_jaccard=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["jaccard"] == 3.0 / 5.0


def test_prefix_filter_integral_threshold_boundary(spark):
    """min_jaccard where t*|S| is mathematically integral (0.1*30=3):
    IEEE rounds 0.1*30 a hair ABOVE 3, and a naive ceil would shorten
    the prefix by one and lose boundary pairs — the epsilon-safe
    overlap must keep output == the exact inverted-index answer."""
    # 32-token docs -> 30 distinct trigram shingles each
    base = [f"t{i}" for i in range(32)]
    other = [f"u{i}" for i in range(32)]
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(base[:16] + other[16:])), (3, " ".join(other))],
        ["doc_id", "text"],
    )
    a = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.prefix_filter_pairs(df, min_jaccard=0.1).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, min_jaccard=0.1).collect()
    }
    assert a == b and len(a) > 0


def test_containment_scores_embedded_doc_full(spark):
    """A small doc whose shingles all appear in a larger doc scores
    containment 1.0 even though Jaccard is far below threshold."""
    from mapreduceimpl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    big = " ".join(f"w{i}" for i in range(40))
    small = " ".join(f"w{i}" for i in range(10, 16))  # embedded span
    docs = spark.createDataFrame([(1, big), (2, small)], ["doc_id", "text"])
    cont = ngram_containment_pairs(docs, min_containment=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()
    assert jac == []  # Jaccard misses the embedded relation


def test_keeper_longest_picks_most_complete_copy(spark):
    """In a component of {original, suffixed re-crawl}, the longest
    member is the keeper — differing from dedup_decision's min-id
    policy on the same graph."""
    from mapreduceimpl_spark.operators.dedup import (
        dedup_decision,
        dedup_keeper_longest,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta extra suffix"),   # longer dup
            (3, "unrelated totally different text here"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    keep = {r["doc_id"]: r for r in dedup_keeper_longest(docs, pairs).collect()}
    assert keep[1]["keeper_id"] == 2 and not keep[1]["is_keeper"]
    assert keep[2]["is_keeper"]
    assert keep[3]["is_keeper"] and keep[3]["component"] == 3
    # min-id policy on the same graph keeps doc 1 instead
    minid = {r["doc_id"]: r for r in dedup_decision(docs, pairs).collect()}
    assert minid[1]["is_canonical"] and not minid[2]["is_canonical"]


def test_semantic_dedup_hand_case(spark):
    """Two near-identical vectors landing in the same Lloyd cell dedup
    (higher id dropped); a far vector in the same cell survives; and a
    near-dup is immune across cells by construction (intra-cell
    blocking only)."""
    from mapreduceimpl_spark.operators.dedup import semantic_dedup

    # two tight groups far apart -> k=2 Lloyd separates them; ids 1,2
    # are near-identical (cosine ~1), id 3 is same-cell but orthogonal
    # enough, ids 10,11 form the second cell
    rows = [
        (1, [1.0, 0.0, 0.0, 0.05]),
        (2, [1.0, 0.0, 0.0, 0.06]),   # near-dup of 1 -> dropped
        (3, [0.0, 0.0, 1.0, 0.0]),    # same half-space, not a dup
        (10, [-1.0, -1.0, 0.0, 0.0]),
        (11, [-1.0, -0.2, 0.0, 0.0]), # cosine vs 10 ~ 0.83 < 0.9 -> kept
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_cells=2, iterations=2).collect()}
    assert len(out) == 5
    assert out[1]["keep"] and out[1]["n_lower_dups"] == 0
    assert not out[2]["keep"] and out[2]["n_lower_dups"] == 1
    assert out[3]["keep"]
    assert out[10]["keep"] and out[11]["keep"]
    # groups ended up in different cells (the blocking structure)
    assert out[1]["cell"] == out[2]["cell"]
    assert out[10]["cell"] == out[11]["cell"]


def test_semantic_dedup_keeps_lowest_id_per_group(spark):
    """Three mutual near-dups in one cell: only the lowest id keeps;
    each higher id counts all its lower-id dups."""
    from mapreduceimpl_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame(
        [(5, [1.0, 0.01]), (7, [1.0, 0.02]), (9, [1.0, 0.03]), (20, [-1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_cells=2, iterations=2).collect()}
    assert out[5]["keep"] and not out[7]["keep"] and not out[9]["keep"]
    assert out[7]["n_lower_dups"] == 1 and out[9]["n_lower_dups"] == 2
    assert out[20]["keep"]


def test_semantic_dedup_no_cartesian_plan(spark, embeddings):
    """The candidate join must be an equi-join on the cell id — never
    a cartesian or nested-loop over the corpus."""
    from mapreduceimpl_spark.operators.dedup import semantic_dedup, with_perturbed_vectors
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(
        semantic_dedup(with_perturbed_vectors(embeddings)), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_candidate_mass_is_intra_cell_not_n_squared(spark, embeddings):
    """The number of cosine evaluations semantic_dedup performs is
    sum(C(cell_size, 2)) over Lloyd cells — measure it on the real
    fixture and assert it is a strict fraction of the all-pairs
    C(n, 2) a quantizer-free pass would score."""
    import math

    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.dedup import with_perturbed_vectors
    from mapreduceimpl_spark.operators.kmeans import kmeans_lloyd_internals

    corpus = with_perturbed_vectors(embeddings)
    n = corpus.count()
    assign, _ = kmeans_lloyd_internals(corpus, k=4, iterations=3)
    sizes = [r["c"] for r in assign.groupBy("cluster").agg(F.count("*").alias("c")).collect()]
    candidate_mass = sum(math.comb(s, 2) for s in sizes)
    all_pairs = math.comb(n, 2)
    assert sum(sizes) == n
    # with 4 cells, a perfectly balanced split scores ~1/4 of all
    # pairs; accept anything meaningfully below the brute-force bound
    assert 0 < candidate_mass < 0.6 * all_pairs, (candidate_mass, all_pairs, sizes)


def test_semantic_dedup_centroid_keeps_farthest(spark):
    """Paper keeper policy: in a near-dup pair the member NEARER the
    centroid is dropped (its twin, farther out, preserves cluster-edge
    diversity) — the opposite vector of a lowest-id policy when the
    lower id sits nearer the centroid."""
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_centroid,
    )

    # worked geometry (Lloyd k=2, 2 iterations, init = ids 1 and 2):
    # the (1, 2) near-dup pair lands in a cell whose final centroid is
    # id 1's own init position, so id 1 (dist 0) is NEARER than id 2 —
    # the centroid policy must flip the lowest-id verdict.  Vector 3
    # shares their cell but its cosine to both is ~0.49, below the
    # threshold, so it forms no pair.
    rows = [
        (1, [1.3, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),    # cosine(1,2)=1.0
        (3, [0.5, 0.9, 0.0, 0.0]),
        (10, [-1.0, -1.0, 0.0, 0.0]),
        (11, [-1.0, -1.1, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cent = {r["vec_id"]: r for r in semantic_dedup_centroid(emb, n_cells=2, iterations=2).collect()}
    low = {r["vec_id"]: r for r in semantic_dedup(emb, n_cells=2, iterations=2).collect()}

    # exactly one of each near-dup pair survives under both policies
    assert cent[1]["keep"] != cent[2]["keep"]
    assert cent[10]["keep"] != cent[11]["keep"]
    # lowest-id policy keeps 1 and 10
    assert low[1]["keep"] and not low[2]["keep"]
    assert low[10]["keep"] and not low[11]["keep"]
    # centroid policy keeps whichever member is farther out — and in
    # this geometry that FLIPS both verdicts vs lowest-id
    for a, b in ((1, 2), (10, 11)):
        farther = a if cent[a]["dist"] > cent[b]["dist"] else b
        assert cent[farther]["keep"] and not cent[a + b - farther]["keep"]
    assert not cent[1]["keep"] and cent[2]["keep"]
    assert not cent[10]["keep"] and cent[11]["keep"]
    # the non-duplicate vector survives under both
    assert cent[3]["keep"] and low[3]["keep"]


def test_leakage_safe_split_never_straddles_components(spark):
    """Planted near-dup pairs: both members always land in the SAME
    split; a doc-keyed split of the same corpus demonstrably straddles
    at least one pair (the failure mode this operator removes)."""
    from mapreduceimpl_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "en") for i in range(40)], ["doc_id", "text", "lang"]
    )
    # pairs chain 0-1, 2-3, ..., plus one 3-doc chain 30-31-32
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(10)] + [(30, 31), (31, 32)],
        ["doc_a", "doc_b"],
    )
    rows = leakage_safe_split(docs, pairs, train_frac=0.5).collect()
    assert len(rows) == 40
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    # the leakage guarantee: one split value per component
    assert all(len(s) == 1 for s in by_comp.values())
    # the 3-doc chain collapsed to one component
    comp_of = {r["doc_id"]: r["component"] for r in rows}
    assert comp_of[30] == comp_of[31] == comp_of[32]
    # both split values actually occur at train_frac=0.5 over 40 docs
    assert {r["split"] for r in rows} == {"train", "test"}

    import pytest

    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, train_frac=1.0)


def test_leakage_safe_split_growth_stable(spark):
    """Adding new singleton docs never moves existing docs across the
    boundary (the split_assign contract, inherited)."""
    from mapreduceimpl_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "en") for i in range(20)], ["doc_id", "text", "lang"]
    )
    pairs = spark.createDataFrame([(0, 1)], ["doc_a", "doc_b"])
    before = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, pairs).collect()
    }
    grown = docs.unionByName(
        spark.createDataFrame(
            [(100 + i, f"new {i}", "en") for i in range(10)],
            ["doc_id", "text", "lang"],
        )
    )
    after = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(grown, pairs).collect()
    }
    assert all(after[d] == s for d, s in before.items())


def test_dedup_recall_eval_fixture_sane(spark):
    """On the planted mutated corpus the banded LSH should recover most
    true near-dups (recall high) without exploding candidates; counts
    reconcile exactly."""
    from mapreduceimpl_spark.operators.dedup import (
        dedup_recall_eval,
        with_mutated_copies,
    )
    from mapreduceimpl_spark.sources import load_table

    docs = with_mutated_copies(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    r = dedup_recall_eval(docs, min_jaccard=0.5).collect()[0]
    assert r["tp"] + r["fn"] == r["n_truth"]
    assert r["tp"] + r["fp"] == r["n_cand"]
    assert r["n_truth"] > 0
    assert r["recall"] is not None and r["recall"] > 0.8
    assert r["precision"] is not None and r["precision"] > 0.5
    assert r["f1"] is not None


def test_dedup_recall_eval_perfect_on_exact_copies(spark):
    """Byte-identical duplicates: MinHash signatures match exactly, so
    precision == recall == f1 == 1.0."""
    from mapreduceimpl_spark.operators.dedup import dedup_recall_eval

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
            (4, "totally different text with nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    r = dedup_recall_eval(docs, min_jaccard=0.5).collect()[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0


def test_cluster_size_histogram_hand_case(spark):
    """Components {1,2,3}, {10,11}, {20}: histogram shows one size-3,
    one size-2, one size-1 cluster; removable = 2 + 1 + 0."""
    from mapreduceimpl_spark.operators.dedup import (
        cluster_size_histogram,
        dedup_decision,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (1, 2, 3, 10, 11, 20)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (10, 11, 0.9)],
        ["doc_a", "doc_b", "est_jaccard"],
    )
    hist = {r["cluster_size"]: r
            for r in cluster_size_histogram(dedup_decision(docs, pairs)).collect()}
    assert hist[3]["n_clusters"] == 1 and hist[3]["n_removable"] == 2
    assert hist[2]["n_clusters"] == 1 and hist[2]["n_removable"] == 1
    assert hist[1]["n_clusters"] == 1 and hist[1]["n_removable"] == 0
    assert sum(r["n_docs"] for r in hist.values()) == 6


# ---------------------------------------------------------------------------
# LSH S-curve parameter eval (round 9)
# ---------------------------------------------------------------------------


def test_lsh_scurve_analytic_matches_closed_form(docs):
    """Every bucket's analytic_p equals the hand-computed
    1-(1-s^r)^b at the bucket midpoint (same fixed-order multiply
    chain), detect rates are valid probabilities, and detected never
    exceeds the truth count."""
    from mapreduceimpl_spark.operators.dedup import (
        LSH_BAND_SIZE,
        MINHASH_PERMS,
        lsh_scurve_eval,
        with_mutated_copies,
    )

    rows = lsh_scurve_eval(with_mutated_copies(docs)).collect()
    assert rows, "no truth pairs at the fixture scale"
    b = MINHASH_PERMS // LSH_BAND_SIZE
    for r in rows:
        s = (float(r["bucket"]) + 0.5) / 10.0
        assert r["s_mid"] == s
        s_r = 1.0
        for _ in range(LSH_BAND_SIZE):
            s_r = s_r * s
        miss = 1.0
        for _ in range(b):
            miss = miss * (1.0 - s_r)
        import math

        assert r["analytic_p"] == math.floor((1.0 - miss) * 1e6 + 0.5) / 1e6
        assert 0 <= r["n_detected"] <= r["n_pairs"]
        assert 0.0 <= r["detect_rate"] <= 1.0


def test_lsh_scurve_high_jaccard_detected(docs):
    """At the operating point the curve promises: near-certain
    detection in the top bucket (s_mid=0.95 -> P~0.964 analytically;
    the mutated copies land there) and the measured rate should match
    the promise direction — high buckets detect better than the
    analytic floor of the bottom bucket."""
    from mapreduceimpl_spark.operators.dedup import (
        lsh_scurve_eval,
        with_mutated_copies,
    )

    got = {r["bucket"]: r for r in lsh_scurve_eval(with_mutated_copies(docs)).collect()}
    top = got[max(got)]
    assert top["s_mid"] >= 0.8
    assert top["detect_rate"] >= 0.9  # the mutated-copy pairs are found
    assert top["analytic_p"] >= 0.9


def test_lsh_scurve_parity_at_alternate_band_config(spark, docs):
    """The eval exists to TUNE (b, r), so the oracle generator must be
    correct away from the catalog's pinned 16/4: driver-equivalent
    compare at 8 permutations in 4 bands of 2 rows (a flatter S-curve)
    — guards the generator's generality like the unigram depth test."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.operators.dedup import (
        lsh_scurve_eval,
        with_mutated_copies,
    )
    from tools.check_oracle import compare

    sdf = lsh_scurve_eval(
        with_mutated_copies(docs), n_perms=8, band_size=2
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(
        catalog._lsh_scurve_oracle(n_perms=8, band_size=2)
    ).fetchdf()
    con.close()
    problems = compare("lsh_scurve_8x2", sdf, odf)
    assert not problems, problems
    # a flatter curve: 2-row bands fire MORE often at low similarity
    # than 4-row bands do — check the analytic column reflects r=2
    for r in sdf.itertuples():
        s = r.s_mid
        s_r = 1.0
        for _ in range(2):
            s_r *= s
        miss = 1.0
        for _ in range(4):
            miss *= 1.0 - s_r
        import math

        assert r.analytic_p == math.floor((1.0 - miss) * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# B-cubed cluster-level dedup eval (staged round 12)
# ---------------------------------------------------------------------------


def test_dedup_bcubed_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare: the full
    candidates -> CC -> B-cubed plan equals its recursive-CTE replay
    value-exactly."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.operators.dedup import dedup_bcubed_eval
    from tools.check_oracle import compare

    sdf = dedup_bcubed_eval(docs).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(catalog._dedup_bcubed_oracle()).fetchdf()
    con.close()
    problems = compare("dedup_bcubed_eval", sdf, odf)
    assert not problems, problems
    assert len(sdf) == 1


def test_dedup_bcubed_metric_semantics(spark, docs):
    """The metric on the planted corpus: scores in (0, 1]; and on a
    hand-built corpus where prediction == truth, all three are exactly
    1.0 (the identity case B-cubed must certify)."""
    from mapreduceimpl_spark.operators.dedup import dedup_bcubed_eval

    row = dedup_bcubed_eval(docs).collect()[0]
    n_docs = row["n_docs"]
    assert n_docs > 0
    for c in ("bcubed_precision", "bcubed_recall", "bcubed_f1"):
        assert 0.0 < row[c] <= 1.0, (c, row[c])
    # the planted suffix copies are easy near-dups at this operating
    # point: the verdict should be close to perfect on the fixture
    assert row["bcubed_f1"] > 0.9, row["bcubed_f1"]


def test_dedup_bcubed_plan_shape(spark, docs):
    """Staged plan pin: the eval adds only keyed aggregates and
    uniform-key joins on top of the audited dedup chain — no
    cartesian, no nested loop anywhere."""
    from mapreduceimpl_spark.operators.dedup import dedup_bcubed_eval
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(dedup_bcubed_eval(docs), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# b-bit minwise hashing accuracy eval (staged round 12)
# ---------------------------------------------------------------------------


def test_bbit_minhash_matches_duckdb_oracle(spark, docs):
    """Staged entry, driver-equivalent compare: truth pairs + lane
    signatures + both estimators' bucketed MAEs equal the SQL replay
    value-exactly on the planted corpus."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.operators.dedup import (
        bbit_minhash_eval,
        with_mutated_copies,
    )
    from tools.check_oracle import compare

    sdf = bbit_minhash_eval(with_mutated_copies(docs)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    odf = con.execute(catalog._bbit_minhash_oracle()).fetchdf()
    con.close()
    problems = compare("bbit_minhash_eval", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_bbit_minhash_estimator_semantics(spark, docs):
    """The storage/accuracy trade must show up with the right sign:
    (a) the 1-bit estimator is never MORE accurate than full lanes in
    pair-weighted aggregate (it discards 31 of 32 bits), and (b) an
    exact duplicate pair scores zero error under BOTH estimators (all
    lanes equal -> j_full = j_1bit = 1 = true Jaccard)."""
    from mapreduceimpl_spark.operators.dedup import (
        bbit_minhash_eval,
        with_mutated_copies,
    )

    rows = bbit_minhash_eval(with_mutated_copies(docs)).collect()
    assert rows
    w_full = sum(r["n_pairs"] * r["mae_full"] for r in rows)
    w_1bit = sum(r["n_pairs"] * r["mae_1bit"] for r in rows)
    assert w_1bit >= w_full, (w_1bit, w_full)

    text = "alpha beta gamma delta epsilon zeta eta theta"
    two = docs.sparkSession.createDataFrame(
        [(0, text), (1, text)], ["doc_id", "text"]
    )
    top = bbit_minhash_eval(two, min_jaccard=0.5).collect()
    assert len(top) == 1
    assert top[0]["bucket"] == 9
    assert top[0]["mae_full"] == 0.0 and top[0]["mae_1bit"] == 0.0


def test_bbit_parity_reads_the_low_bit():
    """The retained bit of an 8-hex lane IS the integer low bit: the
    last-hex-digit-odd test equals int(lane, 16) % 2 for every lane of
    a few hundred md5 digests (pure Python, no engines)."""
    import hashlib

    from mapreduceimpl_spark.operators.dedup import _ODD_HEX

    for i in range(300):
        digest = hashlib.md5(f"probe-{i}".encode()).hexdigest()
        for lane_start in (0, 8, 16, 24):
            lane = digest[lane_start:lane_start + 8]
            assert (lane[-1] in _ODD_HEX) == (int(lane, 16) % 2 == 1), lane


def test_bbit_minhash_plan_shape(spark, docs):
    """Staged plan pin: the truth join and both signature joins are
    keyed — no cartesian, no nested loop."""
    from mapreduceimpl_spark.operators.dedup import (
        bbit_minhash_eval,
        with_mutated_copies,
    )
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(bbit_minhash_eval(with_mutated_copies(docs)), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Fellegi-Sunter record linkage (staged round 12/13)
# ---------------------------------------------------------------------------


def test_fellegi_sunter_matches_duckdb_oracle(spark, tables):
    """Staged entry, driver-equivalent compare: blocking, m/u
    estimation, ratio scoring and the three-way verdict replay
    value-exactly."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.operators.dedup import fellegi_sunter_linkage
    from tools.check_oracle import compare

    sdf = fellegi_sunter_linkage(tables["customer"]).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "'/root/testdata/sf0.001/customer.parquet'"
    )
    odf = con.execute(catalog._fellegi_sunter_oracle()).fetchdf()
    con.close()
    problems = compare("fellegi_sunter_linkage", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_fellegi_sunter_verdict_semantics(spark, tables):
    """The paper's three-way split must separate the planted truth:
    the link zone is clean (no false links at upper=100), most true
    matches are found (link recall dominated by the planted noise
    rates), and the total pair count is exactly the block-join size."""
    from mapreduceimpl_spark.operators.dedup import fellegi_sunter_linkage

    rows = {
        (r["decision"], r["is_match"]): r["n_pairs"]
        for r in fellegi_sunter_linkage(tables["customer"]).collect()
    }
    assert rows.get(("link", False), 0) == 0
    n_match = sum(n for (d, m), n in rows.items() if m)
    n_cust = tables["customer"].count()
    assert n_match == n_cust  # every customer has exactly one copy in-block
    link_recall = rows.get(("link", True), 0) / n_match
    assert link_recall > 0.5, rows
    # block-join size: sum over nations of n_left * n_right
    per_nation = (
        tables["customer"].groupBy("c_nationkey").count().collect()
    )
    expected_pairs = sum(r["count"] * r["count"] for r in per_nation)
    assert sum(rows.values()) == expected_pairs


def test_fellegi_sunter_plan_shape(spark, tables):
    """Staged plan pin: the candidate join is keyed on the blocking
    key and the stats relation is BROADCAST onto it — the only
    nested-loop join in the plan is that bounded one-row broadcast."""
    from mapreduceimpl_spark.operators.dedup import fellegi_sunter_linkage
    from mapreduceimpl_spark.plans import explain_str

    # eager=False: the default eagerly pins the <=6-row result to a
    # localCheckpoint (and unpersists the candidate cache), which
    # hides the logical plan from explain
    plan = explain_str(
        fellegi_sunter_linkage(tables["customer"], eager=False), "simple"
    )
    assert "CartesianProduct" not in plan
    # the one-row ratios relation must come in as a broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    spark.catalog.clearCache()  # eager=False leaves the cache to the caller


# ---------------------------------------------------------------------------
# large-star / small-star connected components (web-scale CC twin)
# ---------------------------------------------------------------------------


def test_cc_star_equals_min_label_on_random_graphs(spark):
    """The star alternation and min-label propagation must produce
    the IDENTICAL (doc_id, component=min reachable) map — five seeded
    random graphs across densities."""
    import random

    from mapreduceimpl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed, n_nodes, n_edges in ((11, 20, 12), (12, 30, 35), (13, 9, 3),
                                   (14, 50, 40), (15, 16, 40)):
        rng = random.Random(seed)
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
        want = {
            (r["doc_id"], r["component"])
            for r in connected_components(df).collect()
        }
        got = {
            (r["doc_id"], r["component"])
            for r in connected_components_star(df).collect()
        }
        assert got == want, (seed, sorted(got ^ want))


def test_cc_star_keeps_self_pair_only_nodes(spark):
    """Review r10: a node appearing ONLY as (x, x) has no proper edge
    but still owns an output row (component = itself) — the min-label
    twin's symmetric view keeps self-pairs, and the star variant must
    honor the identical-output contract."""
    from mapreduceimpl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 3), (9, 9)], ["doc_a", "doc_b"]
    )
    want = {
        (r["doc_id"], r["component"])
        for r in connected_components(df).collect()
    }
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components_star(df).collect()
    }
    assert got == want
    assert (7, 7) in got and (9, 9) in got


def test_cc_star_one_row_per_node_on_nonconvergence(spark):
    """Review r10: when max_rounds is exhausted before the convergence
    witness, e need not be a star forest — the emission must still map
    every doc_id to exactly ONE component (a possibly-split label, the
    min-label twin's own degraded mode), never duplicate rows."""
    import warnings

    from mapreduceimpl_spark.operators.dedup import connected_components_star

    path = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(path, ["doc_a", "doc_b"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the non-convergence warning
        rows = connected_components_star(df, max_rounds=1).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 64


def test_cc_star_logn_rounds_on_long_path(spark):
    """THE reason the star variant exists: a 64-node path has
    diameter 63 (min-label would need ~63 rounds and the default
    max_iter=20 splits it, warning), but the star alternation
    converges inside max_rounds=12 ~ 2*log2(64) with no warning and
    one component rooted at 0."""
    import warnings

    from mapreduceimpl_spark.operators.dedup import connected_components_star

    path = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(path, ["doc_a", "doc_b"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any non-convergence warning fails
        rows = connected_components_star(df, max_rounds=12).collect()
    assert len(rows) == 64
    assert {r["component"] for r in rows} == {0}


def test_cc_star_on_planted_corpus_pairs(spark, docs):
    """On the production input shape (the banded MinHash verdict over
    the planted corpus) the star components equal the min-label
    components the whole dedup chain is verified on."""
    from mapreduceimpl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_lsh_pairs,
        with_mutated_copies,
    )

    pairs = minhash_lsh_pairs(with_mutated_copies(docs)).filter(
        F.col("est_jaccard") >= 0.5
    )
    want = {
        (r["doc_id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components_star(pairs).collect()
    }
    assert got == want


def test_fellegi_sunter_hot_block_guard(spark, tables):
    """VERDICT r10 #5: the per-block candidate join is quadratic, so a
    block past max_block_rows must REFUSE with the tighter-key advice
    — and the guard must not fire on the healthy fixture."""
    import pytest

    from mapreduceimpl_spark.operators.dedup import fellegi_sunter_linkage

    cust = tables["customer"]
    n = cust.count()
    with pytest.raises(ValueError, match="tighter compound blocking key"):
        # every fixture block is under n rows; a cap of 0 makes them
        # all hot — same code path as one genuinely hot nation
        fellegi_sunter_linkage(cust, max_block_rows=0)
    # healthy fixture at the default cap: runs (eager) and returns
    rows = fellegi_sunter_linkage(cust).collect()
    assert len(rows) > 0
    assert n > 0
