"""Similarity-search invariants: exactness of brute force, recall of
LSH, determinism of bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import similarity


def _queries(embeddings, n=5):
    return embeddings.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_self_is_nearest(embeddings):
    """Each query vector's rank-1 neighbor is itself (cosine 1)."""
    topk = similarity.brute_force_topk(embeddings, _queries(embeddings), k=3)
    r1 = {r["query_id"]: r for r in topk.filter(F.col("rank") == 1).collect()}
    for qid, row in r1.items():
        assert row["vec_id"] == qid
        assert abs(row["cosine"] - 1.0) < 1e-9


def test_topk_exactly_k_and_sorted(embeddings):
    topk = similarity.brute_force_topk(embeddings, _queries(embeddings), k=5).collect()
    by_q: dict[int, list] = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        assert len(rows) == 5
        rows.sort(key=lambda r: r["rank"])
        sims = [r["cosine"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_deterministic(embeddings):
    b1 = similarity.lsh_bucket(embeddings, n_planes=6, seed=7).select("vec_id", "bucket")
    b2 = similarity.lsh_bucket(embeddings, n_planes=6, seed=7).select("vec_id", "bucket")
    assert b1.exceptAll(b2).count() == 0


def test_lsh_bucket_rejects_mismatched_dim(spark):
    """A vector whose length differs from the (derived) dim must raise,
    not silently hash a null dot product into bucket 0."""
    import pytest

    df = spark.createDataFrame(
        [(1, [0.1] * 64), (2, [0.2] * 32)], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="lsh_bucket"):
        similarity.lsh_bucket(df).select("bucket").collect()


def test_lsh_recall_vs_brute_force(embeddings):
    """Bucketed ANN must recover a reasonable fraction of the true
    top-k (same-bucket probing only; measured, not promised)."""
    q = _queries(embeddings, n=10)
    exact = similarity.brute_force_topk(embeddings, q, k=5).collect()
    approx = similarity.lsh_topk(embeddings, q, k=5, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.3


def _mean_recall(embeddings, q, approx_rows):
    exact = similarity.brute_force_topk(embeddings, q, k=5).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets: dict[int, set] = {}
    for r in approx_rows:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    return sum(recalls) / len(recalls)


def test_lsh_multiprobe_improves_recall(embeddings):
    """Multi-probe (base bucket + lowest-margin bit flips) must never
    lose results vs single-probe — every single-probe hit is in a
    probed bucket by construction — and on this corpus the extra
    probes strictly improve mean recall toward brute force."""
    q = _queries(embeddings, n=10)
    single_rows = similarity.lsh_topk(embeddings, q, k=5, n_planes=4).collect()
    multi_rows = similarity.lsh_topk(
        embeddings, q, k=5, n_planes=4, n_probe=3
    ).collect()
    r1 = _mean_recall(embeddings, q, single_rows)
    r3 = _mean_recall(embeddings, q, multi_rows)
    assert r3 >= r1, (r1, r3)
    # the query's own bucket is always probed: self stays rank 1
    for r in multi_rows:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]


def test_ivf_recall_vs_brute_force(embeddings):
    """IVF with 8 cells / 2 probes recovers a reasonable fraction of
    the true top-k (deterministic: fixed k-means init)."""
    q = _queries(embeddings, n=8)
    exact = similarity.brute_force_topk(embeddings, q, k=5).collect()
    approx = similarity.ivf_topk(embeddings, q, k=5, n_cells=8, n_probe=2).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets: dict[int, set] = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4
    # self must always be found (its cell is by definition probed first)
    for r in approx:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]


def test_embedding_centroids_match_numpy(embeddings):
    """Distributed per-label mean pooling == NumPy mean (to the decimal
    resolution the operator guarantees)."""
    import numpy as np

    got = {
        (r["grp"], r["pos"]): (r["mean_x"], r["n"])
        for r in similarity.embedding_centroids(embeddings).collect()
    }
    by_label: dict[int, list] = {}
    for r in embeddings.collect():
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=np.float64)
        )
    for label, vecs in by_label.items():
        mean = np.mean(vecs, axis=0)
        for pos in (0, 1, 31, 63):
            mx, n = got[(label, pos)]
            assert n == len(vecs)
            assert abs(mx - mean[pos]) < 1e-5


def test_embedding_norms_match_numpy(embeddings):
    import numpy as np

    got = {r["vec_id"]: r["l2_norm"] for r in similarity.embedding_norms(embeddings).collect()}
    for r in embeddings.limit(20).collect():
        expected = float(np.linalg.norm(np.array(r["embedding"], dtype=np.float64)))
        assert abs(got[r["vec_id"]] - expected) < 1e-9


def test_cosine_symmetric_range(embeddings):
    topk = similarity.brute_force_topk(embeddings, _queries(embeddings), k=50)
    mm = topk.agg(F.min("cosine"), F.max("cosine")).collect()[0]
    assert -1.0 - 1e-9 <= mm[0] and mm[1] <= 1.0 + 1e-9


def test_ivf_build_once_search_twice(embeddings):
    """The split build/search API returns the same results as the
    one-shot wrapper, and one index serves multiple query batches."""
    from mapreduceimpl_spark.operators.similarity import ivf_build, ivf_search, ivf_topk

    q1 = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q2 = embeddings.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids, cells = ivf_build(embeddings)
    cells = cells.cache()
    try:
        a = {(r["query_id"], r["rank"], r["vec_id"]) for r in ivf_search(centroids, cells, q1).collect()}
        b = {(r["query_id"], r["rank"], r["vec_id"]) for r in ivf_topk(embeddings, q1).collect()}
        assert a == b
        # same index, second batch — no rebuild needed
        assert ivf_search(centroids, cells, q2, k=3).count() == 9
    finally:
        cells.unpersist()


def test_lsh_build_once_search_twice(embeddings):
    """Split LSH API == one-shot wrapper; one bucketed index serves
    multiple query batches with the same hyperplanes."""
    from mapreduceimpl_spark.operators.similarity import lsh_build, lsh_search, lsh_topk

    q1 = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q2 = embeddings.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    params, corpus = lsh_build(embeddings)
    corpus = corpus.cache()
    try:
        a = {(r["query_id"], r["rank"], r["vec_id"]) for r in lsh_search(params, corpus, q1).collect()}
        b = {(r["query_id"], r["rank"], r["vec_id"]) for r in lsh_topk(embeddings, q1).collect()}
        assert a == b
        assert lsh_search(params, corpus, q2, k=2).count() > 0
    finally:
        corpus.unpersist()


def _topk_set(df):
    return {(r["query_id"], r["rank"], r["vec_id"]) for r in df.collect()}


def test_ivf_persisted_index_round_trip(embeddings):
    """The docstring's 'build once, serve many batches' claim, end to
    end: ivf_build -> write_bucketed -> re-read from disk -> ivf_search
    equals searching the in-memory index, and the probe join against
    the persisted corpus is broadcast-side — the corpus is never
    exchanged (no Exchange on the cell key in the plan)."""
    from mapreduceimpl_spark.operators.similarity import ivf_build, ivf_search
    from mapreduceimpl_spark.plans import explain_str
    from mapreduceimpl_spark.sources.sinks import write_bucketed

    spark = embeddings.sparkSession
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids, cells = ivf_build(embeddings)
    try:
        write_bucketed(cells, "t_ivf_cells_rt", ["cell"], n_buckets=8)
        reread = spark.table("t_ivf_cells_rt")
        from_disk = ivf_search(centroids, reread, q)
        assert _topk_set(from_disk) == _topk_set(ivf_search(centroids, cells, q))
        plan = explain_str(from_disk, "simple")
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning(cell" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_cells_rt")


def test_lsh_persisted_index_round_trip(embeddings):
    """Same round trip for the sign-LSH index: the params dict written
    alongside the bucketed corpus re-hashes a later query batch with
    the SAME hyperplanes, so disk == memory exactly; the bucketed
    corpus is never exchanged."""
    from mapreduceimpl_spark.operators.similarity import lsh_build, lsh_search
    from mapreduceimpl_spark.plans import explain_str
    from mapreduceimpl_spark.sources.sinks import write_bucketed

    spark = embeddings.sparkSession
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    params, corpus = lsh_build(embeddings)
    try:
        write_bucketed(corpus, "t_lsh_corpus_rt", ["bucket"], n_buckets=8)
        reread = spark.table("t_lsh_corpus_rt")
        from_disk = lsh_search(params, reread, q)
        assert _topk_set(from_disk) == _topk_set(lsh_search(params, corpus, q))
        plan = explain_str(from_disk, "simple")
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning(bucket" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lsh_corpus_rt")


def test_knn_classify_majority_and_self_exclusion(spark):
    """Planted geometry: three tight clusters on coordinate axes; a
    query in cluster 0 must be labeled 0 by its k=3 neighbors, and its
    own row must not vote (exclude_self)."""
    def vec(axis, eps, dim=4):
        v = [eps] * dim
        v[axis] = 1.0
        return v

    rows = [
        (0, vec(0, 0.00), 7),   # query row: label 7 (wrong on purpose);
        (1, vec(0, 0.01), 0),   # self-exclusion means label 7 never votes
        (2, vec(0, 0.02), 0),
        (3, vec(0, 0.03), 0),
        (4, vec(1, 0.01), 1),
        (5, vec(1, 0.02), 1),
        (6, vec(2, 0.01), 2),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.knn_classify(emb, q, k=3, exclude_self=True).collect()
    assert len(got) == 1
    assert got[0]["pred_label"] == 0
    assert got[0]["votes"] == 3

    # with exclude_self=False the self row votes its own label but is
    # outvoted 3-1 by the cluster
    got2 = similarity.knn_classify(emb, q, k=4, exclude_self=False).collect()
    assert got2[0]["pred_label"] == 0
    assert got2[0]["votes"] == 3


def test_knn_classify_tiebreak_lowest_label(spark):
    """2-2 vote split resolves to the smaller label."""
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.01], 5),
        (2, [1.0, 0.02], 5),
        (3, [1.0, 0.03], 3),
        (4, [1.0, 0.04], 3),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.knn_classify(emb, q, k=4, exclude_self=True).collect()
    assert got[0]["pred_label"] == 3
    assert got[0]["votes"] == 2


def test_random_projection_shape_and_determinism(embeddings):
    p1 = similarity.random_projection(embeddings, out_dim=4, seed=9)
    n_vec = embeddings.count()
    assert p1.count() == n_vec * 4
    # same seed -> identical output; different seed -> different values
    p2 = similarity.random_projection(embeddings, out_dim=4, seed=9)
    assert p1.exceptAll(p2).count() == 0
    p3 = similarity.random_projection(embeddings, out_dim=4, seed=10)
    assert p1.exceptAll(p3).count() > 0


def test_random_projection_preserves_relative_geometry(spark):
    """JL sanity: a vector projected twice lands in the same place,
    and orthogonal inputs stay distinguishable (projection is linear:
    proj(2v) == 2*proj(v))."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    rows = similarity.random_projection(emb, out_dim=3, round_digits=None).collect()
    v1 = {r["pos"]: r["x"] for r in rows if r["vec_id"] == 1}
    v2 = {r["pos"]: r["x"] for r in rows if r["vec_id"] == 2}
    for pos in v1:
        assert abs(v2[pos] - 2.0 * v1[pos]) < 1e-12


def test_triplet_mining_labels_and_hardness(embeddings):
    """Positives share the anchor's label, negatives don't, neither is
    the anchor itself, and each winner is the TOP-similarity candidate
    of its label class (checked against brute-force ranking)."""
    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        triplet_mining,
    )

    anchors = embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    labels = {r["vec_id"]: r["label"] for r in embeddings.select("vec_id", "label").collect()}
    rows = triplet_mining(embeddings, anchors).collect()
    assert len(rows) == 8
    # full ranking per anchor for cross-checking
    ranked = brute_force_topk(
        embeddings,
        anchors.select(F.col("anchor_id").alias("query_id"), "embedding"),
        k=10**6, round_digits=6, exclude_self=True,
    ).collect()
    by_anchor: dict = {}
    for r in ranked:
        by_anchor.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for r in rows:
        al = labels[r["anchor_id"]]
        assert labels[r["positive_id"]] == al
        assert labels[r["negative_id"]] != al
        assert r["positive_id"] != r["anchor_id"]
        order = [v for _, v in sorted(by_anchor[r["anchor_id"]])]
        # winner of each class appears before any other member of it
        same_first = next(v for v in order if labels[v] == al)
        diff_first = next(v for v in order if labels[v] != al)
        assert r["positive_id"] == same_first
        assert r["negative_id"] == diff_first


def test_triplet_mining_single_label_corpus_empty(spark):
    from mapreduceimpl_spark.operators.similarity import triplet_mining

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    anchors = emb.select(F.col("vec_id").alias("anchor_id"), "embedding", "label")
    assert triplet_mining(emb, anchors).collect() == []


def test_centroid_similarity_hand_computed(spark):
    from mapreduceimpl_spark.operators.similarity import centroid_similarity

    rows = [
        (1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),   # centroid (1, 0)
        (3, 1, [0.0, 2.0]),                        # centroid (0, 2)
        (4, 2, [3.0, 3.0]),                        # centroid (3, 3)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = {(r["grp_a"], r["grp_b"]): r["cosine"] for r in centroid_similarity(emb).collect()}
    assert out[(0, 1)] == 0.0
    assert abs(out[(0, 2)] - round(3 / (1 * (18 ** 0.5)), 6)) < 1e-12
    assert abs(out[(1, 2)] - round(6 / (2 * (18 ** 0.5)), 6)) < 1e-12


def test_centroid_similarity_bounds_and_pairs(embeddings):
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.similarity import centroid_similarity

    out = centroid_similarity(embeddings).collect()
    n_labels = embeddings.select("label").distinct().count()
    assert len(out) == n_labels * (n_labels - 1) // 2
    for r in out:
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
        assert r["grp_a"] < r["grp_b"]


def test_ivf_lloyd_topk_recall_vs_brute_force(embeddings):
    """The value-checked IVF tier returns correctly-ranked results from
    the probed cells; recall vs exact brute force is measured (cheap
    quantizer, 2 of 4 cells probed — expect most neighbors found)."""
    from pyspark.sql import functions as F

    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        ivf_lloyd_topk,
    )

    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_lloyd_topk(embeddings, queries, k=5, n_cells=4, iterations=3,
                         n_probe=2)
    exact = brute_force_topk(embeddings, queries, k=5, round_digits=6)
    ivf_pairs = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(ivf_pairs) == 50  # k results per query
    recall = len(ivf_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall
    # every IVF hit that IS in the exact set carries the same cosine
    ivf_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in ivf.collect()}
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    for key in ivf_pairs & exact_pairs:
        assert ivf_cos[key] == exact_cos[key]


def test_pca_power_scores_finds_dominant_direction(spark):
    """A corpus whose variance is overwhelmingly along one axis must
    get pc1 scores ordered by that axis coordinate (up to the power
    method's global sign), with the small-noise axis contributing
    ~nothing."""
    from mapreduceimpl_spark.operators.similarity import pca_power_scores

    rows = [
        (i, [float(i - 5), 0.01 * ((i * 7) % 3 - 1), 0.0, 0.0])
        for i in range(11)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["pc1_score"] for r in pca_power_scores(emb, iterations=6).collect()}
    assert len(got) == 11
    scores = [got[i] for i in range(11)]
    # monotone in the dominant coordinate (either direction)
    diffs = [b - a for a, b in zip(scores, scores[1:])]
    assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs)
    # centered projections sum to ~0
    assert abs(sum(scores)) < 1e-3
    # the projection magnitude tracks the dominant axis, not the noise
    assert max(abs(s) for s in scores) > 4.9


def test_pca_power_scores_deterministic_and_validates(spark, embeddings):
    from mapreduceimpl_spark.operators.similarity import pca_power_scores

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pca_power_scores(embeddings, iterations=0)
    a = sorted(map(tuple, pca_power_scores(embeddings, iterations=3).collect()))
    b = sorted(map(tuple, pca_power_scores(embeddings, iterations=3).collect()))
    assert a == b and len(a) == embeddings.count()


def test_pca_power_scores_no_cartesian_single_broadcasts(spark, embeddings):
    """Plan shape: dim-length vectors ride broadcast joins; no
    cartesian products, no nested-loop joins, and the final plan's
    only window is over the bounded dim-length aggregate."""
    from mapreduceimpl_spark.operators.similarity import pca_power_scores
    from mapreduceimpl_spark.plans import explain_str

    plan = explain_str(pca_power_scores(embeddings, iterations=2), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_in_batch_negatives_label_aware_and_symmetric(spark):
    from mapreduceimpl_spark.operators.similarity import in_batch_negatives

    import pytest as _pytest

    rows = [(i, [float(i)], i % 3) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    with _pytest.raises(ValueError):
        in_batch_negatives(emb, n_batches=0)
    out = in_batch_negatives(emb, n_batches=4).collect()
    labels = {r[0]: r[2] for r in rows}
    pairs = {(r["anchor_id"], r["negative_id"]) for r in out}
    assert len(pairs) == len(out) > 0
    for a, n in pairs:
        # never a false negative (same label), never self
        assert labels[a] != labels[n] and a != n
        # symmetric: b is a negative for a iff a is one for b
        assert (n, a) in pairs


def test_pq_codes_shape_and_duplicate_vectors_agree(spark):
    import pytest

    from mapreduceimpl_spark.operators.similarity import pq_codes

    vecs = [
        (0, [float(i) for i in range(8)]),
        (1, [float(i) for i in range(8)]),          # duplicate of 0
        (2, [float(7 - i) for i in range(8)]),
        (3, [float(i % 3) for i in range(8)]),
        (4, [float(-i) for i in range(8)]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = pq_codes(df, m=2, k=2, iterations=2, dim=8).collect()
    # one row per vector per subspace; codes within [0, k); dist >= 0
    assert len(out) == len(vecs) * 2
    assert all(0 <= r["code"] < 2 for r in out)
    assert all(r["dist"] >= 0.0 for r in out)
    by = {(r["vec_id"], r["subspace"]): r["code"] for r in out}
    assert by[(0, 0)] == by[(1, 0)] and by[(0, 1)] == by[(1, 1)]

    with pytest.raises(ValueError):
        pq_codes(df, m=3, dim=8)


def test_pq_adc_topk_ranking_invariants(spark):
    import pytest

    from mapreduceimpl_spark.operators.similarity import pq_adc_topk

    vecs = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(8)]) for i in range(12)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = pq_adc_topk(
        df, n_queries=2, k_results=3, m=2, k=2, iterations=2, dim=8
    ).collect()
    assert len(out) == 2 * 3
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
    for q, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3]
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)  # adist non-decreasing in rank
        assert all(d >= 0.0 for d in dists)

    with pytest.raises(ValueError):
        pq_adc_topk(df, n_queries=0)


def test_ann_recall_eval_bounds_and_self_hit(spark, embeddings):
    """recall is in [0,1] per query; the self-match (query vectors are
    corpus members) guarantees at least one hit per query, so recall
    >= 0.2 at k=5; counts reconcile with a direct comparison of the
    two tiers."""
    from mapreduceimpl_spark.catalog import _q_ann_recall_eval
    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        ivf_lloyd_topk,
    )

    rows = _q_ann_recall_eval(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall"] - r["n_hits"] / 5.0) < 1e-9
        assert r["n_hits"] >= 1  # self-match always recovered

    # reconcile one query against a direct set comparison
    from mapreduceimpl_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ex = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5, round_digits=6).collect()
    }
    iv = {
        (r["query_id"], r["vec_id"])
        for r in ivf_lloyd_topk(
            emb, queries, k=5, n_cells=4, iterations=3, n_probe=2
        ).collect()
    }
    got = {r["query_id"]: r["n_hits"] for r in rows}
    for q in range(10):
        assert got[q] == len(
            {p for p in ex if p[0] == q} & {p for p in iv if p[0] == q}
        )


def test_mmr_rerank_diversifies_against_plain_topk(spark):
    """The hand-geometry case MMR exists for: two near-duplicate
    highly-relevant candidates plus one orthogonal diverse one.  Plain
    top-2 picks both duplicates; MMR (lam=0.3) picks one duplicate
    then the diverse candidate, because the second duplicate's
    max-sim-to-selected penalty (~1.0) swamps its relevance edge.
    Also pins rank-1 = plain argmax (step 1 has no diversity term),
    selection-order ranks, and parameter validation."""
    import pytest as _pytest

    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    rows = [
        (0, [1.0, 0.0]),      # query
        (10, [1.0, 0.05]),    # near-dup A1 (most relevant)
        (11, [1.0, 0.06]),    # near-dup A2 (sim(A1,A2) ~ 1)
        (12, [0.0, 1.0]),     # diverse B (orthogonal to query and A's)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plain = [
        r["vec_id"]
        for r in brute_force_topk(emb, q, k=2, round_digits=6, exclude_self=True)
        .orderBy("rank")
        .collect()
    ]
    assert plain == [10, 11]  # duplicates crowd the plain top-2

    out = mmr_rerank(emb, q, k=2, pool=3, lam=0.3).orderBy("mmr_rank").collect()
    assert [r["vec_id"] for r in out] == [10, 12]
    assert [r["mmr_rank"] for r in out] == [1, 2]
    # step-1 score is lam*relevance (empty selected set -> zero penalty)
    assert abs(out[0]["mmr_score"] - 0.3 * out[0]["relevance"]) < 1e-8
    # the diverse pick's score carries its (small) penalty to A1
    assert out[1]["mmr_score"] < 0.3 * out[1]["relevance"] + 1e-12

    with _pytest.raises(ValueError):
        mmr_rerank(emb, q, k=5, pool=3)
    with _pytest.raises(ValueError):
        mmr_rerank(emb, q, k=1, pool=2, lam=1.5)


def test_mmr_rerank_lam1_equals_plain_topk(embeddings):
    """lam=1 removes the diversity term, so MMR must reproduce the
    brute-force ranking exactly (same ids in the same order) — the
    equivalence anchor tying the greedy loop to the verified ANN
    contract."""
    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plain = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in brute_force_topk(
            embeddings, q, k=4, round_digits=6, exclude_self=True
        ).collect()
    }
    mmr = {
        (r["query_id"], r["mmr_rank"]): r["vec_id"]
        for r in mmr_rerank(embeddings, q, k=4, pool=8, lam=1.0).collect()
    }
    assert mmr == plain


def test_mmr_rerank_composes_with_ann_tier(embeddings):
    """VERDICT r7 #3: the production composition is ANN-tier -> MMR
    (a brute-force pool is Q x N at corpus scale).  With a prebuilt
    ``candidates`` frame from ``ivf_lloyd_topk``: every pick must
    come from that query's candidate set, ranks are 1..k in selection
    order, and rank-1 is the pool's rounded-relevance argmax (step 1
    has no diversity term).  Equivalence anchor: feeding the internal
    brute-force pool back in as ``candidates`` reproduces the default
    path row-for-row.  The persisted pool/grid handles come back via
    ``caches``."""
    from mapreduceimpl_spark.operators.similarity import (
        brute_force_topk,
        ivf_lloyd_topk,
        mmr_rerank,
    )

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = ivf_lloyd_topk(embeddings, q, k=8, n_cells=4, iterations=2, n_probe=2)
    caches: list = []
    out = mmr_rerank(
        embeddings, q, k=3, lam=0.5, candidates=ann, caches=caches
    ).collect()
    pool_ids = {
        (r["query_id"], r["vec_id"]): r["cosine"] for r in ann.collect()
    }
    by_q: dict = {}
    for r in out:
        assert (r["query_id"], r["vec_id"]) in pool_ids
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert sorted(r["mmr_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        first = min(rows, key=lambda r: r["mmr_rank"])
        best = min(
            ((k, v) for k, v in pool_ids.items() if k[0] == qid),
            key=lambda kv: (-round(kv[1], 6), kv[0][1]),
        )
        assert first["vec_id"] == best[0][1]
    assert len(caches) == 2
    for c in caches:
        c.unpersist()

    # equivalence anchor: prebuilt pool == the default brute path
    brute_pool = brute_force_topk(
        embeddings, q, k=8, round_digits=6, exclude_self=True
    )
    default = {
        tuple(r) for r in mmr_rerank(embeddings, q, k=3, pool=8).collect()
    }
    via_candidates = {
        tuple(r)
        for r in mmr_rerank(embeddings, q, k=3, candidates=brute_pool).collect()
    }
    assert via_candidates == default


def test_mmr_rerank_plan_growth_is_linear_in_k(embeddings):
    """Lineage regression (the HITS/BPE lesson): each greedy step must
    reference the previous frame exactly once, so the analyzed plan
    grows LINEARLY with k.  An agg+join winner would double the plan
    per step (2^k) and k=6 would already be 8x k=3; the linear form
    stays under ~3x."""
    from mapreduceimpl_spark.operators.similarity import mmr_rerank
    from mapreduceimpl_spark.plans import explain_str

    q = embeddings.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    len3 = len(explain_str(mmr_rerank(embeddings, q, k=3, pool=8), "simple"))
    len6 = len(explain_str(mmr_rerank(embeddings, q, k=6, pool=8), "simple"))
    assert len6 < 3 * len3, (len3, len6)


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension recall (staged round 13)
# ---------------------------------------------------------------------------


def test_matryoshka_recall_matches_duckdb_oracle(spark):
    """Staged entry, driver-equivalent compare on the fixture
    embeddings table."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.operators.similarity import (
        matryoshka_recall_eval,
    )
    from mapreduceimpl_spark.sources import load_table
    from tools.check_oracle import compare

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    sdf = matryoshka_recall_eval(emb).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    odf = con.execute(catalog._matryoshka_recall_oracle()).fetchdf()
    con.close()
    problems = compare("matryoshka_recall_eval", sdf, odf)
    assert not problems, problems
    assert len(sdf) == 3 * 10  # |dims| x n_queries


def test_matryoshka_recall_full_dim_is_exact(spark):
    """At d = full dimension the prefix IS the vector, so recall@k
    must be exactly 1.0 for every query; and every recall lies in
    [0, 1] with n_hits <= k."""
    from mapreduceimpl_spark.operators.similarity import (
        matryoshka_recall_eval,
    )
    from mapreduceimpl_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = matryoshka_recall_eval(emb, dims=(8, 64)).collect()
    assert len(rows) == 2 * 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert 0.0 <= r["recall"] <= 1.0
        if r["dim"] == 64:
            assert (r["n_hits"], r["recall"]) == (5, 1.0), r


def test_matryoshka_recall_plan_shape(spark):
    """Staged plan pin: the corpus never shuffles for scoring (the
    bounded query-dim grid is broadcast) and there is no cartesian
    product; the only nested-loop join is the bounded truth x dims
    grid."""
    from mapreduceimpl_spark.operators.similarity import (
        matryoshka_recall_eval,
    )
    from mapreduceimpl_spark.plans import explain_str
    from mapreduceimpl_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = explain_str(matryoshka_recall_eval(emb), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
