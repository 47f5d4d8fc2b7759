"""k-means invariants (not DuckDB-expressible; SURVEY §5.2 layer 3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduceimpl_spark.operators.kmeans import _assign, kmeans_fit


def test_kmeans_basic_invariants(embeddings):
    k = 5
    centroids, assignments = kmeans_fit(embeddings, k=k, max_iter=4)
    rows = assignments.collect()
    assert len(rows) == embeddings.count()
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(k))
    assert len(centroids) == k
    assert all(len(c) == 64 for c in centroids)


def test_assignment_is_nearest_centroid(embeddings):
    """Every point's assigned cluster minimizes squared distance over
    the returned centroids (Lloyd's invariant after the final assign)."""
    k = 4
    centroids, assignments = kmeans_fit(embeddings, k=k, max_iter=3)
    sample = (
        embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(assignments, "vec_id")
        .limit(50)
        .collect()
    )
    for row in sample:
        dists = [
            sum((a - b) ** 2 for a, b in zip(row["v"], c)) for c in centroids
        ]
        best = min(range(k), key=lambda i: (dists[i], i))
        assert math.isclose(dists[row["cluster"]], dists[best], rel_tol=1e-9)


def test_centroid_is_cluster_mean(embeddings):
    """At convergence, each centroid equals the mean of its assigned
    vectors (update-step invariant; holds only once assignments stop
    changing).  A 100-vector subset converges in a handful of Lloyd
    iterations — deterministic, so this is stable across runs."""
    k = 3
    subset = embeddings.filter(F.col("vec_id") < 100)
    centroids, _ = kmeans_fit(subset, k=k, max_iter=40)
    vectors = subset.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = _assign(vectors, centroids)
    sums = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    for r in sums:
        mean = r["s"] / r["n"]
        assert math.isclose(mean, centroids[r["cluster"]][r["pos"]], rel_tol=1e-4, abs_tol=1e-6)


def test_kmeans_deterministic(embeddings):
    c1, _ = kmeans_fit(embeddings, k=3, max_iter=2)
    c2, _ = kmeans_fit(embeddings, k=3, max_iter=2)
    assert c1 == c2


def test_kmeans_k_exceeding_vectors_no_duplicate_centroids(spark):
    """k > #distinct vectors returns fewer centroids, never
    duplicates (round-2 review: farthest-first re-picked the lowest-id
    vector once candidates were exhausted)."""
    from mapreduceimpl_spark.operators import kmeans as km

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)], ["vec_id", "embedding"]
    )
    centroids, assign = km.kmeans_fit(df, k=10, max_iter=3)
    assert len(centroids) <= 5
    assert len({tuple(c) for c in centroids}) == len(centroids)
    assert assign.count() == 5


def test_kmeans_lloyd_fixed_nearest_and_shape(embeddings):
    """Final assignment must be optimal vs the FINAL centroids
    implied by the previous iteration's members, every vector
    assigned exactly once, clusters within [0, k)."""
    from mapreduceimpl_spark.operators.kmeans import kmeans_lloyd_fixed

    out = kmeans_lloyd_fixed(embeddings, k=4, iterations=3).collect()
    n = embeddings.count()
    assert len(out) == n
    assert {r["cluster"] for r in out} <= set(range(4))
    assert all(r["dist"] >= 0.0 for r in out)


def test_kmeans_lloyd_fixed_line_example(spark):
    """Two well-separated groups on a line with k=2: after one update
    round every point must sit with its group."""
    from mapreduceimpl_spark.operators.kmeans import kmeans_lloyd_fixed

    rows = [
        (1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.5, 0.0]),
        (4, [10.0, 0.0]), (5, [11.0, 0.0]), (6, [10.5, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_lloyd_fixed(df, k=2, iterations=3).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_kmeans_lloyd_fixed_validates(spark):
    import pytest as _pytest

    from mapreduceimpl_spark.operators.kmeans import kmeans_lloyd_fixed

    df = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    with _pytest.raises(ValueError):
        kmeans_lloyd_fixed(df, k=0)
    with _pytest.raises(ValueError):
        kmeans_lloyd_fixed(df, iterations=0)


def test_kmeans_label_agreement_hand_cases(spark):
    """Two tight, far-apart blobs with labels matching the blobs:
    Lloyd with k=2 separates them perfectly -> purity 1, ARI 1.
    With labels UNRELATED to geometry (alternating), agreement drops
    to chance -> ARI near 0 (and well below the aligned case)."""
    from mapreduceimpl_spark.operators.kmeans import kmeans_label_agreement

    # vec_ids 0,1 seed the two clusters (deterministic lowest-id init)
    blob_a = [(i, [0.0 + 0.01 * i, 0.0], "a") for i in range(0, 8, 2)]
    blob_b = [(i, [10.0 + 0.01 * i, 10.0], "b") for i in range(1, 9, 2)]
    aligned = spark.createDataFrame(
        blob_a + blob_b, "vec_id long, embedding array<double>, label string"
    )
    r = kmeans_label_agreement(aligned, k=2, iterations=2).collect()[0]
    assert (r["n"], r["k_used"], r["n_labels"]) == (8, 2, 2)
    assert r["purity"] == 1.0 and r["ari"] == 1.0

    # same geometry, labels orthogonal to the blobs (2 per blob each)
    shuffled = spark.createDataFrame(
        [(v, e, "x" if i % 2 == 0 else "y")
         for i, (v, e, _l) in enumerate(blob_a + blob_b)],
        "vec_id long, embedding array<double>, label string",
    )
    r2 = kmeans_label_agreement(shuffled, k=2, iterations=2).collect()[0]
    assert r2["ari"] < 0.2 and r2["purity"] <= 0.75


def test_kmeans_silhouette_separated_vs_merged(spark):
    """Two tight far-apart blobs: silhouette near 1 for both clusters.
    One smeared blob split into 2 forced clusters: silhouette
    collapses toward 0 — the internal signal that k was wrong."""
    from mapreduceimpl_spark.operators.kmeans import kmeans_silhouette

    tight = spark.createDataFrame(
        [(i, [0.0 + 0.001 * i, 0.0]) for i in range(0, 8, 2)]
        + [(i, [10.0 + 0.001 * i, 10.0]) for i in range(1, 9, 2)],
        "vec_id long, embedding array<double>",
    )
    rows = kmeans_silhouette(tight, k=2, iterations=2).collect()
    assert len(rows) == 2
    assert all(r["mean_silhouette"] > 0.9 for r in rows)
    assert sum(r["n_points"] for r in rows) == 8

    smear = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    rows2 = kmeans_silhouette(smear, k=2, iterations=3).collect()
    assert all(r["mean_silhouette"] < 0.9 for r in rows2)
