"""DataFrame-native k-means (Lloyd's algorithm).

Completes what the reference only sketches in comments
(``kmeans.go:14-25``: split input, locally cluster per mapper, merge
per coordinate range in reducers — stubs ``KnnMap``/``KnnReduce`` at
``kmeans.go:5-12`` are empty).  The Spark-first formulation is the
textbook distributed Lloyd's:

  assign:  broadcast k centroids; each vector picks argmin distance
           (narrow map stage, no shuffle)
  update:  groupBy(cluster) -> per-dimension mean (one shuffle of k
           partial sums per partition — map-side combined)

Only the k centroid rows ever reach the driver (k * dim doubles per
iteration), so the loop is cluster-scale: 100 TB of vectors moves
through narrow stages + a k-row aggregate per iteration.

Determinism: init = first k vectors by vec_id (stable), squared-L2
distance with fixed fold order, argmin ties broken by lowest cluster
id.  Not SQL-expressible as one query (iterative) → driver rows-only
check + pytest invariants (assignment optimality, centroid = mean).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(v: F.Column, c: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster`` = argmin_c ||v - centroid_c||^2 (ties -> lowest c)."""
    dists = [
        _sq_dist(F.col("v"), F.array(*[F.lit(float(x)) for x in c])).alias(f"d_{i}")
        for i, c in enumerate(centroids)
    ]
    with_d = vectors.select("*", *dists)
    best = F.least(*[F.col(f"d_{i}") for i in range(len(centroids))])
    cluster = F.lit(len(centroids) - 1)
    for i in reversed(range(len(centroids))):
        cluster = F.when(F.col(f"d_{i}") == best, F.lit(i)).otherwise(cluster)
    return with_d.select(
        *vectors.columns, cluster.cast("long").alias("cluster"), best.alias("sq_dist")
    )


def _init_farthest_first(
    vectors: DataFrame, k: int, sample_size: int = 2048
) -> list[list[float]]:
    """Deterministic k-means++-style seeding: farthest-first traversal
    over a deterministic hash-sample of candidates.

    ONE Spark job collects up to ``sample_size`` candidate vectors
    (ordered by an md5-derived uniform of vec_id — deterministic, not
    partition-dependent); the maximin traversal then runs driver-side
    in NumPy: the sampled candidates are re-sorted by vec_id, the
    traversal starts from the lowest-vec_id candidate, then repeatedly
    adds the candidate farthest from its nearest chosen centroid (ties
    by lowest vec_id).  Same spread-the-seeds effect as k-means++, no
    RNG, byte-reproducible — and O(1) passes over the data instead of
    the k-1 full-corpus scans a distributed farthest-first would cost
    (which would dominate ivf_topk's index build at scale).

    Stops early when every remaining candidate coincides with a chosen
    centroid (max min-distance == 0), so k > #distinct SAMPLED vectors
    returns fewer, never-duplicated centroids.  The sample is at least
    4k rows; if the traversal still exhausts at the sample boundary a
    warning notes that a larger ``sample_size`` may recover more
    distinct seeds (a duplicate-heavy corpus can fill the sample with
    copies).
    """
    import warnings

    from mapreduceimpl_spark.operators.sampling import hash_uniform

    effective = max(sample_size, 4 * k)
    rows = (
        vectors.orderBy(hash_uniform(F.col("vec_id")), F.col("vec_id"))
        .limit(effective)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans: empty input")
    # candidates in (hash, vec_id) order; re-sort by vec_id for the
    # deterministic tie-break
    rows.sort(key=lambda r: r["vec_id"])
    cand = np.array([r["v"] for r in rows], dtype=np.float64)
    centroids = [0]
    dmin = ((cand - cand[0]) ** 2).sum(axis=1)
    while len(centroids) < min(k, len(cand)):
        far = int(np.argmax(dmin))  # argmax returns the FIRST max: lowest id
        if dmin[far] == 0.0:
            break  # every remaining candidate duplicates a chosen centroid
        centroids.append(far)
        dmin = np.minimum(dmin, ((cand - cand[far]) ** 2).sum(axis=1))
    if len(centroids) < k and len(rows) == effective:
        warnings.warn(
            f"kmeans farthest-first: sample of {effective} rows held only "
            f"{len(centroids)} distinct vectors (< k={k}); the corpus may "
            "have more — raise sample_size to recover them",
            RuntimeWarning,
            stacklevel=2,
        )
    return [list(cand[i]) for i in centroids]


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
    init: str = "farthest",
    init_sample_size: int = 2048,
) -> tuple[list[list[float]], DataFrame]:
    """Run Lloyd's; return (centroids, assignments DataFrame).

    Assignments: (vec_id, cluster, sq_dist).  ``init``: "farthest"
    (default; deterministic k-means++-style spread — insurance against
    degenerate adjacent seeds when ids correlate with content; on the
    synthetic fixture both inits converge to equivalent quality, see
    COVERAGE.md for measured numbers) or "first" (k lowest-id
    vectors — cheapest, one pass; may return duplicate centroids when
    the lowest-id vectors repeat).  "farthest" never returns duplicate
    centroids; it may return FEWER than k when its candidate sample
    (``init_sample_size``, floored at 4k rows) holds fewer than k
    distinct vectors — it warns when the sample boundary is the cause.
    """
    vectors = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).cache()

    if init == "farthest":
        centroids = _init_farthest_first(vectors, k, sample_size=init_sample_size)
    elif init == "first":
        # deterministic init: the k lowest-id vectors
        init_rows = vectors.orderBy("vec_id").limit(k).collect()
        centroids = [list(r["v"]) for r in init_rows]
    else:
        raise ValueError(f"unknown init {init!r} (use 'farthest' or 'first')")

    for _ in range(max_iter):
        assigned = _assign(vectors, centroids)
        # update: per-(cluster, dimension) partial sums — map-side
        # combined, so the shuffle carries k*dim rows per partition and
        # only k*dim rows reach the driver (640 doubles at k=10,d=64).
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        )
        rows = sums.collect()
        new_centroids = [list(c) for c in centroids]
        for r in rows:
            c = int(r["cluster"])
            new_centroids[c][int(r["pos"])] = float(r["s"]) / float(r["n"])
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift < tol:
            break

    assignments = _assign(vectors, centroids).select("vec_id", "cluster", "sq_dist")
    # the iterations that needed the cache are done; drop it so repeated
    # catalog/bench runs don't accumulate executor memory (the final
    # assignment pass recomputes one narrow scan lazily)
    vectors.unpersist()
    return centroids, assignments


def kmeans_assignments(embeddings: DataFrame, k: int = 10, max_iter: int = 5) -> DataFrame:
    """Convenience: fit then return (vec_id, cluster) — the driver-facing
    rows-only query."""
    _, assignments = kmeans_fit(embeddings, k=k, max_iter=max_iter)
    return assignments.select("vec_id", "cluster")


def kmeans_lloyd_fixed(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Fixed-seed, fixed-iteration Lloyd's k-means whose final
    assignment is VALUE-verifiable against a chained-CTE DuckDB replay
    (VERDICT r4 gap #4 — flips k-means from rows-only to hash-green,
    the ``pagerank`` pattern applied to clustering).

    Unlike ``kmeans_fit`` (farthest-first seeding, driver-side
    centroid loop), everything here is ONE lazy plan with no collect:

    - init: centroids = embeddings of the ``k`` lowest vec_ids
      (deterministic, SQL-expressible);
    - iterate ``iterations`` x: assign each point to the nearest
      centroid (squared L2), then recompute per-dimension means —
      the last iteration stops after the assign;
    - representation: points exploded to (vec_id, dim, x) once; a
      centroid set is k*dim rows broadcast onto the per-dim join.

    Engine-exact arithmetic: distances sum DECIMAL-cast (order-free)
    squared terms over identical doubles; means divide a decimal sum
    by the count and round via floor(x*1e9+.5)/1e9 (the repo's
    bit-exact half-up, immune to the HALF_UP/half-even cast split);
    argmin ties break on cluster id.

    Scale: per iteration one broadcast join (k*dim rows ride to every
    executor) + two keyed shuffles (per-point distance agg on vec_id,
    mean agg on (cluster, dim)); the point set itself re-scans per
    iteration but never shuffles wider than those aggregates.  Linear
    lineage (centroids_i references assign_{i-1} exactly once), so no
    exponential replay.
    """
    assign, _ = kmeans_lloyd_internals(embeddings, k, iterations)
    return assign.select(
        "vec_id",
        "cluster",
        (F.floor(F.col("dist").cast("double") * 1e6 + F.lit(0.5)) / 1e6).alias("dist"),
    )


def kmeans_lloyd_internals(
    embeddings: DataFrame, k: int = 4, iterations: int = 3
):
    """The Lloyd loop behind :func:`kmeans_lloyd_fixed`, exposed for
    composition (e.g. the SQL-replayable IVF quantizer): returns
    ``(assign, centroids)`` where ``assign`` is (vec_id, cluster,
    dist DECIMAL) after the final iteration and ``centroids`` is the
    exploded (cluster, dim, c) frame the final assignment was scored
    against — both lazy, both engine-exact per the parent docstring."""
    if k < 1 or iterations < 1:
        raise ValueError(
            f"kmeans Lloyd loop: need k >= 1 and iterations >= 1, "
            f"got k={k} iterations={iterations}"
        )
    from pyspark.sql import Window

    pts = embeddings.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    w0 = Window.orderBy("vec_id")  # bounded: applied to k rows only
    cent = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .withColumn("cluster", (F.row_number().over(w0) - 1).cast("long"))
        .select(
            "cluster",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "c"),
        )
    )

    assign = None
    for it in range(iterations):
        term = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
        dists = (
            pts.join(F.broadcast(cent), "dim")
            .select("vec_id", "cluster", term.alias("t"))
            .groupBy("vec_id", "cluster")
            .agg(F.sum(F.col("t").cast("decimal(38,18)")).alias("dist"))
        )
        rn = F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cluster"))
        )
        assign = (
            dists.withColumn("rn", rn)
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster", "dist")
        )
        if it < iterations - 1:
            mean = F.sum(F.col("x").cast("decimal(38,12)")).cast("double") / F.count(
                "*"
            )
            cent = (
                assign.join(pts, "vec_id")
                .groupBy("cluster", "dim")
                .agg((F.floor(mean * 1e9 + F.lit(0.5)) / 1e9).alias("c"))
            )
    return assign, cent


def kmeans_label_agreement(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    label_col: str = "label",
) -> DataFrame:
    """Clustering-quality eval of the hash-verified Lloyd tier against
    ground-truth labels: PURITY (Σ per-cluster majority-label mass /
    n) and the ADJUSTED RAND INDEX — the external-validation readout
    that closes the k-means loop the way ``ann_recall_eval`` closes
    ANN and ``dedup_recall_eval`` closes LSH dedup.

    ARI is pure pair-counting over the bounded k x |labels|
    contingency: with pc(x) = floor(x(x-1)/2),

      ARI = (Σij pc(n_ij) - E) / ((Σi pc(a_i) + Σj pc(b_j))/2 - E),
      E   = Σi pc(a_i) * Σj pc(b_j) / pc(n)

    every pc() an exact integer (doubles only in the final fixed-order
    products/divisions), so the single output row is hash-exact via
    the same chained-CTE replay as ``kmeans_lloyd``.  Degenerate
    denominators (single cluster AND single label) pin ARI to 0.0.

    Scale: rides the Lloyd plan (aggregate-shaped, k*dim broadcast);
    the eval itself is one (cluster, label) groupBy plus three 1-row
    aggregates on the bounded contingency.
    """
    assign, _ = kmeans_lloyd_internals(embeddings, k=k, iterations=iterations)
    labels = embeddings.select("vec_id", F.col(label_col).alias("lbl"))
    cells = assign.join(labels, "vec_id").groupBy("cluster", "lbl").agg(
        F.count("*").cast("long").alias("nij")
    )

    def pc(col):
        return F.floor((col * (col - F.lit(1))) / F.lit(2)).cast("long")

    per_cluster = cells.groupBy("cluster").agg(
        F.sum("nij").cast("long").alias("ai"),
        F.max("nij").cast("long").alias("mx"),
    )
    per_label = cells.groupBy("lbl").agg(F.sum("nij").cast("long").alias("bj"))
    sums = cells.agg(
        F.sum(pc(F.col("nij"))).cast("long").alias("sidx"),
        F.sum("nij").cast("long").alias("n"),
    )
    sa = per_cluster.agg(
        F.sum(pc(F.col("ai"))).cast("long").alias("sa"),
        F.sum("mx").cast("long").alias("summax"),
        F.count("*").cast("long").alias("k_used"),
    )
    sb = per_label.agg(
        F.sum(pc(F.col("bj"))).cast("long").alias("sb"),
        F.count("*").cast("long").alias("n_labels"),
    )
    j = sums.crossJoin(sa).crossJoin(sb)
    expected = (F.col("sa").cast("double") * F.col("sb")) / pc(F.col("n"))
    max_index = (F.col("sa") + F.col("sb")) / F.lit(2.0)
    ok = (max_index - expected) != 0
    ari = (F.col("sidx") - expected) / (max_index - expected)
    return j.select(
        "n",
        "k_used",
        "n_labels",
        F.round(F.col("summax") / F.col("n"), 9).alias("purity"),
        F.round(F.when(ok, ari).otherwise(F.lit(0.0)), 9).alias("ari"),
    )


def kmeans_silhouette(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 3,
) -> DataFrame:
    """Simplified (centroid-based) silhouette of the hash-verified
    Lloyd tier — the INTERNAL validation pairing
    :func:`kmeans_label_agreement`'s external ARI: per point,
    a = Euclidean distance to the OWN centroid, b = distance to the
    NEAREST OTHER centroid, s = (b - a) / max(a, b) in (-1, 1];
    reported as per-cluster means.  The classic O(n²) silhouette is
    replaced by the O(n*k) centroid form — the only variant that
    scales, and the standard practice at corpus size.

    Determinism: distances reuse the Lloyd loop's decimal-routed
    squared sums (one extra distance layer against the FINAL
    centroids, exactly the d_iter CTE shape, so the oracle replays
    it); per-point s is rounded to 9 then decimal-summed (the
    ``bigram_logprob`` mean pattern).  sqrt is IEEE-exact on both
    engines.

    Scale: rides the Lloyd plan plus one k*dim-broadcast distance
    pass and one O(k) aggregate; never points x points.
    """
    assign, cent = kmeans_lloyd_internals(embeddings, k=k, iterations=iterations)
    pts = embeddings.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    term = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    d_all = (
        pts.join(F.broadcast(cent), "dim")
        .select("vec_id", "cluster", term.alias("t"))
        .groupBy("vec_id", "cluster")
        .agg(F.sum(F.col("t").cast("decimal(38,18)")).alias("dist"))
    )
    own = assign.select(
        "vec_id", F.col("cluster").alias("own_cluster"), F.col("dist").alias("a2")
    )
    other = (
        d_all.join(own, "vec_id")
        .filter(F.col("cluster") != F.col("own_cluster"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("b2"))
    )
    sa = F.sqrt(F.col("a2").cast("double"))
    sb = F.sqrt(F.col("b2").cast("double"))
    s = F.when(
        F.greatest(sa, sb) > 0, (sb - sa) / F.greatest(sa, sb)
    ).otherwise(F.lit(0.0))
    scored = own.join(other, "vec_id").select(
        "own_cluster", F.round(s, 9).alias("s9")
    )
    return scored.groupBy(F.col("own_cluster").alias("cluster")).agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(
            F.sum(F.col("s9").cast("decimal(28,9)")).cast("double") / F.count("*"),
            6,
        ).alias("mean_silhouette"),
    )
