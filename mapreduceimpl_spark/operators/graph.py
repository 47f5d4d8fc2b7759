"""Graph operators on DataFrames: PageRank over an edge table.

PageRank is the canonical MapReduce workload after word count — each
iteration IS a map (emit rank/out_degree along each edge) plus a
reduce (sum contributions per target), which the reference framework's
shuffle (``test.go:77-81``) exists to support.  Spark-first that is:
a join (edges x ranks) and one aggregation per iteration, with the
degree table computed once.

Determinism (oracle + retry safety): per-target contribution sums are
decimal-routed (DECIMAL(28,12)) so partition order never changes a
rank; the final rank is rounded before output.  A FIXED iteration
count keeps the whole computation expressible as chained SQL CTEs —
the DuckDB oracle replays all iterations bit-exactly, so unlike
typical iterative ops this one is hash-verified, not rows-only.

Scale: per iteration one shuffle keyed on dst (uniform content keys if
node ids are hashed; AQE handles residual skew), plus a keyed join on
src.  ranks is O(nodes) — orders of magnitude smaller than edges — so
at 100 TB the edge table dominates and iterations stream it once each.
A production loop would also checkpoint ranks every few iterations to
truncate lineage; with a fixed small iteration count the plan stays
shallow enough without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = DAMPING,
    round_digits: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank. ``edges``: (src, dst) rows, assumed
    distinct.  Returns (node, rank) for every node appearing as src or
    dst; rank rounded to ``round_digits``.

    Simplified formulation (matches the chained-CTE oracle): dangling
    mass is not redistributed — new_rank = (1 - d) + d * sum of
    incoming rank/out_degree, the original Page et al. form.
    """
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, got {iterations}")
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.union(dst_nodes).distinct()
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("contrib").cast("decimal(28,12)"))
                .cast("double")
                .alias("incoming")
            )
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", round_digits).alias("rank"))
