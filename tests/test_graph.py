"""PageRank invariants: hand-computable graphs + fixture sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators import graph


def _ranks(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iterations=iterations).collect()
    }


def test_two_node_cycle_is_stationary(spark):
    """A <-> B with uniform start is already the fixed point: every
    iteration yields rank 1.0 for both."""
    got = _ranks(spark, [(1, 2), (2, 1)], iterations=3)
    assert got == {1: 1.0, 2: 1.0}


def test_chain_converges_to_hand_computed_values(spark):
    """A -> B (no back edge): A gets no inflow, so rank_A = 0.15 from
    iteration 1 on; B sees 0.15 + 0.85 * rank_A = 0.2775 once A has
    settled."""
    got = _ranks(spark, [(1, 2)], iterations=5)
    assert got[1] == pytest.approx(0.15, abs=1e-9)
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-9)


def test_rank_floor_and_star_ordering(spark):
    """Every node's rank >= (1 - d); the hub of a star graph outranks
    its spokes."""
    spokes = [(i, 100) for i in range(1, 6)]  # 5 spokes -> hub 100
    got = _ranks(spark, spokes + [(100, 1)], iterations=5)
    assert all(r >= 0.15 - 1e-12 for r in got.values())
    assert got[100] > max(r for n, r in got.items() if n != 100)


def test_iterations_validated(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        graph.pagerank(df, iterations=0)


def test_determinism_across_partitionings(spark):
    """Same ranks whatever the edge partitioning (decimal-routed
    contribution sums are order-free)."""
    edges = [(i, (i * 7) % 23) for i in range(60)]
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df8 = df1.repartition(8)
    r1 = {r["node"]: r["rank"] for r in graph.pagerank(df1, 3).collect()}
    r8 = {r["node"]: r["rank"] for r in graph.pagerank(df8, 3).collect()}
    assert r1 == r8


def test_triangle_count_known_graphs(spark):
    from mapreduceimpl_spark.operators.graph import triangle_count

    def count(pairs):
        e = spark.createDataFrame(pairs, "src long, dst long")
        return triangle_count(e).collect()[0]["n_triangles"]

    triangle = [(1, 2), (2, 3), (3, 1)]
    assert count(triangle) == 1
    square = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert count(square) == 0
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    assert count(k4) == 4
    # duplicate edges, reversed duplicates, and self-loops don't
    # inflate the count (undirected canonicalization + a != b filter)
    messy = triangle + [(2, 1), (2, 3), (1, 1)]
    assert count(messy) == 1


def test_triangle_count_degree_orientation_matches_id_orientation(spark):
    """The scale-friendly (degree, id) orientation must count exactly
    what a plain id orientation counts on a skewed hub graph (one hub
    connected to everything plus a chain)."""
    from mapreduceimpl_spark.operators.graph import triangle_count

    hub = [(0, i) for i in range(1, 20)] + [(i, i + 1) for i in range(1, 19)]
    e = spark.createDataFrame(hub, "src long, dst long")
    got = triangle_count(e).collect()[0]["n_triangles"]
    # each chain edge (i, i+1) for 1<=i<19 forms a triangle with hub 0
    assert got == 18


def test_clustering_coefficient_known_values(spark):
    """Hub-and-chain: hub 0 connects to 1..4, plus edge (1,2).  Node
    1 and 2 each have deg 2 and one triangle -> coeff 1.0; hub has
    deg 4, one triangle -> 2*1/(4*3) = 0.166667; leaf 3 (deg 1) is
    excluded."""
    from mapreduceimpl_spark.operators.graph import clustering_coefficient

    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in clustering_coefficient(e).collect()}
    assert got[1]["coeff"] == 1.0 and got[1]["n_triangles"] == 1
    assert got[2]["coeff"] == 1.0
    assert got[0]["deg"] == 4 and got[0]["coeff"] == round(2 / 12, 6)
    assert 3 not in got and 4 not in got  # deg < 2 excluded


def test_hits_star_hand_values(spark):
    """Bipartite star: hubs {1,2,3} all point at authority 10; hub 1
    also points at 11.  Authority 10 gets hub mass from all three,
    11 only from hub 1 -> auth(10) > auth(11); hub 1 points at both
    authorities -> hub(1) > hub(2) = hub(3).  L2 norms make each
    side's squares sum to 1."""
    from mapreduceimpl_spark.operators.graph import hits

    edges = [(1, 10), (2, 10), (3, 10), (1, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["kind"], r["node"]): r["score"] for r in hits(e, iterations=5).collect()}

    assert got[("authority", 10)] > got[("authority", 11)] > 0
    assert got[("hub", 1)] > got[("hub", 2)] > 0
    assert got[("hub", 2)] == got[("hub", 3)]
    for kind in ("hub", "authority"):
        sq = sum(v * v for (k, _n), v in got.items() if k == kind)
        assert abs(sq - 1.0) < 1e-6


def test_hits_two_disjoint_pairs_symmetric(spark):
    """Two disjoint src->dst pairs: perfectly symmetric, so both hubs
    (and both authorities) share the same score 1/sqrt(2)."""
    from mapreduceimpl_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 10), (2, 20)], "src long, dst long")
    got = {(r["kind"], r["node"]): r["score"] for r in hits(e, iterations=3).collect()}
    expected = round(2 ** -0.5, 9)
    assert got[("hub", 1)] == got[("hub", 2)] == expected
    assert got[("authority", 10)] == got[("authority", 20)] == expected


def test_hits_iterations_validated(spark):
    from mapreduceimpl_spark.operators.graph import hits
    import pytest

    e = spark.createDataFrame([(1, 10)], "src long, dst long")
    with pytest.raises(ValueError):
        hits(e, iterations=0)


def test_hits_plan_growth_is_polynomial_not_exponential(spark):
    """The agg+crossJoin L2-norm form referenced each raw phase frame
    twice, doubling the logical plan per phase (2^(2*iterations)
    duplicated subtrees — plan stringification alone OOMed the JVM at
    sf0.01).  The window-norm form references each phase exactly once;
    the plan string grows ~quadratically (the output union embeds the
    chain twice, and per-node text widens with depth): measured ~3.2x
    per iteration doubling, vs 16x/64x for the exponential form."""
    from mapreduceimpl_spark.operators.graph import hits
    from mapreduceimpl_spark.plans import explain_str

    e = spark.createDataFrame(
        [(i, 100 + (i % 3)) for i in range(12)], "src long, dst long"
    )
    p2 = len(explain_str(hits(e, iterations=2), "simple"))
    p3 = len(explain_str(hits(e, iterations=3), "simple"))
    p4 = len(explain_str(hits(e, iterations=4), "simple"))
    p6 = len(explain_str(hits(e, iterations=6), "simple"))
    assert p4 < 6 * p2, (p2, p4)
    assert p6 < 6 * p3, (p3, p6)


# ---------------------------------------------------------------------------
# label propagation (staged round 12)
# ---------------------------------------------------------------------------


def test_label_propagation_matches_duckdb_oracle(spark):
    """Staged entry, driver-equivalent compare: four synchronous LPA
    rounds over the purchase graph equal the chained-CTE replay
    exactly (all-integer, no float routing)."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.sources import TABLES
    from tools.check_oracle import compare

    sf = "/root/testdata/sf0.001"
    sdf = catalog._q_label_propagation(spark, sf).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    odf = con.execute(catalog._label_propagation_oracle()).fetchdf()
    con.close()
    problems = compare("label_propagation", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_label_propagation_two_components(spark):
    """Two disjoint triangles: each converges to the all-min-id label
    within 4 synchronous rounds (hand-traced: tie-breaks pull the min
    id across the triangle in round 2, unanimity by round 3)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)], ["src", "dst"]
    )
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(edges, iterations=4).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_label_propagation_tie_breaks_to_smallest(spark):
    """A node with two equally frequent neighbor labels adopts the
    smaller one: star center 10 with leaves 1 and 2 (round 1 labels
    stay 1 and 2 — each leaf sees only the center) takes label 1."""
    edges = spark.createDataFrame([(10, 1), (10, 2)], ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(edges, iterations=1).collect()
    }
    assert got[10] == 1
    # leaves see only the center's previous label
    assert got[1] == 10 and got[2] == 10


def test_label_propagation_rejects_bad_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        graph.label_propagation(edges, iterations=0)


def test_label_propagation_plan_shape(spark):
    """Staged plan pin: joins are equi-joins against the O(nodes)
    label relation — no cartesian, no nested loop."""
    from mapreduceimpl_spark.plans import explain_str

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    plan = explain_str(graph.label_propagation(edges, iterations=2), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# personalized (topic-sensitive) PageRank (staged round 13)
# ---------------------------------------------------------------------------


def test_ppr_matches_duckdb_oracle(spark):
    """Staged entry, driver-equivalent compare: five restart-vector
    rounds over the purchase graph with nation-1 customer seeds equal
    the chained-CTE replay exactly."""
    import duckdb

    from mapreduceimpl_spark import catalog
    from mapreduceimpl_spark.sources import TABLES
    from tools.check_oracle import compare

    sf = "/root/testdata/sf0.001"
    sdf = catalog._q_pagerank_personalized(spark, sf).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    odf = con.execute(catalog._ppr_oracle()).fetchdf()
    con.close()
    problems = compare("pagerank_personalized", sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0


def test_ppr_mass_stays_on_seed_side(spark):
    """Two disconnected components; seeds in one.  Every node of the
    seedless component finishes at exactly 0.0, every seed node
    strictly positive, and the seed component's ranks reflect the
    restart asymmetry (the seed outranks the non-seed leaf it points
    to only through damping)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (10, 11), (11, 10)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank_personalized(edges, seeds, iterations=5).collect()
    }
    assert set(got) == {1, 2, 10, 11}
    assert got[10] == 0.0 and got[11] == 0.0
    assert got[1] > 0.0 and got[2] > 0.0


def test_ppr_against_pure_python_reference(spark):
    """A seeded random graph iterated by an independent pure-Python
    power loop must reproduce every rank to 1e-6."""
    import random

    rng = random.Random(1117)
    n_nodes = 30
    edges = sorted(
        {
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(70)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    seed_set = {0, 3, 7}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    present_seeds = sorted(seed_set & set(nodes))
    restart = {
        n: (1.0 / len(present_seeds) if n in present_seeds else 0.0)
        for n in nodes
    }
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    rank = dict(restart)
    d = 0.85
    for _ in range(5):
        incoming = {n: 0.0 for n in nodes}
        for a, b in edges:
            incoming[b] += rank[a] / out_deg[a]
        rank = {
            n: (1.0 - d) * restart[n] + d * incoming[n] for n in nodes
        }
    want = {n: round(rank[n], 6) for n in nodes}

    sedges = spark.createDataFrame(edges, ["src", "dst"])
    sseeds = spark.createDataFrame([(s,) for s in sorted(seed_set)], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank_personalized(sedges, sseeds, iterations=5).collect()
    }
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) <= 1e-6, (n, got[n], want[n])


def test_ppr_rejects_bad_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    with pytest.raises(ValueError):
        graph.pagerank_personalized(edges, seeds, iterations=0)
