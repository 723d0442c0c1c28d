"""Connected components: hand graphs (chain, triangle+isolate, empty
edges) against known components."""

from __future__ import annotations

import pytest

from technical_test_data_engineer_spark.operators.graph import connected_components


@pytest.fixture(params=[0, 10**6], ids=["star-path", "union-find"])
def driver_max(request):
    """Run each hand-graph test through BOTH the distributed
    large-star/small-star path (driver_max_edges=0) and the
    small-edge driver union-find fast path."""
    return request.param


def _cc(spark, node_ids, edge_pairs, driver_max=None):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    if edge_pairs:
        edges = spark.createDataFrame(edge_pairs, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    if driver_max is None:
        from technical_test_data_engineer_spark.operators.graph import (
            DRIVER_UNION_FIND_MAX_EDGES as driver_max,
        )
    out = connected_components(nodes, edges, driver_max_edges=driver_max)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark, driver_max):
    # 1-2, 2-3, 3-4 ... one component rooted at 1; 9 isolated
    got = _cc(spark, [1, 2, 3, 4, 9], [(1, 2), (2, 3), (3, 4)], driver_max)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_two_components_and_triangle(spark, driver_max):
    got = _cc(spark, list(range(1, 8)), [(5, 6), (6, 7), (5, 7), (2, 4)], driver_max)
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 5, 7: 5}


def test_no_edges_all_singletons(spark, driver_max):
    got = _cc(spark, [3, 1, 2], [], driver_max)
    assert got == {1: 1, 2: 2, 3: 3}


def test_long_chain_needs_iterations(spark, driver_max):
    n = 20  # diameter 19 → several label-propagation rounds
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)], driver_max)
    assert set(got.values()) == {0}


def test_planted_chain_converges_logarithmically(spark):
    # 200-node path: diameter 199. Plain min-label propagation needs
    # ~199 rounds; large-star/small-star must finish in O(log n) —
    # assert ≤ ceil(log2(200)) + 3 = 11 rounds and correct labels.
    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    out = connected_components(nodes, edges, stats=stats, driver_max_edges=0)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 11, f"too many rounds: {stats['rounds']}"


def test_unconverged_raises(spark):
    nodes = spark.createDataFrame([(i,) for i in range(64)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1, driver_max_edges=0)


def test_triangle_enumerate_k4_and_star(spark):
    """K4 has exactly its 4 triangles; a star (one hub) has none — and
    under degree orientation the hub never becomes a wedge source, so
    the intermediate stays empty instead of hub-degree²."""
    import itertools

    from technical_test_data_engineer_spark.operators.graph import (
        triangle_enumerate,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)],
        "src long, dst long",
    )
    got = sorted(
        (r.node_a, r.node_b, r.node_c) for r in triangle_enumerate(k4).collect()
    )
    assert got == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    assert triangle_enumerate(star).count() == 0


def test_triangle_enumerate_all_hash_joins(spark):
    """The wedge close must stay an equi hash join — no nested-loop or
    cartesian fallback from an OR-of-orientations condition."""
    from technical_test_data_engineer_spark.operators.graph import (
        triangle_enumerate,
    )

    edges = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    plan = (
        triangle_enumerate(edges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_mass_conserved_and_ordering(spark):
    from technical_test_data_engineer_spark.operators.graph import pagerank

    # star: hub 1 <-> leaves 2,3,4 (symmetric). Hub must outrank leaves;
    # total mass stays 1 (stochastic matrix, no sinks).
    pairs = [(1, x) for x in (2, 3, 4)] + [(x, 1) for x in (2, 3, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[1] > got[2] == got[3] == got[4]


def test_pagerank_dangling_mass_redistributed(spark):
    from technical_test_data_engineer_spark.operators.graph import pagerank

    # 1 -> 2 -> 3, node 3 is a sink: without the dangling repair the
    # total mass decays below 1; with it, mass is conserved exactly.
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=5).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[3] > got[2] > got[1]  # rank accumulates down the chain


def test_bfs_hops_chain_and_cycle(spark, driver_max):
    from technical_test_data_engineer_spark.operators.graph import bfs_hops

    # cycle 1-2-3-4-1 plus tail 4-5; seed 1. Cycle must not loop.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            edges, seeds, max_hops=5, driver_max_edges=driver_max
        ).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_hops_cap_and_unreachable(spark, driver_max):
    from technical_test_data_engineer_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            edges, seeds, max_hops=2, driver_max_edges=driver_max
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}  # 4 beyond cap, 10/11 unreachable


def test_k_core_peels_shells(spark, driver_max):
    from technical_test_data_engineer_spark.operators.graph import k_core

    # triangle 1-2-3 (2-core) with pendant chain 3-4-5: the chain must
    # peel away in cascading rounds, the triangle survives with deg 2
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in k_core(edges, 2, driver_max_edges=driver_max).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_k3_dissolves_triangle(spark, driver_max):
    from technical_test_data_engineer_spark.operators.graph import k_core

    pairs = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    assert k_core(edges, 3, driver_max_edges=driver_max).count() == 0
    # K4 is a 3-core
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges4 = spark.createDataFrame(k4, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in k_core(edges4, 3, driver_max_edges=driver_max).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_survive_2core(spark, sf_dir):
    """Every triangle edge lives in the 2-core — consistency between
    the two graph operators on the real fixture."""
    from technical_test_data_engineer_spark.operators.graph import k_core
    from technical_test_data_engineer_spark.plans.relational_breadth_queries import (
        _copurchase_edges,
    )
    from technical_test_data_engineer_spark.plans import QUERIES

    tri = QUERIES["part_copurchase_triangles"](spark, sf_dir)
    tri_nodes = {
        v
        for r in tri.collect()
        for v in (r["node_a"], r["node_b"], r["node_c"])
    }
    core = {
        r["node"] for r in k_core(_copurchase_edges(spark, sf_dir), 2).collect()
    }
    assert tri_nodes <= core


def test_k_core_ignores_self_loops(spark):
    from technical_test_data_engineer_spark.operators.graph import k_core

    # node 1 has one real neighbor + a self-loop: must NOT survive k=2
    edges = spark.createDataFrame([(1, 2), (1, 1)], "src long, dst long")
    assert k_core(edges, 2).count() == 0


def test_k_core_peel_rounds_converges_to_fixpoint(spark):
    """A pendant chain hanging off a triangle: round 1 peels the chain
    tip, round 2 the next link, etc. — fixed-rounds output must equal
    the fixpoint once rounds >= chain length, and earlier rounds must
    be supersets of the core."""
    from technical_test_data_engineer_spark.operators.graph import (
        k_core,
        k_core_peel_rounds,
    )

    # triangle 1-2-3 with chain 3-4, 4-5, 5-6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    core = {r.node for r in k_core(edges, 2, driver_max_edges=0).collect()}
    assert core == {1, 2, 3}
    r1 = {r.node for r in k_core_peel_rounds(edges, 2, 1).collect()}
    r3 = {r.node for r in k_core_peel_rounds(edges, 2, 3).collect()}
    assert r1 == {1, 2, 3, 4, 5}      # only the tip (6) peeled
    assert r3 == core                  # chain fully stripped by round 3
    assert core <= r1
    # in-core degrees: every triangle node keeps degree 2
    degs = {
        r.node: r.degree for r in k_core_peel_rounds(edges, 2, 3).collect()
    }
    assert degs == {1: 2, 2: 2, 3: 2}
