"""Iterative graph operators — connected components for dedup clusters.

Near-dup detection yields PAIRS; acting on them (keep one doc per
duplicate group) needs CLUSTERS = connected components of the pair
graph. This is the one inherently iterative algorithm in the engine:
min-label propagation (each node repeatedly adopts the smallest label
in its neighborhood) until fixpoint — the DataFrame formulation of
map-reduce CC (cf. the large-star/small-star family; converges in
O(graph diameter) rounds, each round one shuffle on node id).

Scale notes:
- every iteration is groupBy(node).min(label) over the edge list —
  linear work, no quadratic blowup;
- ``localCheckpoint`` every round truncates the lineage (without it,
  round k replays rounds 1..k-1 — quadratic recompute and a growing
  plan that eventually breaks the planner);
- the driver-side loop only checks a scalar "did any label change"
  aggregate per round — no data ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node with the smallest node id reachable from it.

    ``nodes``: one column ``id_col`` (isolated nodes allowed — they
    become singleton components). ``edges``: undirected pairs; each row
    (src, dst) connects both ways.

    Returns (id_col, ``component``) — component = min id in the node's
    component, the canonical-representative convention (deterministic,
    matches a recursive-CTE oracle).
    """
    # checkpoint the symmetrized edge list ONCE — it is joined every
    # round, and without truncation the (possibly expensive) upstream
    # pair-generation lineage would re-execute per iteration
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("a"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate labels flowing along edges: neighbor's current label
        neighbor_labels = (
            sym.join(labels, "a")
            .select(F.col("b").alias("a"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("a")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), "component")
