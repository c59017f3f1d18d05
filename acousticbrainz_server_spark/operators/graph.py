"""Iterative graph operators (PageRank) on DataFrame edge lists.

Companion to the connected-components operators in ``dedup/components.py``:
the same iterate-with-localCheckpoint discipline (constant-size plans, lineage
cut every round) applied to rank propagation.  The reference keeps similarity
relationships in static tables (similarity.similarity, db/similarity.py) —
ranking entities by graph centrality over those edges is the natural analytics
extension, and PageRank is the canonical iterative workload a Spark engine
must express well.

Scale design (100 TB):
- the edge list is the big, immutable side — it is joined ONCE per iteration
  and never shuffled after the initial (src -> outdeg) decoration when the
  rank vector is broadcastable;
- the rank vector is O(|V|) — for graphs whose vertex set fits the broadcast
  budget (hundreds of millions of rows do not; tens of millions do) it is
  broadcast each round, so the per-iteration cost is one map-side join plus
  one aggregation on ``dst``.  For larger graphs, drop ``broadcast_ranks``
  and pre-partition both sides on the join key: the shuffle then moves only
  the O(|V|) rank vector, never the O(|E|) edges;
- ``localCheckpoint`` per round keeps the logical plan constant-size
  (otherwise each iteration re-analyzes a strictly deeper tree — Catalyst
  analysis time grows quadratically with iteration count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 6,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns ``(node, pr)`` with ranks scaled so that ``sum(pr) == |V|``
    (every node starts at 1.0 and the teleport term is ``1 - damping`` per
    node) — the scaled form keeps values O(1) at any graph size, which is
    what makes the cross-engine rounded-hash comparison stable.

    Dangling nodes (no out-edges) have their mass redistributed uniformly,
    the standard correction; on graphs where every node has an out-edge the
    correction term is exactly 0.0 and the formula reduces to the plain
    update, so an oracle over such a graph can omit the term.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # decorate each edge with its source's out-degree ONCE; iterations reuse it
    ed = edges.join(deg, src).localCheckpoint(eager=False)
    ranks = nodes.withColumn("pr", F.lit(1.0))
    maybe_bc = F.broadcast if broadcast_ranks else (lambda df: df)
    for _ in range(iterations):
        r = maybe_bc(ranks)
        contrib = (
            ed.join(r, ed[src] == r["node"])
            .select(F.col(dst).alias("node"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: rank sitting on nodes with no out-edges is spread
        # uniformly (1-row aggregate cross-joined, not collected)
        dangling = (
            ranks.join(deg.select(F.col(src).alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / F.lit(float(n_nodes)))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
