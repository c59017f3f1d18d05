"""Graph-centrality queries (PageRank over the co-purchase graph).

The reference materializes pairwise similarity relations (similarity.similarity,
db/similarity.py) and serves nearest-neighbor lookups over them; ranking the
entity graph by centrality is the batch-analytics extension of that surface.
PageRank is THE canonical iterative DataFrame workload: the oracle unrolls the
same fixed number of power iterations as chained CTEs, so the gate certifies
every intermediate join/aggregate, not just a fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..operators.graph import pagerank
from ..sources.tables import load_table
from .registry import query

_PR_ITERS = 6
_PR_D = 0.85


def _pagerank_oracle(iters: int = _PR_ITERS, d: float = _PR_D) -> str:
    """Unrolled power iterations as chained CTEs (DuckDB disallows aggregates
    in recursive terms, so the loop is materialized at SQL-generation time).

    The co-purchase graph is bipartite customer<->supplier with BOTH edge
    directions present, so every node has an out-edge and the dangling-mass
    term of the Spark operator is identically 0.0 — the oracle omits it.
    """
    parts = [
        f"""
        WITH pairs AS (
          SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
          SELECT c AS src, s AS dst FROM pairs
          UNION ALL
          SELECT s AS src, c AS dst FROM pairs
        ),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        r0 AS (SELECT node, 1.0 AS pr FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
        r{i} AS (
          SELECT n.node, {1.0 - d} + {d} * coalesce(t.contrib, 0.0) AS pr
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum(r.pr / dg.outdeg) AS contrib
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN deg dg ON dg.src = e.src
            GROUP BY e.dst
          ) t ON t.node = n.node
        )"""
        )
    parts.append(f"""
        SELECT node, {sql_round_half_up('pr', 5)} AS pr FROM r{iters}""")
    return "".join(parts)


@query(
    "pagerank_copurchase",
    family="GRAPH,V3",
    doc=f"PageRank ({_PR_ITERS} power iterations, d={_PR_D}) over the bipartite "
    "customer<->supplier co-purchase graph (both directions, node space "
    "disambiguated as 2k / 2k+1).  Spark: edges decorated with out-degree "
    "once, rank vector broadcast per iteration (the O(|V|) side moves, the "
    "O(|E|) side never reshuffles), localCheckpoint keeps plans constant-"
    "size.  Ranks are the scaled form (sum == |V|) so rounding to 5 digits "
    "is stable cross-engine.",
    oracle=_pagerank_oracle(),
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        # both union branches consume pairs — materialize the join+distinct
        # once instead of running it per branch
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_D, symmetric=True)
    return ranks.select("node", round_half_up(F.col("pr"), 5).alias("pr"))


_LPA_ITERS = 4


def _lpa_oracle(iters: int = _LPA_ITERS) -> str:
    """Unrolled synchronous label-propagation iterations as chained CTEs
    (deterministic: most-frequent neighbor label, ties to the smallest)."""
    parts = [
        """
        WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        edges AS (
          SELECT u AS src, v AS dst FROM pairs
          UNION ALL
          SELECT v AS src, u AS dst FROM pairs
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
        l{i} AS (
          SELECT dst AS node, label FROM (
            SELECT e.dst, l.label,
                   row_number() OVER (PARTITION BY e.dst
                                      ORDER BY count(*) DESC, l.label) AS rn
            FROM edges e JOIN l{i - 1} l ON l.node = e.src
            GROUP BY e.dst, l.label
          ) WHERE rn = 1
        )"""
        )
    parts.append(f"""
        SELECT node, label FROM l{iters}""")
    return "".join(parts)


@query(
    "label_propagation_communities",
    family="GRAPH",
    doc=f"Synchronous label propagation ({_LPA_ITERS} rounds, most-frequent "
    "neighbor label, ties to the smallest) over the part co-purchase "
    "graph — the deterministic fixed-iteration form of LPA community "
    "detection.  Spark: the edge list is joined once per round against "
    "the broadcast O(|V|) label vector (edges never reshuffle), the "
    "adopt step is one (dst,label) aggregate + per-dst rank window, and "
    "localCheckpoint caps plan growth.  The oracle unrolls the identical "
    "rounds as chained CTEs, so every intermediate join/aggregate/rank "
    "is certified, not just the fixed point.",
    oracle=_lpa_oracle(),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    pairs = (
        e.select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    return label_propagation(edges, iterations=_LPA_ITERS)


_BFS_ROUNDS = 4
_BFS_SOURCE = 0  # part 0 exists at every sf (partkeys are dense from 0)


def _bfs_oracle(rounds: int = _BFS_ROUNDS, src: int = _BFS_SOURCE) -> str:
    """Unrolled BFS frontier expansion: d{i} holds min-distance labels after
    i rounds; each round relaxes one hop and keeps the minimum."""
    parts = [
        f"""
        WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        edges AS (
          SELECT u AS src, v AS dst FROM pairs
          UNION ALL
          SELECT v AS src, u AS dst FROM pairs
        ),
        d0 AS (SELECT {src} AS node, 0 AS dist)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
        d{i} AS (
          SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM d{i - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + 1 AS dist
            FROM edges e JOIN d{i - 1} d ON d.node = e.src
          ) GROUP BY node
        )"""
        )
    parts.append(f"""
        SELECT node, dist FROM d{rounds}""")
    return "".join(parts)


@query(
    "bfs_shortest_paths",
    family="GRAPH",
    doc=f"Single-source BFS over the part co-purchase graph: exact hop "
    f"distance from part {_BFS_SOURCE} for every node within "
    f"{_BFS_ROUNDS} hops.  Spark relaxes one hop per round — the O(|E|) "
    "edge list joins against the broadcast frontier-so-far, the union "
    "reduces by min(dist), localCheckpoint caps plan depth (the "
    "pagerank/LPA discipline).  Unlike a visited-set BFS, the "
    "min-relaxation form needs no anti-join and is idempotent per round, "
    "which is what makes the unrolled-CTE oracle line up exactly.",
    oracle=_bfs_oracle(),
)
def bfs_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    pairs = (
        e.select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    # delta iteration: only the FRONTIER (nodes first reached last round)
    # relaxes — each edge is traversed exactly once per endpoint discovery
    # instead of once per round (measured ~2x at sf0.1; at 100 TB this is
    # the difference between O(|E|) and O(rounds * |E|) join work).  The
    # min-relaxation oracle yields the identical distance set because BFS
    # distances are final on first discovery.
    dist = spark.createDataFrame([(_BFS_SOURCE, 0)], "node LONG, dist INT")
    frontier = dist
    for i in range(1, _BFS_ROUNDS + 1):
        candidates = (
            edges.join(F.broadcast(frontier), edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = (
            candidates.join(F.broadcast(dist), "node", "left_anti")
            .select("node", F.lit(i).alias("dist"))
            .localCheckpoint(eager=False)
        )
        dist = dist.union(frontier).localCheckpoint(eager=False)
    return dist
