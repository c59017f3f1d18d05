"""Regenerate PLANS.md — formatted physical plans of the headline queries.

Usage: python tools/gen_plans_md.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from acousticbrainz_server_spark.session import get_spark

PICKS = {
    "pricing_summary": "partial agg before one exchange; filter pushed to the scan",
    "minhash_lsh_neardup": "banded bucket join — no cross product; signatures ride the join",
    "triangle_count": "degree-oriented wedges; packed-long broadcast semi probe",
    "global_rank_twopass": "every Window partitions on _pid — no single-partition funnel",
    "bm25_retrieval": "zero-token-shuffle postings: per-term tf as array exprs in the scan projection; df folded into the 1-row stats broadcast",
    "band_join_boundaries": "inequality-only join correctly planned as BroadcastNestedLoopJoin",
    "bucketed_join_rollup": "co-bucketed tables join with zero Exchange",
    "skyline_pareto": "O(n log n) sweep replaces the quadratic dominance NOT-EXISTS",
    "prefix_filter_jaccard": "inverted index + df in ONE exchange; PPJoin length/positional filters inside the candidate join",
    "degree_distribution": "no joins at all — basket groupBy, chained-Generate pair-gen, packed-long shuffles after",
    "containment_neardup": "narrow arrays_zip shingle build (zero shuffles); a/b sides share one exchange on s",
    "pmi_copurchase": "pairs stream from chained Generate nodes (no self-join); the basket exchange is runtime-reused by all three consumers (the static plan prints the subtree per consumer; the executed plan shows ReusedExchange); marginals attach via AQE-sized joins",
    "recursive_cte_reachability": "UnionLoop recursion over a once-materialized adjacency — iteration inside Catalyst",
    "paragraph_dedup": "narrow paragraph build; ONE shuffle on the 8-byte paragraph hash",
    "mmr_diversified_rerank": "greedy MMR unrolled to three declarative steps; everything after the shortlist is broadcast k-row joins",
    "cdc_chunk_dedup": "content-defined boundaries in one codegen stage off the scan; chunk-hash shuffle on 16-byte keys",
    "countmin_heavy_counts": "posexplode feeds d sketch rows through ONE map-combined aggregate; probes join broadcast cells",
    "bitmap_distinct_rollup": "exact distinct as mergeable per-bucket bitmaps; the union row ORs bitmaps, never rescans",
    "waiting_suppliers": "Q21's EXISTS + NOT-EXISTS as ONE per-order aggregate pass; the FACT shuffles at most once in either regime: small SF (captured) - AQE broadcasts the status-filtered orders, the only fact exchange feeds the (orderkey,suppkey) agg and later exchanges move pair PARTIALS; large SF - SMJ exchanges on orderkey and both aggregates reuse it (HashPartitioning(orderkey) satisfies both groupings). No Expand, no count(DISTINCT)",
    "skew_join_adaptive": "default-key skew, two regimes: small SF (captured) - the dim broadcasts, the 75%-hot fact key never shuffles (broadcast joins HAVE no skew problem); forced-SMJ regime - AQE splits the hot partition at map-output granularity (skew=true, certified in tests/test_r10_queries.py)",
}

HEADER = """# PLANS — physical-plan audit of headline queries

`df.explain("formatted")` captures at sf0.01, trimmed to the operator tree
(the `(n)` node details sections are elided).  Each plan is the shape the
SCALE.md entry for that query claims — this file is the evidence.  Regenerate
with `python tools/gen_plans_md.py` after any plan-affecting change.
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    _load_all()
    spark = get_spark("plans", cpus=8)
    out = [HEADER]
    for name, note in PICKS.items():
        df = QUERIES[name].spark_fn(spark, sf)
        formatted = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        tree = formatted.split("\n\n")[0]
        lines = tree.splitlines()
        if len(lines) > 45:
            n_elided = len(lines) - 45
            lines = lines[:45] + [f"   ... ({n_elided} more nodes elided)"]
        out.append(f"## {name}\n\n*{note}*\n\n```\n" + "\n".join(lines) + "\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
