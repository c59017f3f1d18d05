"""Empirical stage-floor amortization: Spark-vs-DuckDB ratio at sf0.1 AND sf1.

The round-6 verdict's standing finding: a set of graph/dedup queries run
>2x their DuckDB oracle at sf0.1, with SCALE.md asserting the gap is a
data-size-invariant per-stage scheduling floor that amortizes as data grows.
This tool MEASURES that claim instead of asserting it:

1. Builds an sf1-scale corpus (10x sf0.1) under ``.scale/sf1/`` by unioning
   ten key-shifted replicas of the sf0.1 tables the target queries read —
   ``lineitem`` (orderkey/partkey shifted per replica: ten disjoint
   co-purchase graphs, exactly how TPC-H order keys grow) and ``documents``
   (doc_id shifted, every token suffixed ``_r<k>`` so replicas share no
   shingle vocabulary: ten disjoint corpora with identical dup structure,
   i.e. a 10x corpus with 10x vocabulary, no artificial cross-replica
   near-duplicates).  Replica 0 is byte-identical to sf0.1.  All other
   tables symlink to sf0.1 — the targets never read them.
2. Runs each target query (registry plan) and its DuckDB oracle at both
   scales, warm (best of N after a warm-up), on the same local[32] session
   shape bench.py uses.
3. Prints a JSON report {query: {spark01, duck01, ratio01, spark1, duck1,
   ratio1}} — the ratio CURVE is the deliverable (recorded in SCALE.md).

The scaled corpus is a measurement artifact, not test data: correctness
gates still run exclusively on the driver's /root/testdata parquet.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scale/sf1"
REPLICAS = 10
TARGETS_LINEITEM = (
    "pmi_copurchase",
    "link_prediction_adamic_adar",
    "kcore_peeling",
    "degree_distribution",
    "recursive_cte_reachability",
    "triangle_count",
    # the iterative family (per-round scheduling floors at sf0.1)
    "label_propagation_communities",
    "bfs_shortest_paths",
    "pagerank_copurchase",
)
TARGETS_DOCUMENTS = (
    "prefix_filter_jaccard",
    "simhash_fingerprint",
    "simhash_neardup",
    "benchmark_contamination",
    "containment_neardup",
    "duplicate_span_report",
    "ngram_jaccard_neardup",
    # r7 session-3: the sketch-quality eval joined the >2x tail at sf0.1
    "simhash_recall_eval",
    # r7 session-3: CDC chunking (position explode + chunk-hash shuffle)
    "cdc_chunk_dedup",
    # r8: crossed 2x at sf0.1 in the r7 judge run (1.35s vs 0.576s) — the
    # only compute-tail member without a measured curve.  Dominant cost is
    # the tokenize+count pass (dl/avgdl over every doc), which grows
    # linearly; the posting rows stay bounded by the query-term dimension.
    "bm25_retrieval",
)
TARGETS_EMBEDDINGS = (
    # multi-stage serving pipeline (coarse assign + PQ encode + probe + ADC):
    # per-stage floors at sf0.1; the encode/scan work grows linearly
    "ann_ivf_pq_topk",
)
# r8: the remaining >2x-at-sf0.1 compute-tail members without a cell —
# events/lineitem/mixed readers measured against the scale_sweep full
# corpus (.scale/sf1full, every table 10x key-shifted) so each >2x query
# in the BENCHRATIO audit carries a measured curve.
DST_FULL = "/root/repo/.scale/sf1full"
TARGETS_FULLCORPUS = (
    "anomaly_zscore_days",        # events: bounded offset-explode baseline join
    "fk_integrity_audit",         # lineitem+dims: broadcast key-set semi probes
    "mmr_diversified_rerank",     # embeddings: greedy unrolled to 3 argmax steps
    "frequent_items_sketch",      # events: Misra-Gries mergeable partials
    "ivf_recall_eval",            # embeddings: sampled recall vs brute truth
    "brand_quantity_revenue",     # lineitem: two-key rollup
    "abc_analysis",               # lineitem: Pareto class windows
    "slow_fulfillment_suppliers", # lineitem+orders+supplier join
    "ingest_pipeline_composed",   # documents: the composed JSON ingest
    "similarity_vectors",         # events->12-metric wide select
    # r8 session-1 additions (the three TPC-H decorrelation shapes)
    "cheapest_supplier_per_part",
    "important_parts_value_share",
    "dominant_part_suppliers",
    # r9 additions: Q21 full form (lineitem+orders join, single fact
    # exchange) and Q22 full form (customer+orders anti-join; sub-second
    # at sf0.1, measured anyway for the curve record)
    "waiting_suppliers",
    "idle_customer_balance",
    # r9: Q12 (lineitem x orders band join + 2-class rollup)
    "late_shipment_priority",
)
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_scaled() -> None:
    if os.path.exists(os.path.join(DST, "_READY")):
        return
    os.makedirs(DST, exist_ok=True)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    od = pq.read_table(os.path.join(SRC, "orders.parquet"))
    ok_span = pc.max(li["l_orderkey"]).as_py() + 1
    pk_span = pc.max(li["l_partkey"]).as_py() + 1
    ck_span = pc.max(od["o_custkey"]).as_py() + 1

    def shifted(t, k, cols_spans):
        if not k:
            return t
        for col, span in cols_spans:
            t = t.set_column(
                t.schema.get_field_index(col), col, pc.add(t[col], k * span)
            )
        return t

    pq.write_table(
        pa.concat_tables(
            shifted(li, k, [("l_orderkey", ok_span), ("l_partkey", pk_span)])
            for k in range(REPLICAS)
        ),
        os.path.join(DST, "lineitem.parquet"),
    )
    # orders shift consistently with lineitem (pagerank joins the two on
    # orderkey and walks o_custkey — every replica is a disjoint bipartite
    # customer<->supplier graph, exactly how TPC-H keys grow)
    pq.write_table(
        pa.concat_tables(
            shifted(od, k, [("o_orderkey", ok_span), ("o_custkey", ck_span)])
            for k in range(REPLICAS)
        ),
        os.path.join(DST, "orders.parquet"),
    )

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    did_span = int(docs["doc_id"].max()) + 1
    frames = []
    for k in range(REPLICAS):
        d = docs.copy()
        if k:
            d["doc_id"] = d["doc_id"] + k * did_span
            suffix = f"_r{k}"
            d["text"] = d["text"].map(
                lambda s: re.sub(r"\S+", lambda m: m.group(0) + suffix, s)
            )
            d["n_chars"] = d["text"].str.len()
        frames.append(d)
    import pandas as pd

    pq.write_table(
        pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False),
        os.path.join(DST, "documents.parquet"),
    )

    # embeddings: vec_id-shifted replicas (vectors repeat — the ANN serving
    # cost is per-row encode/probe/ADC arithmetic, which only needs VOLUME;
    # labels keep the class structure)
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vid_span = pc.max(emb["vec_id"]).as_py() + 1
    pq.write_table(
        pa.concat_tables(
            shifted(emb, k, [("vec_id", vid_span)]) for k in range(REPLICAS)
        ),
        os.path.join(DST, "embeddings.parquet"),
    )

    for t in ALL_TABLES:
        p = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), p)
    open(os.path.join(DST, "_READY"), "w").write("ok\n")


def time_spark(spec, spark, sf_dir, reps=3):
    spec.spark_fn(spark, sf_dir).collect()
    best = min(
        (lambda t0: (spec.spark_fn(spark, sf_dir).collect(), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    return best


def time_duck(spec, sf_dir, reps=2):
    import duckdb

    con = duckdb.connect()
    # the recursive-CTE oracles (bfs at sf1) can exhaust the box while the
    # Spark JVM co-resides — cap and spill instead of OOM-aborting the run
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    con.execute(spec.oracle).fetchall()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    con.close()
    return best


def main() -> None:
    only = set(sys.argv[1:])
    build_scaled()
    from pyspark.sql import SparkSession

    from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all

    _load_all()
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("amortization")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    groups = [(n, DST) for n in TARGETS_LINEITEM + TARGETS_DOCUMENTS + TARGETS_EMBEDDINGS]
    if os.path.exists(os.path.join(DST_FULL, "_READY")):
        groups += [(n, DST_FULL) for n in TARGETS_FULLCORPUS]
    for name, dst in groups:
        if only and name not in only:
            continue
        spec = QUERIES[name]
        try:
            s01 = time_spark(spec, spark, SRC)
            s1 = time_spark(spec, spark, dst)
            d01 = time_duck(spec, SRC)
            d1 = time_duck(spec, dst)
        except Exception as e:  # one failed cell must not kill the sweep
            report[name] = {"error": f"{type(e).__name__}: {e}"}
            print(name, json.dumps(report[name]), flush=True)
            continue
        report[name] = {
            "spark_sf01": round(s01, 3),
            "duck_sf01": round(d01, 3),
            "ratio_sf01": round(s01 / d01, 2),
            "spark_sf1": round(s1, 3),
            "duck_sf1": round(d1, 3),
            "ratio_sf1": round(s1 / d1, 2),
        }
        print(name, json.dumps(report[name]), flush=True)

    print(json.dumps({"amortization": report}))
    spark.stop()


if __name__ == "__main__":
    main()
