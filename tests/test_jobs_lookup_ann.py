"""Tests: job queue state machine (M2), eval upsert (V7), order-preserving
lookups (J8), LSH ANN index (V3) recall vs exact k-NN."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark.operators.jobs import (
    JOB_EVENT_SCHEMA,
    job_current_state,
    next_pending_job,
    transition,
    upsert_eval_results,
)
from acousticbrainz_server_spark.operators.lookup import get_ids_by_mbids, get_mbids_by_ids
from acousticbrainz_server_spark.sources.fixtures import generate_fixture_tables


@pytest.fixture(scope="module")
def tables(spark):
    return generate_fixture_tables(spark, n_lowlevel=200, n_gids=100)


def test_job_queue_state_machine(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        {"job_id": "j1", "snapshot_id": "s1", "status": "pending", "ts": t0, "result": None},
        {"job_id": "j2", "snapshot_id": "s2", "status": "pending", "ts": datetime(2024, 1, 2), "result": None},
    ]
    ev = spark.createDataFrame(rows, JOB_EVENT_SCHEMA)
    # earliest-first pop
    assert next_pending_job(ev).collect()[0]["job_id"] == "j1"
    ev = transition(spark, ev, "j1", "running", datetime(2024, 1, 3))
    assert next_pending_job(ev).collect()[0]["job_id"] == "j2"
    ev = transition(spark, ev, "j1", "done", datetime(2024, 1, 4), result='{"accuracy": 0.9}')
    state = {r["job_id"]: r["status"] for r in job_current_state(ev).collect()}
    assert state == {"j1": "done", "j2": "pending"}


def test_upsert_eval_results(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    incoming = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    out = {r["id"]: r["v"] for r in upsert_eval_results(existing, incoming, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def test_order_preserving_lookups(spark, tables):
    ll = tables["lowlevel"]
    sample = ll.limit(3).collect()
    req = [(sample[0]["gid"].upper(), sample[0]["submission_offset"]), ("ffffffff-0000-4000-8000-000000000000", 0), (sample[1]["gid"], sample[1]["submission_offset"])]
    out = get_ids_by_mbids(spark, ll, req).collect()
    assert [r["request_index"] for r in out] == [0, 1, 2]
    assert out[0]["id"] == sample[0]["id"]  # case-normalized hit
    assert out[1]["id"] is None  # miss -> NULL
    assert out[2]["id"] == sample[1]["id"]

    back = get_mbids_by_ids(spark, ll, [sample[0]["id"], 999999]).collect()
    assert back[0]["gid"] == sample[0]["gid"] and back[1]["gid"] is None


def test_lsh_ann_recall(spark, tables):
    from acousticbrainz_server_spark.similarity.ann import build_neighbor_table, fit_lsh_index, knn_lsh
    from acousticbrainz_server_spark.similarity.knn import knn_by_metric
    from acousticbrainz_server_spark.similarity.metrics import assemble_metric_input, compute_similarity_vectors
    from acousticbrainz_server_spark.similarity.stats import compute_similarity_stats

    stats = compute_similarity_stats(tables["lowlevel_json"])
    mi = assemble_metric_input(tables["lowlevel_json"], tables["highlevel_model"], tables["model"])
    sim = compute_similarity_vectors(mi, stats).cache()

    vectors = sim.select("id", F.col("mfccs").alias("v"))
    model, indexed = fit_lsh_index(vectors, bucket_length=1.0, num_hash_tables=10)
    queries = vectors.limit(5)
    approx = knn_lsh(model, indexed, queries, k=10)
    exact = knn_by_metric(sim, queries.select("id"), "mfccs", k=10)

    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    # zero-vector rows are excluded from the index; measure recall on shared queries
    shared_q = {q for q, _ in a} & {q for q, _ in e}
    e_shared = {(q, n) for q, n in e if q in shared_q}
    recall = len(a & e_shared) / max(len(e_shared), 1)
    assert recall >= 0.8, f"LSH recall {recall}"

    # S10: persisted neighbor table round-trips
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        nn = build_neighbor_table(sim, "bpm", k=3, out_path=d + "/nn")
        back = spark.read.parquet(d + "/nn")
        assert back.count() == nn.count() > 0


def test_ivf_ann_recall_clustered(spark):
    """On geometrically coherent cells IVF recall is ~1.0 at nprobe=2 — the
    IVF-Flat contract.  (The driver's embeddings table has RANDOM labels, so
    the registered ann_ivf_topk query is verified for determinism by the
    DuckDB oracle instead; recall there is bounded by the data, not the op.)"""
    import random

    from acousticbrainz_server_spark.similarity.ann import ivf_topk

    rng = random.Random(42)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, i % 8, [x + rng.gauss(0, 0.05) for x in c]))
    v = spark.createDataFrame(rows, "id long, cell int, v array<double>")
    queries = v.filter(F.col("id") < 10)

    ivf = ivf_topk(v, queries, k=5, nprobe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}

    # exact top-5 by cosine, same rounding/tiebreak
    from acousticbrainz_server_spark.functions.scalar import round_half_up
    from acousticbrainz_server_spark.functions.vector import cosine
    from pyspark.sql import Window

    q = queries.select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
    pairs = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), round_half_up(cosine("qv", "v"), 4).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"IVF recall on clustered data {recall}"


def test_kmeans_recovers_clusters_and_is_deterministic(spark):
    """Lloyd's k-means must (a) recover geometrically coherent cells without
    seeing the true labels, (b) produce bit-identical centroids across runs
    (md5-based init, fixed iterations), (c) feed IVF to >=0.9 recall."""
    import random

    from acousticbrainz_server_spark.similarity.ann import ivf_topk
    from acousticbrainz_server_spark.similarity.kmeans import kmeans_assign, kmeans_fit

    rng = random.Random(7)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = []
    for i in range(400):
        c = centers[i % 8]
        rows.append((i, i % 8, [x + rng.gauss(0, 0.05) for x in c]))
    v = spark.createDataFrame(rows, "id long, true_cell int, v array<double>")

    cents1 = kmeans_fit(v, k=8, max_iter=5, id_col="id", vec_col="v", dim=16)
    cents2 = kmeans_fit(v, k=8, max_iter=5, id_col="id", vec_col="v", dim=16)
    assert cents1 == cents2  # determinism, bit-for-bit

    # fully distributed Lloyd's reaches the same cluster structure
    cents_dist = kmeans_fit(v, k=8, max_iter=5, id_col="id", vec_col="v", dim=16, sample_n=None)
    assigned_dist = kmeans_assign(v, cents_dist, id_col="id", vec_col="v")
    from collections import Counter as _C, defaultdict as _dd

    bc = _dd(_C)
    for r in assigned_dist.join(v.select("id", "true_cell"), "id").collect():
        bc[r["cell"]][r["true_cell"]] += 1
    purity_dist = sum(c.most_common(1)[0][1] for c in bc.values()) / 400
    assert purity_dist >= 0.9, f"distributed kmeans purity {purity_dist}"

    assigned = kmeans_assign(v, cents1, id_col="id", vec_col="v")
    # purity: each learned cell should be dominated by one true cluster
    rows_a = assigned.join(v.select("id", "true_cell"), "id").collect()
    from collections import Counter, defaultdict

    by_cell = defaultdict(Counter)
    for r in rows_a:
        by_cell[r["cell"]][r["true_cell"]] += 1
    purity = sum(c.most_common(1)[0][1] for c in by_cell.values()) / len(rows_a)
    assert purity >= 0.9, f"kmeans purity {purity}"

    queries = v.filter(F.col("id") < 10).select("id", "v")
    ivf = ivf_topk(assigned, queries, k=5, nprobe=2, id_col="id", vec_col="v", cell_col="cell", dim=16)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}

    from acousticbrainz_server_spark.functions.scalar import round_half_up
    from acousticbrainz_server_spark.functions.vector import cosine
    from pyspark.sql import Window

    q = queries.select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
    pairs = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), round_half_up(cosine("qv", "v"), 4).alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"IVF-kmeans recall {recall}"


def test_kmeans_fit_reproduces_committed_centroid_fixture(spark):
    """The registered IVF/assign queries ship the COMMITTED centroid model
    (round-5 change: sf-independent queries).  This test keeps the fit itself
    gated: the deterministic kmeans_fit at sf0.01 must reproduce the fixture
    bit-for-bit — if sources or tools/gen_kmeans_fixture.py drift, this fails
    rather than the gate going silently stale."""
    import os

    from acousticbrainz_server_spark.plans.metric_queries import AB_FIXTURE_DIR
    from acousticbrainz_server_spark.plans.vectors import _vectors
    from acousticbrainz_server_spark.similarity.kmeans import kmeans_fit, load_centroids

    v = _vectors(spark, "/root/testdata/sf0.01").select("vec_id", "v")
    live = kmeans_fit(v, k=8, max_iter=3, id_col="vec_id", vec_col="v", dim=64)
    committed = load_centroids(spark, os.path.join(AB_FIXTURE_DIR, "kmeans_centroids.parquet"))
    assert live == committed


def test_pq_codes_and_adc_recall(spark):
    """PQ: codes are deterministic and within-range; ADC top-5 against the
    committed codebooks recalls a usable fraction of the exact L2 top-5
    (4-bit-per-subspace PQ is coarse by design — the serving path re-ranks
    survivors with exact vectors when higher recall is needed)."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from acousticbrainz_server_spark.plans.metric_queries import AB_FIXTURE_DIR
    from acousticbrainz_server_spark.plans.vectors import _vectors
    from acousticbrainz_server_spark.similarity.pq import (
        _dist_tables,
        load_codebooks,
        pq_adc_topk,
        pq_assign,
    )

    books = load_codebooks(spark, os.path.join(AB_FIXTURE_DIR, "pq_codebooks.parquet"), 8, 16, 8)
    v = _vectors(spark, "/root/testdata/sf0.01").select("vec_id", "v")
    codes = {r["vec_id"]: r["codes"] for r in pq_assign(v, books, id_col="vec_id", vec_col="v").collect()}
    rows = v.collect()
    x = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    # distributed assignment == local argmin over the same tables
    local_codes = _dist_tables(x, books).argmin(axis=2)
    for i, vid in enumerate(ids):
        assert codes[vid] == local_codes[i].tolist()
    assert local_codes.min() >= 0 and local_codes.max() < 16

    top = pq_adc_topk(
        pq_assign(v, books, id_col="vec_id", vec_col="v"),
        v.filter(F.col("vec_id") < 10),
        books,
        topk=5,
        id_col="vec_id",
        vec_col="v",
    ).collect()
    got = {}
    for r in top:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # exact L2 top-5 per query; two recall metrics:
    # - direct ADC@5 (coarse 4-bit PQ on UNclustered random embeddings — the
    #   hardest case; measured 0.24)
    # - the SERVING metric: exact-top-5 recall within the ADC top-100
    #   shortlist that a re-rank stage would refine (measured 0.88)
    id_arr = np.asarray(ids)
    cm = local_codes
    hits5 = hits_short = total = 0
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        d = ((x - x[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact5 = set(id_arr[np.argsort(d)[:5]].tolist())
        qtab = _dist_tables(x[qi : qi + 1], books)[0]
        adc = sum(qtab[s, cm[:, s]] for s in range(8))
        adc[qi] = np.inf
        short = set(id_arr[np.argsort(adc)[:100]].tolist())
        hits5 += len(exact5 & got[qid])
        hits_short += len(exact5 & short)
        total += 5
    assert hits5 / total >= 0.15, f"PQ ADC direct recall@5 {hits5 / total}"
    assert hits_short / total >= 0.7, f"PQ ADC shortlist-100 recall {hits_short / total}"
