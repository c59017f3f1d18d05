"""Golden-output test for the 12-metric similarity pipeline (V1/V2).

Pattern mirrors the reference's test_add_metrics
(db/test/test_similarity.py:36-66): run the full pipeline over fixtures and
assert row-exact equality against an INDEPENDENT numpy implementation of the
metric math (reference similarity/metrics.py semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from acousticbrainz_server_spark.similarity.knn import knn_by_metric, postprocess_neighbors
from acousticbrainz_server_spark.similarity.metrics import (
    GENRE_METRICS,
    INSTRUMENTS_MODELS,
    KEYS_MAP,
    METRIC_DIMS,
    MOODS_MODELS,
    SCALES_MAP,
    assemble_metric_input,
    compute_similarity_vectors,
)
from acousticbrainz_server_spark.similarity.stats import compute_similarity_stats
from acousticbrainz_server_spark.schemas import MODEL_CLASSES
from acousticbrainz_server_spark.sources.fixtures import generate_fixture_tables


@pytest.fixture(scope="module")
def tables(spark):
    return generate_fixture_tables(spark, n_lowlevel=300, n_gids=150)


@pytest.fixture(scope="module")
def collected(tables):
    llj = {r["id"]: r.asDict(recursive=True) for r in tables["lowlevel_json"].collect()}
    models = {r["id"]: r["model"] for r in tables["model"].collect()}
    hl: dict[int, dict] = {}
    for r in tables["highlevel_model"].collect():
        hl.setdefault(r["highlevel"], {})[models[r["model"]]] = r.asDict(recursive=True)["data"]
    return llj, hl


def oracle_vectors(doc: dict, hl: dict | None, stats: dict) -> dict[str, list[float]]:
    """Independent numpy re-statement of reference similarity/metrics.py."""
    out: dict[str, list[float]] = {}

    def normalized(path_vec, name, weighted):
        if not path_vec:
            return [0.0] * 13
        means, stds = stats[name]
        v = (np.array(path_vec[:13]) - np.array(means)) / np.array(stds)
        if weighted:
            v = v * np.array([0.95**i for i in range(13)])
        return list(v)

    ll = doc["lowlevel"]
    out["mfccs"] = normalized(ll["mfcc"]["mean"], "mfccs", False)
    out["mfccsw"] = normalized(ll["mfcc"]["mean"], "mfccs", True)
    out["gfccs"] = normalized(ll["gfcc"]["mean"], "gfccs", False)
    out["gfccsw"] = normalized(ll["gfcc"]["mean"], "gfccs", True)

    def circle(v):
        return [math.cos(v * 2 * math.pi), math.sin(v * 2 * math.pi)]

    tonal = doc["tonal"]
    try:
        out["key"] = circle(KEYS_MAP[tonal["key_key"]] + SCALES_MAP[tonal["key_scale"]])
    except KeyError:
        out["key"] = [0.0, 0.0]
    for name, path in (("bpm", doc["rhythm"]["bpm"]), ("onsetrate", doc["rhythm"]["onset_rate"])):
        out[name] = circle(math.log2(path)) if path else [0.0, 0.0]

    def binary(models):
        if not hl:
            return [0.0] * len(models)
        return [hl[m]["all"][c] if m in hl else 0.0 for m, c in models]

    out["moods"] = binary(MOODS_MODELS)
    out["instruments"] = binary(INSTRUMENTS_MODELS)
    for name, model in GENRE_METRICS.items():
        if hl and model in hl:
            out[name] = [hl[model]["all"][c] for c in sorted(hl[model]["all"])]
        else:
            out[name] = [0.0] * len(MODEL_CLASSES[model])
    return out


def test_metric_vectors_match_numpy_oracle(spark, tables, collected):
    llj, hl = collected
    stats = compute_similarity_stats(tables["lowlevel_json"])
    mi = assemble_metric_input(tables["lowlevel_json"], tables["highlevel_model"], tables["model"])
    got = {r["id"]: r.asDict(recursive=True) for r in compute_similarity_vectors(mi, stats).collect()}

    assert set(got) == set(llj)
    n_zero_mfcc = n_missing_hl = 0
    for rid, doc_row in llj.items():
        expected = oracle_vectors(doc_row["data"], hl.get(rid), stats)
        for metric, dim in METRIC_DIMS.items():
            g = got[rid][metric]
            assert len(g) == dim, f"id={rid} {metric} dim {len(g)} != {dim}"
            assert np.allclose(g, expected[metric], rtol=1e-9, atol=1e-12), (
                f"id={rid} metric={metric}: {g} != {expected[metric]}"
            )
        if all(v == 0.0 for v in got[rid]["mfccs"]):
            n_zero_mfcc += 1
        if hl.get(rid) is None:
            n_missing_hl += 1
    # fixture edge cases actually fired
    assert n_zero_mfcc > 0, "no missing-mfcc zero-vector case exercised"
    assert n_missing_hl > 0, "no missing-highlevel case exercised"


def test_stats_match_numpy(tables, collected):
    llj, _ = collected
    stats = compute_similarity_stats(tables["lowlevel_json"])
    arrs = [d["data"]["lowlevel"]["mfcc"]["mean"] for d in llj.values() if d["data"]["lowlevel"]["mfcc"]["mean"]]
    np_mean = np.mean(arrs, axis=0)
    np_std = np.std(arrs, axis=0)  # population, like the reference
    assert np.allclose(stats["mfccs"][0], np_mean, rtol=1e-9)
    assert np.allclose(stats["mfccs"][1], np_std, rtol=1e-9)


def test_knn_and_postprocess(spark, tables):
    stats = compute_similarity_stats(tables["lowlevel_json"])
    mi = assemble_metric_input(tables["lowlevel_json"], tables["highlevel_model"], tables["model"])
    sim = compute_similarity_vectors(mi, stats).cache()
    queries = sim.select("id").limit(3)
    nn = knn_by_metric(sim, queries, "mfccs", k=5)
    rows = nn.collect()
    assert len(rows) == 15
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ds = [r["distance"] for r in sorted(rs, key=lambda r: r["neighbor_rank"])]
        assert ds == sorted(ds)
        assert all(r["neighbor_id"] != q for r in rs)

    # exactness spot-check against numpy for one query
    vecs = {r["id"]: np.array(r["mfccs"]) for r in sim.collect()}
    q0 = rows[0]["query_id"]
    qv = vecs[q0]

    def ang(a, b):
        den = np.linalg.norm(a) * np.linalg.norm(b)
        c = float(np.dot(a, b) / den) if den else 0.0  # engine's zero-norm guard
        return math.sqrt(max(0.0, 2.0 - 2.0 * c))

    expected = sorted(((ang(qv, v), i) for i, v in vecs.items() if i != q0))[:5]
    got = sorted((r["distance"], r["neighbor_id"]) for r in by_q[q0])
    for (ed, ei), (gd, gi) in zip(expected, got):
        assert ei == gi and abs(ed - gd) < 1e-9

    # postprocess: join gid/offset, dedup 'all' keeps one row per (query, mbid)
    dim = tables["lowlevel"].select("id", F_gid := "gid", "submission_offset")
    nn2 = nn.join(
        dim.withColumnRenamed("id", "neighbor_id")
        .withColumnRenamed("gid", "recording_mbid")
        .withColumnRenamed("submission_offset", "offset"),
        "neighbor_id",
    )
    out = postprocess_neighbors(nn2, threshold=None, remove_dups="all").collect()
    seen = set()
    for r in out:
        key = (r["query_id"], r["recording_mbid"])
        assert key not in seen
        seen.add(key)
    # threshold path
    thr = postprocess_neighbors(nn2, threshold=0.5).collect()
    assert all(r["distance"] <= 0.5 for r in thr)


def test_metric_vectors_match_reference_goldens(spark):
    """Row-exact parity with the reference's OWN golden fixtures: the two
    checked-in extractor documents (db/test_data/*.json) through our V1
    pipeline must reproduce db/test_data/similarity_metrics_data.py's
    expected_similarity_rows — the same assertion the reference's
    test_add_metrics makes (db/test/test_similarity.py:36-66).  Fixture data
    is READ from the reference checkout at test time, never copied."""
    import ast
    import json
    import os

    from acousticbrainz_server_spark import schemas
    from acousticbrainz_server_spark.similarity.metrics import (
        METRIC_NAMES,
        assemble_metric_input,
        compute_similarity_vectors,
    )

    ref = "/root/reference/db/test_data"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout not available")

    golden_src = open(os.path.join(ref, "similarity_metrics_data.py")).read()
    expected = ast.literal_eval(golden_src.split("=", 1)[1].strip())

    def reduced_doc(path):
        d = json.load(open(path))
        return {
            "lowlevel": {
                "mfcc": {"mean": d["lowlevel"]["mfcc"]["mean"]},
                "gfcc": {"mean": d["lowlevel"]["gfcc"]["mean"]},
            },
            "rhythm": {"bpm": d["rhythm"]["bpm"], "onset_rate": d["rhythm"]["onset_rate"]},
            "tonal": {"key_key": d["tonal"]["key_key"], "key_scale": d["tonal"]["key_scale"]},
        }

    llj = spark.createDataFrame(
        [
            {"id": 1, "data": reduced_doc(os.path.join(ref, "0dad432b-16cc-4bf0-8961-fd31d124b01b.json"))},
            {"id": 2, "data": reduced_doc(os.path.join(ref, "e8afe383-1478-497e-90b1-7885c7f37f6e.json"))},
        ],
        schemas.LOWLEVEL_JSON,
    )
    hl = json.load(open(os.path.join(ref, "0dad432b-16cc-4bf0-8961-fd31d124b01b_highlevel.json")))["highlevel"]
    model_rows = [
        {"id": i + 1, "model": name, "model_version": "v", "status": "show", "class_mapping": None}
        for i, name in enumerate(sorted(hl))
    ]
    model_ids = {r["model"]: r["id"] for r in model_rows}
    hlm_rows = [
        {
            "id": i + 1,
            "highlevel": 1,  # only doc 1 has highlevel data, like the reference test
            "data": {
                "all": {k: float(v) for k, v in entry["all"].items()},
                "value": entry["value"],
                "probability": float(entry["probability"]),
            },
            "model": model_ids[name],
            "version": 1,
        }
        for i, (name, entry) in enumerate(sorted(hl.items()))
    ]
    model = spark.createDataFrame(model_rows, schemas.MODEL)
    hlm = spark.createDataFrame(hlm_rows, schemas.HIGHLEVEL_MODEL)

    stats = compute_similarity_stats(llj)  # the reference samples both docs
    vecs = compute_similarity_vectors(assemble_metric_input(llj, hlm, model), stats)
    got = {r["id"]: r.asDict() for r in vecs.collect()}

    assert len(expected) == 2
    for exp in expected:
        rid = exp["id"]
        for metric in METRIC_NAMES:
            g, e = got[rid][metric], exp[metric]
            assert len(g) == len(e), (rid, metric)
            for gi, ei in zip(g, e):
                assert abs(gi - ei) < 1e-9, (rid, metric, g, e)
