"""Tests for highlevel read path, submission stats, extractor stage, dumps,
ML evaluation, and multimodal operators over the domain fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark import schemas
from acousticbrainz_server_spark.ml.evaluation import (
    normalise_classes,
    recordings_to_artists,
    snapshot_dataset,
    split_groundtruth,
    train_eval_svm,
    validate_datasets,
)
from acousticbrainz_server_spark.operators.extractor import extract_highlevel, fake_extractor
from acousticbrainz_server_spark.operators.highlevel import get_unprocessed_highlevel, load_many_high_level
from acousticbrainz_server_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    sample_frames,
)
from acousticbrainz_server_spark.operators.stats import compute_daily_stats, recent_submissions
from acousticbrainz_server_spark.sources.dumps import (
    dump_features_csv,
    dump_lowlevel_json,
    dump_table_tsv,
    filter_incremental,
    import_table_tsv,
    incremental_window,
    record_dump,
)
from acousticbrainz_server_spark.sources.fixtures import generate_fixture_tables


@pytest.fixture(scope="module")
def tables(spark):
    return generate_fixture_tables(spark, n_lowlevel=300, n_gids=150)


# --------------------------------------------------------------------------------------
def test_load_many_high_level(spark, tables):
    keys = tables["lowlevel"].select("gid", "submission_offset").limit(20)
    out = load_many_high_level(
        keys,
        tables["lowlevel"],
        tables["highlevel"],
        tables["highlevel_meta"],
        tables["highlevel_model"],
        tables["model"],
    )
    rows = out.collect()
    assert 0 < len(rows) <= 20
    r = next(r for r in rows if r["highlevel"])
    # hidden models must not surface (P8)
    assert "genre_electronic" not in r["highlevel"] and "timbre" not in r["highlevel"]
    some_model = next(iter(r["highlevel"].values()))
    assert abs(sum(some_model["all"].values()) - 1.0) < 1e-3
    assert some_model["version_id"] is not None


def test_class_mapping(spark, tables):
    keys = tables["lowlevel"].select("gid", "submission_offset")
    out = load_many_high_level(
        keys,
        tables["lowlevel"],
        tables["highlevel"],
        tables["highlevel_meta"],
        tables["highlevel_model"],
        tables["model"],
        map_classes=True,
    )
    mapped_models = [r["model"] for r in tables["model"].filter(F.col("class_mapping").isNotNull()).collect()]
    shown_mapped = [m for m in mapped_models if m not in ("genre_electronic", "timbre")]
    rows = out.collect()
    found = False
    for r in rows:
        hl = r["highlevel"] or {}
        for m in shown_mapped:
            if m in hl:
                # mapping title-cases class names (fixture class_mapping)
                assert all(k[0].isupper() for k in hl[m]["all"])
                found = True
    assert found


def test_unprocessed_anti_join(spark, tables):
    unproc = get_unprocessed_highlevel(tables["lowlevel"], tables["highlevel"])
    n_ll = tables["lowlevel"].count()
    n_hl = tables["highlevel"].count()
    assert unproc.count() == n_ll - n_hl > 0


# --------------------------------------------------------------------------------------
def test_daily_stats_cumulative(spark, tables):
    ll = tables["lowlevel"]
    stats = compute_daily_stats(ll).collect()
    assert len(stats) >= 80  # ~90 day span, densified
    last = max(stats, key=lambda r: r["collected"])
    rows = ll.collect()
    assert last["lowlevel_total"] == len(rows)
    assert last["lowlevel_lossless"] == sum(1 for r in rows if r["lossless"])
    assert last["lowlevel_total_unique"] == len({r["gid"] for r in rows})
    # python oracle on one mid-series day: counts of submitted < D
    mid = stats[len(stats) // 2]
    d = mid["collected"]
    before = [r for r in rows if r["submitted"] < d]
    assert mid["lowlevel_total"] == len(before)
    assert mid["lowlevel_lossy_unique"] == len({r["gid"] for r in before if not r["lossless"]})
    # monotone non-decreasing cumulative series
    by_day = sorted(stats, key=lambda r: r["collected"])
    for a, b in zip(by_day, by_day[1:]):
        assert b["lowlevel_total"] >= a["lowlevel_total"]


def test_recent_submissions(spark, tables):
    out = recent_submissions(tables["lowlevel"], tables["lowlevel_json"], limit=5, offset=10).collect()
    assert len(out) <= 5
    ids = [r["id"] for r in tables["lowlevel"].orderBy(F.desc("id")).limit(15).collect()]
    got_mbids = {r["mbid"] for r in out}
    expect_gids = {
        r["gid"] for r in tables["lowlevel"].filter(F.col("id").isin(ids[10:])).collect()
    }
    assert got_mbids <= expect_gids


# --------------------------------------------------------------------------------------
def test_extractor_stage(spark, tables):
    unproc = get_unprocessed_highlevel(tables["lowlevel"], tables["highlevel"]).select("id")
    new_docs = tables["lowlevel_json"].join(unproc, "id", "left_semi")
    out = extract_highlevel(new_docs, extractor=fake_extractor).collect()
    n_docs = new_docs.count()
    assert len(out) == n_docs * len(schemas.MODEL_CLASSES)
    r = out[0]
    assert abs(sum(r["all_probs"].values()) - 1.0) < 1e-3
    assert r["value"] in r["all_probs"] and r["probability"] == max(r["all_probs"].values())
    # determinism
    again = extract_highlevel(new_docs, extractor=fake_extractor).collect()
    assert sorted((r["id"], r["model"], r["value"]) for r in again) == sorted(
        (r["id"], r["model"], r["value"]) for r in out
    )


_STUB_EXTRACTOR = '''
import json
import sys

args = sys.argv[1:]
assert args[-1] == "PROFILE", "trailing profile arg must pass through"
pairs = args[:-1]
for i in range(0, len(pairs), 2):
    in_path, out_path = pairs[i], pairs[i + 1]
    with open(in_path) as fp:
        doc = json.load(fp)
    if doc.get("skip"):
        continue  # no output file -> empty result for this doc
    bpm = doc["rhythm"]["bpm"]
    p = round((bpm % 10.0) / 20.0 + 0.5, 6)
    out = {
        "highlevel": {
            "mood_happy": {
                "all": {"happy": p, "not_happy": round(1.0 - p, 6)},
                "value": "happy",
                "probability": p,
            },
            "danceability": {
                "all": {"danceable": 0.25, "not_danceable": 0.75},
                "value": "not_danceable",
                "probability": 0.75,
            },
        }
    }
    with open(out_path, "w") as fp:
        json.dump(out, fp)
'''


def test_subprocess_extractor_spark_roundtrip(spark, tables, tmp_path):
    """The REAL subprocess kernel (temp files -> exec -> parse,
    hl_calc.py:50-129) end-to-end through mapInPandas, with a stand-in
    script in place of the Essentia binary."""
    import sys as _sys

    from acousticbrainz_server_spark.operators.extractor import subprocess_extractor

    script = tmp_path / "stub_extractor.py"
    script.write_text(_STUB_EXTRACTOR)
    ex = subprocess_extractor([_sys.executable, str(script)], trailing_args=("PROFILE",))

    new_docs = tables["lowlevel_json"].limit(45)  # 45 docs -> 3 subprocess calls at 20/call
    rows = extract_highlevel(new_docs, extractor=ex).collect()
    n = new_docs.count()
    assert len(rows) == n * 2  # two models per doc
    assert {r["model"] for r in rows} == {"mood_happy", "danceability"}

    # value parity with the stub's formula for one doc
    src = {r["id"]: r["data"]["rhythm"]["bpm"] for r in new_docs.collect()}
    for r in rows:
        if r["model"] == "mood_happy":
            expect = round((src[r["id"]] % 10.0) / 20.0 + 0.5, 6)
            assert abs(r["all_probs"]["happy"] - expect) < 1e-9
            assert r["probability"] == pytest.approx(expect)


def test_subprocess_extractor_kernel_edges(tmp_path):
    import sys as _sys

    from acousticbrainz_server_spark.operators.extractor import (
        MAX_ITEMS_PER_PROCESS,
        subprocess_extractor,
    )

    script = tmp_path / "stub_extractor.py"
    script.write_text(_STUB_EXTRACTOR)
    ex = subprocess_extractor([_sys.executable, str(script)], trailing_args=("PROFILE",))

    # a doc whose output file the binary never writes -> empty result, no crash
    docs = [
        {"id": 1, "doc_json": '{"skip": true}'},
        {"id": 2, "doc_json": '{"rhythm": {"bpm": 123.0}}'},
    ]
    rows = ex(docs)
    assert {r["id"] for r in rows} == {2}
    assert len(rows) == 2

    with pytest.raises(ValueError):
        ex([])
    with pytest.raises(ValueError):
        ex([{"id": i, "doc_json": "{}"} for i in range(MAX_ITEMS_PER_PROCESS + 1)])


# --------------------------------------------------------------------------------------
def test_dump_roundtrip_tsv(spark, tables, tmp_path):
    out = str(tmp_path / "ll_tsv")
    dump_table_tsv(tables["lowlevel"], out, rows_per_file=100)
    back = import_table_tsv(spark, out, schemas.LOWLEVEL)
    assert back.count() == tables["lowlevel"].count()
    a = {tuple(r) for r in tables["lowlevel"].collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    import glob

    assert len(glob.glob(out + "/*.csv.gz")) >= 3  # 300 rows / 100 per file


def test_dump_json_sharded(spark, tables, tmp_path):
    out = str(tmp_path / "llj_json")
    dump_lowlevel_json(tables["lowlevel"], tables["lowlevel_json"], out)
    back = spark.read.json(out)
    assert back.count() == tables["lowlevel"].count()
    import glob
    import os as _os

    # two-level mbid[0:2]/mbid[2:3] layout (reference db/dump.py:604-607)
    level1 = glob.glob(out + "/shard=*")
    assert len(level1) > 10  # 2-hex-char first level
    level2 = glob.glob(out + "/shard=*/shard2=*")
    assert len(level2) >= len(level1)
    for d in level2:
        parts = d.split(_os.sep)
        s1, s2 = parts[-2].split("=")[1], parts[-1].split("=")[1]
        assert len(s1) == 2 and len(s2) == 1
    # every record's gid starts with its directory shards
    one = level2[0]
    s1, s2 = one.split(_os.sep)[-2].split("=")[1], one.split(_os.sep)[-1].split("=")[1]
    for r in spark.read.json(one).select("gid").collect():
        assert r["gid"].startswith(s1 + s2)


def test_dump_features_csv_and_incremental(spark, tables, tmp_path):
    dump_features_csv(tables["lowlevel"], tables["lowlevel_json"], str(tmp_path / "feat"))
    got = spark.read.option("header", "true").csv(str(tmp_path / "feat/tonal"))
    assert got.count() == tables["lowlevel"].count()
    assert "tonal_key_key" in got.columns

    # S9 window bookkeeping
    dd = spark.createDataFrame([], "id long, created timestamp, dump_type string")
    t1 = datetime(2024, 2, 1)
    start, end = incremental_window(dd, t1)
    assert start is None
    n_first = filter_incremental(tables["lowlevel"], start, end).count()
    dd = record_dump(spark, dd, t1)
    t2 = datetime(2024, 4, 15)
    start2, end2 = incremental_window(dd, t2)
    assert start2 == t1
    n_inc = filter_incremental(tables["lowlevel"], start2, end2).count()
    total = tables["lowlevel"].filter(F.col("submitted") <= t2).count()
    assert n_first + n_inc == total


# --------------------------------------------------------------------------------------
def test_validate_datasets(spark, tables):
    v = validate_datasets(tables["dataset_class"], tables["dataset_class_member"], tables["lowlevel"])
    rows = {r["dataset"]: r for r in v.collect()}
    assert len(rows) == 6
    # the degenerate dataset (1 class of 1 member) must be invalid
    assert sum(1 for r in rows.values() if not r["is_valid"]) >= 1
    bad = [r for r in rows.values() if r["n_classes"] < 2]
    assert bad and all(not r["is_valid"] for r in bad)


def test_artist_split_and_normalization(spark, tables):
    members = tables["dataset_class_member"]
    labeled = recordings_to_artists(members, tables["lowlevel"], tables["lowlevel_json"])
    split = split_groundtruth(labeled, seed=7)
    rows = split.collect()
    train_pairs = {}
    for r in rows:
        if r["split"] == "train":
            key = (r["class"], r["artist"])
            assert key not in train_pairs  # exactly one train item per (class, artist)
            train_pairs[key] = r["mbid"]
    assert train_pairs
    # determinism
    again = {(r["class"], r["mbid"]): r["split"] for r in split_groundtruth(labeled, seed=7).collect()}
    assert all(again[(r["class"], r["mbid"])] == r["split"] for r in rows)

    norm = normalise_classes(labeled, cut_to=20, seed=7)
    per_class = norm.filter(F.col("kept")).groupBy("class").count().collect()
    assert per_class and all(r["count"] == 20 for r in per_class)
    # small classes entirely dropped
    sizes = {r["class"]: r["count"] for r in labeled.groupBy("class").count().collect()}
    kept_classes = {r["class"] for r in per_class}
    assert all(sizes[c] > 20 for c in kept_classes)


def test_svm_train_eval(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(120):
        cls = "a" if i % 2 == 0 else "b"
        center = 1.0 if cls == "a" else -1.0
        rows.append({"class_name": cls, "features": [rng.gauss(center, 0.3), rng.gauss(-center, 0.3)]})
    df = spark.createDataFrame(rows, "class_name string, features array<double>")
    model, metrics = train_eval_svm(df, reg_grid=(0.01, 0.1), n_folds=2)
    assert metrics["accuracy"] > 0.9
    assert set(metrics["labels"]) == {"a", "b"}
    assert sum(metrics["confusion"].values()) == 120


def test_svm_rbf_beats_linear_on_rings(spark):
    """Gaia RBF-grid analogue: the seeded Random-Fourier-Features map must
    make concentric rings (linearly inseparable) separable."""
    import math
    import random

    from acousticbrainz_server_spark.ml.evaluation import rff_transform

    rng = random.Random(7)
    rows = []
    for i in range(240):
        inner = i % 2 == 0
        r = rng.gauss(0.5 if inner else 2.0, 0.12)
        theta = rng.uniform(0.0, 2.0 * math.pi)
        rows.append(
            {"class_name": "in" if inner else "out", "features": [r * math.cos(theta), r * math.sin(theta)]}
        )
    df = spark.createDataFrame(rows, "class_name string, features array<double>")

    _, lin = train_eval_svm(df, reg_grid=(0.1,), n_folds=2)
    _, rbf = train_eval_svm(
        df, reg_grid=(0.1,), n_folds=2, kernel="rbf", gamma_grid=(0.5, 2.0), n_components=64
    )
    assert lin["accuracy"] < 0.75  # rings are not linearly separable
    assert rbf["accuracy"] > 0.9
    assert rbf["kernel"] == "rbf" and rbf["gamma"] in (0.5, 2.0)

    # the RFF map itself approximates the RBF kernel: z(x)·z(y) ≈ exp(-g|x-y|^2)
    import numpy as np

    mapped = rff_transform(df.limit(40), "features", out_col="z", gamma=1.0, n_components=512)
    got = mapped.select("features", "z").collect()
    X = np.array([r["features"] for r in got])
    Z = np.array([r["z"] for r in got])
    approx = Z @ Z.T
    exact = np.exp(-1.0 * ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    assert float(np.abs(approx - exact).mean()) < 0.08


def test_snapshot(spark, tables):
    snap = snapshot_dataset(tables["dataset"], tables["dataset_class"], tables["dataset_class_member"])
    rows = snap.collect()
    assert len(rows) == 6
    r = next(r for r in rows if r["snapshot"]["classes"])
    assert r["snapshot"]["name"].startswith("dataset-")
    assert all(c["recordings"] for c in r["snapshot"]["classes"])


# --------------------------------------------------------------------------------------
def test_multimodal_stubs(spark):
    rows = [
        {"media_id": 1, "payload": b"\x01\x02", "meta": {"mime": "image/png", "width": 8, "height": 6, "duration_s": None, "sample_rate": None}},
        {"media_id": 2, "payload": b"\x03", "meta": {"mime": "audio/wav", "width": None, "height": None, "duration_s": 2.5, "sample_rate": 44100}},
    ]
    from acousticbrainz_server_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert img[1]["width"] == 8 and 0.0 <= img[1]["mean_luma"] <= 1.0 and len(img[1]["phash"]) == 16
    aud = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert aud[2]["n_frames"] == 26
    frames = sample_frames(media.filter(F.col("media_id") == 2), every_s=1.0).collect()
    assert [r["frame_ts"] for r in frames] == [0.0, 1.0]
    # real decode is explicitly stubbed
    from acousticbrainz_server_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"", {})


# --------------------------------------------------------------------------------------
def test_schema_sequence_import_gate(spark, tables, tmp_path):
    """S8 version gate (db/dump.py:464-470, 993-997): dumps are stamped with
    SCHEMA_VERSION; an importer expecting a different version refuses."""
    import os as _os

    from acousticbrainz_server_spark.sources.dumps import (
        SCHEMA_SEQUENCE_FILE,
        SCHEMA_VERSION,
        check_schema_sequence,
    )

    out = str(tmp_path / "ll_tsv_ver")
    dump_table_tsv(tables["lowlevel"], out, rows_per_file=100)
    with open(_os.path.join(out, SCHEMA_SEQUENCE_FILE)) as f:
        assert f.read() == str(SCHEMA_VERSION)
    # matching version imports fine (and the stamp is invisible to the reader)
    assert import_table_tsv(spark, out, schemas.LOWLEVEL).count() == tables["lowlevel"].count()
    with pytest.raises(ValueError, match="Incorrect schema version"):
        import_table_tsv(spark, out, schemas.LOWLEVEL, expected_schema_version=SCHEMA_VERSION + 1)
    with pytest.raises(ValueError, match="Incorrect schema version"):
        check_schema_sequence(out, SCHEMA_VERSION - 1)
    # un-stamped legacy dump directories still import
    _os.remove(_os.path.join(out, SCHEMA_SEQUENCE_FILE))
    assert import_table_tsv(spark, out, schemas.LOWLEVEL).count() == tables["lowlevel"].count()
