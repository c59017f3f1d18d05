"""Ingest pipeline tests: validation routing, canonical-hash parity with the
reference formula, dedup, offset continuation, duplicate cap, re-ingest
idempotency (SURVEY.md §7 'hard parts' 1 and 3)."""

from __future__ import annotations

import copy
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from acousticbrainz_server_spark import schemas
from acousticbrainz_server_spark.operators.ingest import (
    bulk_get_features,
    ingest_lowlevel_batch,
)
from acousticbrainz_server_spark.sources.fixtures import _make_doc, canonical_sha256
import random

RAW_SCHEMA = (
    schemas.LOWLEVEL_JSON["data"].dataType
)  # document struct


def _raw_rows(n=20, seed=7, gid_prefix="aaaa"):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        gid = f"{gid_prefix}{i % 5:04d}-0000-4000-8000-000000000000"
        doc = _make_doc(rng, gid, "artist-x", rng.random() < 0.3)
        rows.append(
            {
                "gid": gid,
                "gid_type": "mbid",
                "submitted": datetime(2024, 1, 1) + timedelta(hours=i),
                "data": doc,
            }
        )
    return rows


def _raw_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("gid", T.StringType()),
            T.StructField("gid_type", T.StringType()),
            T.StructField("submitted", T.TimestampType()),
            T.StructField("data", RAW_SCHEMA),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _cleaned(doc):
    """Reference clean_metadata (db/data.py:128-135): the hash covers the
    whitelisted document, so the oracle must clean tags the same way."""
    from acousticbrainz_server_spark.operators.ingest import TAG_WHITELIST

    doc = copy.deepcopy(doc)
    tags = doc["metadata"]["tags"]
    doc["metadata"]["tags"] = {k: v for k, v in tags.items() if k.lower() in TAG_WHITELIST}
    return doc


def test_canonical_sha_matches_reference_formula(spark):
    rows = _raw_rows(10)
    res = ingest_lowlevel_batch(_raw_df(spark, rows))
    got = {r["gid"] + str(r["submitted"]): r["data_sha256"] for r in res.accepted.collect()}
    matched = 0
    for row in rows:
        want = canonical_sha256(_cleaned(row["data"]))
        key = row["gid"] + str(row["submitted"])
        if key in got:
            assert got[key] == want, f"sha mismatch for {key}"
            matched += 1
    assert matched >= 8  # some rows may be document-level dups / missing-mfcc rejects


def test_validation_routing(spark):
    rows = _raw_rows(6)
    # break one row: missing codec
    bad = copy.deepcopy(rows[0])
    bad["data"]["metadata"]["audio_properties"]["codec"] = None
    bad["submitted"] += timedelta(days=9)
    # break another: mbid mismatch
    bad2 = copy.deepcopy(rows[1])
    bad2["data"]["metadata"]["tags"]["musicbrainz_recordingid"] = ["ffffffff-0000-4000-8000-000000000000"]
    bad2["submitted"] += timedelta(days=10)
    res = ingest_lowlevel_batch(_raw_df(spark, rows + [bad, bad2]))
    rejects = {r["reject_reason"] for r in res.rejected.collect()}
    assert "missing key: metadata.audio_properties.codec" in rejects
    assert "mbid mismatch" in rejects
    assert res.rejected.count() == 2


def test_tag_whitelist_and_rewrite(spark):
    rows = _raw_rows(3)
    rows[0]["data"]["metadata"]["tags"]["evil_tag"] = ["x"]
    # replace recordingid with trackid (the rewrite must restore it)
    rid = rows[1]["data"]["metadata"]["tags"].pop("musicbrainz_recordingid")
    rows[1]["data"]["metadata"]["tags"]["musicbrainz_trackid"] = rid
    res = ingest_lowlevel_batch(_raw_df(spark, rows))
    accepted = {r["gid"] + str(r["submitted"]): r.asDict(recursive=True) for r in res.accepted.collect()}
    a0 = accepted[rows[0]["gid"] + str(rows[0]["submitted"])]
    assert "evil_tag" not in a0["data"]["metadata"]["tags"]
    a1 = accepted[rows[1]["gid"] + str(rows[1]["submitted"])]
    assert a1["data"]["metadata"]["tags"]["musicbrainz_recordingid"] == rid
    assert "musicbrainz_trackid" not in a1["data"]["metadata"]["tags"]


def test_dedup_and_offsets_and_cap(spark):
    rows = _raw_rows(8, gid_prefix="bbbb")
    dup = copy.deepcopy(rows[0])  # exact same doc, later submit -> dropped
    dup["submitted"] += timedelta(days=30)
    res = ingest_lowlevel_batch(_raw_df(spark, rows + [dup]))
    acc = res.accepted.collect()
    assert len(acc) == len({canonical_sha256(r["data"]) for r in rows})
    # offsets dense 0..k-1 per gid in submitted order
    per_gid: dict[str, list] = {}
    for r in acc:
        per_gid.setdefault(r["gid"], []).append(r)
    for rs in per_gid.values():
        offs = [r["submission_offset"] for r in sorted(rs, key=lambda r: r["submitted"])]
        assert offs == list(range(len(offs)))


def test_offset_continuation_and_reingest_idempotent(spark):
    rows = _raw_rows(10, gid_prefix="cccc")
    first = ingest_lowlevel_batch(_raw_df(spark, rows))
    existing_ll = first.accepted.select("gid", "submission_offset")
    existing_sha = first.accepted.select("data_sha256")

    # re-ingesting the same batch -> everything deduped away
    again = ingest_lowlevel_batch(_raw_df(spark, rows), existing_ll, existing_sha)
    assert again.accepted.count() == 0

    # new submissions for an existing gid continue its offset sequence
    rng = random.Random(99)
    gid = rows[0]["gid"]
    prev_max = max(
        r["submission_offset"] for r in existing_ll.filter(F.col("gid") == gid).collect()
    )
    new = [
        {
            "gid": gid,
            "gid_type": "mbid",
            "submitted": datetime(2024, 6, 1),
            "data": _make_doc(rng, gid, "artist-y", False),
        }
    ]
    res = ingest_lowlevel_batch(_raw_df(spark, new), existing_ll, existing_sha)
    [r] = res.accepted.collect()
    assert r["submission_offset"] == prev_max + 1


def test_duplicate_cap(spark):
    rng = random.Random(5)
    gid = "dddd0000-0000-4000-8000-000000000000"
    rows = [
        {
            "gid": gid,
            "gid_type": "mbid",
            "submitted": datetime(2024, 1, 1) + timedelta(hours=i),
            "data": _make_doc(rng, gid, "a", False),
        }
        for i in range(15)
    ]
    res = ingest_lowlevel_batch(_raw_df(spark, rows), max_duplicate_submissions=10)
    offs = sorted(r["submission_offset"] for r in res.accepted.collect())
    assert offs == list(range(10))


def test_bulk_get_features_defaults(spark):
    rows = _raw_rows(5, gid_prefix="eeee")
    res = ingest_lowlevel_batch(_raw_df(spark, rows))
    acc = res.accepted.withColumn("id", F.monotonically_increasing_id())
    ll = acc.select("id", "gid", "submission_offset")
    llj = acc.select("id", "data")
    keys = ll.select("gid", "submission_offset").limit(3)
    out = bulk_get_features(ll, llj, keys, ["rhythm.bpm", "metadata.tags", "nonsense.alias"])
    assert out.count() == 3
    assert set(out.columns) == {"gid", "submission_offset", "rhythm.bpm", "metadata.tags"}
    assert all(r["rhythm.bpm"] is not None for r in out.collect())


def test_bulk_features_match_reference_golden(spark):
    """P1/P2 against the reference's OWN golden response
    (db/test_data/lowlevel_select_features_response.json, asserted by the
    reference's test_load_many_individual_features, db/test/test_data.py:778):
    the same two fixture documents, the same (mbid, offset) request incl. a
    missing pair, the numeric + key features our reduced document schema
    carries.  Fixture data is read from the reference checkout at test time."""
    import json
    import os

    from acousticbrainz_server_spark import schemas

    ref = "/root/reference/db/test_data"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference checkout not available")

    mbid1 = "0dad432b-16cc-4bf0-8961-fd31d124b01b"
    mbid2 = "e8afe383-1478-497e-90b1-7885c7f37f6e"
    golden = json.load(open(os.path.join(ref, "lowlevel_select_features_response.json")))

    def reduced(path):
        d = json.load(open(path))
        return {
            "lowlevel": {
                "average_loudness": d["lowlevel"]["average_loudness"],
                "dynamic_complexity": d["lowlevel"]["dynamic_complexity"],
            },
            "rhythm": {"beats_loudness": {"mean": d["rhythm"]["beats_loudness"]["mean"]}},
            "tonal": {"key_key": d["tonal"]["key_key"]},
        }

    doc1 = reduced(os.path.join(ref, f"{mbid1}.json"))
    doc2 = reduced(os.path.join(ref, f"{mbid2}.json"))
    # mbid1 submitted twice (offsets 0, 1), mbid2 once — the reference scenario
    llj_rows = [
        {"id": 1, "data": doc1},
        {"id": 2, "data": doc1},
        {"id": 3, "data": doc2},
    ]
    ll_rows = [
        {"id": 1, "gid": mbid1, "submission_offset": 0},
        {"id": 2, "gid": mbid1, "submission_offset": 1},
        {"id": 3, "gid": mbid2, "submission_offset": 0},
    ]
    ll = spark.createDataFrame(ll_rows, "id long, gid string, submission_offset int")
    llj = spark.createDataFrame(llj_rows, schemas.LOWLEVEL_JSON)
    keys = spark.createDataFrame(
        [(mbid1, 0), (mbid1, 1), (mbid1, 2), (mbid2, 0)], "gid string, submission_offset int"
    )
    feats = [
        "lowlevel.average_loudness",
        "lowlevel.dynamic_complexity",
        "rhythm.beats_loudness.mean",
        "tonal.key_key",
    ]
    out = {(r["gid"], r["submission_offset"]): r for r in bulk_get_features(ll, llj, keys, feats).collect()}

    # the missing (mbid1, 2) pair is skipped, exactly like the reference
    assert set(out) == {(mbid1, 0), (mbid1, 1), (mbid2, 0)}
    for (gid, off), row in out.items():
        g = golden[gid][str(off)]
        assert abs(row["lowlevel.average_loudness"] - g["lowlevel"]["average_loudness"]) < 1e-12
        assert abs(row["lowlevel.dynamic_complexity"] - g["lowlevel"]["dynamic_complexity"]) < 1e-12
        assert abs(row["rhythm.beats_loudness.mean"] - g["rhythm"]["beats_loudness"]["mean"]) < 1e-12
        assert row["tonal.key_key"] == g["tonal"]["key_key"]
