"""Golden tests for the F3/F4 scalar kernels against the reference formulas
(db/dataset.py:14-21 slugify; webserver/views/data.py:149-161 _format_length;
db/data.py:1008-1009 strftime short format)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from acousticbrainz_server_spark.functions.scalar import (
    format_duration,
    format_length_long,
    slugify,
    slugify_nfkd,
    slugify_py,
)

# (input, reference-formula output) — outputs computed with the reference's
# exact NFKD->ascii->re chain (db/dataset.py:14-21)
SLUG_GOLDEN = [
    ("Café del Mar", "cafe-del-mar"),
    ("Naïve — Déjà Vu", "naive-deja-vu"),
    ("  Ümläut Straße  ", "umlaut-strae"),
    ("Γειά σου Κόσμε", ""),
    ("日本語のデータ", ""),
    ("ﬁne ﬂags №42", "fine-flags-no42"),
    ("Zoë's  Playlist!!", "zoes-playlist"),
    ("already-slugged-name", "already-slugged-name"),
    ("MiXeD CaSe   Spaces", "mixed-case-spaces"),
    ("½ + ¾ = …", "12-34"),
]


def test_slugify_py_matches_reference_goldens():
    for raw, expect in SLUG_GOLDEN:
        assert slugify_py(raw) == expect, raw


def test_slugify_nfkd_udf_matches_goldens(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(SLUG_GOLDEN)], ["i", "name"])
    got = {r["i"]: r["slug"] for r in df.select("i", slugify_nfkd(F.col("name")).alias("slug")).collect()}
    for i, (_, expect) in enumerate(SLUG_GOLDEN):
        assert got[i] == expect


def test_native_slugify_agrees_on_latin1(spark):
    latin = [(i, raw) for i, (raw, _) in enumerate(SLUG_GOLDEN) if raw.isascii() or "é" in raw or "ï" in raw]
    df = spark.createDataFrame(latin, ["i", "name"])
    rows = df.select(
        "i", slugify(F.col("name")).alias("fast"), slugify_nfkd(F.col("name")).alias("full")
    ).collect()
    for r in rows:
        assert r["fast"] == r["full"], r


def test_format_length_long_branches(spark):
    # (seconds, reference _format_length output)
    cases = [(0, "00:00"), (7, "00:07"), (59, "00:59"), (60, "1:00"), (75, "1:15"),
             (3599, "59:59"), (3600, "1:00:00"), (4530, "1:15:30"), (7322, "2:02:02")]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["secs"])
    got = {r["secs"]: r["out"] for r in df.select("secs", format_length_long(F.col("secs")).alias("out")).collect()}
    for s, expect in cases:
        assert got[s] == expect, (s, got[s], expect)
        # cross-check the golden against the reference formula itself
        mins, secs_ = divmod(float(s), 60)
        hours, mins = divmod(mins, 60)
        ref = ("%d:%02d:%02d" % (hours, mins, secs_)) if hours >= 1 else (
            "%d:%02d" % (mins, secs_) if mins >= 1 else "00:%02d" % secs_
        )
        assert got[s] == ref


def test_format_duration_strftime_parity(spark):
    secs = [0, 7, 59, 60, 75, 3599, 3600, 4530, 7322]
    df = spark.createDataFrame([(s,) for s in secs], ["secs"])
    got = {r["secs"]: r["out"] for r in df.select("secs", format_duration(F.col("secs")).alias("out")).collect()}
    for s in secs:
        assert got[s] == time.strftime("%M:%S", time.gmtime(s)), s
