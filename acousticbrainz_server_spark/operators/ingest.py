"""Ingest pipeline (SURVEY.md §3.2): validate → normalize → dedup → offset →
append, as ONE batch DataFrame job instead of the reference's per-POST
transaction (db/data.py:138-288).

Reference semantics reproduced:

- P4 tag whitelist (clean_metadata, db/data.py:128-135 + db/tagwhitelist.json):
  drop tags whose lower-cased name is not whitelisted.
- P5 tag rewrite (db/data.py:153-166): musicbrainz_trackid →
  musicbrainz_recordingid; lossless coerced to bool.
- P3 sanity check (SANITY_CHECK_KEYS, db/data.py:20-34, 114-125): reject rows
  missing any required path, carrying the FIRST missing key as the reason —
  rejects are routed to a quarantine frame, not raised.
- P6 mbid match (db/data.py:176-181): embedded musicbrainz_recordingid[0] must
  equal the submission gid (case-insensitive).
- F1 canonical content hash: sha256 of json.dumps(sort_keys=True,
  separators=(',', ':')) — byte-compatible with db/data.py:250-251 via a
  vectorized Pandas UDF (the one place Python is required; SURVEY.md §4).
- E2 dedup (db/data.py:252-257): drop rows whose sha256 already exists, or
  that duplicate an earlier row in the same batch (earliest submitted wins).
- W1/A4 offset assignment (db/data.py:273-288): per-gid dense rank continuing
  from the existing max offset.
- W4 duplicate cap (db/data.py:259-262): drop rows whose assigned offset
  reaches MAX_NUMBER_DUPLICATE_SUBMISSIONS (default 10, config.py.example:59).

Scale notes: one shuffle on gid (offset window), one on sha256 (dedup) — both
high-cardinality uniform keys.  The existing-side inputs are pruned to (gid,
max_offset) and (sha256) columns before joining, so steady-state re-ingest
joins against key columns only.  Sequential ids are assigned with a global
window for bench-scale determinism; at 100 TB the (gid, submission_offset)
pair IS the logical key (SURVEY.md §1.4) and the surrogate id would come from
monotonically_increasing_id instead.
"""

from __future__ import annotations

import hashlib
import json
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_NUMBER_DUPLICATE_SUBMISSIONS = 10

# Tag whitelist — the data set from the reference's db/tagwhitelist.json.
TAG_WHITELIST = frozenset(
    """file_name acoustid_fingerprint acoustid_id album albumartist albumartistsort albumsort
    arranger artist artistsort artistwebpage asin audiosourcewebpage barcode bpm catalognumber
    compilation composer composersort conductor contentgroup copyright copyrighturl date
    discnumber discsubtitle disctotal djmixer encodedby encodersettings encoding encodingtime
    engineer filetype filewebpage genre grouping initialkey isrc label language length license
    lyricist media mixer mood musicbrainz_albumartistid musicbrainz_albumid musicbrainz_artistid
    musicbrainz_discid musicbrainz_releasegroupid musicbrainz_releasetrackid musicbrainz_trackid
    musicbrainz_recordingid musicbrainz_trmid musicbrainz_workid musicip_puid originalalbum
    originalartist originaldate originalfilename originallyricist originalyear owner
    paymentwebpage performer playlistdelay producednotice producer publisherwebpage radiostation
    radiostationowner radiostationwebpage releasecountry releasedate releasestatus releasetype
    remixer script showsort subtitle taggingdate title titlesort totaldiscs totaltracks
    tracknumber tracktotal website work writer""".split()
) | {"musicbrainz album release country", "musicbrainz album status", "musicbrainz album type"}

# Required document paths (SANITY_CHECK_KEYS, db/data.py:20-34), relative to
# the typed document schema (schemas.LOWLEVEL_DOC keeps a reduced version set).
SANITY_CHECK_PATHS = [
    "metadata.version.essentia",
    "metadata.version.essentia_git_sha",
    "metadata.version.extractor",
    "metadata.audio_properties.length",
    "metadata.audio_properties.bit_rate",
    "metadata.audio_properties.codec",
    "metadata.audio_properties.lossless",
    "metadata.tags.musicbrainz_recordingid",
    "lowlevel",
    "rhythm",
    "tonal",
]


def clean_tags(df: DataFrame, data_col: str = "data") -> DataFrame:
    """P4 + P5: whitelist-filter tags and rewrite trackid → recordingid."""
    tags = F.col(f"{data_col}.metadata.tags")
    whitelist = F.array(*[F.lit(t) for t in sorted(TAG_WHITELIST)])
    cleaned = F.map_filter(tags, lambda k, v: F.array_contains(whitelist, F.lower(k)))
    # rewrite: drop musicbrainz_trackid, add its value as musicbrainz_recordingid
    trackid = F.element_at(tags, "musicbrainz_trackid")
    rewritten = F.when(
        trackid.isNotNull(),
        F.map_concat(
            F.map_filter(cleaned, lambda k, v: ~k.isin("musicbrainz_trackid", "musicbrainz_recordingid")),
            F.create_map(F.lit("musicbrainz_recordingid"), trackid),
        ),
    ).otherwise(cleaned)
    return df.withColumn(
        data_col,
        F.col(data_col).withField("metadata.tags", rewritten),
    )


def _path_check(data_col: str, path: str) -> F.Column:
    if path.startswith("metadata.tags."):
        tag = path.rsplit(".", 1)[1]
        return F.element_at(F.col(f"{data_col}.metadata.tags"), tag).isNotNull()
    return F.col(f"{data_col}.{path}").isNotNull()


def missing_key_column(data_col: str = "data") -> F.Column:
    """First missing SANITY_CHECK path per row, or NULL if valid (P3)."""
    out = F.lit(None).cast("string")
    for path in reversed(SANITY_CHECK_PATHS):
        out = F.when(~_path_check(data_col, path), F.lit(path)).otherwise(out)
    return out


def _canonical_sha256_udf():
    """sha256 over the reference's canonical JSON (db/data.py:250-251).

    Input is Spark's to_json(...) of the document (with ignoreNullFields off);
    re-serializing via json.dumps(sort_keys=True, separators=(',', ':'))
    reproduces the reference bytes exactly (shortest-roundtrip float text is
    stable across the loads/dumps round trip).  Built lazily — pandas_udf
    needs an active session.
    """

    @F.pandas_udf("string")
    def canonical_sha256_udf(doc_json: pd.Series) -> pd.Series:
        def h(s: str | None) -> str | None:
            if s is None:
                return None
            canonical = json.dumps(json.loads(s), sort_keys=True, separators=(",", ":"))
            return hashlib.sha256(canonical.encode("utf-8")).hexdigest()

        return doc_json.map(h)

    return canonical_sha256_udf


def with_canonical_sha(df: DataFrame, data_col: str = "data", out_col: str = "data_sha256") -> DataFrame:
    doc_json = F.to_json(F.col(data_col), {"ignoreNullFields": "false"})
    return df.withColumn(out_col, _canonical_sha256_udf()(doc_json))


class IngestResult(NamedTuple):
    accepted: DataFrame  # lowlevel-shaped rows + data + data_sha256
    rejected: DataFrame  # raw rows + reject_reason


def ingest_lowlevel_batch(
    raw: DataFrame,
    existing_lowlevel: DataFrame | None = None,
    existing_sha: DataFrame | None = None,
    max_duplicate_submissions: int | None = MAX_NUMBER_DUPLICATE_SUBMISSIONS,
) -> IngestResult:
    """Batch ingest of raw submissions (gid, gid_type, submitted, data).

    Returns accepted rows carrying (gid, gid_type, submitted, build_sha1,
    lossless, submission_offset, data, data_sha256) plus the quarantine frame
    with per-row reject reasons.
    """
    cleaned = clean_tags(raw)
    cleaned = cleaned.withColumn("_missing_key", missing_key_column())
    mbid_ok = F.lower(F.element_at(F.col("data.metadata.tags"), "musicbrainz_recordingid")[0]) == F.lower(
        F.col("gid")
    )
    cleaned = cleaned.withColumn(
        "reject_reason",
        F.when(F.col("_missing_key").isNotNull(), F.concat(F.lit("missing key: "), F.col("_missing_key")))
        .when(~mbid_ok, F.lit("mbid mismatch"))
        .otherwise(F.lit(None)),
    ).drop("_missing_key")

    rejected = cleaned.filter(F.col("reject_reason").isNotNull())
    valid = with_canonical_sha(cleaned.filter(F.col("reject_reason").isNull()).drop("reject_reason"))

    # E2: drop exact dups — against the existing table, then within the batch
    if existing_sha is not None:
        valid = valid.join(
            existing_sha.select(F.col("data_sha256")).dropDuplicates(["data_sha256"]),
            "data_sha256",
            "left_anti",
        )
    w_sha = Window.partitionBy("data_sha256").orderBy("submitted", "gid")
    valid = valid.withColumn("_rn", F.row_number().over(w_sha)).filter(F.col("_rn") == 1).drop("_rn")

    # W1/A4: offsets continue from the existing per-gid max
    if existing_lowlevel is not None:
        base = existing_lowlevel.groupBy("gid").agg((F.max("submission_offset") + 1).alias("_base"))
        valid = valid.join(F.broadcast(base), "gid", "left").na.fill({"_base": 0})
    else:
        valid = valid.withColumn("_base", F.lit(0))
    w_gid = Window.partitionBy("gid").orderBy("submitted")
    valid = valid.withColumn(
        "submission_offset", (F.row_number().over(w_gid) - 1 + F.col("_base")).cast("int")
    ).drop("_base")

    # W4: duplicate-submission cap
    if max_duplicate_submissions is not None:
        valid = valid.filter(F.col("submission_offset") < max_duplicate_submissions)

    accepted = valid.select(
        "gid",
        "gid_type",
        "submitted",
        F.col("data.metadata.version.essentia_git_sha").alias("build_sha1"),
        F.col("data.metadata.audio_properties.lossless").alias("lossless"),
        "submission_offset",
        "data",
        "data_sha256",
    )
    return IngestResult(accepted=accepted, rejected=rejected)


# ----------------------------------------------------------------------------------
# Read path: P1 feature projection + P2 defaults (db/data.py:604-752;
# AVAILABLE_FEATURES catalog webserver/views/api/v1/core.py:28-48)
# ----------------------------------------------------------------------------------
AVAILABLE_FEATURES: dict[str, str | None] = {
    "lowlevel.average_loudness": None,
    "lowlevel.dynamic_complexity": None,
    "metadata.tags": "{}",
    "rhythm.beats_count": None,
    "rhythm.beats_loudness.mean": None,
    "rhythm.bpm": None,
    "rhythm.danceability": None,
    "rhythm.onset_rate": None,
    "tonal.chords_key": None,
    "tonal.chords_scale": None,
    "tonal.key_key": None,
    "tonal.key_scale": None,
    "tonal.key_strength": None,
    "tonal.tuning_frequency": None,
}


def bulk_get_features(
    lowlevel: DataFrame,
    lowlevel_json: DataFrame,
    keys: DataFrame,
    features: list[str],
) -> DataFrame:
    """Bulk individual-feature fetch: broadcast key join + nested projection.

    ``keys``: small frame (gid, submission_offset) — the ≤25-item bulk API
    request (core.py:24).  Unknown feature aliases are silently dropped, like
    the reference's _parse_individual_features (core.py:405-450).  Missing
    map-valued features default to an empty map (P2, db/data.py:695-752).
    """
    cols = []
    for alias in features:
        if alias not in AVAILABLE_FEATURES:
            continue  # silently dropped
        c = F.col(f"data.{alias}")
        if AVAILABLE_FEATURES[alias] == "{}":
            c = F.coalesce(c, F.from_json(F.lit("{}"), "map<string,array<string>>"))
        cols.append(c.alias(alias))
    joined = lowlevel.join(F.broadcast(keys.dropDuplicates()), ["gid", "submission_offset"], "inner")
    return joined.join(lowlevel_json, "id").select("gid", "submission_offset", *cols)
