"""Typed schemas for the AB data model (SURVEY.md §1).

The reference stores feature documents as Postgres JSONB
(admin/sql/create_tables.sql:13-18) and simulates column pruning with JSONB
path projection (db/data.py:641-692).  Here the document is a typed nested
StructType over Parquet — nested-schema pruning then gives TRUE columnar
reads: selecting ``data.lowlevel.mfcc.mean`` scans one column chunk, not the
whole document.  The reduced document keeps every path the reference's queries
actually touch (FIXTURES.md §2; webserver/views/api/v1/core.py:28-48,
db/dump.py:180-201, db/similarity.py:202-208, dataset_eval/artistfilter.py:124).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _stats_struct() -> T.StructType:
    return T.StructType([T.StructField("mean", T.DoubleType())])


LOWLEVEL_DOC = T.StructType(
    [
        T.StructField(
            "lowlevel",
            T.StructType(
                [
                    T.StructField("average_loudness", T.DoubleType()),
                    T.StructField("dynamic_complexity", T.DoubleType()),
                    T.StructField("mfcc", T.StructType([T.StructField("mean", T.ArrayType(T.DoubleType()))])),
                    T.StructField("gfcc", T.StructType([T.StructField("mean", T.ArrayType(T.DoubleType()))])),
                    T.StructField("barkbands", T.StructType([T.StructField("mean", T.ArrayType(T.DoubleType()))])),
                ]
            ),
        ),
        T.StructField(
            "rhythm",
            T.StructType(
                [
                    T.StructField("bpm", T.DoubleType()),
                    T.StructField("onset_rate", T.DoubleType()),
                    T.StructField("danceability", T.DoubleType()),
                    T.StructField("beats_count", T.DoubleType()),
                    T.StructField("beats_loudness", _stats_struct()),
                ]
            ),
        ),
        T.StructField(
            "tonal",
            T.StructType(
                [
                    T.StructField("key_key", T.StringType()),
                    T.StructField("key_scale", T.StringType()),
                    T.StructField("key_strength", T.DoubleType()),
                    T.StructField("chords_key", T.StringType()),
                    T.StructField("chords_scale", T.StringType()),
                    T.StructField("tuning_frequency", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField(
                        "audio_properties",
                        T.StructType(
                            [
                                T.StructField("length", T.DoubleType()),
                                T.StructField("bit_rate", T.IntegerType()),
                                T.StructField("codec", T.StringType()),
                                T.StructField("lossless", T.BooleanType()),
                                T.StructField("sample_rate", T.DoubleType()),
                            ]
                        ),
                    ),
                    T.StructField("tags", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
                    T.StructField(
                        "version",
                        T.StructType(
                            [
                                T.StructField("essentia", T.StringType()),
                                T.StructField("essentia_git_sha", T.StringType()),
                                T.StructField("extractor", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

LOWLEVEL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("gid", T.StringType(), False),
        T.StructField("build_sha1", T.StringType()),
        T.StructField("lossless", T.BooleanType()),
        T.StructField("submitted", T.TimestampType()),
        T.StructField("gid_type", T.StringType()),
        T.StructField("submission_offset", T.IntegerType()),
    ]
)

LOWLEVEL_JSON = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("data", LOWLEVEL_DOC),
        T.StructField("data_sha256", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)

MODEL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("model_version", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("class_mapping", T.MapType(T.StringType(), T.StringType())),
    ]
)

HIGHLEVEL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # = lowlevel.id
        T.StructField("mbid", T.StringType()),
        T.StructField("build_sha1", T.StringType()),
        T.StructField("submitted", T.TimestampType()),
    ]
)

HIGHLEVEL_MODEL_DATA = T.StructType(
    [
        T.StructField("all", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("value", T.StringType()),
        T.StructField("probability", T.DoubleType()),
    ]
)

HIGHLEVEL_MODEL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("highlevel", T.LongType(), False),  # = lowlevel.id
        T.StructField("data", HIGHLEVEL_MODEL_DATA),
        T.StructField("model", T.LongType(), False),  # FK model.id
        T.StructField("version", T.LongType()),
    ]
)

HIGHLEVEL_META = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # = highlevel.id
        T.StructField("data", LOWLEVEL_DOC["metadata"].dataType),
        T.StructField("data_sha256", T.StringType()),
    ]
)

DATASET = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("author", T.LongType()),
        T.StructField("public", T.BooleanType()),
        T.StructField("created", T.TimestampType()),
        T.StructField("last_edited", T.TimestampType()),
    ]
)

DATASET_CLASS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("dataset", T.StringType(), False),
    ]
)

DATASET_CLASS_MEMBER = T.StructType(
    [
        T.StructField("class", T.LongType(), False),
        T.StructField("mbid", T.StringType(), False),
    ]
)

# 18 classifier models + their class sets (reference similarity/metrics.py:262-279;
# class sets per the highlevel doc shape, FIXTURES.md §3)
MODEL_CLASSES: dict[str, list[str]] = {
    "danceability": ["danceable", "not_danceable"],
    "gender": ["female", "male"],
    "genre_dortmund": ["alternative", "blues", "electronic", "folkcountry", "funksoulrnb", "jazz", "pop", "raphiphop", "rock"],
    "genre_electronic": ["ambient", "dnb", "house", "techno", "trance"],
    "genre_rosamerica": ["cla", "dan", "hip", "jaz", "pop", "rhy", "roc", "spe"],
    "genre_tzanetakis": ["blu", "cla", "cou", "dis", "hip", "jaz", "met", "pop", "reg", "roc"],
    "ismir04_rhythm": ["ChaChaCha", "Jive", "Quickstep", "Rumba-American", "Rumba-International", "Rumba-Misc", "Samba", "Tango"],
    "mood_acoustic": ["acoustic", "not_acoustic"],
    "mood_aggressive": ["aggressive", "not_aggressive"],
    "mood_electronic": ["electronic", "not_electronic"],
    "mood_happy": ["happy", "not_happy"],
    "mood_party": ["party", "not_party"],
    "mood_relaxed": ["not_relaxed", "relaxed"],
    "mood_sad": ["not_sad", "sad"],
    "moods_mirex": ["Cluster1", "Cluster2", "Cluster3", "Cluster4", "Cluster5"],
    "timbre": ["bright", "dark"],
    "tonal_atonal": ["atonal", "tonal"],
    "voice_instrumental": ["instrumental", "voice"],
}
