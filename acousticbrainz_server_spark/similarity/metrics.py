"""The 12 similarity metric vectors (V1) as ONE wide select of native column
expressions — no UDFs, no per-row Python.

Reference semantics (similarity/metrics.py, db/similarity.py:184-226,345-377):

- mfccs/gfccs: z-score of the 13-dim mean vector against global sample stats
  (NormalizedLowLevelMetric.transform); if the stddev vector is all-zero, the
  raw values pass through.  Missing/empty feature -> ValueError -> zero vector
  (db/similarity.py:368-371).
- mfccsw/gfccsw: same, then geometric decay weights 0.95**i
  (WeightedNormalizedLowLevelMetric).
- key: circle-of-fifths position KEYS_MAP[key_key] + SCALES_MAP[key_scale]
  (major 0, minor -3/12), embedded on the unit circle [cos(2πv), sin(2πv)];
  unknown key/scale -> zero vector (KeyMetric.transform).
- bpm/onsetrate: [cos(2π·log2(v)), sin(2π·log2(v))] — octave-invariant;
  falsy value -> zero vector (LogCircularMetric).
- moods (5) / instruments (3): fixed (model, class) probability picks
  (BinaryCollectiveMetric); absent model -> 0 for that element; absent
  highlevel data entirely -> zero vector.
- dortmund/rosamerica/tzanetakis: all class probabilities of one model,
  ordered by sorted class name (SingleClassifierMetric); absent model ->
  zero vector of the model's class count.

The highlevel side arrives as a per-recording map<model_name, data> built by
``assemble_metric_input`` — the Spark form of the reference's
``jsonb_object_agg`` batch query (db/similarity.py:202-208).

Scale: the whole computation is a projection — zero shuffles beyond the one
groupBy building the model map, whose key (recording id) is unique and
uniform.  At 100 TB the map-build shuffles once and the 12 vectors are
computed inside whole-stage codegen on the way out to the similarity table.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import MODEL_CLASSES

KEYS_CIRCLE = ["C", "G", "D", "A", "E", "B", "F#", "C#", "G#", "D#", "A#", "F"]
KEYS_MAP = {k: float(i) / 12 for i, k in enumerate(KEYS_CIRCLE)}
SCALES_MAP = {"major": 0.0, "minor": -3.0 / 12}

MOODS_MODELS = [
    ("mood_happy", "happy"),
    ("mood_sad", "sad"),
    ("mood_aggressive", "aggressive"),
    ("mood_relaxed", "relaxed"),
    ("mood_party", "party"),
]
INSTRUMENTS_MODELS = [
    ("mood_acoustic", "acoustic"),
    ("mood_electronic", "electronic"),
    ("voice_instrumental", "instrumental"),
]
GENRE_METRICS = {
    "dortmund": "genre_dortmund",
    "rosamerica": "genre_rosamerica",
    "tzanetakis": "genre_tzanetakis",
}

METRIC_DIMS = {
    "mfccs": 13,
    "mfccsw": 13,
    "gfccs": 13,
    "gfccsw": 13,
    "key": 2,
    "bpm": 2,
    "onsetrate": 2,
    "moods": 5,
    "instruments": 3,
    "dortmund": len(MODEL_CLASSES["genre_dortmund"]),
    "rosamerica": len(MODEL_CLASSES["genre_rosamerica"]),
    "tzanetakis": len(MODEL_CLASSES["genre_tzanetakis"]),
}

METRIC_NAMES = list(METRIC_DIMS)


def _zeros(n: int) -> Column:
    return F.array(*[F.lit(0.0)] * n)


def assemble_metric_input(lowlevel_json: DataFrame, highlevel_model: DataFrame, model: DataFrame) -> DataFrame:
    """id + the 5 lowlevel feature paths + hl map<model_name, data>.

    Spark form of the reference batch query (db/similarity.py:202-226):
    nested-column projection replaces jsonb path extraction; the
    jsonb_object_agg FILTER becomes map_from_entries(collect_list(...)) after
    an inner join with the (tiny, broadcast) model dim.
    """
    ll = lowlevel_json.select(
        "id",
        F.col("data.lowlevel.mfcc.mean").alias("mfcc"),
        F.col("data.lowlevel.gfcc.mean").alias("gfcc"),
        F.col("data.rhythm.bpm").alias("bpm"),
        F.col("data.rhythm.onset_rate").alias("onset_rate"),
        F.col("data.tonal.key_key").alias("key_key"),
        F.col("data.tonal.key_scale").alias("key_scale"),
    )
    hl = (
        highlevel_model.join(
            F.broadcast(model.select(F.col("id").alias("_mid"), "model")),
            highlevel_model["model"] == F.col("_mid"),
        )
        .groupBy("highlevel")
        .agg(F.map_from_entries(F.collect_list(F.struct(model["model"], highlevel_model["data"]))).alias("hl"))
    )
    return ll.join(hl, ll["id"] == hl["highlevel"], "left").drop("highlevel")


def _map_lit(d: dict[str, float]) -> Column:
    pairs = []
    for k, v in d.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def _normalized(vec: Column, means: list[float], stddevs: list[float], weighted: bool, dim: int) -> Column:
    if any(s != 0 for s in stddevs):
        m = F.array(*[F.lit(float(x)) for x in means])
        s = F.array(*[F.lit(float(x)) for x in stddevs])
        out = F.zip_with(F.zip_with(F.slice(vec, 1, dim), m, lambda x, mm: x - mm), s, lambda d_, ss: d_ / ss)
    else:
        # all-zero stddev -> raw passthrough (NormalizedLowLevelMetric.transform)
        out = F.slice(vec, 1, dim)
    if weighted:
        out = F.transform(out, lambda v, i: v * F.pow(F.lit(0.95), i.cast("double")))
    return F.when(vec.isNull() | (F.size(vec) == 0), _zeros(dim)).otherwise(out)


def _circle(value: Column) -> Column:
    angle = value * F.lit(2.0 * math.pi)
    return F.array(F.cos(angle), F.sin(angle))


def _binary_collective(hl: Column, models: list[tuple[str, str]]) -> Column:
    elems = [
        F.coalesce(F.element_at(F.element_at(hl, m)["all"], cls), F.lit(0.0)) for m, cls in models
    ]
    return F.when(hl.isNull(), _zeros(len(models))).otherwise(F.array(*elems))


def _single_classifier(hl: Column, model_name: str) -> Column:
    classes = sorted(MODEL_CLASSES[model_name])
    data = F.element_at(hl, model_name)
    vec = F.array(*[F.element_at(data["all"], c) for c in classes])
    return F.when(hl.isNull() | data.isNull(), _zeros(len(classes))).otherwise(vec)


def compute_similarity_vectors(metric_input: DataFrame, stats: dict[str, tuple[list[float], list[float]]]) -> DataFrame:
    """id + one array<double> column per metric (the similarity.similarity
    table, admin/sql/create_tables.sql:160-174).

    ``stats``: {"mfccs": (means, stddevs), "gfccs": (means, stddevs)} from
    similarity/stats.py — shared by the weighted variants exactly like the
    reference (similarity_stats.py stores the same sample stats under all
    four names).
    """
    mfcc_m, mfcc_s = stats["mfccs"]
    gfcc_m, gfcc_s = stats["gfccs"]
    hl = F.col("hl")

    key_value = F.element_at(_map_lit(KEYS_MAP), F.col("key_key")) + F.element_at(
        _map_lit(SCALES_MAP), F.col("key_scale")
    )
    log_ok = lambda c: c.isNotNull() & (c != 0.0)  # noqa: E731  (falsy check, LogCircularMetric)

    return metric_input.select(
        "id",
        _normalized(F.col("mfcc"), mfcc_m, mfcc_s, weighted=False, dim=13).alias("mfccs"),
        _normalized(F.col("mfcc"), mfcc_m, mfcc_s, weighted=True, dim=13).alias("mfccsw"),
        _normalized(F.col("gfcc"), gfcc_m, gfcc_s, weighted=False, dim=13).alias("gfccs"),
        _normalized(F.col("gfcc"), gfcc_m, gfcc_s, weighted=True, dim=13).alias("gfccsw"),
        F.when(key_value.isNull(), _zeros(2)).otherwise(_circle(key_value)).alias("key"),
        F.when(log_ok(F.col("bpm")), _circle(F.log2("bpm"))).otherwise(_zeros(2)).alias("bpm"),
        F.when(log_ok(F.col("onset_rate")), _circle(F.log2("onset_rate"))).otherwise(_zeros(2)).alias("onsetrate"),
        _binary_collective(hl, MOODS_MODELS).alias("moods"),
        _binary_collective(hl, INSTRUMENTS_MODELS).alias("instruments"),
        *[_single_classifier(hl, model).alias(name) for name, model in GENRE_METRICS.items()],
    )
