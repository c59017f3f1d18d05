"""Vector / similarity queries (SURVEY.md §2.9 V-family, §2.8 F7-F11, A7).

These are the engine's analytics core: normalization-stats aggregation, exact
k-NN (the correctness baseline the reference's Annoy index approximates),
pairwise angular distance, and circular embeddings — all as native column
expressions over ``array<double>``, no UDFs.

Scale path: exact k-NN here is query-set × corpus (broadcast the query set, no
shuffle on the corpus side).  For all-pairs at 100 TB the LSH-bucketed variant
in dedup/embedding.py replaces the cross join; the exact form remains the
oracle.  Cosines are rounded half-up to 4 digits BEFORE ranking so both engines
rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.vector import angular_distance, cosine
from ..sources.tables import load_table
from .registry import query

_COS = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))


# --------------------------------------------------------------------------------------
# A7/V2 — per-dimension normalization stats + z-score (db/similarity_stats.py:27-61)
# --------------------------------------------------------------------------------------
@query(
    "vector_zscore",
    family="A7,V2,F7",
    doc="Per-dimension mean/stddev over the corpus, then z-score normalize — "
    "the similarity normalization-stats pipeline (db/similarity_stats.py:27-61, "
    "similarity/metrics.py:33-45) via posexplode + grouped agg + broadcast-join.",
    oracle=f"""
        WITH e AS (
          SELECT vec_id,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim_idx,
                 unnest(CAST(embedding AS DOUBLE[])) AS x
          FROM embeddings
        ),
        s AS (SELECT dim_idx, avg(x) AS m, stddev_pop(x) AS sd FROM e GROUP BY dim_idx)
        SELECT e.vec_id, e.dim_idx, {sql_round_half_up('(e.x - s.m) / s.sd', 4)} AS z
        FROM e JOIN s USING (dim_idx) WHERE e.vec_id < 20
    """,
)
def vector_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vectors(spark, sf_dir)
    e = v.select("vec_id", F.posexplode("v").alias("dim_idx", "x"))
    stats = e.groupBy("dim_idx").agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("sd"))
    return (
        e.filter(F.col("vec_id") < 20)
        .join(F.broadcast(stats), "dim_idx")
        .select("vec_id", "dim_idx", round_half_up((F.col("x") - F.col("m")) / F.col("sd"), 4).alias("z"))
    )


# --------------------------------------------------------------------------------------
# V4/O4 — exact k-NN top-k by cosine (index_model.py:149-224 semantics, exact)
# --------------------------------------------------------------------------------------
@query(
    "knn_exact_topk",
    family="V4,O4,W3",
    doc="Exact k-NN: top-5 cosine neighbors for each query vector — the "
    "deterministic semantics the reference's Annoy index (similarity/"
    "index_model.py:149-224) approximates.  Query set broadcast; rank on "
    "rounded cosine with id tie-break.",
    oracle=f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {sql_round_half_up(_COS, 4)} AS cosine_sim
          FROM v a, v b
          WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
        )
        SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS neighbor_rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rn
          FROM pairs
        ) WHERE rn <= 5
    """,
)
def knn_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    pairs = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            round_half_up(cosine(F.col("qv"), F.col("v")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("neighbor_rank", F.row_number().over(w))
        .filter(F.col("neighbor_rank") <= 5)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("neighbor_rank").cast("int").alias("neighbor_rank"))
    )


# --------------------------------------------------------------------------------------
# V5 — pairwise angular distance (index_model.py:226-244)
# --------------------------------------------------------------------------------------
@query(
    "pairwise_angular_distance",
    family="V5",
    doc="Annoy angular distance sqrt(2-2cos) between consecutive-id vector "
    "pairs (similarity/index_model.py:226-244).",
    oracle=f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {sql_round_half_up(f'sqrt(greatest(0.0, 2.0 - 2.0 * ({_COS})))', 4)} AS angular_dist
        FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 40
    """,
)
def pairwise_angular_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vectors(spark, sf_dir)
    a = v.filter(F.col("vec_id") < 40).select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select("id_a", "id_b", round_half_up(angular_distance(F.col("va"), F.col("vb")), 4).alias("angular_dist"))
    )


# --------------------------------------------------------------------------------------
# F9/F11 — circular (octave-invariant) embedding of a tempo-like scalar
# --------------------------------------------------------------------------------------
@query(
    "bpm_circle_embedding",
    family="F9,F11",
    doc="BPM circle embedding [cos(2*pi*log2(v)), sin(2*pi*log2(v))] — "
    "octave-invariant tempo metric (similarity/metrics.py:89-96, 120-140).",
    oracle=f"""
        SELECT event_id,
               {sql_round_half_up('cos(2 * pi() * log2(value))', 6)} AS bpm_cos,
               {sql_round_half_up('sin(2 * pi() * log2(value))', 6)} AS bpm_sin
        FROM events WHERE event_id < 1000 AND value > 0
    """,
)
def bpm_circle_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, sf_dir, "events").filter((F.col("event_id") < 1000) & (F.col("value") > 0))
    angle = F.lit(2.0 * math.pi) * F.log2("value")
    return ev.select(
        "event_id",
        round_half_up(F.cos(angle), 6).alias("bpm_cos"),
        round_half_up(F.sin(angle), 6).alias("bpm_sin"),
    )
