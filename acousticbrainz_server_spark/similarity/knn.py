"""k-NN query + neighbor post-processing (V4-V6).

Exact top-k by Annoy's angular distance sqrt(2-2·cos) over a metric's vector
column — the deterministic semantics the reference's Annoy indices
(similarity/index_model.py:149-224) approximate — plus the API layer's
post-processing (webserver/views/api/v1/similarity.py:16-67):

- distance threshold filter (clamped [0,1] at the API),
- dedup modes: 'none' | 'samescore' (drop same (mbid, distance) dups) |
  'all' (keep only the closest submission per mbid),
- deterministic ordering (distance, mbid, offset).

Defaults mirror the API: k default 200, clamped [1, 1000]
(webserver/views/api/v1/similarity.py:84-92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import angular_distance

DEFAULT_K = 200
MAX_K = 1000


def knn_by_metric(
    similarity: DataFrame,
    query_ids: DataFrame,
    metric: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(query_id, neighbor_id, distance, neighbor_rank) — exact angular top-k.

    ``similarity``: the vector table (id + one array column per metric);
    ``query_ids``: small frame with column ``id`` (bulk API caps at 25 →
    broadcast side).
    """
    k = max(1, min(int(k), MAX_K))
    q = similarity.join(F.broadcast(query_ids.select("id")), "id", "left_semi").select(
        F.col("id").alias("query_id"), F.col(metric).alias("qv")
    )
    pairs = (
        similarity.select(F.col("id").alias("neighbor_id"), F.col(metric).alias("nv"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", angular_distance(F.col("qv"), F.col("nv")).alias("distance"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    return pairs.withColumn("neighbor_rank", F.row_number().over(w)).filter(F.col("neighbor_rank") <= k)


def postprocess_neighbors(
    neighbors: DataFrame,
    threshold: float | None = None,
    remove_dups: str = "none",
    query_cols: tuple[str, ...] = ("query_id",),
    mbid_col: str = "recording_mbid",
    offset_col: str = "offset",
    distance_col: str = "distance",
) -> DataFrame:
    """Threshold + dedup + deterministic sort (similarity.py:16-67)."""
    out = neighbors
    if threshold is not None:
        t = min(max(float(threshold), 0.0), 1.0)  # clamp, similarity.py:94-103
        out = out.filter(F.col(distance_col) <= t)
    if remove_dups == "samescore":
        w = Window.partitionBy(*query_cols, mbid_col, distance_col).orderBy(F.asc(offset_col))
        out = out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    elif remove_dups == "all":
        w = Window.partitionBy(*query_cols, mbid_col).orderBy(F.asc(distance_col), F.asc(offset_col))
        out = out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    elif remove_dups != "none":
        raise ValueError(f"unknown remove_dups mode {remove_dups!r}")
    return out.orderBy(*[F.col(c) for c in query_cols], F.asc(distance_col), F.asc(mbid_col), F.asc(offset_col))
