"""Approximate nearest neighbours — the scale path for V3/V4.

The reference builds per-metric Annoy indices (angular, n_trees=10;
similarity/index_model.py:13-92) and serves k-NN from the mmap'd index.
Spark-first equivalent: ``BucketedRandomProjectionLSH`` over UNIT-NORMALIZED
vectors — for unit vectors, euclidean distance is monotone in angular
distance (||a-b||² = 2-2·cos = angular²), so euclidean LSH buckets reproduce
the angular neighbourhood structure, and the exact angular distance is
recomputed for returned candidates.

Index persistence (S10): the fitted LSH model saves/loads with Spark ML's
native persistence (the .ann file equivalent); ``build_neighbor_table``
materializes a precomputed top-k table — at serving time, a k-NN query is
then a point lookup, which is how a 1000-executor deployment would serve the
reference's API.

Zero vectors (the reference's failed-metric rows) cannot be unit-normalized;
they are excluded from the index, matching Annoy's degenerate behaviour for
zero vectors as a no-result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import angular_distance, norm


def _unit_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    n = norm(F.col(vec_col))
    return (
        df.filter(n > 0.0)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("raw"),
            F.transform(vec_col, lambda x: x / n).alias("unit"),
        )
    )


def fit_lsh_index(
    vectors: DataFrame,
    id_col: str = "id",
    vec_col: str = "v",
    bucket_length: float = 0.5,
    num_hash_tables: int = 10,
    seed: int = 42,
):
    """Fit the LSH 'index' (num_hash_tables ~ Annoy's n_trees=10).

    Returns (model, indexed_df) where indexed_df carries ml-vector 'features'.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    unit = _unit_vectors(vectors, id_col, vec_col)
    feat = unit.withColumn("features", array_to_vector("unit"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feat)
    return model, model.transform(feat).cache()


def knn_lsh(
    model,
    indexed: DataFrame,
    queries: DataFrame,
    k: int = 200,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Approximate bulk k-NN: LSH similarity self-join pruned to the query
    set, exact angular distance recomputed on candidates, top-k per query.

    Vectorized over the whole query set (vs the reference's per-id Annoy
    loop, index_model.py:182-224).
    """
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    q = _unit_vectors(queries, id_col, vec_col)
    qf = q.withColumn("features", array_to_vector("unit"))
    # candidate pairs within a generous euclidean radius (unit vectors: d in [0,2])
    joined = model.approxSimilarityJoin(qf, indexed, threshold=2.0, distCol="_eucl")
    pairs = joined.select(
        F.col("datasetA.id").alias("query_id"),
        F.col("datasetB.id").alias("neighbor_id"),
        angular_distance(F.col("datasetA.raw"), F.col("datasetB.raw")).alias("distance"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    return pairs.withColumn("neighbor_rank", F.row_number().over(w)).filter(F.col("neighbor_rank") <= k)


def build_neighbor_table(
    similarity: DataFrame,
    metric: str,
    k: int,
    out_path: str | None = None,
) -> DataFrame:
    """Materialize the all-pairs top-k neighbor table for one metric — the
    precomputed serving form of the index (S10).  Exact at bench scale; swap
    the pair source for the LSH join at corpus scale."""
    from .knn import knn_by_metric

    nn = knn_by_metric(similarity, similarity.select("id"), metric, k=k)
    if out_path:
        nn.write.mode("overwrite").parquet(out_path)
    return nn
