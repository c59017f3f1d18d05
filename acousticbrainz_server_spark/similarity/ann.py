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


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "id",
    vec_col: str = "v",
    cell_col: str = "cell",
    round_digits: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate k-NN: per-cell centroids route each
    query to its ``nprobe`` nearest cells; only those cells are searched.

    The deterministic inverted-file analogue of the reference's Annoy index
    (similarity/index_model.py:13-92).  Recall tracks how geometrically
    coherent the cell assignment is — with k-means-quality cells this is the
    classic IVF-Flat structure; at 100 TB the cell column is the partition
    key, so probing prunes the scan to nprobe/ncells of the corpus, and the
    centroid table is a broadcast dimension.

    Cosines are rounded half-up BEFORE ranking (cross-engine rank parity).
    """
    from pyspark.sql import Window

    from ..functions.scalar import round_half_up
    from ..functions.vector import cosine

    v = vectors.select(F.col(id_col).alias("id"), F.col(cell_col).alias("cell"), F.col(vec_col).alias("v"))
    e = v.select("cell", F.posexplode("v").alias("d", "x"))
    cd = e.groupBy("cell", "d").agg(F.avg("x").alias("m"))
    cent = cd.groupBy("cell").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s.m).alias("c")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(cent)).select(
        "query_id", "cell", "qv", round_half_up(cosine(F.col("qv"), F.col("c")), round_digits).alias("cell_cos")
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    probe = (
        qc.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= nprobe).select("query_id", "cell", "qv")
    )
    cand = (
        v.join(F.broadcast(probe), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            round_half_up(cosine(F.col("qv"), F.col("v")), round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("neighbor_rank", F.row_number().over(w))
        .filter(F.col("neighbor_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("neighbor_rank").cast("int").alias("neighbor_rank"))
    )


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
