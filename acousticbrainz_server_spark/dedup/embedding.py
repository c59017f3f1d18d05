"""Embedding-cosine near-duplicate / ANN search.

Brute-force exact top-k (the oracle baseline) + an LSH-bucketed scale path
using random-hyperplane signatures — the same angular-similarity family the
reference's Annoy indices implement (similarity/index_model.py: 'angular',
n_trees=10).

Scale notes: brute force is query_set × corpus — fine when the query set
broadcasts (the reference's API caps bulk queries at 25).  For corpus-level
near-dup sweeps, the hyperplane-LSH bucket join bounds candidates the same way
tree splits do in Annoy; seeds are fixed so results are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query side broadcast)."""
    q = queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("qv"))
    pairs = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), cosine(F.col("qv"), F.col(vec_col)).alias("cosine_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return pairs.withColumn("neighbor_rank", F.row_number().over(w)).filter(F.col("neighbor_rank") <= k)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (no numpy RNG state — pure
    function of (seed, index) so executors agree without broadcast)."""
    vals = [math.sin(seed * 1_000_003 + i * 97.13) for i in range(dim)]
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def hyperplane_lsh_buckets(df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "v", seed: int = 42) -> DataFrame:
    """Append a ``bucket`` column: sign-bit signature over n random hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, seed + p)
        dotp = F.aggregate(
            F.zip_with(F.col(vec_col), F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dotp >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "v",
    use_lsh: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold; LSH-bucketed when requested."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        assert dim is not None
        a = hyperplane_lsh_buckets(a, dim, vec_col="va").withColumnRenamed("bucket", "bucket_a")
        b = hyperplane_lsh_buckets(b, dim, vec_col="vb").withColumnRenamed("bucket", "bucket_b")
        pairs = a.join(b, (F.col("bucket_a") == F.col("bucket_b")) & (F.col("id_a") < F.col("id_b")))
    else:
        # allpairs-by-design: the brute-force cosine BASELINE (eval/golden
        # path over bounded slices); use_lsh=True is the 100 TB path above
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine_sim")).filter(
        F.col("cosine_sim") >= threshold
    )
