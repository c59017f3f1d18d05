"""k-means training for IVF coarse quantizers — sampled and distributed forms.

The reference's Annoy indices (similarity/index_model.py:13-92) build a
random-projection tree per metric; the IVF-Flat scale path (similarity/ann.py)
needs a coarse quantizer instead — this module trains it.

Two fit paths, same deterministic algorithm (farthest-point seeding + fixed
Lloyd's iterations):

- ``kmeans_fit`` (default, ``sample_n`` set): the production IVF recipe —
  collect a deterministic sample (rows with smallest md5(id)), train the
  quantizer in-memory at the driver with numpy, then ``kmeans_assign`` streams
  the corpus once.  This is how FAISS-style IVF trains at scale: the quantizer
  only needs a representative sample (the reference's own normalization stats
  sample 10k rows the same way, db/similarity_stats.py:64-71), so training
  costs 1 Spark job + one tiny in-memory solve, and the only corpus-sized work
  is the single assignment pass.

- ``kmeans_fit(sample_n=None)``: fully distributed Lloyd's, for when the model
  must see every row.  Per iteration: **assign** = one Arrow-batched
  ``mapInPandas`` pass — distances to all k centroids are a single
  ``(batch x dim) @ (dim x k)`` sgemm via ``||v-c||² = ||v||² - 2·v·c +
  ||c||²``; **update** = one grouped aggregation of ``dim`` ``avg()``
  expressions (codegen'd, map-side partial agg) collected as k rows.  Driver
  state is k x dim floats — O(model), never O(data).  Farthest-point seeding
  costs one corpus pass per seed; for k in the thousands, swap in an
  oversampled k-means||-style init.

Determinism (both paths): seeding starts from the row with the smallest
md5(id) and greedily adds the point maximizing distance-to-nearest-chosen
(ties break by lowest id); no RNG state anywhere; iteration count is fixed;
argmin ties break toward the lowest centroid index (numpy argmin semantics).
maxmin's 2-approximation of the optimal covering avoids the merged-cluster
local optima random seeding falls into.

At 100 TB: assign is embarrassingly parallel (no shuffle); distributed update
shuffles k x dim partial sums per map task.  Empty cells keep their previous
centroid (classic Lloyd's degenerate-cell handling) so k never silently
shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_cells(vectors: DataFrame, centroids: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, v, cell) — nearest-centroid assignment, one sgemm per Arrow batch."""
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)  # k x dim
    half_sq = 0.5 * (c * c).sum(axis=1)  # k

    schema = f"{id_col} LONG, {vec_col} ARRAY<DOUBLE>, cell INT"

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cell=np.array([], dtype="int32"))
                continue
            v = np.stack(pdf[vec_col].to_numpy())  # batch x dim
            # argmin_j ||v-c_j||²  ==  argmax_j (v·c_j - ||c_j||²/2)
            cell = (v @ c.T - half_sq).argmax(axis=1).astype("int32")
            yield pdf.assign(cell=cell)

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(assign, schema)


# ---------------------------------------------------------------------------
# driver-side (sampled) solver — numpy on a deterministic sample
# ---------------------------------------------------------------------------


def _lloyd_numpy(sample, ids, k: int, max_iter: int):
    """maxmin seeding + fixed Lloyd's rounds on an in-memory (n x dim) array.

    ``ids`` orders tie-breaks; rows must already be sorted by (md5(id), id).
    """
    import numpy as np

    x = sample  # n x dim, float64
    chosen = [0]  # row 0 == smallest md5(id)
    d2 = ((x - x[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        # farthest point, ties to lowest id: argmax over (d2, -id) lexicographic
        far = np.lexsort((ids, -d2))[0]
        chosen.append(int(far))
        d2 = np.minimum(d2, ((x - x[far]) ** 2).sum(axis=1))
    c = x[chosen].copy()  # k x dim
    for _ in range(max_iter):
        dots = x @ c.T - 0.5 * (c * c).sum(axis=1)
        cell = dots.argmax(axis=1)
        for j in range(k):
            m = cell == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return c.tolist()


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "id",
    vec_col: str = "v",
    dim: int | None = None,
    sample_n: int | None = 2048,
) -> list[list[float]]:
    """Train k centroids; returns them as a plain k x dim list (the 'model').

    ``sample_n`` set (default): deterministic-sample + driver numpy solve —
    one Spark job regardless of k or max_iter.  ``sample_n=None``: fully
    distributed Lloyd's (see module docstring).
    """
    import numpy as np

    v = vectors.select(F.col(id_col), F.col(vec_col))
    if sample_n is not None:
        rows = (
            v.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_n)
            .collect()
        )
        x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
        ids = np.asarray([r[id_col] for r in rows])
        return _lloyd_numpy(x, ids, k, max_iter)
    return _kmeans_fit_distributed(v, k, max_iter, id_col, vec_col, dim)


# ---------------------------------------------------------------------------
# fully distributed solver
# ---------------------------------------------------------------------------


def _maxmin_init(v: DataFrame, k: int, id_col: str, vec_col: str) -> list[list[float]]:
    """Deterministic farthest-point seeding: one min-distance pass per round."""
    import numpy as np

    first = v.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)).limit(1).collect()[0]
    centroids = [list(first[vec_col])]
    for _ in range(k - 1):
        c = np.asarray(centroids, dtype=np.float64)
        half_sq = 0.5 * (c * c).sum(axis=1)

        def mind(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(min_d2=np.array([], dtype="float64"))[[id_col, vec_col, "min_d2"]]
                    continue
                m = np.stack(pdf[vec_col].to_numpy())
                # min_j ||v-c_j||² = ||v||² - 2·max_j (v·c_j - ||c_j||²/2)
                d2 = (m * m).sum(axis=1) - 2.0 * (m @ c.T - half_sq).max(axis=1)
                yield pdf.assign(min_d2=d2)[[id_col, vec_col, "min_d2"]]

        far = (
            v.mapInPandas(mind, f"{id_col} LONG, {vec_col} ARRAY<DOUBLE>, min_d2 DOUBLE")
            .orderBy(F.desc("min_d2"), F.asc(id_col))
            .limit(1)
            .collect()[0]
        )
        centroids.append(list(far[vec_col]))
    return centroids


def _kmeans_fit_distributed(
    v: DataFrame,
    k: int,
    max_iter: int,
    id_col: str,
    vec_col: str,
    dim: int | None,
) -> list[list[float]]:
    # the fit makes (k-1) + max_iter + 1 passes over the projected vectors —
    # cache the projection for the fit's lifetime (MLlib's KMeans demands the
    # same of its callers)
    v = v.cache()
    if dim is None:
        dim = v.select(F.size(vec_col).alias("d")).first()["d"]
    centroids = _maxmin_init(v, k, id_col, vec_col)
    for _ in range(max_iter):
        assigned = _assign_cells(v, centroids, id_col, vec_col)
        new_rows = (
            assigned.groupBy("cell")
            .agg(F.array(*[F.avg(F.col(vec_col)[i]) for i in range(dim)]).alias("c"))
            .collect()
        )
        by_cell = {int(r["cell"]): list(r["c"]) for r in new_rows}
        # empty cells keep their previous centroid so k never shrinks
        centroids = [by_cell.get(j, centroids[j]) for j in range(k)]
    v.unpersist()
    return centroids


def kmeans_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, v, cell) under a trained model — the IVF cell column."""
    return _assign_cells(vectors, centroids, id_col, vec_col)


def load_centroids(spark, path: str) -> list[list[float]]:
    """Load a committed centroid model (cell, centroid) parquet as the plain
    k x dim list ``kmeans_fit`` returns — the deploy-time path: coarse
    quantizers are trained once on a sample and SHIPPED, not refit per query
    (the reference ships its Annoy index the same way,
    similarity/index_model.py:13-92)."""
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [list(r["centroid"]) for r in rows]
