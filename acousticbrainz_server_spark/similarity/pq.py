"""Product quantization (PQ) — the ANN memory-scale path beyond IVF.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 (public algorithm; independent implementation).  Each d-dim
vector splits into M contiguous subspaces of d/M dims; every subspace gets
its own small k-means codebook (K codewords).  A vector is stored as M
sub-codes — with M=8, K=16 that is 8 nibbles ≈ 4 bytes, a 128× cut from 64
float64 dims — and search uses Asymmetric Distance Computation (ADC): per
query, precompute the (M × K) table of squared distances from the query's
sub-vectors to every codeword, then a database vector's approximate distance
is the sum of M table lookups on its codes.

Spark shapes:
- ``pq_train``: M deterministic sub-space k-means fits (reuses
  similarity/kmeans.kmeans_fit on a sliced vector column — md5-seeded
  sample, maxmin init, fixed rounds), run once and SHIPPED like any index
  artifact (committed fixture: tools/gen_pq_fixture.py).
- ``pq_assign``: one Arrow-batched mapInPandas pass; per batch each subspace
  is a (batch × K) squared-distance matrix and an argmin (ties → lowest
  code, matching a SQL row_number ORDER BY dist, code).  Shuffle-free.
- ``pq_adc_topk``: the query set's (q × M × K) distance tables broadcast;
  each codes batch computes its (batch × q) ADC matrix by table lookup and
  emits only the per-batch top-k per query — the shuffle carries
  k·q·batches candidate rows, never n·q (same discipline as the
  brute-force gemm baseline in plans/vectors.py).

At 100 TB the codes relation IS the index: 4 bytes/vector keeps a
10^11-vector corpus in ~400 GB — scannable per query batch — and composes
with the IVF cell column (scan only probed cells' codes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_fit


def pq_train(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "id",
    vec_col: str = "v",
    max_iter: int = 3,
) -> list[list[list[float]]]:
    """M per-subspace codebooks (each k x dim/m), deterministic."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = vectors.select(
            F.col(id_col), F.slice(F.col(vec_col), s * sub + 1, sub).alias(vec_col)
        )
        books.append(kmeans_fit(sliced, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col, dim=sub))
    return books


def load_codebooks(spark, path: str, m: int, k: int, sub: int) -> list[list[list[float]]]:
    """Read the exploded (s, c, o, w) codebook parquet back to M x K x sub."""
    rows = spark.read.parquet(path).collect()
    books = [[[0.0] * sub for _ in range(k)] for _ in range(m)]
    for r in rows:
        books[r["s"]][r["c"]][r["o"]] = r["w"]
    return books


def _dist_tables(x, books):
    """(n x M x K) squared distances from each row's sub-vectors to every
    codeword, computed as an explicit (x - w)² sum so the arithmetic matches
    the SQL oracle's formulation term-for-term."""
    import numpy as np

    n = x.shape[0]
    m = len(books)
    k = len(books[0])
    sub = x.shape[1] // m
    out = np.empty((n, m, k), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * sub : (s + 1) * sub]  # n x sub
        cs = np.asarray(books[s], dtype=np.float64)  # k x sub
        out[:, s, :] = ((xs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
    return out


def pq_assign(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """(id, codes array<int>) — per-subspace nearest codeword (ties → lowest
    code; np.argmin takes the first minimum, matching SQL's ORDER BY dist, c)."""
    import numpy as np

    m = len(codebooks)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = _dist_tables(x, codebooks).argmin(axis=2)  # n x m
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": [row.tolist() for row in codes.astype(int)]}
            )

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, f"{id_col} LONG, codes ARRAY<INT>"
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    topk: int = 5,
    id_col: str = "id",
    vec_col: str = "v",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k neighbors per query by ADC distance over the codes relation.

    ``queries``: small (id, v) frame — collected and turned into broadcast
    distance tables.  Rank on the ROUNDED distance with neighbor-id
    tie-break so both engines rank identically.
    """
    import numpy as np

    from pyspark.sql import Window

    from ..functions.scalar import round_half_up

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    q_ids = np.asarray([r[id_col] for r in q_rows])
    qx = np.asarray([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    qtab = _dist_tables(qx, codebooks)  # q x m x k
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qtab))
    m = len(codebooks)

    def adc(batches):
        import pandas as pd

        bq_ids, bqtab = bc.value
        nq = len(bq_ids)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            cm = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])  # n x m
            ids = pdf[id_col].to_numpy()
            # ADC: d[i, q] = sum_s qtab[q, s, cm[i, s]]
            d = np.zeros((n, nq), dtype=np.float64)
            for s in range(m):
                d += bqtab[:, s, :][:, cm[:, s]].T  # (n, nq)
            # local top-(k+1) per query (self row may be among them)
            take = min(n, topk + 1)
            part = np.argpartition(d, take - 1, axis=0)[:take]  # take x nq
            rows_i, rows_q, rows_d = [], [], []
            for qi in range(nq):
                sel = part[:, qi]
                rows_i.extend(ids[sel])
                rows_q.extend([bq_ids[qi]] * len(sel))
                rows_d.extend(d[sel, qi])
            yield pd.DataFrame({"query_id": rows_q, "neighbor_id": rows_i, "adc_dist": rows_d})

    cand = codes.mapInPandas(adc, "query_id LONG, neighbor_id LONG, adc_dist DOUBLE").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cand = cand.withColumn("adc_dist", round_half_up(F.col("adc_dist"), round_digits))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        cand.withColumn("neighbor_rank", F.row_number().over(w))
        .filter(F.col("neighbor_rank") <= topk)
        .select("query_id", "neighbor_id", "adc_dist", F.col("neighbor_rank").cast("int").alias("neighbor_rank"))
    )
