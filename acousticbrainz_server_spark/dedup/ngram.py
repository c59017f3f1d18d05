"""Exact n-gram Jaccard near-duplicate detection.

The exact-similarity baseline that MinHash/LSH approximates.  Plan shape:
shingle (flatMap, no shuffle) → self-join on shingle (one shuffle on the
shingle key) → pair-count groupBy (one shuffle on the pair key) → join per-doc
set sizes → Jaccard filter.

Scale notes: the shingle self-join is the quadratic danger zone — its cost is
sum over shingles of df(s)^2.  For 100 TB corpora: (a) drop ultra-common
shingles (document frequency cap) before the join — they only ever connect
non-near-dup pairs; (b) or switch to the MinHash/LSH path (dedup/minhash.py)
whose banding bounds candidate pairs.  Here we keep exact semantics (it is the
oracle) and expose ``max_doc_freq`` for the cap.

Dense-vocabulary fast path: when the distinct-shingle vocabulary is small
(boilerplate-heavy corpora — exactly the regime where the shingle self-join
degenerates, because every shingle has huge document frequency), ALL pairwise
intersection counts are one block matrix multiply of the doc×shingle
indicator matrix with its transpose.  That runs as an Arrow-batched
``mapInPandas`` over row blocks of the A side with the B side broadcast —
each block is a BLAS sgemm, ~100× the throughput of a per-pair popcount or
join loop.  (An earlier bitmask+popcount nested-loop variant measured 52 s of
executor CPU on the bench corpus; the sgemm kernel does the same pairs in
well under a second.)  At 100 TB this is classic block-matrix tiling: A
streams in row blocks, B tiles must fit executor memory — beyond that, fall
back to the shingle join / MinHash paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import repartition_if_narrow, word_bigrams


MAX_DENSE_VOCAB = 16_384
# Per-TILE indicator-matrix budget (floats) for the broadcast sgemm path:
# one tile of the B side (tile_rows x vocab) must fit comfortably in driver
# and executor memory (256 MB at float32).  The B side as a whole may span
# several tiles (driver holds ONE tile at a time while building broadcasts).
MAX_DENSE_CELLS = 64_000_000
# Dense-path ceiling in tiles: each tile costs one full pass over the A side,
# so total work grows linearly in tile count — past this, the capped exact
# shingle join is the better plan shape.
MAX_DENSE_TILES = 8
# Cost-model constant for the dense-vs-join choice: the sgemm does
# n_docs^2 * vocab flops (QUADRATIC in corpus size), the shingle join
# processes sum over shingles of df(s)^2 candidate rows (linear when the
# corpus grows by disjoint content).  Effective local[32] rates measure
# ~5e10 sgemm flops/core-s vs ~1e7 joined rows/core-s, i.e. one join row
# buys ~5000 flops — so dense only wins while
# n_docs^2 * vocab <= DENSE_FLOPS_PER_JOIN_ROW * sum_df2.  Without this
# term the memory gate alone picked the sgemm on a 50k-doc corpus where it
# ran 1000x the flops of the 10x-smaller one (measured 125s vs ~20s for
# the join) — fitting in memory is not the same as being the cheaper plan.
DENSE_FLOPS_PER_JOIN_ROW = 5000
# Shingle document-frequency cap for the exact join path: a shingle in >1000
# docs contributes >=10^6 join pairs on its own while connecting no pair that
# could clear a 0.4 Jaccard on its rarity-driven intersection — boilerplate
# shingles are noise for near-dup detection.  This default guards the join
# whenever the dense gate rejects; pass max_doc_freq=None for the uncapped
# exact sweep (the oracle baseline).
DEFAULT_MAX_DOC_FREQ = 1000


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.4,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """All (a < b) doc pairs with word-bigram Jaccard >= threshold.

    Strategy choice: when the distinct-shingle vocabulary is small enough
    (<= MAX_DENSE_VOCAB and the indicator matrix fits the broadcast budget —
    dense corpora like boilerplate-heavy web text), all intersection counts
    come from a blocked indicator-matrix sgemm (`_jaccard_dense_matmul`).
    Otherwise the general shingle self-join runs, its Σ df(s)² cost bounded
    by ``max_doc_freq`` (default ``DEFAULT_MAX_DOC_FREQ``; None = uncapped).
    """
    # fan out before the explode: a compact single-file corpus would run the
    # shingle explode, the dims aggregate, and the sid join on one core
    sh = repartition_if_narrow(docs).select(
        F.col(id_col).alias("doc"), F.explode(word_bigrams(F.col(text_col))).alias("s")
    ).persist()
    # (doc, s) is already distinct (word_bigrams dedups in-row), so the df
    # aggregate doubles as the vocab count and yields sum(df^2) — the exact
    # work term of the join path — for the cost-model gate below
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    dims = dfreq.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
    ).first()
    # raw doc count, NOT countDistinct over the shingle stream: a cheap
    # column-pruned count that at worst OVERCOUNTS (docs with <2 tokens have
    # no shingles), which only makes the gate and the tile sizing
    # conservative — the dense kernel reads the true membership from the
    # collected sparse relation either way
    n_docs = docs.count()
    if (
        dims["vocab"] <= MAX_DENSE_VOCAB
        and dims["vocab"] * n_docs <= MAX_DENSE_CELLS * MAX_DENSE_TILES
        # cost model, not just memory: the sgemm is quadratic in n_docs,
        # the join is sum_df2 — choose dense only while it is CHEAPER
        and n_docs * n_docs * dims["vocab"]
        <= DENSE_FLOPS_PER_JOIN_ROW * (dims["sum_df2"] or 0)
    ):
        # dims ride along so the dense kernel does not recompute the
        # explode+join+agg just to learn the corpus shape
        return _jaccard_dense_matmul(
            sh, threshold, n_docs=n_docs, vocab_size=dims["vocab"]
        )  # unpersists sh itself
    # join path: recompute the shingle explode per scan instead of caching a
    # corpus-sized stream — at 100 TB the explode is a cheap scan-side
    # flatMap, while persisting it would pin ~L rows/doc in executor storage
    sh.unpersist(blocking=False)
    return _jaccard_shingle_join(sh, threshold, max_doc_freq)


def _jaccard_dense_matmul(
    sh: DataFrame,
    threshold: float,
    max_tile_cells: int = MAX_DENSE_CELLS,
    n_docs: int | None = None,
    vocab_size: int | None = None,
) -> DataFrame:
    """Exact Jaccard via TILED indicator-matrix multiply (dense-vocab path).

    sid assignment and the doc→sid-list aggregation stay in Spark; the
    aggregated SPARSE relation is then pulled to the driver ONCE (Arrow
    ``toPandas`` — numpy int arrays, not Python Row/int objects) and
    torrent-broadcast in CSR-ish packed form (ids + offsets + flat sid
    array).  Everything after that single pull is ONE distributed job:

    - the **A side** is rebuilt from the collected rows (Arrow-path
      ``createDataFrame``) and streams through ``mapInPandas`` in ~512-row
      blocks; each block densifies itself once (block × vocab float32).
    - the **B side** is densified one TILE at a time INSIDE the kernel,
      executor-side, from the sparse broadcast.  Per-task memory holds one
      dense tile (≤ ``max_tile_cells`` floats ≈ 256 MB) plus the A block;
      densify cost is O(tile cells) writes — negligible next to the
      (block × vocab × tile_rows) sgemm that follows.  The driver NEVER
      materializes a dense matrix, and there is no per-tile driver loop:
      the round-5 "sequential tile jobs through the driver" finding is gone.

    Driver/broadcast footprint is the SPARSE corpus: Σ|sids| int32 — at most
    the dense cell budget (MAX_DENSE_CELLS × MAX_DENSE_TILES nonzeros ≈ 2 GB
    worst-case, far less in practice) and gated before this path is chosen;
    oversized corpora route to the capped shingle join / MinHash instead.

    Intersection counts ≤ vocab ≤ 16384 are exactly representable in float32,
    and the jaccard division is float64 in both engines, so results are
    bit-identical to the join path (property-tested tiled == untiled ==
    exact-join in tests/test_dedup.py).
    """
    import numpy as np
    import pandas as pd

    spark = sh.sparkSession
    # bounded-window: the dense path is budget-gated (cell_budget caps n_docs x
    # vocab) before this id assignment runs; oversized inputs route to the
    # capped shingle join instead
    vocab = sh.select("s").distinct().select(
        "s", (F.row_number().over(Window.orderBy("s")) - 1).alias("sid")
    )
    doc_sids = sh.join(F.broadcast(vocab), "s").groupBy("doc").agg(F.collect_list("sid").alias("sids"))

    if n_docs is None or vocab_size is None:
        # standalone call (tests): one extra pass to learn the corpus shape;
        # the production caller passes the dims it already computed, so the
        # explode+join+agg runs exactly once (in the collect below)
        stats = sh.agg(
            F.countDistinct("doc").alias("n_docs"), F.countDistinct("s").alias("vocab_size")
        ).first()
        n_docs, vocab_size = stats["n_docs"] or 0, stats["vocab_size"] or 0
    empty = spark.createDataFrame(
        [], "doc_a LONG, doc_b LONG, n_inter LONG, n_a LONG, n_b LONG, jaccard DOUBLE"
    )
    if n_docs == 0 or vocab_size == 0:
        sh.unpersist(blocking=False)
        return empty
    tile_rows = max(1, max_tile_cells // max(vocab_size, 1))

    # ONE driver pull of the sparse (doc, sids) relation — the only eager
    # action on sh; everything downstream reads the broadcast or the
    # re-created A frame, so the shingle cache can go immediately.
    pdf = doc_sids.toPandas()
    sh.unpersist(blocking=False)
    order = np.argsort(pdf["doc"].to_numpy(dtype=np.int64), kind="stable")
    ids = pdf["doc"].to_numpy(dtype=np.int64)[order]
    sid_lists = [np.asarray(pdf["sids"].iloc[int(i)], dtype=np.int32) for i in order]
    del pdf
    lens = np.fromiter((s.size for s in sid_lists), dtype=np.int64, count=len(sid_lists))
    offs = np.zeros(len(sid_lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.concatenate(sid_lists) if sid_lists else np.empty(0, dtype=np.int32)
    # torrent-broadcast the packed sparse corpus ONCE per executor (inlining
    # it in the task closure would re-pickle it into EVERY task)
    bc = spark.sparkContext.broadcast((ids, offs, flat, int(vocab_size), int(tile_rows)))

    # ~512-row A blocks: enough tasks to spread the sgemm, few enough that
    # per-task Python-worker + broadcast-fetch overhead stays negligible.
    # plain-python-int lists: createDataFrame's non-Arrow fallback verifier
    # rejects numpy ints in an ARRAY<INT> field (round-3 red), and .tolist()
    # converts on BOTH the Arrow and fallback paths
    n_part = max(1, min(spark.sparkContext.defaultParallelism, (n_docs + 511) // 512))
    a_side = spark.createDataFrame(
        pd.DataFrame({"doc": ids, "sids": [s.tolist() for s in sid_lists]}),
        "doc LONG, sids ARRAY<INT>",
    ).repartition(n_part)
    del sid_lists, lens

    def block_pairs(batches, _bc=bc):
        b_ids, b_offs, b_flat, V, TR = _bc.value
        n = b_ids.size
        for pdf_a in batches:
            k = len(pdf_a)
            if k == 0:
                continue
            a_mat = np.zeros((k, V), dtype=np.float32)
            for i, sids in enumerate(pdf_a["sids"]):
                a_mat[i, np.asarray(sids, dtype=np.int64)] = 1.0
            a_ids = pdf_a["doc"].to_numpy(dtype=np.int64)
            a_sizes = a_mat.sum(axis=1)
            for t0 in range(0, n, TR):
                t1 = min(t0 + TR, n)
                # densify ONE B tile from the sparse broadcast — O(tile
                # cells) writes vs the k× larger sgemm below; one dense tile
                # lives per task at a time
                b_mat = np.zeros((t1 - t0, V), dtype=np.float32)
                for j in range(t0, t1):
                    b_mat[j - t0, b_flat[b_offs[j] : b_offs[j + 1]]] = 1.0
                b_sizes = b_mat.sum(axis=1)
                tile_ids = b_ids[t0:t1]
                # all-float32 arithmetic: set sizes ≤ vocab ≤ 16384 are exact
                # in float32, and int64-ing the matrices would triple the
                # memory traffic of the hot loop
                inter = a_mat @ b_mat.T  # (k, tile_rows) sgemm
                union = a_sizes[:, None] + b_sizes[None, :] - inter
                # threshold in float64 — the exact jaccard SQL engines compute
                jac = inter.astype(np.float64) / np.maximum(union, 1.0)
                keep = (jac >= threshold) & (a_ids[:, None] < tile_ids[None, :])
                ai, bi = np.nonzero(keep)
                if ai.size == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "doc_a": a_ids[ai],
                        "doc_b": tile_ids[bi],
                        "n_inter": inter[ai, bi].astype(np.int64),
                        "n_a": a_sizes[ai].astype(np.int64),
                        "n_b": b_sizes[bi].astype(np.int64),
                        "jaccard": jac[ai, bi],
                    }
                )

    return a_side.mapInPandas(
        block_pairs,
        "doc_a LONG, doc_b LONG, n_inter LONG, n_a LONG, n_b LONG, jaccard DOUBLE",
    )


def _jaccard_shingle_join(
    sh: DataFrame,
    threshold: float,
    max_doc_freq: int | None,
) -> DataFrame:
    if max_doc_freq is not None:
        rare = sh.groupBy("s").count().filter(F.col("count") <= max_doc_freq).select("s")
        sh = sh.join(F.broadcast(rare), "s", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc").alias("doc_a"), "s")
    b = sh.select(F.col("doc").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
    )
