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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_bigrams


MAX_BITMASK_VOCAB = 16_384


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All (a < b) doc pairs with word-bigram Jaccard >= threshold.

    Strategy choice: when the distinct-shingle vocabulary is small enough
    (<= MAX_BITMASK_VOCAB — dense corpora like boilerplate-heavy web text),
    sets are packed into fixed-width bitmasks and pairs are evaluated with
    AND+popcount in a broadcast nested-loop — no shuffle of the quadratic
    pair stream at all.  Otherwise the general shingle self-join runs (its
    cost is Σ df(s)², bounded by ``max_doc_freq`` at scale).
    """
    sh = docs.select(F.col(id_col).alias("doc"), F.explode(word_bigrams(F.col(text_col))).alias("s")).cache()
    vocab_size = sh.select("s").distinct().count()
    if vocab_size <= MAX_BITMASK_VOCAB:
        return _jaccard_bitmask(sh, vocab_size, threshold)
    return _jaccard_shingle_join(sh, threshold, max_doc_freq)


def _jaccard_bitmask(sh: DataFrame, vocab_size: int, threshold: float) -> DataFrame:
    """Exact Jaccard via bitmask intersection (dense-vocabulary fast path)."""
    n_words = (vocab_size + 63) // 64
    vocab = sh.select("s").distinct().select(
        "s", (F.row_number().over(Window.orderBy("s")) - 1).alias("sid")
    )
    masks = (
        sh.join(F.broadcast(vocab), "s")
        .groupBy("doc")
        .agg(F.collect_list("sid").alias("sids"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "mask",
            F.expr(
                f"aggregate(sids, array_repeat(0L, {n_words}), "
                "(acc, x) -> transform(acc, (v, i) -> "
                "CASE WHEN i = CAST(x / 64 AS INT) THEN v | shiftleft(1L, CAST(x % 64 AS INT)) ELSE v END))"
            ),
        )
        # flatten the mask into scalar long columns: higher-order functions
        # (zip_with/aggregate) are interpreted, not codegen'd — per-pair array
        # allocation would dominate the quadratic loop.  Flat bit_count(&)
        # chains stay inside whole-stage codegen.
        .select("doc", "n", *[F.col("mask")[i].alias(f"m{i}") for i in range(n_words)])
    )
    # AQE coalesces the small mask relation to 1 partition; the quadratic
    # nested-loop probe must stay spread across cores
    n_part = sh.sparkSession.sparkContext.defaultParallelism
    a = masks.repartition(n_part).select(
        F.col("doc").alias("doc_a"), F.col("n").alias("n_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(n_words)]
    )
    b = masks.select(
        F.col("doc").alias("doc_b"), F.col("n").alias("n_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(n_words)]
    )
    inter = sum(
        (F.bit_count(F.col(f"a{i}").bitwiseAND(F.col(f"b{i}"))) for i in range(1, n_words)),
        start=F.bit_count(F.col("a0").bitwiseAND(F.col("b0"))),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("n_inter", inter)
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
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
