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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_bigrams


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All (a < b) doc pairs with word-bigram Jaccard >= threshold."""
    sh = docs.select(F.col(id_col).alias("doc"), F.explode(word_bigrams(F.col(text_col))).alias("s"))
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
