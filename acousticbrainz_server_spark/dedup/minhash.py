"""MinHash + LSH band-bucket near-duplicate detection.

Pipeline: shingle → n-hash MinHash signature per doc → split signature into
bands → groupBy (band_idx, band_hash) buckets → candidate pairs within buckets
→ (optional) exact-Jaccard verify of candidates only.

The md5-based hash family (functions/text.py) keeps signatures deterministic
and engine-portable.  Scale notes: candidate generation never computes the
cross product — the only joins are on band-hash buckets; a bucket-size cap
guards against degenerate buckets (boilerplate docs) the way common-shingle
caps do in the exact path.  At 100 TB: signatures are ~n_hashes*32 bytes/doc
(tiny vs the corpus), so the band shuffle moves ~0.1% of input bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_shingle_stream, minhash_signature_exprs


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """One row per doc: id + mh0..mh{n-1} md5-min signature columns."""
    sh = char_shingle_stream(docs, id_col, text_col, shingle_k)
    return sh.groupBy("doc").agg(*minhash_signature_exprs("s", n_hashes))


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate (doc_a < doc_b) pairs sharing at least one LSH band."""
    rows_per_band = n_hashes // n_bands
    # one pass: band array -> explode (vs n_bands unioned scans of the
    # signature relation)
    band_structs = []
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    banded = signatures.select(
        "doc", F.explode(F.array(*band_structs)).alias("_b")
    ).select("doc", F.col("_b.band_idx").alias("band_idx"), F.col("_b.band_hash").alias("band_hash"))
    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band_idx", "band_hash")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("band_idx", "band_hash")
        )
        banded = banded.join(ok, ["band_idx", "band_hash"], "left_semi")
    a = banded.select("band_idx", "band_hash", F.col("doc").alias("doc_a"))
    b = banded.select("band_idx", "band_hash", F.col("doc").alias("doc_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup candidates with their estimated (signature-agreement) Jaccard."""
    # signatures feed candidate generation AND both verify sides — cache so
    # the shingle explode+groupBy runs once, not three times
    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle_k).cache()
    cand = lsh_candidate_pairs(sigs, n_hashes, n_bands)
    sa = sigs.select(F.col("doc").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_hashes)])
    sb = sigs.select(F.col("doc").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_hashes)])
    agree = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(n_hashes))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (agree / F.lit(float(n_hashes))).alias("est_jaccard"))
    )
