"""Corpus-curation queries — the data-mixture / repetition-filter /
incremental-dedup operations a large-scale pretraining pipeline runs over a
document corpus (task-brief scope beyond the reference's own surface; public
heuristics: Gopher repetition rules, Rae et al. 2021, arXiv:2112.11446 §A1.1).

All native column expressions over the driver ``documents`` table; every
query has a DuckDB oracle.

Scale notes: each query is one or two shuffles on (doc) or (source, lang) —
uniform high-cardinality or tiny-cardinality keys respectively.  The
cross-snapshot dedup joins the NEW slice (small) against the existing corpus
on content hash and on minhash band keys — both bucketed equi-joins, never a
cross product; at 100 TB the existing side stays parquet-partitioned on the
band key and the new batch broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.text import (
    minhash_signature_aggs,
    minhash_signature_longs,
    repartition_if_narrow,
    sql_minhash_exprs,
    tokens,
)
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------------------
# Gopher-style repetition filter
# --------------------------------------------------------------------------------------
_TOP_TOK_MAX = 0.20  # max fraction of tokens that may be one token type
_DUP_BIGRAM_MAX = 0.90  # max fraction of bigram occurrences that are repeats


@query(
    "gopher_repetition_filter",
    family="TXT,QUALITY",
    doc="Repetition-based quality gate (Gopher rules A1.1, arXiv:2112.11446): "
    "per doc, the most-frequent-token fraction and the duplicate-bigram "
    "fraction (1 - distinct/total); docs above either threshold are flagged "
    "for removal.  Two grouped aggs over the token/bigram streams — the "
    "max-per-group and countDistinct shapes every repetition rule reduces to.",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents
        ),
        tf AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        uni AS (
          SELECT doc_id, max(c) AS top_c, sum(c) AS n_tok, count(*) AS n_types
          FROM tf GROUP BY doc_id
        ),
        big AS (
          SELECT doc_id, toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1] AS bg
          FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
                   unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')))) AS i
            FROM documents
          )
        ),
        bstat AS (
          SELECT doc_id, count(*) AS n_big, count(DISTINCT bg) AS n_big_distinct
          FROM big GROUP BY doc_id
        )
        SELECT u.doc_id,
               {sql_round_half_up("u.top_c * 1.0 / u.n_tok", 4)} AS top_token_frac,
               {sql_round_half_up("1.0 - b.n_big_distinct * 1.0 / b.n_big", 4)} AS dup_bigram_frac,
               (u.top_c * 1.0 / u.n_tok > {_TOP_TOK_MAX}
                OR 1.0 - b.n_big_distinct * 1.0 / b.n_big > {_DUP_BIGRAM_MAX}) AS flagged
        FROM uni u JOIN bstat b USING (doc_id)
    """,
)
def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = repartition_if_narrow(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    tok = d.select("doc_id", F.explode(toks).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    uni = tf.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("n_types")
    )
    bigram = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    big = d.select("doc_id", F.explode(bigram).alias("bg"))
    bstat = big.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_big"), F.countDistinct("bg").alias("n_big_distinct")
    )
    top_frac = F.col("top_c") * 1.0 / F.col("n_tok")
    dup_frac = 1.0 - F.col("n_big_distinct") * 1.0 / F.col("n_big")
    return uni.join(bstat, "doc_id").select(
        "doc_id",
        round_half_up(top_frac, 4).alias("top_token_frac"),
        round_half_up(dup_frac, 4).alias("dup_bigram_frac"),
        ((top_frac > _TOP_TOK_MAX) | (dup_frac > _DUP_BIGRAM_MAX)).alias("flagged"),
    )


# --------------------------------------------------------------------------------------
# Data-mixture report: the per-(source, lang) composition table
# --------------------------------------------------------------------------------------
@query(
    "corpus_mixture_report",
    family="A2,A9,TXT",
    doc="The data-mixture table every pretraining run is configured from: per "
    "(source, lang) document count, token total, and corpus share — one "
    "grouped agg plus a window share; the (source, lang) key is tiny so the "
    "final shuffle is a few rows regardless of corpus size.",
    oracle=f"""
        WITH d AS (
          SELECT source, lang,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
          FROM documents
        ),
        g AS (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM d GROUP BY source, lang
        )
        SELECT source, lang, n_docs, n_tokens,
               {sql_round_half_up("n_tokens * 1.0 / (SELECT sum(n_tokens) FROM g)", 6)} AS token_share
        FROM g
    """,
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    g = d.select("source", "lang", F.size(tokens(F.col("text"))).alias("n_tok")).groupBy(
        "source", "lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    total = F.sum("n_tokens").over(Window.partitionBy())
    return g.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        round_half_up(F.col("n_tokens") * 1.0 / total, 6).alias("token_share"),
    )


# --------------------------------------------------------------------------------------
# Token-length histogram (log2 buckets) per language
# --------------------------------------------------------------------------------------
@query(
    "doc_length_buckets",
    family="A9,TXT",
    doc="Per-language document-length histogram in log2 token buckets — the "
    "shape packing/truncation budgets are tuned from.  floor(log2(n)) bucket "
    "key, one grouped agg.",
    oracle="""
        SELECT lang,
               CAST(floor(log2(greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1))) AS INTEGER) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
)
def doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.greatest(F.size(tokens(F.col("text"))), F.lit(1))
    bucket = F.floor(F.log2(n_tok)).cast("int")
    return d.groupBy("lang", bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------------------
# Cross-snapshot (incremental) dedup: new batch vs existing corpus
# --------------------------------------------------------------------------------------
_XS_HASHES = 4
_XS_BANDS = 2


def _xs_oracle() -> str:
    rows_per_band = _XS_HASHES // _XS_BANDS
    bands = []
    for b in range(_XS_BANDS):
        cols = " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        bands.append(f"SELECT doc, {b} AS band_idx, md5({cols}) AS band_hash FROM sig")
    return f"""
        WITH sh AS (
          SELECT doc_id AS doc, substr(text, CAST(i AS INTEGER), 5) AS s
          FROM (SELECT doc_id, text,
                       unnest(range(1, greatest(len(text) - 4, 1) + 1)) AS i
                FROM documents)
        ),
        sig AS (SELECT doc, {", ".join(sql_minhash_exprs("s", _XS_HASHES))} FROM sh GROUP BY doc),
        banded AS ({" UNION ALL ".join(bands)}),
        newb AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0),
        oldb AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 <> 0),
        exact AS (
          SELECT DISTINCT n.doc_id FROM newb n JOIN oldb o ON n.h = o.h
        ),
        near AS (
          SELECT DISTINCT a.doc AS doc_id
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          WHERE a.doc % 10 = 0 AND b.doc % 10 <> 0
        )
        SELECT n.doc_id,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'kept' END AS disposition
        FROM newb n
        LEFT JOIN exact e ON n.doc_id = e.doc_id
        LEFT JOIN near nr ON n.doc_id = nr.doc_id
    """


@query(
    "cross_snapshot_dedup",
    family="DEDUP,E2,J4",
    doc="Incremental corpus dedup: a NEW batch (doc_id % 10 = 0 slice) is "
    "checked against the EXISTING corpus — exact content-hash match first, "
    "then minhash band collision (4 hashes / 2 bands) for near-dups; each "
    "new doc gets kept / exact_dup / near_dup.  The asymmetric form of LSH "
    "dedup every snapshot-over-snapshot pipeline runs: both probes are "
    "bucketed equi-joins against the existing side, the new batch is the "
    "small relation, no cross product.",
    oracle=_xs_oracle(),
)
def cross_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_shingle_stream

    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 0
    newb = d.filter(is_new).select("doc_id", F.md5("text").alias("h"))
    oldb = d.filter(~is_new).select("doc_id", F.md5("text").alias("h"))
    exact = newb.join(oldb.select("h").distinct(), "h", "left_semi").select("doc_id")

    sh = char_shingle_stream(d, "doc_id", "text", 5)
    sig = (
        sh.groupBy("doc")
        .agg(*minhash_signature_aggs("s", _XS_HASHES, portable=True))
        .select("doc", *minhash_signature_longs(_XS_HASHES, portable=True))
    )
    rows_per_band = _XS_HASHES // _XS_BANDS
    band_structs = []
    for b in range(_XS_BANDS):
        cols = [F.col(f"mh{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    banded = sig.select("doc", F.explode(F.array(*band_structs)).alias("_b")).select(
        "doc", F.col("_b.band_idx").alias("band_idx"), F.col("_b.band_hash").alias("band_hash")
    ).localCheckpoint(eager=True)
    near = (
        banded.filter(F.col("doc") % 10 == 0)
        .join(
            banded.filter(F.col("doc") % 10 != 0).select("band_idx", "band_hash"),
            ["band_idx", "band_hash"],
            "left_semi",
        )
        .select(F.col("doc").alias("doc_id"))
        .distinct()
    )
    return (
        newb.select("doc_id")
        .join(exact.withColumn("_e", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("_n", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_e").isNotNull(), "exact_dup")
            .when(F.col("_n").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("disposition"),
        )
    )
