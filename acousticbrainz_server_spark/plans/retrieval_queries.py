"""Retrieval scoring queries: BM25 and hybrid (lexical + dense) rank fusion.

The retrieval half of a training-data / RAG pipeline, complementing the ANN
family: BM25 (Robertson et al.; the Lucene idf variant ln(1 + (N-df+0.5)/
(df+0.5))) as the lexical scorer, and Reciprocal Rank Fusion (Cormack et al.,
SIGIR 2009: score = Σ 1/(60+rank)) to merge a lexical ranking with an
embedding-cosine ranking — all public formulas, implemented as native
column expressions with DuckDB oracles.

Scale notes: term frequencies shuffle once on (doc, term); document
frequencies aggregate over the tiny query-term dimension after a broadcast
semi-join (the posting-list pruning a search engine does with an index —
only matching terms' rows survive the scan side).  The fusion step joins two
top-k lists (k rows each) — trivially broadcast at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.text import repartition_if_narrow, tokens
from ..sources.tables import load_table
from .registry import query

_K1, _B = 1.2, 0.75
_QUERY_TERMS = [
    (1, "spark"), (1, "query"),
    (2, "table"), (2, "scan"), (2, "fast"),
    (3, "stream"), (3, "window"),
]
_QT_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _QUERY_TERMS)
_RRF_K = 60
_DENSE_QUERY_VEC = 0  # vec_id whose embedding is the dense query
_TOPN = 50


def _tf_dl(d: DataFrame, terms: list[str]) -> tuple[DataFrame, DataFrame]:
    """(tf, dl) from ONE token explode and ONE shuffle.

    Non-query terms are masked to NULL before the (doc, term) aggregate, so
    the single grouped pass yields both the per-doc matched-term frequencies
    (rows with a term) and the total document length (sum of all counts per
    doc).  The previous shape ran the explode twice — once for dl, once
    semi-join-filtered for tf — doubling the scan+explode cost that
    dominates this query.  The masked literal IN stays in whole-stage
    codegen (the query-term set is a handful of literals; no join needed).
    """
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    masked = F.when(F.col("t").isin(terms), F.col("t"))
    g = (
        tok.groupBy("doc_id", masked.alias("t"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    dl = g.groupBy("doc_id").agg(F.sum("n").cast("long").alias("dl"))
    tf = g.filter(F.col("t").isNotNull()).select("doc_id", "t", F.col("n").alias("tf"))
    return tf, dl


@query(
    "bm25_retrieval",
    family="TXT,RETR,A2",
    doc="BM25 document scoring (Lucene idf variant) for a small query-term "
    "set: tf from one (doc, term) agg, df over the broadcast-semi-joined "
    "matching terms only, dl/avgdl from token counts; top-10 docs per query "
    "by the rounded score.  The scan-side term filter is the posting-list "
    "prune — non-matching tokens never shuffle.",
    oracle=f"""
        WITH qt(qid, term) AS (VALUES {_QT_VALUES}),
        tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, t, count(*) AS tf FROM tok
          WHERE t IN (SELECT DISTINCT term FROM qt)
          GROUP BY doc_id, t
        ),
        df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        scored AS (
          SELECT qt.qid, tf.doc_id,
                 sum(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf
          JOIN qt ON qt.term = tf.t
          JOIN df ON df.t = tf.t
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats
          GROUP BY qt.qid, tf.doc_id
        )
        SELECT qid, doc_id, bm25, CAST(rn AS INTEGER) AS rank FROM (
          SELECT qid, doc_id, {sql_round_half_up("score", 4)} AS bm25,
                 row_number() OVER (PARTITION BY qid ORDER BY {sql_round_half_up("score", 4)} DESC, doc_id) AS rn
          FROM scored
        ) WHERE rn <= 10
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = repartition_if_narrow(load_table(spark, sf_dir, "documents"))
    qt = spark.createDataFrame(_QUERY_TERMS, "qid INT, term STRING")
    tf, dl = _tf_dl(d, sorted({t for _, t in _QUERY_TERMS}))
    # corpus stats stay IN-PLAN as a broadcast 1-row dimension instead of a
    # driver collect: one job end-to-end, AQE pipelines the whole thing
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * F.col("tf") * (_K1 + 1) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qt.withColumnRenamed("term", "t")), "t")
        .join(F.broadcast(df_), "t")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("bm25", round_half_up(F.col("score"), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "doc_id", "bm25", F.col("rank").cast("int").alias("rank"))
    )


@query(
    "rrf_hybrid_search",
    family="RETR,V4,W3",
    doc="Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009): "
    "fuse the BM25 top-50 for query 1 with the embedding-cosine top-50 for "
    "a fixed dense query (vec_id 0) via score = Σ 1/(60+rank) over a full "
    "outer join of the two lists; top-10 ids by the fused score.  The fusion "
    "operates on two k-row rank lists — broadcast at any corpus size.",
    oracle=f"""
        WITH qt(qid, term) AS (VALUES {_QT_VALUES}),
        tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, t, count(*) AS tf FROM tok
          WHERE t IN (SELECT DISTINCT term FROM qt WHERE qid = 1)
          GROUP BY doc_id, t
        ),
        df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        bm AS (
          SELECT tf.doc_id,
                 sum(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({_K1} + 1)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
                 ) AS score
          FROM tf JOIN df ON df.t = tf.t JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
          GROUP BY tf.doc_id
        ),
        bmr AS (
          SELECT doc_id AS id,
                 row_number() OVER (ORDER BY {sql_round_half_up("score", 4)} DESC, doc_id) AS r
          FROM bm QUALIFY r <= {_TOPN}
        ),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        qv AS (SELECT v FROM v WHERE vec_id = {_DENSE_QUERY_VEC}),
        cos AS (
          SELECT a.vec_id AS id,
                 {sql_round_half_up("list_dot_product(a.v, qv.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(qv.v, qv.v)))", 4)} AS c
          FROM v a CROSS JOIN qv WHERE a.vec_id <> {_DENSE_QUERY_VEC}
        ),
        cosr AS (
          SELECT id, row_number() OVER (ORDER BY c DESC, id) AS r
          FROM cos QUALIFY r <= {_TOPN}
        ),
        fused AS (
          SELECT coalesce(bmr.id, cosr.id) AS id,
                 coalesce(1.0 / ({_RRF_K} + bmr.r), 0) + coalesce(1.0 / ({_RRF_K} + cosr.r), 0) AS s
          FROM bmr FULL OUTER JOIN cosr ON bmr.id = cosr.id
        )
        SELECT id, rrf_score, CAST(rn AS INTEGER) AS rank FROM (
          SELECT id, {sql_round_half_up("s", 6)} AS rrf_score,
                 row_number() OVER (ORDER BY {sql_round_half_up("s", 6)} DESC, id) AS rn
          FROM fused
        ) WHERE rn <= 10
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import cosine

    # lexical list: the BM25 pipeline restricted to query 1's terms,
    # ranked to the fusion depth
    d = repartition_if_narrow(load_table(spark, sf_dir, "documents"))
    tf, dl = _tf_dl(d, sorted({t for q, t in _QUERY_TERMS if q == 1}))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * F.col("tf") * (_K1 + 1) / (
        F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    bm_scored = (
        tf.join(F.broadcast(df_), "t")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    bmr = (
        # bounded-window: rank<=k filter right below — Catalyst rewrites this to
        # WindowGroupLimit (per-partition top-k before the final merge)
        bm_scored.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc(round_half_up(F.col("score"), 4)), F.asc("doc_id")))
        )
        .filter(F.col("r") <= _TOPN)
        .select(F.col("doc_id").alias("id"), F.col("r").alias("r_bm"))
    )

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = v.filter(F.col("vec_id") == _DENSE_QUERY_VEC).select(F.col("v").alias("qv"))
    cos = (
        v.filter(F.col("vec_id") != _DENSE_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", round_half_up(cosine(F.col("v"), F.col("qv")), 4).alias("c"))
    )
    cosr = (
        # bounded-window: rank<=k filter — WindowGroupLimit applies
        cos.withColumn("r", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("vec_id"))))
        .filter(F.col("r") <= _TOPN)
        .select(F.col("vec_id").alias("id"), F.col("r").alias("r_cos"))
    )
    fused = (
        bmr.join(cosr, "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_cos")), F.lit(0.0))
            ).alias("s"),
        )
    )
    # bounded-window: input is the union of two top-N lists (<= 2N rows), and
    # the rank<=10 filter below enables WindowGroupLimit anyway
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return (
        fused.withColumn("rrf_score", round_half_up(F.col("s"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("id", "rrf_score", F.col("rank").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------------------
# MMR — Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
# the diversity-aware post-retrieval stage a RAG pipeline puts between ANN
# shortlist and prompt assembly.  Greedy: pick argmax λ·rel(c) −
# (1−λ)·max_{s∈S} sim(c,s), k times.  The greedy loop is UNROLLED to k=3
# plain dataflow steps, so the whole query stays declarative in BOTH
# engines (no driver loop, no recursion) and the DuckDB oracle is exact.
# Scale shape: the O(n) relevance scan is the same brute-force gemm the
# ANN baseline uses (swap in ann_ivf_topk for the shortlist at corpus
# scale); everything after the per-query top-20 shortlist is k-row
# relations — broadcast joins and per-qid windows over ≤20 rows.
# Determinism: cosines round half-up to 4 BEFORE any comparison, every
# argmax tie-breaks on vec_id, and scores recompose from the rounded
# inputs identically in both engines.
# --------------------------------------------------------------------------------------
_MMR_QIDS = (10, 20, 30)
_MMR_SHORTLIST = 20
_MMR_LAMBDA = 0.7
# Diversity weight as its OWN literal, not computed 1 - λ: Spark's
# F.lit(1.0 - 0.7) is 0.30000000000000004 while the oracle's parsed "0.3"
# is a different double, and with 4-decimal-quantized rel/sim the score
# 0.7*rel - μ*sim can land exactly on the floor(x*1e4+0.5) boundary where
# one ulp flips the rounded score (and thus the greedy argmax).  Both
# engines must multiply by the IDENTICAL double: F.lit(_MMR_MU) on the
# Spark side, repr(_MMR_MU) in the oracle f-string.
_MMR_MU = 0.3


def _mmr_cos_sql(a: str, b: str) -> str:
    return sql_round_half_up(
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))",
        4,
    )


@query(
    "mmr_diversified_rerank",
    family="RETR,V6,W3",
    doc=f"MMR re-rank (λ={_MMR_LAMBDA}, k=3, shortlist {_MMR_SHORTLIST}) for "
    f"query vectors {_MMR_QIDS}: greedy diversity selection unrolled to "
    "three declarative steps; per-step scores from rounded cosines with "
    "vec_id tie-breaks.",
    oracle=f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id IN {_MMR_QIDS}),
        rel AS (
          SELECT q.qid, a.vec_id AS cid, {_mmr_cos_sql('a.v', 'q.qv')} AS rel
          FROM v a CROSS JOIN q WHERE a.vec_id <> q.qid
        ),
        shortlist AS (
          SELECT qid, cid, rel,
                 row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
          FROM rel QUALIFY rn <= {_MMR_SHORTLIST}
        ),
        sv AS (
          SELECT s.qid, s.cid, s.rel, v.v
          FROM shortlist s JOIN v ON v.vec_id = s.cid
        ),
        sims AS (
          SELECT a.qid, a.cid AS i, b.cid AS j, {_mmr_cos_sql('a.v', 'b.v')} AS sim
          FROM sv a JOIN sv b ON a.qid = b.qid AND a.cid <> b.cid
        ),
        s1 AS (
          SELECT qid, cid AS s1, {sql_round_half_up(f'{_MMR_LAMBDA} * rel', 4)} AS score1
          FROM shortlist WHERE rn = 1
        ),
        c2 AS (
          SELECT sl.qid, sl.cid,
                 {sql_round_half_up(
                     f'{_MMR_LAMBDA} * sl.rel - {_MMR_MU!r} * sm.sim', 4)} AS score,
                 row_number() OVER (PARTITION BY sl.qid ORDER BY
                     {sql_round_half_up(
                         f'{_MMR_LAMBDA} * sl.rel - {_MMR_MU!r} * sm.sim', 4)} DESC,
                     sl.cid) AS rn2
          FROM shortlist sl
          JOIN s1 ON s1.qid = sl.qid AND sl.cid <> s1.s1
          JOIN sims sm ON sm.qid = sl.qid AND sm.i = sl.cid AND sm.j = s1.s1
          QUALIFY rn2 = 1
        ),
        c3 AS (
          SELECT sl.qid, sl.cid,
                 {sql_round_half_up(
                     f'{_MMR_LAMBDA} * sl.rel - {_MMR_MU!r} * greatest(sm1.sim, sm2.sim)', 4)} AS score,
                 row_number() OVER (PARTITION BY sl.qid ORDER BY
                     {sql_round_half_up(
                         f'{_MMR_LAMBDA} * sl.rel - {_MMR_MU!r} * greatest(sm1.sim, sm2.sim)', 4)} DESC,
                     sl.cid) AS rn3
          FROM shortlist sl
          JOIN s1 ON s1.qid = sl.qid AND sl.cid <> s1.s1
          JOIN c2 ON c2.qid = sl.qid AND sl.cid <> c2.cid
          JOIN sims sm1 ON sm1.qid = sl.qid AND sm1.i = sl.cid AND sm1.j = s1.s1
          JOIN sims sm2 ON sm2.qid = sl.qid AND sm2.i = sl.cid AND sm2.j = c2.cid
          QUALIFY rn3 = 1
        )
        SELECT qid, step, vec_id, mmr_score FROM (
          SELECT qid, 1 AS step, s1 AS vec_id, score1 AS mmr_score FROM s1
          UNION ALL SELECT qid, 2, cid, score FROM c2
          UNION ALL SELECT qid, 3, cid, score FROM c3
        ) ORDER BY qid, step
    """,
)
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import cosine

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = v.filter(F.col("vec_id").isin(*_MMR_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    lam, mu = F.lit(_MMR_LAMBDA), F.lit(_MMR_MU)

    # relevance scan: brute-force cosine vs the 3 broadcast query vectors —
    # the ANN baseline shape (swap in the IVF shortlist at corpus scale)
    rel = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), round_half_up(cosine(F.col("v"), F.col("qv")), 4).alias("rel"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    shortlist = rel.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= _MMR_SHORTLIST
    )

    sv = shortlist.join(v, shortlist.cid == v.vec_id).select("qid", "cid", "rel", "v")
    a, b = sv.alias("a"), sv.alias("b")
    sims = (
        a.join(b, (F.col("a.qid") == F.col("b.qid")) & (F.col("a.cid") != F.col("b.cid")))
        .select(
            F.col("a.qid").alias("qid"),
            F.col("a.cid").alias("i"),
            F.col("b.cid").alias("j"),
            round_half_up(cosine(F.col("a.v"), F.col("b.v")), 4).alias("sim"),
        )
    )

    s1 = shortlist.filter(F.col("rn") == 1).select(
        "qid", F.col("cid").alias("s1"), round_half_up(lam * F.col("rel"), 4).alias("score1")
    )

    def _argmax(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
        return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    c2 = _argmax(
        shortlist.join(F.broadcast(s1), "qid")
        .filter(F.col("cid") != F.col("s1"))
        .join(
            F.broadcast(sims.withColumnRenamed("i", "cid").withColumnRenamed("j", "s1")),
            ["qid", "cid", "s1"],
        )
        .select("qid", "cid", round_half_up(lam * F.col("rel") - mu * F.col("sim"), 4).alias("score"))
    ).select("qid", F.col("cid").alias("s2"), F.col("score").alias("score2"))

    sims_i = sims.withColumnRenamed("i", "cid")
    c3 = _argmax(
        shortlist.join(F.broadcast(s1), "qid")
        .join(F.broadcast(c2), "qid")
        .filter((F.col("cid") != F.col("s1")) & (F.col("cid") != F.col("s2")))
        .join(
            F.broadcast(sims_i.withColumnRenamed("j", "s1").withColumnRenamed("sim", "sim1")),
            ["qid", "cid", "s1"],
        )
        .join(
            F.broadcast(sims_i.withColumnRenamed("j", "s2").withColumnRenamed("sim", "sim2")),
            ["qid", "cid", "s2"],
        )
        .select(
            "qid",
            "cid",
            round_half_up(
                lam * F.col("rel") - mu * F.greatest(F.col("sim1"), F.col("sim2")), 4
            ).alias("score"),
        )
    ).select("qid", F.col("cid").alias("s3"), F.col("score").alias("score3"))

    out = (
        s1.select("qid", F.lit(1).alias("step"), F.col("s1").alias("vec_id"), F.col("score1").alias("mmr_score"))
        .unionByName(
            c2.select("qid", F.lit(2).alias("step"), F.col("s2").alias("vec_id"), F.col("score2").alias("mmr_score"))
        )
        .unionByName(
            c3.select("qid", F.lit(3).alias("step"), F.col("s3").alias("vec_id"), F.col("score3").alias("mmr_score"))
        )
    )
    return out.orderBy("qid", "step")
