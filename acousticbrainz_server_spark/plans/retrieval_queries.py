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


def _term_count(toks, term: str):
    """Occurrences of one literal term in the token array — a codegen array
    scan, no explode, no shuffle."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def _postings(d: DataFrame, qterms: list[tuple[int, str]]) -> tuple[DataFrame, DataFrame]:
    """(tf, stats) with ZERO token-level shuffles.

    The query-term set is a plan-time literal, so per-term frequencies are
    per-doc array expressions (``size(filter(tokens, = term))``) in the one
    scan projection — no token ever leaves its scan task.  ``stats`` folds
    the corpus aggregates (n_docs, avgdl) AND every per-term document
    frequency (``sum(tf_i > 0)``) into a single map-side-combined 1-row
    aggregate, so idf needs no per-term join: tf rows pick their df out of
    the broadcast stats row by term index.  ``tf`` is the matched postings
    in long form (doc_id, dl, qid, i, tf>0) via ``stack`` — the only rows
    that reach any downstream shuffle.  Replaces the previous
    explode+(doc,term)-agg shape, whose all-token hash aggregate was the
    measured linear-cost driver (sf1 curve 4.0x its oracle; this shape
    measures ~1x and wins at sf1).
    """
    toks = tokens(F.col("text"))
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_term_count(toks, t).alias(f"tf_{i}") for i, (_, t) in enumerate(qterms)],
    ).localCheckpoint(eager=False)
    stats = base.agg(
        # count("dl"), not count(*): a NULL-text doc has dl NULL (size of a
        # NULL token array) and must not count toward n_docs — the oracle's
        # dl CTE derives from unnest, which emits no row for such docs.
        F.count("dl").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(qterms))
        ],
    )
    stack_expr = "stack({n}, {args}) as (qid, t, i, tf)".format(
        n=len(qterms),
        args=", ".join(f"{q}, '{t}', {i}, tf_{i}" for i, (q, t) in enumerate(qterms)),
    )
    tf = base.selectExpr("doc_id", "dl", stack_expr).filter(F.col("tf") > 0)
    return tf, stats


def _bm25_term_score(n_terms: int):
    """Per-posting BM25 contribution; df resolved from the broadcast stats
    row by the posting's term index (a tiny literal CASE)."""
    df_col = F.coalesce(
        *[F.when(F.col("i") == i, F.col(f"df_{i}")) for i in range(n_terms)]
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - df_col + 0.5) / (df_col + 0.5))
    return (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )


@query(
    "bm25_retrieval",
    family="TXT,RETR,A2",
    doc="BM25 document scoring (Lucene idf variant) for a small query-term "
    "set: per-term tf as codegen array expressions in the scan projection "
    "(no token explode), corpus stats AND per-term df folded into one "
    "broadcast 1-row aggregate, matched postings stacked long; top-10 docs "
    "per query by the rounded score.  The scan-side term count is the "
    "posting-list prune — no token ever leaves its scan task.",
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
    tf, stats = _postings(d, _QUERY_TERMS)
    # corpus stats + per-term df stay IN-PLAN as ONE broadcast 1-row
    # dimension instead of a driver collect or per-term join
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(_bm25_term_score(len(_QUERY_TERMS))).alias("score"))
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
    q1_terms = [(q, t) for q, t in _QUERY_TERMS if q == 1]
    tf, stats = _postings(d, q1_terms)
    bm_scored = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(_bm25_term_score(len(q1_terms))).alias("score"))
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
    # shortlist feeds FIVE consumers (sv, s1, and the c2/c3 candidate sets)
    # and sims three; without materialization each reference re-runs the
    # brute-force cosine scan + rank window (r12: the executed plan carried
    # 94 Exchanges).  Both relations are O(queries x shortlist) rows —
    # materialize once, lazily (the first consumer's action fills them).
    shortlist = (
        rel.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MMR_SHORTLIST)
        .localCheckpoint(eager=False)
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
        .localCheckpoint(eager=False)
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
