"""Deduplication queries (exact, n-gram Jaccard, MinHash/LSH, SimHash,
embedding-cosine) over the ``documents`` / ``embeddings`` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.exact import dedup_exact
from ..dedup.minhash import minhash_neardup_pairs
from ..dedup.ngram import ngram_jaccard_pairs
from ..dedup.simhash import N_BITS, simhash
from ..functions.scalar import round_half_up, sql_round_half_up
from ..functions.text import sql_minhash_exprs
from ..functions.vector import cosine
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------------------
# E2/F1 — exact content dedup by sha256
# --------------------------------------------------------------------------------------
@query(
    "content_hash_dedup",
    family="E2,F1,A10",
    doc="Exact dedup groups by sha256(content) — the reference's data_sha256 "
    "UNIQUE ingest probe (db/data.py:250-257) as a hash groupBy.",
    oracle="""
        SELECT sha256(text) AS content_sha256,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY sha256(text)
    """,
)
def content_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup_exact(d, "text", "doc_id")


# --------------------------------------------------------------------------------------
# E3/E8 — content-addressed upsert (MERGE form: anti-join + union)
# --------------------------------------------------------------------------------------
@query(
    "content_upsert",
    family="E3,E8,V7",
    doc="UPSERT / INSERT..ON CONFLICT DO UPDATE semantics (insert_version "
    "db/data.py:187-208, eval-results store db/similarity.py:456-543) as the "
    "warehouse MERGE form: incoming rows replace same-key existing rows via "
    "anti-join + union — the Delta MERGE equivalent used by every "
    "content-addressed table in the engine.",
    oracle="""
        WITH existing AS (SELECT doc_id, 'old' AS src FROM documents WHERE doc_id < 250),
        incoming AS (SELECT doc_id, 'new' AS src FROM documents WHERE doc_id >= 200)
        SELECT doc_id, src FROM existing WHERE doc_id NOT IN (SELECT doc_id FROM incoming)
        UNION ALL
        SELECT doc_id, src FROM incoming
    """,
)
def content_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.jobs import upsert_eval_results

    d = load_table(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") < 250).select("doc_id", F.lit("old").alias("src"))
    incoming = d.filter(F.col("doc_id") >= 200).select("doc_id", F.lit("new").alias("src"))
    return upsert_eval_results(existing, incoming, ["doc_id"])


# --------------------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact baseline for MinHash)
# --------------------------------------------------------------------------------------
@query(
    "ngram_jaccard_neardup",
    family="DEDUP",
    doc="Exact word-bigram Jaccard near-dup pairs (threshold 0.4) — the exact "
    "baseline the MinHash/LSH path approximates.",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        big AS (
          SELECT DISTINCT doc_id, toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1] AS s
          FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok)
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM big GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM big a JOIN big b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, {sql_round_half_up('n_inter * 1.0 / (sa.n + sb.n - n_inter)', 4)} AS jaccard
        FROM inter
        JOIN sz sa ON inter.doc_a = sa.doc_id
        JOIN sz sb ON inter.doc_b = sb.doc_id
        WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.4
    """,
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.4)
    return pairs.select("doc_a", "doc_b", round_half_up(F.col("jaccard"), 4).alias("jaccard"))


# --------------------------------------------------------------------------------------
# SimHash fingerprint (md5-derived 32-bit; oracle generated programmatically)
# --------------------------------------------------------------------------------------
def _simhash_oracle(where: str = "") -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(N_BITS)
    )
    fingerprint = " + ".join(f"(CASE WHEN b{b} > 0 THEN 1 ELSE 0 END) * {1 << b}" for b in range(N_BITS))
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM documents {where}
        ),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS h FROM tok),
        bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({fingerprint} AS BIGINT) AS simhash FROM bits
    """


@query(
    "simhash_fingerprint",
    family="DEDUP",
    doc="32-bit SimHash per document from md5-derived token hashes "
    "(engine-portable); near-dup = small Hamming distance.",
    oracle=_simhash_oracle(),
)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, portable=True).select(F.col("doc").alias("doc_id"), "simhash")


# --------------------------------------------------------------------------------------
# SimHash near-dup pairs: banded byte join, lossless for hamming<=3 (pigeonhole),
# so the oracle is the bandless all-pairs sweep — proving the banding exact.
# --------------------------------------------------------------------------------------
@query(
    "simhash_neardup",
    family="DEDUP",
    doc="All document pairs within Hamming distance 3 of each other's 32-bit "
    "SimHash, found via the 4-byte band-bucket join (pigeonhole: hamming<=3 "
    "implies >=1 equal byte, so banding loses nothing). The oracle computes "
    "the same set with a bandless all-pairs scan.",
    oracle=f"""
        WITH f AS ({_simhash_oracle()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.simhash import simhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    # int64 on both engines: DuckDB bit_count yields TINYINT, which is not a
    # type Spark produces — the external gate hashes dtype-sensitively.
    return simhash_neardup_pairs(d, max_hamming=3, portable=True).withColumn("hamming", F.col("hamming").cast("long"))


# --------------------------------------------------------------------------------------
# Embedding-cosine near-dup (brute force; LSH path exercised in tests)
# --------------------------------------------------------------------------------------
@query(
    "embedding_neardup",
    family="DEDUP,V5",
    doc="Embedding near-dup sweep: all pairs with cosine >= 0.3 over the "
    "vec_id<100 slice (rounded before thresholding for cross-engine parity).",
    oracle=f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 100)
        SELECT id_a, id_b, cosine_sim FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 {sql_round_half_up('list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))', 4)} AS cosine_sim
          FROM v a, v b WHERE a.vec_id < b.vec_id
        ) WHERE cosine_sim >= 0.3
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        # the vec_id<100 slice is a bounded 100-row relation
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", round_half_up(cosine(F.col("va"), F.col("vb")), 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.3)
    )


# --------------------------------------------------------------------------------------
# Near-dup CLUSTERS: connected components over the hamming<=3 simhash graph.
# Iterative min-label propagation on Spark; transitive-closure recursive CTE in
# DuckDB — the hash match proves the distributed fixpoint exact.
# --------------------------------------------------------------------------------------
@query(
    "neardup_cluster_assign",
    family="DEDUP",
    doc="Every document labelled with its near-dup cluster: connected "
    "components (iterative min-label propagation, driver-checked fixpoint) "
    "over the SimHash hamming<=3 pair graph, plus cluster size. Keeping "
    "doc_id == cluster_id rows is the canonical-per-cluster dedup policy — "
    "the transitive extension of the reference's exact content dedup "
    "(db/data.py:250-262).",
    oracle=f"""
        WITH RECURSIVE
        f AS ({_simhash_oracle()}),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM f a JOIN f b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ),
        e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
        r AS (
          SELECT doc_id AS v, doc_id AS lbl FROM documents
          UNION
          SELECT e.b AS v, r.lbl FROM r JOIN e ON e.a = r.v WHERE r.lbl < e.b
        ),
        comp AS (SELECT v AS doc_id, min(lbl) AS cluster_id FROM r GROUP BY v),
        sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
        FROM comp JOIN sizes USING (cluster_id)
    """,
)
def neardup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.components import neardup_clusters
    from ..dedup.simhash import simhash_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    # raw (multiplicity ~1.8x) pairs, deduped INSIDE the component loop's own
    # repartition("a") exchange (dedupe_edges=True — hash(a) satisfies the
    # (a,b) clustering, so the distinct is in-place).  The real r13 win is in
    # connected_components' symmetrization: explode of both orientations runs
    # the banding-join pipeline ONCE, where the r12 union re-executed the
    # whole post-exchange join+filter+dedup per branch (plan pair:
    # plans/r13/neardup_pairs_sym_{before,after}.txt, 24 -> 14 plan nodes;
    # interleaved A/B min 7.56 -> 7.06 s, new shape won 4/5 trials)
    pairs = simhash_neardup_pairs(d, max_hamming=3, portable=True, dedupe=False)
    return neardup_clusters(d, pairs, id_col="doc_id", dedupe_edges=True)


# --------------------------------------------------------------------------------------
# MinHash + LSH near-dup pipeline — fully oracle-gated: the md5 hash family is
# engine-portable, and the band-bucket join is plain SQL (4 band selects +
# self-join), so DuckDB reproduces the ENTIRE pipeline including the bucket cap.
# --------------------------------------------------------------------------------------
def _minhash_lsh_oracle(n_hashes: int = 8, n_bands: int = 4, max_bucket: int = 1000) -> str:
    from ..functions.text import sql_minhash_exprs

    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        bands.append(f"SELECT doc, {b} AS band_idx, md5({cols}) AS band_hash FROM sig")
    agree = " + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(n_hashes))
    return f"""
        WITH sh AS (
          SELECT doc_id AS doc, substr(text, CAST(i AS INTEGER), 5) AS s
          FROM (SELECT doc_id, text,
                       unnest(range(1, greatest(len(text) - 4, 1) + 1)) AS i
                FROM documents)
        ),
        sig AS (SELECT doc, {", ".join(sql_minhash_exprs("s", n_hashes))} FROM sh GROUP BY doc),
        banded AS ({" UNION ALL ".join(bands)}),
        ok AS (SELECT band_idx, band_hash FROM banded GROUP BY 1, 2 HAVING count(*) <= {max_bucket}),
        bb AS (SELECT banded.* FROM banded JOIN ok USING (band_idx, band_hash)),
        cand AS (
          SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
          FROM bb a JOIN bb b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
        ),
        est AS (
          SELECT c.doc_a, c.doc_b, ({agree}) / {float(n_hashes)} AS ej
          FROM cand c
          JOIN sig sa ON sa.doc = c.doc_a
          JOIN sig sb ON sb.doc = c.doc_b
        )
        SELECT doc_a, doc_b, {sql_round_half_up("ej", 4)} AS est_jaccard
        FROM est WHERE ej >= 0.5
    """


@query(
    "minhash_lsh_neardup",
    family="DEDUP",
    doc="Full MinHash(8)+LSH(4 bands) near-dup candidate pipeline with "
    "signature-agreement estimate and bucket-size cap.  The md5 hash family "
    "is engine-portable, so the DuckDB oracle reproduces the whole pipeline — "
    "shingles, signatures, banding join, cap, estimate — exactly.",
    oracle=_minhash_lsh_oracle(),
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(d, n_hashes=8, n_bands=4, portable=True)
    return pairs.filter(F.col("est_jaccard") >= 0.5).select(
        "doc_a", "doc_b", round_half_up(F.col("est_jaccard"), 4).alias("est_jaccard")
    )


# --------------------------------------------------------------------------------------
# DEDUP — exact set-similarity join with prefix filtering (PPJoin-style)
# --------------------------------------------------------------------------------------

_PFX_T_NUM, _PFX_T_DEN = 6, 10  # Jaccard threshold 0.6 as an exact rational


@query(
    "prefix_filter_jaccard",
    family="DEDUP",
    doc="EXACT shingle-set Jaccard join (word 3-grams, threshold 0.6) with "
    "prefix filtering (Chaudhuri et al. 2006 / PPJoin): shingles are "
    "canonically ordered rarest-first by (document-frequency, shingle) — "
    "no global index assignment, the (df, shingle) struct sort IS the "
    "order — and only the first n - ceil(t*n) + 1 shingles of each set "
    "are exploded as join keys.  Two sets meeting the threshold must "
    "share a prefix shingle (pigeonhole), so the candidate join is "
    "lossless while the explode carries ~(1-t) of each set; exact "
    "intersection verification runs only on surviving candidates.  The "
    "threshold test is integer-exact (10*i >= 6*u), never float.  The "
    "oracle brute-forces all pairs, so any pruning bug surfaces as a "
    "hash mismatch.",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
        ),
        -- docs with fewer than 3 tokens have no 3-gram shingle: excluded
        -- EXPLICITLY on both sides (Spark's concat_ws would skip missing
        -- tokens and emit a short shingle; SQL's || yields NULL — filtering
        -- len >= 3 makes the two engines identical by construction)
        sh AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS s
          FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 1, 2))) AS i
                FROM tok WHERE len(toks) >= 3)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        -- lossless candidates: any qualifying pair shares >= 1 shingle, and
        -- the equi-join's per-pair row count IS the intersection size
        -- (independent of the engine's prefix-pruned plan)
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_sz
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT doc_a, doc_b, inter_sz, sa.n + sb.n - inter_sz AS union_sz
          FROM inter JOIN sizes sa ON sa.doc_id = inter.doc_a
                     JOIN sizes sb ON sb.doc_id = inter.doc_b
        )
        SELECT doc_a, doc_b, inter_sz, union_sz,
               {sql_round_half_up('inter_sz * 1.0 / union_sz', 6)} AS jaccard
        FROM pairs
        WHERE {_PFX_T_DEN} * inter_sz >= {_PFX_T_NUM} * union_sz
    """,
)
def prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import repartition_if_narrow, word_ngrams

    # fan a narrow (single-split) source out BEFORE the shingle explode —
    # the whole scan-side build otherwise runs on one core (the 5.5s-serial
    # stage the sf1 profile exposed; see SCALE.md round-7)
    d = repartition_if_narrow(load_table(spark, sf_dir, "documents"))

    # word 3-gram shingles, deduped INSIDE the row (word_ngrams) — no
    # distinct shuffle; <3-token docs yield an empty shingle array and fall
    # out exactly as the oracle's explicit size filter drops them.
    # Shingles are IMMEDIATELY hashed to 64-bit longs: every downstream
    # shuffle/sort/intersect then moves 8-byte keys instead of ~30-byte
    # strings (measured 7.4s -> ~2s warm at sf0.1).  Correctness: the
    # prefix-filter theorem needs only SOME canonical total order, and
    # (df, hash) is one; a 64-bit collision merging two shingles has
    # probability ~1e-8 at this vocabulary and WOULD surface as a value
    # mismatch against the string-exact brute-force oracle — the gate
    # covers the risk it introduces.
    ex = d.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 3)).alias("s_str")
    ).select("doc_id", F.xxhash64("s_str").alias("s"))
    # ONE shuffle on s builds the inverted index AND the document frequency
    # together (collect_list + count share the aggregate); re-exploding the
    # posting list hands every (doc, s) its df without the separate
    # dfreq-join the round-5 plan paid — and the narrow shingle build runs
    # exactly once (measured 3.8s -> 2.3s warm at sf0.1)
    inv = ex.groupBy("s").agg(
        F.collect_list("doc_id").alias("docs"), F.count(F.lit(1)).alias("df")
    )
    withdf = inv.select("s", "df", F.explode("docs").alias("doc_id"))
    # rarest-first canonical order: lexicographic (df, hash) struct sort
    sets = (
        withdf.groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").alias(
                "shingles"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        # prefix length n - ceil(t*n) + 1, integer-exact ceil
        .withColumn(
            "prefix",
            F.expr(
                f"slice(shingles, 1, CAST(n - ((({_PFX_T_NUM} * n) + {_PFX_T_DEN - 1}) "
                f"DIV {_PFX_T_DEN}) + 1 AS INT))"
            ),
        )
    )
    # NO checkpoint barrier: `sets` fans out to the prefix self-join and both
    # verify sides, but all three consume the SAME groupBy exchange, so the
    # exchange-reuse machinery materializes it once — and, unlike a
    # localCheckpoint leaf (unknown stats => forced sort-merge), the live
    # shuffle lets AQE see ~2.5 MB runtime sizes and turn every downstream
    # join into a broadcast at this SF while keeping SMJ at cluster scale.
    # Measured 3.95s -> 2.6s warm at sf0.1.
    # PPJoin candidate join with the FULL filter suite (Xiao et al. 2011):
    # prefix overlap (the join itself) + length filter + positional filter,
    # all integer-exact so no float boundary can differ cross-engine.
    # Derivations from J >= num/den  ⇔  (den+num)·I >= num·(na+nb):
    #   length:      I <= min(na,nb)  ⇒ (den+num)·min(na,nb) >= num·(na+nb)
    #   positional:  both shingle arrays share one global (df, hash) order,
    #     so a match at 0-based positions (pa, pb) bounds
    #     I <= min(pa,pb) + 1 + min(na-pa-1, nb-pb-1); every matching row of
    #     a truly-qualifying pair satisfies the bound, so row-filtering
    #     before the pair distinct is lossless.
    # At sf0.1 (uniform ~50-shingle docs) they prune ~35% of matched rows;
    # on real corpora with skewed doc lengths the length filter is the
    # workhorse — both are O(1) per matched row, so they never cost.
    pfx = sets.select("doc_id", "n", F.posexplode("prefix").alias("p", "s"))
    s_tot = F.col("a.n") + F.col("b.n")
    ub_pos = (
        F.least(F.col("a.p"), F.col("b.p"))
        + F.lit(1)
        + F.least(F.col("a.n") - F.col("a.p"), F.col("b.n") - F.col("b.p"))
        - F.lit(1)
    )
    cand = (
        pfx.alias("a")
        .join(pfx.alias("b"), "s")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(_PFX_T_DEN + _PFX_T_NUM) * F.least(F.col("a.n"), F.col("b.n"))
               >= F.lit(_PFX_T_NUM) * s_tot)
            & (F.lit(_PFX_T_DEN + _PFX_T_NUM) * ub_pos >= F.lit(_PFX_T_NUM) * s_tot)
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    # No pair-distinct here: a pair sharing k prefix shingles reaches the
    # verify step k times (k is tiny — bounded by the prefix length), and the
    # duplicate verified rows are identical, so ONE distinct over the final
    # ~hundreds-of-rows result replaces a 200k-row pair shuffle.
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ta"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("tb"), F.col("n").alias("nb"))
    v = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter_sz", F.size(F.array_intersect("ta", "tb")).cast("long"))
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter_sz"))
        .filter(F.lit(_PFX_T_DEN) * F.col("inter_sz") >= F.lit(_PFX_T_NUM) * F.col("union_sz"))
    )
    return v.select(
        "doc_a",
        "doc_b",
        "inter_sz",
        "union_sz",
        round_half_up(F.col("inter_sz") / F.col("union_sz"), 6).alias("jaccard"),
    ).distinct()


# --------------------------------------------------------------------------------------
# DEDUP — sketch-quality evaluation: MinHash+LSH precision/recall vs exact Jaccard
# --------------------------------------------------------------------------------------
_MH_EVAL_MOD = 3  # evaluation universe: doc_id % 3 == 0 (exact truth stays tractable)
_MH_EVAL_T = 0.5


@query(
    "minhash_recall_eval",
    family="DEDUP,EVAL",
    doc="Index-quality evaluation for the dedup sketch (the ivf_recall_eval "
    "pattern applied to MinHash): over a 1-in-3 document sample, the exact "
    f"char-5-gram Jaccard >= {_MH_EVAL_T} pair set is the ground truth, the "
    "MinHash(8)+LSH(4-band) pipeline's est >= 0.5 candidates are the "
    "prediction, and the single-row report carries n_true / n_predicted / "
    "n_hit with precision and recall — the acceptance gate a production "
    "dedup rollout reads before swapping exact for sketched.  Scale: truth "
    "computes by inverted-index intersection (never all-pairs) on the "
    "SAMPLE — exactly how a 100 TB rollout evaluates its sketch on a slice "
    "it can afford to ground-truth.",
    oracle=f"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % {_MH_EVAL_MOD} = 0),
        sh AS (
          SELECT DISTINCT doc_id AS doc, substr(text, CAST(i AS INTEGER), 5) AS s
          FROM (SELECT doc_id, text,
                       unnest(range(1, greatest(len(text) - 4, 1) + 1)) AS i FROM d)
        ),
        sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY doc),
        inter AS (
          SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS ni
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b
          FROM inter JOIN sz sa ON sa.doc = doc_a JOIN sz sb ON sb.doc = doc_b
          WHERE ni * 1.0 / (sa.n + sb.n - ni) >= {_MH_EVAL_T}
        ),
        sig AS (
          SELECT doc, {", ".join(sql_minhash_exprs("s", 8))} FROM sh GROUP BY doc
        ),
        banded AS (
          {" UNION ALL ".join(
              "SELECT doc, %d AS band_idx, md5(%s) AS band_hash FROM sig"
              % (b, " || '|' || ".join(f"CAST(mh{b * 2 + r} AS VARCHAR)" for r in range(2)))
              for b in range(4)
          )}
        ),
        ok AS (SELECT band_idx, band_hash FROM banded GROUP BY 1, 2 HAVING count(*) <= 1000),
        bb AS (SELECT banded.* FROM banded JOIN ok USING (band_idx, band_hash)),
        cand0 AS (
          SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
          FROM bb a JOIN bb b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc < b.doc
        ),
        cand AS (
          SELECT c.doc_a, c.doc_b
          FROM cand0 c JOIN sig sa ON sa.doc = c.doc_a JOIN sig sb ON sb.doc = c.doc_b
          WHERE ({" + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(8))}) / 8.0 >= 0.5
        ),
        hit AS (SELECT count(*) AS n_hit FROM truth JOIN cand USING (doc_a, doc_b)),
        agg AS (
          SELECT (SELECT count(*) FROM truth) AS n_true,
                 (SELECT count(*) FROM cand) AS n_pred,
                 (SELECT n_hit FROM hit) AS n_hit
        )
        SELECT CAST(n_true AS BIGINT) AS n_true,
               CAST(n_pred AS BIGINT) AS n_pred,
               CAST(n_hit AS BIGINT) AS n_hit,
               floor(n_hit * 1.0 / nullif(n_pred, 0) * 10000 + 0.5) / 10000 AS precision,
               floor(n_hit * 1.0 / nullif(n_true, 0) * 10000 + 0.5) / 10000 AS recall
        FROM agg
    """,
)
def minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.minhash import minhash_neardup_pairs

    from ..functions.text import repartition_if_narrow

    d = repartition_if_narrow(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % _MH_EVAL_MOD == 0)
    )
    # exact truth: distinct char-5-gram shingles, inverted-index intersection;
    # hashed to longs and materialized ONCE — sizes and both join sides
    # consume it, and char shingles are ~65x denser than word shingles
    sh = (
        d.select(
            F.col("doc_id").alias("doc"),
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(length(text) - 4, 1)), "
                        "i -> substring(text, i, 5))"
                    )
                )
            ).alias("s"),
        )
        .select("doc", F.xxhash64("s").alias("s"))
        .localCheckpoint(eager=False)
    )
    sz = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc").alias("doc_a"), "s")
    b = sh.select(F.col("doc").alias("doc_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    truth = (
        inter.join(sz.select(F.col("doc").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            F.col("ni") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("ni"))
            >= _MH_EVAL_T
        )
        .select("doc_a", "doc_b")
    )
    cand = (
        minhash_neardup_pairs(d, n_hashes=8, n_bands=4, portable=True)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = cand.agg(F.count(F.lit(1)).alias("n_pred"))
    n_hit = truth.join(cand, ["doc_a", "doc_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_true.crossJoin(F.broadcast(n_pred))
        .crossJoin(F.broadcast(n_hit))
        .select(
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("n_hit").cast("long").alias("n_hit"),
            round_half_up(
                F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_pred"), F.lit(0)), 4
            ).alias("precision"),
            round_half_up(
                F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_true"), F.lit(0)), 4
            ).alias("recall"),
        )
    )


# --------------------------------------------------------------------------------------
# DEDUP — sketch-quality evaluation: SimHash hamming<=3 precision/recall vs exact
# token-set Jaccard ground truth (closes the eval loop for the SECOND fingerprint
# family, the minhash_recall_eval pattern).
# --------------------------------------------------------------------------------------
_SH_EVAL_MOD = 3  # evaluation universe: doc_id % 3 == 0
_SH_EVAL_T_NUM, _SH_EVAL_T_DEN = 9, 10  # truth: token-set Jaccard >= 0.9, exact rational
_SH_EVAL_H = 3  # prediction: banded simhash pairs at hamming <= 3


@query(
    "simhash_recall_eval",
    family="DEDUP,EVAL",
    doc="Index-quality evaluation for the SimHash fingerprint (the "
    "minhash_recall_eval pattern applied to the second sketch family): over "
    "a 1-in-3 document sample, exact word-token-set Jaccard >= 0.9 pairs "
    "are the ground truth, the production banded SimHash pipeline's "
    f"hamming <= {_SH_EVAL_H} pairs are the prediction, and the single-row "
    "report carries n_true / n_pred / n_hit with precision and recall.  "
    "On this corpus the report shows WHY the MinHash path is the "
    "production near-dup choice: a 32-bit SimHash at hamming <= 3 is a "
    "high-precision/low-recall detector against set-overlap truth (it "
    "responds to token-frequency cosine, not set Jaccard) — the honest "
    "number a rollout reads before picking its sketch.  Scale: truth by "
    "inverted-index intersection on the affordable sample (never "
    "all-pairs over the corpus); the prediction side reuses the unchanged "
    "banded production pipeline.  The threshold test is integer-exact "
    "(10*i >= 9*u), never float.",
    oracle=f"""
        WITH f AS ({_simhash_oracle(f"WHERE doc_id % {_SH_EVAL_MOD} = 0")}),
        d AS (SELECT doc_id, text FROM documents WHERE doc_id % {_SH_EVAL_MOD} = 0),
        tokd AS (
          SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM d
        ),
        sz AS (SELECT doc_id, count(*) AS n FROM tokd GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
          FROM tokd a JOIN tokd b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b
          FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
          WHERE {_SH_EVAL_T_DEN} * ni >= {_SH_EVAL_T_NUM} * (sa.n + sb.n - ni)
        ),
        pred AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM f a JOIN f b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SH_EVAL_H}
        ),
        agg AS (
          SELECT (SELECT count(*) FROM truth) AS n_true,
                 (SELECT count(*) FROM pred) AS n_pred,
                 (SELECT count(*) FROM truth JOIN pred USING (doc_a, doc_b)) AS n_hit
        )
        SELECT CAST(n_true AS BIGINT) AS n_true,
               CAST(n_pred AS BIGINT) AS n_pred,
               CAST(n_hit AS BIGINT) AS n_hit,
               floor(n_hit * 1.0 / nullif(n_pred, 0) * 10000 + 0.5) / 10000 AS precision,
               floor(n_hit * 1.0 / nullif(n_true, 0) * 10000 + 0.5) / 10000 AS recall
        FROM agg
    """,
)
def simhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.simhash import simhash_neardup_pairs
    from ..functions.text import repartition_if_narrow

    d = repartition_if_narrow(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % _SH_EVAL_MOD == 0)
    )
    # exact truth: distinct word tokens hashed to longs, inverted-index
    # intersection — the same affordable-slice shape minhash_recall_eval
    # documents; integer-exact threshold so no float boundary differs
    tok = d.select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("t"),
    ).select("doc", F.xxhash64("t").alias("t"))
    sz = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tok.select(F.col("doc").alias("doc_a"), "t")
        .join(tok.select(F.col("doc").alias("doc_b"), "t"), "t")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    truth = (
        inter.join(sz.select(F.col("doc").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(
            F.lit(_SH_EVAL_T_DEN) * F.col("ni")
            >= F.lit(_SH_EVAL_T_NUM) * (F.col("na") + F.col("nb") - F.col("ni"))
        )
        .select("doc_a", "doc_b")
    )
    pred = simhash_neardup_pairs(d, max_hamming=_SH_EVAL_H, portable=True).select(
        "doc_a", "doc_b"
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    n_hit = truth.join(pred, ["doc_a", "doc_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_true.crossJoin(F.broadcast(n_pred))
        .crossJoin(F.broadcast(n_hit))
        .select(
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_pred").cast("long").alias("n_pred"),
            F.col("n_hit").cast("long").alias("n_hit"),
            round_half_up(
                F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_pred"), F.lit(0)), 4
            ).alias("precision"),
            round_half_up(
                F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_true"), F.lit(0)), 4
            ).alias("recall"),
        )
    )


# --------------------------------------------------------------------------------------
# CDC — content-defined chunking dedup (the Rabin/FastCDC family: LBFS,
# Muthitacharoen et al. SOSP'01; FastCDC, Xia et al. ATC'16).  Chunk
# boundaries are picked by CONTENT (a rolling window hash hitting a
# divisor), not by offset, so an insertion near the top of a document
# shifts every byte yet leaves all downstream chunk hashes intact — the
# property fixed-size blocks lack and the reason storage dedup and
# incremental corpus sync use CDC.  Here: an 8-char polynomial window
# hash, boundary when h % DIV == 0, chunks hashed with md5 and counted
# corpus-wide; the report is per-source chunk-level duplication.
# Scale shape: boundary positions are computed per doc in ONE O(L)
# expression (char-code array bound as a lambda variable, 8 O(1) lookups
# per position) and exploded off the scan; chunk reassembly is a
# per-doc window (partitioned by doc_id); the only corpus-wide shuffle
# is the chunk-hash count — 16-byte keys, map-side combined.
# Determinism: integer polynomial hash, md5 hex, integer counts; the one
# ratio rounds from integer sums.
# --------------------------------------------------------------------------------------
_CDC_W = 8  # rolling window (chars)
_CDC_P = 2147483647
_CDC_DIV = 32  # boundary divisor -> ~32-char mean chunks on this corpus


def _cdc_cuts_expr() -> str:
    """Boundary-position ARRAY per doc, as ONE expression (r13).

    The r12 shape evaluated 8 x ``ascii(substr(text, i+j, 1))`` per position;
    UTF8String locates a char offset by scanning bytes from the string start,
    so that is O(8·i) per position = O(L²) per doc.  Here the text is
    decomposed once into a char-code array, bound as a lambda variable
    (``transform(array(codes), cs -> ...)``), and the rolling hash reads 8
    O(1) ``element_at`` lookups per position — O(L) per doc, measured 1.8x
    faster end-to-end at sf0.1 (TEXTAB.json; byte-identical result, exact
    char semantics, no ASCII assumption).  The whole decomposition must live
    INSIDE the generator's input expression: projecting the codes array in a
    column below the explode re-executes the split per generated row under
    whole-stage codegen's deferred evaluation (measured 18-58x slower, OOM
    at L=20k — see tools/text_ab.py header).
    """
    terms = " + ".join(
        f"CAST(element_at(cs, i + {j}) AS BIGINT) * {31 ** (_CDC_W - 1 - j)}L"
        for j in range(_CDC_W)
    )
    return (
        "element_at(transform(array(transform(split(text, ''), c -> ascii(c))), "
        f"cs -> filter(sequence(1, len - {_CDC_W - 1}), "
        f"i -> (({terms}) % {_CDC_P}L) % {_CDC_DIV} = 0)), 1)"
    )


def _cdc_hash_sql(text: str, i: str) -> str:
    terms = " + ".join(
        f"CAST(ord(substr({text}, ({i}) + {j}, 1)) AS BIGINT) * {31 ** (_CDC_W - 1 - j)}"
        for j in range(_CDC_W)
    )
    return f"(({terms}) % {_CDC_P})"


@query(
    "cdc_chunk_dedup",
    family="DEDUP,E2",
    doc=f"Content-defined chunking (window {_CDC_W}, divisor {_CDC_DIV}) + "
    "chunk-hash dedup: per-source chunk counts, corpus-wide duplicate "
    "chunk instances, and the duplicated-byte ratio.",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, source, text, length(text) AS len FROM documents
        ),
        cuts AS (
          SELECT doc_id, i
          FROM (
            SELECT doc_id, unnest(range(1, len - {_CDC_W - 2})) AS i, text
            FROM d WHERE len >= {_CDC_W}
          )
          WHERE {_cdc_hash_sql('text', 'i')} % {_CDC_DIV} = 0
        ),
        spans AS (
          SELECT doc_id,
                 coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
                 i AS e
          FROM cuts
          UNION ALL
          SELECT d.doc_id, coalesce(mc.mx, 0) + 1 AS s, d.len AS e
          FROM d LEFT JOIN (SELECT doc_id, max(i) AS mx FROM cuts GROUP BY doc_id) mc
            ON mc.doc_id = d.doc_id
          WHERE coalesce(mc.mx, 0) < d.len
        ),
        chunks AS (
          SELECT d.source, md5(substr(d.text, sp.s, sp.e - sp.s + 1)) AS ch,
                 sp.e - sp.s + 1 AS nbytes
          FROM spans sp JOIN d ON d.doc_id = sp.doc_id
        ),
        freq AS (SELECT ch, count(*) AS n FROM chunks GROUP BY ch)
        SELECT c.source,
               count(*) AS n_chunks,
               CAST(sum(c.nbytes) AS BIGINT) AS n_bytes,
               count(*) FILTER (WHERE f.n > 1) AS dup_chunks,
               {sql_round_half_up(
                   'CAST(coalesce(sum(c.nbytes) FILTER (WHERE f.n > 1), 0) AS DOUBLE)'
                   ' / sum(c.nbytes)', 4)} AS dup_byte_ratio
        FROM chunks c JOIN freq f ON f.ch = c.ch
        GROUP BY c.source
        ORDER BY c.source
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import repartition_if_narrow

    d = repartition_if_narrow(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text", F.length("text").alias("len")
    )
    long_docs = d.filter(F.col("len") >= _CDC_W)
    # boundary positions computed per doc in one expression, then exploded —
    # only the ~L/DIV surviving cuts leave the generator (see _cdc_cuts_expr)
    cuts = long_docs.select("doc_id", F.explode(F.expr(_cdc_cuts_expr())).alias("i"))
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy("i")
    mid = cuts.select(
        "doc_id",
        (F.coalesce(F.lag("i").over(wd), F.lit(0)) + 1).alias("s"),
        F.col("i").alias("e"),
    )
    mx = cuts.groupBy("doc_id").agg(F.max("i").alias("mx"))
    tail = (
        d.join(mx, "doc_id", "left")
        .withColumn("mx", F.coalesce(F.col("mx"), F.lit(0)))
        .filter(F.col("mx") < F.col("len"))
        .select("doc_id", (F.col("mx") + 1).alias("s"), F.col("len").alias("e"))
    )
    spans = mid.unionByName(tail)
    chunks = spans.join(d, "doc_id").select(
        "source",
        F.md5(F.substr("text", F.col("s"), F.col("e") - F.col("s") + 1)).alias("ch"),
        (F.col("e") - F.col("s") + 1).alias("nbytes"),
    )
    freq = chunks.groupBy("ch").agg(F.count(F.lit(1)).alias("n"))
    j = chunks.join(freq, "ch")
    dup = F.col("n") > 1
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("nbytes").cast("long").alias("n_bytes"),
            F.count(F.when(dup, 1)).alias("dup_chunks"),
            round_half_up(
                F.coalesce(F.sum(F.when(dup, F.col("nbytes"))), F.lit(0)).cast("double")
                / F.sum("nbytes"),
                4,
            ).alias("dup_byte_ratio"),
        )
        .orderBy("source")
    )
