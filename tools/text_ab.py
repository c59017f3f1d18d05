"""A/B the per-position substring formulations of the text kernels (r13).

Hypothesis (guide §1 measure-first): Spark's UTF8String.substring locates a
CHAR offset by scanning bytes from the string start, so a per-position
``substr(text, i, k)`` stream costs O(i) per call = O(L^2) per document.
Two candidates:

  cdc_chunk_dedup — the rolling hash evaluates 8 x ascii(substr(text,i+j,1))
    per position (O(8*L^2) byte steps + 8 UTF8String allocs/position).
    Candidate: decompose once per doc (split -> ascii codes array, one O(L)
    pass), then 8 x O(1) element_at per position.  Exact char semantics —
    no ASCII assumption.

  char_shingle_stream (minhash family) — substr(text,i,k) per position.
    Candidate: array_join(slice(chars,i,k),'') over the split array.

Method: equality check first (sorted collect old vs new), then interleaved
min-over-N timed trials in ONE session, full-query toPandas (bench action).
Run only on a quiet box; writes TEXTAB.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from acousticbrainz_server_spark.functions.text import (  # noqa: E402
    minhash_signature_aggs,
    minhash_signature_longs,
    repartition_if_narrow,
)
from acousticbrainz_server_spark.plans.domain import load_table  # noqa: E402
from acousticbrainz_server_spark.plans.dedup_queries import (  # noqa: E402
    _CDC_DIV,
    _CDC_P,
    _CDC_W,
)
from acousticbrainz_server_spark.session import get_spark  # noqa: E402


def _cdc_hash_substr(text, i):
    h = F.lit(0).cast("long")
    for j in range(_CDC_W):
        h = h + F.ascii(F.substr(text, i + F.lit(j), F.lit(1))).cast("long") * F.lit(
            31 ** (_CDC_W - 1 - j)
        )
    return h % F.lit(_CDC_P)


def _cdc_hash_codes(codes, i):
    h = F.lit(0).cast("long")
    for j in range(_CDC_W):
        h = h + F.element_at(codes, i + F.lit(j)).cast("long") * F.lit(
            31 ** (_CDC_W - 1 - j)
        )
    return h % F.lit(_CDC_P)


def _cdc_query(spark, sf_dir: str, use_codes: bool):
    """Copy of the registered cdc_chunk_dedup with the cuts stage switchable."""
    from pyspark.sql import Window

    from acousticbrainz_server_spark.functions.math import round_half_up

    d = repartition_if_narrow(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text", F.length("text").alias("len")
    )
    long_docs = d.filter(F.col("len") >= _CDC_W)
    if use_codes:
        codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))
        pos = long_docs.select(
            "doc_id",
            codes.alias("_codes"),
            F.explode(F.sequence(F.lit(1), F.col("len") - _CDC_W + 1)).alias("i"),
        )
        cuts = pos.filter(
            _cdc_hash_codes(F.col("_codes"), F.col("i")) % _CDC_DIV == 0
        ).select("doc_id", "i")
    else:
        pos = long_docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.col("len") - _CDC_W + 1)).alias("i"),
        )
        cuts = pos.filter(
            _cdc_hash_substr(F.col("text"), F.col("i")) % _CDC_DIV == 0
        ).select("doc_id", "i")
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


def _shingle_stream(docs, id_col, text_col, k, use_codes: bool):
    docs = repartition_if_narrow(docs)
    n = F.greatest(F.length(text_col) - (k - 1), F.lit(1))
    if use_codes:
        return docs.select(
            F.col(id_col).alias("doc"),
            F.split(F.col(text_col), "").alias("_c"),
            F.explode(F.sequence(F.lit(1), n)).alias("_i"),
        ).select("doc", F.array_join(F.slice("_c", F.col("_i"), k), "").alias("s"))
    return docs.select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("_t"),
        F.explode(F.sequence(F.lit(1), n)).alias("_i"),
    ).select("doc", F.expr(f"substring(_t, _i, {k})").alias("s"))


def _sig_query(spark, sf_dir: str, use_codes: bool):
    d = load_table(spark, sf_dir, "documents")
    sh = _shingle_stream(d, "doc_id", "text", 5, use_codes)
    return (
        sh.groupBy("doc")
        .agg(*minhash_signature_aggs("s", 8, portable=True))
        .select("doc", *minhash_signature_longs(8, portable=True))
    )


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.toPandas()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("text_ab")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    out: dict = {"sf_dir": sf_dir, "trials": trials}

    # 0. split('') semantics (documented precondition of the codes variants)
    row = spark.sql("SELECT split('abc','') a, split('','') b").first()
    out["split_semantics"] = {"abc": row["a"], "empty": row["b"]}
    assert row["a"][:3] == ["a", "b", "c"], row["a"]

    # 1. microbench: position-cost of substr-on-full-text vs element_at
    #    (one 20k-char doc per row x 2k rows; sum of per-position values)
    doc = spark.sql(
        "SELECT id, repeat('abcdefgh', 2500) AS t FROM range(2000)"
    ).localCheckpoint(eager=True)
    sub = doc.select(
        "id", F.explode(F.sequence(F.lit(1), F.length("t"))).alias("i"), "t"
    ).select(F.sum(F.ascii(F.expr("substring(t, i, 1)"))).alias("s"))
    codes = doc.select(
        "id",
        F.transform(F.split("t", ""), lambda c: F.ascii(c)).alias("_c"),
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("i"),
    ).select(F.sum(F.element_at("_c", F.col("i"))).alias("s"))
    mb = {"substr": [], "codes": []}
    for _ in range(3):
        mb["substr"].append(round(_timed(sub), 3))
        mb["codes"].append(round(_timed(codes), 3))
    out["microbench_20kchar"] = mb

    # 2. equality gates
    pd_old = _cdc_query(spark, sf_dir, False).toPandas()
    pd_new = _cdc_query(spark, sf_dir, True).toPandas()
    eq_cdc = pd_old.equals(pd_new)
    so = _sig_query(spark, sf_dir, False).toPandas().sort_values("doc").reset_index(drop=True)
    sn = _sig_query(spark, sf_dir, True).toPandas().sort_values("doc").reset_index(drop=True)
    eq_sig = so.equals(sn)
    out["equal"] = {"cdc": bool(eq_cdc), "sig": bool(eq_sig)}
    print("EQUAL cdc:", eq_cdc, "sig:", eq_sig, flush=True)

    # 3. interleaved timing, min-over-trials
    t: dict[str, list[float]] = {k: [] for k in ["cdc_old", "cdc_new", "sig_old", "sig_new"]}
    for i in range(trials):
        t["cdc_old"].append(round(_timed(_cdc_query(spark, sf_dir, False)), 3))
        t["cdc_new"].append(round(_timed(_cdc_query(spark, sf_dir, True)), 3))
        t["sig_old"].append(round(_timed(_sig_query(spark, sf_dir, False)), 3))
        t["sig_new"].append(round(_timed(_sig_query(spark, sf_dir, True)), 3))
        print(f"trial {i}: " + ", ".join(f"{k}={v[-1]}" for k, v in t.items()), flush=True)
        spark.catalog.clearCache()
    out["times"] = t
    out["mins"] = {k: min(v) for k, v in t.items()}
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    with open(os.path.join(REPO, "TEXTAB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["mins"]))
    spark.stop()


if __name__ == "__main__":
    main()
