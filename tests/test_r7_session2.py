"""Round-7 session-2 property tests: interval coalescing invariants,
Matryoshka recall bounds vs a numpy ground truth, the Zipf fit, and the
Q15/Q16 relational shapes — semantic checks the hash gate cannot express."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from tests.conftest import SF_SMOKE

_load_all()


def test_interval_merge_invariants(spark):
    """Merged spans are disjoint per user, cover every event, and conserve
    the event count — against a brute-force python sweep."""
    out = (
        QUERIES["interval_merge_spans"].spark_fn(spark, SF_SMOKE).toPandas()
    )
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "value")
        .toPandas()
    )
    assert out["n_events"].sum() == len(ev)
    # brute-force merge for a handful of users
    import pandas as pd

    for uid in ev["user_id"].drop_duplicates().head(5):
        rows = ev[ev["user_id"] == uid]
        spans = []
        for _, r in rows.iterrows():
            st = r["ts"].value // 1000  # ns -> us
            dur = min(max(r["value"], 0.0), 120.0)
            spans.append((st, st + int(np.floor(dur * 60_000_000))))
        spans.sort()
        merged = []
        for st, en in spans:
            if merged and st <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], en)
                merged[-1][2] += 1
            else:
                merged.append([st, en, 1])
        got = out[out["user_id"] == uid].sort_values("span_start")
        assert len(got) == len(merged), f"user {uid}"
        for (st, en, n), (_, g) in zip(merged, got.iterrows()):
            assert g["span_start"].value // 1000 == st
            assert g["span_end"].value // 1000 == en
            assert g["n_events"] == n
        # disjointness: each span starts strictly after the previous ends
        ends = got["span_end"].values[:-1]
        starts = got["span_start"].values[1:]
        assert (starts > ends).all()


def test_matryoshka_recall_vs_numpy(spark):
    """recall@k matches a numpy brute-force on the same rounding/tie rules,
    and is bounded by construction."""
    out = (
        QUERIES["matryoshka_recall_eval"]
        .spark_fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("query_id")
        .sort_index()
    )
    assert len(out) == 10
    assert ((out["n_common"] >= 0) & (out["n_common"] <= 10)).all()
    assert np.allclose(out["recall_at_k"], out["n_common"] / 10.0)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    ids = emb["vec_id"].to_numpy()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    def topk(dims, qid):
        q = M[ids == qid][0][:dims]
        C = M[:, :dims]
        cos = (C @ q) / (np.linalg.norm(C, axis=1) * np.linalg.norm(q))
        cos = np.round(cos, 6)  # the engines rank on the rounded value
        mask = ids != qid
        order = sorted(
            zip(-cos[mask], ids[mask])
        )  # (-cos, id) asc == (cos desc, id asc)
        return {i for _, i in order[:10]}

    for qid in range(10):
        full = topk(64, qid)
        trunc = topk(16, qid)
        assert out.loc[qid, "n_common"] == len(full & trunc)


def test_zipf_slope_shape(spark):
    """The fit runs over <=1000 ranked terms and natural-ish text yields a
    negative slope with meaningful fit quality."""
    row = QUERIES["zipf_token_slope"].spark_fn(spark, SF_SMOKE).collect()[0]
    assert 0 < row["n_terms"] <= 1000
    assert row["zipf_slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0


def test_top_supplier_revenue_is_argmax(spark):
    """Winner rows hold exactly the max of the per-supplier revenue view."""
    out = QUERIES["top_supplier_revenue"].spark_fn(spark, SF_SMOKE).toPandas()
    assert len(out) >= 1
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
        .toPandas()
    )
    mx = round(li["r"].max(), 2)
    assert set(out["total_revenue"].round(2)) == {mx}


def test_part_supplier_diversity_excludes_bad_suppliers(spark):
    """No excluded supplier contributes: recompute one group brute-force."""
    out = (
        QUERIES["part_supplier_diversity"].spark_fn(spark, SF_SMOKE).toPandas()
    )
    assert len(out) > 0
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    sup = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").toPandas()
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    bad = set(sup[sup["s_acctbal"] < 0]["s_suppkey"])
    top = out.iloc[0]
    pk = part[
        (part["p_brand"] == top["p_brand"])
        & (part["p_type"] == top["p_type"])
        & (part["p_size"] == top["p_size"])
    ]["p_partkey"]
    rows = li[li["l_partkey"].isin(set(pk)) & ~li["l_suppkey"].isin(bad)]
    assert top["supplier_cnt"] == rows["l_suppkey"].nunique()


def test_interval_merge_hypothesis(spark):
    """Property-based check of the merge plan against a reference sweep over
    randomized interval sets (bounded examples — each runs a Spark job)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    def spark_merge(rows):
        df = spark.createDataFrame(rows, "user_id long, st long, en long")
        w_prev = (
            Window.partitionBy("user_id")
            .orderBy("st", "en")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("user_id")
            .orderBy("st", "en")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        m = df.withColumn("pmax", F.max("en").over(w_prev))
        isl = m.withColumn(
            "gid",
            F.sum(
                F.when(F.col("pmax").isNull() | (F.col("st") > F.col("pmax")), 1).otherwise(0)
            ).over(w_run),
        )
        out = (
            isl.groupBy("user_id", "gid")
            .agg(F.min("st").alias("a"), F.max("en").alias("b"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return sorted((r["user_id"], r["a"], r["b"], r["n"]) for r in out)

    def ref_merge(rows):
        from collections import defaultdict

        by_user = defaultdict(list)
        for u, s, e in rows:
            by_user[u].append((s, e))
        out = []
        for u, spans in by_user.items():
            spans.sort()
            merged = []
            for s, e in spans:
                if merged and s <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], e)
                    merged[-1][2] += 1
                else:
                    merged.append([s, e, 1])
            out.extend((u, a, b, n) for a, b, n in merged)
        return sorted(out)

    interval = st.tuples(
        st.integers(0, 3),          # user
        st.integers(0, 100),        # start
        st.integers(0, 50),         # duration
    ).map(lambda t: (t[0], t[1], t[1] + t[2]))

    @settings(max_examples=8, deadline=None)
    @given(st.lists(interval, min_size=1, max_size=20))
    def check(rows):
        assert spark_merge(rows) == ref_merge(rows)

    check()
