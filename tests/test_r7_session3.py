"""Round-7 session-3 property tests: Count-Min / KMV sketch contracts,
chi-square vs a numpy recompute, greedy-MMR vs a brute-force reference, and
independent recomputes of the new TPC-H shapes — the semantic invariants the
cross-engine hash gate cannot express."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from tests.conftest import SF_SMOKE

_load_all()


# ---------------------------------------------------------------- Count-Min


def test_countmin_never_undercounts(spark):
    """The CMS contract: estimate >= exact for EVERY probed key (no false
    negatives is what makes min-over-rows sound)."""
    out = QUERIES["countmin_heavy_counts"].spark_fn(spark, SF_SMOKE).toPandas()
    assert len(out) == 10
    assert (out["cms_est"] >= out["n_exact"]).all()
    assert (out["overcount"] >= 0).all()


def test_countmin_matches_python_reference(spark):
    """Cells and estimates agree with a from-scratch python CMS over the
    same stream and hash constants."""
    from acousticbrainz_server_spark.plans.sketch_queries import (
        _CMS_P,
        _CMS_ROWS,
        _CMS_W,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id"])
    cells = [np.zeros(_CMS_W, dtype=np.int64) for _ in _CMS_ROWS]
    for k in ev["user_id"].to_numpy():
        for i, (a, b) in enumerate(_CMS_ROWS):
            cells[i][((int(k) % _CMS_P) * a + b) % _CMS_P % _CMS_W] += 1
    out = QUERIES["countmin_heavy_counts"].spark_fn(spark, SF_SMOKE).toPandas()
    for _, r in out.iterrows():
        est = min(
            cells[i][((int(r["user_id"]) % _CMS_P) * a + b) % _CMS_P % _CMS_W]
            for i, (a, b) in enumerate(_CMS_ROWS)
        )
        assert est == r["cms_est"], f"user {r['user_id']}"


# --------------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_union_bounds(spark):
    """Streams holding fewer than k distinct keys report EXACTLY; the union
    row's exact count equals the global distinct-user count, and every
    estimate is positive."""
    from acousticbrainz_server_spark.plans.sketch_queries import _KMV_K

    out = QUERIES["kmv_distinct_union"].spark_fn(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_type", "user_id"])
    n_all = ev["user_id"].nunique()
    urow = out[out["event_type"] == "__union__"]
    assert len(urow) == 1
    assert int(urow["n_exact"].iloc[0]) == n_all
    for _, r in out.iterrows():
        if r["n_exact"] < _KMV_K:
            assert r["kmv_est"] == pytest.approx(float(r["n_exact"]))
        assert r["kmv_est"] > 0


def test_kmv_estimator_reasonable_at_sf001(spark):
    """At sf0.01 (150 distinct users > k=32) the estimator path engages and
    lands within a generous +/-50% of truth — a sanity band, not the hash
    gate (which pins the exact value)."""
    out = QUERIES["kmv_distinct_union"].spark_fn(spark, "/root/testdata/sf0.01").toPandas()
    urow = out[out["event_type"] == "__union__"].iloc[0]
    assert urow["n_exact"] >= 32  # estimator path, not the exact path
    assert 0.5 * urow["n_exact"] <= urow["kmv_est"] <= 1.5 * urow["n_exact"]


# -------------------------------------------------------------- chi-square


def test_chisquare_matches_numpy(spark):
    """chi2 / dof / Cramer's V agree with a dense numpy recompute of the
    contingency table."""
    out = QUERIES["chisquare_independence"].spark_fn(spark, SF_SMOKE).toPandas().iloc[0]
    orders = pd.read_parquet(
        f"{SF_SMOKE}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    ct = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"]).to_numpy(
        dtype=np.float64
    )
    n = ct.sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    r, c = ct.shape
    assert int(out["n"]) == int(n)
    assert int(out["dof"]) == (r - 1) * (c - 1)
    assert out["chi2"] == pytest.approx(chi2, abs=2e-4)
    v = np.sqrt(chi2 / (n * min(r - 1, c - 1)))
    assert out["cramers_v"] == pytest.approx(v, abs=2e-4)


# --------------------------------------------------------------------- MMR


def _round_half_up(x: np.ndarray, d: int) -> np.ndarray:
    s = 10.0**d
    return np.floor(x * s + 0.5) / s


def test_mmr_matches_bruteforce_greedy(spark):
    """The unrolled 3-step plan picks exactly what a general greedy MMR loop
    picks under the same rounding and tie-break rules."""
    from acousticbrainz_server_spark.plans.retrieval_queries import (
        _MMR_LAMBDA,
        _MMR_QIDS,
        _MMR_SHORTLIST,
    )

    out = (
        QUERIES["mmr_diversified_rerank"].spark_fn(spark, SF_SMOKE).toPandas()
    )
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for _, r in emb.iterrows()}

    def cos(u, v):
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    for qid in _MMR_QIDS:
        qv = vecs[qid]
        rel = {
            cid: _round_half_up(np.array([cos(v, qv)]), 4)[0]
            for cid, v in vecs.items()
            if cid != qid
        }
        short = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_SHORTLIST]
        selected, scores = [], []
        for _step in range(3):
            best = None
            for c in short:
                if c in selected:
                    continue
                pen = max(
                    (_round_half_up(np.array([cos(vecs[c], vecs[s])]), 4)[0] for s in selected),
                    default=0.0,
                )
                sc = _round_half_up(
                    np.array([_MMR_LAMBDA * rel[c] - (1 - _MMR_LAMBDA) * pen]), 4
                )[0]
                if best is None or (sc, -c) > (best[1], -best[0]):
                    best = (c, sc)
            selected.append(best[0])
            scores.append(best[1])
        got = out[out["qid"] == qid].sort_values("step")
        assert list(got["vec_id"]) == selected, f"qid {qid}"
        for want, have in zip(scores, got["mmr_score"]):
            assert have == pytest.approx(want, abs=1e-9)
        # diversity sanity: three DISTINCT picks
        assert len(set(selected)) == 3


# ------------------------------------------------------------ TPC-H shapes


def test_q6_forecast_matches_pandas(spark):
    out = QUERIES["forecast_revenue_change"].spark_fn(spark, SF_SMOKE).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    m = (
        (li["l_shipdate"] >= "1997-01-01")
        & (li["l_shipdate"] < "1998-01-01")
        & (li["l_discount"] >= 0.04)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    sel = li[m]
    assert int(out["n_lineitems"]) == int(m.sum())
    assert out["revenue_delta"] == pytest.approx(
        (sel["l_extendedprice"] * sel["l_discount"]).sum(), abs=0.02
    )


def test_q4_order_priority_check_matches_pandas(spark):
    out = QUERIES["order_priority_check"].spark_fn(spark, SF_SMOKE).toPandas()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    o = o[(o["o_orderdate"] >= "1996-07-01") & (o["o_orderdate"] < "1996-10-01")]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late = j[j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=90)]
    want = (
        late.drop_duplicates("o_orderkey")
        .groupby("o_orderpriority")["o_orderkey"]
        .count()
        .sort_index()
    )
    got = out.set_index("o_orderpriority")["n_orders"].sort_index()
    assert got.to_dict() == want.to_dict()


def test_q19_brand_bands_match_pandas(spark):
    from acousticbrainz_server_spark.plans.relational import _Q19_BANDS

    out = QUERIES["brand_quantity_revenue"].spark_fn(spark, SF_SMOKE).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    p = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m = np.zeros(len(j), dtype=bool)
    for b, sz, lo, hi in _Q19_BANDS:
        m |= (
            (j["p_brand"] == b)
            & j["p_size"].between(1, sz)
            & j["l_quantity"].between(lo, hi)
        ).to_numpy()
    sel = j[m]
    assert int(out["n_lineitems"]) == int(m.sum())
    assert out["revenue"] == pytest.approx(
        (sel["l_extendedprice"] * (1 - sel["l_discount"])).sum(), abs=0.02
    )


# ------------------------------------------------------- Observation API


def test_observed_quality_gate_matches_recount(spark):
    """The observe()-collected metrics equal a plain two-pass recount, and
    the gate's internal consistency holds (kept <= scanned, ratio exact)."""
    out = QUERIES["observed_quality_gate"].spark_fn(spark, SF_SMOKE).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["text", "n_chars"])
    import re as _re

    alpha = docs["text"].map(
        lambda t: len(_re.sub("[^A-Za-z]", "", t)) / max(len(t), 1)
    )
    kept = docs[(docs["n_chars"] >= 120) & (alpha >= 0.55)]
    assert int(out["n_scanned"]) == len(docs)
    assert int(out["n_kept"]) == len(kept)
    assert int(out["kept_chars"]) == int(kept["n_chars"].sum())
    assert 0 < out["kept_ratio"] <= 1
    assert out["kept_ratio"] == pytest.approx(len(kept) / len(docs), abs=1e-4)


# ------------------------------------------------- window-rank / HLL merge


def test_window_rank_suite_invariants(spark):
    """percent_rank in [0,1] with exactly one 0 per nation, cume_dist ends
    at 1, quartiles balanced within 1, and nth_value(3) equals the nation's
    3rd-highest spend."""
    out = QUERIES["window_rank_suite"].spark_fn(spark, SF_SMOKE).toPandas()
    for nk, g in out.groupby("c_nationkey"):
        g = g.sort_values(["pct_rank", "c_custkey"]).reset_index(drop=True)
        assert g["pct_rank"].iloc[0] == 0.0
        assert g["pct_rank"].between(0, 1).all()
        assert g["cume"].iloc[-1] == pytest.approx(1.0)
        sizes = g["quartile"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        spends = sorted(g["spend"], reverse=True)
        third = spends[2] if len(spends) >= 3 else None
        got_third = g["nation_third_spend"].iloc[0]
        if third is None:
            assert pd.isna(got_third)
        else:
            assert got_third == pytest.approx(third)


def test_hll_merge_estimate_close_to_union(spark):
    """The union-of-binaries estimate tracks the true merged distinct count
    within the documented band (the sketch_ok column the oracle gates), and
    per-flag exacts sum to >= the merged exact (overlap)."""
    out = QUERIES["hll_partition_merge"].spark_fn(spark, SF_SMOKE).toPandas()
    assert out["sketch_ok"].all()
    merged = out[out["grp"] == "__merged__"]["n_exact"].iloc[0]
    flags = out[out["grp"] != "__merged__"]["n_exact"]
    assert flags.sum() >= merged >= flags.max()


# --------------------------------------------------------------------- CDC


def _cdc_chunks_py(text: str) -> list[str]:
    """Reference chunker: same window-8 polynomial boundary rule."""
    from acousticbrainz_server_spark.plans.dedup_queries import (
        _CDC_DIV,
        _CDC_P,
        _CDC_W,
    )

    n = len(text)
    if n < _CDC_W:
        return [text] if n else []
    cuts = []
    for i in range(1, n - _CDC_W + 2):  # 1-based start positions
        h = 0
        for j in range(_CDC_W):
            h += ord(text[i - 1 + j]) * 31 ** (_CDC_W - 1 - j)
        if (h % _CDC_P) % _CDC_DIV == 0:
            cuts.append(i)
    chunks, prev = [], 0
    for c in cuts:
        chunks.append(text[prev:c])
        prev = c
    if prev < n:
        chunks.append(text[prev:])
    return chunks


def test_cdc_spark_matches_python_chunker(spark):
    """Per-source chunk counts and byte sums from the Spark plan equal the
    python reference chunker run over every document."""
    out = QUERIES["cdc_chunk_dedup"].spark_fn(spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["source", "text"])
    want: dict[str, list[int]] = {}
    for _, r in docs.iterrows():
        ch = _cdc_chunks_py(r["text"])
        agg = want.setdefault(r["source"], [0, 0])
        agg[0] += len(ch)
        agg[1] += sum(len(c) for c in ch)
    for _, r in out.iterrows():
        n, b = want[r["source"]]
        assert int(r["n_chunks"]) == n, r["source"]
        assert int(r["n_bytes"]) == b, r["source"]


def test_cdc_boundary_shift_resistance():
    """THE content-defined property: prepending bytes to a document shifts
    every offset yet leaves all chunks after the first boundary identical —
    fixed-size blocking would invalidate every block."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["text"])
    checked = 0
    for text in docs["text"].head(40):
        base = _cdc_chunks_py(text)
        if len(base) < 3:
            continue
        shifted = _cdc_chunks_py("INSERTED PREFIX >> " + text)
        # all base chunks from the second onward must reappear verbatim
        assert base[1:] == shifted[-(len(base) - 1):]
        checked += 1
    assert checked >= 5  # the corpus must actually exercise the property


# ------------------------------------------------------------------ bitmap


def test_bitmap_distinct_exactness(spark):
    """Bitmap counts are EXACT (not estimates): per-type rows equal pandas
    nunique, and the OR-merged '__all__' row equals the global nunique."""
    out = QUERIES["bitmap_distinct_rollup"].spark_fn(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_type", "user_id"])
    for _, r in out.iterrows():
        if r["event_type"] == "__all__":
            assert int(r["n_distinct"]) == ev["user_id"].nunique()
        else:
            assert int(r["n_distinct"]) == ev[ev["event_type"] == r["event_type"]][
                "user_id"
            ].nunique()


def test_cdc_chunker_hypothesis():
    """Randomized CDC invariants: chunks reassemble to the input exactly,
    and prepending a prefix never changes any chunk after the first
    boundary (hypothesis over random ascii-ish strings)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("abcdefgh XYZ.,\n"))

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=400), st.text(alphabet=alphabet, min_size=1, max_size=40))
    def _run(text, prefix):
        chunks = _cdc_chunks_py(text)
        assert "".join(chunks) == text
        assert all(chunks)  # no empty chunks
        shifted = _cdc_chunks_py(prefix + text)
        assert "".join(shifted) == prefix + text
        if len(chunks) >= 2:
            # every chunk after the first reappears as the shifted tail
            assert shifted[-(len(chunks) - 1):] == chunks[1:]

    _run()


# ----------------------------------------- skew isolation / incremental merge


def test_skew_split_is_exact_partition(spark):
    """The hot/cold split is a disjoint cover: hot facts + cold facts ==
    all facts, and the query equals a plain-join recompute in pandas."""
    out = QUERIES["skew_isolated_join"].spark_fn(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id", "value"])
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    j = ev.merge(cust, left_on="user_id", right_on="c_custkey")
    want = j.groupby("c_mktsegment").agg(
        n_events=("user_id", "size"), n_users=("user_id", "nunique")
    )
    got = out.set_index("c_mktsegment")
    assert got["n_events"].to_dict() == want["n_events"].to_dict()
    assert got["n_users"].to_dict() == want["n_users"].to_dict()
    assert int(out["n_events"].sum()) == len(j)


def test_incremental_merge_split_invariance(spark):
    """The incremental-maintenance contract: merging base+delta states
    must give the same answer for ANY split date — compare the registered
    split against two alternate splits recomputed via the same plan."""
    from acousticbrainz_server_spark.plans import relational as R

    base_out = (
        QUERIES["incremental_agg_merge"].spark_fn(spark, SF_SMOKE).toPandas()
    )
    orig = R._INC_SPLIT
    try:
        for alt in ("1996-06-15", "2001-01-01"):
            R._INC_SPLIT = alt
            alt_out = QUERIES["incremental_agg_merge"].spark_fn(spark, SF_SMOKE).toPandas()
            pd.testing.assert_frame_equal(base_out, alt_out)
    finally:
        R._INC_SPLIT = orig


# ------------------------------------------- RFM / ties / LTV invariants


def test_rfm_quartiles_balanced_and_complete(spark):
    out = QUERIES["rfm_segmentation"].spark_fn(spark, SF_SMOKE).toPandas()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet", columns=["o_custkey"])
    n_cust = orders["o_custkey"].nunique()
    assert int(out["n_customers"].sum()) == n_cust
    # every segment digit is a valid quartile
    for seg in out["segment"]:
        assert len(seg) == 3 and all(c in "1234" for c in seg)


def test_topk_with_ties_keeps_peers(spark):
    """Recompute with pandas: every order whose date ties a top-3 rank
    date must appear; rank gaps preserved."""
    out = QUERIES["topk_with_ties"].spark_fn(spark, SF_SMOKE).toPandas()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet", columns=["o_orderpriority", "o_orderdate"])
    for pri, g in o.groupby("o_orderpriority"):
        dates = sorted(g["o_orderdate"].unique())[::-1]
        got = out[out["o_orderpriority"] == pri].sort_values("o_orderdate", ascending=False)
        # rank of the i-th distinct date = 1 + #orders on strictly later dates
        counts = g["o_orderdate"].value_counts()
        expect = []
        before = 0
        for d in dates:
            rnk = before + 1
            if rnk > 3:
                break
            expect.append((d, rnk, int(counts[d])))
            before += int(counts[d])
        assert [
            (r["o_orderdate"], int(r["rnk"]), int(r["n_orders"]))
            for _, r in got.sort_values(["rnk", "o_orderdate"]).iterrows()
        ] == [(d, r, n) for d, r, n in sorted(expect, key=lambda x: (x[1], x[0]))]


def test_cohort_ltv_monotone_and_totals(spark):
    out = QUERIES["cohort_ltv_curve"].spark_fn(spark, SF_SMOKE).toPandas()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    total_cents = int(np.floor(orders["o_totalprice"] * 100 + 0.5).sum())
    finals = out.sort_values("age_m").groupby("cohort_m")["cum_cents"].last()
    assert int(finals.sum()) == total_cents
    for _, g in out.groupby("cohort_m"):
        c = g.sort_values("age_m")["cum_cents"].to_numpy()
        assert (np.diff(c) > 0).all() or len(c) == 1
