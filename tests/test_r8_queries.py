"""Round-8 property tests: pandas recomputes of the new TPC-H decorrelation
shapes (Q2 min-equality ties, Q11 global-share HAVING, Q20 nested semi) —
the semantic invariants the cross-engine hash gate cannot express."""

from __future__ import annotations

import numpy as np
import pandas as pd

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from tests.conftest import SF_SMOKE

_load_all()


def _rhu(x, nd):
    return np.floor(np.asarray(x, dtype=float) * 10**nd + 0.5) / 10**nd


def test_cheapest_supplier_keeps_ties_and_matches_pandas(spark):
    out = QUERIES["cheapest_supplier_per_part"].spark_fn(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    reg = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    rs = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey").merge(
        reg[reg["r_name"] == "ASIA"], left_on="n_regionkey", right_on="r_regionkey"
    )
    li = li[li["l_suppkey"].isin(rs["s_suppkey"])]
    li = li.assign(eff=li["l_extendedprice"] * (1 - li["l_discount"]))
    ps = (
        li.groupby(["l_partkey", "l_suppkey"])["eff"].mean().reset_index()
    )
    ps["eff_price"] = _rhu(ps["eff"], 2)
    mn = ps.groupby("l_partkey")["eff_price"].min().rename("min_price")
    q = ps.join(mn, on="l_partkey")
    q = q[q["eff_price"] == q["min_price"]]
    # every (part, supplier) the query returns is a true per-part minimum,
    # and ALL tied minima for a returned part are present (Q2 keeps ties)
    got = set(zip(out["p_partkey"], out["s_name"]))
    full = q.merge(rs[["s_suppkey", "s_name"]], left_on="l_suppkey", right_on="s_suppkey")
    truth = {(pk, sn) for pk, sn in zip(full["l_partkey"], full["s_name"])}
    assert got <= truth
    returned_parts = set(out["p_partkey"])
    assert {t for t in truth if t[0] in returned_parts} == got
    assert len(out) <= 100


def test_important_parts_share_threshold_exact(spark):
    out = QUERIES["important_parts_value_share"].spark_fn(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    cents = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
    pv = (
        (cents * li["l_quantity"].astype("int64"))
        .groupby(li["l_partkey"])
        .sum()
    )
    total = int(pv.sum())
    expect = pv[pv * len(pv) > 1.5 * total]
    assert len(expect) > 0
    assert dict(zip(out["l_partkey"], out["value_cents"])) == {
        int(k): int(v) for k, v in expect.items()
    }
    # ordering contract: value desc, partkey asc
    key = list(zip(-out["value_cents"], out["l_partkey"]))
    assert key == sorted(key)


def test_dominant_suppliers_nested_threshold(spark):
    out = QUERIES["dominant_part_suppliers"].spark_fn(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    pq = (
        li.groupby(["l_partkey", "l_suppkey"])["l_quantity"].sum().astype("int64").reset_index()
    )
    pt = pq.groupby("l_partkey").agg(part_qty=("l_quantity", "sum"), n_supp=("l_suppkey", "count"))
    j = pq.join(pt, on="l_partkey")
    winners = set(j.loc[j["l_quantity"] * j["n_supp"] > 2 * j["part_qty"], "l_suppkey"])
    assert winners, "threshold kept zero suppliers"
    assert set(out["s_suppkey"]) == winners
    assert list(out["s_suppkey"]) == sorted(out["s_suppkey"])
