"""Driver-contract smoke tests: entry(), queries(), oracle_sql() shape."""

from __future__ import annotations

import importlib

import pytest

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(os_) <= set(qs)
    # every registered query is oracle-gated since round 4 (the last
    # holdout, ann_ivf_kmeans_topk, got a committed-centroid oracle)
    rows_only = set(qs) - set(os_)
    assert rows_only == set()


@pytest.mark.parametrize("name", ["pricing_summary", "knn_exact_topk", "submission_offset"])
def test_headline_queries_smoke(spark, name):
    from tests.conftest import SF_SMOKE

    df = entry_mod.queries()[name](spark, SF_SMOKE)
    assert df.count() > 0
