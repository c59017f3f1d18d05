"""Property-based tests (hypothesis) for the cross-engine scalar kernels.

These are the invariants the oracle gate depends on: the floor-based
round-half-up formula must agree between Python/numpy (== Spark codegen
semantics, both IEEE-754 doubles) and DuckDB, and slugify must be
idempotent and ascii-closed.  No SparkSession needed — fast.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from acousticbrainz_server_spark.functions.scalar import slugify_py


def _py_round_half_up(x: float, digits: int) -> float:
    scale = float(10**digits)
    return math.floor(x * scale + 0.5) / scale


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), st.integers(min_value=0, max_value=6))
def test_round_half_up_matches_duckdb(x, digits):
    # Bind the double NATIVELY (parameter, not a repr'd literal): oracle
    # values flow from parquet as binary doubles, so that is the contract —
    # and DuckDB's string->double parse is 1 ulp off Python's for some
    # literals (found by hypothesis: 900719925.7082665), which is a parser
    # property, not a rounding-kernel property.
    scale = float(10**digits)
    got = duckdb.execute(
        "SELECT floor(CAST(? AS DOUBLE) * ? + 0.5) / ?", [x, scale, scale]
    ).fetchone()[0]
    assert got == _py_round_half_up(x, digits)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_slugify_idempotent_and_ascii(s):
    out = slugify_py(s)
    assert slugify_py(out) == out  # idempotent
    assert out.isascii()
    assert " " not in out and "--" not in out  # space/hyphen runs collapsed


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**7))
def test_format_length_long_formula_total_roundtrip(secs):
    """The H:MM:SS / M:SS / 00:SS formula must round-trip to the input."""
    mins, s = divmod(float(secs), 60)
    hours, mins = divmod(mins, 60)
    if hours >= 1:
        text = "%d:%02d:%02d" % (hours, mins, s)
    elif mins >= 1:
        text = "%d:%02d" % (mins, s)
    else:
        text = "00:%02d" % s
    parts = [int(p) for p in text.split(":")]
    total = 0
    for p in parts:
        total = total * 60 + p
    assert total == secs


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_duckdb_int_div_truncates_unlike_python(x):
    """PINNED GOTCHA: DuckDB's BIGINT // TRUNCATES toward zero, while
    Python's // (and Spark's floor(a/b)) floors — they agree ONLY for
    non-negative dividends.  Every oracle using // on a derived integer
    (epoch_ns//1000, duration //60//3600) has a non-negative dividend; this
    test documents the constraint so a future negative-domain oracle
    doesn't silently diverge."""
    n = math.floor(x)
    got = duckdb.sql(f"SELECT CAST({n} AS BIGINT) // 60").fetchone()[0]
    truncated = -((-n) // 60) if n < 0 else n // 60  # toward zero, exact ints
    assert got == truncated
    if n >= 0:
        assert got == n // 60  # agrees with Python floor-div only here


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=2, max_value=7),
    st.sampled_from([0.01, 0.02, 0.05, 0.1, 0.25]),
)
def test_misra_gries_partition_superset_guarantee(items, n_parts, batch_size, support):
    """The invariant frequent_items_sketch's exactness rests on: for ANY
    partitioning and ANY batch slicing, every item with global count >=
    ceil(support*N) survives in at least one partition's Misra-Gries summary
    (so the exact recount sees it)."""
    import math
    from collections import Counter

    import pandas as pd

    from acousticbrainz_server_spark.operators.sketch import _mg_partition_candidates

    items = [f"i{x}" for x in items]
    n_counters = max(8, math.ceil(2.0 / support))
    kernel = _mg_partition_candidates("item", n_counters)

    # deterministic round-robin partitioning, then slice each partition into
    # Arrow-batch-sized pieces exactly as mapInPandas would deliver them
    candidates: set[str] = set()
    n_from_sentinels = 0
    for p in range(n_parts):
        part = items[p::n_parts]
        batches = [
            pd.DataFrame({"item": part[i : i + batch_size]})
            for i in range(0, len(part), batch_size)
        ] or [pd.DataFrame({"item": []})]
        for out in kernel(iter(batches)):
            candidates.update(out["item"][out["item"].notna()].tolist())
            n_from_sentinels += int(out["_n"][out["_n"].notna()].sum())

    n = len(items)
    assert n_from_sentinels == n  # the sweep's ride-along row count is exact
    thr = math.ceil(support * n)
    heavy = {k for k, c in Counter(items).items() if c >= thr}
    assert heavy <= candidates, f"lost heavy hitters: {heavy - candidates}"


# ---------------------------------------------------------------------------
# PQ ADC (no Spark needed): code assignment and table-lookup distance must
# equal the direct definition for arbitrary inputs
# ---------------------------------------------------------------------------
@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=2, max_value=12).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=8, max_size=8),
                min_size=n,
                max_size=n,
            ),
        )
    ),
    st.integers(min_value=0, max_value=10_000),
)
def test_pq_adc_matches_direct_definition(vecs_t, seed):
    """For random vectors and a random K=4, M=2 codebook: _dist_tables +
    argmin + table-lookup ADC == the literal 'quantize then squared distance
    to the reconstructed vector' definition."""
    import numpy as np

    from acousticbrainz_server_spark.similarity.pq import _dist_tables

    _, vec_lists = vecs_t
    x = np.asarray(vec_lists, dtype=np.float64)  # n x 8
    rng = np.random.RandomState(seed)
    m, k, sub = 2, 4, 4
    books = [rng.normal(size=(k, sub)).tolist() for _ in range(m)]

    tabs = _dist_tables(x, books)  # n x m x k
    codes = tabs.argmin(axis=2)  # n x m
    # reconstruction from codes
    recon = np.concatenate(
        [np.asarray(books[s])[codes[:, s]] for s in range(m)], axis=1
    )  # n x 8
    # ADC distance of query x[0] to every db vector's reconstruction
    qtab = _dist_tables(x[0:1], books)[0]  # m x k
    adc = sum(qtab[s, codes[:, s]] for s in range(m))
    direct = ((x[0] - recon) ** 2).sum(axis=1)
    assert np.allclose(adc, direct, rtol=1e-9, atol=1e-9)
    # per-subspace codes are the nearest codewords by definition
    for s in range(m):
        d = ((x[:, s * sub : (s + 1) * sub][:, None, :] - np.asarray(books[s])[None, :, :]) ** 2).sum(-1)
        assert (d.argmin(axis=1) == codes[:, s]).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=20, unique=True),
    st.lists(st.integers(0, 30), min_size=1, max_size=20, unique=True),
)
def test_rrf_fusion_reference(list_a, list_b):
    """RRF score = sum of 1/(60+rank) over the lists an id appears in; ids in
    both lists always outrank an id at the SAME ranks in only one list."""
    K = 60
    score = {}
    for lst in (list_a, list_b):
        for r, i in enumerate(lst, start=1):
            score[i] = score.get(i, 0.0) + 1.0 / (K + r)
    for i in set(list_a) & set(list_b):
        ra = list_a.index(i) + 1
        rb = list_b.index(i) + 1
        assert score[i] == 1.0 / (K + ra) + 1.0 / (K + rb)
        # strictly greater than any single-list id at those exact ranks
        assert score[i] > 1.0 / (K + ra) and score[i] > 1.0 / (K + rb)
