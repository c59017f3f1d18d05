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
    # CAST to DOUBLE: a bare literal may parse as DECIMAL, which is NOT the
    # type oracle columns have (parquet doubles) and overflows on multiply
    scale = float(10**digits)
    got = duckdb.sql(f"SELECT floor(CAST({x!r} AS DOUBLE) * {scale} + 0.5) / {scale}").fetchone()[0]
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
