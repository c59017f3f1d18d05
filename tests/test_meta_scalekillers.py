"""Meta-tests: the two scale-killer patterns the per-round audit greps for,
enforced statically so they cannot regrow between rounds.

1. Row-at-a-time Python UDFs (``F.udf`` / ``@udf``) — every Python-side
   kernel in this engine is Arrow-batched (pandas_udf / mapInPandas /
   mapInArrow / applyInPandas).  A plain udf() call is a 10-100x hot-path
   regression and fails this test.
2. ``crossJoin`` on two unbounded relations — every crossJoin in the tree
   must broadcast its right side (scalar stats rows, k-row query sets).
   A non-broadcast crossJoin is quadratic at 100 TB and fails this test,
   unless a ``# allpairs-by-design:`` justification sits within the 4
   preceding lines (the brute-force baselines whose scale path is the
   LSH/IVF variant in the same module).

AST-based like test_meta_windows: only real call sites count, never
docstrings or comments.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "acousticbrainz_server_spark"


def _iter_sources():
    for path in sorted(PKG.rglob("*.py")):
        yield path, path.read_text()


def test_no_row_at_a_time_udfs():
    offenders = []
    for path, src in _iter_sources():
        for node in ast.walk(ast.parse(src)):
            # F.udf(...) / udf(...) calls and @udf decorators; pandas_udf and
            # udtf are the sanctioned vectorized forms and don't match.
            name = None
            if isinstance(node, ast.Call):
                f = node.func
                if isinstance(f, ast.Attribute):
                    name = f.attr
                elif isinstance(f, ast.Name):
                    name = f.id
            if name == "udf":
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"row-at-a-time udf() call sites: {offenders}"


ANNOTATION = "# allpairs-by-design:"
LOOKBACK = 4


def test_every_crossjoin_broadcasts_its_right_side():
    offenders = []
    for path, src in _iter_sources():
        lines = src.splitlines()
        for node in ast.walk(ast.parse(src)):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "crossJoin"
                and node.args
            ):
                continue
            arg = node.args[0]
            ok = (
                isinstance(arg, ast.Call)
                and (
                    (isinstance(arg.func, ast.Attribute) and arg.func.attr == "broadcast")
                    or (isinstance(arg.func, ast.Name) and arg.func.id == "broadcast")
                )
            )
            if ok:
                continue
            ctx = lines[max(0, node.lineno - 1 - LOOKBACK) : node.lineno]
            if any(ANNOTATION in ln for ln in ctx):
                continue
            offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"crossJoin without F.broadcast(right): {offenders}"
