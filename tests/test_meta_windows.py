"""Meta-test: no unpartitioned (single-partition) windows without justification.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the entire input
relation through ONE task — the classic 100 TB scale-killer (Spark itself
warns ``WindowExec: No Partition Defined``).  The engine's policy:

- truly global rankings go through the two-pass range-partitioned rank in
  ``functions/rank.py`` (every window there partitions on ``_pid``);
- a global window is allowed ONLY over a provably bounded relation (per-day
  aggregates, top-k lists, distinct-value histograms) or where a rank<=k
  filter lets Catalyst rewrite it to WindowGroupLimit — and every such site
  must carry a ``# bounded-window:`` comment saying WHY within the 4
  preceding lines.

This test fails the build on any new direct ``Window.orderBy`` call missing
the annotation, so the r5 verdict's unpartitioned-window family can't regrow.
AST-based: only real attribute accesses on the ``Window`` name count, never
docstring or comment mentions.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "acousticbrainz_server_spark"

ANNOTATION = "# bounded-window:"
LOOKBACK = 4


def _direct_global_window_calls(src: str) -> list[int]:
    """Line numbers of ``Window.orderBy`` attribute accesses (the value being
    the bare ``Window`` name — ``Window.partitionBy(...).orderBy`` is fine)."""
    out = []
    for node in ast.walk(ast.parse(src)):
        if (
            isinstance(node, ast.Attribute)
            and node.attr == "orderBy"
            and isinstance(node.value, ast.Name)
            and node.value.id == "Window"
        ):
            out.append(node.lineno)
    return out


def test_no_unannotated_global_windows():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        lines = src.splitlines()
        for lineno in _direct_global_window_calls(src):
            context = lines[max(0, lineno - 1 - LOOKBACK) : lineno]
            if not any(ANNOTATION in c for c in context):
                offenders.append(
                    f"{path.relative_to(PKG.parent)}:{lineno}: {lines[lineno - 1].strip()}"
                )
    assert not offenders, (
        "Unpartitioned Window.orderBy without a '# bounded-window:' justification "
        "(use functions/rank.py global_row_number/global_cumsum for truly global "
        "rankings):\n" + "\n".join(offenders)
    )


def test_twopass_rank_windows_are_pid_partitioned():
    """functions/rank.py is the sanctioned alternative — it must never itself
    contain a direct global window (its windows all partition on _pid)."""
    src = (PKG / "functions" / "rank.py").read_text()
    assert _direct_global_window_calls(src) == []
