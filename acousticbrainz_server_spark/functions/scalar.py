"""Scalar function kernels (SURVEY.md §2.8, F1-F16) + oracle-stable rounding.

Cross-engine float determinism: Spark's ``round`` and DuckDB's ``round`` can
disagree on half-way ties and both sit downstream of order-dependent float
summation.  ``round_half_up``/``sql_round_half_up`` implement the SAME
floor-based formula in both engines, so after rounding the value hashes match.
Always round any float column that crosses the oracle boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int) -> Column:
    """floor(x * 10^d + 0.5) / 10^d — bitwise-identical in Spark and DuckDB."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_round_half_up(expr: str, digits: int) -> str:
    """DuckDB-side twin of :func:`round_half_up`."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


# --- F4: seconds -> M:SS / H:MM:SS formatting (reference db/data.py:1008-1009,
#     webserver/views/data.py:149-161) -------------------------------------------------
def format_duration(seconds: Column) -> Column:
    """Whole seconds -> 'M:SS' (hours folded into minutes like the reference's
    time.strftime-based short format for <1h tracks)."""
    secs = seconds.cast("long")
    return F.concat_ws(
        ":",
        (secs / 60).cast("long").cast("string"),
        F.lpad((secs % 60).cast("string"), 2, "0"),
    )


def sql_format_duration(expr: str) -> str:
    # NB: DuckDB's CAST(double AS BIGINT) ROUNDS; Spark's truncates.  floor()
    # first so both engines agree.
    e = f"CAST(floor({expr}) AS BIGINT)"
    return f"concat(CAST(({e}) // 60 AS VARCHAR), ':', lpad(CAST(({e}) % 60 AS VARCHAR), 2, '0'))"


# --- F9/F11: circular embedding (reference similarity/metrics.py:89-96, 120-140) -----
TWO_PI = 2.0 * math.pi


def circle_embedding(value: Column) -> tuple[Column, Column]:
    """[cos(2*pi*v), sin(2*pi*v)] — used for key / bpm / onset-rate metrics."""
    angle = value * F.lit(TWO_PI)
    return F.cos(angle), F.sin(angle)


# --- F3: slugify (reference db/dataset.py:14-21) --------------------------------------
def slugify(col: Column) -> Column:
    """lower, strip non-word chars, collapse whitespace/hyphens to single '-'.

    NFKD->ascii transliteration of the reference is approximated with a
    translate of common accents; full unicodedata normalization would need a
    Pandas UDF and is overkill for slug keys.
    """
    c = F.lower(col)
    c = F.translate(c, "àáâäãåèéêëìíîïòóôöõùúûüñç", "aaaaaaeeeeiiiiooooouuuunc")
    c = F.regexp_replace(c, r"[^\w\s-]", "")
    c = F.regexp_replace(F.trim(c), r"[-\s]+", "-")
    return c
