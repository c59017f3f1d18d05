"""As-of (most-recent-at-or-before) join — the time-series join Spark lacks.

Spark has no ASOF JOIN physical operator; the naive encodings are a range
join (l.ts >= r.ts → O(|L|·|R|) pair blow-up per key before ranking) or a
per-left-row lateral top-1.  The scalable encoding used here is the
union-and-carry trick:

    union the two inputs on (key, ts, side) with the right payload packed
    into one struct column (null on left rows) → ONE shuffle partitioned by
    key, sorted by (ts, side) → ``last(payload, ignorenulls=True)`` over the
    running window carries the most recent right payload forward → keep left
    rows.

Cost: a single hash shuffle of |L| + |R| narrow rows and one sort — exactly
what any windowed aggregation pays; no intermediate pair stream at any
scale.  Right rows sort BEFORE left rows at equal ts (side 0 < 1), giving
inclusive at-or-before semantics, matching DuckDB's ``ASOF JOIN`` (the
oracle for the registered query).  Ties inside the right side (two right
rows sharing (key, ts)) are resolved by ``tie_break``: the window orders by
it ascending so the HIGHEST tie-break value is carried — a free, in-window
dedup that costs no extra shuffle; without it the caller must dedupe to one
row per (key, ts), the DuckDB/kdb contract.

At 100 TB: the shuffle key is the join key — skew mitigations are the same
as any keyed window (salt by time-bucket: run the carry per (key, day) with
a per-key seed row carried from the previous bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str],
    prefix: str = "r_",
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right row with
    right.ts <= left.ts on the same key (NULLs when no such row).

    ``right_cols``: right payload columns to carry (prefixed in the output).
    ``tie_break``: optional right column resolving (key, ts) ties — the row
    with the HIGHEST value wins (in-window; no extra shuffle).
    """
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_rp")
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    ).alias("_rp")

    tb_cols = []
    if tie_break is not None:
        tb_type = right.schema[tie_break].dataType.simpleString()
        tb_cols = [("_tb", lambda side: F.col(tie_break) if side == 0 else F.lit(None).cast(tb_type))]

    l_side = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("_side"), F.struct("*").alias("_lrow"), null_payload,
        *[f(1).alias(n) for n, f in tb_cols],
    )
    r_side = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("_side"), F.lit(None).cast(l_side.schema["_lrow"].dataType).alias("_lrow"), payload,
        *[f(0).alias(n) for n, f in tb_cols],
    )
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tie_break is not None:
        # right rows (side 0) at equal ts order by tie_break asc -> the max
        # tie-break row is LAST and wins the carry; left-side nulls sort
        # first within side 1, irrelevant to the carry
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.select(*out_cols)
