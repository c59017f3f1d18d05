"""Two-pass global ordering — the 100 TB replacement for single-partition
windows.

``Window.orderBy(...)`` with no partition key funnels the whole relation
through ONE task; every docstring in the engine that carries a
"single-partition window" caveat points here.  The scalable form is the
classic range-partitioned prefix-sum rank:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range (Spark samples boundaries; skew in the key space
   surfaces as partition-size skew, which AQE rebalances).
2. count rows per partition; collect the O(num_partitions) counts and
   prefix-sum them into per-partition offsets (a driver-side vector of a
   few thousand longs at any scale).
3. rank WITHIN each partition (parallel windows partitioned by
   ``spark_partition_id``) and add the broadcast offset.

The result is byte-identical to the single-partition ``row_number`` for
any tie-free sort order, regardless of where the sampled boundaries land —
offsets absorb boundary placement exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranged_with_offsets(
    df: DataFrame,
    cols: list[Column],
    num_partitions: int,
    partial_agg: Column,
) -> tuple[DataFrame, Column]:
    """Shared two-pass core: range-partition on ``cols``, materialize once,
    compute ``partial_agg`` per partition, and return the partitioned frame
    plus a broadcast-map column of exclusive prefix offsets keyed by
    ``_pid``.  The offsets vector is O(num_partitions) on the driver — a few
    thousand longs at any scale.
    """
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # lineage is consumed twice (partials + window); materialize the shuffle once
    ranged = ranged.localCheckpoint(eager=False)
    partials = {
        r["_pid"]: r["v"]
        for r in ranged.groupBy("_pid").agg(partial_agg.alias("v")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += partials[pid] or 0
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return ranged, omap


def global_row_number(
    df: DataFrame,
    *order_cols: str | Column,
    num_partitions: int = 32,
    out_col: str = "global_rank",
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order_cols`` without a
    single-partition window.  ``order_cols`` must be tie-free (include a
    unique id as the last key) — ties across a sampled boundary would
    otherwise make the split ambiguous.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged, omap = _ranged_with_offsets(df, cols, num_partitions, F.count(F.lit(1)))
    w = Window.partitionBy("_pid").orderBy(*cols)
    return ranged.withColumn(
        out_col, (F.row_number().over(w) + omap[F.col("_pid")]).cast("long")
    ).drop("_pid")


def global_cumsum(
    df: DataFrame,
    value_col: str | Column,
    *order_cols: str | Column,
    num_partitions: int = 32,
    out_col: str = "global_cumsum",
) -> DataFrame:
    """Append an INCLUSIVE global running sum of ``value_col`` over
    ``order_cols`` without a single-partition window: per-partition window
    sums plus broadcast exclusive-prefix offsets of the partition totals.

    Exact (order-independent) for integral ``value_col``; for floats the
    partial-sum order differs from a sequential scan, so callers needing a
    hash-stable cumulative float should scale to integers first (see
    ``abc_analysis``).  ``order_cols`` must be tie-free for a deterministic
    result, same contract as :func:`global_row_number`.
    """
    vcol = F.col(value_col) if isinstance(value_col, str) else value_col
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged, omap = _ranged_with_offsets(df, cols, num_partitions, F.sum(vcol))
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranged.withColumn(
        out_col, F.sum(vcol).over(w) + omap[F.col("_pid")]
    ).drop("_pid")
