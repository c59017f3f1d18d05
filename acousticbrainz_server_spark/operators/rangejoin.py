"""Bucketed range (interval) join — bounded-Δt pairs without the cross product.

A naive range join `a.ts <= b.ts <= a.ts + W` on the same key gives Catalyst
no equi-condition: per key it degenerates to a nested-loop over the key's
whole history.  The bucketed encoding restores an equi-join: with bucket
width = W, every ordered pair within W spans the SAME or ADJACENT buckets,
so tagging the left side with {bucket, bucket+1} and equi-joining the tag
against the right side's bucket finds every candidate exactly once (the two
tags are distinct, and the right row's bucket matches at most one of them —
no dedup pass needed).  The exact Δt predicate then filters the ~2 buckets'
worth of candidates per row.

Cost: one equi-join shuffle on (key, bucket) of 2|L| + |R| rows; candidate
fan-in per row is bounded by the bucket population, not the key history.
At 100 TB: identical plan, with the bucket column doubling as the storage
partition key so the join co-locates; a hot key's bucket population is
bounded by W x event-rate — salt the bucket if a single (key, bucket)
exceeds the partition budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_join(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    window: int,
    id_col: str,
) -> DataFrame:
    """Ordered pairs (a, b) on the same key with 0 <= b.ts - a.ts <= window
    (ties ordered by id).  ``ts_col`` must be integer-valued (e.g. epoch µs).

    Returns (key, a_id, b_id, delta) with delta = b.ts - a.ts.
    """
    # exact integer bucketing: subtract the remainder first so the double
    # division is of an exact multiple (no boundary misbucketing at 1e15 µs)
    bucket = ((F.col(ts_col) - F.col(ts_col) % window) / F.lit(window)).cast("long")
    a = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    b = events.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        bucket.alias("bkt"),
    )
    return (
        a.join(b, ["k", "bkt"])
        .filter(
            (F.col("b_ts") - F.col("a_ts") <= window)
            & (
                (F.col("b_ts") > F.col("a_ts"))
                | ((F.col("b_ts") == F.col("a_ts")) & (F.col("b_id") > F.col("a_id")))
            )
        )
        .select(
            F.col("k").alias(key_col),
            "a_id",
            "b_id",
            (F.col("b_ts") - F.col("a_ts")).alias("delta"),
        )
    )
