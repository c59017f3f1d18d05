"""Frequency-sketch operators: Misra-Gries heavy hitters (two-pass exact).

The classic scale recipe for "items with relative frequency >= s" over a
stream too large to count exactly per item:

pass 1 — per-partition Misra-Gries summaries with m >= 2/s counters.  MG's
guarantee: an item whose LOCAL count exceeds n_p/m survives the partition's
summary; by pigeonhole, any item with GLOBAL count > n/m (and s*n > n/m by
construction) survives in at least one partition.  The union of partition
candidates is therefore a SUPERSET of the true heavy hitters, and its size is
bounded by m * n_partitions — a driver-safe collect no matter the corpus size.

pass 2 — exact recount of the candidate set only: broadcast semi-join +
grouped count + threshold filter.  The long tail never reaches the shuffle:
at 100 TB this is the difference between shuffling every distinct token
(count-then-filter) and shuffling only candidate rows.

The result is EXACT (guarantee, not estimate) — which is what makes it
oracle-checkable against a plain GROUP BY / HAVING in DuckDB.

Reference framing: the reference engine keeps exact per-class counts at
dataset scale (db/stats.py aggregates); MG is the same contract held at
corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_candidates(item_col: str, n_counters: int):
    """mapInPandas kernel: one Misra-Gries summary per PARTITION, built by
    MERGING per-batch exact counts into the summary (the mergeable-summaries
    form of MG, Agarwal et al. 2012: sum counts, keep the top m, subtract the
    (m+1)-th count — same error bound as item-at-a-time MG).  Per Arrow batch
    this is one vectorized ``value_counts`` + an O(m log m) merge, not a
    Python loop per token — the summary state lives across the partition's
    batches inside the generator."""
    import pandas as pd

    def summarize(batches):
        acc = None
        for pdf in batches:
            counts = pdf[item_col].value_counts()
            acc = counts if acc is None else acc.add(counts, fill_value=0)
            if len(acc) > n_counters:
                acc = acc.sort_values(ascending=False)
                cut = acc.iloc[n_counters]
                acc = acc.iloc[:n_counters] - cut
                acc = acc[acc > 0]
        items = [] if acc is None else list(acc.index)
        yield pd.DataFrame({item_col: pd.Series(items, dtype="object")})

    return summarize


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    support: float,
    count_alias: str = "n",
) -> DataFrame:
    """All items with count >= ceil(support * N), with their EXACT counts.

    ``items`` is the token stream (one row per occurrence).  Two jobs: the
    MG candidate sweep (+ a count() for N), then the recount of candidates.
    """
    if not (0.0 < support < 1.0):
        raise ValueError(f"support must be in (0,1), got {support}")
    n_counters = max(8, math.ceil(2.0 / support))
    stream = items.select(F.col(item_col).cast("string").alias(item_col))
    n_total = stream.count()
    threshold = math.ceil(support * n_total)
    candidates = (
        stream.mapInPandas(_mg_partition_candidates(item_col, n_counters), f"{item_col} STRING")
        .distinct()
    )
    return (
        stream.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) >= threshold)
    )
