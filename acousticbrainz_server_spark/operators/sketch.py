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
    batches inside the generator.

    Output: one candidate row per surviving counter (``_n`` NULL) plus ONE
    sentinel row per partition carrying the partition's row count (item
    NULL) — so the global N rides along with the sweep and the caller never
    pays a separate count() pass over the stream.
    """
    import pandas as pd

    def summarize(batches):
        acc = None
        part_n = 0
        for pdf in batches:
            part_n += len(pdf)
            counts = pdf[item_col].value_counts()
            acc = counts if acc is None else acc.add(counts, fill_value=0)
            if len(acc) > n_counters:
                acc = acc.sort_values(ascending=False)
                cut = acc.iloc[n_counters]
                acc = acc.iloc[:n_counters] - cut
                acc = acc[acc > 0]
        items = [] if acc is None else list(acc.index)
        yield pd.DataFrame(
            {
                item_col: pd.Series(items + [None], dtype="object"),
                "_n": pd.Series([None] * len(items) + [part_n], dtype="object"),
            }
        )

    return summarize


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    support: float,
    count_alias: str = "n",
) -> DataFrame:
    """All non-null items with count >= ceil(support * N), with EXACT counts.

    ``items`` is the token stream (one row per occurrence).  NULL items are
    excluded from both the candidates and N (pandas value_counts drops them
    and a semi-join can't match them; callers wanting a null group should
    encode it as a sentinel string first).  Exactly two passes over the
    stream: the MG candidate sweep (which also carries per-partition row
    counts, so N needs no separate job), then the recount of candidates.
    """
    if not (0.0 < support < 1.0):
        raise ValueError(f"support must be in (0,1), got {support}")
    n_counters = max(8, math.ceil(2.0 / support))
    stream = items.select(F.col(item_col).cast("string").alias(item_col)).filter(
        F.col(item_col).isNotNull()
    )
    # localCheckpoint, not persist(): summary feeds two consumers (the N
    # aggregate below and the candidate set in the returned plan); checkpoint
    # blocks are released by the ContextCleaner when the caller drops the
    # result, while a persist() would pin the cached summaries in executor
    # storage for the rest of the session (round-4 advice).
    summary = stream.mapInPandas(
        _mg_partition_candidates(item_col, n_counters), f"{item_col} STRING, _n LONG"
    ).localCheckpoint(eager=True)
    n_total = summary.agg(F.sum("_n")).first()[0] or 0
    threshold = math.ceil(support * n_total)
    candidates = summary.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    return (
        stream.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .filter(F.col(count_alias) >= threshold)
    )
