"""Reusable relational operator kernels (SURVEY.md §2.2-§2.7).

These are the engine's building blocks, re-expressed Spark-first:

- The reference's per-row SQL loops (keyset pagination, MAX+1 offset
  assignment, LATERAL top-1) become single-pass window functions — one shuffle
  on the partition key instead of N round-trips.
- Point lookups (``WHERE (gid, offset) IN (...)`` — reference db/data.py:460-477)
  become broadcast inner joins: the key set is tiny (≤25 in the reference API),
  so the scan side never shuffles.
- The unprocessed-work discovery (reference db/data.py:950-981, LEFT JOIN …
  IS NULL) is a left_anti join — at 100 TB this is a shuffle on the join key
  for both sides, unless the processed-id side is small enough to broadcast;
  Catalyst + AQE make that call per run.

Scale notes: every kernel here shuffles at most once, on an explicit key.  At
1000 executors the partition key choice (gid / user_id) is high-cardinality and
approximately uniform, so no salting is needed; AQE skew-join handles residual
skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def point_lookup(df: DataFrame, keys: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Batch point lookup: keep rows of ``df`` matching the (small) key set.

    Reference semantics: row-value IN scan, db/data.py:460-477
    (load_many_low_level).  Spark-first: broadcast the key set so the big side
    is a pruned scan + hash probe, no shuffle.
    """
    return df.join(F.broadcast(keys.dropDuplicates(list(key_cols))), on=list(key_cols), how="inner")


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic: pass tie-breakers).

    Reference semantics: per-query neighbor ranking
    (webserver/views/api/v1/similarity.py:38-67) and job-queue pops.  One
    shuffle on the partition key; with AQE this is skew-tolerant.  For very
    small k over very large groups, Spark's WindowGroupLimit pushes the limit
    before the full sort materializes.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def latest_per_group(df: DataFrame, partition_cols: Sequence[str], order_cols: Sequence[Column]) -> DataFrame:
    """LATERAL top-1 per group (reference db/dataset.py:177-184)."""
    return topk_per_group(df, partition_cols, order_cols, k=1)


def assign_submission_offset(
    df: DataFrame,
    key: str = "gid",
    order_cols: Sequence[str] = ("submitted", "id"),
    out_col: str = "submission_offset",
) -> DataFrame:
    """Dense 0-based arrival rank within ``key`` — the reference's
    submission_offset (db/data.py:273-288, MAX(submission_offset)+1 per row)
    computed as one window pass instead of a per-insert MAX query.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(out_col, (F.row_number().over(w) - F.lit(1)).cast("int"))


def cap_duplicate_submissions(
    df: DataFrame,
    key: str = "gid",
    order_cols: Sequence[str] = ("submitted", "id"),
    max_per_key: int = 10,
) -> DataFrame:
    """Keep at most N submissions per key (reference
    MAX_NUMBER_DUPLICATE_SUBMISSIONS=10, config.py.example:59, enforced
    db/data.py:259-262)."""
    return topk_per_group(df, [key], [F.col(c) for c in order_cols], k=max_per_key)


def anti_join_unprocessed(source: DataFrame, processed: DataFrame, on: Sequence[str]) -> DataFrame:
    """Incremental work queue: source rows with no processed counterpart.

    Reference semantics: get_unprocessed_highlevel_documents
    (db/data.py:950-981) — LEFT JOIN … IS NULL.  left_anti lets Catalyst pick
    broadcast-anti when the processed side is small (typical steady state:
    almost everything is processed, so prefer passing only processed KEYS).
    """
    return source.join(processed.select(*on).dropDuplicates(list(on)), on=list(on), how="left_anti")


def map_collect_json(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    value_col: Column,
    out_col: str = "kv_json",
) -> DataFrame:
    """Collapse rows to one deterministic ``k:v`` string map per group.

    Reference semantics: jsonb_object_agg (db/data.py:836-850,
    get_highlevel_models).  Output is a comma-joined, key-sorted ``k:v`` string
    rather than a MapType so results are order-insensitively comparable across
    engines.
    """
    entry = F.concat_ws(":", F.col(key_col).cast("string"), value_col.cast("string"))
    return (
        df.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(entry)).alias("_entries"))
        .withColumn(out_col, F.concat_ws(",", "_entries"))
        .drop("_entries")
    )
