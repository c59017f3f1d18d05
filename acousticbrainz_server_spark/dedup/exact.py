"""Exact content dedup via cryptographic hash groupBy.

Reference semantics: lowlevel_json.data_sha256 UNIQUE + ingest-time dup probe
(db/data.py:250-257; index admin/sql/create_indexes.sql:10).  Spark-first: one
hash projection + groupBy(hash) — at 100 TB the shuffle key is the 64-hex
digest (uniform, unskewed); map-side partial aggregation means only (hash,
canonical_id, count) tuples shuffle, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(col: F.Column) -> F.Column:
    """sha256 hex digest (F1; matches DuckDB's sha256())."""
    return F.sha2(col, 256)


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate count."""
    return (
        df.select(content_hash(F.col(content_col)).alias("content_sha256"), F.col(id_col))
        .groupBy("content_sha256")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def drop_exact_duplicates(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep only the canonical (min-id) row per distinct content — the
    ingest-side early-return dedup (db/data.py:252-257)."""
    canon = dedup_exact(df, content_col, id_col).select(F.col("canonical_id").alias(id_col))
    return df.join(canon, id_col, "left_semi")
