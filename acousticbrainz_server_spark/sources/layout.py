"""Storage layout for the 100 TB deployment — the writer behind SCALE.md's
"Storage layout" section, tested for actual partition pruning.

The reference stores every submission in one Postgres table and pays a
B-tree probe per lookup (admin/sql/create_tables.sql:1-60).  The Spark
deployment instead lays the fact table out so the two dominant access
patterns are I/O-pruned at the scan:

- **partition by month of the event time** → time-window queries (S9
  incremental dumps, A8 daily stats) touch only the months in range via
  Hive-style partition pruning (`PartitionFilters` in the scan node);
- **sort within partitions by the lookup key** → parquet row-group min/max
  statistics skip pages for point lookups (S2/J6) without any index
  artifact.

`sortWithinPartitions` (not a global `orderBy`): each writer task sorts its
own output — no extra exchange, append-friendly per micro-batch, and the
row-group stats only need LOCAL ordering to be selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


PARTITION_COL = "p_month"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_col: str,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by month(ts_col), sorted by sort_col within
    each file — the layout every SCALE.md pruning claim assumes."""
    (
        df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM"))
        .sortWithinPartitions(PARTITION_COL, sort_col)
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession,
    path: str,
    start_month: str,
    end_month: str,
) -> DataFrame:
    """Scan only the months in [start_month, end_month] — the filter is on
    the partition column, so it prunes DIRECTORIES, not rows."""
    return spark.read.parquet(path).filter(
        (F.col(PARTITION_COL) >= start_month) & (F.col(PARTITION_COL) <= end_month)
    )
