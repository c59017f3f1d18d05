"""Parquet table sources for the driver's synthetic testdata.

The driver materializes TPC-H-ish tables plus ``events`` / ``documents`` /
``embeddings`` under /root/testdata/sf{N}/ (see TESTDATA.md).  Loading is a
plain columnar parquet scan — Catalyst handles predicate pushdown and column
pruning, so callers should select/filter on the returned DataFrame and trust
the optimizer (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def events_ts_is_nanos(path: str) -> bool:
    """Probe the parquet footer: True when events.ts is TIMESTAMP(NANOS)."""
    if not os.path.isfile(path):
        return False
    import pyarrow.parquet as pq

    return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.ts has been written as TIMESTAMP(NANOS) in some testdata
        # generations (Spark's vectorized reader rejects it) and TIMESTAMP(US)
        # in others — probe the footer and adapt rather than assume either.
        path = os.path.join(sf_dir, "events.parquet")
        if events_ts_is_nanos(path):
            # Read nanos as long (runtime-settable legacy conf) and truncate
            # to microseconds EXACTLY like DuckDB's TIMESTAMP_NS -> TIMESTAMP
            # cast.  Integer `div` is essential: nanos ~1.7e18 exceed double
            # precision, so float division corrupts the low digits.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = spark.read.parquet(path)
        # Micros parquet arrives as TIMESTAMP_NTZ; cast to TimestampType so
        # every downstream plan (windows, streaming, comparisons) sees the
        # same type in both generations.  Session tz is UTC — value-identity.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
