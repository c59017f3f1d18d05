"""SparkSession factory.

Local-mode settings are tuned for the test/bench harness (local[N], one JVM);
the same builder config is what we would ship to a real cluster, minus master
and driver-memory (which come from spark-submit there).  Key choices:

- AQE on: runtime coalescing / skew-join handling replaces hand-tuned batch
  sizes the reference uses (e.g. ADD_METRICS_BATCH_SIZE=10000,
  reference similarity/manage.py:12) — Spark picks partition sizes at runtime.
- shuffle.partitions ~ cores for local mode; on a 1000-executor cluster this
  would be set ~2-3x total cores (or left to AQE's coalescing with a high
  initial value).
- session timezone pinned UTC: the reference stores TIMESTAMPTZ (UTC) and the
  DuckDB oracle is UTC-naive — pinning makes results comparable.
- Arrow enabled: every Pandas-UDF boundary (external-binary map stage, custom
  dedup kernels) moves data in Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "acousticbrainz_server_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession with engine defaults."""
    # Parallelism belongs to Spark, not to BLAS: numpy kernels inside Pandas
    # UDFs already run in one Python worker per core — letting OpenBLAS spawn
    # its own thread pool per worker oversubscribes cores ~32x (measured 6x
    # wall-clock swings on the sgemm dedup kernel).  Workers inherit this env.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
