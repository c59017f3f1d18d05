"""Warm-time profiler for a named subset of registry queries.

Usage: python tools/profile_queries.py [--sf DIR] [--reps N] name [name ...]

Runs each query's Spark plan to completion (count-collect of the materialized
result, matching bench.py's action) REPS times after one warm-up, printing the
min/median warm seconds per query plus the DuckDB oracle time for comparison.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--duck", action="store_true", help="also time the DuckDB oracle")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.checkpointLocation.cleanOnExit", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir("/root/repo/spark-warehouse/_profile_ckpt")

    from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all

    _load_all()

    rows = []
    for name in args.names:
        spec = QUERIES[name]
        # warm-up
        spec.spark_fn(spark, args.sf).collect()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spec.spark_fn(spark, args.sf).collect()
            times.append(time.perf_counter() - t0)
        duck_t = None
        if args.duck and spec.oracle:
            import duckdb

            con = duckdb.connect()
            for t in (
                "region nation customer supplier part orders lineitem events documents embeddings"
            ).split():
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
                )
            con.execute(spec.oracle).fetchall()  # warm
            d0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            duck_t = time.perf_counter() - d0
            con.close()
        rows.append((name, min(times), statistics.median(times), duck_t))
        dtxt = f"  duck={duck_t:.3f}s  ratio={min(times) / duck_t:.1f}x" if duck_t else ""
        print(f"{name}: min={min(times):.3f}s med={statistics.median(times):.3f}s{dtxt}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
