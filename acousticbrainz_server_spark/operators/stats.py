"""Submission statistics (SURVEY.md §2.4 A8, §2.2 P9, §2.8 F5/F6).

Reference semantics (db/submission_stats.py:80-108, 221-276): for every day D
in the covered range, the stats row at D holds counts of submissions with
``submitted < D`` — i.e. CUMULATIVE counts at each midnight — as six keys:
lossy/lossless/total × all/unique.

The reference recomputes three full-table aggregates per day in a loop.  Here
it is ONE pass: per-day increments (split by lossless; plus per-(gid[,class])
first-submission days for the unique counts) densified over the full day
range, then cumulative window sums.  At 100 TB this is two shuffles (day
grouping, gid first-day grouping) instead of 3×N_days table scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATS_KEYS = [
    "lowlevel-lossy",
    "lowlevel-lossy-unique",
    "lowlevel-lossless",
    "lowlevel-lossless-unique",
    "lowlevel-total",
    "lowlevel-total-unique",
]


def compute_daily_stats(lowlevel: DataFrame) -> DataFrame:
    """One row per day D (``collected`` = midnight of D, first row = the day
    after the earliest submission): cumulative counts of rows submitted < D.
    Column names = STATS_KEYS with '-' -> '_' (Spark identifiers).
    """
    ll = lowlevel.select("gid", "lossless", F.to_date("submitted").alias("day"))

    # per-day submission increments split by lossless
    per_day = (
        ll.groupBy("day")
        .agg(
            F.sum(F.when(F.col("lossless"), 1).otherwise(0)).alias("inc_lossless"),
            F.sum(F.when(F.col("lossless"), 0).otherwise(1)).alias("inc_lossy"),
        )
    )
    # per-day NEW-unique increments: a gid counts on its first day (per class
    # and overall — a gid may be unique in both lossy and lossless)
    first_class = (
        ll.groupBy("gid", "lossless").agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("lossless"), 1).otherwise(0)).alias("inc_lossless_u"),
            F.sum(F.when(F.col("lossless"), 0).otherwise(1)).alias("inc_lossy_u"),
        )
    )
    first_any = ll.groupBy("gid").agg(F.min("day").alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("inc_total_u")
    )

    # densify: every day from earliest submission to the last
    bounds = ll.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))

    merged = (
        days.join(per_day, "day", "left")
        .join(first_class, "day", "left")
        .join(first_any, "day", "left")
        .na.fill(0)
    )
    # bounded-window: input is the per-DAY aggregate — O(days) rows at any corpus size
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        "day",
        F.sum("inc_lossy").over(w).alias("lowlevel_lossy"),
        F.sum("inc_lossy_u").over(w).alias("lowlevel_lossy_unique"),
        F.sum("inc_lossless").over(w).alias("lowlevel_lossless"),
        F.sum("inc_lossless_u").over(w).alias("lowlevel_lossless_unique"),
        F.sum("inc_total_u").over(w).alias("lowlevel_total_unique"),
    ).withColumn("lowlevel_total", F.col("lowlevel_lossy") + F.col("lowlevel_lossless"))

    # stats row at day D counts submitted < D  ->  label with the NEXT midnight
    # (reference _get_next_day, db/submission_stats.py:308-317)
    return cum.withColumn(
        "collected", F.to_timestamp(F.date_add(F.col("day"), 1))
    ).drop("day")


def recent_submissions(lowlevel: DataFrame, lowlevel_json: DataFrame, limit: int = 5, offset: int = 10) -> DataFrame:
    """Last-submissions widget (db/submission_stats.py:46-66): ORDER BY id
    DESC LIMIT 5 OFFSET 10, artist/title pulled from the document tags, rows
    with missing artist/title dropped."""
    joined = lowlevel.select("id", "gid").join(
        lowlevel_json.select(
            "id",
            F.element_at(F.col("data.metadata.tags"), "artist")[0].alias("artist"),
            F.element_at(F.col("data.metadata.tags"), "title")[0].alias("title"),
        ),
        "id",
    )
    return (
        joined.orderBy(F.desc("id"))
        .offset(offset)
        .limit(limit)
        .filter(F.col("artist").isNotNull() & F.col("title").isNotNull())
        .select(F.col("gid").alias("mbid"), "artist", "title")
    )
