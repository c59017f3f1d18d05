"""Normalization statistics (V2) — per-dimension mean/stddev of the mfcc/gfcc
mean vectors over a (sample of the) corpus.

Reference semantics: db/similarity_stats.py — TABLESAMPLE of
NORMALIZATION_SAMPLE_SIZE=10000 rows (>=1% of table), then np.mean/np.std
(population) per dimension, stored per metric; the weighted metrics reuse the
unweighted stats (insert_similarity_stats writes the same sample's stats under
all four names).

Spark-first: posexplode + groupBy(dim) + avg/stddev_pop — one shuffle on a
13-value key.  The stats are 2×13 doubles per metric: they come back to the
driver and are embedded as literals in the metric projection (the analog of
the reference's assign_stats), so the big pipeline needs no stats join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_similarity_stats(
    lowlevel_json: DataFrame,
    sample_size: int | None = None,
    seed: int = 42,
) -> dict[str, tuple[list[float], list[float]]]:
    """{"mfccs": (means, stddevs), "gfccs": (means, stddevs)}.

    ``sample_size`` approximates the reference's TABLESAMPLE (fraction-based,
    like SYSTEM sampling); None = full table (what the reference's tests do at
    small scale).  Rows whose feature is absent are excluded.
    """
    feats = lowlevel_json.select(
        F.col("data.lowlevel.mfcc.mean").alias("mfccs"),
        F.col("data.lowlevel.gfcc.mean").alias("gfccs"),
    )
    if sample_size is not None:
        total = lowlevel_json.count()
        fraction = min(1.0, sample_size / max(total, 1))
        feats = feats.sample(fraction=fraction, seed=seed)

    # ONE job for both metrics: tag each exploded element with its metric
    # name and aggregate on (metric, dim) — halves the scans vs a per-metric
    # loop (the reference pulls all four paths in one sample query too,
    # db/similarity_stats.py:95-105)
    tagged = feats.select(
        F.explode(
            F.array(
                F.struct(F.lit("mfccs").alias("metric"), F.col("mfccs").alias("vec")),
                F.struct(F.lit("gfccs").alias("metric"), F.col("gfccs").alias("vec")),
            )
        ).alias("e")
    ).filter(F.col("e.vec").isNotNull() & (F.size("e.vec") > 0))
    per_dim = (
        tagged.select(F.col("e.metric").alias("metric"), F.posexplode("e.vec").alias("dim", "x"))
        .groupBy("metric", "dim")
        .agg(F.avg("x").alias("m"), F.stddev_pop("x").alias("s"))
        .collect()
    )
    out: dict[str, tuple[list[float], list[float]]] = {}
    for name in ("mfccs", "gfccs"):
        rows = sorted((r for r in per_dim if r["metric"] == name), key=lambda r: r["dim"])
        out[name] = ([r["m"] for r in rows], [r["s"] for r in rows])
    return out
