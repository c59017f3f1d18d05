"""Skew-mitigation primitives for 100 TB-scale joins and aggregations.

The reference never faces skew (Postgres, single node); at cluster scale a
handful of hot keys (one viral recording's gid, an empty-string tag, a
default sha) can pin an entire stage on one task.  Two standing mitigations:

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py) handles sort-merge joins automatically — prefer it.
- When the small side is too big to broadcast AND the big side's key
  histogram is pathological (AQE splits by partition size, which cannot help
  when ONE key exceeds a partition), use ``salted_join``: replicate the
  small side n_salts times and scatter the big side's hot keys uniformly.

``salted_count`` shows the same trick for high-cardinality-output
aggregations whose single hot group would otherwise serialize (exact
count-distinct style two-phase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small ON on`` with the hot-key pressure spread over
    ``n_salts`` sub-keys.

    big gets a uniform random salt in [0, n_salts); small is replicated once
    per salt value (explode of a literal range — n_salts × |small| rows).
    The shuffle key becomes (on, salt), so one hot key occupies n_salts
    reducers instead of one.  Semantics identical to the plain join for
    inner/left joins keyed on ``on``.
    """
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_small = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def hot_cold_split_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    hot_keys: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The known-hot-key split: route the hot keys' facts through an
    all-broadcast path and only the cold long tail through the shuffle join.

    AQE's skew-join splits oversized SHUFFLE partitions, but when the hot
    keys are known up front (catalog stats, a heavy-hitter sketch) the
    stronger plan is to never shuffle the heavy mass at all: semi-join the
    facts against the broadcast hot-key set, broadcast just those keys' dim
    rows onto them, and let only the tail take the ordinary join.  Returns
    ``(hot_joined, cold_joined)`` — the caller unions and aggregates; the
    pair is exactly equivalent to ``facts JOIN dim ON fact_key = dim_key``.

    ``hot_keys`` is a small (broadcastable) single-column DataFrame of key
    values; its column name is irrelevant.

    Plan contract (pinned by tests/test_plans.py): the hot branch contains
    ONLY BroadcastHashJoins — no sort-merge join, no exchange of the hot
    facts.
    """
    hot = hot_keys.select(F.col(hot_keys.columns[0]).alias(fact_key))
    hot_dim = dim.join(
        F.broadcast(hot.withColumnRenamed(fact_key, dim_key)), dim_key, "left_semi"
    )
    hot_facts = facts.join(F.broadcast(hot), fact_key, "left_semi")
    hot_joined = hot_facts.join(
        F.broadcast(hot_dim), hot_facts[fact_key] == hot_dim[dim_key]
    )
    cold_facts = facts.join(F.broadcast(hot), fact_key, "left_anti")
    cold_joined = cold_facts.join(dim, cold_facts[fact_key] == dim[dim_key])
    return hot_joined, cold_joined


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count per key: partial counts on (key, salt), final sum on
    key.  For algebraic aggregates Spark's partial aggregation already does
    this map-side; the explicit form is the template for non-algebraic
    aggregations (collect_list/percentile) where a hot key must be split."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias("n"))
