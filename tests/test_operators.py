"""Unit tests for the relational operator kernels on tiny in-memory frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from acousticbrainz_server_spark.operators.relational import (
    anti_join_unprocessed,
    assign_submission_offset,
    cap_duplicate_submissions,
    latest_per_group,
    map_collect_json,
    point_lookup,
    topk_per_group,
)


def _subs(spark):
    # (id, gid, submitted) — two gids, interleaved arrival
    rows = [
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-02"),
        (3, "a", "2024-01-03"),
        (4, "a", "2024-01-02"),
        (5, "b", "2024-01-01"),
    ]
    return spark.createDataFrame(rows, "id long, gid string, submitted string")


def test_assign_submission_offset(spark):
    out = assign_submission_offset(_subs(spark), key="gid", order_cols=("submitted", "id"))
    got = {r["id"]: r["submission_offset"] for r in out.collect()}
    # gid a by submitted: id1(01)->0, id4(02)->1, id3(03)->2; gid b: id5->0, id2->1
    assert got == {1: 0, 4: 1, 3: 2, 5: 0, 2: 1}


def test_cap_duplicate_submissions(spark):
    out = cap_duplicate_submissions(_subs(spark), key="gid", order_cols=("submitted", "id"), max_per_key=2)
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 2, 4, 5]  # id3 is gid a's 3rd submission


def test_topk_and_latest(spark):
    df = _subs(spark)
    top = topk_per_group(df, ["gid"], [F.desc("submitted"), F.desc("id")], k=1)
    got = {r["gid"]: r["id"] for r in top.collect()}
    assert got == {"a": 3, "b": 2}
    assert {r["id"] for r in latest_per_group(df, ["gid"], [F.asc("submitted"), F.asc("id")]).collect()} == {1, 5}


def test_point_lookup_broadcast(spark):
    df = _subs(spark)
    keys = spark.createDataFrame([("a",), ("zzz",)], "gid string")
    out = point_lookup(df, keys, ["gid"])
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 4]
    # the key side must be broadcast (no shuffle of the big side)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_anti_join_unprocessed(spark):
    source = _subs(spark)
    processed = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = anti_join_unprocessed(source, processed, ["id"])
    assert sorted(r["id"] for r in out.collect()) == [4, 5]


def test_map_collect_json(spark):
    df = spark.createDataFrame(
        [("x", "m1", 1), ("x", "m2", 2), ("y", "m1", 3)], "gid string, model string, v int"
    )
    out = map_collect_json(df, ["gid"], "model", F.col("v"))
    got = {r["gid"]: r["kv_json"] for r in out.collect()}
    assert got == {"x": "m1:1,m2:2", "y": "m1:3"}


def test_salted_join_and_count(spark):
    """Skew-salted join/count match their unsalted equivalents exactly."""
    from acousticbrainz_server_spark.functions.skew import salted_count, salted_join

    # one pathological hot key (90% of rows) + a tail
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(50)], "k long, name string")

    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k").select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    counts = {r["k"]: r["n"] for r in salted_count(big, "k").collect()}
    expected = {r["k"]: r["count"] for r in big.groupBy("k").count().collect()}
    assert counts == expected


def test_asof_join_semantics(spark):
    """Inclusive at-or-before matching, NULL before first right row, and
    per-key isolation."""
    from acousticbrainz_server_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d")],
        "k long, t long, tag string",
    ).withColumnRenamed("k", "key")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 99, 300.0)], "key long, t long, val double"
    )
    out = {
        r["tag"]: (r["r_t"], r["r_val"])
        for r in asof_join(left, right, on="key", ts_col="t", right_cols=["t", "val"]).collect()
    }
    assert out["a"] == (10, 100.0)  # equal ts matches (inclusive)
    assert out["b"] == (18, 200.0)  # latest of the two priors
    assert out["c"] == (None, None)  # before any right row
    assert out["d"] == (None, None)  # key 2's right row is in the future


def test_interval_self_join_boundaries(spark):
    """Δt == window included, Δt just over excluded, pairs spanning a bucket
    boundary found, equal-ts ties ordered by id, keys isolated."""
    from acousticbrainz_server_spark.operators.rangejoin import interval_self_join

    W = 100
    rows = [
        (1, 10, 95),   # near end of bucket 0
        (1, 11, 105),  # bucket 1, delta 10 (cross-bucket pair)
        (1, 12, 195),  # delta from 95 = 100 == W (included); from 105 = 90
        (1, 13, 296),  # delta from 195 = 101 > W (excluded)
        (1, 14, 296),  # equal ts as 13 -> tie pair ordered by id
        (2, 20, 100),  # other key
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    out = {
        (r["a_id"], r["b_id"]): r["delta"]
        for r in interval_self_join(ev, "user_id", "ts", W, "event_id").collect()
    }
    assert out[(10, 11)] == 10
    assert out[(10, 12)] == 100  # inclusive at exactly W
    assert out[(11, 12)] == 90
    assert (12, 13) not in out and (12, 14) not in out  # 101 > W
    assert out[(13, 14)] == 0  # tie ordered by id
    assert all(a != 20 and b != 20 for a, b in out)  # key isolation
    assert len(out) == 4
