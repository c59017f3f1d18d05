"""Order-preserving key↔key lookup maps (J8).

Reference: db/data.py:755-773 (get_mbids_by_ids) and :853-879
(get_ids_by_mbids) — resolve ids to (gid, offset) and back, preserving the
REQUEST order and yielding NULL for misses (the API contract for bulk
endpoints).

Spark-first: the request is a tiny frame; attach an input-index column, left
join (broadcast of the request side against the big table), and restore
request order by the carried index.  The big side never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _local_frame(spark: SparkSession, data: dict) -> DataFrame:
    """pandas-backed literal frame -> JVM LocalTableScan (no Python-RDD path)."""
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(data))


def get_ids_by_mbids(
    spark: SparkSession,
    lowlevel: DataFrame,
    mbid_offsets: Sequence[tuple[str, int]],
) -> DataFrame:
    """(request_index, gid, submission_offset, id|NULL) in request order;
    gids are lower-cased like the reference (db/data.py:853-879)."""
    req = _local_frame(
        spark,
        {
            "request_index": list(range(len(mbid_offsets))),
            "gid": [g.lower() for g, _ in mbid_offsets],
            "submission_offset": [int(o) for _, o in mbid_offsets],
        },
    )
    hit = lowlevel.join(F.broadcast(req), ["gid", "submission_offset"], "inner").select(
        "request_index", "id"
    )
    return req.join(F.broadcast(hit), "request_index", "left").orderBy("request_index").select(
        "request_index", "gid", "submission_offset", "id"
    )


def get_mbids_by_ids(
    spark: SparkSession,
    lowlevel: DataFrame,
    ids: Sequence[int],
) -> DataFrame:
    """(request_index, id, gid|NULL, submission_offset|NULL) in request order."""
    req = _local_frame(spark, {"request_index": list(range(len(ids))), "id": [int(v) for v in ids]})
    hit = lowlevel.join(F.broadcast(req), "id", "inner").select("request_index", "gid", "submission_offset")
    return req.join(F.broadcast(hit), "request_index", "left").orderBy("request_index").select(
        "request_index", "id", "gid", "submission_offset"
    )
