"""Highlevel read path (SURVEY.md §2.3 J2/J3, §2.4 A6, §2.8 F13) and the
unprocessed-work queue (J4).

Reference semantics: db/data.py:522-601 (load_many_high_level) — a metadata
3-way join plus a model 4-way join aggregated into a per-recording
map<model_name, data>, with

- P8 model-status filter: only status='show' models surface (db/data.py:584),
- F13 class-name mapping: when requested and the model has a class_mapping,
  rewrite the keys of ``all`` and the ``value`` field (db/data.py:480-498),
- the model's extractor version attached to each entry.

Spark-first shape: the ≤25-key request set and the 18-row model dim broadcast;
the only shuffle is the map-collect groupBy on the (unique) recording id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import anti_join_unprocessed


def _mapped_class_data(data: Column, mapping: Column) -> Column:
    """F13: rewrite data.all keys + data.value through class_mapping
    (db/data.py:480-498); passthrough when mapping is NULL."""
    remapped = data.withField(
        "all",
        F.map_from_entries(
            F.transform(F.map_entries(data["all"]), lambda e: F.struct(F.element_at(mapping, e["key"]).alias("key"), e["value"].alias("value")))
        ),
    ).withField("value", F.element_at(mapping, data["value"]))
    return F.when(mapping.isNull(), data).otherwise(remapped)


def load_many_high_level(
    keys: DataFrame,
    lowlevel: DataFrame,
    highlevel: DataFrame,
    highlevel_meta: DataFrame,
    highlevel_model: DataFrame,
    model: DataFrame,
    map_classes: bool = False,
) -> DataFrame:
    """(gid, submission_offset, metadata, highlevel: map<model, data+version>).

    ``keys``: small (gid, submission_offset) request frame.  Recordings whose
    highlevel_meta row is missing (failed submissions, db/data.py:67-91) drop
    out of the result exactly like the reference's inner meta join.
    """
    ll_keys = lowlevel.join(F.broadcast(keys.dropDuplicates()), ["gid", "submission_offset"], "inner").select(
        "id", "gid", "submission_offset"
    )
    meta = (
        ll_keys.join(highlevel.select("id"), "id", "inner")
        .join(highlevel_meta.select("id", F.col("data").alias("metadata")), "id", "inner")
    )

    shown = model.filter(F.col("status") == "show").select(
        F.col("id").alias("_mid"), "model", "class_mapping"
    )
    hlm = highlevel_model.join(F.broadcast(shown), highlevel_model["model"] == F.col("_mid"))
    data = F.col("data").withField("version_id", highlevel_model["version"].cast("string"))
    if map_classes:
        data = _mapped_class_data(data, F.col("class_mapping"))
    models_map = (
        hlm.select(F.col("highlevel").alias("id"), shown["model"].alias("_name"), data.alias("_data"))
        .groupBy("id")
        .agg(F.map_from_entries(F.collect_list(F.struct(F.col("_name"), F.col("_data")))).alias("highlevel"))
    )
    return meta.join(models_map, "id", "left").select("gid", "submission_offset", "metadata", "highlevel")


def get_unprocessed_highlevel(lowlevel: DataFrame, highlevel: DataFrame) -> DataFrame:
    """J4: submissions with no highlevel row — the extractor work queue
    (db/data.py:950-981)."""
    return anti_join_unprocessed(lowlevel, highlevel.select("id"), ["id"])
