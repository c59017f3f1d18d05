"""Domain scalar-function queries (SURVEY.md §2.8) runnable on driver tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import slugify, slugify_nfkd
from ..sources.tables import load_table
from .registry import query


@query(
    "slugify_names",
    family="F3",
    doc="slugify: lower → strip non-word chars → collapse space/hyphen runs "
    "(reference db/dataset.py:14-21).",
    oracle="""
        SELECT c_custkey,
               regexp_replace(
                 trim(regexp_replace(lower(c_name), '[^a-z0-9_ -]', '', 'g')),
                 '[- ]+', '-', 'g') AS slug
        FROM customer
    """,
)
def slugify_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", slugify(F.col("c_name")).alias("slug"))


@query(
    "slugify_names_nfkd",
    family="F3",
    doc="Full-fidelity slugify (NFKD → ascii-ignore, db/dataset.py:14-21) via "
    "an Arrow-batched Pandas UDF — identical to the native path on the "
    "latin-1 range (which covers the TPC names here); golden-tested on "
    "non-latin input in tests/test_scalar_functions.py.",
    oracle="""
        SELECT c_custkey,
               regexp_replace(
                 trim(regexp_replace(lower(c_name), '[^a-z0-9_ -]', '', 'g')),
                 '[- ]+', '-', 'g') AS slug
        FROM customer
    """,
)
def slugify_names_nfkd(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", slugify_nfkd(F.col("c_name")).alias("slug"))


@query(
    "uuid_normalize",
    family="F2,P6",
    doc="MBID normalization: lower-case + shape validation "
    "(webserver/views/api/v1/core.py:196-200) applied to synthetic hex keys.",
    oracle="""
        SELECT doc_id,
               lower(md5(CAST(doc_id AS VARCHAR))) AS gid_normalized,
               CASE WHEN regexp_matches(md5(CAST(doc_id AS VARCHAR)), '^[0-9a-f]{32}$')
                    THEN TRUE ELSE FALSE END AS is_valid
        FROM documents
    """,
)
def uuid_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gid = F.md5(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.lower(gid).alias("gid_normalized"),
        gid.rlike("^[0-9a-f]{32}$").alias("is_valid"),
    )
