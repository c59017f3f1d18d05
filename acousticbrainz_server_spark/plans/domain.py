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


# --------------------------------------------------------------------------------------
# P4/P5 — tag whitelist filter + trackid→recordingid rewrite, oracle-gated
# --------------------------------------------------------------------------------------
def _tag_whitelist_oracle() -> str:
    from ..operators.ingest import TAG_WHITELIST
    from .metric_queries import AB_FIXTURE_DIR

    wl = ", ".join(f"'{t}'" for t in sorted(TAG_WHITELIST))
    return f"""
        WITH ent AS (
          SELECT id, unnest(map_entries(data.metadata.tags)) AS e
          FROM read_parquet('{AB_FIXTURE_DIR}/lowlevel_json.parquet')
        ),
        renamed AS (
          SELECT id,
                 CASE WHEN id % 2 = 1 AND e.key = 'musicbrainz_recordingid'
                      THEN 'musicbrainz_trackid' ELSE e.key END AS key,
                 e.value AS value
          FROM ent
        ),
        trk AS (SELECT id, value FROM renamed WHERE key = 'musicbrainz_trackid'),
        cleaned AS (
          SELECT r.id, r.key, r.value FROM renamed r WHERE lower(r.key) IN ({wl})
        ),
        kept AS (
          SELECT c.id, c.key, c.value
          FROM cleaned c LEFT JOIN trk ON trk.id = c.id
          WHERE trk.id IS NULL OR c.key NOT IN ('musicbrainz_trackid', 'musicbrainz_recordingid')
        ),
        added AS (SELECT id, 'musicbrainz_recordingid' AS key, value FROM trk)
        SELECT id, key AS tag, array_to_string(value, '|') AS val
        FROM (SELECT * FROM kept UNION ALL SELECT * FROM added)
    """


@query(
    "tag_whitelist_rewrite",
    family="P4,P5",
    doc="Tag whitelist filter + musicbrainz_trackid -> recordingid rewrite "
    "(reference webserver/views/api/v1/core.py tag cleaning + "
    "db/tagwhitelist.json) as native map expressions (map_filter / "
    "map_concat / transform_keys) over the AB fixture's nested tag maps — "
    "odd ids are fed with their recordingid renamed to trackid so the "
    "rewrite branch does real work; output is the exploded long form so "
    "every surviving (tag, value) pair is hashed cross-engine.",
    oracle=_tag_whitelist_oracle(),
)
def tag_whitelist_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ingest import clean_tags
    from .metric_queries import AB_FIXTURE_DIR

    llj = spark.read.parquet(f"{AB_FIXTURE_DIR}/lowlevel_json.parquet")
    renamed = llj.withColumn(
        "data",
        F.col("data").withField(
            "metadata.tags",
            F.transform_keys(
                F.col("data.metadata.tags"),
                lambda k, v: F.when(
                    (F.col("id") % 2 == 1) & (k == F.lit("musicbrainz_recordingid")),
                    F.lit("musicbrainz_trackid"),
                ).otherwise(k),
            ),
        ),
    )
    cleaned = clean_tags(renamed)
    return cleaned.select(
        "id", F.explode(F.col("data.metadata.tags")).alias("tag", "vals")
    ).select("id", "tag", F.array_join("vals", "|").alias("val"))


# --------------------------------------------------------------------------------------
# F15 — first-array-element extraction from the nested tag document
# --------------------------------------------------------------------------------------
def _first_artist_oracle() -> str:
    from .metric_queries import AB_FIXTURE_DIR

    return f"""
        SELECT id,
               data.metadata.tags['artist'][1][1] AS first_artist,
               data.metadata.tags['title'][1][1] AS title
        FROM read_parquet('{AB_FIXTURE_DIR}/lowlevel_json.parquet')
    """


@query(
    "first_tag_element",
    family="F15,P1",
    doc="First-array-element extraction from nested tag lists — the "
    "reference's `document['metadata']['tags']['artist'][0]` pattern "
    "(dataset_eval/evaluate.py artist filter, db/data.py tag reads) as a "
    "native nested projection; NULL-safe when the tag is absent.  The scan "
    "reads only the tags map (nested-schema pruning).",
    oracle=_first_artist_oracle(),
)
def first_tag_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .metric_queries import AB_FIXTURE_DIR

    llj = spark.read.parquet(f"{AB_FIXTURE_DIR}/lowlevel_json.parquet")
    tags = F.col("data.metadata.tags")
    return llj.select(
        "id",
        F.element_at(F.element_at(tags, "artist"), 1).alias("first_artist"),
        F.element_at(F.element_at(tags, "title"), 1).alias("title"),
    )
