"""Query registry — the declared logical plans of the engine.

Every operator the engine claims (SURVEY.md §2) is registered here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB
runs on the same parquet tables.  The driver's correctness gate compares the
two (row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in both formulations;
- floating-point aggregates are rounded in BOTH (fp addition order differs
  between engines; rounding makes the hash stable);
- output column sets are flat (no maps) unless serialized to JSON strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for the DuckDB oracle; None = rows-only check
    family: str  # SURVEY.md §2 operator id(s), e.g. "J4", "A6,F13"
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, *, oracle: str | None, family: str, doc: str = ""):
    """Decorator: register a Spark query callable under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, family=family, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    """Import every module that registers queries (import side-effect)."""
    from . import relational  # noqa: F401
    from . import vectors  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import domain  # noqa: F401
    from . import metric_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
