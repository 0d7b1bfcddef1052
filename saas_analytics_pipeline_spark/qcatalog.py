"""Query catalog: the driver-facing registry of (Spark query, SQL oracle).

Every operator from SURVEY.md section 2 that has a Key registers here via
the :func:`query` decorator; ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this catalog. Keeping both halves in
one place makes the column-name contract (Spark aliases == oracle aliases)
reviewable side by side.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB ANSI SQL twin; None => rows-only check
    doc: str = ""


QUERIES: dict[str, CatalogEntry] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a (spark, sf_dir) -> DataFrame callable plus its oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = CatalogEntry(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from saas_analytics_pipeline_spark import marts, staging  # noqa: F401
    from saas_analytics_pipeline_spark.operators import (  # noqa: F401
        dedup,
        joins,
        multimodal,
        scd2,
        sessionize,
        similarity,
        text,
    )
    from saas_analytics_pipeline_spark.functions import udfs  # noqa: F401
    from saas_analytics_pipeline_spark.quality import checks  # noqa: F401
    from saas_analytics_pipeline_spark.streaming import jobs, stateful  # noqa: F401


def spark_queries() -> dict[str, SparkQuery]:
    load_all()
    return {k: e.fn for k, e in QUERIES.items()}


def oracles() -> dict[str, str]:
    load_all()
    return {k: e.oracle for k, e in QUERIES.items() if e.oracle is not None}
