"""Query/oracle plan registry — the t2 surface.

Every operator declared in SURVEY.md §2 registers here as
``QUERIES[key] = fn(spark, sf_dir) -> DataFrame`` plus (unless the key is
declared rows-only in SURVEY §2) ``ORACLES[key] = <DuckDB SQL>``.
The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value-hash.

There is no custom parser or IR: PySpark's DataFrame DSL is the query
language and Catalyst is the only IR (SURVEY §3.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle=None`` declares the key
    rows-only (driver's weaker check) — only allowed for the keys SURVEY
    §2 marks rows-only, with the reason in the builder's docstring."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise KeyError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its @register calls run."""
    # Imported lazily to avoid circular imports at package import time.
    from climateiq_pipelines_spark.sources import scans  # noqa: F401
    from climateiq_pipelines_spark.operators import (  # noqa: F401
        filters,
        joins,
        aggregates,
        windows,
        sorts,
        setops,
        llm,
        multimodal,
        text_analysis,
        udfs,
        queries_tpch,
    )
    from climateiq_pipelines_spark.functions import scalar  # noqa: F401
    from climateiq_pipelines_spark.streaming import batch_shapes  # noqa: F401
