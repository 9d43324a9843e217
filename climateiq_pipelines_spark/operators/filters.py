"""Projection / filter / predicate operators (SURVEY.md §2.2) — 4 keys.

All predicates here are Catalyst-pushdown-friendly: they sit on raw
parquet columns ahead of any wide transform, so `.explain` shows them in
PushedFilters at the scan. At 100 TB that is the difference between
scanning a partition-pruned, row-group-skipped slice and the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


@register(
    "proj_computed_columns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def proj_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row double arithmetic is IEEE-deterministic, so no rounding is
    needed: both engines compute the identical expression tree per row."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_comparison_chain",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
      AND NOT (l_returnflag = 'A')
      AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def filter_comparison_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
        & ~(F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_in_like_null",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '%-%'
      AND o_custkey IS NOT NULL
    """,
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@register(
    "filter_between_dates",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
    """,
)
def filter_between_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open timestamp range — the canonical time-partition pruning
    predicate; on a ts-partitioned 100 TB table this prunes partitions."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp_ntz"))
    ).select("event_id", "ts", "event_type")
