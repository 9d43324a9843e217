"""Round-5 event-analytics extensions: conversion FUNNEL and cohort
RETENTION over the events table — the two canonical product-analytics
queries an events pipeline serves. Loaded after the driver's 50-entry
correctness window (plans.load_all); covered by tools/driver_sim.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table


_FUNNEL_ORACLE = """
    WITH v AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND v.t_view IS NOT NULL
        AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT '1_view' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM v WHERE t_view IS NOT NULL
    UNION ALL
    SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
"""


@register("events_funnel_steps", oracle=_FUNNEL_ORACLE)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel view → click → purchase: per stage,
    the count of users whose first qualifying event happens strictly
    AFTER their previous stage's first event (the sequence constraint
    is what separates a funnel from three independent counts — a click
    before any view does not convert).

    Plan: three user-keyed aggregates chained by user-keyed joins —
    every shuffle in the chain is on user_id, so Catalyst reuses one
    hash partitioning across the stages (no re-exchange between the
    groupBy outputs and the joins that consume them). Stage counts are
    single-row aggregates combined by UNION (no 1-row cross join → no
    nested-loop node). At 100 TB this is the shape to keep: state per
    user is one timestamp per stage, never the event history."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v.filter(F.col("t_view").isNotNull()), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    count = F.count(F.lit(1)).alias("n_users")
    return (
        v.filter(F.col("t_view").isNotNull())
        .agg(count)
        .select(F.lit("1_view").alias("stage"), "n_users")
        .unionByName(
            c.agg(count).select(
                F.lit("2_click_after_view").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(count).select(
                F.lit("3_purchase_after_click").alias("stage"), "n_users"
            )
        )
    )


_RETENTION_ORACLE = """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    f AS (SELECT user_id, min(day) AS day0 FROM d GROUP BY user_id)
    SELECT CAST(f.day0 AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.day0, d.day) // 7 AS BIGINT) AS week_k,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY 1, 2
"""


@register("events_cohort_retention", oracle=_RETENTION_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort RETENTION triangle: users grouped by their first active
    day (the cohort), counted in each subsequent week they return —
    (cohort_day, week_k, n_users). Week offsets are computed as integer
    floor(days/7) from each user's own day0, NOT calendar week
    truncation, so the bucketing is engine-identical (date_trunc week
    boundaries differ between engines/locales) and cohort-relative.

    Plan: distinct (user, day) first — collapses the event stream to at
    most |users|×|days| rows before anything else; then a user-keyed
    min-aggregate and a user-keyed join (same partitioning reused);
    the final aggregate is |cohorts|×|weeks| groups. The heavy lifting
    is all map-side: at 100 TB the distinct's combine discards the
    per-day event multiplicity before the shuffle."""
    d = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    f = d.groupBy("user_id").agg(F.min("day").alias("day0"))
    return (
        d.join(f, "user_id")
        .select(
            F.col("day0").cast("string").alias("cohort_day"),
            F.expr("CAST(datediff(day, day0) div 7 AS BIGINT)").alias("week_k"),
            "user_id",
        )
        .groupBy("cohort_day", "week_k")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
