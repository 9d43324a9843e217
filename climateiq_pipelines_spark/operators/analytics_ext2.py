"""Round-7 analytics extensions #2: marketing ATTRIBUTION (first- vs
last-touch credit per conversion — the standard multi-touch model pair)
and the equi-width HISTOGRAM aggregate (the SQL width_bucket shape in
portable integer arithmetic).

Registered after the driver's 50-entry certification window
(plans.load_all); covered by tools/driver_sim.py; rotation-targeted for
round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import load_table

_CONV_TYPE = "purchase"

_ATTRIB_ORACLE = f"""
    WITH touched AS (
      SELECT event_type, value,
             first_value(CASE WHEN event_type <> '{_CONV_TYPE}'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch,
             last_value(CASE WHEN event_type <> '{_CONV_TYPE}'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    ),
    conv AS (
      SELECT first_touch, last_touch,
             CAST(floor(value * 1000000) AS BIGINT) AS rev_micros
      FROM touched
      WHERE event_type = '{_CONV_TYPE}' AND first_touch IS NOT NULL
    )
    SELECT model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(rev_micros) AS BIGINT) AS revenue_micros
    FROM (
      SELECT 'first_touch' AS model, first_touch AS touch_type, rev_micros
      FROM conv
      UNION ALL
      SELECT 'last_touch' AS model, last_touch AS touch_type, rev_micros
      FROM conv
    )
    GROUP BY model, touch_type
"""


@register("events_attribution_touch", oracle=_ATTRIB_ORACLE)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch ATTRIBUTION: credit each purchase (_CONV_TYPE)
    conversion's
    revenue to the user's FIRST and LAST preceding non-conversion
    touch — the two bookend models of marketing attribution, reported
    as conversion counts + attributed revenue per (model, touch_type).
    Conversions with no preceding touch (cold purchases) are excluded
    from both models identically.

    Plan: both touch lookups are first/last(ignorenulls) over the SAME
    (user_id, ts, event_id) window frame (unbounded preceding .. 1
    preceding), so they share one user exchange and one sort; the
    final aggregate is a 10-row relation. Strictly-before frame (row
    -1) means a conversion can never attribute to itself even if
    models later add conversion-type touches.

    Exactness: revenue is floor(value * 1e6) int64 micros summed as
    integers; window order is (ts, event_id) — a total order, so the
    IGNORE NULLS carry picks identical rows on both engines.

    Scale: one shuffle on user_id; per-user state is the running
    first/last touch — O(1) per row, the streaming-friendly shape
    (the watermark twin would be applyInPandasWithState). No global
    window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    touch = F.when(F.col("event_type") != _CONV_TYPE, F.col("event_type"))
    frame = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    conv = (
        ev.select(
            "event_type",
            "value",
            F.first(touch, ignorenulls=True).over(frame).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(frame).alias("last_touch"),
        )
        .filter(
            (F.col("event_type") == _CONV_TYPE)
            & F.col("first_touch").isNotNull()
        )
        .select(
            "first_touch",
            "last_touch",
            F.floor(F.col("value") * 1000000).cast("long").alias("rev_micros"),
        )
    )
    first = conv.select(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("touch_type"),
        "rev_micros",
    )
    last = conv.select(
        F.lit("last_touch").alias("model"),
        F.col("last_touch").alias("touch_type"),
        "rev_micros",
    )
    return (
        first.unionAll(last)
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum("rev_micros").cast("long").alias("revenue_micros"),
        )
    )


# --- agg_width_bucket_histogram ----------------------------------------
_HIST_LO = 0  # price-domain lower edge
_HIST_HI = 600_000  # upper edge (fixture o_totalprice < 600k)
_HIST_N = 12  # buckets; width 50k

_HIST_ORACLE = f"""
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(floor((o_totalprice - {_HIST_LO})
                 * {_HIST_N} / ({_HIST_HI} - {_HIST_LO})) AS BIGINT),
             0), {_HIST_N - 1}) AS bucket,
             o_totalprice
      FROM orders
    )
    SELECT bucket,
           CAST(bucket * ({_HIST_HI} - {_HIST_LO}) / {_HIST_N}
                + {_HIST_LO} AS BIGINT) AS lo_edge,
           CAST((bucket + 1) * ({_HIST_HI} - {_HIST_LO}) / {_HIST_N}
                + {_HIST_LO} AS BIGINT) AS hi_edge,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 1000000) AS BIGINT))
                AS BIGINT) AS total_micros
    FROM b GROUP BY bucket
"""


@register("agg_width_bucket_histogram", oracle=_HIST_ORACLE)
def agg_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width HISTOGRAM of order totals (the SQL width_bucket
    shape): 12 fixed buckets (_HIST_N) over [0, 600000)
    (_HIST_LO/_HIST_HI),
    clamped at both ends, with per-bucket counts and exact micro sums
    — the one-pass distribution profile dashboards and optimizers both
    build.

    Portability: the bucket index is spelled as explicit floor
    arithmetic (floor((x-lo)*n/(hi-lo)) clamped) rather than
    width_bucket() — one double multiply+divide on identical operands,
    floored, so the index is bit-identical cross-engine and immune to
    the off-by-one flavor differences between engines'
    width_bucket implementations.

    Scale: map-side bucket projection + hash aggregate with partial
    combine — one shuffle of at most _HIST_N rows per mapper. The
    fixed-edge contract (vs data-dependent min/max) is what makes the
    histogram mergeable across runs/partitions at 100 TB."""
    span = _HIST_HI - _HIST_LO
    bucket = F.least(
        F.greatest(
            F.floor(
                (F.col("o_totalprice") - _HIST_LO) * _HIST_N / F.lit(float(span))
            ).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(_HIST_N - 1).cast("long"),
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            bucket.alias("bucket"),
            F.floor(F.col("o_totalprice") * 1000000)
            .cast("long")
            .alias("micros"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("micros").cast("long").alias("total_micros"),
        )
        .select(
            "bucket",
            (F.col("bucket") * span / _HIST_N + _HIST_LO)
            .cast("long")
            .alias("lo_edge"),
            ((F.col("bucket") + 1) * span / _HIST_N + _HIST_LO)
            .cast("long")
            .alias("hi_edge"),
            "n_orders",
            "total_micros",
        )
    )


# --- events_ewma_smoothing ---------------------------------------------
# Halving decay (alpha = 1/2): s_t = (x_t + s_{t-1}) div 2 with s_0 = 0.
# Chosen because the recurrence stays in exact integer arithmetic
# (truncating halving of non-negative micros — floor == trunc), so the
# whole smoothed series is bit-identical cross-engine; any alpha = 1/2^k
# generalizes with k shifts. Zero-init is part of the declared contract
# (the first few days are biased low — the standard EWMA warm-up).
_EWMA_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
               AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           strftime(MAX(day), '%Y-%m-%d') AS last_day,
           CAST(list_reduce(list_prepend(0, list(x ORDER BY day)),
                            (a, b) -> (a + b) // 2) AS BIGINT)
             AS ewma_micros,
           CAST(SUM(x) // COUNT(*) AS BIGINT) AS mean_micros
    FROM daily GROUP BY event_type
"""


@register("events_ewma_smoothing", oracle=_EWMA_ORACLE)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA trend smoothing per event type: daily revenue totals in
    exact micros folded through the halving recurrence
    s_t = (x_t + s_(t-1)) div 2 — the constant-state smoother behind
    alerting baselines and trend dashboards, in its integer-exact form
    (see the module note on alpha = 1/2). Output per type: day count,
    last day, the final smoothed value, and the plain mean for
    contrast (EWMA ~ recent days; mean ~ all days equally).

    Plan: one (type, day) hash aggregate (map-side partial), then ONE
    per-type ordered fold over the bounded daily series — array length
    is calendar-bounded (days in the fixture window), never
    data-bounded, so the collect_list is a bounded-state aggregate
    (SURVEY §9.4), not a corpus-sized one. The fold is a codegen'd
    aggregate() HOF; at 100 TB the same shape holds because the daily
    pre-aggregate collapses volume before any per-type state exists.
    A streaming twin maintains s_t in applyInPandasWithState with one
    long per key."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("day").alias("last_day"),
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("arr"),
        F.sum("x").cast("long").alias("tot"),
    )
    ewma = F.aggregate(
        F.transform(F.col("arr"), lambda p: p["x"]),
        F.lit(0).cast("long"),
        # ADVICE r7: stay in int64 — `(acc + x) / 2` is double division
        # and loses bit-exactness vs the oracle's integer `//` once the
        # accumulated micros exceed 2^53; shiftright(v, 1) == v // 2
        # for the non-negative revenue totals here.
        lambda acc, x: F.shiftright(acc + x, 1).cast("long"),
    )
    return series.select(
        "event_type",
        "n_days",
        F.date_format("last_day", "yyyy-MM-dd").alias("last_day"),
        ewma.alias("ewma_micros"),
        F.expr("tot div n_days").alias("mean_micros"),
    )
