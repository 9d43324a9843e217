"""The round-3 streaming demo keys are rows-only for the driver
(incremental execution), so pin their semantics here against the
hash-checked batch twins — the same discipline test_streaming_stateful
applies to the sessionizer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import QUERIES

from tests.conftest import SF_SMALL


def _fmt_ts(df, col):
    return df.withColumn(col, F.date_format(col, "yyyy-MM-dd HH:mm:ss"))


def test_sliding_demo_equals_batch_sliding(spark):
    """availableNow processes the finite fixture in one trigger, so the
    complete-mode sliding aggregation must equal the checked batch
    formulation exactly (watermarks only drop data arriving after the
    watermark advances BETWEEN triggers)."""
    demo = _fmt_ts(
        QUERIES["stream_sliding_demo"](spark, SF_SMALL), "win_start"
    ).toPandas()
    batch = _fmt_ts(
        QUERIES["stream_sliding_window"](spark, SF_SMALL), "win_start"
    ).toPandas()
    assert len(demo) > 0
    canon = lambda pdf: sorted(map(tuple, pdf.itertuples(index=False)))
    assert canon(demo) == canon(batch)


def test_dedup_demo_keeps_exactly_the_distinct_keys(spark):
    """dropDuplicatesWithinWatermark must keep exactly one row per
    (user_id, event_type) — the surviving key SET equals batch
    DISTINCT's even though the representative row is arrival-order
    dependent inside a micro-batch."""
    demo = QUERIES["stream_dedup_watermark_demo"](spark, SF_SMALL).toPandas()
    batch = (
        QUERIES["stream_stateful_dedup"](spark, SF_SMALL)
        .select("user_id", "event_type")
        .toPandas()
    )
    demo_keys = set(map(tuple, demo.itertuples(index=False)))
    batch_keys = set(map(tuple, batch.itertuples(index=False)))
    assert len(demo) == len(demo_keys)  # one row per key
    assert demo_keys == batch_keys


def test_foreachbatch_sink_equals_batch_tumbling(spark):
    """The idempotent read-back of the foreachBatch parquet sink must
    equal the checked batch tumbling aggregation — latest-batch-wins
    merge over update-mode emissions of a finite stream."""
    demo = _fmt_ts(
        QUERIES["stream_foreachbatch_sink"](spark, SF_SMALL), "win_start"
    ).toPandas()
    batch = _fmt_ts(
        QUERIES["stream_tumbling_window"](spark, SF_SMALL).select(
            "win_start", "event_type", "n_events"
        ),
        "win_start",
    ).toPandas()
    canon = lambda pdf: sorted(map(tuple, pdf.itertuples(index=False)))
    assert len(demo) > 0
    assert canon(demo) == canon(batch)


def test_stream_stream_join_equals_batch_interval_join(spark):
    """The watermarked stream-stream join over the finite fixture must
    emit exactly the batch interval join's pairs (availableNow processes
    everything before any state is evicted)."""
    from climateiq_pipelines_spark.registry import load_table

    demo = QUERIES["stream_stream_join_demo"](spark, SF_SMALL).toPandas()
    ev = load_table(spark, SF_SMALL, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
        .toPandas()
    )
    canon = lambda pdf: sorted(map(tuple, pdf.itertuples(index=False)))
    assert len(demo) > 0
    assert canon(demo) == canon(batch)


def test_span_watermark_drops_subset_of_rowexact(spark):
    """The per-span watermark is LAZIER than the row-exact one (it only
    advances at span boundaries), so it can never drop a row the
    row-exact formulation kept — per-window counts must dominate."""
    spans = QUERIES["stream_watermark_spans"](spark, SF_SMALL).toPandas()
    exact = QUERIES["stream_watermark_late"](spark, SF_SMALL).toPandas()
    s = {(r.win_start, r.event_type): r.n_on_time for r in spans.itertuples()}
    e = {(r.win_start, r.event_type): r.n_on_time for r in exact.itertuples()}
    assert set(e) <= set(s)
    for k, n_exact in e.items():
        assert s[k] >= n_exact, k


def test_windowed_topk_demo_equals_batch_topk(spark):
    """The streaming trending-top-k (complete-mode counts + batch rank
    over the sink) must equal ranking the batch tumbling counts —
    per 1-day window, top-3 by (count desc, type asc)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    demo = _fmt_ts(
        QUERIES["stream_windowed_topk_demo"](spark, SF_SMALL), "win_start"
    ).toPandas()
    # independent batch derivation straight off the events table
    from climateiq_pipelines_spark.registry import load_table

    ev = load_table(spark, SF_SMALL, "events")
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("win_start"), "event_type"
        )
        .groupBy("win_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    dw = W.partitionBy("win_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    batch = _fmt_ts(
        daily.withColumn("rank", F.row_number().over(dw))
        .filter(F.col("rank") <= 3)
        .select("win_start", "event_type", "n_events", F.col("rank").cast("int")),
        "win_start",
    ).toPandas()
    assert len(demo) > 0
    canon = lambda pdf: sorted(map(tuple, pdf.itertuples(index=False)))
    assert canon(demo) == canon(batch)
