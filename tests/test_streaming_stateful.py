"""stream_stateful_sessions is rows-only for the driver (streaming
execution), so pin its semantics here instead: the closed sessions the
stateful operator emits must equal the batch lag+cumsum sessionizer's
sessions MINUS each user's final one (held open in the state store when
the availableNow stream ends)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import QUERIES
from climateiq_pipelines_spark.registry import read_events_micros

from tests.conftest import SF_SMALL

GAP_US = 30 * 60 * 1_000_000


def batch_closed_sessions(spark, sf_dir):
    # Same footer-branched micros source as the streaming operator under
    # test (registry.read_events_stream_micros's batch twin).
    ev = read_events_micros(spark, sf_dir).select("user_id", "ts_us")
    w = W.partitionBy("user_id").orderBy("ts_us")
    sess = (
        ev.withColumn("prev", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull() | (F.col("ts_us") - F.col("prev") > GAP_US), 1
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    last = W.partitionBy("user_id")
    return (
        sess.withColumn("max_sess", F.max("sess_id").over(last))
        .filter(F.col("sess_id") < F.col("max_sess"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


def canon(pdf):
    return sorted(map(tuple, pdf.itertuples(index=False)))


def test_stateful_sessions_match_batch_closed(spark):
    streamed = QUERIES["stream_stateful_sessions"](spark, SF_SMALL).toPandas()
    batch = batch_closed_sessions(spark, SF_SMALL).toPandas()
    assert len(streamed) > 0
    assert canon(streamed) == canon(batch)
