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


def test_state_timeout_flush_contract(spark):
    """The timeout key's emission contract, re-derived independently:
    every 'gap' row is a non-tail session; at least one tail is flushed
    as 'timeout'; no session is emitted twice; and flushed tails are
    exactly the tails whose timeout fell behind the final watermark."""
    from climateiq_pipelines_spark.streaming.stateful_timeout import (
        _GAP_MS,
        _GAP_US,
        _SPLIT_UID,
        _WM_DELAY_MS,
    )

    ev = read_events_micros(spark, SF_SMALL).select("user_id", "ts_us").collect()
    per_user: dict[int, list[int]] = {}
    for r in ev:
        per_user.setdefault(int(r["user_id"]), []).append(int(r["ts_us"]))
    sessions: dict[int, list[tuple[int, int, int]]] = {}
    for uid, ts in per_user.items():
        ts.sort()
        out, start, last, n = [], ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > _GAP_US:
                out.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.append((start, last, n))
        sessions[uid] = out
    w1 = max(
        t for uid, ts in per_user.items() if uid < _SPLIT_UID for t in ts
    ) // 1000 - _WM_DELAY_MS
    w2 = max(t for ts in per_user.values() for t in ts) // 1000 - _WM_DELAY_MS
    expected = set()
    for uid, sess in sessions.items():
        for s in sess[:-1]:
            expected.add((uid, *s, "gap"))
        end_ms = sess[-1][1] // 1000
        if uid < _SPLIT_UID:
            if end_ms + _GAP_MS < w2:
                expected.add((uid, *sess[-1], "timeout"))
        elif end_ms + _GAP_MS < w2 and w1 + 1 < w2:
            expected.add((uid, *sess[-1], "timeout"))
    pdf = QUERIES["stream_state_timeout_flush"](spark, SF_SMALL).toPandas()
    got = {
        (
            int(r["user_id"]),
            int(r["session_start_us"]),
            int(r["session_end_us"]),
            int(r["n_events"]),
            r["emitted_by"],
        )
        for _, r in pdf.iterrows()
    }
    assert len(got) == len(pdf)  # no duplicate emissions
    assert got == expected
    assert any(e[-1] == "timeout" for e in got), "no timeout ever fired"
