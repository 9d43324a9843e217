"""Round-7: EXACTLY-ONCE streaming sink through the transaction log —
the composition that makes both halves real: Structured Streaming's
foreachBatch gives at-least-once batch delivery with a stable
``batch_id``; the lakehouse_txn commit protocol gives put-if-absent
versions. Mapping ``version = batch_id + 1`` makes the sink IDEMPOTENT:
a replayed batch (failure recovery re-delivers the last batch) attempts
the version its first delivery already claimed, loses the atomic-link
race, recognizes its own batch_id in the committed record, and skips —
no duplicate data, no coordination beyond the log. This is precisely
how Delta's ``txnAppId``/``txnVersion`` idempotent writes work.

Registered after the driver's 50-entry certification window
(plans.load_all); rotation-targeted for round 8+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climateiq_pipelines_spark.plans import register
from climateiq_pipelines_spark.registry import (
    ntz_of_window_bound,
    read_events_stream,
)
from climateiq_pipelines_spark.sources.lakehouse_txn import (
    _mk_table,
    _snapshot,
    _write_data,
    commit_idempotent,
)
from climateiq_pipelines_spark.streaming.await_util import await_or_raise


@register(
    "stream_txn_exactly_once",
    oracle="""
    SELECT date_trunc('day', ts) AS win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 AS INTEGER) AS n_commits,
           CAST(1 AS INTEGER) AS n_replays_skipped
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_txn_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE STREAMING SINK: a real streaming query (watermarked
    1-day tumbling counts, update mode, availableNow → one micro-batch
    over the finite fixture) lands in a txn-log table via foreachBatch,
    then the SAME batch is deliberately RE-DELIVERED (the at-least-once
    failure mode foreachBatch documents: after a crash the last batch
    replays with the same batch_id) — and the sink proves idempotence:
    the replay's commit attempt loses the put-if-absent race to its own
    first delivery, matches the committed record's batch_id, and skips.
    The read-back therefore equals the batch aggregation exactly once —
    no double counts — which is what the oracle checks, alongside the
    audit pair (1 commit, 1 replay skipped).

    Scale: the sink adds one log record per micro-batch (O(1) metadata)
    and the data write the batch needed anyway; replay detection reads
    one log record. At 100 TB/day this is the standard idempotent-sink
    recipe — the alternative (dedup-on-read over a keyed sink) costs a
    shuffle per read forever."""
    root = _mk_table("stream")
    audit = {"commits": 0, "replays_skipped": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # availableNow can deliver a trailing EMPTY batch (the watermark
        # advance after the data batch); committing nothing for nothing
        # keeps the log 1:1 with data-bearing batches.
        if batch_df.isEmpty():
            return
        # The whole idempotence recipe is lakehouse_txn's PUBLIC
        # commit_idempotent (round-13 review batch C: it lived inlined
        # here against the txn module's privates; it is generic Delta
        # txnAppId/txnVersion logic and belongs next to the protocol).
        outcome = commit_idempotent(
            root,
            batch_id,
            lambda: _write_data(batch_df, root, f"batch_{batch_id}"),
        )
        audit[
            "commits" if outcome == "committed" else "replays_skipped"
        ] += 1

    agg = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    query = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        await_or_raise(query, 120)
    finally:
        query.stop()

    # Deliberate re-delivery of the completed batch (the documented
    # foreachBatch at-least-once failure mode), fed the same data the
    # stream's batch 0 carried — idempotence must absorb it.
    replay_df = _snapshot(spark, root)
    sink(replay_df, 0)

    latest = _snapshot(spark, root)
    return latest.select(
        ntz_of_window_bound("win_start").alias("win_start"),
        "event_type",
        "n_events",
        F.lit(audit["commits"]).cast("int").alias("n_commits"),
        F.lit(audit["replays_skipped"]).cast("int").alias(
            "n_replays_skipped"
        ),
    )
