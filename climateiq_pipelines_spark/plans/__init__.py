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

# ADVICE r7: oracles whose SQL text is unrolled to a FIXTURE-MEASURED
# constant (e.g. the converged-iteration keys unroll to the sf0.01
# stopping round) declare that assumption here — key → fixture dir
# basename.  tools/driver_sim.py consults this when sweeping a
# different sf_dir so an SF change fails attributably ("oracle pinned
# to sf0.01") instead of as a generic hash mismatch.
ORACLE_SF_PINNED: dict[str, str] = {}

# VERDICT r9 task #2: SF-PARAMETERIZED oracle builders.  A key whose
# static ORACLES text unrolls a fixture-measured constant registers a
# builder ``sf_dir -> SQL text`` here; sweep tooling (tools/
# parity_sweep.py, tools/driver_sim.py) prefers the builder so the
# SAME key is fully value-checked at ANY scale factor.  The builder
# derives its unroll depth by running the published stopping rule to
# fixpoint in DuckDB (legitimate: cross-engine stop-round equivalence
# follows from the keys' integer-exact per-round state — see the
# iterative_ext docstrings), then emits the ordinary unrolled text; the
# full value comparison still runs independently on that text.  The
# driver contract (__spark_entry__.oracle_sql() -> static strings at
# sf0.01) is unchanged.
ORACLE_BUILDERS: dict[str, Callable[[str], str]] = {}


def register(
    key: str,
    oracle: str | None = None,
    oracle_sf: str | None = None,
    oracle_builder: Callable[[str], str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle=None`` declares the key
    rows-only (driver's weaker check) — only allowed for the keys SURVEY
    §2 marks rows-only, with the reason in the builder's docstring.
    ``oracle_sf`` records the fixture-dir basename the oracle's
    constants were measured on (see ORACLE_SF_PINNED); ``oracle_builder``
    supplies the SF-parameterized text for other scales (see
    ORACLE_BUILDERS — pinned keys should carry one so sweeps stay
    full-surface)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise KeyError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        if oracle_sf is not None:
            ORACLE_SF_PINNED[key] = oracle_sf
        if oracle_builder is not None:
            ORACLE_BUILDERS[key] = oracle_builder
        return fn

    return deco


# The driver's per-round CORRECTNESS artifact records only the FIRST 50
# registration-order keys (observed: CORRECTNESS_r02.json truncates after
# entry 50), so registration order is certification-priority order and is
# ROTATED each round toward the keys with the oldest (or no) valid
# certification stamp.  Round-2 certified the relational 50; round-3 the
# mandated llm/text/mm/fn/stream/tpch/udf families; round-4 the 29
# late-added keys; round-5 the 30 events-fixture-drift victims; round-6
# the round-5 additions + newly-SQL-checkable sketch/layout keys +
# drift-stale joins; round-7 the never-certified mass registered after
# the r6 window (streaming demos, multimodal codecs, lakehouse,
# formats, graph/retrieval/events, TPC-H wave 3, llm_data_ext head).
#
# Since round 8 the window is EXPLICIT: load_all() reorders QUERIES so
# ROTATION_WINDOW's keys occupy slots 0-49 in the listed order and
# everything else follows in import order.  Rotating a new round is a
# one-list edit here (mirrored by ROTATION_R{N} in tests/test_plans.py)
# instead of an import/decoration shuffle — rounds 6 and 7 both hit
# real ordering hazards doing it the implicit way (SURVEY §11.1).
# tools/driver_sim.py remains the full-surface gate covering every key
# regardless of order.
#
# Round 11 (VERDICT r10 task #1, pre-sequenced in SURVEY §11.3):
# post-r10 the stamp distribution is 32×r6, 50×r7, 50×r8, 50×r9,
# 50×r10 with zero never-certified keys.  THREE keys changed in round
# 10 AFTER their r9 stamps and lead the window (the sort_multikey_nulls
# r9 precedent): llm_dedup_clusters (intermediate distinct removed),
# llm_winnow_neardup (sketch checkpoint added), fn_try_arithmetic
# (overflow legs AND oracle text rebalanced — its r9 stamp certifies
# the old pair).  Then ALL 32 remaining r6 stamps (scan/sink formats,
# the q4/q13/q14/q19/q21/q2 TPC-H block, llm_pipeline_ext's 4,
# events_funnel/cohort, and the 13 r6-stamped join keys incl.
# join_salted_skew + join_asof_tolerance) + the 15 registration-oldest
# r7 stamps (the 14 streaming keys + mm_binary_ingest) = exactly 50.
# mm_decode_features / mm_frame_sample / mm_ppm_decode roll to r12.
# After this round certifies, the oldest stamp anywhere becomes r7
# (steady state: every key re-certified at least once per ~5 rounds).
# Round 10's window (32×r5 + 18×r6) is recorded in SURVEY §11.3's
# as-built log.
ROTATION_WINDOW: list[str] = [
    # changed-after-stamp keys (3) — priority per the r9 precedent
    "llm_dedup_clusters", "llm_winnow_neardup", "fn_try_arithmetic",
    # r6 stamps (32) — scan/sink formats (7)
    "scan_csv_roundtrip", "scan_json_roundtrip",
    "sink_partitioned_parquet", "sink_sorted_bucketed",
    "sink_merge_upsert", "scan_orc_roundtrip", "scan_text_roundtrip",
    # TPC-H block (6)
    "q4_order_priority", "q13_customer_distribution",
    "q14_promo_revenue", "q19_discounted_revenue",
    "q21_suppliers_kept_waiting", "q2_min_cost_supplier",
    # llm_pipeline_ext (4)
    "llm_ngram_contamination", "llm_mixture_weights",
    "llm_seqlen_histogram", "llm_repetition_filter",
    # events analytics (2)
    "events_funnel_steps", "events_cohort_retention",
    # joins (13) — the 11 remaining §2.3 keys + salted/tolerance
    "join_broadcast_dim", "join_shuffle_fact", "join_multikey",
    "join_left_outer", "join_full_outer", "join_left_semi",
    "join_left_anti", "join_cross_small", "join_theta_inequality",
    "join_range_interval", "join_asof_last_event",
    "join_asof_tolerance", "join_salted_skew",
    # r7 stamps, 15 registration-oldest — streaming (14)
    "stream_tumbling_window", "stream_sliding_window",
    "stream_session_window", "stream_watermark_late",
    "stream_stateful_dedup", "stream_running_counts",
    "stream_readstream_demo", "stream_stateful_sessions",
    "stream_sliding_demo", "stream_dedup_watermark_demo",
    "stream_stream_join_demo", "stream_foreachbatch_sink",
    "stream_watermark_spans", "stream_windowed_topk_demo",
    # ...and mm_binary_ingest (1)
    "mm_binary_ingest",
]
def load_all() -> None:
    """Import every operator module so its @register calls run."""
    # Imported lazily to avoid circular imports at package import time.
    from climateiq_pipelines_spark.streaming import (  # noqa: F401
        batch_shapes,
        demos,
    )
    from climateiq_pipelines_spark.operators import multimodal  # noqa: F401
    from climateiq_pipelines_spark.sources import (  # noqa: F401
        lakehouse,
        formats_ext,
    )
    from climateiq_pipelines_spark.operators import (  # noqa: F401
        graph_ext,
        retrieval_ext,
        events_ext,
        queries_tpch_wave3,
    )
    from climateiq_pipelines_spark.operators import llm_data_ext  # noqa: F401
    # (import order below no longer determines the driver window —
    # _apply_rotation_window() reorders QUERIES from ROTATION_WINDOW.)
    from climateiq_pipelines_spark.operators import aggregates  # noqa: F401
    from climateiq_pipelines_spark.sources import scans  # noqa: F401
    from climateiq_pipelines_spark.operators import (  # noqa: F401
        queries_tpch_more,
        llm_pipeline_ext,
        events_analytics,
        queries_tpch_hard,
        joins,
        setops,
        udfs,
        windows,
    )
    from climateiq_pipelines_spark.functions import scalar  # noqa: F401
    from climateiq_pipelines_spark.operators import (  # noqa: F401
        filters,
        sorts,
        queries_tpch,
        text_analysis,
        llm,  # explicit: dedup_graph/vector_ext also import it, but llm's
        # 19 keys must not depend on THEIR import graph (ADVICE r4)
        dedup_graph,
        vector_ext,
        queries_tpch_ext,
        mm_ext,
        ml_iter,
        relational_ext,
    )
    # Round-7 additions — registered last so the certification window
    # above is unaffected; rotation-targeted for round 8+.
    from climateiq_pipelines_spark.operators import iterative_ext  # noqa: F401
    from climateiq_pipelines_spark.sources import lakehouse_txn  # noqa: F401
    from climateiq_pipelines_spark.streaming import txn_sink  # noqa: F401
    from climateiq_pipelines_spark.operators import sketch_ext  # noqa: F401
    from climateiq_pipelines_spark.sources import manifest_read  # noqa: F401
    from climateiq_pipelines_spark.operators import (  # noqa: F401
        sql_surface_ext,
        feature_store_ext,
        spark4_surface,
        corpus_quality_ext,
        graph_ext2,
        ann_ext2,
        analytics_ext2,
        ml_train_ext,
    )
    from climateiq_pipelines_spark.streaming import stateful_timeout  # noqa: F401

    _apply_rotation_window()


def _apply_rotation_window() -> None:
    """Reorder QUERIES so ROTATION_WINDOW fills slots 0-49.

    The driver artifact truncates at 50 entries, so dict insertion
    order IS certification priority.  Keys outside the window keep
    their relative import order.  Idempotent; raises if the window
    names a key no module registered (a typo'd rotation must fail
    loudly, not silently certify the wrong keys).
    """
    missing = [k for k in ROTATION_WINDOW if k not in QUERIES]
    if missing:
        raise KeyError(f"ROTATION_WINDOW names unregistered keys: {missing}")
    if len(ROTATION_WINDOW) != len(set(ROTATION_WINDOW)):
        raise KeyError("ROTATION_WINDOW contains duplicates")
    ordered = {k: QUERIES[k] for k in ROTATION_WINDOW}
    for k, fn in QUERIES.items():
        if k not in ordered:
            ordered[k] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
