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


def register(
    key: str, oracle: str | None = None, oracle_sf: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle=None`` declares the key
    rows-only (driver's weaker check) — only allowed for the keys SURVEY
    §2 marks rows-only, with the reason in the builder's docstring.
    ``oracle_sf`` records the fixture-dir basename the oracle's
    constants were measured on (see ORACLE_SF_PINNED)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise KeyError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        if oracle_sf is not None:
            ORACLE_SF_PINNED[key] = oracle_sf
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
# Round 8 (SURVEY §11.1): 50 of the 54 keys COVERAGE.md stamps `never`
# — relational_ext's 11, llm_data_ext's tail 6, the five never singles
# (mm_wav_decode, set_union_by_name, udtf_native_chunker, fn_struct,
# fn_url), the twelve r7 additions, and sixteen of the twenty r7b keys.
# The four newest never keys (agg_cms_heavy_hitters,
# agg_theta_set_algebra, fn_collation_lcase, fn_try_arithmetic) roll to
# round 9 with the stale r2/r3 stamps (SURVEY §11.2).
ROTATION_WINDOW: list[str] = [
    # relational_ext (11)
    "win_gap_islands", "events_markov_transitions", "join_null_safe",
    "fn_bitwise", "agg_bool_logic", "sort_zorder_locality",
    "agg_linear_fit", "join_interval_overlap", "events_windowed_topk",
    "win_running_distinct", "scd2_build_intervals",
    # llm_data_ext tail (6)
    "llm_bpe_pair_stats", "llm_bpe_apply_merge", "llm_heaps_vocab_growth",
    "llm_dataset_manifest", "llm_zipf_fit", "llm_incremental_dedup",
    # never-certified singles across mixed modules (5)
    "mm_wav_decode", "set_union_by_name", "udtf_native_chunker",
    "fn_struct", "fn_url",
    # r7 additions (12)
    "graph_pagerank_converged", "llm_kmeans_converged",
    "sink_txn_commit_protocol", "sink_txn_conflict_retry",
    "sink_txn_checkpoint", "stream_txn_exactly_once",
    "llm_minhash_jaccard_estimate", "scan_manifest_skipping",
    "sql_recursive_closure", "join_pit_scd2", "fn_variant_json",
    "scan_python_datasource",
    # r7b wave-2/3 (16)
    "llm_gopher_quality", "llm_temperature_mixture",
    "llm_substring_span_dedup", "llm_vocab_coverage", "llm_dataset_split",
    "graph_triangle_count", "graph_label_propagation",
    "llm_mrl_truncated_rerank", "llm_bloom_decontam",
    "llm_ann_recall_eval", "events_attribution_touch",
    "agg_width_bucket_histogram", "events_ewma_smoothing",
    "llm_perceptron_quality", "llm_classifier_eval",
    "stream_state_timeout_flush",
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
    # --- driver window (50) ends inside llm_data_ext, after
    # llm_unigram_logprob (its 7th decoration-order key) ---
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
