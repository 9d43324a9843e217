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

# Pristine decoration order (filled by _apply_rotation_window before it
# reorders QUERIES) — see tools/gen_rotation.py.
REGISTRATION_ORDER: list[str] = []


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
# Round 14 (VERDICT r13 task #1; derived by tools/gen_rotation.py
# --max-round 13 --priority q22_global_sales_opportunity,
# q11_important_stock,q17_small_qty_revenue,fn_json,
# udtf_explode_sessions,events_top_paths,agg_pricing_summary
# --exempt <16 keys below>):
# post-r13 the stamp distribution is 25×r8, 30×r9, 46×r10, 45×r11,
# 36×r12, 50×r13 with zero never-certified keys.  The window leads
# with 7 --priority changed-after-stamp keys: the 4 round-13 review-
# batch-F keys whose edits landed after the r13 window had filled
# (q22_global_sales_opportunity — one named-placeholder template,
# q11_important_stock — DECIMAL(38,0) HUGEINT-safe micro-sum,
# q17_small_qty_revenue, fn_json — true JSON validity via
# try_parse_json), and the 2 round-14 ADVICE fixes
# (udtf_explode_sessions — NaT sessions now emit NULL duration like
# the oracle's epoch_us(NULL) instead of raising int(NaT-NaT);
# events_top_paths — NULL-component paths filtered pre-rank on BOTH
# sides, closing the Spark-NULLS-first vs DuckDB-NULLS-last rank
# seam), and the round-14 two-level exact-sum upgrade
# (agg_pricing_summary — the Q1 headline's long-micro accumulator now
# merges per-(keys, partition-id) partials as decimal(38,0), removing
# the ~9e7-rows-per-group 2^63 ceiling at any SF; helpers module
# docstring).  RECORDED EXEMPTIONS (--exempt; mechanical lifecycle edits
# riding normal stamp order): the 9 r13 records re-affirmed
# (fn_conditional, join_bucketed_colocated, stream_sliding_demo,
# stream_dedup_watermark_demo, stream_stream_join_demo,
# stream_windowed_topk_demo, stream_state_timeout_flush,
# events_attribution_touch, agg_width_bucket_histogram) plus the 7
# round-14 new_temp_dir hoist sites — registered bodies whose only
# edit is register_temp_dir(tempfile.mkdtemp(...)) → new_temp_dir(tag)
# (scan_manifest_skipping — also the read-path assert→raise,
# scan_csv_malformed, scan_schema_evolution,
# scan_dynamic_partition_pruning, sink_compression_codecs,
# stream_foreachbatch_sink, mm_binary_file_scan).  The remaining 43
# slots are (stamp round ASC, pristine registration index ASC): ALL
# 25 remaining r8 stamps — retiring the r8 stamp mass entirely — and
# the 18 registration-oldest r9 stamps.  The 11 registration-newest
# r9 stamps slip to round 15 (llm_simhash_bucket — displaced by the
# 7th priority key — plus llm_ngram_jaccard, llm_simhash_neardup,
# llm_corpus_pipeline, llm_stratified_sample, llm_pack_sequences,
# llm_text_normalize, q7_volume_shipping, q10_returned_items,
# q12_priority_by_flag, fn_collation_lcase).  tests/test_plans.py re-runs the derivation in-process
# (priority AND exemption) and asserts list equality.  Round 13's
# window is recorded in SURVEY §11.6's as-built log.
ROTATION_WINDOW: list[str] = [
    # 7 priority keys — changed after their driver stamp (4× r13
    # review batch F, 2× r14 ADVICE fixes, 1× r14 two-level exact sum)
    "q22_global_sales_opportunity", "q11_important_stock",
    "q17_small_qty_revenue", "fn_json", "udtf_explode_sessions",
    "events_top_paths", "agg_pricing_summary",
    # 25 r8 stamps (registration order) — the entire remaining r8 mass
    "sort_zorder_locality", "agg_linear_fit", "join_interval_overlap",
    "events_windowed_topk", "win_running_distinct",
    "scd2_build_intervals", "sink_txn_commit_protocol",
    "sink_txn_checkpoint", "llm_minhash_jaccard_estimate",
    "sql_recursive_closure", "join_pit_scd2", "fn_variant_json",
    "scan_python_datasource", "llm_gopher_quality",
    "llm_temperature_mixture", "llm_substring_span_dedup",
    "llm_vocab_coverage", "llm_dataset_split", "llm_bloom_decontam",
    "events_attribution_touch", "agg_width_bucket_histogram",
    "events_ewma_smoothing", "llm_perceptron_quality",
    "llm_classifier_eval", "stream_state_timeout_flush",
    # 19 registration-oldest r9 stamps
    "join_bucketed_colocated", "topk_global", "limit_offset",
    "q3_shipping_priority", "q6_revenue_forecast", "q18_large_orders",
    "llm_lang_detect", "llm_quality_score", "llm_bpe_tokens",
    "llm_fingerprint", "llm_exact_dedup", "llm_minhash_neardup",
    "llm_minhash_lsh", "llm_token_counts", "llm_tfidf_topterms",
    "llm_text_stats", "llm_lang_filter_sample", "llm_embed_normalize",
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
    # Pristine decoration order, BEFORE the window reorder — the
    # stamp-age tie-break tools/gen_rotation.py sequences rotations by
    # ("registration-oldest" in SURVEY §11.4).  Captured once: the
    # reorder is idempotent, so on a second call QUERIES would already
    # be window-led and recapturing would corrupt the order.
    if not REGISTRATION_ORDER:
        REGISTRATION_ORDER.extend(QUERIES)
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
