import sys, inspect; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from climateiq_pipelines_spark.plans import load_all, QUERIES, ORACLES
load_all()

SECTIONS = [
    ("2.1 scans/sinks", ["scan_parquet_project","scan_all_tables_counts","scan_csv_roundtrip","scan_json_roundtrip","sink_partitioned_parquet","sink_sorted_bucketed"]),
    ("2.2 projection/filter", ["proj_computed_columns","filter_comparison_chain","filter_in_like_null","filter_between_dates"]),
    ("2.3 joins", ["join_broadcast_dim","join_shuffle_fact","join_multikey","join_left_outer","join_right_outer","join_full_outer","join_left_semi","join_left_anti","join_cross_small","join_theta_inequality","join_range_interval","join_asof_last_event"]),
    ("2.4 aggregation", ["agg_pricing_summary","agg_count_distinct","agg_approx_count_distinct","agg_conditional_filter","agg_stats_moments","agg_percentiles","agg_collect_sorted","agg_rollup","agg_cube","agg_grouping_sets","agg_distinct_rows","agg_min_max_by"]),
    ("2.5 windows", ["win_rank_topn_per_group","win_rank_dense_ntile","win_lag_lead_delta","win_running_sum","win_moving_avg_rows","win_range_frame","win_first_last"]),
    ("2.6 sort/limit", ["sort_multikey_nulls","topk_global","limit_offset"]),
    ("2.7 set ops", ["set_union_all","set_union_distinct","set_intersect","set_except","set_dropdup_subset"]),
    ("2.8 scalar functions", ["fn_string","fn_date","fn_math","fn_conditional","fn_array","fn_map","fn_json","fn_hash"]),
    ("2.9 streaming-shaped", ["stream_tumbling_window","stream_sliding_window","stream_session_window","stream_watermark_late","stream_stateful_dedup","stream_running_counts"]),
    ("2.10 LLM pipeline", ["llm_exact_dedup","llm_minhash_neardup","llm_token_counts","llm_tfidf_topterms","llm_text_stats","llm_lang_filter_sample","llm_embed_normalize","llm_cosine_topk","llm_knn_query","llm_centroid_assign","llm_multimodal_join","llm_simhash_bucket"]),
    ("2.11 UDF surface", ["udf_scalar_py","udf_pandas_vectorized","udaf_grouped_pandas","udtf_explode_sessions"]),
    ("bonus (beyond §2)", ["llm_minhash_lsh","stream_readstream_demo","mm_binary_ingest","mm_decode_features","mm_frame_sample","llm_lang_detect","llm_quality_score","llm_bpe_tokens","llm_fingerprint","llm_ivf_topk","llm_cosine_neardup","agg_pivot","win_percent_cume","sink_merge_upsert","join_salted_skew","agg_approx_percentile","llm_ngram_jaccard","llm_simhash_neardup","stream_stateful_sessions","llm_corpus_pipeline","set_intersect_all","set_except_all","scan_orc_roundtrip","agg_hll_sketch_merge","q3_shipping_priority","q6_revenue_forecast","q18_large_orders","llm_stratified_sample","llm_pack_sequences","join_bucketed_colocated","sort_multikey_scalable","stream_watermark_spans","stream_sliding_demo","stream_dedup_watermark_demo","llm_dedup_clusters","llm_simhash_multiprobe","llm_text_normalize","q7_volume_shipping","q10_returned_items","q12_priority_by_flag","llm_cosine_topk_lsh","stream_foreachbatch_sink","q22_global_sales_opportunity","mm_binary_file_scan","llm_kmeans_iterate","llm_pq_encode","llm_ivf_pq_topk","llm_winnow_fingerprint","llm_winnow_neardup","stream_stream_join_demo","q4_order_priority","q13_customer_distribution","q14_promo_revenue","q19_discounted_revenue","llm_ngram_contamination","llm_mixture_weights","llm_seqlen_histogram","llm_repetition_filter","events_funnel_steps","events_cohort_retention","q21_suppliers_kept_waiting","q2_min_cost_supplier","scan_text_roundtrip","agg_unpivot_melt","join_asof_tolerance","mm_ppm_decode","q8_market_share","q9_product_profit","q15_top_supplier","q16_parts_supplier_relation","q17_small_qty_revenue","q20_potential_promotion","sink_merge_on_read","sink_time_travel","udtf_native_chunker","llm_pii_redact","llm_shuffle_shard","q11_important_stock","llm_semdedup","fn_struct","llm_dsir_weights","events_top_paths","events_anomaly_zscore","sink_compact_small_files","scan_csv_malformed","llm_semdedup_pipeline","win_gap_islands","events_markov_transitions","join_null_safe","fn_bitwise","agg_bool_logic","sort_zorder_locality","scan_schema_evolution","llm_chunk_dedup","llm_unigram_logprob","graph_pagerank","llm_inverted_index","llm_sliding_chunks","fn_url","llm_bm25_score","mm_wav_decode","sink_range_partitioned_stats","llm_rrf_fusion","agg_linear_fit","llm_bpe_pair_stats","llm_bpe_apply_merge","join_interval_overlap","events_windowed_topk","scan_dynamic_partition_pruning","set_union_by_name","sink_compression_codecs","stream_windowed_topk_demo","events_rfm_segmentation","win_running_distinct","events_inter_arrival_stats","llm_heaps_vocab_growth","events_type_entropy","llm_dataset_manifest","scd2_build_intervals","llm_zipf_fit","llm_incremental_dedup","graph_pagerank_converged","llm_kmeans_converged","sink_txn_commit_protocol","sink_txn_conflict_retry","stream_txn_exactly_once","llm_minhash_jaccard_estimate","scan_manifest_skipping","sql_recursive_closure","join_pit_scd2","fn_variant_json","scan_python_datasource","sink_txn_checkpoint","llm_gopher_quality","llm_temperature_mixture","llm_substring_span_dedup","graph_triangle_count","llm_mrl_truncated_rerank","llm_bloom_decontam","graph_label_propagation","events_attribution_touch","agg_width_bucket_histogram","llm_vocab_coverage","llm_perceptron_quality","llm_ann_recall_eval","events_ewma_smoothing","llm_dataset_split","stream_state_timeout_flush","llm_classifier_eval","agg_cms_heavy_hitters","agg_theta_set_algebra","fn_collation_lcase","fn_try_arithmetic"]),
]

# Latest driver CORRECTNESS stamp per key: rN where rows/schema/hash all
# true (or "ran rN" for a rows-only row), so stale certifications are
# visible at a glance (VERDICT r5 #2).
import glob, json, re
STAMPS = {}
for path in sorted(glob.glob("CORRECTNESS_r*.json")):
    rnd = re.search(r"r(\d+)", path).group(1).lstrip("0")
    try:
        art = json.load(open(path))
    except Exception:
        continue
    for k, v in art.items():
        if not isinstance(v, dict):
            continue
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
            STAMPS[k] = f"driver r{rnd}"
        elif v.get("err") is None and k not in STAMPS:
            STAMPS[k] = f"ran r{rnd} (no oracle then)"

lines = ["# COVERAGE — SURVEY §2 inventory → implementation (self-audit)", "",
 "Generated by tools/gen_coverage.py from the live registry (regenerate by importing",
 "`climateiq_pipelines_spark.plans`). Oracle column: **sql** = full DuckDB",
 "hash-match at sf0.01 (and sf0.001 in-repo); **rows-only** = declared per",
 "SURVEY §2 with the reason in the docstring. Stamp column: the latest",
 "driver CORRECTNESS artifact whose row for the key is fully green",
 "(rows+schema+hash) — `never` means the key has not yet rotated into a",
 "driver 50-slot certification window; tools/driver_sim.py covers every",
 "key locally each round regardless.", ""]
total = 0
declared = set()
for title, keys in SECTIONS:
    lines.append(f"## §{title}")
    lines.append("")
    lines.append("| key | oracle | driver stamp | implementation |")
    lines.append("|---|---|---|---|")
    for k in keys:
        declared.add(k)
        fn = QUERIES.get(k)
        if fn is None:
            lines.append(f"| `{k}` | **MISSING** | — | — |")
            continue
        total += 1
        src = inspect.getsourcefile(fn).replace("/root/repo/", "")
        line = inspect.getsourcelines(fn)[1]
        orc = "sql" if k in ORACLES else "rows-only"
        stamp = STAMPS.get(k, "never")
        lines.append(f"| `{k}` | {orc} | {stamp} | `{src}:{line}` |")
    lines.append("")
extra = sorted(set(QUERIES) - declared)
if extra:
    lines.append(f"Unlisted registered keys: {extra}")
n_sql = len(ORACLES)
n_core = sum(len(keys) for title, keys in SECTIONS if not title.startswith("bonus"))
n_core_missing = sum(
    1 for title, keys in SECTIONS if not title.startswith("bonus")
    for k in keys if k not in QUERIES
)
core_claim = (
    f"All {n_core} SURVEY §2 keys are implemented"
    if n_core_missing == 0
    else f"**{n_core_missing} of {n_core} SURVEY §2 keys are MISSING (see table)**"
)
lines.append(f"**Totals: {len(QUERIES)} keys registered ({total} tabled), "
             f"{n_sql} with full SQL oracles, {len(QUERIES)-n_sql} rows-only.** "
             f"{core_claim}; {len(QUERIES)-(n_core-n_core_missing)} additional keys extend "
             "the surface (LSH scale path, Structured Streaming demo, "
             "multimodal binary columns, text analysis: lang-ID/quality/"
             "BPE-ish tokens/fingerprints, IVF ANN, bucket-pruned cosine "
             "near-dup, pivot, percent_rank/cume_dist, MERGE-upsert sink, "
             "salted skew join, approx percentile, order-sensitive n-gram "
             "Jaccard near-dup, 60-bit simhash Hamming near-dup, stateful "
             "streaming sessionizer via applyInPandasWithState, end-to-end "
             "corpus-cleaning pipeline, bag-semantics INTERSECT/EXCEPT ALL, "
             "ORC roundtrip, mergeable HLL distinct-count sketches, and the "
             "TPC-H Q3/Q6/Q18 composite query library, deterministic "
             "stratified sampling, training-sequence packing, and a "
             "shuffle-free bucketed co-located join).")
open("COVERAGE.md","w").write("\n".join(lines) + "\n")
print("wrote COVERAGE.md", len(QUERIES), "keys,", n_sql, "oracles")
