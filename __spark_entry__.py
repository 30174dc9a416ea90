"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ETL pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2), each
``(spark, sf_dir) -> DataFrame``, built from the engine's own operators
(``orion_etl_oracle_to_postgres_spark.queries``).
``oracle_sql()`` — matching DuckDB SQL per query (omitted for the few
ops whose hash choices are engine-specific → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orion_etl_oracle_to_postgres_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.etl_customer_pipeline(spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST 50 entries of queries().
# Rounds 1-4 always exposed the same first-50 registrations, so later
# operators never earned a driver-verified row.  This priority list rotates
# the window: ~10 core ETL-parity anchors + the highest-value queries the
# driver has never sampled (round-4 flagships: PQ/ADC/IVF-PQ, span dedup,
# cross-corpus MinHash join, ER, token-budget sampling, SCD2-in-spec,
# declarative curation/quarantine/anonymize, BM25/RRF retrieval) + this
# round's new queries.  Every oracle is unchanged; only dict order moves.
_FIRST_50 = [
    # core ETL-parity anchors (reference-surface regression canaries)
    "etl_customer_pipeline",
    "etl_transform_ops",
    "etl_where_pushdown",
    "etl_validation_policies",
    "etl_lookup_default",
    "etl_self_lookup",
    "agg_pricing_summary",
    "window_top_orders_per_cust",
    "dedup_minhash",
    "emb_topk_query",
    # ---- round-7 window (rotation #4): 40 never-driver-sampled ----
    # r6-session additions: decontamination / dedup evidence chain
    "dedup_ngram_decontaminate",
    "dedup_winnow_pairs",
    "dedup_contamination_report",
    "dedup_soft_weights",
    "dedup_pair_evidence",
    "dedup_intradoc_spans",
    # r6-session additions: curation / selection
    "curation_dsir_select",
    "curation_preference_pairs",
    "curation_rank_ensemble",
    "curation_cluster_safe_split",
    "curation_cap_per_source",
    "events_recency_sample",
    # r6-session additions: declarative pipeline stages
    "etl_decontaminate",
    "etl_augment_pairs",
    "etl_soft_dedup",
    "etl_cap_per_source",
    # r6-session additions: text analysis
    "text_gopher_rules",
    "text_span_corruption",
    "text_vocab_divergence",
    "text_tokenizer_fertility",
    # r6-session additions: embeddings QA + graph + multimodal
    "emb_vector_quality",
    "emb_dim_stats",
    "emb_whiten",
    "emb_matryoshka_audit",
    "graph_supplier_pagerank",
    "multimodal_video_near_dups",
    # streaming batch twin still unverified (VERDICT r6 ask #5)
    "reconcile_js_drift",
    # §2.8 SQL-coverage demos, never sampled
    "agg_cube_status_priority",
    "agg_grouping_sets_orders",
    "setop_segments_in_both",
    "setop_priority_except_all",
    "unpivot_part_metrics",
    "sql_recursive_hierarchy",
    "window_order_gaps",
    "window_funnel_conversion",
    # profiling family, never sampled
    "profile_layout_advisor",
    "profile_correlations",
    "profile_chi_square",
    "profile_customer_table",
    "profile_join_skew",
]
# Round-8 rotation candidates (never driver-sampled as of r7, ~81 left):
# window_event_transitions/order_streaks/rolling_revenue/
# price_distribution/cohort_retention, profile_histogram_prices,
# agg_supplier_concentration, dedup_impact_report/incremental_minhash,
# etl_extract_ops/curriculum/intradoc_rewrite/gopher_gate,
# text_vocab_richness/topk(+_pruned/approx)/tfidf_top_terms/word_
# entropy/unigram_logprob/ngram_novelty/distinctive_terms/zipf_slope/
# readability/pii_incidence/contrastive_views/url_normalize/unicode_
# normalize/chunk_windows/chunk_stats/classifier_calibration,
# ir_ndcg_audit/retrieve_rerank, scd1/scd3, cdc_snapshot_events,
# quantile_exact/normalize/winsorize/freq_bins/mad_outliers, pack_
# training_sequences/bin_stats, emb_knn_join_lsh(+_multi)/label_
# centroids/quantize_error/centroid_drift/hard_negatives/ivf_train,
# curation_stratified_sample/split_leakage/stable_ids/balance_groups/
# sample_n/priority_sample/quality_cutoff/curriculum_order/
# uncertainty_sample, reconcile_snapshot_diff/diff_summary/
# distribution_drift, dq_expectations_customer, json_variant_events,
# udtf_split_sentences, affinity_part_pairs, range_clicks_before_error,
# agg_distinct_users_daily(+approx)/incremental_state/price_qty_
# regression/above_avg_orders/profit_by_nation_year/idle_rich_
# customers/events_gapfill/pivot_status_revenue/hll_incremental_users,
# privacy_k_anonymity_stats/t_closeness, corpus_curate,
# text_compression_ratio, plus the r7-session additions
# (agg_hist_quantile_state, curation_ccnet_buckets, curation_shard_plan,
# text_fim_transform, etl_fim_pairs, emb_label_noise,
# multimodal_audio_gate, etl_ccnet_gate, curation_gate_overlap,
# profile_corpus_card, reconcile_quantile_drift, curation_length_balance,
# curation_soft_weighted_sample)
# — keep rotating ~40/round; cumulative driver-verified after r7 ≥
# 170/251 of (251 + new registrations).


def _rotated(mapping: dict, *, strict: bool) -> dict:
    # strict (queries): a typo'd/renamed _FIRST_50 entry must fail
    # LOUDLY — silently skipping it would quietly hand the driver's
    # correctness window to a different query, exactly the gap the
    # list exists to close. ORACLE is the non-strict case only because
    # rows-only queries legitimately have no oracle entry.
    if strict:
        missing = [k for k in _FIRST_50 if k not in mapping]
        if missing:
            raise KeyError(f"_FIRST_50 names not in the registry: {missing}")
    out = {k: mapping[k] for k in _FIRST_50 if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(_q.QUERIES), strict=True)


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(_q.ORACLE), strict=False)
