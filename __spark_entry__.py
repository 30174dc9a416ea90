"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship ETL pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2), each
``(spark, sf_dir) -> DataFrame``, built from the engine's own operators
(``orion_etl_oracle_to_postgres_spark.queries``).
``oracle_sql()`` — matching DuckDB SQL per query. Since round 8 EVERY
registered query carries one (iterative ops replay via unrolled CTEs;
codec/sketch estimates via bounded-error envelope oracles).
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
    # ---- round-8 window (rotation #5): 40 never-driver-green ----
    # the r7 array-output fixes (VERDICT r7 ask #1) + ex-rows-only pair
    # upgraded to full/bounded oracles (ask #3)
    "emb_whiten",
    "emb_label_centroids",
    "emb_ivf_train",
    "text_compression_ratio",
    # r7-session additions (ask #2 priority list)
    "agg_hist_quantile_state",
    "curation_ccnet_buckets",
    "curation_shard_plan",
    "text_fim_transform",
    "etl_fim_pairs",
    "emb_label_noise",
    "multimodal_audio_gate",
    "etl_ccnet_gate",
    "curation_gate_overlap",
    "profile_corpus_card",
    "reconcile_quantile_drift",
    "curation_length_balance",
    "curation_soft_weighted_sample",
    "agg_event_paths",
    "quantile_weighted_prices",
    # window family, never sampled
    "window_event_transitions",
    "window_order_streaks",
    "window_rolling_revenue",
    "window_price_distribution",
    "window_cohort_retention",
    # text-analysis family, never sampled
    "text_vocab_topk",
    "text_tfidf_top_terms",
    "text_word_entropy",
    "text_zipf_slope",
    "text_readability",
    "text_pii_incidence",
    # quantile family, never sampled
    "quantile_exact_prices",
    "quantile_normalize_prices",
    "quantile_winsorize_prices",
    "quantile_freq_bins",
    "quantile_mad_outliers",
    # SCD/CDC + DQ + plugin surfaces, never sampled
    "scd1_customer_balances",
    "scd3_customer_segments",
    "cdc_snapshot_events",
    "dq_expectations_customer",
    "udtf_split_sentences",
]
# Round-9 rotation candidates (never driver-sampled as of r8, 57 left):
# profile_histogram_prices, agg_supplier_concentration,
# dedup_impact_report/incremental_minhash,
# etl_extract_ops/curriculum/intradoc_rewrite/gopher_gate,
# text_vocab_richness/vocab_topk_pruned/vocab_approx_topk/
# unigram_logprob/ngram_novelty/distinctive_terms/contrastive_views/
# url_normalize/unicode_normalize/chunk_windows/chunk_stats/
# classifier_calibration, ir_ndcg_audit/retrieve_rerank, pack_
# training_sequences/bin_stats, emb_knn_join_lsh(+_multi)/
# quantize_error/centroid_drift/hard_negatives,
# curation_stratified_sample/split_leakage/stable_ids/balance_groups/
# sample_n/priority_sample/quality_cutoff/curriculum_order/
# uncertainty_sample, reconcile_snapshot_diff/diff_summary/
# distribution_drift, json_variant_events, affinity_part_pairs,
# range_clicks_before_error, agg_distinct_users_daily(+approx)/
# incremental_state/price_qty_regression/above_avg_orders/
# profit_by_nation_year/idle_rich_customers/events_gapfill/
# pivot_status_revenue/hll_incremental_users,
# privacy_k_anonymity_stats/t_closeness, corpus_curate,
# plus the r8-session additions (etl_soft_dedup_shared,
# etl_decontaminate_minhash, etl_decontaminate_semantic,
# curation_unimax_mixture, etl_unimax_sample, emb_pca_power,
# emb_pca_top2, emb_abtt_project, emb_decontaminate,
# profile_benford_prices, dq_benford_gate, etl_whiten_vectors,
# etl_corpus_curate_v3)
# — keep rotating ~40/round; cumulative driver-verified after r8 ≥
# 209/279 (+ new registrations).


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
