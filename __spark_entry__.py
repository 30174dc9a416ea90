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
    # round-6 rewrites (two-phase global ordering — verify the NEW plans)
    "window_revenue_pareto",
    "window_rfm_segments",
    "agg_revenue_gini",
    "reconcile_ks_drift",
    "reconcile_mannwhitney",
    # streaming batch twins (the parity anchors for streaming/ units)
    "window_events_anomaly",
    "cdc_apply_events",
    "agg_session_stats",
    # the shared-pair-set canonical dedup (restructured this round)
    "dedup_canonical_corpus",
    # TPC-H plan shapes added in round 5, never driver-sampled
    "agg_shipping_priority_top10",
    "agg_late_order_priority",
    "agg_discount_revenue",
    "agg_nation_trade_volume",
    "agg_nation_market_share",
    "agg_returned_revenue_top20",
    "agg_promo_revenue_ratio",
    "agg_top_supplier_revenue",
    "agg_large_volume_orders",
    "agg_brand_type_revenue",
    "agg_waiting_suppliers",
    # curation + declarative pipeline surface additions
    "curation_epoch_mix",
    "curation_top_fraction",
    "curation_kfold",
    "curation_mix_preview",
    "etl_epoch_mix",
    "etl_quality_top_fraction",
    "etl_rewrite_gate",
    "scd2_pit_order_balances",
    # experiments / stats toolkit
    "events_ab_welch",
    "events_ab_cuped",
    "events_bootstrap_ci",
    "profile_benford_audit",
    # similarity / multimodal / text additions
    "multimodal_phash_pairs",
    "emb_int8_topk",
    "emb_kcenter_sample",
    "text_langid_confusion",
    "window_funnel_latency",
    "window_seasonal_backtest",
    "er_blocking_report",
    "privacy_l_diversity",
]
# Round-7 rotation candidates (never driver-sampled as of r6, ~80 left):
# window_event_transitions, profile_layout_advisor/correlations/
# chi_square/customer_table/join_skew/histogram_prices, agg_supplier_
# concentration, dedup_impact_report, etl_extract_ops, text_vocab_
# richness, ir_ndcg_audit, text_classifier_calibration, the §2.8
# coverage demos (agg_cube_status_priority, agg_grouping_sets_orders,
# setop_*, unpivot_part_metrics, sql_recursive_hierarchy, window_order_
# gaps/streaks/rolling_revenue/price_distribution/cohort_retention/
# funnel_conversion), scd1/scd3, cdc_snapshot_events, the quantile
# family, pack_*, emb_knn_join_lsh(+_multi)/label_centroids/quantize_
# error/centroid_drift, text n-gram/entropy/novelty family, curation_
# stratified_sample/split_leakage/stable_ids/balance_groups/sample_n/
# priority_sample/quality_cutoff, reconcile_snapshot_diff/diff_summary/
# distribution_drift, dq_expectations_customer, json_variant_events,
# udtf_split_sentences, affinity_part_pairs, range_clicks_before_error,
# agg incremental/regression/distinct family, corpus_curate, plus the
# r6-session additions (emb_matryoshka_audit, dedup_intradoc_spans,
# etl_intradoc_rewrite, text_pii_incidence, emb_hard_negatives,
# text_span_corruption, dedup_ngram_decontaminate, text_gopher_rules,
# etl_gopher_gate, emb_dim_stats, emb_whiten, etl_decontaminate,
# text_tokenizer_fertility, dedup_contamination_report,
# text_contrastive_views, curation_preference_pairs,
# curation_cap_per_source, curation_dsir_select, dedup_soft_weights,
# curation_rank_ensemble, text_vocab_divergence, dedup_pair_evidence,
# etl_cap_per_source, etl_soft_dedup)
# — keep rotating ~40/round; cumulative driver-verified after r6 ≥
# 130/210.


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
