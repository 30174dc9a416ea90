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
    # ---- round-9 window (rotation #6): 40 never-driver-green ----
    # r8-session additions first (VERDICT r8 ask #1 priority list)
    "etl_soft_dedup_shared",
    "etl_decontaminate_minhash",
    "etl_decontaminate_semantic",
    "emb_decontaminate",
    "curation_unimax_mixture",
    "etl_unimax_sample",
    "emb_pca_power",
    "emb_pca_top2",
    "emb_abtt_project",
    "etl_whiten_vectors",
    "profile_benford_prices",
    "dq_benford_gate",
    "etl_corpus_curate_v3",
    # agg family, never sampled
    "agg_distinct_users_daily",
    "agg_approx_distinct_users_daily",
    "agg_events_gapfill",
    "agg_above_avg_orders",
    "agg_price_qty_regression",
    "agg_incremental_state",
    "agg_profit_by_nation_year",
    "agg_idle_rich_customers",
    "agg_supplier_concentration",
    "agg_pivot_status_revenue",
    "agg_hll_incremental_users",
    # reconcile + privacy + IR families, never sampled
    "reconcile_snapshot_diff",
    "reconcile_diff_summary",
    "reconcile_distribution_drift",
    "privacy_k_anonymity_stats",
    "privacy_t_closeness",
    "ir_retrieve_rerank",
    "ir_ndcg_audit",
    # dedup/ANN/packing/profile breadth, never sampled
    "dedup_impact_report",
    "dedup_incremental_minhash",
    "emb_knn_join_lsh",
    "emb_hard_negatives",
    "pack_training_sequences",
    "pack_bin_stats",
    "corpus_curate",
    "json_variant_events",
    "profile_histogram_prices",
]
# Round-10 rotation candidates (never driver-sampled as of r9, 30
# left — size rotation #7 to FINISH them, per VERDICT r8 ask #3):
# range_clicks_before_error, curation_quality_cutoff/
# stratified_sample/split_leakage/stable_ids/balance_groups/sample_n/
# priority_sample/curriculum_order/uncertainty_sample,
# text_chunk_windows/chunk_stats/url_normalize/unicode_normalize/
# vocab_topk_pruned/vocab_approx_topk/unigram_logprob/ngram_novelty/
# distinctive_terms/vocab_richness/classifier_calibration/
# contrastive_views, emb_quantize_error/knn_join_lsh_multi/
# centroid_drift, etl_extract_ops/curriculum/intradoc_rewrite/
# gopher_gate, affinity_part_pairs
# + the r9-session additions: etl_decontaminate_shared (persisted-pair
# decontaminate mount), etl_whiten_semantic_dedup (vector_transform →
# semantic dedup composition), etl_corpus_curate_v4 (ONE pair table
# for BOTH near-dup legs), curation_mixture_reweight (DoReMi-style
# linearized-MW domain weights), dedup_bloom_history_probe +
# agg_bloom_incremental_users (mergeable Bloom membership state,
# joinless broadcast-bitmap probe), emb_semdedup_cells +
# etl_semdedup (cell-bounded SemDeDup, least-prototypical survivor,
# standalone + declarative), dedup_ngram_bloom_prescreen (Bloom
# semi-join escape hatch, result-identical to the broadcast twin),
# curation_doremi_sample + etl_doremi_sample + curation_doremi_token_
# sample (DoReMi weights APPLIED to row and TOKEN budgets, operator +
# sample.method: doremi) — cumulative driver-verified after r9 should
# reach >=249/291; rotation #7 can finish the backlog.


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
