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
    # core ETL-parity anchors (unchanged since rotation #7).
    "etl_customer_pipeline",
    "etl_transform_ops",
    "etl_validation_policies",
    "etl_lookup_default",
    "etl_self_lookup",
    "agg_pricing_summary",
    "window_top_orders_per_cust",
    "dedup_minhash",
    # ---- round-12 window (rotation #9, VERDICT r11 ask #1):
    # (a) ALL FIVE round-11 additions — the only registrations never
    # driver-sampled; green here closes the registry at 306/306
    # cumulative driver verification.
    "agg_kmv_set_ops",
    "agg_kmv_overlap_matrix",
    "agg_kmv_weighted_tokens",
    "curation_incremental_sample",
    "graph_part_communities",
    # (b) the 8 r4 rows deferred from rotation #8 (last verified
    # round 4, 8 rounds stale — the oldest rows in the registry).
    "agg_events_hourly",
    "agg_exact_percentiles",
    "dedup_fingerprint",
    "emb_near_dup_pairs",
    "multimodal_frames",
    "multimodal_resize",
    "emb_topk_lsh",
    "curation_weighted_sample",
    # (c) drift re-checks: the 29 stalest round-5 rows (last verified
    # round 5, 7 rounds stale), in registry order.  The 11 remaining
    # r5 rows (dedup_minhash_join, emb_pq_adc_materialized,
    # chunk_length_batches, text_bpe_pair_counts, text_bpe_merges,
    # dedup_repeated_spans_strided, text_bpe_encode,
    # curation_temperature_mix, reconcile_table_checksum,
    # dq_referential_integrity, corpus_curate_v2) defer to
    # rotation #10 together with the round-6 window.
    "agg_regional_supplier_revenue",
    "scd2_customer_balances",
    "skew_salted_cohort_join",
    "etl_scd2_segment",
    "dedup_incremental_batch",
    "emb_knn_join",
    "etl_validation_quarantine_clean",
    "etl_validation_quarantine_rows",
    "etl_anonymize_ops",
    "etl_curation_mix_split",
    "text_bm25_rank",
    "dedup_containment",
    "emb_semantic_dedup",
    "er_fuzzy_join_parts",
    "ir_rrf_fusion",
    "privacy_k_anonymity",
    "emb_lsh_recall_audit",
    "text_bigram_logprob",
    "er_resolve_parts",
    "dedup_repeated_spans",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "agg_custorder_distribution",
    "agg_small_qty_revenue",
    "curation_token_budget",
    "emb_ivf_pq_topk",
    "emb_pq_recall_audit",
    "text_quality_classifier",
    "text_quality_classifier_trained",
]
# Rotation #10 (round 13): keep the 8 anchors; include ALL SEVEN
# round-12 additions first (never-sampled beats stale):
# etl_state_kmv_nightly, curation_sample_quantiles,
# etl_state_sample_quantiles, curation_token_weighted_quantiles,
# etl_state_weighted_hist, dq_quantile_gate, dq_distinct_gate — plus
# any round-13 session additions; then
# continue the drift ladder with the 11 remaining r5 rows named above
# and the round-6 window (cdc_apply_events, window_events_anomaly,
# dedup_canonical_corpus, agg_shipping_priority_top10, ...).


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
