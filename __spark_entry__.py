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
    # ---- round-11 window (rotation #8, VERDICT r10 ask #1):
    # (a) the 10 round-10-session additions — the only registrations
    # never driver-sampled; green here closes the registry at 301/301
    # cumulative driver verification.
    "etl_semdedup_codebook",
    "etl_incremental_minhash_index",
    "etl_doremi_token_sample",
    "agg_cms_heavy_hitters",
    "agg_kmv_incremental_users",
    "reconcile_checksum_drilldown",
    "ir_mmr_diversify",
    "text_nb_classifier",
    "etl_nb_quality_gate",
    "ir_retrieve_rerank_mmr",
    # (b) drift re-checks: 32 of the 40 STALEST cum-green rows — the
    # original fixed r1-r4 window, last driver-verified in round 4,
    # 7 rounds stale.  The 8 deferred to rotation #9 each have a close
    # sibling here (agg_exact_percentiles, agg_events_hourly,
    # emb_near_dup_pairs, emb_topk_lsh, multimodal_resize,
    # multimodal_frames, dedup_fingerprint, curation_weighted_sample).
    "agg_approx_percentiles",
    "agg_events_sessions",
    "agg_pivot_status_by_segment",
    "agg_revenue_top10",
    "agg_rollup_revenue",
    "asof_click_attribution",
    "binary_meta",
    "curation_contamination",
    "curation_split",
    "dedup_clusters",
    "dedup_exact_keys",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "distinct_mktsegments",
    "doc_fingerprint",
    "emb_near_dup_lsh",
    "emb_topk_ivf",
    "etl_auto_mapping",
    "etl_auto_mapping_target",
    "etl_dates_bools",
    "etl_lookup_skip",
    "etl_validation_lookup_semi",
    "incremental_highwater",
    "json_extract_events",
    "multimodal_audio",
    "multimodal_decode",
    "setop_customers_without_orders",
    "text_langid",
    "text_quality",
    "text_repetition",
    "text_scrub",
    "text_stats",
]
# Rotation #9 (round 12): keep the 8 anchors; include the round-11
# additions first (never-sampled beats stale):
#   agg_kmv_set_ops (KMV set algebra: union/intersect/Jaccard across
#     two segment sketches, hash-exact replay),
#   curation_incremental_sample (mergeable bottom-k uniform eval
#     panel, fold-parity pinned),
#   agg_kmv_weighted_tokens (dedup-aware distinct-sum from weighted
#     sample states),
#   graph_part_communities (synchronous LPA over the part
#     co-purchase graph, 3 unrolled-round oracle);
# then continue the drift re-check ladder with the 8 deferred r4 rows
# above plus the next-oldest cum-green rows (the round-5 window).


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
