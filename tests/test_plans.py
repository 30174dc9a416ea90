"""Physical-plan shape assertions — the scale contract.

Correct rows are necessary but not sufficient: at 100 TB the plan IS the
product. These tests pin the properties that make each operator survive
a 1000-executor scale-up — filters reaching the parquet scan, column
pruning, broadcast (not shuffle) joins for dimensions, map-side partial
aggregation, and narrow (exchange-free) pipelines where the algorithm
allows — so a regression that silently de-optimizes a plan fails CI,
not the cluster bill.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orion_etl_oracle_to_postgres_spark import queries as q


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_where_pushdown_reaches_scan(spark, sf):
    """S3/P5: the job spec's free-text `where` must land in the parquet
    scan as PushedFilters (JDBC WHERE in production), not post-scan."""
    plan = plan_of(q.QUERIES["etl_where_pushdown"](spark, sf))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan


def test_column_pruning_reaches_scan(spark, sf):
    """S2/P1: mapping only a few columns must prune the scan schema —
    reading all 16 lineitem columns for a 4-column projection is wrong."""
    df = q.QUERIES["etl_where_pushdown"](spark, sf)
    plan = plan_of(df)
    scan_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    # only the mapped/filtered columns appear in the scan
    assert "l_comment" not in scan_schema
    assert len(scan_schema) < 200


def test_lookup_join_is_broadcast(spark, sf):
    """J1: dimension lookups must compile to broadcast hash joins — a
    shuffle join on the fact table is the N+1-probe mistake at scale."""
    plan = plan_of(q.QUERIES["etl_lookup_default"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_validation_lookup_skip_is_broadcast_single_scan(spark, sf):
    """J3: existence-check skip = ONE broadcast join over ONE fact scan.
    (Previously a semi-join ∪ separate null-filter branch — that reads
    the fact table twice, a genuine 2× scan cost at 100 TB.)"""
    plan = plan_of(q.QUERIES["etl_validation_lookup_semi"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert plan.count("orders.parquet") == 1


def test_lookup_skip_single_fact_scan(spark, sf):
    """J1 on_missing=skip: one left join + filter — the fact table is
    scanned exactly once (matched ∪ NULL-key rows must not come from a
    second scan branch)."""
    plan = plan_of(q.QUERIES["etl_lookup_skip"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert plan.count("customer.parquet") == 1


def test_agg_has_partial_aggregation(spark, sf):
    """§2.8: groupBy compiles to partial (map-side) + final aggregate,
    so the exchange carries one row per (partition, key), not raw rows."""
    plan = plan_of(q.QUERIES["agg_pricing_summary"](spark, sf))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # partial_sum/partial_avg markers


def test_narrow_ops_have_no_exchange(spark, sf):
    """Text analysis operators are per-row: any Exchange in their plan
    is a planning bug that becomes a 100 TB shuffle."""
    for name in ("text_stats", "text_quality", "doc_fingerprint", "binary_meta"):
        plan = plan_of(q.QUERIES[name](spark, sf))
        assert "Exchange" not in plan, f"{name} plan shuffles:\n{plan}"


def test_shingle_stream_is_narrow(spark, sf):
    """Dedup shingling must stay exchange-free — shuffles are decided by
    downstream consumers (LSH banding / inverted index), not tokenizing."""
    from orion_etl_oracle_to_postgres_spark.operators.dedup import shingle_hash_stream

    d = spark.read.parquet(f"{sf}/documents.parquet")
    plan = plan_of(shingle_hash_stream(d, "doc_id", "text", 3))
    assert "Exchange" not in plan


def test_minhash_bands_single_shuffle(spark, sf):
    """LSH banding: exactly ONE exchange (the groupBy(doc, band)); the
    per-hash min must partial-aggregate map-side."""
    from orion_etl_oracle_to_postgres_spark.operators.dedup import (
        minhash_bands,
        shingle_hash_stream,
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    plan = plan_of(minhash_bands(shingle_hash_stream(d, "doc_id", "text", 3), 128, 32))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan


def test_no_python_udf_in_jvm_operators(spark, sf):
    """Everything except the explicitly-Python multimodal/exact-BLAS
    paths must run JVM-side: no BatchEvalPython / ArrowEvalPython."""
    for name in (
        "etl_customer_pipeline",
        "agg_pricing_summary",
        "dedup_fingerprint",
        "text_stats",
        "emb_topk_query",
    ):
        plan = plan_of(q.QUERIES[name](spark, sf))
        assert "EvalPython" not in plan, f"{name} fell back to Python UDFs"


def test_exact_dedup_single_shuffle(spark, sf):
    """Exact dedup = one hash-aggregate exchange on the key columns."""
    plan = plan_of(q.QUERIES["dedup_exact_keys"](spark, sf))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_assign_is_broadcast_plus_hash_agg(spark, sf):
    """IVF assignment must be broadcast-crossjoin + ONE hash aggregate
    (max_by with map-side partial) — no sort window over n×k rows, no
    shuffle of vector payloads."""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import ivf_assign

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    plan = plan_of(ivf_assign(e, n_centroids=8))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    # map-side partial max_by: the exchange carries one skinny row per
    # (partition, vector id), never the n×k similarity rows
    assert "partial_max_by" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_single_exchange_window(spark, sf):
    """The as-of join is ONE hash exchange + one window — any rewrite
    that introduces a join (range-candidate explosion) or a second
    shuffle fails here."""
    import re

    plan = plan_of(q.QUERIES["asof_click_attribution"](spark, sf))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_range_join_is_equi_join_not_nested_loop(spark, sf):
    """The interval join must compile to an equi-join on
    (key, time-bucket) — never BroadcastNestedLoop/Cartesian (the plan
    Spark picks for a raw range predicate)."""
    plan = plan_of(q.QUERIES["range_clicks_before_error"](spark, sf))
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    # equi-join on (key, bucket); AQE may broadcast the small side at
    # test SF — any HASH join qualifies, a nested loop never does
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_contamination_bench_side_is_broadcast(spark, sf):
    plan = plan_of(q.QUERIES["curation_contamination"](spark, sf))
    assert "BroadcastHashJoin" in plan


def test_quality_cutoff_broadcasts_cut_table(spark, sf):
    plan = plan_of(q.QUERIES["curation_quality_cutoff"](spark, sf))
    assert "BroadcastHashJoin" in plan


def test_hash_split_and_sample_are_pure_projection(spark, sf):
    """Split/sample must stay shuffle-free: a projection + filter over
    the scan (the property that makes them free at 100 TB)."""
    plan = plan_of(q.QUERIES["curation_split"](spark, sf))
    assert "Exchange" not in plan
    plan = plan_of(q.QUERIES["curation_weighted_sample"](spark, sf))
    assert "Exchange" not in plan


def test_vocab_topk_uses_take_ordered(spark, sf):
    plan = plan_of(q.QUERIES["text_vocab_topk"](spark, sf))
    assert "TakeOrderedAndProject" in plan


def test_q5_join_chain_is_all_broadcast(spark, sf):
    """Six-way Q5 shape: every dim join broadcasts, no sort-merge join
    survives, and the date filter reaches the orders scan."""
    plan = plan_of(q.QUERIES["agg_regional_supplier_revenue"](spark, sf))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_stratified_sample_uses_window_group_limit(spark, sf):
    """row_number()<=k must trigger WindowGroupLimit (map-side partial
    top-k per group before the shuffle)."""
    plan = plan_of(q.QUERIES["curation_stratified_sample"](spark, sf))
    assert "WindowGroupLimit" in plan


def test_chunking_is_shuffle_free(spark, sf):
    plan = plan_of(q.QUERIES["text_chunk_windows"](spark, sf))
    assert "Exchange" not in plan


def test_profile_is_one_scan_no_join(spark, sf):
    plan = plan_of(q.QUERIES["profile_customer_table"](spark, sf))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_incremental_dedup_is_hash_anti_join(spark, sf):
    """History side joins as a (broadcast|shuffled) hash LeftAnti — a
    nested-loop anti join would be quadratic at scale."""
    plan = plan_of(q.QUERIES["dedup_incremental_batch"](spark, sf))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gapfill_grid_join_stays_small_side(spark, sf):
    """The generated hour grid joins the hourly rollup with a hash join
    (either side), never a nested loop; events are scanned, aggregated,
    and never re-shuffled raw."""
    plan = plan_of(q.QUERIES["agg_events_gapfill"](spark, sf))
    assert "NestedLoop" not in plan


def test_knn_join_is_group_limited_broadcast(spark, sf):
    """The exact k-NN join must broadcast the query side (the corpus
    never shuffles raw vectors) and run the per-query top-k as a
    map-side WindowGroupLimit, so the one shuffle carries at most
    k candidates per query per scan partition."""
    plan = plan_of(q.QUERIES["emb_knn_join"](spark, sf))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_knn_join_lsh_is_bucket_equi_join(spark, sf):
    """The ANN variant must candidate via a hash equi-join on the LSH
    bucket — never a nested-loop over the full corpus."""
    plan = plan_of(q.QUERIES["emb_knn_join_lsh"](spark, sf))
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    assert "WindowGroupLimit" in plan


def test_count_exchanges_counts_shuffles_not_broadcasts(spark):
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.plans import count_exchanges

    df = spark.range(1000).select((F.col("id") % 7).alias("k"), "id")
    assert count_exchanges(df) == 0
    agg = df.groupBy("k").count()
    assert count_exchanges(agg) >= 1
    dim = spark.range(7).select(F.col("id").alias("k"))
    bc = df.join(F.broadcast(dim), "k")
    assert count_exchanges(bc) == 0  # broadcast is not a shuffle


def test_winsorize_bounds_join_is_broadcast(spark, sf):
    """The per-group quantile-bounds frame (rows = #groups) must come
    back as a BroadcastHashJoin — re-shuffling the data against a
    handful of bound rows would be the classic small-side mistake."""
    plan = plan_of(q.QUERIES["quantile_winsorize_prices"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_frequency_bins_join_is_broadcast(spark, sf):
    plan = plan_of(q.QUERIES["quantile_freq_bins"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_join_stays_hash_equi_join(spark, sf):
    """Salting must not degrade the join to a nested-loop/cartesian:
    the composite (key, salt) condition is still an equi-join."""
    plan = plan_of(q.QUERIES["skew_salted_cohort_join"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_apply_shuffles_candidates_not_log(spark, sf):
    """cdc_latest's shuffle must carry partial max_by candidates (one
    per key per partition), never the raw changelog, and no Window node
    may appear."""
    plan = plan_of(q.QUERIES["cdc_apply_events"](spark, sf))
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_quantize_is_pure_projection(spark, sf):
    """int8 quantization adds no exchange: scan → project. (The error
    REPORT joins quantized against raw, so assert on the operator.)"""
    from orion_etl_oracle_to_postgres_spark.operators.similarity import (
        quantize_embeddings,
    )

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    plan = plan_of(quantize_embeddings(e))
    assert "Exchange" not in plan


def test_bm25_is_take_ordered_with_broadcast_idf(spark, sf):
    """BM25's top-k must compile to TakeOrderedAndProject (local top-k
    per task), and the per-term document-frequency table must broadcast
    — a shuffle join on the tiny idf side would serialize the score
    stream."""
    plan = plan_of(q.QUERIES["text_bm25_rank"](spark, sf))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_affinity_pair_join_is_single_basket_shuffle(spark, sf):
    """Basket self-join must be ONE hash equi-join on the basket key
    (pair volume bounded by per-basket fan-out) with the per-item
    frequency tables broadcast onto the pair counts."""
    plan = plan_of(q.QUERIES["affinity_part_pairs"](spark, sf))
    assert "BroadcastHashJoin" in plan
    # the basket-key self-join is an equi-join, never a cartesian; the
    # only nested-loop join allowed is the broadcast of the 1-row
    # basket-total frame (scalar-as-frame, exchange-reuse pattern)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_containment_reuses_jaccard_postings_shape(spark, sf):
    """Containment must keep the inverted-index shape: shingle-hash
    equi-join (no cartesian), sizes joined back, nothing vector- or
    text-sized in the pair shuffle."""
    plan = plan_of(q.QUERIES["dedup_containment"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anomaly_window_input_is_aggregated(spark, sf):
    """The z-score window must run over the HOURLY aggregate (hours ×
    types rows), not raw events: exactly one pre-aggregation shuffle
    feeds the window sort."""
    plan = plan_of(q.QUERIES["window_events_anomaly"](spark, sf))
    assert "HashAggregate" in plan
    assert "Window" in plan
    # window partition = event_type; input already count-aggregated
    assert plan.index("HashAggregate") > plan.index("Window")  # agg below window in tree text


def test_distinctive_terms_totals_are_broadcast(spark, sf):
    """Per-group totals (5 rows) must broadcast back onto the term
    counts; the ranking must be WindowGroupLimit-eligible (rank pushed
    before the full sort)."""
    plan = plan_of(q.QUERIES["text_distinctive_terms"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_semantic_dedup_cluster_join_is_ids_only(spark, sf):
    """The final corpus labeling must join ids only — embedding vectors
    must not appear in the cluster join's output columns."""
    df = q.QUERIES["emb_semantic_dedup"](spark, sf)
    assert set(df.columns) == {"vec_id", "cluster_id", "keep"}
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_q9_profit_join_chain_is_broadcast_with_pushed_like(spark, sf):
    """Q9 shape: the three dims broadcast (no sort-merge joins except
    possibly the orders fact join), and the selective LIKE filter
    reaches the part scan as a pushed/partial filter, not post-join."""
    plan = plan_of(q.QUERIES["agg_profit_by_nation_year"](spark, sf))
    assert plan.count("BroadcastHashJoin") >= 3
    # the LIKE filter appears as a scan-side Contains, not post-join
    assert "Contains(p_name" in plan


def test_priority_sample_is_take_ordered(spark, sf):
    """A-ES weighted sampling must compile to TakeOrderedAndProject —
    local top-k per task, no corpus shuffle, no global sort."""
    plan = plan_of(q.QUERIES["curation_priority_sample"](spark, sf))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_rrf_candidate_lists_are_take_ordered(spark, sf):
    """Both RRF candidate lists must be bounded top-k selections
    (TakeOrderedAndProject), never a global rank over the corpus."""
    plan = plan_of(q.QUERIES["ir_rrf_fusion"](spark, sf))
    assert plan.count("TakeOrderedAndProject") >= 2


def test_k_anonymity_is_single_aggregate(spark, sf):
    """The k-anonymity stats summary is one grouped aggregate feeding a
    global fold — no joins, no windows."""
    plan = plan_of(q.QUERIES["privacy_k_anonymity_stats"](spark, sf))
    assert "Join" not in plan and "Window" not in plan


def test_minhash_join_is_bucket_equi_join_broadcast_bench_side(spark, sf):
    """The cross-corpus decontamination join must candidate via a hash
    equi-join on (band, band-hash) — never a nested loop over either
    corpus — and with a benchmark-sized right side the banded bench
    stream broadcasts (VERDICT r4 ask #7: the docstring's
    broadcast-bench-side claim, now plan-pinned)."""
    plan = plan_of(q.QUERIES["dedup_minhash_join"](spark, sf))
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan


def test_er_fuzzy_join_is_blocked_equi_join(spark, sf):
    """ER candidate generation must be the blocking equi-join — a
    nested-loop edit-distance over the corpus is the quadratic failure
    the block cap exists to prevent."""
    plan = plan_of(q.QUERIES["er_fuzzy_join_parts"](spark, sf))
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan


def test_er_block_cap_is_computed_before_candidates(spark, sf):
    """The degenerate-block guard counts block sizes BEFORE the
    candidate self-join (an aggregate on the block key feeding the
    join), so a 'smith' block never materializes quadratically; the
    behavioral side is pinned in test_er.py."""
    plan = plan_of(q.QUERIES["er_resolve_parts"](spark, sf))
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q3_top10_is_take_ordered_after_rounded_rank(spark, sf):
    """Q3 shape: the LIMIT 10 over rounded revenue must run as
    TakeOrderedAndProject (k-row per partition, k-row to driver), never
    a global Sort + CollectLimit."""
    plan = plan_of(q.QUERIES["agg_shipping_priority_top10"](spark, sf))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan  # date + segment predicates reach scans


def test_q4_lateness_exists_is_left_semi(spark, sf):
    """Q4 shape: EXISTS compiles to a LeftSemi join (no row duplication,
    no right-side columns in the shuffle)."""
    plan = plan_of(q.QUERIES["agg_late_order_priority"](spark, sf))
    assert "LeftSemi" in plan


def test_q10_nation_dim_is_broadcast(spark, sf):
    """Q10 shape: the 25-row nation dim joins by broadcast, and the
    top-20 is TakeOrderedAndProject."""
    plan = plan_of(q.QUERIES["agg_returned_revenue_top20"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q18_having_semi_join_shares_orderkey_partitioning(spark, sf):
    """Q18 shape: the >300-qty HAVING subquery semi-joins back to orders;
    the aggregate and the join both key on the order key so one shuffle
    round serves both (no second Exchange between them), and no
    cartesian product appears."""
    plan = plan_of(q.QUERIES["agg_large_volume_orders"](spark, sf))
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan


def test_ab_welch_single_unit_shuffle(spark, sf):
    """A/B readout: per-unit rollup is the only wide stage — exactly one
    shuffle exchange feeding a one-row final aggregate."""
    plan = plan_of(q.QUERIES["events_ab_welch"](spark, sf))
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "SinglePartition" in plan  # the closing one-row aggregate


def test_top_fraction_single_window_exchange(spark, sf):
    """Per-group top-fraction gate: rank and count share ONE group-keyed
    window exchange — no second sort/shuffle, no Python UDFs."""
    plan = plan_of(q.QUERIES["curation_top_fraction"](spark, sf))
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Window" in plan
    assert "PythonUDF" not in plan


def test_scd2_pit_join_is_equi_not_cartesian(spark, sf):
    """PIT join compiles to a key-equi join (hash or sort-merge) with
    the interval predicate as a residual — never BroadcastNestedLoop or
    Cartesian over the fact table."""
    plan = plan_of(q.QUERIES["scd2_pit_order_balances"](spark, sf))
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_q7_nation_dims_broadcast_date_pushed(spark, sf):
    """Q7 shape: both nation dim copies broadcast; the shipdate window
    reaches the lineitem scan as PushedFilters."""
    plan = plan_of(q.QUERIES["agg_nation_trade_volume"](spark, sf))
    import re

    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
    assert "PushedFilters" in plan


def test_q19_common_quantity_bound_pushed(spark, sf):
    """Q19 shape: Catalyst extracts the disjunction's common
    l_quantity bounds as a pushable conjunct on the fact scan, and the
    part side joins by broadcast."""
    plan = plan_of(q.QUERIES["agg_brand_type_revenue"](spark, sf))
    assert "BroadcastHashJoin" in plan
    # the extracted common bound reaches the scan
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q21_probes_are_semi_anti_on_id_pairs(spark, sf):
    """Q21 shape: the double EXISTS compiles to LeftSemi + LeftAnti over
    distinct (orderkey, suppkey) projections — no fact-width shuffle,
    no cartesian."""
    plan = plan_of(q.QUERIES["agg_waiting_suppliers"](spark, sf))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_q6_all_predicates_reach_scan(spark, sf):
    """Q6 shape: date window, discount band, and quantity cap all land
    in PushedFilters; the scan reads only the referenced columns."""
    plan = plan_of(q.QUERIES["agg_discount_revenue"](spark, sf))
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    scan_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_comment" not in scan_schema and "l_orderkey" not in scan_schema


def test_q8_five_broadcast_dims(spark, sf):
    """Q8 shape: part, supplier, both nation copies, and region all
    join by broadcast — only the fact chain shuffles."""
    plan = plan_of(q.QUERIES["agg_nation_market_share"](spark, sf))
    import re

    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 5


def test_temperature_mix_null_safe_join_still_broadcasts(spark, sf):
    """The eqNullSafe group join (NULL groups sample at their own derived
    rate) must stay a broadcast hash join — null-safe equality is
    broadcast-compatible, and a regression to SortMergeJoin would
    shuffle the whole corpus."""
    plan = plan_of(q.QUERIES["curation_temperature_mix"](spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rewrite_gate_span_op_scans_are_id_text_projected(spark, sf):
    """Compiler rewrite stage claim: the span op receives a (id, text)
    projection — every documents scan feeding its shuffles is pruned to
    exactly those two columns; only the ONE main-row scan carries the
    other mapped columns."""
    import re

    plan = plan_of(q.QUERIES["etl_rewrite_gate"](spark, sf))
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "documents.parquet" in ln
    ]
    assert scans, plan
    pruned = [s for s in scans if re.search(r"\[doc_id#\d+L?,text#\d+\]", s)]
    assert len(scans) - len(pruned) <= 1, "\n".join(scans)


def test_kcenter_round_is_scan_plus_take_ordered(spark, sf):
    """kcenter_sample claim: each greedy round is ONE corpus scan +
    TakeOrderedAndProject(1) — selected vectors ride as literals, so no
    join and no shuffle of the corpus ever appears."""
    from pyspark.sql import functions as F

    from orion_etl_oracle_to_postgres_spark.operators.similarity import _lit_vec

    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
    center = [0.0] * len(e.select("embedding").first()[0])
    mind = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("__v"), _lit_vec(center), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    round_df = base.select("vec_id", mind.alias("__md")).orderBy(
        F.col("__md").desc(), F.col("vec_id")
    ).limit(1)
    plan = plan_of(round_df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_span_dedup_candidate_then_verify_shape(spark, sf):
    """repeated_span_dedup two-level hotness: the candidate aggregate
    shuffles only (hash, id); segment TEXT enters an exchange only on
    the candidate-filtered verify side, downstream of a broadcast semi
    on the candidate hashes."""
    from orion_etl_oracle_to_postgres_spark.operators.dedup import (
        repeated_span_dedup,
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    plan = plan_of(repeated_span_dedup(d, "text", "doc_id", span_tokens=3))
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    cand = [ln for ln in ex if "__h#" in ln and "__seg" not in ln]
    verify = [ln for ln in ex if "__seg" in ln]
    assert cand, plan  # hash+id candidate shuffles exist
    assert verify, plan  # text-verify shuffles exist
    # and the verify side is fed by a broadcast of candidate hashes
    assert "BroadcastHashJoin" in plan


def test_video_near_dups_payloads_never_shuffle(spark, sf):
    """video_near_dups claim: only (id, fhash) rows enter exchanges —
    the payload/text column appears in no Exchange's child projection
    (it is consumed by the frame-hash projection before any shuffle)."""
    plan = plan_of(q.QUERIES["multimodal_video_near_dups"](spark, sf))
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "payload" not in ln and "text" not in ln, ln


def test_pagerank_rounds_are_hash_joins_no_cartesian(spark, sf):
    """pagerank claim: every iteration is a hash equi-join + hash
    aggregate — no Cartesian anywhere. Since the round-6 lineage
    truncation, earlier rounds materialize as lazy checkpoints, so the
    FINAL plan shows only the last round's joins reading an
    ExistingRDD scan (re-deriving all 5 rounds in one plan was the
    recompute bug the checkpoints fixed); the broadcast of the
    node-side rank table is pinned in test_graph.py."""
    plan = plan_of(q.QUERIES["graph_supplier_pagerank"](spark, sf))
    assert "CartesianProduct" not in plan
    import re

    joins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan))
    assert joins >= 1, plan  # the final rank⋈edges round
    assert "ExistingRDD" in plan, "earlier rounds must be checkpointed"


def test_minhash_index_lookup_is_band_bucket_join(spark, sf):
    """Incremental index lookup: candidates come from a (band_id,
    band_hash) equi-join — never a nested loop over the index."""
    plan = plan_of(q.QUERIES["dedup_incremental_minhash"](spark, sf))
    assert "band_hash" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lpa_rounds_broadcast_and_checkpoint(spark, sf):
    """label_propagation claim (the pagerank contract applied to LPA):
    the final round is a broadcast labels⋈edges hash join + hash
    aggregates, earlier rounds are checkpoint-truncated, never a
    Cartesian."""
    plan = plan_of(q.QUERIES["graph_part_communities"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "ExistingRDD" in plan, "earlier rounds must be checkpointed"


def test_kmv_overlap_candidates_are_hash_equi_join(spark, sf):
    """kmv_overlap_pairs claim: candidate pairs come from an __hv
    equi-join over the ≤ k-rows-per-group states — never a nested loop
    over the G² group pairs; the per-pair ranking rides keyed hash
    aggregates/windows."""
    plan = plan_of(q.QUERIES["agg_kmv_overlap_matrix"](spark, sf))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
