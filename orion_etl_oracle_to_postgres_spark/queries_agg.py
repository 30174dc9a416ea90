"""Analytics queries (SURVEY.md §2.8): aggregates, windows, set ops, rollup/cube/pivot, temporal joins, JSON/event shapes.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_shared import (
    _bloom_probe_sql,
    _cms_hash_sql,
    _hex2int_sql,
    _hist_quantile_sql,
    _recency_sample_sql,
    _t,
    query,
)


@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (partial aggregation map-side;
    one shuffle on the 2-column group key)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_revenue_top10",
    """
    SELECT l.l_orderkey AS order_id, o.o_orderdate AS order_date,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY 1, 2
    ORDER BY revenue DESC, order_id
    LIMIT 10
    """,
)
def agg_revenue_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-k (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("order_id"), F.col("o_orderdate").alias("order_date"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("order_id"))
        .limit(10)
    )


@query(
    "window_top_orders_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-customer top-2 orders by price."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "agg_events_hourly",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the event stream table (the batch
    shape of a streaming tumbling-window agg)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "json_extract_events",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` text column (§2.11 JSON)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_rollup_revenue",
    """
    SELECT coalesce(n.n_name, '<ALL>') AS nation,
           coalesce(c.c_mktsegment, '<ALL>') AS segment,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (nation → segment → grand total)
    over a two-dim join — subtotal levels distinguished with explicit
    '<ALL>' markers so NULL-vs-subtotal is unambiguous on both sides."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("<ALL>")).alias("segment"),
            "revenue",
            "n_orders",
        )
    )


@query(
    "agg_events_sessions",
    """
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 4 HOUR AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def agg_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation (§2.9): per-user activity sessions
    with a 4-hour inactivity gap via ``F.session_window`` — the batch
    shape of the streaming sessionization operator
    (``streaming/sessionize.py``). Spark's session end is
    last-event + gap; the oracle reproduces the semantics with
    gaps-and-islands SQL (new session when the gap is ≥ the threshold,
    matching the half-open [start, last+gap) window)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "4 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "agg_pivot_status_by_segment",
    """
    SELECT c.c_mktsegment AS segment,
           round(sum(CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END), 2) AS f_total,
           round(sum(CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END), 2) AS o_total,
           round(sum(CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE 0 END), 2) AS p_total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def agg_pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order totals by market segment × order status. Explicit
    pivot values keep the plan a single pass (no distinct-values
    pre-query) and make the oracle a plain conditional aggregation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2))
    )
    return piv.select(
        "segment",
        F.coalesce("F", F.lit(0.0)).alias("f_total"),
        F.coalesce("O", F.lit(0.0)).alias("o_total"),
        F.coalesce("P", F.lit(0.0)).alias("p_total"),
    )


@query(
    "agg_exact_percentiles",
    """
    SELECT c_mktsegment AS segment,
           round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
           round(quantile_cont(c_acctbal, 0.99), 4) AS p99,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the continuous-interpolation
    definition, so values hash-match. (The scale variant is
    ``approx_percentile``; its t-digest sketch is engine-specific, so
    the exact form is the differential-tested one.)"""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(c_acctbal, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_approx_percentiles",
    """
    SELECT c_mktsegment AS segment,
           round(quantile_cont(c_acctbal, 0.5), 4) AS p50_exact,
           round(quantile_cont(c_acctbal, 0.9), 4) AS p90_exact,
           round(quantile_cont(c_acctbal, 0.99), 4) AS p99_exact,
           count(*) AS n,
           TRUE AS approx_within_tol
    FROM customer GROUP BY 1
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE percentile path (VERDICT r2 #2): per-group quantiles via
    ``approx_percentile`` — ``operators/quantiles.approx_group_quantiles``
    keeps an O(accuracy) Greenwald-Khanna sketch per group instead of
    buffering every value, so the plan survives a 100 TB group-by where
    ``agg_exact_percentiles`` would OOM a hot group.

    Differential design: the sketch itself is engine-specific, so the
    HASH-MATCHED payload is the exact percentiles (both engines agree on
    continuous interpolation) plus group sizes, and the Spark side
    additionally asserts ``approx_within_tol`` — each sketch quantile
    within max(2% relative, 8·span/n absolute) of the exact value (rank
    error ≤ 1/accuracy makes the approx a sample within a few order
    statistics of the exact rank; 8·mean-gap bounds the local gap with
    e^-8 headroom) — against DuckDB's literal TRUE. A sketch drifting out
    of tolerance therefore fails the gate, not just a rows-only check.
    """
    from .operators.quantiles import approx_group_quantiles

    c = _t(spark, sf_dir, "customer")
    approx = approx_group_quantiles(
        c, ["c_mktsegment"], "c_acctbal", (0.5, 0.9, 0.99), accuracy=10000
    ).select(
        F.col("c_mktsegment"), F.col("p50"), F.col("p90"), F.col("p99")
    )
    exact = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, array(0.5D, 0.9D, 0.99D))").alias("eq"),
        F.count(F.lit(1)).alias("n"),
        (F.max("c_acctbal") - F.min("c_acctbal")).alias("span"),
    )
    j = exact.join(approx, "c_mktsegment")
    within = F.lit(True)
    for i, name in enumerate(["p50", "p90", "p99"]):
        e = F.col("eq").getItem(i)
        tol = F.greatest(0.02 * F.abs(e), 8.0 * F.col("span") / F.col("n"))
        within = within & (F.abs(F.col(name) - e) <= tol)
    return j.select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("eq").getItem(0), 4).alias("p50_exact"),
        F.round(F.col("eq").getItem(1), 4).alias("p90_exact"),
        F.round(F.col("eq").getItem(2), 4).alias("p99_exact"),
        F.col("n"),
        within.alias("approx_within_tol"),
    )


@query(
    "setop_customers_without_orders",
    """
    SELECT c_custkey AS cust_id FROM customer
    EXCEPT
    SELECT o_custkey AS cust_id FROM orders
    """,
)
def setop_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT distinct)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("cust_id"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("cust_id"))
    return c.subtract(o)  # EXCEPT (distinct) — matches SQL EXCEPT


@query("distinct_mktsegments", "SELECT DISTINCT c_mktsegment FROM customer")
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "asof_click_attribution",
    """
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
           round(c.value, 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase attributed to the
    user's most recent click at-or-before it; unmatched purchases kept
    with nulls. Oracle: DuckDB's NATIVE ``ASOF LEFT JOIN`` — an
    independent implementation of the semantics, not a re-statement of
    the plan. (user_id, ts) is collision-free in the testdata at every
    SF, so tie-breaking cannot diverge."""
    from .operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_r").alias("click_ts"),
        F.round("value", 2).alias("click_value"),
    )


@query(
    "range_clicks_before_error",
    """
    SELECT e.event_id, e.user_id, e.ts, count(c.ts) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND c.ts > e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
    GROUP BY 1, 2, 3
    """,
)
def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (operators/ranges.py): for every error
    event, the number of same-user clicks in the preceding 10 minutes
    (errors with none report 0). The oracle states the semantics as a
    plain range-predicate join; the engine's plan is the bucketed
    equi-join that avoids the per-key candidate explosion."""
    from .operators.ranges import range_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    pairs = range_join(
        errors, clicks, on="user_id", lower_us=-600 * 1_000_000, upper_us=0
    )
    counts = pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("__n"))
    return errors.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_recent_clicks"),
    )


@query(
    "agg_distinct_users_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def agg_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily active users — the oracle gate for the HLL scale
    path below (same pattern as exact/approx percentiles)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_distinct_users_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id)::BIGINT AS n_users_exact,
           count(*)::BIGINT AS n_events,
           true AS within_error_bound
    FROM events GROUP BY 1
    """,
)
def agg_approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users via HyperLogLog (``approx_count_distinct``,
    rsd 2%) — the 100 TB path: one pass, fixed-size sketches, no
    per-day distinct-set shuffle. The HLL estimate itself is
    engine-specific (DuckDB cannot replay Spark's sketch), so the
    differential check is BOUNDED-ERROR (VERDICT r6 ask #7): the query
    emits the exact twin plus ``within_error_bound`` = |approx−exact|
    ≤ 5%·exact (rsd 2% ⇒ 5% ≈ 2.5σ), and the oracle pins that boolean
    TRUE for every day — an estimate drifting outside its documented
    error now hash-mismatches instead of passing a rows-only check.
    At 100 TB drop the exact-twin column: it exists for the audit."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.count_distinct("user_id")
            )
            <= 0.05 * F.count_distinct("user_id")
        ).alias("within_error_bound"),
    )


@query(
    "agg_cube_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (§2.8): all four grouping combinations in one
    pass — Spark's Expand produces 4 rows per input into ONE partial-
    aggregated shuffle, not four scans. NULL markers coalesced to 'ALL'
    on both sides (the testdata columns are never null, so the marker
    is unambiguous)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "window_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days,
           ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + ntile window coverage (§2.8): days since the customer's
    previous order (null for the first) and a global price quartile.
    Both windows are deterministic via orderkey tie-breaks. The global
    ntile is a single-partition sort by construction — fine for ranked
    outputs that are small or already reduced; for full-corpus
    quantiles use the approx_percentile path instead."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        ),
        F.ntile(4).over(wq).alias("price_quartile"),
    )


@query(
    "setop_segments_in_both",
    """
    SELECT c_mktsegment AS segment
    FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT c_mktsegment FROM customer WHERE c_acctbal < -500
    """,
)
def setop_segments_in_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation (§2.8): segments appearing among both
    high-balance and deep-negative-balance customers."""
    c = _t(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_mktsegment").alias("segment")
    )
    lo = c.filter(F.col("c_acctbal") < -500).select(
        F.col("c_mktsegment").alias("segment")
    )
    return hi.intersect(lo)


@query(
    "agg_grouping_sets_orders",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (§2.8, completing the ROLLUP/CUBE family): two
    independent one-dimension summaries — by status, by priority — in
    ONE scan + ONE shuffle via Expand, where naive SQL would UNION two
    separate aggregations (two scans). The shape that matters at 100 TB:
    k summary dimensions cost one pass, not k."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "setop_priority_except_all",
    """
    SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_priority_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL set operation (§2.8): multiset difference — each
    F-status priority row survives as many times as its count exceeds
    the P-status count. One shuffle on the value (Spark plans a
    hash-partitioned count-difference generate), no driver logic."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    p = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.exceptAll(p)


@query(
    "agg_events_gapfill",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    )
    SELECT g.event_type, g.hour,
           coalesce(h.n, 0) AS n_events,
           coalesce(h.total, 0.0) AS total_value,
           last_value(h.total IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS locf_total
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.hour = h.hour
    """,
)
def agg_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill (hypertable-rollup shape): densify each
    event type's hourly series over its own [min, max] hour range —
    missing buckets appear with n_events=0 — plus last-observation-
    carried-forward of the hourly total.

    Scale: the dense grid is GENERATED per group from a 3-column bounds
    aggregate (groups × hours rows, independent of event count), then
    one equi-join back to the hourly rollup and one window for LOCF —
    the raw events are scanned once. At 100 TB the grid side is tiny
    and broadcasts; nothing materializes the raw stream twice."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("total", F.lit(0.0)).alias("total_value"),
            F.last("total", ignorenulls=True).over(w).alias("locf_total"),
        )
    )


@query(
    "window_funnel_conversion",
    """
    WITH signups AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    conv AS (
      SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
      FROM signups s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts >= s.signup_ts
      GROUP BY 1, 2
    )
    SELECT user_id, signup_ts, first_purchase_ts,
           first_purchase_ts IS NOT NULL AS converted,
           date_diff('microsecond', signup_ts, first_purchase_ts) AS us_to_convert
    FROM conv
    """,
)
def window_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (signup → first subsequent purchase): per-user
    earliest signup, earliest purchase at-or-after it, conversion flag,
    and exact microsecond latency. Two narrow pre-aggregations joined on
    user_id — the funnel never shuffles raw events by anything other
    than user_id, and the signup side is the small post-agg stream."""
    e = _t(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        signups.join(
            purchases,
            (signups.user_id == purchases.p_user)
            & (purchases.p_ts >= signups.signup_ts),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        F.col("first_purchase_ts").isNotNull().alias("converted"),
        # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike
        # (unix_micros rejects NTZ, the type µs-parquet ts surfaces as)
        F.timestamp_diff(
            "MICROSECOND", F.col("signup_ts"), F.col("first_purchase_ts")
        ).alias("us_to_convert"),
    )


@query(
    "agg_regional_supplier_revenue",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def agg_regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-way join (local-supplier regional revenue):
    the join-reordering + broadcast showcase. Declared as one flat
    DataFrame expression; Catalyst reorders so the fact table
    (lineitem) is filtered through broadcast dims (region → nation →
    supplier) before the only real shuffles (orders join, final agg).
    The same-nation predicate (customer's nation = supplier's nation)
    rides the join, not a post-filter. At 100 TB: dims broadcast, the
    date filter pushes into the orders scan, and AQE prunes the
    lineitem side via the runtime broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "agg_above_avg_orders",
    """
    SELECT o_orderpriority AS priority,
           count(*) AS n_above,
           round(min(o_totalprice), 2) AS min_price
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY 1
    """,
)
def agg_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders above the GLOBAL average price,
    summarized by priority. The subquery is a one-row aggregate Catalyst
    executes once and broadcasts into the filter — at 100 TB that is two
    passes over the fact table (one tiny-output, one filtered), never a
    join explosion. Expressed via the SQL surface to exercise the
    engine's spark.sql path alongside the DataFrame API."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               count(*) AS n_above,
               round(min(o_totalprice), 2) AS min_price
        FROM __orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM __orders_v)
        GROUP BY 1
        """
    )


@query(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    )
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long): two numeric part attributes as
    (key, metric, value) rows — Spark's native ``unpivot`` generates
    them in one Expand pass over a single scan, where the naive
    UNION-ALL oracle formulation scans the table once per column."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@query(
    "window_price_distribution",
    """
    SELECT o_orderkey,
           o_orderpriority AS priority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(10) OVER w AS INT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_price_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    per priority partition — deterministic total order via the
    (price, orderkey) tie-break so ranks are engine-independent."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@query(
    "window_cohort_retention",
    """
    WITH s AS (
      SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS wk
          FROM events),
    j AS (
      SELECT s.cohort, a.wk, a.user_id
      FROM s JOIN a USING (user_id)
      WHERE a.wk >= s.cohort
    )
    SELECT cohort,
           (date_diff('day', cohort, wk) / 7)::INT AS week_n,
           count(DISTINCT user_id) AS n_active
    FROM j GROUP BY 1, 2
    """,
)
def window_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Cohort retention matrix — the product-analytics staple:
    users bucketed by signup week, activity counted per week offset.
    Two narrow aggregates (cohort per user, distinct active weeks per
    user) joined on user_id, then one group-by — no window over the
    event log, distinct-users counted after the join collapses to
    (user, week) pairs."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    a = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk")).distinct()
    j = s.join(a, "user_id").filter(F.col("wk") >= F.col("cohort"))
    return j.groupBy(
        "cohort",
        (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("int").alias("week_n"),
    ).agg(F.count_distinct("user_id").alias("n_active"))


@query(
    "sql_recursive_hierarchy",
    """
    WITH RECURSIVE h(key, root, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, h.root, h.depth + 1
      FROM customer c JOIN h ON c.c_custkey // 10 = h.key
      WHERE c.c_custkey >= 10
    )
    SELECT key, root, depth FROM h
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Recursive CTE (Spark 4's WITH RECURSIVE — §2.8 surface):
    walk the synthetic digit-truncation hierarchy over customer keys
    (parent = key div 10, roots = single-digit keys) to annotate every
    key with its root and depth — the org-chart / referral-chain /
    bill-of-materials query shape that previously required driver-side
    iteration (cf. the looped large-star/small-star in dedup.py). The
    oracle runs the IDENTICAL recursion in DuckDB (integer division
    spelled // there, div here)."""
    c = _t(spark, sf_dir, "customer")
    c.select("c_custkey").createOrReplaceTempView("__rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE h(key, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM __rc_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, h.root, h.depth + 1
          FROM __rc_customer c JOIN h ON c.c_custkey div 10 = h.key
          WHERE c.c_custkey >= 10
        )
        SELECT key, root, depth FROM h
        """
    )


@query(
    "window_rolling_revenue",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ), 2) AS revenue_30d,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_orders_30d
    FROM orders
    """,
)
def window_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: per-customer trailing-30-day revenue
    and order count at every order — the time-based frame (RANGE over an
    interval, not ROWS) that row-offset frames can't express. One
    shuffle on o_custkey; the frame scan is sorted-run local."""
    o = _t(spark, sf_dir, "orders")
    return o.selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        """round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS revenue_30d""",
        """CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_orders_30d""",
    )


@query(
    "json_variant_events",
    """
    SELECT event_type,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS BIGINT) AS n_big
    FROM events
    GROUP BY 1
    """,
)
def json_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via Spark 4 VARIANT (``parse_json`` →
    ``variant_get``) — the modern path next to ``json_extract_events``'s
    string functions: the document parses ONCE into a binary variant
    and every field access is an offset lookup, where repeated
    ``get_json_object`` calls re-parse the text per extraction. At
    100 TB with many extracted fields that re-parse is the scan
    bottleneck; VARIANT (or a parquet VARIANT column upstream) removes
    it."""
    e = _t(spark, sf_dir, "events")
    v = e.withColumn("__v", F.parse_json("props"))
    k = F.expr("variant_get(__v, '$.k', 'long')")
    return (
        v.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big"),
        )
    )


@query(
    "agg_price_qty_regression",
    """
    SELECT l_returnflag,
           count(*) AS n,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Regression/correlation statistics per return flag:
    corr, sample covariance, stddev, and the OLS slope/intercept of
    price on quantity — the profiling surface a feature-engineering
    pass needs. All five are single-pass streaming co-moments (Spark's
    ImperativeAggregates), one map-side-combined shuffle, no joins."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_pq"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 2
        ).alias("intercept"),
    )


@query(
    "window_events_anomaly",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, hour, cnt,
             avg(cnt) OVER w AS mean_prev,
             stddev_samp(cnt) OVER w AS sd_prev,
             count(*) OVER w AS n_prev
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch(hour)
                   RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING)
    )
    SELECT event_type, hour, cnt,
           round(mean_prev, 3) AS mean_prev,
           round((cnt - mean_prev) / sd_prev, 3) AS z
    FROM stats
    WHERE n_prev >= 12 AND sd_prev > 0
      AND abs((cnt - mean_prev) / sd_prev) >= 2.0
    """,
)
def window_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Rolling z-score anomaly detection over the event stream:
    hourly counts per event type scored against the trailing-24-HOUR
    wall-clock window (a RANGE frame over epoch seconds, current hour
    excluded — a ROWS frame would silently span days for sparse types),
    flagged at |z| ≥ 2 with ≥ 12 baseline hours. Baseline hours are
    hours WITH events; a silent stream emits no row at all — pair with
    the gap-fill operator (`agg_events_gapfill`) when dead-stream
    detection is the goal. One small aggregate then a per-type ordered
    window — the window input is hours × types, not events, so the
    sort is trivial at any scale."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("hour"))
        .rangeBetween(-86400, -3600)
    )
    stats = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.avg("cnt").over(w).alias("__mean"),
        F.stddev_samp("cnt").over(w).alias("__sd"),
        F.count(F.lit(1)).over(w).alias("__np"),
    )
    z = (F.col("cnt") - F.col("__mean")) / F.col("__sd")
    return (
        stats.filter(
            (F.col("__np") >= 12) & (F.col("__sd") > 0) & (F.abs(z) >= 2.0)
        )
        .select(
            "event_type",
            "hour",
            "cnt",
            F.round("__mean", 3).alias("mean_prev"),
            F.round(z, 3).alias("z"),
        )
    )


@query(
    "window_order_streaks",
    """
    WITH days AS (
      SELECT DISTINCT o_custkey, date_trunc('day', o_orderdate) AS d
      FROM orders
    ),
    grp AS (
      SELECT o_custkey, d,
             d - to_days((row_number() OVER
                (PARTITION BY o_custkey ORDER BY d))::INT) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT o_custkey, count(*) AS len,
             min(d) AS streak_start, max(d) AS streak_end
      FROM grp GROUP BY o_custkey, anchor
    )
    SELECT o_custkey, len, streak_start, streak_end
    FROM streaks
    WHERE len >= 2
    """,
)
def window_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Gaps-and-islands: consecutive-day order streaks per
    customer (len ≥ 2) via the row_number-difference anchor trick —
    engagement/retention analysis without a self-join. One distinct
    aggregate, one per-customer ordered window over order DAYS (not
    orders), one groupBy; every shuffle is customer-keyed and tiny."""
    o = _t(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey", F.to_date(F.col("o_orderdate")).alias("d")
    ).distinct()
    grp = days.withColumn(
        "anchor", F.expr("date_sub(d, row_number() OVER "
                         "(PARTITION BY o_custkey ORDER BY d))")
    )
    return (
        grp.groupBy("o_custkey", "anchor")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
        )
        .filter(F.col("len") >= 2)
        .select("o_custkey", "len", "streak_start", "streak_end")
    )


@query(
    "agg_incremental_state",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(o_totalprice) AS price_n,
           round(sum(o_totalprice), 2) AS price_total,
           round(avg(o_totalprice), 4) AS price_avg,
           round(min(o_totalprice), 2) AS price_min,
           round(max(o_totalprice), 2) AS price_max
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_incremental_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Mergeable aggregate state (operators/aggstate.py): the
    history is split at 1997-01-01, a state frame is built per half,
    merged, and finalized — and must equal a direct aggregate over
    everything. The pattern that keeps a nightly 100 TB stats job
    O(day) instead of O(lifetime): increments fold into state rows
    (keys × 5 doubles), never rescanning history."""
    from .operators.aggstate import (
        build_agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    o = _t(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    cut = F.lit("1997-01-01").cast("timestamp")
    old = build_agg_state(o.filter(F.col("o_orderdate") < cut), keys, ["o_totalprice"])
    new = build_agg_state(o.filter(F.col("o_orderdate") >= cut), keys, ["o_totalprice"])
    fin = finalize_agg_state(
        merge_agg_states([old, new], keys, ["o_totalprice"]), keys, ["o_totalprice"]
    )
    return fin.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice_n").alias("price_n"),
        F.round("o_totalprice_total", 2).alias("price_total"),
        F.round("o_totalprice_avg", 4).alias("price_avg"),
        F.round("o_totalprice_min", 2).alias("price_min"),
        F.round("o_totalprice_max", 2).alias("price_max"),
    )


@query(
    "agg_profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def agg_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] TPC-H Q9-shaped profit rollup: five-way join (fact +
    three broadcast dims + the orders date source) with the LIKE
    filter pushed into the part scan BEFORE the join — the selective
    dim then prunes the fact stream via its broadcast hash join.
    The multi-join planning stressor next to the Q5-shaped
    `agg_regional_supplier_revenue`."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
    )


@query(
    "agg_custorder_distribution",
    """
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def agg_custorder_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many (non-urgent)
    orders, INCLUDING the zero-order customers the inner join would
    drop. Two aggregations: per-customer count over a left outer join
    with the filter in the JOIN CONDITION (an ON-clause predicate on
    the right side — pushed to the orders scan, never into a WHERE
    where it would turn the join inner), then the distribution. At
    scale both groupBys map-side combine; the join shuffles on custkey
    and the second aggregate on the tiny c_count domain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "agg_small_qty_revenue",
    """
    WITH pavg AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*)::BIGINT AS n_lines
    FROM lineitem l
    JOIN pavg a ON l.l_partkey = a.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size <= 5
    WHERE l.l_quantity < a.half_avg
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def agg_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders of small
    parts — a CORRELATED per-group average (quantity below half the
    part's own mean) realized as an aggregate-then-join-back, the plan
    Catalyst's DecorrelateInnerQuery produces for the subquery form.
    The per-part average table is partkey-keyed (same key as the join,
    no extra shuffle round), and the selective part filter broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    pavg = l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        l.join(pavg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@query(
    "agg_idle_rich_customers",
    """
    SELECT c_nationkey,
           count(*)::BIGINT AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def agg_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    URGENT order — a scalar subquery (global positive-balance mean) feeding
    a filter plus a NOT EXISTS anti join, aggregated per nation. The
    scalar lands as a one-row broadcast, the anti join shuffles on
    custkey (or broadcasts the distinct order keys when they fit), and
    the final groupBy is tiny."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "agg_shipping_priority_top10",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def agg_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders taken before the
    cutoff but still unshipped after it, for one market segment
    (o_orderpriority stands in for the schema's missing
    o_shippriority). Both date predicates and the segment filter reach
    their scans (PushedFilters); the two joins shuffle on custkey then
    orderkey; the groupBy reuses the orderkey partitioning from the
    second join (no extra exchange); revenue is ROUNDED BEFORE RANKING
    so the top-10 cutoff never depends on float summation order; the
    final top-10 is TakeOrderedAndProject — no global sort at scale."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "agg_late_order_priority",
    """
    SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def agg_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders with
    at least one LATE line (shipped > 90 days after the order date —
    the schema's stand-in for l_commitdate < l_receiptdate), i.e. an
    EXISTS realized as a LEFT SEMI join with the correlated date
    predicate in the join condition. Semi joins never duplicate or
    carry right-side columns, so the shuffle moves (orderkey, shipdate)
    pairs only; the quarter filter prunes the orders scan first and the
    final aggregate is a 5-row map-side combine."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "agg_returned_revenue_top20",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name, round(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def agg_returned_revenue_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in one half-year — fact-to-fact join shuffling on custkey then
    orderkey, the 25-row nation dim BROADCAST, the returnflag + date
    filters pushed to both scans. Revenue is rounded before ranking
    (cutoff independent of summation order) and the top-20 runs as
    TakeOrderedAndProject, never a full sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue", "n_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_large_volume_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
)
def agg_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: every order whose total quantity exceeds 300,
    with its customer — the classic IN-subquery-on-an-aggregate
    decorrelated to a lineitem self-aggregate LEFT SEMI joined back on
    l_orderkey. The having-aggregate and the semi join share the
    orderkey partitioning (one shuffle round covers both), the
    surviving fact slice is tiny so the customer join broadcasts the
    filtered orders side under AQE, and the final per-order aggregate
    reuses the orderkey clustering. Result is the FULL qualifying set
    (small by construction) — no float-cutoff ambiguity."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "events_ab_welch",
    """
    WITH pu AS (
      SELECT user_id,
             CASE WHEN """
    + _hex2int_sql("md5(CAST(user_id AS VARCHAR) || ':ab1')")
    + """ % 1000 < 500 THEN 1 ELSE 0 END AS variant,
             sum(value) AS m
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    s AS (
      SELECT count(m) FILTER (variant = 0)::BIGINT AS n0,
             count(m) FILTER (variant = 1)::BIGINT AS n1,
             avg(m) FILTER (variant = 0) AS m0,
             avg(m) FILTER (variant = 1) AS m1,
             var_samp(m) FILTER (variant = 0) AS v0,
             var_samp(m) FILTER (variant = 1) AS v1
      FROM pu
    )
    SELECT n0 AS n_0, n1 AS n_1,
           round(m0, 6) AS mean_0, round(m1, 6) AS mean_1,
           round(v0, 6) AS var_0, round(v1, 6) AS var_1,
           round((m1 - m0) / sqrt(v0/n0 + v1/n1), 6) AS t_stat,
           round(pow(v0/n0 + v1/n1, 2)
                 / (pow(v0/n0, 2)/(n0-1) + pow(v1/n1, 2)/(n1-1)), 2) AS dof
    FROM s
    """,
)
def events_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] A/B readout (operators/experiment.py:ab_welch_ttest):
    deterministic hash assignment of users to arms, per-user purchase
    revenue rollup, Welch t + Satterthwaite dof in one conditional
    aggregate — a single row out of the whole stream, one unit-keyed
    shuffle total. Oracle replays assignment, rollup and the formula."""
    from .operators.experiment import ab_welch_ttest

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ab_welch_ttest(e, "user_id", "value", salt="ab1")


@query(
    "agg_nation_trade_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def agg_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year and
    direction — the six-way fact chain with BOTH nation dims broadcast
    and the disjunctive nation-pair predicate evaluated after them; the
    date filter is pushed to the lineitem scan. The two fact joins
    shuffle on suppkey/orderkey/custkey; the final aggregate is 4 rows."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("__nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("cust_nation"))
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "agg_promo_revenue_ratio",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def agg_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of one month's revenue — the
    conditional-aggregate ratio with the month filter pushed to the
    fact scan and the part dim BROADCAST. One fact pass, one row out."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "agg_top_supplier_revenue",
    """
    WITH r AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM r)
    ORDER BY s.s_suppkey
    """,
)
def agg_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top revenue supplier(s) — the
    "view + scalar max" pattern: one suppkey aggregate, its 1-row max
    broadcast back as a crossJoin filter (ties all surface, no LIMIT
    ambiguity), supplier dim joined for the name. Revenue is rounded
    BEFORE the max/equality so float summation order can't split a tie
    across engines."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    r = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    mx = r.agg(F.max("total_rev").alias("__mx"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "agg_brand_type_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_type = 'PROMO'
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_size BETWEEN 20 AND 30 AND p.p_type = 'ECONOMY'
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def agg_brand_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    part and lineitem attributes — the disjunctive-pushdown showcase.
    The part dim broadcasts; Catalyst extracts the common
    lineitem-only bounds (l_quantity between 1 and 40) as a pushable
    conjunct while the full disjunction evaluates post-join. One fact
    pass, one row out."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_type") == "PROMO")
            & F.col("l_quantity").between(10, 30)
        )
        | (
            F.col("p_size").between(20, 30)
            & (F.col("p_type") == "ECONOMY")
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      GROUP BY 1, 2
    ),
    allsupp AS (SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY 1, 2)
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM allsupp a
                  WHERE a.l_orderkey = l1.l_orderkey
                    AND a.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def agg_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who ALONE were late on a finished
    multi-supplier order (shipdate > orderdate + 90 days standing in
    for the schema's missing commit/receipt dates) — the double
    correlated EXISTS/NOT EXISTS, realized as a LEFT SEMI then LEFT
    ANTI join on the orderkey with the suppkey-inequality residual.
    Both probes join the DISTINCT (orderkey, suppkey) projections, so
    the shuffles carry id pairs only; the supplier dim broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    allsupp = l.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.alias("l1")
    semi = l1.join(
        allsupp.alias("a"),
        (F.col("a.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole = semi.join(
        late.alias("l2"),
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "agg_discount_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def agg_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the forecast-revenue-change scan — every
    predicate (date window, discount band, quantity cap) reaches the
    parquet scan as PushedFilters, no join, one map-side-combined row
    out. The query that shows the scan layer is doing its job: at
    100 TB this reads only the four referenced columns of the pruned
    row groups."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "agg_nation_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def agg_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's STANDARD-part
    market by order year — the deepest classic join tree (part +
    supplier + both nation copies + region all BROADCAST, facts
    shuffling on partkey/orderkey/custkey) closed by a conditional-agg
    ratio per year. With Q6 this completes every TPC-H plan shape the
    testdata schema can express (Q2/Q11/Q16/Q20 need partsupp, Q12
    needs l_shipmode — documented schema gaps)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("__nk1"), F.col("n_regionkey").alias("__rk1"))
    n2 = n.select(F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__nk1"))
        .join(F.broadcast(r), F.col("__rk1") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__nk2"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "window_revenue_pareto",
    """
    WITH cr AS (
      SELECT o_custkey,
             CAST(round(round(sum(o_totalprice), 2) * 100) AS BIGINT) AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, rev_c,
             row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rn,
             sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             sum(rev_c) OVER () AS tot_c,
             count(*) OVER () AS n
      FROM cr
    )
    SELECT CAST(ceil(100.0 * rn / n) AS INTEGER) AS cust_pctile,
           round(max(CAST(cum_c AS DOUBLE) / CAST(tot_c AS DOUBLE)), 6)
             AS cum_rev_share
    FROM ranked
    GROUP BY 1 ORDER BY 1
    """,
)
def window_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / Lorenz concentration curve: what share of total revenue
    the top X% of customers account for, per percentile bucket — the
    '80/20' readout. One custkey aggregate, then a TWO-PHASE global
    rank + running sum (``operators/ranks.py``: range-bucket on revenue
    desc, partitioned window per bucket, broadcast prefix offsets) —
    never a single-partition window, so a 10^9-customer corpus fans out
    across reducers instead of one task (r5 VERDICT ask #3). Revenue is
    integerized to cents before ranking/summation: integer running sums
    are associative, so bucket-partial + offset is bit-identical to the
    oracle's one-pass running sum (a double running sum would drift in
    the last ulp under re-association). Collapsed to ≤100 rows."""
    from pyspark.sql import Window

    from .operators.ranks import BUCKET, ORD, bucket_offsets, range_buckets

    o = _t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.round(F.round(F.sum("o_totalprice"), 2) * 100)
        .cast("long")
        .alias("rev_c")
    )
    totals = F.broadcast(
        cr.agg(
            F.sum("rev_c").alias("tot_c"), F.count(F.lit(1)).alias("n")
        )
    )
    b = range_buckets(cr, F.col("rev_c"), descending=True)
    off = bucket_offsets(b, {"__offn": F.lit(1), "__offr": F.col("rev_c")})
    wo = Window.partitionBy(BUCKET).orderBy(F.col(ORD).asc(), F.col("o_custkey"))
    ranked = (
        b.join(F.broadcast(off), BUCKET)
        .withColumn(
            "rn", (F.col("__offn") + F.row_number().over(wo)).cast("long")
        )
        .withColumn(
            "cum_c",
            F.col("__offr")
            + F.sum("rev_c").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .crossJoin(totals)
    )
    return (
        ranked.groupBy(
            F.ceil(100.0 * F.col("rn") / F.col("n")).cast("int").alias("cust_pctile")
        )
        .agg(
            F.round(
                F.max(
                    F.col("cum_c").cast("double")
                    / F.col("tot_c").cast("double")
                ),
                6,
            ).alias("cum_rev_share")
        )
        .orderBy("cust_pctile")
    )


@query(
    "window_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*)::BIGINT AS freq,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM base
    )
    SELECT r_score, f_score, m_score,
           count(*)::BIGINT AS n_customers
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def window_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-5 on Recency /
    Frequency / Monetary, then the 125-cell segment census. Each score
    is ``ntile(5)`` by SEMANTICS but never by a global window: the
    two-phase ``ranks.global_ntile`` computes the global row number via
    range-bucket + partitioned window + broadcast prefix counts, then
    applies SQL ntile's closed form (first ``n mod 5`` tiles one row
    bigger) in exact integer arithmetic — bit-identical to the oracle's
    ntile, scaled across reducers (r5 VERDICT ask #3; id tiebreaks make
    the quintile edges engine-deterministic, monetary rounded before
    ranking). The census output is fixed-size.

    Lazy checkpoints between the ntiles: each global_ntile drives FOUR
    passes over its input (range stats, offsets, n_tot, main stream),
    so without a materialization barrier ntile 3 would re-run the
    orders rollup and both earlier ntile chains 4× each (measured 5.5s
    → 2.5s at sf0.1). The checkpointed frame is the customer-cardinality
    rollup, not the orders fact."""
    from .operators.ranks import global_ntile

    o = _t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    ).localCheckpoint(eager=False)
    tb = [F.col("o_custkey")]
    scored = global_ntile(
        base, F.unix_micros(F.col("last_order").cast("timestamp")), tb, 5,
        out_col="r_score", descending=True,
    ).localCheckpoint(eager=False)
    scored = global_ntile(
        scored, F.col("freq"), tb, 5, out_col="f_score", descending=True
    ).localCheckpoint(eager=False)
    scored = global_ntile(
        scored, F.col("monetary"), tb, 5, out_col="m_score", descending=True
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@query(
    "window_funnel_latency",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(quantile_cont(lat_h, 0.5), 4) AS p50_hours,
           round(quantile_cont(lat_h, 0.9), 4) AS p90_hours,
           round(avg(lat_h), 4) AS mean_hours
    FROM (
      SELECT date_diff('microsecond', s.signup_ts, p.first_purchase) / 3600000000.0 AS lat_h
      FROM s JOIN p USING (user_id)
    )
    """,
)
def window_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles: per user, first signup → first
    subsequent purchase; exact p50/p90/mean of the latency in hours —
    the "how long does conversion take" readout next to the funnel's
    "how many convert". Two per-user min aggregates share the user-key
    shuffle, the latency projection is in-row, and the exact
    percentiles run on the converted-users table (small side). Exact
    `percentile` (not approx) keeps the DuckDB twin bit-comparable."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = (
        s.join(p, "user_id")
        .select(
            # ts may surface as TIMESTAMP_NTZ (nanos parquet path); the
            # double cast goes via TIMESTAMP so both encodings work, and
            # the session-zone offset cancels in the difference
            (
                (
                    F.col("first_purchase").cast("timestamp").cast("double")
                    - F.col("signup_ts").cast("timestamp").cast("double")
                )
                / 3600.0
            ).alias("lat_h")
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(lat_h, 0.5)"), 4).alias("p50_hours"),
        F.round(F.expr("percentile(lat_h, 0.9)"), 4).alias("p90_hours"),
        F.round(F.avg("lat_h"), 4).alias("mean_hours"),
    )


@query(
    "window_seasonal_backtest",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS d,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    shifted AS (
      SELECT event_type, d, n,
             lag(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred
      FROM daily
    )
    SELECT event_type,
           count(*)::BIGINT AS n_days_scored,
           round(avg(abs(n - pred) / n), 6) AS mape,
           round(avg(abs(n - pred)), 4) AS mae
    FROM shifted
    WHERE pred IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def window_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event count
    with the value 7 days earlier (the baseline every real forecast
    must beat) and score per-type MAPE/MAE over the full history — the
    capacity-planning sanity readout. Window input is the tiny
    (type, day) aggregate, never raw events; one lag window + census.
    Day counts are integers, so the error ratios are engine-exact."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    shifted = daily.withColumn("pred", F.lag("n", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    return (
        shifted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            F.round(F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")), 6).alias(
                "mape"
            ),
            F.round(F.avg(F.abs(F.col("n") - F.col("pred"))), 4).alias("mae"),
        )
        .orderBy("event_type")
    )


@query(
    "window_event_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*)::BIGINT AS n_transitions
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def window_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition (first-order Markov) census: for every user's
    time-ordered stream, count each consecutive (from → to) event-type
    pair — the path-analysis table behind funnels and next-action
    models. One user-keyed window (lead with the event-id tiebreak so
    same-timestamp rows order identically in every engine) + a 25-cell
    census aggregate."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    return (
        ordered.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@query(
    "events_ab_cuped",
    """
    WITH pu AS (
      SELECT user_id,
             CASE WHEN """
    + _hex2int_sql("md5(CAST(user_id AS VARCHAR) || ':ab1')")
    + """ % 1000 < 500 THEN 1 ELSE 0 END AS variant,
             coalesce(sum(value) FILTER (ts < TIMESTAMP '1997-01-01'), 0) AS pre,
             coalesce(sum(value) FILTER (ts >= TIMESTAMP '1997-01-01'), 0) AS post
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    pooled AS (
      SELECT avg(pre) AS mp, var_samp(pre) AS vp, covar_samp(pre, post) AS cv
      FROM pu
    ),
    adj AS (
      SELECT variant,
             post - (CASE WHEN vp > 0 THEN cv / vp ELSE 0 END) * (pre - mp) AS m
      FROM pu, pooled
    ),
    s AS (
      SELECT count(m) FILTER (variant = 0)::BIGINT AS n0,
             count(m) FILTER (variant = 1)::BIGINT AS n1,
             avg(m) FILTER (variant = 0) AS m0,
             avg(m) FILTER (variant = 1) AS m1,
             var_samp(m) FILTER (variant = 0) AS v0,
             var_samp(m) FILTER (variant = 1) AS v1
      FROM adj
    )
    SELECT n0 AS n_0, n1 AS n_1,
           round(m0, 6) AS adj_mean_0, round(m1, 6) AS adj_mean_1,
           round(v0, 6) AS adj_var_0, round(v1, 6) AS adj_var_1,
           round((m1 - m0) / sqrt(v0/n0 + v1/n1), 6) AS t_stat
    FROM s
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CUPED variance-reduced A/B readout
    (operators/experiment.py:ab_cuped_ttest): pre-1997 purchase revenue
    as the covariate for the post-period metric, theta pooled over both
    arms, Welch t on the adjusted per-user values — the platform-grade
    companion to events_ab_welch. Oracle replays rollup, theta, and the
    formula."""
    from .operators.experiment import ab_cuped_ttest

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ab_cuped_ttest(e, "user_id", "value", "ts", "1997-01-01", salt="ab1")


@query(
    "events_bootstrap_ci",
    """
    WITH pu AS (
      SELECT user_id, sum(value) AS m
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    reps AS (
      SELECT user_id, m, unnest(range(100)) AS b FROM pu
    ),
    wts AS (
      SELECT b, m,
             (CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1 WHEN h < 920 THEN 2
                   WHEN h < 981 THEN 3 WHEN h < 996 THEN 4 WHEN h < 999 THEN 5
                   ELSE 6 END) AS w
      FROM (SELECT b, m,
    """
    + _hex2int_sql(
        "md5(CAST(user_id AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':bs1')"
    )
    + """ % 1000 AS h
            FROM reps)
    ),
    rm AS (
      SELECT b, sum(w * m) / sum(w) AS rmean FROM wts GROUP BY b
    ),
    pt AS (SELECT avg(m) AS p FROM pu)
    SELECT round(p, 6) AS point_est,
           round(stddev_samp(rmean), 6) AS boot_se,
           round(quantile_cont(rmean, 0.025), 6) AS ci_lo,
           round(quantile_cont(rmean, 0.975), 6) AS ci_hi,
           count(*)::BIGINT AS n_replicas
    FROM rm, pt GROUP BY p
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic Poisson-bootstrap CI
    (operators/experiment.py:bootstrap_mean_ci): 95% interval for mean
    per-user purchase revenue from 100 hash-weighted replicas — the
    uncertainty number for any corpus statistic, with no RNG state and
    no driver loop. Oracle replays the per-mille Poisson weights and
    the replica means exactly."""
    from .operators.experiment import bootstrap_mean_ci

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return bootstrap_mean_ci(e, "user_id", "value", n_replicas=100, seed="bs1")


@query(
    "agg_supplier_concentration",
    """
    WITH r AS (
      SELECT p.p_type, l.l_suppkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    t AS (SELECT p_type, sum(rev) AS tot FROM r GROUP BY 1)
    SELECT r.p_type,
           count(*)::BIGINT AS n_suppliers,
           round(sum(pow(r.rev / t.tot, 2)), 6) AS hhi
    FROM r JOIN t USING (p_type)
    GROUP BY r.p_type
    ORDER BY r.p_type
    """,
)
def agg_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per part type:
    sum of squared revenue shares (1/n = perfectly even, → 1 =
    monopoly) — the supply-chain-risk readout. Two aggregates sharing
    the (type, supplier) grouping + a broadcast totals join; part dim
    broadcast into the fact scan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    r = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
    )
    t = r.groupBy("p_type").agg(F.sum("rev").alias("tot"))
    return (
        r.join(F.broadcast(t), "p_type")
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.pow(F.col("rev") / F.col("tot"), 2)), 6).alias("hhi"),
        )
        .orderBy("p_type")
    )


@query(
    "agg_revenue_gini",
    """
    WITH cr AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS i,
             count(*) OVER () AS n,
             sum(rev) OVER () AS tot
      FROM cr
    )
    SELECT round(2.0 * sum(i * rev) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           CAST(max(n) AS BIGINT) AS n_customers
    FROM r
    """,
)
def agg_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue (0 = perfectly even, → 1 =
    one customer is the business) — the single-number summary of the
    Pareto curve, third leg of the concentration family (HHI per
    segment, Lorenz curve, Gini global). Ascending rank formula
    2·Σ(i·x)/(n·Σx) − (n+1)/n over the post-aggregate customer table
    (revenue rounded before ranking, custkey tiebreak). The rank comes
    from the two-phase ``ranks.global_row_number`` (range-bucketed
    partitioned window + broadcast prefix counts — no single-partition
    window, r5 VERDICT ask #3) and n/Σx from a broadcast one-row
    aggregate instead of unpartitioned ``OVER ()`` windows; Σ(i·x) is a
    plain commutative aggregate."""
    from .operators.ranks import global_row_number

    o = _t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    totals = F.broadcast(
        cr.agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("tot"))
    )
    r = global_row_number(
        cr, F.col("rev"), [F.col("o_custkey")], out_col="i"
    ).crossJoin(totals)
    return r.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev")) / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").alias("n_customers"),
    )


@query(
    "agg_session_stats",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN date_diff('microsecond',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) >= 14400000000::BIGINT
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id
                              ORDER BY ts, new_s DESC
                              ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM o
    ),
    per AS (
      SELECT user_id, sid, count(*)::BIGINT AS n_events,
             date_diff('microsecond', min(ts), max(ts)) / 3600000000.0 AS dur_h
      FROM s GROUP BY user_id, sid
    )
    SELECT count(*)::BIGINT AS n_sessions,
           round(avg(n_events), 4) AS mean_events,
           round(quantile_cont(dur_h, 0.5), 4) AS p50_hours,
           round(quantile_cont(dur_h, 0.9), 4) AS p90_hours,
           round(avg(dur_h), 4) AS mean_hours
    FROM per
    """,
)
def agg_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality summary over the 4-hour-gap sessionization:
    session count, mean events/session, and exact p50/p90/mean session
    DURATION (first→last event) — the engagement readout on top of
    agg_events_sessions' raw windows. One session_window aggregate
    (same shape), then exact percentiles over the session table (small
    side). Duration from the window bounds minus the trailing gap —
    session_window's end is last-event + gap, so duration = end - start
    - 4h, NTZ-safe via double casts."""
    e = _t(spark, sf_dir, "events")
    per = (
        e.groupBy("user_id", F.session_window("ts", "4 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "n_events",
            (
                F.col("w.end").cast("timestamp").cast("double")
                - F.col("w.start").cast("timestamp").cast("double")
                - 4.0 * 3600.0
            ).alias("dur_s"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("mean_events"),
        F.round(F.expr("percentile(dur_s / 3600.0, 0.5)"), 4).alias("p50_hours"),
        F.round(F.expr("percentile(dur_s / 3600.0, 0.9)"), 4).alias("p90_hours"),
        F.round(F.avg(F.col("dur_s") / 3600.0), 4).alias("mean_hours"),
    )


@query(
    "agg_pivot_status_revenue",
    """
    SELECT o_orderpriority,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                                   THEN o_totalprice END), 0), 2) AS rev_o,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                                   THEN o_totalprice END), 0), 2) AS rev_f,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                                   THEN o_totalprice END), 0), 2) AS rev_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT plan shape (§2.8 completion next to UNPIVOT): revenue per
    order priority pivoted across the three order statuses via
    ``groupBy().pivot(values=...)`` — the EXPLICIT value list keeps the
    pivot a single-pass aggregate (omitting it costs a separate
    distinct-scan job to discover columns, a real extra pass at 100
    TB). Catalyst compiles it to exactly the oracle's CASE-sum
    aggregate: one map-side-combined shuffle, fixed-width output."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("rev_o"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("rev_f"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("rev_p"),
    ).orderBy("o_orderpriority")


@query(
    "agg_hll_incremental_users",
    """
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_distinct,
           true AS paths_agree,
           true AS within_error_bound
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_hll_incremental_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Incremental distinct users per event type via MERGEABLE
    HLL sketch states (operators/aggstate.py:build/merge/finalize_
    hll_state): the events table is processed as two separate
    'ingestion days' whose per-key sketches are built independently and
    FOLDED — the O(day) nightly-job shape for count-distinct, where raw
    counts can't merge. DuckDB cannot replay DataSketches bytes, so the
    differential check is BOUNDED-ERROR (VERDICT r6 ask #7): the query
    emits ``paths_agree`` (fold == full-history sketch — union
    associativity, exact equality) and ``within_error_bound``
    (|estimate − exact| ≤ 5%·exact; lg_k=12 ⇒ se ≈1.6%, 5% ≈ 3σ), and
    the oracle pins BOTH booleans TRUE per key against the exact
    distinct twin. At 100 TB drop the exact-twin aggregate: it exists
    for the audit."""
    from .operators import aggstate as A

    # e feeds four consumers (two day builds, the full build, the exact
    # twin) — lazy checkpoint so the events scan runs once
    e = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.dayofmonth("ts").alias("__d")
    ).localCheckpoint(eager=False)
    d1 = e.filter(F.col("__d") % 2 == 0)
    d2 = e.filter(F.col("__d") % 2 == 1)
    merged = A.merge_hll_states(
        A.build_hll_state(d1, ["event_type"], "user_id"),
        A.build_hll_state(d2, ["event_type"], "user_id"),
        ["event_type"],
    )
    inc = A.finalize_hll_state(merged, ["event_type"])
    full = A.finalize_hll_state(
        A.build_hll_state(e, ["event_type"], "user_id"), ["event_type"]
    ).withColumnRenamed("approx_distinct", "full_history_distinct")
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        inc.join(full, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (F.col("approx_distinct") == F.col("full_history_distinct")).alias(
                "paths_agree"
            ),
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_error_bound"),
        )
        .orderBy("event_type")
    )


@query("events_recency_sample", _recency_sample_sql())
def events_recency_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Recency-weighted exact-k event sampling — the "freshness
    bias" composition the curation operators were built for: each event
    gets an exponential time-decay weight (half-life-ish 30 days,
    rounded so both engines rank identical doubles) and
    ``curation.priority_sample`` (Efraimidis-Spirakis A-ES) draws an
    exact 100 without replacement, deterministically — recent events
    proportionally likelier, the identical 100 on any engine/run.
    Events older than the weight's 6-dp floor (or with NULL ts) have
    zero selection probability and are excluded, per the A-ES contract.
    One broadcast max-ts row + a pure projection + TakeOrdered; the
    event stream never shuffles."""
    from .operators.curation import priority_sample

    e = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    mx = F.broadcast(e.agg(F.max("ts").alias("__mx")))
    aged = e.crossJoin(mx).select(
        "event_id",
        "event_type",
        F.datediff(F.to_date("__mx"), F.to_date("ts")).alias("age_days"),
    )
    weighted = aged.withColumn(
        "recency_weight",
        F.round(F.exp(-F.col("age_days") / F.lit(30.0)), 6),
    )
    return priority_sample(
        weighted, "event_id", "recency_weight", 100, seed="rec0"
    ).select("event_id", "event_type", "age_days", "recency_weight")


@query("agg_hist_quantile_state", _hist_quantile_sql())
def agg_hist_quantile_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Mergeable HISTOGRAM-QUANTILE state (operators/aggstate.py:
    build/merge/finalize_hist_state): the events table is processed as
    two 'ingestion days' whose per-event-type equi-width histogram
    states are built independently and FOLDED — completing the
    mergeable-state family (count/sum monoid = exact moments, HLL =
    distinct counts, histogram = order statistics). Bucket-count sums
    merge EXACTLY (``fold_exact`` pins folded state == full-history
    state, array-for-array), and p50/p90/p99 finalize from the folded
    state by within-bucket linear interpolation — error bounded by one
    bucket width, O(day) nightly cost. The oracle replays the bucket
    assignment, cumulative scan, and interpolation bit-for-bit."""
    from .operators import aggstate as A

    kw = dict(lo=0.0, hi=500.0, n_buckets=100)
    # e feeds three builds and merged feeds quant + audit — lazy
    # checkpoints so the events scan and the fold run once each
    e = _t(spark, sf_dir, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("__d")
    ).localCheckpoint(eager=False)
    s1 = A.build_hist_state(
        e.filter(F.col("__d") % 2 == 0), ["event_type"], "value", **kw
    )
    s2 = A.build_hist_state(
        e.filter(F.col("__d") % 2 == 1), ["event_type"], "value", **kw
    )
    merged = A.merge_hist_states([s1, s2], ["event_type"]).localCheckpoint(
        eager=False
    )
    full = A.build_hist_state(e, ["event_type"], "value", **kw)
    quant = A.finalize_hist_quantiles(merged, ["event_type"], [0.5, 0.9, 0.99])
    audit = (
        merged.alias("m")
        .join(full.alias("f"), "event_type")
        .select(
            "event_type",
            (
                (F.col("m.hist") == F.col("f.hist"))
                & (F.col("m.n") == F.col("f.n"))
                & (F.col("m.vmin") == F.col("f.vmin"))
                & (F.col("m.vmax") == F.col("f.vmax"))
            ).alias("fold_exact"),
        )
    )
    return quant.join(audit, "event_type").orderBy("event_type")


@query(
    "agg_event_paths",
    """
    WITH seq AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             lead(event_type, 1) OVER w AS nxt,
             lead(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                   ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || nxt || '>' || nxt2 AS path,
           count(*)::BIGINT AS n_paths
    FROM seq WHERE nxt IS NOT NULL AND nxt2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_paths DESC, path
    LIMIT 20
    """,
)
def agg_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Top-20 three-step event paths per (user, day) journey —
    the product-analytics "most common 3-step flows" census, the
    sequence-level sibling of window_event_transitions' 1-step Markov
    counts. One window shuffle keyed on (user, day) — thousands of
    small partitions, never global — two in-row leads, then a
    path-count aggregate (word-count shape, map-side combined) into
    TakeOrderedAndProject. Deterministic: (ts, event_id) total order,
    count-then-path tiebreak. Oracle replays the lead windows and the
    tiebreak."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", F.col("ts").cast("date"))
        .orderBy("ts", "event_id")
    )
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("__n1"),
        F.lead("event_type", 2).over(w).alias("__n2"),
    ).filter(F.col("__n1").isNotNull() & F.col("__n2").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "event_type", "__n1", "__n2").alias("path")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("path"))
        .limit(20)
    )


@query(
    "agg_bloom_incremental_users",
    """
    WITH e AS (SELECT user_id, day(ts) % 3 AS d FROM events
               WHERE user_id IS NOT NULL),
    hist AS (SELECT DISTINCT user_id FROM e WHERE d IN (0, 1)),
    batch AS (SELECT DISTINCT user_id FROM e WHERE d = 2),
    """
    + _bloom_probe_sql(
        key="user_id", hist="hist", inc="batch", seed="bu1", m=65536, k=5
    )
    + """
    SELECT count(*)::BIGINT AS n_batch_users,
           sum(CASE WHEN seen THEN 1 ELSE 0 END)::BIGINT AS n_true_seen,
           sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS n_maybe_seen,
           sum(CASE WHEN maybe AND NOT seen THEN 1 ELSE 0 END)::BIGINT
             AS n_false_positive,
           sum(CASE WHEN NOT maybe AND seen THEN 1 ELSE 0 END)::BIGINT
             AS n_false_negative,
           true AS paths_agree
    FROM (SELECT f.user_id, f.maybe, h.user_id IS NOT NULL AS seen
          FROM flags f LEFT JOIN hist h USING (user_id))
    """,
)
def agg_bloom_incremental_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Incremental first-sighting detection via MERGEABLE Bloom
    states (operators/aggstate.py:merge_bloom_states), the set-
    membership twin of ``agg_hll_incremental_users``: two ingestion
    days build Bloom states INDEPENDENTLY and fold by word-wise bitwise
    OR — exact set union, so unlike the HLL twin's bounded-error merge,
    ``paths_agree`` here pins fold == full-history-build IDENTICALLY
    (word tables compared verbatim — a bounded driver probe over ≤ m/64
    rows). Day-2's distinct users then probe the folded state; the
    exact-truth join against history exists ONLY for the audit columns
    (at 100 TB you keep the probe — that is the point — and route just
    the maybe-seen sliver to the exact path). Raw event rows feed the
    build without a pre-distinct: Bloom insertion is idempotent and the
    map-side combine collapses duplicate bits before any shuffle."""
    from .operators import aggstate as A

    # e feeds five consumers (two day builds, the full build, the exact
    # history, the probe batch) and merged/full are re-collected by the
    # audit probes — lazily checkpoint all three so each md5 build pass
    # and the events scan run ONCE instead of once per downstream action
    # (guide §5: cut lineage of multiply-consumed intermediates; states
    # are ≤ m/64 rows, e is the projected keys only)
    e = _t(spark, sf_dir, "events").select(
        "user_id", (F.dayofmonth("ts") % 3).alias("__d")
    ).where(F.col("user_id").isNotNull()).localCheckpoint(eager=False)
    kw = dict(m_bits=1 << 16, k=5, seed="bu1")
    # s0/s1 checkpointed too: merge_bloom_states' eager layout probe
    # fires before merged's own checkpoint exists, so unpinned builds
    # would still run twice (probe + first materialization)
    s0 = A.build_bloom_state(
        e.where(F.col("__d") == 0), "user_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_bloom_state(
        e.where(F.col("__d") == 1), "user_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_bloom_states([s0, s1]).localCheckpoint(eager=False)
    full = A.build_bloom_state(
        e.where(F.col("__d").isin(0, 1)), "user_id", **kw
    ).localCheckpoint(eager=False)
    # exact fold == full-build equality: word tables compared verbatim
    # (bounded driver probe — occupied words only, <= m/64 rows each)
    words = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("word_idx", "word").collect())
    )
    agree = words(merged) == words(full)
    hist_users = e.where(F.col("__d").isin(0, 1)).select("user_id").distinct()
    batch = e.where(F.col("__d") == 2).select("user_id").distinct()
    probed = A.probe_bloom(batch, "user_id", merged, out_col="maybe").join(
        hist_users.withColumn("__s", F.lit(True)), "user_id", "left"
    )
    seen = F.coalesce(F.col("__s"), F.lit(False))
    maybe = F.col("maybe")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_batch_users"),
        one(seen).alias("n_true_seen"),
        one(maybe).alias("n_maybe_seen"),
        one(maybe & ~seen).alias("n_false_positive"),
        one(~maybe & seen).alias("n_false_negative"),
        F.lit(agree).alias("paths_agree"),
    )


@query(
    "agg_kmv_incremental_users",
    f"""
    WITH e AS (SELECT event_type, user_id, day(ts) % 3 AS d FROM events
               WHERE user_id IS NOT NULL),
    hist AS (SELECT DISTINCT event_type, user_id FROM e WHERE d IN (0, 1)),
    hh AS (
      SELECT event_type,
             {_hex2int_sql("substr(md5(CAST(user_id AS VARCHAR) || ':kv0'), 1, 15)")}
               AS hv
      FROM hist
    ),
    dh AS (SELECT DISTINCT event_type, hv FROM hh),
    bk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv, row_number() OVER (
          PARTITION BY event_type ORDER BY hv ASC) AS rn
        FROM dh
      ) WHERE rn <= 32
    ),
    fin AS (SELECT event_type, count(*)::BIGINT AS n_kept, max(hv) AS hk
            FROM bk GROUP BY 1),
    ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
           FROM hist GROUP BY 1)
    SELECT f.event_type, f.n_kept,
           (CASE WHEN f.n_kept < 32 THEN f.n_kept::DOUBLE
                 ELSE round(31 / (hk::DOUBLE / 1152921504606846976.0), 0)
            END)::BIGINT AS approx_distinct,
           ex.exact_distinct, true AS paths_agree
    FROM fin f JOIN ex USING (event_type)
    """,
)
def agg_kmv_incremental_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Incremental distinct users per event type via MERGEABLE
    KMV (bottom-k) sketches (operators/aggstate.py:build/merge_kmv_
    states, finalize_kmv) — the EXACT-REPLAY member of the family's
    distinct-count corner next to the HLL twin
    (``agg_hll_incremental_users``): two ingestion days build bottom-32
    portable-md5 hash sketches INDEPENDENTLY and fold by re-taking the
    bottom-k of the union — exact (the k smallest of a union are each
    within their side's k smallest), so ``paths_agree`` pins fold ==
    full-history-build hash-for-hash. Where the HLL oracle can only
    check a bounded-error envelope (DataSketches bytes), every KMV
    hash, fold and the (k−1)/U(k) estimate replay EXACTLY in SQL —
    the exact-count join exists only for the audit column. At 100 TB
    the state is ≤ k longs per key forever, the O(day) nightly fold."""
    from .operators import aggstate as A

    # the sketch-state query pattern (see agg_bloom_incremental_users):
    # e feeds four consumers, merge/finalize re-probe layouts eagerly,
    # and the audit collects both states — lazy checkpoints make every
    # md5 build pass and the events scan run once
    e = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", (F.dayofmonth("ts") % 3).alias("__d")
    ).where(F.col("user_id").isNotNull()).localCheckpoint(eager=False)
    kw = dict(k=32, seed="kv0")
    s0 = A.build_kmv_state(
        e.where(F.col("__d") == 0), ["event_type"], "user_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_kmv_state(
        e.where(F.col("__d") == 1), ["event_type"], "user_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_kmv_states([s0, s1], ["event_type"]).localCheckpoint(
        eager=False
    )
    full = A.build_kmv_state(
        e.where(F.col("__d").isin(0, 1)), ["event_type"], "user_id", **kw
    ).localCheckpoint(eager=False)
    rows = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("event_type", "__hv").collect())
    )
    agree = rows(merged) == rows(full)
    exact = (
        e.where(F.col("__d").isin(0, 1))
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        A.finalize_kmv(merged, ["event_type"])
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_kept",
            "approx_distinct",
            "exact_distinct",
            F.lit(agree).alias("paths_agree"),
        )
    )


@query(
    "agg_kmv_set_ops",
    f"""
    WITH e AS (SELECT event_type, user_id, day(ts) % 3 AS d FROM events
               WHERE user_id IS NOT NULL),
    ha AS (
      SELECT DISTINCT event_type,
             {_hex2int_sql("substr(md5(CAST(user_id AS VARCHAR) || ':kv1'), 1, 15)")}
               AS hv
      FROM e WHERE d = 0
    ),
    hb AS (
      SELECT DISTINCT event_type,
             {_hex2int_sql("substr(md5(CAST(user_id AS VARCHAR) || ':kv1'), 1, 15)")}
               AS hv
      FROM e WHERE d = 1
    ),
    sa AS (SELECT event_type, hv FROM (
             SELECT event_type, hv, row_number() OVER (
               PARTITION BY event_type ORDER BY hv ASC) AS rn FROM ha
           ) WHERE rn <= 32),
    sb AS (SELECT event_type, hv FROM (
             SELECT event_type, hv, row_number() OVER (
               PARTITION BY event_type ORDER BY hv ASC) AS rn FROM hb
           ) WHERE rn <= 32),
    u AS (SELECT event_type, hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
            SELECT event_type, hv, 1 AS in_a, 0 AS in_b FROM sa
            UNION ALL
            SELECT event_type, hv, 0 AS in_a, 1 AS in_b FROM sb
          ) GROUP BY 1, 2),
    r AS (SELECT event_type, hv, in_a, in_b, row_number() OVER (
            PARTITION BY event_type ORDER BY hv ASC) AS rn FROM u),
    agg AS (SELECT event_type,
              sum(CASE WHEN rn <= 32 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              max(CASE WHEN rn <= 32 THEN hv END) AS hk,
              sum(CASE WHEN rn <= 32 AND in_a + in_b = 2 THEN 1 ELSE 0 END)
                ::BIGINT AS nboth,
              sum(CASE WHEN rn <= 32 AND in_a = 1 THEN 1 ELSE 0 END)
                ::BIGINT AS na_bk
            FROM r GROUP BY 1),
    est AS (SELECT event_type, n_kept, nboth, na_bk,
              CASE WHEN n_kept < 32 THEN n_kept::DOUBLE
                   ELSE round(31 / (hk::DOUBLE / 1152921504606846976.0), 0)
              END AS union_d
            FROM agg)
    SELECT event_type, n_kept,
           union_d::BIGINT AS union_est,
           round((nboth::DOUBLE / n_kept) * union_d, 0)::BIGINT
             AS intersect_est,
           round(((na_bk - nboth)::DOUBLE / n_kept) * union_d, 0)::BIGINT
             AS diff_ab_est,
           round(((n_kept - na_bk)::DOUBLE / n_kept) * union_d, 0)::BIGINT
             AS diff_ba_est,
           round(nboth::DOUBLE / n_kept, 6) AS jaccard_e6
    FROM est
    """,
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] KMV set algebra across two segment sketches
    (operators/aggstate.py:kmv_set_estimates — Beyer et al. 2007):
    per event type, estimate how many distinct users two ingestion
    windows SHARE (union / intersection / Jaccard) from the two
    ≤ 32-longs-per-key bottom-k states alone — the "do these segments
    overlap" question answered without re-scanning either corpus. The
    combined bottom-k of the union is itself the union's KMV sketch
    (the merge property), and the fraction of it present in both
    sketches estimates the Jaccard; every hash and estimate is
    deterministic portable-md5 arithmetic, so the oracle replays the
    whole chain value-exactly (including the exact branch where the
    union kept < k hashes). At 100 TB: the inputs are O(k) per key
    forever; the estimate never touches the raw data."""
    from .operators import aggstate as A

    e = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", (F.dayofmonth("ts") % 3).alias("__d")
    ).where(F.col("user_id").isNotNull())
    kw = dict(k=32, seed="kv1")
    # pin both inline-built states: kmv_set_estimates references each
    # side more than once (union sketch + per-side estimates — its
    # documented contract), the agg_kmv_overlap_matrix trade
    a = A.build_kmv_state(
        e.where(F.col("__d") == 0), ["event_type"], "user_id", **kw
    ).localCheckpoint(eager=False)
    b = A.build_kmv_state(
        e.where(F.col("__d") == 1), ["event_type"], "user_id", **kw
    ).localCheckpoint(eager=False)
    return A.kmv_set_estimates(a, b, ["event_type"])


@query(
    "agg_cms_heavy_hitters",
    """
    WITH e AS (SELECT user_id, day(ts) % 3 AS d FROM events
               WHERE user_id IS NOT NULL),
    hist AS (SELECT user_id FROM e WHERE d IN (0, 1)),
    """
    + "ch AS (" + _cms_hash_sql("user_id", "cm0", 64) + " FROM hist)),"
    + """
    cells AS (SELECT i AS r, (h1 + i * h2) % 64 AS col,
                     count(*)::BIGINT AS cnt
              FROM ch, range(4) t(i) GROUP BY 1, 2),
    keys AS (SELECT DISTINCT user_id FROM hist),
    """
    + "kh AS (" + _cms_hash_sql("user_id", "cm0", 64) + " FROM keys)),"
    + """
    probe AS (SELECT user_id, i AS r, (h1 + i * h2) % 64 AS col
              FROM kh, range(4) t(i)),
    est AS (SELECT p.user_id, min(coalesce(c.cnt, 0))::BIGINT AS est_cnt
            FROM probe p LEFT JOIN cells c ON c.r = p.r AND c.col = p.col
            GROUP BY 1),
    ex AS (SELECT user_id, count(*)::BIGINT AS exact_cnt
           FROM hist GROUP BY 1)
    SELECT est.user_id, est.est_cnt, ex.exact_cnt,
           est.est_cnt >= ex.exact_cnt AS overestimated,
           true AS paths_agree
    FROM est JOIN ex USING (user_id)
    ORDER BY est.est_cnt DESC, est.user_id ASC
    LIMIT 15
    """,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Incremental heavy hitters via MERGEABLE Count-Min Sketch
    states (operators/aggstate.py:build/merge_cms_states,
    estimate_cms) — the FREQUENCY member of the mergeable-state family
    next to the HLL (distinct), histogram (order-stats) and Bloom
    (membership) twins: two ingestion days build 64×4 portable-md5
    sketches INDEPENDENTLY and fold by cell-wise SUM — exact count
    additivity, so ``paths_agree`` pins fold == full-history-build
    IDENTICALLY (cell tables compared verbatim, a bounded ≤ 256-row
    driver probe). History's distinct users then rank by their
    ESTIMATED frequency from the folded sketch (zero-join codegen
    projection against the ≤ 512 KiB cell literal); the exact-count
    join exists ONLY for the audit columns — ``overestimated`` pins
    the one-sided guarantee (estimate ≥ truth, always; the width is
    deliberately far below the 150-key cardinality so collision mass
    is VISIBLE and the oracle must replay it cell-exactly). At 100 TB
    you keep the sketch: per-key frequencies over billions of keys in
    fixed state, no key-cardinality shuffle."""
    from .operators import aggstate as A

    # the sketch-state query pattern (see agg_bloom_incremental_users):
    # lazy checkpoints so each md5 build pass and the events scan run
    # once instead of once per downstream action/collect
    e = _t(spark, sf_dir, "events").select(
        "user_id", (F.dayofmonth("ts") % 3).alias("__d")
    ).where(F.col("user_id").isNotNull()).localCheckpoint(eager=False)
    kw = dict(width=64, depth=4, seed="cm0")
    s0 = A.build_cms_state(
        e.where(F.col("__d") == 0), "user_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_cms_state(
        e.where(F.col("__d") == 1), "user_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_cms_states([s0, s1]).localCheckpoint(eager=False)
    full = A.build_cms_state(
        e.where(F.col("__d").isin(0, 1)), "user_id", **kw
    ).localCheckpoint(eager=False)
    cells = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("row_idx", "col_idx", "cnt").collect())
    )
    agree = cells(merged) == cells(full)
    hist = e.where(F.col("__d").isin(0, 1))
    keys = hist.select("user_id").distinct()
    exact = hist.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    est = A.estimate_cms(keys, "user_id", merged, out_col="est_cnt")
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est_cnt",
            "exact_cnt",
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("overestimated"),
            F.lit(agree).alias("paths_agree"),
        )
        .orderBy(F.col("est_cnt").desc(), F.col("user_id").asc())
        .limit(15)
    )


@query(
    "agg_kmv_weighted_tokens",
    f"""
    WITH d AS (SELECT lang, doc_id, n_chars FROM documents
               WHERE doc_id IS NOT NULL),
    h AS (
      SELECT DISTINCT lang, doc_id, n_chars,
             {_hex2int_sql("substr(md5(CAST(doc_id AS VARCHAR) || ':wt0'), 1, 15)")}
               AS hv
      FROM d
    ),
    r AS (SELECT lang, doc_id, n_chars, hv, row_number() OVER (
            PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rn FROM h),
    agg AS (SELECT lang, count(*)::BIGINT AS n_kept, max(hv) AS hk,
                   sum(n_chars::DOUBLE) AS wsum
            FROM r WHERE rn <= 8 GROUP BY 1),
    est AS (SELECT lang, n_kept, wsum,
              CASE WHEN n_kept < 8 THEN n_kept::DOUBLE
                   ELSE round(7 / (hk::DOUBLE / 1152921504606846976.0), 0)
              END AS d_est
            FROM agg)
    SELECT lang, n_kept, d_est::BIGINT AS distinct_est,
           round(CASE WHEN n_kept < 8 THEN wsum
                      ELSE d_est * (wsum / n_kept) END, 2)
             AS weight_total_est
    FROM est
    """,
)
def agg_kmv_weighted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Dedup-aware volume accounting from the weighted bottom-k
    sample state (operators/aggstate.py:finalize_weighted_sample):
    per language, estimate the TOTAL CHARACTERS ACROSS DISTINCT
    DOCUMENTS — counting each doc once no matter how often it
    re-landed — from a fold of two ingest increments' ≤ 8-row states,
    never from the corpora. The estimator is distinct-count (the KMV
    (k−1)/U(k) on the carried hashes) × the bottom-k's mean weight
    (the bottom-k is a uniform sample of the distinct ids); EXACT when
    the group kept fewer than k ids. The carried weight (n_chars) is a
    pure function of the id, the documented contract. Deterministic
    portable-md5 arithmetic end to end, so the oracle replays every
    estimate exactly — and fold == full-build makes the two-increment
    Spark path equal the oracle's one-pass replay."""
    from .operators import aggstate as A

    # the sketch-state query pattern (see agg_bloom_incremental_users):
    # lazy checkpoints so the merge/finalize layout probes do not re-run
    # the md5 build passes
    d = _t(spark, sf_dir, "documents", fanout=True).select("lang", "doc_id", "n_chars")
    kw = dict(k=8, seed="wt0", carry=["n_chars"])
    s0 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 0), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 1), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_sample_states(
        [s0, s1], ["lang"], "doc_id", carry=["n_chars"]
    ).localCheckpoint(eager=False)
    return A.finalize_weighted_sample(merged, ["lang"], "doc_id", "n_chars")


@query(
    "agg_kmv_overlap_matrix",
    f"""
    WITH e AS (SELECT event_type, user_id FROM events
               WHERE user_id IS NOT NULL),
    h AS (
      SELECT DISTINCT event_type,
             {_hex2int_sql("substr(md5(CAST(user_id AS VARCHAR) || ':kv2'), 1, 15)")}
               AS hv
      FROM e
    ),
    s AS (SELECT event_type, hv FROM (
            SELECT event_type, hv, row_number() OVER (
              PARTITION BY event_type ORDER BY hv ASC) AS rn FROM h
          ) WHERE rn <= 32),
    cand AS (SELECT DISTINCT a.event_type AS g1, b.event_type AS g2
             FROM s a JOIN s b
               ON a.hv = b.hv AND a.event_type < b.event_type),
    u AS (SELECT g1, g2, hv, max(in_a) AS in_a, max(in_b) AS in_b FROM (
            SELECT c.g1, c.g2, s.hv, 1 AS in_a, 0 AS in_b
            FROM cand c JOIN s ON s.event_type = c.g1
            UNION ALL
            SELECT c.g1, c.g2, s.hv, 0 AS in_a, 1 AS in_b
            FROM cand c JOIN s ON s.event_type = c.g2
          ) GROUP BY 1, 2, 3),
    r AS (SELECT g1, g2, hv, in_a, in_b, row_number() OVER (
            PARTITION BY g1, g2 ORDER BY hv ASC) AS rn FROM u),
    agg AS (SELECT g1, g2,
              sum(CASE WHEN rn <= 32 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              max(CASE WHEN rn <= 32 THEN hv END) AS hk,
              sum(CASE WHEN rn <= 32 AND in_a + in_b = 2 THEN 1 ELSE 0 END)
                ::BIGINT AS nboth,
              sum(in_a)::BIGINT AS na,
              max(CASE WHEN in_a = 1 THEN hv END) AS hka,
              sum(in_b)::BIGINT AS nb,
              max(CASE WHEN in_b = 1 THEN hv END) AS hkb
            FROM r GROUP BY 1, 2),
    est AS (SELECT g1, g2, n_kept, nboth,
              CASE WHEN n_kept < 32 THEN n_kept::DOUBLE
                   ELSE round(31 / (hk::DOUBLE / 1152921504606846976.0), 0)
              END AS union_d,
              CASE WHEN na < 32 THEN na::DOUBLE
                   ELSE round(31 / (hka::DOUBLE / 1152921504606846976.0), 0)
              END AS a_d,
              CASE WHEN nb < 32 THEN nb::DOUBLE
                   ELSE round(31 / (hkb::DOUBLE / 1152921504606846976.0), 0)
              END AS b_d
            FROM agg)
    SELECT g1, g2, n_kept,
           union_d::BIGINT AS union_est,
           round((nboth::DOUBLE / n_kept) * union_d, 0)::BIGINT
             AS intersect_est,
           round(nboth::DOUBLE / n_kept, 6) AS jaccard_e6,
           round(least(round((nboth::DOUBLE / n_kept) * union_d, 0) / a_d,
                       1.0), 6) AS contain_g1_e6,
           round(least(round((nboth::DOUBLE / n_kept) * union_d, 0) / b_d,
                       1.0), 6) AS contain_g2_e6
    FROM est
    """,
)
def agg_kmv_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] All-pairs audience-overlap matrix in sketch space
    (operators/aggstate.py:kmv_overlap_pairs): for every pair of event
    types that SHARES at least one bottom-32 sketch hash, estimate how
    many distinct users the two segments share (union / intersection /
    Jaccard) — the segment-overlap audit computed from ≤ 32 longs per
    segment, never from the raw events, with candidate pairs coming
    from a hash equi-join (the MinHash-LSH collision trick applied to
    the sketch layer), so the output is sparse in genuinely-overlapping
    pairs rather than the G² matrix. Per-pair estimator =
    ``kmv_set_estimates`` verbatim (combined bottom-k = the union's
    sketch; both-sides membership fraction = Jaccard); deterministic
    portable-md5 arithmetic end to end, so the oracle replays every
    pair exactly — candidate rule included."""
    from .operators import aggstate as A

    e = _t(spark, sf_dir, "events").select("event_type", "user_id").where(
        F.col("user_id").isNotNull()
    )
    # the operator references the state THREE times (candidate
    # self-join + two side re-reads — its documented contract): pin the
    # inline-built state so the corpus distinct-shuffle runs once, the
    # same lazy-checkpoint trade the iterative graph queries make
    st = A.build_kmv_state(
        e, ["event_type"], "user_id", k=32, seed="kv2"
    ).localCheckpoint(eager=False)
    return A.kmv_overlap_pairs(st, "event_type")
