"""Operational queries (SURVEY.md §2.9-2.11): profiling, reconciliation, data quality, privacy, quantiles, multimodal, SCD, CDC, incremental.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import multimodal
from .queries_shared import (
    _BENFORD_EXP_CASE,
    _CDC_LATEST_SQL,
    _CDC_LOG_SQL,
    _EXPECT_SEGS,
    _RECON_ORACLE,
    _audio_gate_sql,
    _cdc_log,
    _hex2int_sql,
    _mm_audio_sql,
    _mm_decode_sql,
    _mm_resize_sql,
    _phash_sql,
    _profile_col_sql,
    _quantile_drift_sql,
    _recon_frames,
    _t,
    _weighted_price_sql,
    query,
)


@query("multimodal_decode", _mm_decode_sql())
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode pipeline (stub codec). The stub
    is sha256-derived, so the decode output is fully oracle-checked;
    features are emitted as scalar f0..f7 columns (the operator API keeps
    the array — arrays aren't sortable by the driver's canonicalizer)."""
    d = _t(spark, sf_dir, "documents")
    b = multimodal.attach_fake_binary(d, "text", "doc_id")
    feats = multimodal.decode_image_features(b)
    return feats.select(
        "doc_id",
        "n_bytes",
        "sha256",
        "width",
        "height",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)],
    )


@query(
    "multimodal_frames",
    """
    SELECT doc_id,
           CAST(f.frame_idx AS INTEGER) AS frame_idx,
           CAST(f.frame_idx * 1000 AS BIGINT) AS ts_ms
    FROM (
      SELECT doc_id,
             unnest(range(greatest(octet_length(encode(text)) // 1000, 1))) AS frame_idx
      FROM documents
    ) f
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (``multimodal.frame_sample_plan``):
    one row per sampled frame timestamp, exploded JVM-side — the
    payload-size-derived frame count stands in for real duration until
    a codec is present."""
    d = _t(spark, sf_dir, "documents")
    b = multimodal.attach_fake_binary(d, "text", "doc_id")
    return multimodal.frame_sample_plan(b, every_ms=1000)


@query("multimodal_resize", _mm_resize_sql())
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit image resize (``multimodal.resize_images``): Arrow-
    batched mapInPandas, never-upscale ``min(mw/w, mh/h, 1.0)`` fit —
    the dims arithmetic is real and oracle-checked end to end; pixel
    resampling is the documented deterministic stub (no codec here)."""
    d = _t(spark, sf_dir, "documents")
    b = multimodal.attach_fake_binary(d, "text", "doc_id")
    out = multimodal.resize_images(b, max_width=128, max_height=96)
    return out.select(
        "doc_id", "src_width", "src_height", "width", "height", "n_bytes", "sha256"
    )


@query("multimodal_audio", _mm_audio_sql())
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + waveform feature extraction
    (``multimodal.decode_audio_features``): same honest-stub contract as
    the image decode — Arrow plumbing, schema, and the duration/rate
    arithmetic are real and differential-tested; sample decoding awaits
    a codec."""
    d = _t(spark, sf_dir, "documents")
    b = multimodal.attach_fake_binary(d, "text", "doc_id", media_type="audio")
    return multimodal.decode_audio_features(b)


@query(
    "incremental_highwater",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 6) AS value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def incremental_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental mode (SURVEY.md §2.9): high-water-mark read of the
    events stream table — the stored mark bounds the scan and the
    predicate pushes into the parquet scan (min-max pruning; JDBC WHERE
    at the source in production)."""
    import tempfile

    from .streaming.incremental import HighWaterMark, incremental_read

    state = HighWaterMark(tempfile.mktemp(suffix=".json"))
    state.set("events.ts", "2024-01-25 00:00:00")
    df, _commit = incremental_read(
        lambda: _t(spark, sf_dir, "events"), "ts", state, "events.ts"
    )
    return df.select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 6).alias("value")
    )


@query(
    "profile_customer_table",
    " UNION ALL ".join(
        _profile_col_sql(c)
        for c in ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]
    ),
)
def profile_customer_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (operators/profile.py:profile_table): per-column
    null rate, exact cardinality, and bounds in ONE wide aggregate +
    stack unpivot — the oracle needs one scan per column, the engine one
    scan total. Exact-distinct mode here for the value gate; HLL mode is
    the default 100 TB path."""
    c = _t(spark, sf_dir, "customer")
    from .operators.profile import profile_table

    return profile_table(
        c,
        ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"],
        exact_distinct=True,
    )


@query(
    "scd2_customer_balances",
    """
    WITH upd AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_custkey % 10 = 0 THEN c.c_acctbal
                  ELSE round(sum(o.o_totalprice), 2) END AS c_acctbal
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    dim0 AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '2024-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    changed AS (
      SELECT d.c_custkey, u.c_acctbal AS new_bal
      FROM dim0 d JOIN upd u USING (c_custkey)
      WHERE d.c_acctbal IS DISTINCT FROM u.c_acctbal
    )
    SELECT d.c_custkey, d.c_acctbal, d.valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN TIMESTAMP '2024-06-01' ELSE NULL END AS valid_to
    FROM dim0 d LEFT JOIN changed ch USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_bal, TIMESTAMP '2024-06-01', NULL FROM changed
    """,
)
def scd2_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge (operators/scd.py): bootstrap the customer
    dimension at T0, then apply a derived balance-update batch (new
    balance = order-total sum; every 10th key deliberately unchanged) at
    T1. Output is the full versioned dimension — closed old versions,
    carried unchanged rows, new open versions — value-matched against a
    set-algebra oracle. One key join + union, no MERGE, no window."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    from .operators.scd import scd2_apply, scd2_initial

    dim0 = scd2_initial(
        c.select("c_custkey", "c_acctbal"), "c_custkey", ["c_acctbal"], "2024-01-01"
    )
    upd = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("__newbal"))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal"))
            .otherwise(F.col("__newbal"))
            .alias("c_acctbal"),
        )
    )
    return scd2_apply(dim0, upd, "c_custkey", ["c_acctbal"], "2024-06-01")


@query(
    "scd1_customer_balances",
    """
    WITH upd AS (
      SELECT c.c_custkey, round(sum(o.o_totalprice), 2) AS bal
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c.c_custkey, coalesce(u.bal, c.c_acctbal) AS c_acctbal
    FROM customer c LEFT JOIN upd u USING (c_custkey)
    """,
)
def scd1_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 1 (operators/scd.py:scd1_apply): overwrite-in-place —
    update rows replace, new keys insert, no history. The in-plan
    relational twin of the storage-level merge_upsert; completes the
    SCD family next to Type 2 chains and Type 3 prev-columns."""
    from .operators.scd import scd1_apply

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    upd = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("c_acctbal"))
    )
    return scd1_apply(c.select("c_custkey", "c_acctbal"), upd, "c_custkey", ["c_acctbal"])


@query(
    "scd3_customer_segments",
    """
    WITH upd AS (
      SELECT c_custkey, 'RETIRED' AS seg FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c.c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL
                 AND c.c_mktsegment IS DISTINCT FROM u.seg
                THEN u.seg ELSE c.c_mktsegment END AS segment,
           CASE WHEN u.c_custkey IS NOT NULL
                 AND c.c_mktsegment IS DISTINCT FROM u.seg
                THEN c.c_mktsegment END AS prev_segment
    FROM customer c LEFT JOIN upd u USING (c_custkey)
    """,
)
def scd3_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 (operators/scd.py:scd3_apply): one previous value per
    tracked attribute IN COLUMNS — changed updates shift current→prev;
    one wide row per key forever, so downstream joins never fan out.
    Bootstrap + one update batch, value-matched against the set-algebra
    oracle."""
    from .operators.scd import scd3_apply, scd3_initial

    c = _t(spark, sf_dir, "customer")
    dim0 = scd3_initial(
        c.select("c_custkey", F.col("c_mktsegment").alias("segment")),
        "c_custkey",
        ["segment"],
    )
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("RETIRED").alias("segment")
    )
    return scd3_apply(dim0, upd, "c_custkey", ["segment"])


@query(
    "quantile_normalize_prices",
    """
    WITH s AS (
      SELECT o_orderpriority, avg(o_totalprice) AS m,
             stddev_pop(o_totalprice) AS sd
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round(CASE WHEN sd > 0 THEN (o_totalprice - m) / sd
                      ELSE 0.0 END, 6) AS o_totalprice_norm
    FROM orders JOIN s USING (o_orderpriority)
    """,
)
def quantile_normalize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group z-score normalization
    (operators/quantiles.py:normalize_columns): one stats aggregate
    (rows = #groups) broadcast back, the data never shuffles — the
    feature-prep sibling of winsorize."""
    from .operators.quantiles import normalize_columns

    o = _t(spark, sf_dir, "orders")
    return normalize_columns(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        ["o_totalprice"],
        method="zscore",
    )


@query(
    "profile_histogram_prices",
    """
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
               FROM orders),
    h AS (
      SELECT least(greatest(
               (floor((o_totalprice - b.lo) / ((b.hi - b.lo) / 12.0))::INT + 1),
               1), 12) AS bkt,
             count(*) AS n
      FROM orders, b GROUP BY 1
    )
    SELECT (h.bkt - 1)::INT AS bin,
           round(b.lo + (h.bkt - 1) * ((b.hi - b.lo) / 12.0), 6) AS lo,
           round(b.lo + h.bkt * ((b.hi - b.lo) / 12.0), 6) AS hi,
           n
    FROM h, b
    """,
)
def profile_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Equi-width histogram profiling
    (operators/profile.py:profile_histogram): 12 width_bucket bins over
    order totals, edge values folded inward so counts sum to the rows —
    the shape view next to profile_table's scalars and the
    equi-frequency quantile bins. The oracle replays Spark's
    width_bucket arithmetic ((v−lo)/((hi−lo)/n), truncate, +1)."""
    from .operators.profile import profile_histogram

    o = _t(spark, sf_dir, "orders")
    return profile_histogram(o, "o_totalprice", n_bins=12)


@query(
    "reconcile_distribution_drift",
    """
    WITH b AS (
      SELECT list_transform(
               quantile_cont(o_totalprice,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
               x -> round(x, 4)) AS qb
      FROM orders
    ),
    o AS (SELECT len(list_filter(b.qb, x -> o_totalprice > x)) AS bin,
                 count(*) AS n_old
          FROM orders, b GROUP BY 1),
    nn AS (SELECT len(list_filter(b.qb, x -> o_totalprice > x)) AS bin,
                  count(*) AS n_new
           FROM orders, b
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1),
    j AS (SELECT coalesce(o.bin, nn.bin) AS bin,
                 coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
          FROM o FULL JOIN nn ON o.bin = nn.bin),
    t AS (SELECT sum(n_old) AS t_o, sum(n_new) AS t_n FROM j)
    SELECT bin::INT AS bin, n_old, n_new,
           round(n_old / t_o, 6) AS frac_old,
           round(n_new / t_n, 6) AS frac_new,
           round((n_new / t_n - n_old / t_o)
                 * ln((n_new / t_n + 1e-6) / (n_old / t_o + 1e-6)), 6)
             AS psi_term
    FROM j, t
    """,
)
def reconcile_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Population-stability (PSI) drift report
    (operators/reconcile.py:distribution_drift): old = all orders, new
    = urgent/high-priority orders only — a deliberately shifted
    population. Old-side equal-frequency decile bins, both sides
    bucketed by boundary count, per-bin psi_term; Σ psi_term is the
    standard drift score. The statistical complement to the exact
    snapshot_diff."""
    from .operators.reconcile import distribution_drift

    o = _t(spark, sf_dir, "orders")
    return distribution_drift(
        o,
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        "o_totalprice",
        n_bins=10,
        exact=True,
    )


@query(
    "dq_expectations_customer",
    f"""
    WITH a AS (
      SELECT count(*) AS n,
             sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS e_nn,
             sum(CASE WHEN c_mktsegment IS NOT NULL
                       AND c_mktsegment NOT IN ({_EXPECT_SEGS})
                      THEN 1 ELSE 0 END) AS e_av,
             sum(CASE WHEN c_acctbal < -1000.0 OR c_acctbal > 10000.0
                      THEN 1 ELSE 0 END) AS e_b
      FROM customer
    ),
    d AS (
      SELECT count(*) AS dups FROM (
        SELECT 1 FROM customer GROUP BY c_custkey HAVING count(*) > 1 LIMIT 1
      )
    )
    SELECT 'row_count:*' AS check, '' AS column, n::DOUBLE AS observed,
           '[100,None]' AS threshold, n >= 100 AS passed FROM a
    UNION ALL
    SELECT 'not_null:c_name', 'c_name', round(e_nn::DOUBLE / n, 6),
           'null_frac<=0.0', e_nn = 0 FROM a
    UNION ALL
    SELECT 'unique:c_custkey', 'c_custkey', dups::DOUBLE,
           'no duplicate keys', dups = 0 FROM d
    UNION ALL
    SELECT 'accepted_values:c_mktsegment', 'c_mktsegment', e_av::DOUBLE,
           'no values outside set', e_av = 0 FROM a
    UNION ALL
    SELECT 'bounds:c_acctbal', 'c_acctbal', e_b::DOUBLE,
           '[-1000.0,10000.0]', e_b = 0 FROM a
    """,
)
def dq_expectations_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Table-level data-quality expectations
    (operators/expectations.py): dbt-test-shaped contract checks — row
    count, null fraction, key uniqueness (early-exit dup probe),
    accepted values, numeric bounds — evaluated in ONE wide aggregate
    scan; the report frame is the publish gate's evidence. The oracle
    recomputes every observed count."""
    from .operators.expectations import Expect, run_expectations

    c = _t(spark, sf_dir, "customer")
    return run_expectations(
        c,
        [
            Expect(type="row_count", min=100),
            Expect(type="not_null", columns=("c_name",)),
            Expect(type="unique", columns=("c_custkey",)),
            Expect(
                type="accepted_values",
                columns=("c_mktsegment",),
                values=(
                    "AUTOMOBILE", "BUILDING", "FURNITURE",
                    "HOUSEHOLD", "MACHINERY",
                ),
            ),
            Expect(type="bounds", columns=("c_acctbal",), min=-1000.0, max=10000.0),
        ],
    )


@query(
    "udtf_split_sentences",
    """
    WITH s AS (
      SELECT doc_id,
             list_filter(
               list_transform(string_split_regex(text, '\\bthe\\b'),
                 x -> regexp_replace(x, '^[ \t\n\r]+|[ \t\n\r]+$', '', 'g')),
               x -> x <> '') AS parts
      FROM documents WHERE text IS NOT NULL
    ),
    e AS (
      SELECT doc_id,
             unnest(list_transform(parts, (x, i) -> {'i': i, 's': x})) AS u
      FROM s
    )
    SELECT doc_id, u.i::INT AS sent_idx, u.s AS sentence FROM e
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Spark 4 Python UDTF (functions/udtfs.py): regex text
    segmentation as a LATERAL table function — one doc row expands to a
    variable number of typed rows inside the executor, Arrow-batched.
    The fixture corpus has no sentence punctuation, so the query splits
    on the word 'the' (a frequent token) to exercise real multi-row
    fan-out; the oracle replays split/trim/filter with 1-based indexing
    via DuckDB's indexed list lambda, pinning the UDTF's row contract
    exactly."""
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = _t(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        r"SELECT d.doc_id, s.sent_idx, s.sentence "
        r"FROM __udtf_docs d, LATERAL split_sentences(d.text, '\\bthe\\b') s"
    )


@query(
    "quantile_winsorize_prices",
    """
    WITH b AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
             round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice,
           least(greatest(l.l_extendedprice, b.lo), b.hi) AS price_wins
    FROM lineitem l JOIN b USING (l_returnflag)
    """,
)
def quantile_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group winsorization (operators/quantiles.py:winsorize):
    clamp prices to each return-flag group's [p5, p95] — the standard
    heavy-tail robustness transform before training. One bounds
    aggregate (rows = #groups) broadcast back; the data shuffles once
    at most. exact=True here for the differential gate; the approx
    sketch is the bounded-memory 100 TB path."""
    from .operators.quantiles import winsorize

    li = _t(spark, sf_dir, "lineitem")
    return winsorize(
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
        lo=0.05,
        hi=0.95,
        exact=True,
        out_col="price_wins",
    )


@query(
    "quantile_freq_bins",
    """
    WITH b AS (
      SELECT o_orderpriority,
             list_transform(
               quantile_cont(o_totalprice,
                             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]),
               x -> round(x, 4)) AS qb
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           len(list_filter(b.qb, x -> o.o_totalprice > x))::INT AS bin
    FROM orders o JOIN b USING (o_orderpriority)
    """,
)
def quantile_freq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group equal-frequency binning
    (operators/quantiles.py:frequency_bins): bin = count of interior
    quantile boundaries below the value — deterministic under any
    partitioning (unlike ntile, which needs a full sort and splits ties
    arbitrarily), a pure projection against broadcast bounds. Rounded
    boundaries make both engines bucket identically."""
    from .operators.quantiles import frequency_bins

    o = _t(spark, sf_dir, "orders")
    return frequency_bins(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        ["o_orderpriority"],
        "o_totalprice",
        n_bins=8,
        exact=True,
    )


@query(
    "cdc_apply_events",
    f"""
    WITH log AS ({_CDC_LOG_SQL}),
    {_CDC_LATEST_SQL}
    SELECT user_id, ts, event_id, value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CDC changelog application (operators/cdc.py): materialize
    current per-key state from an insert/update/delete event log — the
    latest event per key via ONE ``max_by`` hash aggregate (map-side
    partial max; no window sort over the log), keys whose latest op is
    a delete dropped. The relational replacement for the reference's
    only load mode, full truncate-and-replace
    (``default_loader.py:38-45``), when the source ships a redo log."""
    from .operators.cdc import cdc_apply

    log = _cdc_log(spark, sf_dir)
    return cdc_apply(log, ["user_id"], "ts", "op", seq_col="event_id")


@query(
    "cdc_snapshot_events",
    f"""
    WITH log AS ({_CDC_LOG_SQL} WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
    {_CDC_LATEST_SQL}
    SELECT user_id, ts, event_id, value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_snapshot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CDC time travel (operators/cdc.py:cdc_snapshot_at): state
    as of T from the log alone — the bound filters BEFORE the aggregate
    so a date-partitioned log prunes to the prefix."""
    from .operators.cdc import cdc_snapshot_at

    log = _cdc_log(spark, sf_dir)
    return cdc_snapshot_at(
        log, "2024-01-15 00:00:00", ["user_id"], "ts", "op", seq_col="event_id"
    )


@query(
    "reconcile_snapshot_diff",
    _RECON_ORACLE + "SELECT o_orderkey, diff_status FROM d",
)
def reconcile_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration validation (operators/reconcile.py:snapshot_diff): a
    full-outer key join classifying every row of two snapshots as
    added/removed/changed/same with null-safe column comparison — the
    'did the load reproduce the table?' check the reference's row-count
    logging cannot answer. One co-partitioned shuffle per side."""
    from .operators.reconcile import snapshot_diff

    o, n = _recon_frames(spark, sf_dir)
    return snapshot_diff(o, n, ["o_orderkey"])


@query(
    "reconcile_diff_summary",
    _RECON_ORACLE
    + "SELECT diff_status, count(*) AS n FROM d GROUP BY 1",
)
def reconcile_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-row sign-off report over the same diff
    (operators/reconcile.py:diff_summary)."""
    from .operators.reconcile import diff_summary, snapshot_diff

    o, n = _recon_frames(spark, sf_dir)
    return diff_summary(snapshot_diff(o, n, ["o_orderkey"]))


@query(
    "quantile_mad_outliers",
    """
    WITH med AS (
      SELECT l_returnflag, median(l_extendedprice) AS med
      FROM lineitem GROUP BY 1
    ),
    dev AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS adev, m.med
      FROM lineitem l JOIN med m USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, median(adev) AS mad, min(med) AS med
      FROM dev GROUP BY 1
    )
    SELECT d.l_returnflag,
           round(m.med, 3) AS med_price,
           round(m.mad, 3) AS mad_price,
           count(*) AS n,
           sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)::BIGINT
             AS n_outliers
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY 1, 2, 3
    """,
)
def quantile_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Robust outlier profiling: per-group median / MAD
    (median-absolute-deviation) and the count of |x − med| > 3σ-equiv
    (1.4826·MAD) rows — the robust alternative to the mean/stddev
    profile that a long-tailed price column needs. Shape: two exact
    per-group percentile aggregates (3-row results, broadcast back) +
    one counting pass; the medians are exact interpolated percentiles
    in BOTH engines so the comparison thresholds are bit-identical."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5D)").alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
        "med",
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad"), F.min("med").alias("med")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "l_returnflag")
        .groupBy(
            "l_returnflag",
            F.round("med", 3).alias("med_price"),
            F.round("mad", 3).alias("mad_price"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "privacy_k_anonymity",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             (c_acctbal >= 0) AS has_balance,
             count(*) AS group_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment, c_nationkey, has_balance, group_size
    FROM g WHERE group_size < 5
    ORDER BY group_size ASC, c_mktsegment ASC, c_nationkey ASC, has_balance ASC
    LIMIT 100
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] k-anonymity audit (operators/privacy.py): quasi-identifier
    groups of (segment, nation, balance-sign) smaller than k=5 — the
    combination-leak check a pseudonymized migration still needs. One
    map-side-combined groupBy + a bounded ordered report."""
    from .operators.privacy import k_anonymity_report

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        (F.col("c_acctbal") >= 0).alias("has_balance"),
    )
    return k_anonymity_report(
        c, ["c_mktsegment", "c_nationkey", "has_balance"], k=5, top_n=100
    )


@query(
    "privacy_k_anonymity_stats",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, (c_acctbal >= 0) AS hb, count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT count(*) AS n_groups,
           coalesce(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END), 0)::BIGINT
             AS groups_below_k,
           coalesce(sum(CASE WHEN n < 5 THEN n ELSE 0 END), 0)::BIGINT
             AS rows_at_risk,
           min(n) AS min_group_size
    FROM g
    """,
)
def privacy_k_anonymity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The one-row publish-gate summary over the same
    quasi-identifiers (operators/privacy.py:k_anonymity_stats)."""
    from .operators.privacy import k_anonymity_stats

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        (F.col("c_acctbal") >= 0).alias("has_balance"),
    )
    return k_anonymity_stats(
        c, ["c_mktsegment", "c_nationkey", "has_balance"], k=5
    )


@query(
    "reconcile_table_checksum",
    """
    WITH h AS (
      SELECT """
    + _hex2int_sql(
        # the _row_hash injective serialization: 'N' for NULL,
        # 'V<len>:<value>' otherwise, parts concatenated directly
        "md5("
        + " || ".join(
            f"CASE WHEN {c} IS NULL THEN 'N' ELSE 'V' || "
            f"length({c}::VARCHAR) || ':' || {c}::VARCHAR END"
            for c in ("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        )
        + ")"
    )
    + """ AS hv
      FROM customer
    )
    SELECT hv % 16 AS bucket,
           count(*)::BIGINT AS n_rows,
           bit_xor(hv)::BIGINT AS xor_checksum,
           sum(hv % 1000003)::BIGINT AS sum_checksum,
           'md5x60/lenprefix-v2' AS layout
    FROM h GROUP BY bucket
    """,
)
def reconcile_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Bucketed table checksum
    (operators/reconcile.py:table_checksum): portable per-row md5 over
    the int/string columns, 16 hash buckets each reporting count +
    xor-checksum + modular-sum checksum — the O(1)-output 'did the
    load produce the same table' sign-off (divergent bucket narrows
    the re-scan 16x). Only exactly-stringifiable columns participate
    (float-to-string formatting differs across engines — documented
    constraint). Each report row carries the serialization-scheme
    ``layout`` marker so persisted baselines from an older scheme fail
    loudly. The oracle replays the hash and both channels."""
    from .operators.reconcile import table_checksum

    c = _t(spark, sf_dir, "customer")
    return table_checksum(
        c, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"], n_buckets=16
    )


@query(
    "reconcile_checksum_drilldown",
    """
    WITH l AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    r AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 500 = 7 THEN o_totalprice + 1
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 997 <> 3),
    lg AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                  count(*)::BIGINT AS n_left FROM l GROUP BY ALL),
    rg AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                  count(*)::BIGINT AS n_right FROM r GROUP BY ALL)
    SELECT coalesce(lg.o_orderkey, rg.o_orderkey) AS o_orderkey,
           coalesce(lg.o_orderstatus, rg.o_orderstatus) AS o_orderstatus,
           coalesce(lg.o_totalprice, rg.o_totalprice) AS o_totalprice,
           coalesce(n_left, 0)::BIGINT AS n_left,
           coalesce(n_right, 0)::BIGINT AS n_right
    FROM lg FULL OUTER JOIN rg
      ON lg.o_orderkey IS NOT DISTINCT FROM rg.o_orderkey
     AND lg.o_orderstatus IS NOT DISTINCT FROM rg.o_orderstatus
     AND lg.o_totalprice IS NOT DISTINCT FROM rg.o_totalprice
    WHERE coalesce(n_left, 0) <> coalesce(n_right, 0)
    """,
)
def reconcile_checksum_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Two-phase checksum drill-down diff
    (operators/reconcile.py:checksum_drilldown): the bucketed-checksum
    ladder DRIVEN to rows — phase 1 compares the two sides' 64-bucket
    (count, xor, sum) reports (one cheap aggregate per side, a bounded
    driver probe), phase 2 value-diffs ONLY the mismatched buckets, so
    a migration that corrupted a few rows re-scans ~1/64 of each table
    instead of paying the full-table join. Here the 'loaded' side
    injects both corruption classes (a price bump every 500th key, a
    dropped row every 997th) and the output is every differing row
    value with per-side multiset counts. The oracle computes the FULL
    direct diff with no bucket pruning — equality proves the ladder's
    completeness claim (no bucket can hide a diff) on real data, not
    just in theory."""
    from .operators.reconcile import checksum_drilldown

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    left = _t(spark, sf_dir, "orders").select(*cols)
    right = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 997 != 3)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 500 == 7, F.col("o_totalprice") + 1
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return checksum_drilldown(left, right, cols, n_buckets=64)


@query(
    "dq_referential_integrity",
    """
    WITH fk AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk_name,
             l_orderkey AS k FROM lineitem
      UNION ALL
      SELECT 'orders.o_custkey->customer', o_custkey FROM orders
      UNION ALL
      SELECT 'orders.o_custkey->customer_first_700', o_custkey FROM orders
    ),
    pk AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk_name,
             o_orderkey AS k FROM orders
      UNION ALL
      SELECT 'orders.o_custkey->customer', c_custkey FROM customer
      UNION ALL
      SELECT 'orders.o_custkey->customer_first_700', c_custkey
      FROM customer WHERE c_custkey <= 700
    )
    SELECT f.fk_name,
           count(*)::BIGINT AS n_child_rows,
           coalesce(sum(CASE WHEN f.k IS NULL THEN 1 ELSE 0 END), 0)::BIGINT
             AS n_null_fk,
           coalesce(sum(CASE WHEN f.k IS NOT NULL AND p.k IS NULL
                             THEN 1 ELSE 0 END), 0)::BIGINT AS n_orphans,
           round(coalesce(sum(CASE WHEN f.k IS NOT NULL AND p.k IS NULL
                                   THEN 1 ELSE 0 END), 0)
                 / greatest(count(*) - coalesce(sum(CASE WHEN f.k IS NULL
                                                         THEN 1 ELSE 0 END), 0),
                            1)::DOUBLE, 6) AS orphan_frac
    FROM fk f
    LEFT JOIN (SELECT DISTINCT fk_name, k FROM pk) p
      ON p.fk_name = f.fk_name AND p.k = f.k
    GROUP BY f.fk_name
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Post-load foreign-key audit
    (operators/reconcile.py:referential_integrity): orphan counts per
    declared FK after a load — the check that catches the partial-
    reload orphans the reference's TRUNCATE..CASCADE can silently
    create. Includes a deliberately-violated FK (parent restricted to
    the first 700 customers) so a nonzero orphan path is exercised;
    NULL FKs are reported, not counted as violations."""
    from .operators.reconcile import referential_integrity

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return referential_integrity(
        [
            ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
            (
                "orders.o_custkey->customer_first_700",
                o,
                "o_custkey",
                c.filter(F.col("c_custkey") <= 700),
                "c_custkey",
            ),
        ]
    )


@query(
    "profile_benford_prices",
    f"""
    WITH base AS (
      SELECT CAST(substr(CAST(CAST(round(abs(o_totalprice) * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL
        AND round(abs(o_totalprice) * 100) > 0
    ),
    counts AS (SELECT digit, count(*)::BIGINT AS n_values FROM base GROUP BY 1),
    tot AS (SELECT sum(n_values)::BIGINT AS t FROM counts)
    SELECT digit, n_values,
           round(n_values::DOUBLE / t, 6) AS observed_share,
           {_BENFORD_EXP_CASE} AS expected_share,
           round(t * pow(round(n_values::DOUBLE / t, 6)
                         - {_BENFORD_EXP_CASE}, 2)
                 / {_BENFORD_EXP_CASE}, 6) AS chi_term
    FROM counts, tot
    """,
)
def profile_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Benford's-law conformance of order totals
    (operators/profile.py:benford_report): leading-significant-digit
    shares vs log10(1+1/d) with per-digit χ² terms — the forensic
    fabricated-amounts screen (TPC-H prices are bounded-uniform, NOT
    Benford, so the report shows exactly how a synthetic column fails
    the test). Digits read from exact integer cents, never
    double→string (engines disagree there); expected shares are shared
    rounded literals; one 9-group map-side-combined count is the only
    exchange."""
    o = _t(spark, sf_dir, "orders")
    from .operators.profile import benford_report

    return benford_report(o, "o_totalprice", scale_decimals=2)


@query(
    "dq_benford_gate",
    f"""
    WITH base AS (
      SELECT CAST(substr(CAST(CAST(round(abs(o_totalprice) * 1000000)
                                   AS BIGINT) AS VARCHAR), 1, 1) AS INT)
             AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL
        AND round(abs(o_totalprice) * 1000000) > 0
    ),
    counts0 AS (SELECT digit, count(*)::BIGINT AS n FROM base GROUP BY 1),
    dig AS (SELECT unnest(range(1, 10))::INT AS digit),
    counts AS (
      SELECT d.digit, coalesce(c.n, 0)::BIGINT AS n_values
      FROM dig d LEFT JOIN counts0 c USING (digit)
    ),
    tot AS (SELECT sum(n_values)::BIGINT AS t FROM counts),
    chi AS (
      SELECT round(sum(t * pow(round(n_values::DOUBLE / t, 6)
                               - {_BENFORD_EXP_CASE}, 2)
                       / {_BENFORD_EXP_CASE}), 6) AS c
      FROM counts, tot
    )
    SELECT 'benford:o_totalprice' AS "check", 'o_totalprice' AS "column",
           c AS observed, 'chi2<=25.0' AS threshold,
           c <= 25.0 AS passed
    FROM chi
    """,
)
def dq_benford_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Benford conformance as a DATA-QUALITY EXPECTATION
    (operators/expectations.py, type=benford): the forensic screen
    wired into the pre-write gate — one wide-aggregate pass produces
    the chi-square statistic vs the chi2<=25 bar (p≈0.01 over 8 df
    plus slack). TPC-H prices are bounded-uniform, decidedly NOT
    Benford, so the gate deterministically reports FAILED — exactly
    what a fabricated-amounts screen should say about synthetic money.
    The oracle replays the exact-integer digit extraction, the
    zero-count digit fill, and the rounded-shares chi arithmetic."""
    o = _t(spark, sf_dir, "orders")
    from .operators.expectations import Expect, run_expectations

    return run_expectations(
        o, [Expect(type="benford", columns=("o_totalprice",), max=25.0)]
    )


@query(
    "profile_join_skew",
    """
    WITH c AS (
      SELECT o_custkey::VARCHAR AS k, count(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    s AS (SELECT sum(n)::BIGINT AS total, count(*) AS nkeys FROM c)
    SELECT c.k AS key, c.n::BIGINT AS n_rows,
           round(c.n / s.total::DOUBLE, 6) AS share,
           round((c.n::DOUBLE * s.nkeys) / s.total, 6) AS skew_x
    FROM c, s
    ORDER BY n_rows DESC, key ASC NULLS LAST
    LIMIT 10
    """,
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Join-key skew diagnosis
    (operators/profile.py:profile_join_skew): the 10 heaviest
    o_custkey values with row share and skew factor — the report run
    before choosing salted-join/AQE-skew handling. One distinct-key
    aggregate + broadcast stats + top-n."""
    from .operators.profile import profile_join_skew as _pjs

    o = _t(spark, sf_dir, "orders")
    return _pjs(o, "o_custkey", top_n=10)


@query(
    "scd2_pit_order_balances",
    """
    WITH upd AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_custkey % 10 = 0 THEN c.c_acctbal
                  ELSE round(sum(o.o_totalprice), 2) END AS bal
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    dim0 AS (
      SELECT c_custkey, c_acctbal AS bal,
             TIMESTAMP '1995-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    changed AS (
      SELECT d.c_custkey, u.bal AS new_bal
      FROM dim0 d JOIN upd u USING (c_custkey)
      WHERE d.bal IS DISTINCT FROM u.bal
    ),
    dim AS (
      SELECT d.c_custkey, d.bal, d.valid_from,
             CASE WHEN ch.c_custkey IS NOT NULL
                  THEN TIMESTAMP '1998-01-01' ELSE NULL END AS valid_to
      FROM dim0 d LEFT JOIN changed ch USING (c_custkey)
      UNION ALL
      SELECT c_custkey, new_bal, TIMESTAMP '1998-01-01', NULL FROM changed
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, d.bal
    FROM orders o LEFT JOIN dim d
      ON d.c_custkey = o.o_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR d.valid_to > o.o_orderdate)
    """,
)
def scd2_pit_order_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup (operators/scd.py:scd2_pit_join): the
    customer-balance dimension versioned at 1995-01-01 (bootstrap) and
    1998-01-01 (derived update batch), then EVERY order joined to the
    version valid at its own o_orderdate — pre-1998 orders see the
    original balance, later orders the updated one, per-fact. Key-equi
    join with the interval residual; validity intervals are disjoint
    per key so no fact duplicates. Oracle replays the scd2_apply set
    algebra and the same interval join."""
    from .operators.scd import scd2_apply, scd2_initial, scd2_pit_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    dim0 = scd2_initial(
        c.select("c_custkey", F.col("c_acctbal").alias("bal")),
        "c_custkey", ["bal"], "1995-01-01",
    )
    upd = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("__newbal"))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal"))
            .otherwise(F.col("__newbal"))
            .alias("bal"),
        )
    )
    dim = scd2_apply(dim0, upd, "c_custkey", ["bal"], "1998-01-01")
    return scd2_pit_join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        dim, "c_custkey", "o_custkey", "o_orderdate",
    )


@query("multimodal_phash_pairs", _phash_sql())
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Image near-dup pairs by perceptual hash
    (operators/multimodal.py:phash_near_dups): binary ingest → Arrow
    decode (stub codec, sha-derived features) → JVM-side bit pack →
    chunk-banded self-join → hamming verify. The media dedup every
    multimodal corpus needs; payloads never shuffle — only (id, phash)
    pairs do. Oracle replays the feature threshold bit-exactly."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    b = multimodal.attach_fake_binary(d, "text", "doc_id")
    feats = multimodal.decode_image_features(b)
    return multimodal.phash_near_dups(feats)


@query(
    "privacy_l_diversity",
    """
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             count(*)::BIGINT AS group_size,
             count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos'
                                 ELSE 'neg' END)::BIGINT AS n_sensitive
      FROM customer
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_nationkey, group_size, n_sensitive
    FROM g WHERE n_sensitive < 2
    ORDER BY n_sensitive ASC, group_size DESC, c_mktsegment ASC, c_nationkey ASC
    LIMIT 100
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distinct-l-diversity audit
    (operators/privacy.py:l_diversity_report): (segment, nation) groups
    whose balance-sign attribute is HOMOGENEOUS — large k-anonymous
    groups can still disclose the sensitive value to anyone who knows
    membership. One aggregate + bounded ordered report."""
    from .operators.privacy import l_diversity_report

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.when(F.col("c_acctbal") >= 0, "pos").otherwise("neg").alias("bal_sign"),
    )
    return l_diversity_report(
        c, ["c_mktsegment", "c_nationkey"], "bal_sign", l=2
    )


@query(
    "profile_layout_advisor",
    """
    WITH t AS (SELECT count(*)::DOUBLE AS total FROM orders),
    c1 AS (
      SELECT 'o_orderstatus' AS col, count(DISTINCT o_orderstatus)::BIGINT AS nd,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::DOUBLE AS nn,
             (SELECT max(n) FROM (SELECT count(*)::DOUBLE AS n FROM orders
                                  WHERE o_orderstatus IS NOT NULL
                                  GROUP BY o_orderstatus)) AS topn
      FROM orders
    ),
    c2 AS (
      SELECT 'o_custkey', count(DISTINCT o_custkey)::BIGINT,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::DOUBLE,
             (SELECT max(n) FROM (SELECT count(*)::DOUBLE AS n FROM orders
                                  WHERE o_custkey IS NOT NULL GROUP BY o_custkey))
      FROM orders
    ),
    c3 AS (
      SELECT 'o_orderpriority', count(DISTINCT o_orderpriority)::BIGINT,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::DOUBLE,
             (SELECT max(n) FROM (SELECT count(*)::DOUBLE AS n FROM orders
                                  WHERE o_orderpriority IS NOT NULL
                                  GROUP BY o_orderpriority))
      FROM orders
    ),
    u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
    SELECT col AS "column", nd AS n_distinct,
           round(nn / total, 6) AS null_frac,
           round(topn / total, 6) AS top_value_share,
           CASE WHEN nd > 10 * 20 THEN 'too_many_values'
                WHEN nd < 2 THEN 'too_few_values'
                WHEN topn / total > 0.5 THEN 'skewed'
                WHEN nn > 0 THEN 'ok_with_nulls'
                ELSE 'ok' END AS verdict
    FROM u, t
    """,
)
def profile_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Partition-layout advisor
    (operators/profile.py:layout_advisor): status (too few values),
    custkey (too many for 20 target partitions), priority (ok) — the
    pre-rewrite readout that decides partition_by. Oracle replays the
    exact stats and the verdict ladder at target_partitions=20."""
    from .operators.profile import layout_advisor

    o = _t(spark, sf_dir, "orders")
    return layout_advisor(
        o, ["o_orderstatus", "o_custkey", "o_orderpriority"],
        target_partitions=20,
    )


@query(
    "profile_correlations",
    """
    SELECT * FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_discount',
             round(corr(l_quantity, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_tax',
             round(corr(l_quantity, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount',
             round(corr(l_extendedprice, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_tax',
             round(corr(l_extendedprice, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'l_discount', 'l_tax',
             round(corr(l_discount, l_tax), 6) FROM lineitem
    )
    """,
)
def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Pairwise correlation survey
    (operators/profile.py:correlation_matrix): the 6 Pearson
    coefficients over lineitem's numeric shortlist from ONE aggregate
    pass — which pairs are worth a regression fit. Oracle computes the
    same upper triangle."""
    from .operators.profile import correlation_matrix

    l = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        l, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@query(
    "reconcile_ks_drift",
    """
    WITH pooled AS (
      SELECT o_totalprice AS v, 0 AS s FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
      UNION ALL
      SELECT o_totalprice, 1 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    ),
    n AS (
      SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::DOUBLE AS na,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::DOUBLE AS nb
      FROM pooled
    ),
    g AS (
      SELECT abs(
               sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)
                 OVER (ORDER BY v RANGE UNBOUNDED PRECEDING) / n.na
               - sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                 OVER (ORDER BY v RANGE UNBOUNDED PRECEDING) / n.nb
             ) AS gap, n.na, n.nb
      FROM pooled, n
    )
    SELECT round(max(gap), 6) AS ks_stat,
           CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b
    FROM g
    """,
)
def reconcile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Two-sample KS drift test
    (operators/reconcile.py:ks_statistic): pre-1998 vs 1998+ order
    totals — the binning-free companion to the PSI report. One
    value-ordered window over the pooled pairs with RANGE frames so
    ties never fake a gap; oracle replays the same frames."""
    from .operators.reconcile import ks_statistic

    o = _t(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return ks_statistic(early, late, "o_totalprice")


@query(
    "reconcile_mannwhitney",
    """
    WITH pooled AS (
      SELECT o_totalprice AS v, 0 AS s FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
      UNION ALL
      SELECT o_totalprice, 1 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    ),
    ranked AS (
      SELECT s,
             rank() OVER (ORDER BY v)
               + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS r
      FROM pooled
    ),
    st AS (
      SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::DOUBLE AS na,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::DOUBLE AS nb,
             sum(CASE WHEN s = 1 THEN r ELSE 0 END) AS rb
      FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(rb - nb * (nb + 1) / 2.0, 6) AS u_stat,
           round((rb - nb * (nb + 1) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb * (na + nb + 1) / 12.0), 6) AS z
    FROM st
    """,
)
def reconcile_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Mann-Whitney U rank-sum test
    (operators/reconcile.py:mannwhitney_u): pre-1998 vs 1998+ order
    totals — "does one era tend larger", the median-shift companion to
    the KS gap. Mid-ranks via rank() + (ties-1)/2 agree exactly across
    engines; oracle replays ranks and the normal approximation."""
    from .operators.reconcile import mannwhitney_u

    o = _t(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    late = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    return mannwhitney_u(early, late, "o_totalprice")


@query(
    "profile_chi_square",
    """
    WITH obs AS (
      SELECT c_mktsegment AS a, c_nationkey AS b, count(*)::DOUBLE AS o
      FROM customer
      WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
      GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS rt FROM obs GROUP BY a),
    rb AS (SELECT b, sum(o) AS ct FROM obs GROUP BY b),
    tot AS (SELECT sum(o) AS n, count(DISTINCT a)::BIGINT AS r,
                   count(DISTINCT b)::BIGINT AS c FROM obs),
    cells AS (
      SELECT ra.a, rb.b, ra.rt, rb.ct, coalesce(obs.o, 0) AS o
      FROM ra CROSS JOIN rb LEFT JOIN obs ON obs.a = ra.a AND obs.b = rb.b
    )
    SELECT round(sum(pow(o - rt * ct / n, 2) / (rt * ct / n)), 6) AS chi2,
           ((max(r) - 1) * (max(c) - 1))::BIGINT AS dof,
           CAST(max(n) AS BIGINT) AS n,
           round(sqrt(sum(pow(o - rt * ct / n, 2) / (rt * ct / n))
                      / (max(n) * least(max(r) - 1, max(c) - 1))), 6) AS cramers_v
    FROM cells, tot
    """,
)
def profile_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Chi-square independence + Cramér's V
    (operators/profile.py:chi_square_independence): is market segment
    related to nation? The categorical-association readout next to the
    numeric correlation survey. One contingency aggregate + broadcast
    marginals; oracle replays the cells and the formula."""
    from .operators.profile import chi_square_independence

    c = _t(spark, sf_dir, "customer")
    return chi_square_independence(c, "c_mktsegment", "c_nationkey")


@query(
    "profile_benford_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::DOUBLE AS tot FROM c)
    SELECT c.digit, c.n,
           round(c.n / t.tot, 6) AS observed_frac,
           round(log10(1.0 + 1.0 / c.digit), 6) AS benford_frac,
           round(c.n / t.tot - log10(1.0 + 1.0 / c.digit), 6) AS excess
    FROM c, t
    ORDER BY c.digit
    """,
)
def profile_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Benford first-digit audit: observed vs expected
    log10(1 + 1/d) leading-digit frequencies of order totals — the
    classic fabricated-data / unit-mixing smell test auditors run on
    financial columns (synthetic uniform data shows large positive
    excess on high digits, exactly what this surfaces). One 9-key
    map-side-combined aggregate; first digit extracted via integer
    string math, no float log tricks."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("tot"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("observed_frac"),
            F.round(benford, 6).alias("benford_frac"),
            F.round(F.col("n") / F.col("tot") - benford, 6).alias("excess"),
        )
        .orderBy("digit")
    )


@query(
    "quantile_exact_prices",
    """
    WITH v AS (
      SELECT l_extendedprice AS x FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x) AS rn,
             count(*) OVER () AS n
      FROM v
    ),
    t(q, p, den) AS (
      VALUES (0.01::DOUBLE, 1, 100), (0.25::DOUBLE, 1, 4),
             (0.5::DOUBLE, 1, 2), (0.75::DOUBLE, 3, 4),
             (0.9::DOUBLE, 9, 10), (0.99::DOUBLE, 99, 100)
    )
    SELECT t.q, round(min(r.x), 6) AS value
    FROM r JOIN t
      ON r.rn >= greatest(1, (t.p * r.n + t.den - 1) // t.den)
    GROUP BY t.q ORDER BY t.q
    """,
)
def quantile_exact_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] EXACT global quantiles of lineitem prices
    (operators/quantiles.py:exact_quantiles): the audit-grade
    counterpart to the approx_percentile scale path — discrete
    (type-1) quantiles at rank max(1, ceil(q*n)), computed with the
    two-phase global rank (operators/ranks.py; no single-partition
    sort) + one broadcast equality probe for all six qs in one pass.
    The oracle replays the identical rank arithmetic with a window."""
    from .operators.quantiles import exact_quantiles

    li = _t(spark, sf_dir, "lineitem")
    return exact_quantiles(
        li, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    )


@query(
    "privacy_t_closeness",
    """
    WITH base AS (
      SELECT o_orderpriority AS order_priority,
             year(o_orderdate) AS order_year,
             o_orderstatus AS s
      FROM orders WHERE o_orderstatus IS NOT NULL
    ),
    gv AS (SELECT s, count(*)::BIGINT AS cv FROM base GROUP BY s),
    n AS (SELECT count(*)::BIGINT AS n FROM base),
    g AS (
      SELECT order_priority, order_year, s, count(*)::BIGINT AS cgv
      FROM base GROUP BY 1, 2, 3
    ),
    j AS (
      SELECT g.*, gv.cv, n.n,
             sum(cgv) OVER (PARTITION BY order_priority, order_year) AS cg
      FROM g JOIN gv USING (s), n
    ),
    st AS (
      SELECT order_priority, order_year, max(cg)::BIGINT AS group_size,
             sum(abs(cgv * n - cv * cg))::BIGINT AS pres,
             sum(cv)::BIGINT AS sv, max(n) AS n
      FROM j GROUP BY 1, 2
    )
    SELECT order_priority, CAST(order_year AS INTEGER) AS order_year,
           group_size,
           round((pres + group_size * (n - sv)) / (2.0 * group_size * n), 6)
             AS tvd
    FROM st
    WHERE round((pres + group_size * (n - sv)) / (2.0 * group_size * n), 6)
          > 0.04
    ORDER BY tvd DESC, order_priority ASC, order_year ASC
    LIMIT 100
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] t-closeness audit
    (operators/privacy.py:t_closeness_report): (priority, order-year)
    groups whose order-status distribution sits > 0.04 total-variation
    distance from the global one — the skew-disclosure risk k-anonymity
    and l-diversity both miss. Counts-only shuffles; the TVD numerator
    and denominator are exact int64, so the oracle reproduces the
    division bit-for-bit."""
    from .operators.privacy import t_closeness_report

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("order_priority"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderstatus",
    )
    return t_closeness_report(
        o, ["order_priority", "order_year"], "o_orderstatus", t=0.04
    )


@query(
    "reconcile_js_drift",
    """
    WITH pooled AS (
      SELECT o_totalprice::DOUBLE AS v, 0 AS s FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
      UNION ALL
      SELECT o_totalprice::DOUBLE, 1 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
    ),
    bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM pooled),
    binned AS (
      SELECT s,
             CASE WHEN b.hi > b.lo
                  THEN least(CAST(floor((v - b.lo) / ((b.hi - b.lo) / 20.0))
                             AS BIGINT), 19)
                  ELSE 0 END AS bin
      FROM pooled, bounds b
    ),
    hist AS (
      SELECT bin,
             sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
      FROM pooled
    )
    SELECT round(0.5 * sum(
             CASE WHEN ca > 0 THEN (ca / na::DOUBLE)
                  * log2((ca / na::DOUBLE)
                         / (((ca / na::DOUBLE) + (cb / nb::DOUBLE)) / 2.0))
                  ELSE 0.0 END
             + CASE WHEN cb > 0 THEN (cb / nb::DOUBLE)
                  * log2((cb / nb::DOUBLE)
                         / (((ca / na::DOUBLE) + (cb / nb::DOUBLE)) / 2.0))
                  ELSE 0.0 END), 6) AS js_divergence,
           max(na) AS n_a, max(nb) AS n_b
    FROM hist, tot
    """,
)
def reconcile_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Jensen-Shannon drift between pre-1998 and 1998+ order
    prices (operators/reconcile.py:js_divergence) — the bounded
    symmetric companion to the PSI and KS drift checks: 20 shared
    equal-width bins over the pooled range, JSD in bits. Counts-only
    shuffles (one histogram aggregate); no ordering machinery at all,
    so this is the cheapest member of the drift family at 100 TB."""
    from .operators.reconcile import js_divergence

    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cutoff)
    late = o.filter(F.col("o_orderdate") >= cutoff)
    return js_divergence(early, late, "o_totalprice", n_bins=20)


@query(
    "multimodal_video_near_dups",
    f"""
    WITH fr AS (
      SELECT doc_id, text,
             unnest(range(greatest((length(text) + 199) // 200, 1))) AS fi
      FROM documents
    ),
    fh AS (
      SELECT DISTINCT doc_id,
             {_hex2int_sql("md5(substr(text, fi * 200 + 1, 200))")} AS fhash
      FROM fr
    ),
    sz AS (SELECT doc_id, count(*)::BIGINT AS nf FROM fh GROUP BY doc_id),
    rare AS (SELECT fhash FROM fh GROUP BY fhash HAVING count(*) <= 1000),
    pairs AS (
      SELECT a.doc_id AS id_i, b.doc_id AS id_j, count(*)::BIGINT AS n_shared
      FROM fh a JOIN fh b USING (fhash) JOIN rare USING (fhash)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_i, id_j, n_shared,
           round(n_shared / (sa.nf + sb.nf - n_shared)::DOUBLE, 6) AS jaccard
    FROM pairs
    JOIN sz sa ON sa.doc_id = id_i
    JOIN sz sb ON sb.doc_id = id_j
    WHERE n_shared * 1000 >= 500 * (sa.nf + sb.nf - n_shared)
    """,
)
def multimodal_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Video near-dup pairs by sampled-frame-set Jaccard
    (operators/multimodal.py:video_near_dups): fake video payloads over
    the documents corpus, one frame per 200 "ms" (chars under the
    stand-in), ≥0.5 frame-set overlap (position-based frame slicing is
    offset-sensitive, so template near-dups share only their aligned
    stretches — 0.8 yields zero pairs at every tested SF, an empty and
    evidence-free differential) — the video leg of the dedup family
    (MinHash for text, phash banding for images, frame sets for
    video). Postings-capped bucket join; integer threshold; payloads
    never shuffle. Oracle replays the sliced-md5 frame hashes and the
    same integer cutoff."""
    b = multimodal.attach_fake_binary(
        _t(spark, sf_dir, "documents", fanout=True), "text", "doc_id", media_type="video"
    )
    return multimodal.video_near_dups(b, every_ms=200, min_jaccard=0.5)


@query("multimodal_audio_gate", _audio_gate_sql())
def multimodal_audio_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Audio-quality hard gate
    (operators/multimodal.py:audio_quality_gate): duration window +
    minimum RMS energy + clipping detection over the stub-decoded
    waveform stats — the audio leg of the rule-gate family
    (text.gopher_rules for text). Arrow decode is the only Python; the
    rule checks are one zero-shuffle JVM projection and payloads never
    shuffle. Named failed rules, deterministic order; oracle replays
    the sha-derived stats and every rule byte-for-byte."""
    b = multimodal.attach_fake_binary(
        _t(spark, sf_dir, "documents"), "text", "doc_id", media_type="audio"
    )
    return multimodal.audio_quality_gate(b)


@query(
    "profile_corpus_card",
    """
    WITH s AS (
      SELECT doc_id, text, lang, n_chars,
             md5(trim(regexp_replace(lower(coalesce(text, '')),
                                     '[^a-z0-9]+', ' ', 'g'))) AS fp,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                             '[^a-z0-9]+'), x -> x <> '')) AS nt
      FROM documents
    )
    SELECT count(*)::BIGINT AS n_docs,
           sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null_text,
           count(DISTINCT lang)::BIGINT AS n_langs,
           sum(nt)::BIGINT AS total_tokens,
           round(sum(nt) / count(*)::DOUBLE, 4) AS mean_doc_tokens,
           round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
           round(quantile_cont(n_chars, 0.75), 2) AS p75_chars,
           (count(*) - count(DISTINCT fp))::BIGINT AS n_exact_dups,
           round((count(*) - count(DISTINCT fp)) / count(*)::DOUBLE, 6)
             AS exact_dup_frac
    FROM s
    """,
)
def profile_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] One-row corpus dataset card — the before-you-train summary
    a data release ships: doc/null counts, language spread, token
    volume, length quantiles (0.5/0.75 — binary-exact interpolation
    indexes), and the exact-duplicate rate by normalized-text
    fingerprint. ONE aggregate pass over in-row projections (token
    count, fingerprint) — the distincts are the only shuffles, both on
    small-cardinality keys. The text-table sibling of
    profile_customer_table; oracle replays every statistic."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens
    from .operators.dedup import normalize_text

    s = d.select(
        "text",
        "lang",
        "n_chars",
        F.md5(normalize_text(F.coalesce(F.col("text"), F.lit("")))).alias(
            "__fp"
        ),
        F.size(
            F.coalesce(
                _tokens(F.col("text")), F.array().cast("array<string>")
            )
        ).alias("__nt"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.round(F.sum("__nt") / F.count(F.lit(1)), 4).alias(
            "mean_doc_tokens"
        ),
        F.round(F.percentile("n_chars", F.lit(0.5)), 2).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.75)), 2).alias("p75_chars"),
        (F.count(F.lit(1)) - F.count_distinct("__fp"))
        .cast("long")
        .alias("n_exact_dups"),
        F.round(
            (F.count(F.lit(1)) - F.count_distinct("__fp"))
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_frac"),
    )


@query("reconcile_quantile_drift", _quantile_drift_sql())
def reconcile_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-key ORDER-STATISTICS drift
    (operators/reconcile.py:quantile_drift): the events table's two
    'ingestion days' compared per event type through same-layout
    histogram states — interpolated p50/p90/p99 per side + diffs + the
    L∞ bucket-fraction distance (bucket-resolution KS). Two bounded
    state builds + one keys-sized NULL-SAFE join; the bucket comparison
    is an in-row zip_with. Oracle replays bucket counts, interpolation,
    and the L∞ term-for-term."""
    from .operators.reconcile import quantile_drift

    e = _t(spark, sf_dir, "events").select(
        "event_type", "value", F.dayofmonth("ts").alias("__d")
    )
    return quantile_drift(
        e.filter(F.col("__d") % 2 == 0),
        e.filter(F.col("__d") % 2 == 1),
        "value",
        ["event_type"],
        lo=0.0,
        hi=500.0,
        n_buckets=100,
    ).orderBy("event_type")


@query("quantile_weighted_prices", _weighted_price_sql())
def quantile_weighted_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] WEIGHTED vs unweighted price quantiles per return flag:
    unit-weighted p50/p90 of extended price (each line counted
    l_quantity times — "the median price a sold UNIT carries", the
    retail stat) next to the plain row quantiles, both through the
    mergeable histogram state (``build_hist_state(weight_col=...)``,
    integer weights ⇒ exact fold). Two bounded state builds over one
    scan pattern; oracle replays weighted and unweighted cumulative
    interpolation term-for-term."""
    from .operators import aggstate as A

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    kw = dict(lo=900.0, hi=105_000.0, n_buckets=128)
    sw = A.build_hist_state(
        li, ["flag"], "l_extendedprice", weight_col="qty", **kw
    )
    su = A.build_hist_state(li, ["flag"], "l_extendedprice", **kw)
    qw = A.finalize_hist_quantiles(sw, ["flag"], [0.5, 0.9])
    qu = A.finalize_hist_quantiles(su, ["flag"], [0.5, 0.9])
    return (
        qw.select(
            "flag",
            F.col("n").alias("total_units"),
            F.col("q_0_5").alias("wq_0_5"),
            F.col("q_0_9").alias("wq_0_9"),
        )
        .join(
            qu.select(
                "flag",
                F.col("n").alias("n_rows"),
                F.col("q_0_5").alias("uq_0_5"),
                F.col("q_0_9").alias("uq_0_9"),
            ),
            "flag",
        )
        .orderBy("flag")
    )


@query(
    "dq_quantile_gate",
    """
    WITH q AS (
      SELECT quantile_disc(o_totalprice, 0.5) AS m
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT 'quantile:o_totalprice' AS "check", 'o_totalprice' AS "column",
           round(m, 6) AS observed,
           'q0.5 in [100000.0,400000.0]' AS threshold,
           (m >= 100000.0 AND m <= 400000.0) AS passed
    FROM q
    UNION ALL
    SELECT 'quantile:o_totalprice#2', 'o_totalprice', round(m, 6),
           'q0.5 in [None,1000.0]', m <= 1000.0
    FROM q
    """,
)
def dq_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Quantile banding as a DATA-QUALITY EXPECTATION
    (operators/expectations.py, type=quantile): the DISTRIBUTION
    contract ``bounds`` can't express — a few outliers never move the
    median, a shifted corpus does. Two checks on the order-total
    median: a sane band (passes) and an absurd one (deterministically
    FAILED — the report shows both verdicts; duplicate base labels get
    the ``#2`` suffix). Evaluated with ``percentile_approx`` at an
    accuracy above the table's row count — EXACT there, and the exact
    pick equals DuckDB's rank-based ``quantile_disc`` (both take the
    lower value at the target rank; empirically pinned), so the oracle
    replays it value-for-value. In production the default 1e4 accuracy
    bounds rank error to 0.01% of rows — band wider than that, or pay
    for more accuracy. At 100 TB the GK sketch is one-pass mergeable
    and rides the same wide aggregate as every other expectation — no
    sort, no second scan."""
    o = _t(spark, sf_dir, "orders")
    from .operators.expectations import Expect, run_expectations

    kw = dict(
        type="quantile", columns=("o_totalprice",), q=0.5,
        accuracy=1_000_000,
    )
    return run_expectations(
        o,
        [
            Expect(min=100000.0, max=400000.0, **kw),
            Expect(max=1000.0, **kw),
        ],
    )


@query(
    "dq_distinct_gate",
    """
    WITH d AS (
      SELECT count(DISTINCT user_id)::BIGINT AS n FROM events
    )
    SELECT 'distinct_count:user_id' AS "check", 'user_id' AS "column",
           n::DOUBLE AS observed,
           'distinct in [100.0,100000.0]' AS threshold,
           (n >= 100.0 AND n <= 100000.0) AS passed
    FROM d
    UNION ALL
    SELECT 'distinct_count:user_id#2', 'user_id', n::DOUBLE,
           'distinct in [None,10.0]', n <= 10.0
    FROM d
    """,
)
def dq_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Distinct-cardinality banding as a DATA-QUALITY
    EXPECTATION (operators/expectations.py, type=distinct_count): the
    contract neither ``unique`` (duplicates) nor ``row_count``
    (volume) expresses — "tonight's load carries roughly the usual
    number of users". Two checks on events.user_id: a sane band
    (passes) and an absurd cap (deterministically FAILED; duplicate
    base labels get the ``#2`` suffix). EXACT count(DISTINCT) — Spark
    plans the mixed distinct/plain aggregate set in ONE pass via
    Expand; the oracle replays it verbatim. At extreme scale the
    documented alternative is banding the nightly
    ``state: {kind: kmv}`` estimate instead of an exact distinct."""
    e = _t(spark, sf_dir, "events")
    from .operators.expectations import Expect, run_expectations

    return run_expectations(
        e,
        [
            Expect(
                type="distinct_count", columns=("user_id",),
                min=100.0, max=100000.0,
            ),
            Expect(type="distinct_count", columns=("user_id",), max=10.0),
        ],
    )
