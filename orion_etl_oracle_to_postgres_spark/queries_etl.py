"""Declarative ETL-pipeline parity queries (SURVEY.md §2.2-2.7, §2.11 etl_*): every query compiles a YAML-equivalent TableSpec through the job compiler.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .compiler import JobContext, compile_table, run_error_checks
from .operators.lookups import external_lookup
from .operators import dedup, similarity, text
from .spec import (
    ConnectorsSpec,
    DedupSpec,
    FilesConnectorSpec,
    GlobalSpec,
    LookupSpec,
    MappingSpec,
    TableSpec,
    ValidationSpec,
)
from .queries_shared import (
    _CURATE_V3_SQL,
    _GOPHER_RULES_SQL,
    _MINHASH_IX_PARAMS,
    _QUALITY_SQL,
    _SEMDEDUP_CB_PARAMS,
    _SEMDEDUP_LLOYD_CENT,
    _SHINGLE_CTE,
    _UNIGRAM_PPL_CTES,
    _cached_layout,
    _compile,
    _ctx,
    _curation_spec_sql,
    _doremi_sample_tail_sql,
    _doremi_token_tail_sql,
    _etl_fim_sql,
    _hex2int_sql,
    _minhash_ix_dir,
    _minhash_pairs_dir,
    _mw_chain_sql,
    _nb_chain_sql,
    _nb_model_dir,
    _quarantine_spec,
    _rewrite_gate_sql,
    _semdedup_chain_sql,
    _span_corruption_sql,
    _t,
    _unimax_alloc_ctes,
    _whiten_semantic_dedup_sql,
    query,
)


@query(
    "etl_customer_pipeline",
    """
    SELECT c.c_custkey AS cust_id,
           upper(trim(c.c_name)) AS cust_name,
           lower(c.c_mktsegment) AS segment,
           CASE WHEN c.c_acctbal BETWEEN 0 AND 10000 THEN c.c_acctbal END AS balance,
           n.v AS nation_name
    FROM customer c
    LEFT JOIN (SELECT CAST(n_nationkey AS VARCHAR) AS k, min(n_name) AS v
               FROM nation GROUP BY 1) n
      ON CAST(c.c_nationkey AS VARCHAR) = n.k
    WHERE c.c_acctbal > 0
      AND regexp_matches(lower(c.c_mktsegment), '^[a-z]+')
    """,
)
def etl_customer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline: where-pushdown + transforms + regex-skip +
    range-null validation + broadcast nation lookup (P1/S3/T1-T3/V1/V2/J1)."""
    spec = TableSpec(
        source_table="customer",
        target_table="customer_clean",
        where="c_acctbal > 0",
        mappings=[
            MappingSpec(source="c_custkey", target="cust_id"),
            MappingSpec(source="c_name", target="cust_name", transform="strip,upper"),
            MappingSpec(
                source="c_mktsegment",
                target="segment",
                transform="lower",
                validation=[ValidationSpec(type="regex", pattern="[a-z]+", on_fail="skip")],
            ),
            MappingSpec(
                source="c_acctbal",
                target="balance",
                validation=[ValidationSpec(type="range", pattern="0-10000")],
            ),
            MappingSpec(
                source="c_nationkey",
                target="nation_name",
                lookup=LookupSpec(
                    table="nation",
                    key_column="n_nationkey",
                    value_column="n_name",
                    on_missing="null",
                ),
            ),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_transform_ops",
    """
    SELECT p_partkey AS part_id,
           upper(trim(p_name)) AS name_up,
           lower(p_type) AS type_lc,
           upper(substr(lower(p_brand), 1, 1)) || substr(lower(p_brand), 2) AS brand_cap,
           CAST(p_size AS BIGINT) AS size_int,
           'SRC1' AS src_system
    FROM part
    """,
)
def etl_transform_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar transform ops T1-T3 + capitalize + to_int + insert (§2.6).
    (``capitalize``/initcap on single-word p_brand so the SQL oracle can
    replicate it without initcap, which DuckDB lacks.)"""
    spec = TableSpec(
        source_table="part",
        target_table="part_clean",
        mappings=[
            MappingSpec(source="p_partkey", target="part_id"),
            MappingSpec(source="p_name", target="name_up", transform="strip,upper"),
            MappingSpec(source="p_type", target="type_lc", transform="lower"),
            MappingSpec(source="p_brand", target="brand_cap", transform="capitalize"),
            MappingSpec(source="p_size", target="size_int", transform="to_int"),
            MappingSpec(source="p_partkey", target="src_system", transform="insert:SRC1"),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_dates_bools",
    """
    SELECT o_orderkey AS order_id,
           CAST(o_orderdate AS DATE) AS order_date,
           CASE WHEN upper(trim(o_orderstatus)) IN ('Y','1','TRUE','T') THEN true
                WHEN upper(trim(o_orderstatus)) IN ('N','0','FALSE','F') THEN false
           END AS is_filled
    FROM orders
    """,
)
def etl_dates_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_date + Y/N-boolean ops (T4, declared to_date — §2.6);
    'F' status → false, 'O'/'P' → NULL (documented to_bool deviation)."""
    spec = TableSpec(
        source_table="orders",
        target_table="orders_clean",
        mappings=[
            MappingSpec(source="o_orderkey", target="order_id"),
            MappingSpec(source="o_orderdate", target="order_date", transform="to_date"),
            MappingSpec(source="o_orderstatus", target="is_filled", transform="to_bool"),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_where_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= '1995-06-01' AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def etl_where_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text ``where:`` predicate pushed into the parquet scan (S3/P5)."""
    spec = TableSpec(
        source_table="lineitem",
        target_table="lineitem_f",
        where="l_shipdate >= '1995-06-01' AND l_discount BETWEEN 0.02 AND 0.08",
        mappings=[
            MappingSpec(source=c, target=c)
            for c in ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_validation_policies",
    """
    SELECT c_custkey AS cust_id,
           c_name AS cust_name,
           lower(c_mktsegment) AS segment,
           CASE WHEN c_acctbal BETWEEN 0 AND 5000 THEN c_acctbal ELSE 0.0 END AS balance
    FROM customer
    WHERE regexp_matches(lower(c_mktsegment), '^(building|machinery)')
    """,
)
def etl_validation_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """on_fail ladder: regex→skip, range→default:0 (V1/V2, §2.7)."""
    spec = TableSpec(
        source_table="customer",
        target_table="customer_v",
        mappings=[
            MappingSpec(source="c_custkey", target="cust_id"),
            MappingSpec(source="c_name", target="cust_name"),
            MappingSpec(
                source="c_mktsegment",
                target="segment",
                transform="lower",
                validation=[
                    ValidationSpec(
                        type="regex", pattern="(building|machinery)", on_fail="skip"
                    )
                ],
            ),
            MappingSpec(
                source="c_acctbal",
                target="balance",
                validation=[
                    ValidationSpec(type="range", pattern="0-5000", on_fail="default:0")
                ],
            ),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_lookup_default",
    """
    SELECT c.c_custkey AS cust_id,
           CASE WHEN c.c_nationkey IS NULL THEN NULL
                WHEN n.k IS NULL THEN 'UNKNOWN'
                ELSE n.v END AS nation_name
    FROM customer c
    LEFT JOIN (SELECT CAST(n_nationkey AS VARCHAR) AS k, min(n_name) AS v
               FROM nation WHERE n_nationkey < 15 GROUP BY 1) n
      ON CAST(c.c_nationkey AS VARCHAR) = n.k
    """,
)
def etl_lookup_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with on_missing=default:UNKNOWN against a restricted dimension
    (misses exist by construction)."""
    cust = _t(spark, sf_dir, "customer")
    dim = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 15)
    df = cust.select(F.col("c_custkey").alias("cust_id"), F.col("c_nationkey").alias("nation_name"))
    return external_lookup(
        df,
        "nation_name",
        LookupSpec(
            table="nation",
            key_column="n_nationkey",
            value_column="n_name",
            on_missing="default:UNKNOWN",
        ),
        dim,
    )


@query(
    "etl_lookup_skip",
    """
    SELECT c.c_custkey AS cust_id, n.v AS nation_name
    FROM customer c
    JOIN (SELECT CAST(n_nationkey AS VARCHAR) AS k, min(n_name) AS v
          FROM nation WHERE n_nationkey < 15 GROUP BY 1) n
      ON CAST(c.c_nationkey AS VARCHAR) = n.k
    WHERE c.c_nationkey IS NOT NULL
    """,
)
def etl_lookup_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with on_missing=skip: misses dropped (NULL keys would bypass —
    none in this data, mirrored by the oracle's IS NOT NULL)."""
    cust = _t(spark, sf_dir, "customer")
    dim = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 15)
    df = cust.select(F.col("c_custkey").alias("cust_id"), F.col("c_nationkey").alias("nation_name"))
    return external_lookup(
        df,
        "nation_name",
        LookupSpec(
            table="nation", key_column="n_nationkey", value_column="n_name", on_missing="skip"
        ),
        dim,
    )


@query(
    "etl_validation_lookup_semi",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IS NULL
       OR CAST(o_custkey AS VARCHAR) IN
          (SELECT CAST(c_custkey AS VARCHAR) FROM customer WHERE c_custkey % 3 = 0)
    """,
)
def etl_validation_lookup_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3/J3 existence check with on_fail=skip → left-semi join (NULLs pass)."""
    from .operators.validations import apply_validations

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    rule = ValidationSpec(
        type="lookup",
        lookup=LookupSpec(table="customer", key_column="c_custkey"),
        on_fail="skip",
    )
    df, _ = apply_validations(
        orders, [("o_custkey", rule)], lookup_resolver=lambda lk: dim
    )
    return df


@query(
    "etl_self_lookup",
    """
    SELECT c.c_custkey, c.c_name, s.v AS parent_name
    FROM customer c
    LEFT JOIN (SELECT c_custkey AS k, min(c_name) AS v
               FROM customer WHERE c_name IS NOT NULL GROUP BY 1) s
      ON c.c_nationkey = s.k
    """,
)
def etl_self_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 self-lookup as a pre-write self-join (replaces the reference's
    tmp-column + UPDATE...FROM protocol, ``default_loader.py:109-154``)."""
    spec = TableSpec(
        source_table="customer",
        target_table="customer",  # lookup table == target ⇒ self-lookup path
        mappings=[
            MappingSpec(source="c_custkey", target="c_custkey"),
            MappingSpec(source="c_name", target="c_name"),
            MappingSpec(
                source="c_nationkey",
                target="parent_name",
                lookup=LookupSpec(
                    table="customer", key_column="c_custkey", value_column="c_name"
                ),
            ),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query("etl_auto_mapping", "SELECT * FROM region")
def etl_auto_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/S7: empty mappings → auto 1:1 from schema reconciliation."""
    spec = TableSpec(source_table="region", target_table="region_copy")
    return _compile(spark, sf_dir, spec)


@query("etl_auto_mapping_target", "SELECT r_regionkey, r_name FROM region")
def etl_auto_mapping_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/S7 reference parity: when the target table EXISTS, empty
    mappings fill from the *target* catalog in ordinal order
    (``default_auto_mapping.py:18-26`` reads Postgres
    ``information_schema.columns``) — here the pre-existing target is
    NARROWER than the source, so the load ships exactly its column set,
    not the source's."""
    import tempfile

    tgt = tempfile.mkdtemp(prefix="etl_amt_")
    # materialize the existing narrower target (schema is what matters)
    spark.createDataFrame([], "r_regionkey bigint, r_name string").write.mode(
        "overwrite"
    ).parquet(f"{tgt}/region_copy")
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=tgt),
        )
    )
    compiled = compile_table(JobContext(spark, g), TableSpec(
        source_table="region", target_table="region_copy"
    ))
    return compiled.df


@query(
    "etl_scd2_segment",
    """
    WITH dim0 AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '2024-01-01' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, 'RETIRED' AS segment
      FROM customer WHERE c_custkey % 7 = 0
    ),
    changed AS (
      SELECT d.c_custkey FROM dim0 d JOIN upd u USING (c_custkey)
      WHERE d.segment IS DISTINCT FROM u.segment
    )
    SELECT d.c_custkey, d.segment, d.valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN TIMESTAMP '2024-06-01' END AS valid_to
    FROM dim0 d LEFT JOIN changed ch USING (c_custkey)
    UNION ALL
    SELECT c_custkey, 'RETIRED', TIMESTAMP '2024-06-01', NULL FROM changed
    """,
)
def etl_scd2_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] DECLARATIVE SCD Type-2 (``TableSpec.scd2`` →
    ``compiler._write_scd2`` → ``operators/scd.py``): run 1 bootstraps
    the customer-segment dimension at T0 through the YAML-shaped spec;
    run 2 re-runs the same config-driven pipeline with a ``where``
    filter and an ``insert:`` transform ("every 7th customer retires")
    at T1 — the engine closes the old versions, opens new ones, and
    swap-replaces the files target it was reading from. The oracle
    replays the same set algebra. Replaces the reference's only load
    mode, truncate-and-replace (``default_loader.py:38-45``), with a
    history-keeping merge driven purely from config."""
    import tempfile

    from .compiler import run_table
    from .spec import Scd2Spec

    out = tempfile.mkdtemp(prefix="scd2_dim_")
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=out),
        )
    )
    ctx = JobContext(spark, g)
    t1 = TableSpec(
        source_table="customer",
        target_table="dim_customer",
        mappings=[
            MappingSpec(source="c_custkey", target="c_custkey"),
            MappingSpec(source="c_mktsegment", target="segment"),
        ],
        scd2=Scd2Spec(
            key="c_custkey", compare_columns=["segment"],
            effective_time="2024-01-01",
        ),
    )
    run_table(ctx, t1)
    t2 = TableSpec(
        source_table="customer",
        target_table="dim_customer",
        where="c_custkey % 7 = 0",
        mappings=[
            MappingSpec(source="c_custkey", target="c_custkey"),
            MappingSpec(
                source="c_mktsegment", target="segment",
                transform="insert:RETIRED",
            ),
        ],
        scd2=Scd2Spec(
            key="c_custkey", compare_columns=["segment"],
            effective_time="2024-06-01",
        ),
    )
    return run_table(ctx, t2)


@query(
    "etl_validation_quarantine_clean",
    """
    SELECT c_custkey AS cust_id,
           lower(c_mktsegment) AS segment,
           c_acctbal AS balance
    FROM customer
    WHERE NOT (c_mktsegment IS NOT NULL
               AND NOT regexp_matches(lower(c_mktsegment), '^(building|machinery)'))
      AND NOT (c_acctbal IS NOT NULL AND c_acctbal NOT BETWEEN 0 AND 5000)
    """,
)
def etl_validation_quarantine_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] ``on_fail: quarantine``: the MAIN output —
    rows failing any quarantine rule are diverted, not silently
    dropped. Tag-then-split keeps it one pass (no per-rule rescan)."""
    ctx = _ctx(spark, sf_dir)
    compiled = compile_table(ctx, _quarantine_spec())
    return compiled.df


@query(
    "etl_validation_quarantine_rows",
    """
    SELECT c_custkey AS cust_id,
           lower(c_mktsegment) AS segment,
           c_acctbal AS balance,
           concat_ws(',',
             CASE WHEN c_mktsegment IS NOT NULL
                       AND NOT regexp_matches(lower(c_mktsegment), '^(building|machinery)')
                  THEN 'regex:segment' END,
             CASE WHEN c_acctbal IS NOT NULL AND c_acctbal NOT BETWEEN 0 AND 5000
                  THEN 'range:balance' END) AS _quarantine_rules
    FROM customer
    WHERE (c_mktsegment IS NOT NULL
           AND NOT regexp_matches(lower(c_mktsegment), '^(building|machinery)'))
       OR (c_acctbal IS NOT NULL AND c_acctbal NOT BETWEEN 0 AND 5000)
    """,
)
def etl_validation_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] The QUARANTINE side of the same pipeline:
    every rejected row with the comma-joined labels of ALL rules it
    failed (declaration order) — the audit trail ``on_fail: skip``
    throws away. Written to ``quarantine_table`` by ``run_table``."""
    ctx = _ctx(spark, sf_dir)
    compiled = compile_table(ctx, _quarantine_spec())
    assert compiled.quarantine is not None
    return compiled.quarantine


@query(
    "etl_anonymize_ops",
    """
    SELECT c_custkey AS cust_id,
           CASE WHEN c_name IS NOT NULL
                THEN sha256('s1:' || c_name) END AS name_hash,
           CASE WHEN c_name IS NOT NULL THEN
             CASE WHEN length(c_name) <= 4 THEN repeat('*', length(c_name))
                  ELSE repeat('*', length(c_name) - 4) ||
                       substr(c_name, length(c_name) - 3, 4) END
           END AS name_masked
    FROM customer
    """,
)
def etl_anonymize_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] pseudonymization transform ops through the
    job compiler: salted sha256 (``hash:s1``) and last-4 masking
    (``mask``) — the PII rules an Oracle→Postgres migration applies in
    flight. Both JVM-side expressions, bit-checked against DuckDB."""
    spec = TableSpec(
        source_table="customer",
        target_table="customer_anon",
        mappings=[
            MappingSpec(source="c_custkey", target="cust_id"),
            MappingSpec(source="c_name", target="name_hash", transform="hash:s1"),
            MappingSpec(source="c_name", target="name_masked", transform="mask"),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query("etl_curation_mix_split", _curation_spec_sql())
def etl_curation_mix_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative curation in the job spec: the
    YAML user gets data mixing (SampleSpec: keep 100% en / 50% de /
    20% rest) and a split label (SplitSpec: 80/10/10) compiled into the
    pipeline — both pure md5-hash projections, zero shuffles, distinct
    seeds so sample and split stay uncorrelated. The oracle replays
    both bucket computations bit-for-bit."""
    from .spec import SampleSpec, SplitSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_mixed",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
        ],
        sample=SampleSpec(
            id_column="doc_id",
            group_column="lang",
            rates={"en": 1.0, "de": 0.5},
            default_rate=0.2,
            seed="mix1",
        ),
        split=SplitSpec(
            id_column="doc_id",
            weights={"train": 0.8, "val": 0.1, "test": 0.1},
            seed="sp1",
        ),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_nb_quality_gate",
    _nb_chain_sql("TRUE")
    + """
    SELECT d.doc_id, d.lang FROM documents d
    JOIN nbpred p ON p.doc_id = d.doc_id
    WHERE p.predicted = 'en' AND p.margin >= 0.5
    """,
)
def etl_nb_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative Naive Bayes gate
    (`quality_filter.method: nb`, compiler.py): a TRAINED nb_train
    model persisted once (the layout-cache pattern) mounts through the
    job's connectors as two tables, and the YAML user keeps only rows
    the classifier confidently assigns to ``keep_labels`` — here
    predicted 'en' with margin ≥ 0.5 (the abstention bar), the
    language-filter recipe from config alone. Token-less rows carry no
    verdict and drop with the rejects; the verdict applies as an
    ids-only semi-join. Oracle: the shared NB chain scored over ALL
    documents, filtered by the same label + margin rule."""
    cache = _nb_model_dir(spark, sf_dir)
    from .spec import QualityFilterSpec

    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="docs_en_confident",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        quality_filter=QualityFilterSpec(
            text_column="text",
            method="nb",
            id_column="doc_id",
            nb_model_table="nb_model",
            nb_priors_table="nb_priors",
            keep_labels=["en"],
            min_margin=0.5,
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select("doc_id", "lang")


@query("etl_corpus_curate_v3", _CURATE_V3_SQL)
def etl_corpus_curate_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] The round-8 COMPOSED flagship — the full new
    surface in ONE declarative Catalyst plan: persisted-pair-table SOFT
    dedup (`dedup: {method: soft, pairs_table: ...}` — the banded
    MinHash join was mined once and mounted, never re-shingled) →
    near-dup eval DECONTAMINATION (`decontaminate: {method: minhash}`
    vs the doc_id % 7 == 0 benchmark slice) → UniMax token-budget
    SAMPLING (`sample: {method: unimax}`, 15k tokens water-filled
    across sources, max 2 epochs). Soft annotations survive the whole
    chain; decontaminated rows drop before the budget is allocated, so
    the mixture reflects the CLEAN corpus. Oracle replays exact pairs →
    transitive closure → reciprocal weights, the exact cross-corpus
    Jaccard flag set, then the integer water-fill + per-source prefix
    over the survivors."""
    from .spec import DecontaminateSpec, SampleSpec

    cache = _minhash_pairs_dir(spark, sf_dir)
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="corpus_v3",
        where="doc_id % 7 <> 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="source", target="source"),
            MappingSpec(source="text", target="text"),
        ],
        dedup=DedupSpec(
            method="soft", id_column="doc_id", pairs_table="pairs"
        ),
        decontaminate=DecontaminateSpec(
            method="minhash",
            benchmark_table="documents",
            benchmark_where="doc_id % 7 = 0",
            text_column="text",
            id_column="doc_id",
            benchmark_id_column="doc_id",
            threshold=0.8,
            num_hashes=128,
            bands=32,
        ),
        sample=SampleSpec(
            method="unimax",
            id_column="doc_id",
            group_column="source",
            text_column="text",
            budget_tokens=15_000,
            max_epochs=2,
            seed="um0",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select(
        "doc_id", "source", "cluster_id", "n_dups", "sample_weight",
        "n_tokens", "target_epochs",
    )


@query("etl_corpus_curate_v4", _CURATE_V3_SQL)
def etl_corpus_curate_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] The v3 flagship with ZERO shingling anywhere
    in the plan (VERDICT r8 ask #6 completed end-to-end): the SAME
    persisted pair table now feeds BOTH near-dup stages — soft dedup
    (`dedup.pairs_table`) AND eval decontamination
    (`decontaminate.pairs_table`, new this round) — so the whole
    dedup+decontaminate+sample job pays the banded MinHash join
    exactly ONCE, at mining time, across every consumer. The
    decontaminate leg mounts the undirected layout with sidedness
    re-derived from ids-only semi-joins (id_i → pipeline, id_j →
    benchmark slice); text is read only by the UniMax tokenizer.
    Result is identical to v3 by construction (same pair geometry and
    thresholds), so the oracle is shared — the bench receipt is the
    point: v3 re-shingles the corpus for its decontaminate leg, v4
    never touches text on either near-dup path."""
    from .spec import DecontaminateSpec, SampleSpec

    cache = _minhash_pairs_dir(spark, sf_dir)
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="corpus_v4",
        where="doc_id % 7 <> 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="source", target="source"),
            MappingSpec(source="text", target="text"),
        ],
        dedup=DedupSpec(
            method="soft", id_column="doc_id", pairs_table="pairs"
        ),
        decontaminate=DecontaminateSpec(
            method="minhash",
            benchmark_table="documents",
            benchmark_where="doc_id % 7 = 0",
            id_column="doc_id",
            benchmark_id_column="doc_id",
            threshold=0.8,
            pairs_table="pairs",
        ),
        sample=SampleSpec(
            method="unimax",
            id_column="doc_id",
            group_column="source",
            text_column="text",
            budget_tokens=15_000,
            max_epochs=2,
            seed="um0",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select(
        "doc_id", "source", "cluster_id", "n_dups", "sample_weight",
        "n_tokens", "target_epochs",
    )


@query(
    "etl_unimax_sample",
    "WITH "
    + _unimax_alloc_ctes(20_000, 2)
    + """,
    toks AS (
      SELECT doc_id, source,
             CASE WHEN text IS NOT NULL
                  THEN len(list_filter(string_split_regex(lower(text),
                         '[^a-z0-9]+'), x -> x <> ''))::BIGINT END AS n_tokens,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':um0')")
    + """ AS ord
      FROM documents
    ),
    pref AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM toks
    )
    SELECT p.doc_id, p.source, p.n_tokens, a.epochs AS target_epochs
    FROM pref p JOIN alloc a ON p.source IS NOT DISTINCT FROM a.source
    WHERE p.n_tokens IS NOT NULL AND p.cb < coalesce(a.alloc_tokens, 0)
    """,
)
def etl_unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative UniMax sampling
    (`sample: {method: unimax}`, compiler.py →
    operators/curation.py:unimax_sample): a 20k-token budget is
    water-filled across sources (max 2 epochs) and each source keeps
    its portable-hash-order prefix until its OWN allocation — the
    one-stage "UniMax-balanced corpus" recipe from YAML alone, vs
    token_budget's same-budget-per-group contract. Output ships
    n_tokens + the group's target_epochs for downstream repetition.
    Oracle replays the integer water-fill then the per-source
    running-sum prefix over the same hash order (null-safe source
    join)."""
    from .spec import SampleSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_unimax",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="source", target="source"),
            MappingSpec(source="text", target="text"),
        ],
        sample=SampleSpec(
            method="unimax",
            id_column="doc_id",
            group_column="source",
            text_column="text",
            budget_tokens=20_000,
            max_epochs=2,
            seed="um0",
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "source", "n_tokens", "target_epochs"
    )


@query(
    "etl_epoch_mix",
    """
    WITH h AS (
      SELECT doc_id, lang,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':epd')")
    + """ % 1000 AS b
      FROM documents
    ),
    nc AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 3 ELSE 0 END
             + CASE WHEN b < (CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 200
                                        ELSE 500 END)
                    THEN 1 ELSE 0 END AS n
      FROM h
    )
    SELECT doc_id, lang, CAST(unnest(range(n)) AS INTEGER) AS epoch
    FROM nc WHERE n >= 1
    """,
)
def etl_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative epoch mixing (`sample.method:
    epochs`): the YAML user states the published per-source epoch table
    (zh×3.2 up-sampled, en×1, everything else ×0.5) and the compiler
    emits the zero-shuffle epoch_mix projection with the `epoch`
    copy-index column. Oracle replays the integerized thresholds and
    the range-unnest."""
    from .spec import SampleSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_epochs",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
        ],
        sample=SampleSpec(
            method="epochs",
            id_column="doc_id",
            group_column="lang",
            epochs={"en": 1.0, "zh": 3.2},
            default_epochs=0.5,
            seed="epd",
        ),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_quality_top_fraction",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang, q,
             row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM (SELECT d.doc_id, d.lang, {_QUALITY_SQL} AS q
            FROM documents d)
    ) WHERE q IS NOT NULL AND rn * 1000 <= n * 400 + 999
    """,
)
def etl_quality_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative ADAPTIVE quality gate
    (`quality_filter.top_fraction`): the YAML user keeps the best 40%
    of every language by heuristic score instead of one absolute bar —
    rank-exact integer quota, doc_id tiebreak, NULL scores rejected.
    Oracle replays the score + the same window quota."""
    from .spec import QualityFilterSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_q",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        quality_filter=QualityFilterSpec(
            text_column="text",
            top_fraction=0.4,
            id_column="doc_id",
            group_column="lang",
        ),
    )
    return _compile(spark, sf_dir, spec).select("doc_id", "lang")


@query("etl_rewrite_gate", _rewrite_gate_sql())
def etl_rewrite_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative text rewrite + gate (`rewrite:
    {method: repeated_spans}` then `quality_filter`): the YAML user gets
    cross-document boilerplate removal feeding the heuristic quality
    bar — the first half of the modern-pipeline composition, straight
    from the spec. Oracle replays the span CTE chain and the score on
    the rewritten text."""
    from .spec import QualityFilterSpec, RewriteSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_rw",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        rewrite=RewriteSpec(
            text_column="text",
            method="repeated_spans",
            id_column="doc_id",
            span_tokens=3,
            min_docs=2,
        ),
        quality_filter=QualityFilterSpec(text_column="text", min_quality=0.5),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_extract_ops",
    """
    SELECT c_custkey AS cust_id,
           lpad(regexp_extract(c_name, '([0-9]+)', 1), 12, '*') AS name_digits,
           lower(regexp_replace(c_mktsegment, 'MOBILE', '_M', 'g')) AS seg
    FROM customer
    """,
)
def etl_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] The round-5 transform ops through the job
    compiler: ``extract:<regex>`` (first group, NULL on no-match),
    ``lpad:<n>,<char>`` (never truncates), ``replace:<regex>|<repl>``
    chained with ``lower`` — the key-normalization ladder as YAML.
    Oracle replays with DuckDB's regexp/lpad equivalents."""
    spec = TableSpec(
        source_table="customer",
        target_table="cust_keys",
        mappings=[
            MappingSpec(source="c_custkey", target="cust_id"),
            MappingSpec(
                source="c_name",
                target="name_digits",
                transform=["extract:([0-9]+)", "lpad:12,*"],
            ),
            MappingSpec(
                source="c_mktsegment",
                target="seg",
                transform=["replace:MOBILE|_M", "lower"],
            ),
        ],
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_curriculum",
    f"""
    WITH q AS (
      SELECT doc_id, lang, {_QUALITY_SQL} AS q
      FROM documents
    )
    SELECT doc_id, lang,
           (row_number() OVER (ORDER BY q DESC, doc_id) - 1)::BIGINT
             AS curriculum_idx,
           ntile(3) OVER (ORDER BY q DESC, doc_id) AS phase
    FROM q
    """,
)
def etl_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative curriculum stage through the job
    compiler (`curriculum:` block, spec.py:CurriculumSpec): the YAML
    user declares "order my corpus easy→hard by heuristic quality, 3
    phases" and the pipeline ships dense curriculum_idx + phase columns
    — computed via the two-phase global rank, after every other
    curation stage. Oracle replays the score + row_number/ntile."""
    from .spec import CurriculumSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_curr",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        curriculum=CurriculumSpec(
            id_column="doc_id", text_column="text", phases=3
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "lang", "curriculum_idx", "phase"
    )


@query(
    "etl_incremental_minhash_index",
    _SHINGLE_CTE
    + """
    , flagged AS (
      SELECT DISTINCT b.doc_id
      FROM sh b, sh a
      WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % 5 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
)
def etl_incremental_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative INCREMENTAL near-dup dedup
    against a persisted MinHash index (`dedup.index_table`,
    compiler.py:_apply_dedup — VERDICT r9 ask #6): a ``mode:
    incremental``-shaped delta (here doc_id % 5 == 0) probes the
    standing corpus index (``minhash_index_build`` over doc_id % 5 !=
    0, the `dedup_incremental_minhash` layout, mounted as the two
    connector tables ix_bands/ix_shingles) and drops every row
    near-duplicating an INDEXED document at 0.8 exact-verified Jaccard.
    The archive text is NEVER re-shingled — the index carries ids +
    hashes only, so the plan scans documents.parquet exactly once (the
    delta side; pinned in tests/test_spec_and_compiler.py). Oracle:
    the brute-forced cross-corpus Jaccard flag set (128/32 banding miss
    probability < 1e-7 at 0.8, the `dedup_minhash_join` argument),
    complemented to the surviving delta rows."""
    cache = _minhash_ix_dir(spark, sf_dir)
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            # the index layout mounts as target-side tables, the same
            # resolution path a production job uses for a prior sink
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="docs_incr_ix",
        where="doc_id % 5 = 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        dedup=DedupSpec(
            method="minhash",
            text_column="text",
            id_column="doc_id",
            threshold=0.8,
            num_hashes=_MINHASH_IX_PARAMS["num_hashes"],
            bands=_MINHASH_IX_PARAMS["bands"],
            shingle_n=_MINHASH_IX_PARAMS["shingle_n"],
            seed=_MINHASH_IX_PARAMS["seed"],
            index_table="ix",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select("doc_id", "lang")


@query(
    "etl_intradoc_rewrite",
    """
    WITH toks AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS pos,
             array_to_string(ts[i * 3 + 1 : i * 3 + 3], ' ') AS seg
      FROM (SELECT doc_id, ts,
                   unnest(range(CAST(ceil(len(ts) / 3.0) AS BIGINT))) AS i
            FROM toks WHERE len(ts) > 0)
    ),
    firsts AS (
      SELECT doc_id,
             string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos)
               AS new_text
      FROM (
        SELECT doc_id, pos, seg,
               row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS rn
        FROM segs
      )
      GROUP BY doc_id
    )
    SELECT t.doc_id, t.lang,
           CASE WHEN len(t.ts) = 0 OR t.ts IS NULL THEN t.text
                ELSE f.new_text END AS text
    FROM toks t LEFT JOIN firsts f USING (doc_id)
    """,
)
def etl_intradoc_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative WITHIN-document span collapse
    (`rewrite.method: intradoc_spans`): the YAML user strips
    self-repetition (spam/template loops) as a pure in-row projection —
    no join, no shuffle, zero-token rows keep their text. Oracle
    replays the first-occurrence window + passthrough."""
    from .spec import RewriteSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_clean",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        rewrite=RewriteSpec(
            text_column="text", method="intradoc_spans", span_tokens=3
        ),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_gopher_gate",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE doc_id IN (SELECT doc_id FROM ({_GOPHER_RULES_SQL}) WHERE keep)
    """,
)
def etl_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative Gopher gate (`quality_filter:
    {{method: gopher}}`): the YAML user keeps only documents passing all
    7 hard MassiveText rules — the categorical third quality_filter
    method next to heuristic/classifier; rejects routed to a
    reject_table carry the `_failed_rules` audit column
    (compiler.py quality_filter block, operators/text.py:
    gopher_rule_conds). Oracle replays the full rule set."""
    from .spec import QualityFilterSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_gopher",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        quality_filter=QualityFilterSpec(text_column="text", method="gopher"),
    )
    return _compile(spark, sf_dir, spec).select("doc_id", "lang")


@query(
    "etl_whiten_vectors",
    """
    WITH stats AS (
      SELECT i,
             round(avg(v[i+1]), 6) AS m,
             round(stddev_pop(v[i+1]), 6) AS s
      FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings
            WHERE embedding IS NOT NULL),
           range(64) r(i)
      GROUP BY i
    )
    SELECT vec_id, label, i AS dim,
           CASE WHEN s = 0.0 THEN 0.0
                ELSE round((v[i+1] - m) / s, 6) END AS value
    FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL) CROSS JOIN stats
    """,
)
def etl_whiten_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative embedding normalization
    (`vector_transform: {method: whiten}`, compiler.py): the YAML user
    standardizes the vector column in place before any downstream
    semantic stage — corpus dim stats collected once (bounded driver
    probe), inlined as literals into ONE zero-shuffle projection via
    similarity.whiten_expr. Output posexploded per the
    driver-canonicalizable contract; oracle replays the rounded stats
    and the standardization."""
    from .spec import VectorTransformSpec

    spec = TableSpec(
        source_table="embeddings",
        target_table="emb_white",
        mappings=[
            MappingSpec(source="vec_id", target="vec_id"),
            MappingSpec(source="label", target="label"),
            MappingSpec(source="embedding", target="embedding"),
        ],
        vector_transform=VectorTransformSpec(
            method="whiten", vector_column="embedding"
        ),
    )
    df = _compile(spark, sf_dir, spec)
    return df.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "value")
    )


@query("etl_whiten_semantic_dedup", _whiten_semantic_dedup_sql())
def etl_whiten_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] The documented reason `vector_transform:`
    runs BEFORE declarative dedup, exercised end-to-end in ONE job
    spec (VERDICT r8 ask #6): whiten the embedding column in place,
    then `dedup.method: semantic` measures the WHITENED space — raw
    cosine over anisotropic embeddings over-merges along the dominant
    directions; standardizing first makes the near-dup gate isotropic.
    Stage order is compiler-enforced, so the LSH signatures, exact
    cosine verify, clustering, and survivor pick all see whitened
    vectors. The oracle replays the whole composition — rounded dim
    stats → z-score (zero-variance dims → 0) → bit-identical plane
    signatures → rounded-cosine pairs → recursive closure → min-id
    survivors — value-exact across engines."""
    from .spec import VectorTransformSpec

    spec = TableSpec(
        source_table="embeddings",
        target_table="emb_white_dedup",
        mappings=[
            MappingSpec(source="vec_id", target="vec_id"),
            MappingSpec(source="label", target="label"),
            MappingSpec(source="embedding", target="embedding"),
        ],
        vector_transform=VectorTransformSpec(
            method="whiten", vector_column="embedding"
        ),
        dedup=DedupSpec(
            method="semantic",
            vector_column="embedding",
            id_column="vec_id",
            threshold=0.4,
            n_planes=8,
            seed=42,
        ),
    )
    return _compile(spark, sf_dir, spec).select("vec_id", "label")


@query(
    "etl_decontaminate_semantic",
    """
    WITH a0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                       sqrt(list_sum(list_transform(embedding::DOUBLE[],
                         x -> x*x))) AS n
                FROM embeddings
                WHERE vec_id % 9 <> 0 AND embedding IS NOT NULL),
    a AS (SELECT vec_id, list_transform(v, x -> x / n) AS v
          FROM a0 WHERE n > 0),
    b0 AS (SELECT embedding::DOUBLE[] AS v,
                  sqrt(list_sum(list_transform(embedding::DOUBLE[],
                    x -> x*x))) AS n
           FROM embeddings
           WHERE vec_id % 9 = 0 AND embedding IS NOT NULL),
    b AS (SELECT list_transform(v, x -> x / n) AS v FROM b0 WHERE n > 0),
    flagged AS (
      SELECT DISTINCT a.vec_id
      FROM a, b
      WHERE round(list_sum(list_transform(range(64),
                    i -> a.v[i+1] * b.v[i+1])), 6) >= 0.4
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id % 9 <> 0
      AND vec_id NOT IN (SELECT vec_id FROM flagged)
    """,
)
def etl_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative EMBEDDING-SPACE decontamination
    (`decontaminate: {method: semantic}`, compiler.py): pipeline rows
    whose vector sits within 0.4 cosine of any benchmark vector
    (vec_id % 9 == 0) are dropped — completing the declarative
    decontaminate triad (verbatim n-gram / near-dup MinHash /
    paraphrase semantic). Exact scoring vs the guarded broadcast
    benchmark, cosines rounded before the compare; oracle brute-forces
    the same rounded cross cosine and replays the anti-join."""
    from .spec import DecontaminateSpec

    spec = TableSpec(
        source_table="embeddings",
        target_table="emb_decontam",
        where="vec_id % 9 <> 0",
        mappings=[
            MappingSpec(source="vec_id", target="vec_id"),
            MappingSpec(source="label", target="label"),
            MappingSpec(source="embedding", target="embedding"),
        ],
        decontaminate=DecontaminateSpec(
            method="semantic",
            benchmark_table="embeddings",
            benchmark_where="vec_id % 9 = 0",
            id_column="vec_id",
            benchmark_id_column="vec_id",
            vector_column="embedding",
            threshold=0.4,
        ),
    )
    return _compile(spark, sf_dir, spec).select("vec_id", "label")


@query(
    "etl_decontaminate",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(len(ts) - 13 + 1),
               i -> array_to_string(ts[i+1:i+13], ' ')))) AS g
      FROM toks WHERE len(ts) >= 13
    ),
    flagged AS (
      SELECT DISTINCT a.doc_id
      FROM grams a JOIN grams b ON a.g = b.g
      WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
    )
    SELECT doc_id, lang FROM documents
    WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
)
def etl_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative eval decontamination
    (`decontaminate:` block, compiler.py): the YAML user drops training
    rows sharing any verbatim 13-gram with the benchmark slice
    (doc_id % 7 == 0 via benchmark_where) — rewrite → decontaminate →
    gate ordering, rejects routable to an audit table with match
    counts. Oracle replays gram expansion, flagging, and the anti
    join."""
    from .spec import DecontaminateSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_decontam",
        where="doc_id % 7 <> 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        decontaminate=DecontaminateSpec(
            benchmark_table="documents",
            benchmark_where="doc_id % 7 = 0",
            text_column="text",
            id_column="doc_id",
            benchmark_id_column="doc_id",
            ngram=13,
        ),
    )
    return _compile(spark, sf_dir, spec).select("doc_id", "lang")


@query(
    "etl_decontaminate_minhash",
    _SHINGLE_CTE
    + """
    , flagged AS (
      SELECT DISTINCT a.doc_id
      FROM sh a, sh b
      WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % 7 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
)
def etl_decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative NEAR-DUP decontamination
    (`decontaminate: {method: minhash}`, compiler.py): training rows
    whose exact Jaccard to any benchmark row (doc_id % 7 == 0) reaches
    0.8 are dropped — the reworded-copy catch the verbatim 13-gram rule
    misses (VERDICT r7 ask #6's declarative twin for the MinHash join
    path). LSH band candidates (128/32) exact-verified, so the oracle's
    brute-forced exact-Jaccard flag set coincides (miss probability
    < 1e-7, same argument as dedup_minhash_join)."""
    from .spec import DecontaminateSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_decontam_nd",
        where="doc_id % 7 <> 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        decontaminate=DecontaminateSpec(
            method="minhash",
            benchmark_table="documents",
            benchmark_where="doc_id % 7 = 0",
            text_column="text",
            id_column="doc_id",
            benchmark_id_column="doc_id",
            threshold=0.8,
            num_hashes=128,
            bands=32,
        ),
    )
    return _compile(spark, sf_dir, spec).select("doc_id", "lang")


@query(
    "etl_decontaminate_shared",
    _SHINGLE_CTE
    + """
    , flagged AS (
      SELECT DISTINCT a.doc_id
      FROM sh a, sh b
      WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % 7 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
    """,
)
def etl_decontaminate_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative minhash decontamination over a
    PERSISTED pair table (`decontaminate.pairs_table`, VERDICT r8 ask
    #6 — the decontaminate twin of `dedup.pairs_table`): the corpus'
    banded MinHash join ran ONCE (the suite's shared pair layout), and
    this consumer mounts it UNDIRECTED, re-deriving sidedness with two
    ids-only semi-joins (id_i → pipeline ids, id_j → where-filtered
    benchmark ids) — a job that both dedups and decontaminates pays one
    mining pass, and the text column is never read on this path. Same
    oracle as `etl_decontaminate_minhash`: the reused pair set must
    reproduce the inline cross-corpus mining exactly."""
    from .spec import DecontaminateSpec

    cache = _minhash_pairs_dir(spark, sf_dir)
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            # the pair layout mounts as a target-side table, the same
            # resolution path a production job uses for a prior sink
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="docs_decontam_shared",
        where="doc_id % 7 <> 0",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
        ],
        decontaminate=DecontaminateSpec(
            method="minhash",
            benchmark_table="documents",
            benchmark_where="doc_id % 7 = 0",
            id_column="doc_id",
            benchmark_id_column="doc_id",
            threshold=0.8,
            pairs_table="pairs",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select("doc_id", "lang")


@query(
    "etl_augment_pairs",
    f"""
    WITH pairs AS ({_span_corruption_sql(k=3, permille=150, seed="sc0")})
    SELECT d.doc_id, d.lang, p.input_text, p.target_text
    FROM documents d LEFT JOIN pairs p ON p.doc_id = d.doc_id
    """,
)
def etl_augment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative augmentation stage (`augment:`
    block, compiler.py): the YAML user attaches deterministic T5-style
    span-corruption pair columns to every outgoing row — in-row (no
    join/shuffle, streams per micro-batch), zero-token docs keep their
    row with NULL pair columns. Oracle replays the corruption and the
    keep-all-rows contract."""
    from .spec import AugmentSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_aug",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        augment=AugmentSpec(
            text_column="text",
            id_column="doc_id",
            span_tokens=3,
            mask_permille=150,
            seed="sc0",
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "lang", "input_text", "target_text"
    )


@query(
    "etl_cap_per_source",
    f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':capd')")},
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= 15
    """,
)
def etl_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative per-group frequency cap
    (`sample.method: cap`): the YAML user states "at most 15 docs per
    source" and the compiler emits the cap_per_group WindowGroupLimit
    plan (per-task pre-limit before the exchange). Oracle replays the
    portable hash order and the rank filter."""
    from .spec import SampleSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_capped",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="source", target="source"),
        ],
        sample=SampleSpec(
            method="cap",
            id_column="doc_id",
            group_column="source",
            cap=15,
            seed="capd",
        ),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_soft_dedup",
    _SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , pairs AS (
      SELECT a.doc_id AS id_i, b.doc_id AS id_j
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    ),
    edges AS (
      SELECT id_i AS src, id_j AS dst FROM pairs
      UNION
      SELECT id_j, id_i FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id, min(lbl) AS cl FROM reach GROUP BY id),
    sizes AS (SELECT cl, count(*)::BIGINT AS nd FROM comp GROUP BY cl)
    SELECT d.doc_id, d.lang, d.text,
           coalesce(c.cl, d.doc_id)::BIGINT AS cluster_id,
           coalesce(s.nd, 1)::BIGINT AS n_dups,
           round(1.0::DOUBLE / coalesce(s.nd, 1), 6) AS sample_weight
    FROM documents d
    LEFT JOIN comp c ON c.id = d.doc_id
    LEFT JOIN sizes s ON s.cl = c.cl
    """,
)
def etl_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative SOFT dedup (`dedup.method: soft`):
    the YAML user asks for reweight-not-remove and the compiler emits
    the MinHash pair/cluster machinery with every row shipping
    cluster_id/n_dups/sample_weight columns instead of losers being
    anti-joined away. Oracle replays exact pairs → transitive closure →
    reciprocal weights over the mapped projection."""
    spec = TableSpec(
        source_table="documents",
        target_table="docs_soft",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        dedup=DedupSpec(
            method="soft",
            text_column="text",
            id_column="doc_id",
            num_hashes=128,
            bands=32,
            threshold=0.8,
        ),
    )
    return _compile(spark, sf_dir, spec)


@query(
    "etl_soft_dedup_shared",
    _SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , pairs AS (
      SELECT a.doc_id AS id_i, b.doc_id AS id_j
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    ),
    edges AS (
      SELECT id_i AS src, id_j AS dst FROM pairs
      UNION
      SELECT id_j, id_i FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id, min(lbl) AS cl FROM reach GROUP BY id),
    sizes AS (SELECT cl, count(*)::BIGINT AS nd FROM comp GROUP BY cl)
    SELECT d.doc_id, d.lang, d.text,
           coalesce(c.cl, d.doc_id)::BIGINT AS cluster_id,
           coalesce(s.nd, 1)::BIGINT AS n_dups,
           round(1.0::DOUBLE / coalesce(s.nd, 1), 6) AS sample_weight
    FROM documents d
    LEFT JOIN comp c ON c.id = d.doc_id
    LEFT JOIN sizes s ON s.cl = c.cl
    """,
)
def etl_soft_dedup_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative soft dedup over a PERSISTED pair
    table (`dedup.pairs_table`, VERDICT r7 ask #5): the expensive
    banded MinHash join runs ONCE (the suite's shared pair layout —
    in production, a prior `minhash_near_dups` job's parquet sink) and
    every declarative consumer mounts it through the job's connectors
    instead of re-mining the corpus — soft dedup + preference pairs +
    cluster-safe split in one job pay one mining pass, not three.
    Same oracle as `etl_soft_dedup`: the reused pair set must produce
    the exact inline-mining result."""
    cache = _minhash_pairs_dir(spark, sf_dir)
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            # the pair layout mounts as a target-side table, the same
            # resolution path a production job uses for a prior sink
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="documents",
        target_table="docs_soft_shared",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        dedup=DedupSpec(
            method="soft",
            text_column="text",
            id_column="doc_id",
            pairs_table="pairs",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df


@query("etl_fim_pairs", _etl_fim_sql())
def etl_fim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative FIM augmentation
    (``augment: {method: fim}``, compiler.py → text.fim_exprs): a
    deterministic half of the outgoing rows serialized PSM-style
    (``<PRE>prefix<SUF>suffix<MID>`` → middle), the rest whole-text
    with a NULL target — the joint FIM+AR training mix, attached
    in-row inside the one-plan pipeline. Oracle replays the apply
    flags, cut points, and sentinel serialization byte-for-byte."""
    from .spec import AugmentSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_fim",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        augment=AugmentSpec(
            text_column="text",
            id_column="doc_id",
            method="fim",
            rate_permille=500,
            seed="fim0",
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "lang", "input_text", "target_text"
    )


@query(
    "etl_ccnet_gate",
    f"""
    WITH {_UNIGRAM_PPL_CTES}
    SELECT doc_id, lang FROM (
      SELECT d.doc_id, d.lang, lp.ppl,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY lp.ppl ASC NULLS LAST, d.doc_id) AS rn,
             count(*) OVER (PARTITION BY d.lang) AS n
      FROM documents d LEFT JOIN lp USING (doc_id)
    ) WHERE ppl IS NOT NULL AND rn * 1000 <= n * 750 + 999
    """,
)
def etl_ccnet_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative CCNet gate
    (``quality_filter: {method: ccnet}``, compiler.py): the YAML user
    keeps each LANGUAGE's lowest-perplexity 75% (head+middle of the
    CCNet buckets) — corpus-self unigram-LM score joined back by id,
    then the same rank-exact integer quota as top_fraction. Oracle
    replays the LM, the per-lang ordering (ppl asc == the compiled
    -ppl desc), and the quota arithmetic."""
    from .spec import QualityFilterSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_ccnet",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="text", target="text"),
        ],
        quality_filter=QualityFilterSpec(
            text_column="text",
            method="ccnet",
            top_fraction=0.75,
            id_column="doc_id",
            group_column="lang",
        ),
    )
    return _compile(spark, sf_dir, spec).select("doc_id", "lang")


@query(
    "etl_semdedup",
    _semdedup_chain_sql(16, 0.35)
    + """
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (
      SELECT o.vec_id FROM outp o JOIN keepers k USING (cluster_id)
      WHERE o.vec_id <> k.keeper
    )
    """,
)
def etl_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative cell-bounded semantic dedup
    (`dedup.method: semdedup`, compiler.py:_apply_dedup): the SemDeDup
    pipeline from YAML alone — deterministic cells, within-cell rounded
    cosine pairs, transitive groups, and the LEAST-prototypical
    survivor rule (the one declarative dedup method whose survivor is
    NOT the minimum id). The corpus frame is filtered with one ids-only
    anti-join against the loser set; rows without a usable vector
    (NULL/zero-norm) pass through untouched, the same contract as the
    standalone operator. Oracle: the shared value-exact SemDeDup chain,
    finalized as the surviving (vec_id, label) rows."""
    spec = TableSpec(
        source_table="embeddings",
        target_table="emb_semdedup",
        mappings=[
            MappingSpec(source="vec_id", target="vec_id"),
            MappingSpec(source="label", target="label"),
            MappingSpec(source="embedding", target="embedding"),
        ],
        dedup=DedupSpec(
            method="semdedup",
            vector_column="embedding",
            id_column="vec_id",
            threshold=0.35,
            n_centroids=16,
        ),
    )
    return _compile(spark, sf_dir, spec).select("vec_id", "label")


@query(
    "etl_semdedup_codebook",
    _semdedup_chain_sql(16, 0.35, cent_sql=_SEMDEDUP_LLOYD_CENT)
    + """
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (
      SELECT o.vec_id FROM outp o JOIN keepers k USING (cluster_id)
      WHERE o.vec_id <> k.keeper
    )
    """,
)
def etl_semdedup_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative SemDeDup on a TRAINED codebook
    (`dedup.centroids_table`, compiler.py:_apply_dedup — VERDICT r9
    ask #5): an `ivf_train` codebook persisted once (the layout-cache
    pattern) mounts through the job's connectors as the (cluster_id,
    centroid) cell table, so real corpora — whose ids don't start near
    0 — cluster on trained centroids instead of the deterministic
    `id < n_centroids` default; everything downstream (within-cell
    rounded-cosine pairs, transitive groups, the least-prototypical
    survivor) is the standard SemDeDup pipeline. Oracle: the shared
    value-exact SemDeDup chain seeded with the UNROLLED two-round Lloyd
    training (the emb_ivf_train replay), so codebook, assignment,
    pairs, clustering, and survivor choice all pin across engines."""
    import os as _os

    def _build(cache: str) -> None:
        e = _t(spark, sf_dir, "embeddings")
        __v = F.col("embedding").cast("array<double>")
        e = e.where(
            F.col("embedding").isNotNull()
            & (F.aggregate(__v, F.lit(0.0), lambda a, x: a + x * x)
               > F.lit(0.0))
        )
        similarity.ivf_train(
            e,
            n_centroids=_SEMDEDUP_CB_PARAMS["n_centroids"],
            iters=_SEMDEDUP_CB_PARAMS["iters"],
        ).write.mode("overwrite").parquet(_os.path.join(cache, "codebook"))

    cache = _cached_layout(
        env_var="SPARK_GRAFT_SEMDEDUP_CB_CACHE",
        default_dir="orion_etl_spark_semdedup_cb",
        sf_dir=sf_dir,
        marker_name="_SEMDEDUP_CB_OK",
        params=_SEMDEDUP_CB_PARAMS,
        src_name="embeddings.parquet",
        build=_build,
    )
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=sf_dir),
            target_files=FilesConnectorSpec(base_path=cache),
        )
    )
    spec = TableSpec(
        source_table="embeddings",
        target_table="emb_semdedup_cb",
        mappings=[
            MappingSpec(source="vec_id", target="vec_id"),
            MappingSpec(source="label", target="label"),
            MappingSpec(source="embedding", target="embedding"),
        ],
        dedup=DedupSpec(
            method="semdedup",
            vector_column="embedding",
            id_column="vec_id",
            threshold=0.35,
            centroids_table="codebook",
        ),
    )
    compiled = compile_table(JobContext(spark, g), spec)
    run_error_checks(compiled.df, compiled.error_checks)
    return compiled.df.select("vec_id", "label")


@query(
    "etl_doremi_sample",
    _mw_chain_sql(
        "SELECT source AS g, n_chars::DOUBLE AS loss FROM documents",
        0.002,
        0.01,
    )
    + _doremi_sample_tail_sql(300, "dm1"),
)
def etl_doremi_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative DoReMi sampling (`sample.method:
    doremi`, compiler.py): the YAML user hands a per-row excess-loss
    column (here n_chars as the proxy deficit, step size eta=0.002 to
    keep raw losses in the no-regret regime) and a row budget; the
    compiler learns the domain weights and keeps each source's
    hash-order prefix of its floor(weight · budget) allocation — the
    mixture family's fourth declarative member next to temperature,
    unimax, and epochs. Under --explain the stage is skipped with
    schema-preserving placeholder columns (the vector_transform rule).
    Oracle: the same unrolled MW chain over the n_chars losses + the
    sampling replay."""
    from .spec import SampleSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_doremi",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="source", target="source"),
            MappingSpec(source="n_chars", target="loss"),
        ],
        sample=SampleSpec(
            method="doremi",
            id_column="doc_id",
            group_column="source",
            loss_column="loss",
            budget_rows=300,
            eta=0.002,
            seed="dm1",
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "source", "domain_weight", "target_rows"
    )


@query(
    "etl_doremi_token_sample",
    _mw_chain_sql(
        "SELECT source AS g, n_chars::DOUBLE AS loss FROM documents",
        0.002,
        0.01,
    )
    + _doremi_token_tail_sql(10_000, "dt1"),
)
def etl_doremi_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative DoReMi TOKEN sampling
    (`sample.method: doremi_tokens`, compiler.py) — the YAML twin of
    `curation_doremi_token_sample`, completing the declarative mixture
    family's row/token symmetry (doremi ↔ doremi_tokens mirrors
    token_budget ↔ unimax): the spec hands a per-row excess-loss
    column (n_chars as the proxy, eta=0.002 like `etl_doremi_sample`)
    and a TOKEN budget; the compiler learns the domain weights and
    keeps each source's hash-order document prefix until its
    floor(weight · budget) token allocation fills. Under --explain the
    stage is skipped with three schema-preserving placeholder columns.
    Oracle: the unrolled MW chain over the n_chars losses + the
    token-budget replay (tokenizer, hash order, running-sum window,
    floor targets — all value-exact)."""
    from .spec import SampleSpec

    spec = TableSpec(
        source_table="documents",
        target_table="docs_doremi_tok",
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="source", target="source"),
            MappingSpec(source="text", target="text"),
            MappingSpec(source="n_chars", target="loss"),
        ],
        sample=SampleSpec(
            method="doremi_tokens",
            id_column="doc_id",
            group_column="source",
            loss_column="loss",
            text_column="text",
            budget_tokens=10_000,
            eta=0.002,
            seed="dt1",
        ),
    )
    return _compile(spark, sf_dir, spec).select(
        "doc_id", "source", "n_tokens", "domain_weight", "target_tokens"
    )


def _state_kmv_sql() -> str:
    """Oracle for the declarative nightly-state query: fold == full-
    history build (the KMV family property, pinned by the pipeline
    itself), so the oracle simply replays the ONE-SHOT bottom-16 KMV
    build + finalize over the whole slice."""
    hv = _hex2int_sql("substr(md5(CAST(user_id AS VARCHAR) || ':nk0'), 1, 15)")
    return f"""
    WITH e AS (SELECT DISTINCT event_type, user_id FROM events
               WHERE event_id % 20 = 0 AND user_id IS NOT NULL),
    dh AS (SELECT DISTINCT event_type, {hv} AS hv FROM e),
    bk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv, row_number() OVER (
          PARTITION BY event_type ORDER BY hv ASC) AS rn
        FROM dh
      ) WHERE rn <= 16
    )
    SELECT event_type, count(*)::BIGINT AS n_kept,
           (CASE WHEN count(*) < 16 THEN count(*)::DOUBLE
                 ELSE round(15 / (max(hv)::DOUBLE / 1152921504606846976.0), 0)
            END)::BIGINT AS approx_distinct
    FROM bk GROUP BY event_type
    """


@query("etl_state_kmv_nightly", _state_kmv_sql())
def etl_state_kmv_nightly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative MERGEABLE-STATE maintenance
    (``state:`` block, spec.AggStateSpec → operators/statemaint.py —
    VERDICT r11 ask #4): an ``incremental.mode: batch`` table loads a
    5% events slice over TWO nightly high-water-mark windows, and each
    run also appends one bounded bottom-16 KMV increment of distinct
    user_ids per event_type (the compiler's ``_write_state_increment``
    hook, mark-keyed overwrite). The returned frame is the ``--state``
    read side: every increment folded (layout-validated) and finalized
    to per-type distinct estimates. Fold == full-history build is the
    family property, so the oracle replays the one-shot KMV over the
    whole slice — any drift in the nightly wiring (missed window,
    double-counted replay, drifted layout) breaks the match. At 100 TB
    each night costs one map-side-combined aggregate over that night's
    rows; the lifetime state stays ≤ k longs per key with history
    never rescanned."""
    import os
    import tempfile

    from .compiler import run_table
    from .operators.statemaint import finalize_state_report
    from .spec import IncrementalSpec

    base = tempfile.mkdtemp(prefix="orion_state_kmv_")
    ev = (
        _t(spark, sf_dir, "events", fanout=False)
        .where(F.col("event_id") % 20 == 0)
        .select("event_id", "event_type", "user_id")
    )
    cut = int(ev.agg(F.max("event_id")).collect()[0][0]) // 2
    land = os.path.join(base, "src", "events_s")
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=os.path.join(base, "src")),
            target_files=FilesConnectorSpec(base_path=os.path.join(base, "out")),
        )
    )
    spec = TableSpec(
        source_table="events_s",
        target_table="events_loaded",
        write_mode="append",
        incremental=IncrementalSpec(
            watermark_column="event_id",
            state_path=os.path.join(base, "hwm.json"),
        ),
        mappings=[
            MappingSpec(source="event_id", target="event_id"),
            MappingSpec(source="event_type", target="event_type"),
            MappingSpec(source="user_id", target="user_id"),
        ],
        state={
            "kind": "kmv",
            "keys": ["event_type"],
            "value_column": "user_id",
            "k": 16,
            "seed": "nk0",
            "state_path": os.path.join(base, "aggstate"),
        },
    )
    for night in (
        ev.where(F.col("event_id") <= cut),
        ev.where(F.col("event_id") > cut),
    ):
        night.write.mode("append").parquet(land)
        run_table(JobContext(spark, g), spec)
    return finalize_state_report(spark, spec.state.state_path, spec.state)


def _state_sample_q_sql() -> str:
    """Oracle for the declarative sample+carry nightly-state query:
    fold == full-history build (the sample family property, pinned by
    the pipeline itself), so the oracle replays the ONE-SHOT bottom-24
    carried sample + nearest-rank quantile finalize over the whole
    slice."""
    hv = _hex2int_sql("substr(md5(CAST(doc_id AS VARCHAR) || ':sq1'), 1, 15)")
    return f"""
    WITH d AS (SELECT DISTINCT lang, doc_id, n_chars FROM documents
               WHERE doc_id % 5 = 0 AND doc_id IS NOT NULL),
    h AS (SELECT lang, doc_id, n_chars, {hv} AS hv FROM d),
    bk AS (SELECT lang, doc_id, n_chars FROM (
             SELECT lang, doc_id, n_chars, row_number() OVER (
               PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rn
             FROM h
           ) WHERE rn <= 24),
    r AS (SELECT lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM bk)
    SELECT lang, max(n)::BIGINT AS n_kept,
           min(CASE WHEN rn = CAST(ceil(0.5 * n) AS INT) THEN n_chars END)
             ::BIGINT AS q_0_5,
           min(CASE WHEN rn = CAST(ceil(0.9 * n) AS INT) THEN n_chars END)
             ::BIGINT AS q_0_9
    FROM r GROUP BY lang
    """


@query("etl_state_sample_quantiles", _state_sample_q_sql())
def etl_state_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative sample state WITH a carry
    (``state: {kind: sample, carry: [...]}``, spec.AggStateSpec →
    operators/statemaint.py): an ``incremental.mode: batch`` table
    loads a 20% documents slice over TWO nightly high-water-mark
    windows; each run appends one bounded bottom-24 id sample per lang
    CARRYING n_chars (a pure function of the doc — the carry
    contract). The returned frame is the ``--state`` read side, which
    a declared carry flips from panel to RANGE-FREE nearest-rank
    quantiles of the carried value (operators/aggstate.py:
    finalize_sample_quantiles) — per-lang length medians/p90 with no
    [lo, hi) bucket layout to declare or drift, the question
    ``kind: hist`` can't answer up front. Fold == full-history build
    is the family property, so the oracle replays the one-shot build
    over the whole slice — a missed window, double-counted replay, or
    drifted layout breaks the match. At 100 TB each night is one
    map-side-combined aggregate over that night's rows; the state
    stays ≤ k (id, carry) rows per key and the quantile window ranks
    the STATE, never the corpus."""
    import os
    import tempfile

    from .compiler import run_table
    from .operators.statemaint import finalize_state_report
    from .spec import IncrementalSpec

    base = tempfile.mkdtemp(prefix="orion_state_sq_")
    docs = (
        _t(spark, sf_dir, "documents", fanout=False)
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "lang", "n_chars")
    )
    cut = int(docs.agg(F.max("doc_id")).collect()[0][0]) // 2
    land = os.path.join(base, "src", "docs_s")
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=os.path.join(base, "src")),
            target_files=FilesConnectorSpec(base_path=os.path.join(base, "out")),
        )
    )
    spec = TableSpec(
        source_table="docs_s",
        target_table="docs_loaded",
        write_mode="append",
        incremental=IncrementalSpec(
            watermark_column="doc_id",
            state_path=os.path.join(base, "hwm.json"),
        ),
        mappings=[
            MappingSpec(source="doc_id", target="doc_id"),
            MappingSpec(source="lang", target="lang"),
            MappingSpec(source="n_chars", target="n_chars"),
        ],
        state={
            "kind": "sample",
            "keys": ["lang"],
            "value_column": "doc_id",
            "carry": ["n_chars"],
            "k": 24,
            "seed": "sq1",
            "quantiles": [0.5, 0.9],
            "state_path": os.path.join(base, "aggstate"),
        },
    )
    for night in (
        docs.where(F.col("doc_id") <= cut),
        docs.where(F.col("doc_id") > cut),
    ):
        night.write.mode("append").parquet(land)
        run_table(JobContext(spark, g), spec)
    return finalize_state_report(spark, spec.state.state_path, spec.state)


def _state_whist_sql(lo=0.0, hi=110000.0, nb=110, qs=(0.5, 0.9)) -> str:
    """Oracle for the declarative WEIGHTED-hist nightly-state query:
    fold == full-history build (element-wise integer bucket sums), so
    the oracle replays the one-shot weighted build + interpolated
    quantile finalize over the whole slice — bucket counts are
    quantity SUMS, so the quantiles are where the UNIT MASS sits."""
    w = (hi - lo) / nb
    qcols = ",\n           ".join(
        f"min(CASE WHEN cum >= {q}*n AND (cum - c) < {q}*n AND c > 0 "
        f"THEN round({lo} + {w}*(p + ({q}*n - (cum - c))/c), 6) END) "
        f"AS q_{str(q).replace('.', '_')}"
        for q in qs
    )
    return f"""
    WITH v AS (
      SELECT l_returnflag AS rflag,
             least(greatest(CAST(floor((l_extendedprice - {lo}) / {w})
                                 AS INT), 0), {nb - 1}) AS p,
             CAST(l_quantity AS BIGINT) AS qw
      FROM lineitem
      WHERE l_orderkey % 20 = 0 AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL
    ),
    bc AS (SELECT rflag, p, sum(qw)::BIGINT AS c FROM v GROUP BY 1, 2),
    cum AS (
      SELECT rflag, p, c,
             sum(c) OVER (PARTITION BY rflag ORDER BY p) AS cum,
             sum(c) OVER (PARTITION BY rflag) AS n
      FROM bc
    )
    SELECT rflag, n::BIGINT AS n,
           {qcols}
    FROM cum
    GROUP BY rflag, n
    """


@query("etl_state_weighted_hist", _state_whist_sql())
def etl_state_weighted_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[engine extension] Declarative WEIGHTED histogram state
    (``state: {kind: hist, weight_column: ...}``): an
    ``incremental.mode: batch`` table loads a 5% lineitem slice over
    TWO nightly high-water-mark windows; each run appends one bounded
    equi-width histogram increment of l_extendedprice per returnflag
    whose bucket counts SUM l_quantity — so the finalized quantiles
    answer "below what price does half the UNIT MASS sit", not "half
    the line items" (the few big-quantity lines carry the mass). The
    returned frame is the ``--state`` read side: increments folded by
    exact integer bucket sums and interpolated within the located
    bucket. Fold == full-history build (weight additivity), so the
    oracle replays the one-shot weighted build over the whole slice.
    At 100 TB each night is one map-side-combined (keys × occupied
    buckets) aggregate; the lifetime state is keys-sized forever."""
    import os
    import tempfile

    from .compiler import run_table
    from .operators.statemaint import finalize_state_report
    from .spec import IncrementalSpec

    base = tempfile.mkdtemp(prefix="orion_state_wh_")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice", "l_quantity")
    )
    cut = int(li.agg(F.max("l_orderkey")).collect()[0][0]) // 2
    land = os.path.join(base, "src", "li_s")
    g = GlobalSpec(
        connectors=ConnectorsSpec(
            source_files=FilesConnectorSpec(base_path=os.path.join(base, "src")),
            target_files=FilesConnectorSpec(base_path=os.path.join(base, "out")),
        )
    )
    spec = TableSpec(
        source_table="li_s",
        target_table="li_loaded",
        write_mode="append",
        incremental=IncrementalSpec(
            watermark_column="l_orderkey",
            state_path=os.path.join(base, "hwm.json"),
        ),
        mappings=[
            MappingSpec(source="l_orderkey", target="okey"),
            MappingSpec(source="l_linenumber", target="lnum"),
            MappingSpec(source="l_returnflag", target="rflag"),
            MappingSpec(source="l_extendedprice", target="price"),
            MappingSpec(source="l_quantity", target="qty"),
        ],
        state={
            "kind": "hist",
            "keys": ["rflag"],
            "value_column": "price",
            "weight_column": "qty",
            "lo": 0.0,
            "hi": 110000.0,
            "n_buckets": 110,
            "quantiles": [0.5, 0.9],
            "state_path": os.path.join(base, "aggstate"),
        },
    )
    for night in (
        li.where(F.col("l_orderkey") <= cut),
        li.where(F.col("l_orderkey") > cut),
    ):
        night.write.mode("append").parquet(land)
        run_table(JobContext(spark, g), spec)
    return finalize_state_report(spark, spec.state.state_path, spec.state)
