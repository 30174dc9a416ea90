"""Corpus-curation queries (SURVEY.md §2.11): sampling, mixing, splits, curricula, DoReMi, packing, composed curation pipelines.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, text
from .queries_shared import (
    ORACLE,
    _CONTAM_SHINGLE,
    _GATE_OVERLAP_SQL,
    _MW_REPETITION_PERDOC,
    _PACK_ORACLE_CTE,
    _QC_TRAINED_B,
    _QC_TRAINED_W,
    _QUALITY_SQL,
    _SHINGLE_CTE,
    _UNIGRAM_PPL_CTES,
    _balance_sql,
    _curate_sql,
    _curate_v2_sql,
    _doremi_sample_tail_sql,
    _doremi_token_tail_sql,
    _dsir_sql,
    _hex2int_sql,
    _leakage_sql,
    _length_balance_sql,
    _minhash_pairs_cached,
    _mw_chain_sql,
    _priority_sample_sql,
    _shard_plan_sql,
    _split_sql,
    _stable_ids_sql,
    _stratified_sql,
    _t,
    _unimax_alloc_ctes,
    _weighted_sample_sql,
    query,
)


@query("curation_split", _split_sql())
def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket train/val/test split
    (operators/curation.py) — portable md5 bucketing, reproduced
    bit-for-bit by the DuckDB oracle."""
    from .operators.curation import hash_split

    d = _t(spark, sf_dir, "documents")
    return hash_split(d, "doc_id").select("doc_id", "bucket", "split")


@query(
    "curation_contamination",
    f"""
    WITH corp AS ({_CONTAM_SHINGLE.format(cols="doc_id,", pred="doc_id % 20 <> 0")}),
    bench AS (
      SELECT DISTINCT unnest(shs) AS sh
      FROM ({_CONTAM_SHINGLE.format(cols="", pred="doc_id % 20 = 0")})
    ),
    post AS (SELECT doc_id, unnest(shs) AS sh FROM corp)
    SELECT p.doc_id,
           count(*) AS n_shingles,
           coalesce(sum(CASE WHEN b.sh IS NOT NULL THEN 1 END), 0)::BIGINT AS n_matched,
           round(coalesce(sum(CASE WHEN b.sh IS NOT NULL THEN 1 END), 0)::DOUBLE
                 / count(*), 6) AS contamination
    FROM post p LEFT JOIN bench b ON p.sh = b.sh
    GROUP BY 1
    """,
)
def curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (operators/curation.py): fraction
    of each corpus doc's distinct 5-gram shingles that appear anywhere
    in a held-out 'benchmark' subset (docs with id % 20 == 0)."""
    from .operators.curation import contamination_check

    d = _t(spark, sf_dir, "documents", fanout=True)
    return contamination_check(
        d.filter(F.col("doc_id") % 20 != 0),
        d.filter(F.col("doc_id") % 20 == 0),
        id_col="doc_id",
        text_col="text",
        shingle_n=5,
    )


@query("curation_weighted_sample", _weighted_sample_sql())
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing (operators/curation.py): per-language
    keep rates applied via portable md5 buckets — the corpus-mix
    up/down-weighting step, reproduced bit-for-bit by the oracle."""
    from .operators.curation import weighted_sample

    d = _t(spark, sf_dir, "documents")
    rates = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.25}
    return weighted_sample(
        d, "doc_id", "lang", rates, seed="mix0", default_rate=0.1
    ).select("doc_id", "lang", "source")


@query(
    "curation_quality_cutoff",
    """
    WITH q AS (
      SELECT doc_id, lang,
             round(0.3 * (CASE WHEN length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                                    / greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1)
                               BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / greatest(length(text), 1))
                 + 0.2 * (1 - least((length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                                     / greatest(length(text), 1)) * 5, 1.0))
                 + 0.2 * (CASE WHEN length(text) >= 100 THEN 1.0 ELSE length(text) / 100.0 END),
               6) AS quality
      FROM documents
    ),
    cut AS (SELECT lang, quantile_cont(quality, 0.5) AS cutoff FROM q GROUP BY 1)
    SELECT q.doc_id, q.lang, q.quality, round(cut.cutoff, 6) AS cutoff
    FROM q JOIN cut USING (lang)
    WHERE q.quality >= cut.cutoff
    """,
)
def curation_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile gate — THE corpus-curation
    percentile query at 100 TB (keep each language's top half by
    quality score). Exact `percentile` here as the oracle gate (DuckDB
    `quantile_cont` is the same linear-interpolated definition); the
    cutoff table is per-language (5 rows) and broadcast-joins back, so
    the corpus is scanned twice but shuffled never. The scale variant
    swaps in `approx_percentile` for the cutoff aggregate — same plan
    shape, bounded memory (see agg_approx_percentiles)."""
    d = _t(spark, sf_dir, "documents")
    q_df = text.quality_score(d, "text", "doc_id").select("doc_id", "quality")
    scored = d.select("doc_id", "lang").join(q_df, "doc_id")
    cuts = scored.groupBy("lang").agg(
        F.expr("percentile(quality, 0.5)").alias("__cut")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .filter(F.col("quality") >= F.col("__cut"))
        .select(
            "doc_id", "lang", "quality", F.round("__cut", 6).alias("cutoff")
        )
    )


@query("corpus_curate", _curate_sql())
def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship curation composition (operators/curation.py:
    curate_corpus): fingerprint dedup → quality gate ≥ 0.5 → per-lang
    mixing (en 1.0 / zh 0.5 / default 0.8) → 90/5/5 split — one
    Catalyst plan, oracled end-to-end."""
    from .operators.curation import curate_corpus

    d = _t(spark, sf_dir, "documents", fanout=True)
    return curate_corpus(
        d,
        id_col="doc_id",
        text_col="text",
        group_col="lang",
        quality_min=0.5,
        rates={"en": 1.0, "zh": 0.5},
        default_rate=0.8,
        seed="c0",
    )


@query("curation_stratified_sample", _stratified_sql())
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-language sampling (operators/curation.py:
    stratified_sample): exactly 40 docs per lang, deterministic portable-
    hash order — WindowGroupLimit keeps the shuffle at O(groups × k)."""
    d = _t(spark, sf_dir, "documents")
    from .operators.curation import stratified_sample

    return stratified_sample(d, "doc_id", "lang", 40).select("doc_id", "lang")


@query("curation_split_leakage", _leakage_sql())
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test-leakage audit (operators/curation.py:split_leakage):
    duplicate-content clusters straddling the hash_split boundary — the
    pre-training integrity check that id-keyed splitting alone cannot
    guarantee."""
    d = _t(spark, sf_dir, "documents")
    from .operators.curation import split_leakage

    return split_leakage(d, "doc_id", "text")


@query("curation_stable_ids", _stable_ids_sql())
def curation_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Dense 0..n−1 example indices in deterministic global hash
    order (operators/curation.py:assign_stable_ids) WITHOUT the
    single-partition global window: fixed hash-range slices rank
    locally and add a broadcast prefix-sum offset — bit-identical to
    the oracle's global row_number, executed across n_buckets
    reducers."""
    from .operators.curation import assign_stable_ids

    d = _t(spark, sf_dir, "documents")
    return assign_stable_ids(d.select("doc_id"), "doc_id", n_buckets=64)


@query("curation_balance_groups", _balance_sql())
def curation_balance_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Class balancing (operators/curation.py:balance_groups):
    every language downsampled to the minority language's size, rows
    chosen by the portable md5 rank — the label-balancing shape for
    skewed corpora, bit-replayed by the oracle."""
    from .operators.curation import balance_groups

    d = _t(spark, sf_dir, "documents")
    return balance_groups(d.select("doc_id", "lang"), "doc_id", "lang")


@query(
    "pack_training_sequences",
    _PACK_ORACLE_CTE
    + """
    SELECT doc_id, n_tokens, shard, bin_id FROM packed
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/chunking.py:pack_sequences): greedy
    next-fit of documents into 512-token training bins within 8
    deterministic md5 shards. The sequential fold is replayed verbatim
    by the oracle's recursive CTE, so every bin assignment is
    bit-checked. Only (id, token-count) pairs ever shuffle."""
    d = _t(spark, sf_dir, "documents")
    from .operators.chunking import pack_sequences

    return pack_sequences(
        d, "text", "doc_id", budget=512, n_shards=8, seed="pack0"
    )


@query(
    "pack_bin_stats",
    _PACK_ORACLE_CTE
    + """
    SELECT shard, bin_id,
           CAST(count(*) AS INT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS fill,
           round(sum(n_tokens) / 512.0, 6) AS utilization
    FROM packed GROUP BY 1, 2
    """,
)
def pack_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-level packing report (operators/chunking.py:pack_stats):
    docs per bin, token fill, and utilization against the 512 budget —
    the waste metric that tunes budget/shard settings before a 100 TB
    packing run."""
    d = _t(spark, sf_dir, "documents")
    from .operators.chunking import pack_sequences, pack_stats

    packed = pack_sequences(
        d, "text", "doc_id", budget=512, n_shards=8, seed="pack0"
    )
    return pack_stats(packed, budget=512)


@query(
    "curation_sample_n",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':samp0')")
    + """ AS ord
      FROM documents
    ) ORDER BY ord, doc_id LIMIT 40
    """,
)
def curation_sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact-N deterministic sample
    (operators/curation.py:sample_n): the same 40 documents on every
    run, engine, and partitioning — TakeOrderedAndProject on a portable
    md5 order, no corpus shuffle. The oracle replays the hash order
    bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    from .operators.curation import sample_n

    return sample_n(d.select("doc_id", "lang"), "doc_id", 40)


@query("curation_priority_sample", _priority_sample_sql())
def curation_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact-k weighted sampling without replacement
    (operators/curation.py:priority_sample, Efraimidis-Spirakis A-ES):
    the 60 docs with the largest u^(1/n_chars) priority for the
    portable-md5 uniform u — longer docs proportionally likelier, the
    identical 60 on any engine. TakeOrderedAndProject; nothing
    shuffles the corpus."""
    from .operators.curation import priority_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return priority_sample(d, "doc_id", "n_chars", 60, seed="prio0")


@query(
    "curation_unimax_mixture",
    "WITH "
    + _unimax_alloc_ctes(50_000, 2)
    + """
    SELECT source, n_tokens, cap_tokens, alloc_tokens, epochs FROM alloc
    """,
)
def curation_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] UniMax epoch-capped mixture allocation
    (operators/curation.py:unimax_mixture): a 50k-token budget split as
    uniformly as possible across the document sources with no source
    repeated past 2 epochs — closed-form integer water-filling (level =
    exact long division over cap-sorted prefix sums, remainder dealt
    deterministically), so allocations sum to min(budget, total
    capacity) exactly. One corpus aggregate; everything downstream is
    bounded by the source count, rank/prefix via the windowless
    inclusive self-join. Oracle replays the same integer closed form
    over DuckDB window prefix sums."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens
    from .operators.curation import unimax_mixture

    withtok = d.select(
        "source",
        F.coalesce(
            F.when(F.col("text").isNotNull(), F.size(_tokens(F.col("text")))),
            F.lit(0),
        )
        .cast("long")
        .alias("__ntok"),
    )
    return unimax_mixture(
        withtok, "source", "__ntok", total_budget=50_000, max_epochs=2
    )


@query(
    "curation_mixture_reweight",
    _mw_chain_sql(_MW_REPETITION_PERDOC, 0.5, 0.01)
    + """
    SELECT gs[i+1] AS source, ns[i+1] AS n_examples,
           ls[i+1] AS avg_excess_loss, round(w[i+1], 6) AS weight
    FROM (SELECT gs, ns, ls, w, unnest(range(k)) AS i FROM r8)
    """,
)
def curation_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DoReMi-style domain mixture reweighting
    (operators/curation.py:mixture_reweight): per-source excess-loss
    proxies (here the repetition deficit 1 − unique/total tokens — any
    proxy-minus-reference loss column works) drive 8 linearized
    multiplicative-weights rounds with uniform smoothing, yielding the
    mixture recipe that up-weights the domains the model is furthest
    behind on. Completes the mixture family next to temperature,
    UniMax, and DSIR. The oracle UNROLLS all 8 rounds over the
    (group ASC NULLS LAST)-ordered domain lists — linearized update =
    pure IEEE arithmetic, so every intermediate weight matches
    bit-exactly (the documented reason the update is w·(1+ηL), not
    exp(ηL): libm exp carries no cross-engine guarantee). ONE corpus
    aggregate; the iteration is driver arithmetic on k doubles."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens
    from .operators.curation import mixture_reweight

    tk = _tokens(F.col("text"))
    loss = F.when(
        F.col("text").isNotNull() & (F.size(tk) > 0),
        F.lit(1.0) - F.size(F.array_distinct(tk)) / F.size(tk),
    )
    scored = d.select(F.col("source"), loss.alias("__loss"))
    return mixture_reweight(
        scored, "source", "__loss", eta=0.5, rounds=8, smoothing=0.01
    )


@query(
    "curation_token_budget",
    """
    SELECT doc_id, lang, n_tokens FROM (
      SELECT doc_id, lang, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''))::BIGINT AS n_tokens,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':tb0')")
    + """ AS ord
        FROM documents
      )
    ) WHERE cb < 2000
    """,
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group token-budget sampling
    (operators/curation.py:token_budget_sample): each language
    contributes documents in portable-hash order until 2000 tokens are
    reached — the mixture-recipe primitive ("N tokens per source", not
    "N percent of rows"). The oracle replays the running-sum window
    over the same hash order and tokenizer."""
    d = _t(spark, sf_dir, "documents")
    from .operators.curation import token_budget_sample

    return token_budget_sample(d, "text", "doc_id", "lang", 2000).select(
        "doc_id", "lang", "n_tokens"
    )


@query(
    "curation_temperature_mix",
    """
    WITH c AS (SELECT lang AS g, count(*) AS n FROM documents GROUP BY lang),
    w AS (SELECT g, n, CAST(floor(sqrt(n) * 1000) AS BIGINT) AS wt FROM c),
    s AS (SELECT sum(wt)::BIGINT AS sw FROM w),
    thr AS (
      SELECT g, least(1000, CAST(floor((300 * 1000.0 * wt) / (sw::DOUBLE * n))
                                 AS BIGINT)) AS t
      FROM w, s
    )
    SELECT d.doc_id, d.lang FROM documents d
    JOIN thr ON thr.g IS NOT DISTINCT FROM d.lang
    WHERE """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':tm0')")
    + """ % 1000 < thr.t
    """,
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Temperature-based corpus mixing
    (operators/curation.py:temperature_mix): per-language sampling
    rates derived in-plan from n_lang^0.5 (small languages up-weighted
    vs natural share), scaled to an expected 300-row budget, rows kept
    by the portable md5 filter. Weights integerized via
    floor(sqrt(n)*1000) so the oracle reproduces the exact threshold —
    sqrt is IEEE-correctly-rounded in every engine, pow is not."""
    from .operators.curation import temperature_mix

    d = _t(spark, sf_dir, "documents")
    return temperature_mix(
        d, "doc_id", "lang", budget_rows=300, alpha=0.5
    ).select("doc_id", "lang")


@query("corpus_curate_v2", _curate_v2_sql())
def corpus_curate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The modern LLM-corpus pipeline composed as ONE plan, built
    entirely from this round's operators: cross-document repeated-span
    removal (operators/dedup.py:repeated_span_dedup) -> hashing-trick
    quality gate with TRAINED weights on the REWRITTEN text
    (text.hashed_linear_score(weights=...)) -> temperature mixing by
    language over the kept rows (curation.temperature_mix) -> hash
    split (curation.hash_split). Returns (doc_id, lang, qc_score,
    split). Shuffle budget: the span hot-set aggregate + reassembly,
    two id-joins, the tiny mixing aggregates (broadcast), and the
    zero-shuffle gate/split projections — at 100 TB every corpus-wide
    exchange carries ids/hashes or is the one unavoidable rewrite.
    The oracle replays all four stages unrolled."""
    from .operators.curation import hash_split, temperature_mix

    d = _t(spark, sf_dir, "documents", fanout=True)
    rewritten = dedup.repeated_span_dedup(
        d, "text", "doc_id", span_tokens=3, min_docs=2
    ).select("doc_id", "new_text")
    scored = text.hashed_linear_score(
        rewritten, "new_text", "doc_id",
        weights=_QC_TRAINED_W, bias=_QC_TRAINED_B,
    ).select("doc_id", "qc_score")
    kept = (
        rewritten.join(scored, "doc_id")
        .join(d.select("doc_id", "lang"), "doc_id")
        .filter(F.col("qc_score") >= 0.5)
        .select("doc_id", "lang", "qc_score")
    )
    mixed = temperature_mix(
        kept, "doc_id", "lang", budget_rows=150, alpha=0.5, seed="tmv2"
    )
    return hash_split(mixed, "doc_id", seed="s2").select(
        "doc_id", "lang", "qc_score", "split"
    )


@query(
    "curation_epoch_mix",
    """
    WITH h AS (
      SELECT doc_id, lang,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':ep1')")
    + """ % 1000 AS b
      FROM documents
    ),
    nc AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 1 WHEN 'de' THEN 0
                       ELSE 1 END
             + CASE WHEN b < (CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 0
                                        WHEN 'de' THEN 400 ELSE 0 END)
                    THEN 1 ELSE 0 END AS n
      FROM h
    )
    SELECT doc_id, lang, CAST(unnest(range(n)) AS INTEGER) AS epoch
    FROM nc WHERE n >= 1
    """,
)
def curation_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Epoch-based corpus mixing
    (operators/curation.py:epoch_mix): the LLaMA-style per-source epoch
    table applied directly — en×2.5 (full corpus twice + a
    deterministic half), fr×1, de×0.4 (subsample), everything else ×1 —
    each copy tagged with its epoch index. Zero-shuffle: literal CASE +
    in-row sequence explode + portable-hash remainder filter. Oracle
    replays the integerized thresholds and range-unnest."""
    from .operators import curation

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return curation.epoch_mix(
        d, "doc_id", "lang",
        epochs={"en": 2.5, "fr": 1.0, "de": 0.4},
        default_epochs=1.0,
        seed="ep1",
    )


@query(
    "curation_top_fraction",
    """
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ) WHERE rn * 1000 <= n * 300 + 999
    """,
)
def curation_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group adaptive quality gate
    (operators/curation.py:keep_top_fraction): keep the best 30% of
    EVERY language by length score — rank-exact with an integer
    per-mille quota (rn*1000 <= n*300+999 ⟺ rn <= ceil(0.3 n)), so no
    float threshold can flip a boundary row between engines. One
    group-keyed window shuffle serves both the rank and the count."""
    from .operators import curation

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return curation.keep_top_fraction(
        d, "doc_id", "lang", "n_chars", fraction=0.3
    )


@query(
    "curation_kfold",
    """
    SELECT doc_id, lang,
           CAST("""
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':cv1')")
    + """ % 5 AS INTEGER) AS fold
    FROM documents
    """,
)
def curation_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] K-fold CV assignment (operators/curation.py:hash_kfold):
    deterministic fold in [0,5) from the portable md5 hash — appends
    land at 1/k without reshuffling old rows; zero-shuffle projection.
    Oracle replays the identical hash-mod."""
    from .operators.curation import hash_kfold

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_kfold(d, "doc_id", k=5, seed="cv1")


@query(
    "curation_mix_preview",
    """
    WITH h AS (
      SELECT doc_id, lang,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':ep1')")
    + """ % 1000 AS b,
             CASE lang WHEN 'en' THEN 2 WHEN 'fr' THEN 1 WHEN 'de' THEN 0
                       ELSE 1 END AS fe,
             CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 0
                       WHEN 'de' THEN 400 ELSE 0 END AS fp
      FROM documents
    )
    SELECT lang AS grp, count(*)::BIGINT AS n_rows,
           max(fe) AS full_epochs, max(fp) AS frac_per_mille,
           sum(CASE WHEN b < fp THEN 1 ELSE 0 END)::BIGINT AS frac_rows,
           (count(*) * max(fe)
            + sum(CASE WHEN b < fp THEN 1 ELSE 0 END))::BIGINT AS out_rows
    FROM h GROUP BY lang
    """,
)
def curation_mix_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact epoch-mix dry run
    (operators/curation.py:epoch_mix_preview): per-language input rows,
    whole epochs, fractional threshold, and the EXACT output count the
    materializing epoch_mix run (same seed/params as curation_epoch_mix)
    will produce — one tiny aggregate, no explode. The deterministic
    hash makes the preview a guarantee, not an estimate."""
    from .operators.curation import epoch_mix_preview

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return epoch_mix_preview(
        d, "doc_id", "lang",
        epochs={"en": 2.5, "fr": 1.0, "de": 0.4},
        default_epochs=1.0,
        seed="ep1",
    )


@query(
    "curation_curriculum_order",
    f"""
    WITH q AS (
      SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM documents
    )
    SELECT doc_id, lang, quality,
           (row_number() OVER (ORDER BY quality DESC, doc_id) - 1)::BIGINT
             AS curriculum_idx,
           ntile(4) OVER (ORDER BY quality DESC, doc_id) AS phase
    FROM q
    """,
)
def curation_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Curriculum schedule over the documents corpus
    (operators/curation.py:curriculum_order): every doc gets a
    deterministic global curriculum index ordered easy→hard by the
    heuristic quality score (rounded before ranking, doc_id tiebreak)
    and a 1-4 phase bucket — both via the two-phase global rank, so
    the schedule is reproducible on any cluster and never funnels the
    corpus through a single sort task. The oracle replays with plain
    row_number/ntile windows."""
    from .operators.curation import curriculum_order
    from .operators.text import quality_expr

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", F.round(quality_expr(F.col("text")), 6).alias("quality")
    )
    return curriculum_order(scored, "doc_id", "quality", phases=4)


@query(
    "curation_uncertainty_sample",
    "WITH scored AS ("
    + ORACLE["text_quality_classifier_trained"]
    + """
    )
    SELECT doc_id, qc_score, round(abs(qc_score - 0.5), 6) AS margin
    FROM scored
    WHERE qc_score IS NOT NULL
    ORDER BY margin ASC, doc_id ASC
    LIMIT 25
    """,
)
def curation_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Active-learning annotation batch
    (operators/curation.py:uncertainty_sample): the 25 documents the
    TRAINED quality classifier is least sure about (score nearest 0.5,
    margin rounded before ranking, doc_id tiebreak) — the rows to send
    for human labels before the next training round. Zero-shuffle
    scoring projection + TakeOrderedAndProject; the oracle reuses the
    trained-classifier replay verbatim as a CTE."""
    from .operators.curation import uncertainty_sample

    d = _t(spark, sf_dir, "documents")
    scored = text.hashed_linear_score(
        d, "text", "doc_id", weights=_QC_TRAINED_W, bias=_QC_TRAINED_B
    ).select("doc_id", "qc_score")
    return uncertainty_sample(scored, "doc_id", "qc_score", 25)


@query(
    "curation_preference_pairs",
    _SHINGLE_CTE
    + f"""
    , pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    ),
    q AS (SELECT doc_id, {_QUALITY_SQL} AS q FROM documents)
    SELECT CASE WHEN qi.q > qj.q OR (qi.q = qj.q AND p.i < p.j)
                THEN p.i ELSE p.j END AS chosen_id,
           CASE WHEN qi.q > qj.q OR (qi.q = qj.q AND p.i < p.j)
                THEN p.j ELSE p.i END AS rejected_id,
           greatest(qi.q, qj.q) AS chosen_quality,
           least(qi.q, qj.q) AS rejected_quality,
           round(abs(qi.q - qj.q), 6) AS margin
    FROM pairs p
    JOIN q qi ON qi.doc_id = p.i
    JOIN q qj ON qj.doc_id = p.j
    """,
)
def curation_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Synthetic preference pairs from near-duplicates: every
    MinHash near-dup pair becomes a (chosen, rejected) example — the
    higher heuristic-quality twin is 'chosen' (lower doc_id on exact
    ties, so the labeling is deterministic) with the quality margin
    attached for margin-weighted DPO-style losses. Reuses the
    layout-cached pair set (the expensive banded join runs ONCE per sf
    across the whole suite); the quality side is a skinny
    (doc_id, score) projection joined twice by id. Oracle brute-forces
    the exact-Jaccard pairs (the 128/32 LSH argument from
    dedup_minhash) and replays the labeling."""
    pairs = _minhash_pairs_cached(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", F.round(text.quality_expr(F.col("text")), 6).alias("q")
    )
    j = (
        pairs.select("id_i", "id_j")
        .join(q.withColumnsRenamed({"doc_id": "id_i", "q": "qi"}), "id_i")
        .join(q.withColumnsRenamed({"doc_id": "id_j", "q": "qj"}), "id_j")
    )
    first_chosen = (F.col("qi") > F.col("qj")) | (
        (F.col("qi") == F.col("qj")) & (F.col("id_i") < F.col("id_j"))
    )
    return j.select(
        F.when(first_chosen, F.col("id_i")).otherwise(F.col("id_j")).alias("chosen_id"),
        F.when(first_chosen, F.col("id_j")).otherwise(F.col("id_i")).alias("rejected_id"),
        F.greatest("qi", "qj").alias("chosen_quality"),
        F.least("qi", "qj").alias("rejected_quality"),
        F.round(F.abs(F.col("qi") - F.col("qj")), 6).alias("margin"),
    )


@query(
    "curation_cap_per_source",
    f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':cap0')")},
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def curation_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-source frequency cap
    (operators/curation.py:cap_per_group): at most 20 documents per
    source, chosen by portable-hash order with doc_id tiebreak — the
    "max N docs per domain" web-curation rule that stops one
    crawler-friendly host from dominating the corpus. The constant cap
    compiles to WindowGroupLimit (per-task pre-limit BEFORE the
    exchange — the shuffle carries at most cap × groups × tasks rows);
    the oracle replays the hash order and the rank filter."""
    from .operators.curation import cap_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return cap_per_group(d, "doc_id", "source", cap=20)


@query("curation_dsir_select", _dsir_sql())
def curation_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DSIR importance selection
    (operators/curation.py:dsir_select): score every raw-pool document
    (doc_id % 11 != 0) by its hashed-n-gram log importance weight
    against the 'high-quality target' slice (doc_id % 11 == 0) — uni+
    bigrams hashed into 1024 portable-md5 buckets, add-one smoothing,
    per-bucket log-ratios integerized to micro-nats so the per-doc
    score is an exact integer sum — and keep the top 100. Two bucket-
    count aggregates fold into ONE broadcast weight row; scoring is a
    zero-shuffle in-row fold; top-k is TakeOrderedAndProject. The
    oracle recomputes the weights and replays the selection."""
    from .operators.curation import dsir_select

    # repartition before the md5-heavy gram passes: the raw scan's
    # partition count is a file-size artifact (1 task at sf0.1 would
    # hash every gram single-threaded; at real scale the scan already
    # has thousands of partitions)
    d = _t(spark, sf_dir, "documents", fanout=True).repartition(F.col("doc_id"))
    return dsir_select(
        d.filter(F.col("doc_id") % 11 != 0),
        d.filter(F.col("doc_id") % 11 == 0),
        "doc_id",
        "text",
        k=100,
        n_features=1024,
    )


@query(
    "curation_rank_ensemble",
    f"""
    WITH sc AS (
      SELECT doc_id,
             {_QUALITY_SQL} AS q_score,
             CASE WHEN len(ws) > 0 THEN
               round(206.835
                     - 1.015 * (len(ws) / greatest(len(regexp_extract_all(
                         text, '[.!?]+')), 1)::DOUBLE)
                     - 84.6 * (len(regexp_extract_all(lower(text),
                         '[aeiouy]+')) / len(ws)::DOUBLE), 4)
             END AS flesch
      FROM (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents
      )
    ),
    n AS (SELECT count(q_score)::BIGINT AS nq, count(flesch)::BIGINT AS nf
          FROM sc),
    r AS (
      SELECT doc_id, q_score, flesch,
             row_number() OVER (ORDER BY q_score ASC, doc_id) AS rq,
             row_number() OVER (ORDER BY flesch ASC NULLS LAST, doc_id) AS rf
      FROM sc
    ),
    pos AS (
      -- positions + mean in exact integer micro-units (round-half-up
      -- via (2a+b)//2b), mirroring the operator: the mean of two 6-dp
      -- positions lands exactly on the 7th-digit half, where double
      -- round() is engine-dependent
      SELECT doc_id, q_score, flesch,
             CASE WHEN q_score IS NOT NULL THEN
               CASE WHEN n.nq > 1
                    THEN ((rq - 1) * 2000000 + (n.nq - 1)) // (2 * (n.nq - 1))
                    ELSE 500000 END
             END AS uq,
             CASE WHEN flesch IS NOT NULL THEN
               CASE WHEN n.nf > 1
                    THEN ((rf - 1) * 2000000 + (n.nf - 1)) // (2 * (n.nf - 1))
                    ELSE 500000 END
             END AS uf
      FROM r, n
    )
    SELECT doc_id, q_score, flesch,
           (uq / 1000000.0) AS q_score_rank,
           (uf / 1000000.0) AS flesch_rank,
           CASE WHEN (uq IS NOT NULL OR uf IS NOT NULL)
                THEN (((coalesce(uq, 0) + coalesce(uf, 0)) * 2
                       + ((uq IS NOT NULL)::INT + (uf IS NOT NULL)::INT))
                      // (2 * ((uq IS NOT NULL)::INT + (uf IS NOT NULL)::INT)))
                     / 1000000.0
           END AS ensemble_score
    FROM pos
    """,
)
def curation_rank_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Rank-normalized quality-signal ensemble
    (operators/curation.py:rank_ensemble): the heuristic quality score
    and the Flesch readability — two signals on incomparable scales —
    each mapped to its global normalized rank position (row_number with
    doc_id tiebreak, (rank-1)/(n-1)) and averaged into one
    ensemble_score. Each rank is the two-phase global row number
    (ranks.py — never a single-partition sort); the oracle replays with
    plain SQL windows."""
    from .operators.curation import rank_ensemble
    from .operators.text import quality_expr, readability_scores

    d = _t(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", F.round(quality_expr(F.col("text")), 6).alias("q_score")
    )
    r = readability_scores(d, "text", "doc_id").select("doc_id", "flesch")
    return rank_ensemble(q.join(r, "doc_id"), "doc_id", ["q_score", "flesch"])


@query(
    "curation_cluster_safe_split",
    _SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + f"""
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
    lab AS (
      SELECT d.doc_id, d.lang,
             coalesce(c.cl, d.doc_id)::BIGINT AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, lang, cluster_id,
           CASE WHEN ({_hex2int_sql("md5(CAST(cluster_id AS VARCHAR) || ':css0')")}) % 1000 < 900 THEN 'train'
                WHEN ({_hex2int_sql("md5(CAST(cluster_id AS VARCHAR) || ':css0')")}) % 1000 < 950 THEN 'val'
                ELSE 'test' END AS split
    FROM lab
    """,
)
def curation_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Leakage-proof split
    (operators/curation.py:cluster_safe_split): the split label hashes
    the near-dup CLUSTER id, so every member of a duplicate group lands
    in the same split — a test doc whose near-twin sits in train is
    memorization leakage; `curation_split_leakage` detects it, this
    prevents it. Reuses the layout-cached MinHash pair set; components
    over the edge-connected subset only, one id-keyed corpus join, then
    the zero-shuffle hash-split projection. Oracle replays closure +
    portable-hash thresholds."""
    from .operators.curation import cluster_safe_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = _minhash_pairs_cached(spark, sf_dir)
    return cluster_safe_split(d, "doc_id", pairs)


@query(
    "curation_ccnet_buckets",
    f"""
    WITH {_UNIGRAM_PPL_CTES},
    scored AS (
      SELECT d.doc_id, d.lang, lp.ppl AS ppl_proxy
      FROM documents d JOIN lp USING (doc_id)
    ),
    cuts AS (
      SELECT lang,
             quantile_cont(ppl_proxy, 0.25) AS c1,
             quantile_cont(ppl_proxy, 0.75) AS c2
      FROM scored GROUP BY 1
    )
    SELECT s.doc_id, s.lang, s.ppl_proxy,
           round(c.c1, 4) AS cut_head,
           round(c.c2, 4) AS cut_tail,
           CASE WHEN s.ppl_proxy <= c.c1 THEN 'head'
                WHEN s.ppl_proxy <= c.c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored s JOIN cuts c USING (lang)
    """,
)
def curation_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] CCNet-style per-language perplexity bucketing
    (operators/curation.py:ccnet_buckets, after Wenzek et al. 2020):
    every doc scored by the corpus-self unigram LM perplexity proxy,
    each LANGUAGE cut at its own 0.25/0.75 perplexity quantiles
    (binary-exact fractions — the interpolation index is exact, so
    DuckDB's quantile_cont replays the cutoffs bit-for-bit), docs
    labeled head/middle/tail — the keep/re-examine/drop curation gate.
    LM scoring is two word-count shuffles + a vocabulary join; the
    cutoff table is languages-sized and broadcast back, so the corpus
    never shuffles after scoring."""
    from .operators.curation import ccnet_buckets

    d = _t(spark, sf_dir, "documents")
    return ccnet_buckets(d, "doc_id", "text", "lang")


@query("curation_shard_plan", _shard_plan_sql())
def curation_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic shuffle-to-shards training-export plan
    (operators/curation.py:shard_plan): dense global index in portable
    hash order dealt round-robin into 8 shards — shard sizes differ by
    at most one AND each shard is its own unbiased shuffled sample.
    Two-phase global rank (hash-range slices + broadcast prefix
    offsets), never a single-partition window; the oracle replays the
    naive global row_number it is bit-identical to."""
    from .operators.curation import shard_plan

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return shard_plan(d, "doc_id", n_shards=8)


@query("curation_gate_overlap", _GATE_OVERLAP_SQL)
def curation_gate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Gate-overlap Venn report: every document voted on by the
    THREE quality-gate families — Gopher hard rules (categorical),
    heuristic score >= 0.5 (continuous), and the CCNet per-language
    perplexity keep (head+middle, LM-based) — aggregated into the 2^3
    agreement cells. The pipeline-tuning report: cells where one gate
    disagrees with the other two localize what each family uniquely
    drops (a rule too strict, a score threshold misplaced, an LM bias
    against a language). Three id-keyed boolean joins over id-sized
    frames; docs without LM evidence (zero tokens) count as lm_keep =
    false — the gate would drop them. Oracle replays all three gates
    bit-for-bit."""
    from .operators.curation import ccnet_buckets

    d = _t(spark, sf_dir, "documents")
    g = text.gopher_rules(d, "text", "doc_id").select(
        "doc_id", F.col("keep").alias("__gk")
    )
    q = text.quality_score(d, "text", "doc_id").select(
        "doc_id", (F.col("quality") >= 0.5).alias("__qk")
    )
    c = ccnet_buckets(d, "doc_id", "text", "lang").select(
        "doc_id", (F.col("ppl_bucket") != "tail").alias("__lk")
    )
    total = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    flags = (
        d.select("doc_id")
        .join(g, "doc_id", "left")
        .join(q, "doc_id", "left")
        .join(c, "doc_id", "left")
        .select(
            F.coalesce("__gk", F.lit(False)).alias("gopher_keep"),
            F.coalesce("__qk", F.lit(False)).alias("quality_keep"),
            F.coalesce("__lk", F.lit(False)).alias("lm_keep"),
        )
    )
    return (
        flags.groupBy("gopher_keep", "quality_keep", "lm_keep")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "gopher_keep",
            "quality_keep",
            "lm_keep",
            "n_docs",
            F.round(F.col("n_docs") / F.col("__n"), 6).alias("frac"),
        )
    )


@query("curation_length_balance", _length_balance_sql())
def curation_length_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Length-distribution flattening: docs bucketed by token
    count (width-64 buckets, top bucket open) and every bucket
    downsampled to the smallest bucket's size via
    ``curation.balance_groups`` — the anti-short-doc-dominance sampler
    for long-context training mixes (composition of the token-count
    projection and the class balancer; same data-derived-cutoff rank
    shuffle as curation_balance_groups). Oracle replays the bucketing,
    the md5 rank order, and the minority cutoff."""
    from .functions import token_count
    from .operators.curation import balance_groups

    d = _t(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "lang",
        # coalesce BEFORE counting: size(NULL) is -1 in the non-ANSI
        # session and NULL under ANSI — '' tokenizes to 0 on both and
        # the oracle agrees (the size(NULL)=-1 bug class)
        F.least(
            (token_count(F.coalesce(F.col("text"), F.lit(""))) / 64)
            .cast("int"),
            F.lit(7),
        ).cast("int").alias("len_bucket"),
    )
    return balance_groups(b, "doc_id", "len_bucket", seed="lenbal0")


@query(
    "curation_soft_weighted_sample",
    _SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + f"""
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
    sizes AS (SELECT cl, count(*)::BIGINT AS nd FROM comp GROUP BY cl),
    wtd AS (
      SELECT d.doc_id, d.lang,
             coalesce(c.cl, d.doc_id)::BIGINT AS cluster_id,
             coalesce(s.nd, 1)::BIGINT AS n_dups
      FROM documents d
      LEFT JOIN comp c ON c.id = d.doc_id
      LEFT JOIN sizes s ON s.cl = c.cl
    )
    SELECT doc_id, lang, cluster_id, n_dups
    FROM wtd
    WHERE ({_hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':sws0')")}) % 1000000
          < (2000000 + n_dups) // (2 * n_dups)
    """,
)
def curation_soft_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Soft-dedup SAMPLING: draw the corpus at each row's
    soft-dedup weight (keep probability 1/|near-dup cluster|) with the
    deterministic (id, seed)-hash draw — one copy per cluster IN
    EXPECTATION without hard survivor-pick, the executable form of
    ``dedup_soft_weights``'s reweighting for pipelines that must emit
    rows, not weights. The keep threshold is the exact round-half-up
    integer ``(2·10⁶ + n) div 2n`` (micro-unit rule: round(1e6/n) in
    doubles is engine-dependent at the half). Reuses the layout-cached
    pair set; the corpus sees one id-keyed join + a zero-shuffle
    filter."""
    from .functions import md5_hash60

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = _minhash_pairs_cached(spark, sf_dir)
    w = dedup.soft_dedup_weights(d, "doc_id", pairs)
    bucket = md5_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":sws0"))
    ) % 1_000_000
    thr = F.expr("(2000000 + n_dups) div (2 * n_dups)")
    return w.filter(bucket < thr).select(
        "doc_id", "lang", "cluster_id", "n_dups"
    )


@query(
    "curation_doremi_sample",
    _mw_chain_sql(_MW_REPETITION_PERDOC, 0.5, 0.01)
    + _doremi_sample_tail_sql(300, "dm0"),
)
def curation_doremi_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DoReMi mixture APPLIED to a row budget
    (operators/curation.py:doremi_sample): the repetition-deficit
    excess losses drive 8 linearized-MW rounds
    (``curation_mixture_reweight``'s recipe), then each source keeps
    its portable-hash-order prefix of floor(weight · 300) rows — the
    recipe-APPLIED twin, like unimax_mixture → unimax_sample. The
    oracle unrolls the identical MW rounds AND replays the floor
    targets + hash-order prefix, so weights, allocations, and the kept
    row set all pin value-exactly. One domains-row aggregate + one
    group-keyed window shuffle; floor under-fills by < 1 row per
    domain (documented)."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens
    from .operators.curation import doremi_sample

    tk = _tokens(F.col("text"))
    loss = F.when(
        F.col("text").isNotNull() & (F.size(tk) > 0),
        F.lit(1.0) - F.size(F.array_distinct(tk)) / F.size(tk),
    )
    scored = d.select("doc_id", "source", loss.alias("__loss"))
    return doremi_sample(
        scored, "doc_id", "source", "__loss",
        budget_rows=300, eta=0.5, seed="dm0",
    ).select("doc_id", "source", "domain_weight", "target_rows")


@query(
    "curation_doremi_token_sample",
    _mw_chain_sql(_MW_REPETITION_PERDOC, 0.5, 0.01)
    + _doremi_token_tail_sql(10_000, "dt0"),
)
def curation_doremi_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] DoReMi mixture applied to a TOKEN budget
    (operators/curation.py:doremi_token_sample) — the paper's own unit
    (weights are token-mass shares): the repetition-deficit losses
    learn the domain weights, each source gets floor(weight · 10000)
    tokens, and keeps its hash-order document prefix until the running
    total reaches that allocation (the token_budget_sample keep rule —
    overshoot bounded by one document). The oracle unrolls the same MW
    rounds AND replays tokenizer, hash order, running-sum window, and
    floor targets value-exactly. One domains-row aggregate + one
    group-keyed window shuffle."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens
    from .operators.curation import doremi_token_sample

    tk = _tokens(F.col("text"))
    loss = F.when(
        F.col("text").isNotNull() & (F.size(tk) > 0),
        F.lit(1.0) - F.size(F.array_distinct(tk)) / F.size(tk),
    )
    scored = d.select("doc_id", "source", "text", loss.alias("__loss"))
    return doremi_token_sample(
        scored, "text", "doc_id", "source", "__loss",
        budget_tokens=10_000, eta=0.5, seed="dt0",
    ).select("doc_id", "source", "n_tokens", "domain_weight", "target_tokens")


@query(
    "curation_incremental_sample",
    f"""
    WITH d AS (SELECT lang, doc_id FROM documents WHERE doc_id IS NOT NULL),
    h AS (
      SELECT DISTINCT lang, doc_id,
             {_hex2int_sql("substr(md5(CAST(doc_id AS VARCHAR) || ':smp1'), 1, 15)")}
               AS hv
      FROM d
    ),
    r AS (SELECT lang, doc_id, hv, row_number() OVER (
            PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rn FROM h)
    SELECT lang, rn::BIGINT AS sample_rank, doc_id, true AS paths_agree
    FROM r WHERE rn <= 8
    """,
)
def curation_incremental_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Incrementally-maintained uniform eval panel via the
    MERGEABLE bottom-k sample state (operators/aggstate.py:
    build/merge_sample_states, finalize_sample): two ingest increments
    each build a per-language bottom-8-by-portable-hash id sample and
    FOLD by re-taking the bottom-k of the union — row-for-row
    identical to one build over everything (``paths_agree`` pins it),
    so the panel never resamples, never churns, and replays exactly on
    any engine (classic RNG reservoirs are neither mergeable nor
    replayable). ``sample_rank`` exposes the prefix property: rank <= j
    is itself the uniform j-panel. Ids-only state (≤ k rows per lang
    forever); payloads re-join by id at read time. The oracle replays
    the hash order over the full corpus — valid BECAUSE the fold is
    exact."""
    from .operators import aggstate as A

    # the sketch-state query pattern (see agg_bloom_incremental_users):
    # lazy checkpoints so the merge/finalize layout probes and the
    # paths_agree collects do not re-run the md5 build passes
    d = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    kw = dict(k=8, seed="smp1")
    s0 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 0), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 1), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_sample_states([s0, s1], ["lang"], "doc_id").localCheckpoint(
        eager=False
    )
    full = A.build_sample_state(d, ["lang"], "doc_id", **kw).localCheckpoint(
        eager=False
    )
    rows = lambda s: sorted(  # noqa: E731
        map(tuple, s.select("lang", "doc_id", "__hv").collect())
    )
    agree = rows(merged) == rows(full)
    return A.finalize_sample(merged, ["lang"], "doc_id").select(
        "lang",
        F.col("sample_rank").cast("long").alias("sample_rank"),
        "doc_id",
        F.lit(agree).alias("paths_agree"),
    )


@query(
    "curation_sample_quantiles",
    f"""
    WITH d AS (SELECT DISTINCT lang, doc_id, n_chars FROM documents
               WHERE doc_id IS NOT NULL),
    h AS (
      SELECT lang, doc_id, n_chars,
             {_hex2int_sql("substr(md5(CAST(doc_id AS VARCHAR) || ':sq0'), 1, 15)")}
               AS hv
      FROM d
    ),
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
           min(CASE WHEN rn = CAST(ceil(0.25 * n) AS INT) THEN n_chars END)
             ::BIGINT AS q_0_25,
           min(CASE WHEN rn = CAST(ceil(0.5 * n) AS INT) THEN n_chars END)
             ::BIGINT AS q_0_5,
           min(CASE WHEN rn = CAST(ceil(0.9 * n) AS INT) THEN n_chars END)
             ::BIGINT AS q_0_9
    FROM r GROUP BY lang
    """,
)
def curation_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] RANGE-FREE mergeable quantiles from the deterministic
    bottom-k sample state (operators/aggstate.py:
    finalize_sample_quantiles): two ingest increments each build a
    per-language bottom-24 id sample CARRYING n_chars (a pure function
    of the doc — the carry contract), fold exactly, and the sample's
    nearest-rank order statistics estimate per-language length
    quantiles — the quantile question the histogram state can't
    answer when [lo, hi) isn't known up front, with no bucket layout
    to drift. Deterministic portable-md5 sampling + integer rank
    arithmetic, so the oracle replays every pick verbatim (the fold is
    exact, so it replays over the full corpus in one shot). At 100 TB:
    state ≤ k rows per key forever; the quantile window ranks ≤ k rows
    per key, never the corpus."""
    from .operators import aggstate as A

    # lazy checkpoints: the merge/finalize layout probes otherwise
    # re-run both builds (the sketch-state query pattern)
    d = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    kw = dict(k=24, seed="sq0", carry=["n_chars"])
    s0 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 0), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 1), ["lang"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_sample_states(
        [s0, s1], ["lang"], "doc_id", carry=["n_chars"]
    ).localCheckpoint(eager=False)
    return A.finalize_sample_quantiles(
        merged, ["lang"], "doc_id", "n_chars", [0.25, 0.5, 0.9]
    )


@query(
    "curation_token_weighted_quantiles",
    f"""
    WITH d AS (
      SELECT DISTINCT source, doc_id, n_chars,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> ''))::BIGINT AS n_tok
      FROM documents WHERE doc_id IS NOT NULL
    ),
    h AS (
      SELECT source, doc_id, n_chars, n_tok,
             {_hex2int_sql("substr(md5(CAST(doc_id AS VARCHAR) || ':wq0'), 1, 15)")}
               AS hv
      FROM d
    ),
    bk AS (SELECT source, doc_id, n_chars, n_tok FROM (
             SELECT source, doc_id, n_chars, n_tok, row_number() OVER (
               PARTITION BY source ORDER BY hv ASC, doc_id ASC) AS rn
             FROM h
           ) WHERE rn <= 24),
    r AS (SELECT source, n_chars,
                 sum(n_tok) OVER (
                   PARTITION BY source ORDER BY n_chars ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cumw,
                 sum(n_tok) OVER (PARTITION BY source) AS totw
          FROM bk)
    SELECT source, count(*)::BIGINT AS n_kept,
           min(CASE WHEN cumw >= 0.5 * totw THEN n_chars END)
             ::BIGINT AS q_0_5,
           min(CASE WHEN cumw >= 0.9 * totw THEN n_chars END)
             ::BIGINT AS q_0_9
    FROM r GROUP BY source
    """,
)
def curation_token_weighted_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[EXT] TOKEN-MASS-weighted length quantiles from the carried
    sample state (operators/aggstate.py:finalize_weighted_quantiles):
    "half our tokens sit in docs longer than X chars" — the curation
    question row-quantiles can't answer, because a few long docs hold
    most of the training mass. Two ingest increments each build a
    per-source bottom-24 id sample CARRYING (n_chars, n_tok) — both
    pure functions of the doc (n_tok = the portable lowercase-alnum
    tokenizer shared with the token-budget family) — fold exactly,
    and the LOWER weighted quantile picks the smallest length whose
    running token mass reaches q · total. Deterministic integer
    arithmetic over the ≤ k sampled rows, so the oracle replays every
    pick (the fold is exact at this scale, so it replays the one-shot
    build). At 100 TB: state ≤ k (id, value, weight) rows per key; the
    running-sum window rides the STATE, never the corpus."""
    from .operators import aggstate as A

    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    ).cast("long")
    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", n_tok.alias("n_tok")
    )
    kw = dict(k=24, seed="wq0", carry=["n_chars", "n_tok"])
    # lazy checkpoints: the merge/finalize layout probes otherwise
    # re-run both builds (the sketch-state query pattern)
    s0 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 0), ["source"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    s1 = A.build_sample_state(
        d.where(F.col("doc_id") % 2 == 1), ["source"], "doc_id", **kw
    ).localCheckpoint(eager=False)
    merged = A.merge_sample_states(
        [s0, s1], ["source"], "doc_id", carry=["n_chars", "n_tok"]
    ).localCheckpoint(eager=False)
    return A.finalize_weighted_quantiles(
        merged, ["source"], "doc_id", "n_chars", "n_tok", [0.5, 0.9]
    )
