"""[EXT] Text-analysis operators for training-data pipelines
(SURVEY.md §2.11): token counting, quality scoring, language ID, and
document fingerprinting over the ``documents`` table.

All pure Column expressions (``pyspark.sql.functions``) — every operator
here is also expressible in ANSI SQL, so each gets a DuckDB oracle in
``__spark_entry__.oracle_sql()``. No UDFs, no shuffles except where an
aggregation is the point.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import shingles_from_tokens, tokens, whitespace_token_count, lit_double_array

# BPE-ish tokenizer regex: word pieces, number runs, single non-space
# punctuation — a cheap deterministic proxy for subword token counts.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic; ties break by the
# declared order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def regex_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (JVM-side regexp_extract_all)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


# Scrub patterns: deliberately simple POSIX-class regexes so the same
# pattern string behaves identically in Spark (Java regex) and ANSI SQL
# engines (e.g. DuckDB/RE2) — no lookarounds, no \b word boundaries.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def scrub_text(
    col: Column,
    *,
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
    phone_token: str | None = None,
    normalize_ws: bool = True,
) -> Column:
    """PII/noise scrubbing for training text: replace URLs and emails
    (and optionally phone-like runs) with stable placeholder tokens,
    then collapse whitespace runs and trim. Order matters: emails are
    replaced after URLs so a mailto-ish tail inside a URL is already
    gone. Pure Column expressions — scales as a narrow projection."""
    out = F.regexp_replace(col, URL_RE, url_token)
    out = F.regexp_replace(out, EMAIL_RE, email_token)
    if phone_token is not None:
        out = F.regexp_replace(out, PHONE_RE, phone_token)
    if normalize_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def scrub_documents(
    df: DataFrame, text_col: str, id_col: str, **kw
) -> DataFrame:
    """(id, clean_text, n_urls, n_emails) — scrubbed text plus counts of
    what was removed (the counts drive corpus-quality dashboards)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        scrub_text(t, **kw).alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
    )


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document surface statistics: char/token counts and
    composition ratios. One narrow projection — no shuffle."""
    t = F.col(text_col)
    n_chars = F.length(t)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        whitespace_token_count(t).alias("n_ws_tokens"),
        regex_token_count(t).alias("n_re_tokens"),
        F.round(
            F.length(F.regexp_replace(t, "[^0-9]", "")) / F.greatest(n_chars, F.lit(1)),
            6,
        ).alias("digit_ratio"),
        F.round(
            F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.greatest(n_chars, F.lit(1)),
            6,
        ).alias("alpha_ratio"),
        F.round(
            F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")) / F.greatest(n_chars, F.lit(1)),
            6,
        ).alias("punct_ratio"),
    )


def quality_expr(t: Column) -> Column:
    """The quality score as a pure Column expression (see
    ``quality_score``) — exposed so the compiler's declarative
    ``quality_filter`` can gate rows in-plan without a join."""
    n_chars = F.length(t)
    n_tok = whitespace_token_count(t)
    mean_wl = F.length(F.regexp_replace(t, "\\s+", "")) / F.greatest(n_tok, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.greatest(n_chars, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    len_ok = F.when(n_chars >= 100, F.lit(1.0)).otherwise(n_chars / F.lit(100.0))
    return (
        0.3 * wl_ok
        + 0.3 * alpha_ratio
        + 0.2 * (1 - F.least(punct_ratio * 5, F.lit(1.0)))
        + 0.2 * len_ok
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic document quality in [0, 1]: mean-word-length sanity,
    alpha dominance, low punctuation noise, non-trivial length.
    Deterministic, fully SQL-expressible."""
    score = quality_expr(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.round(score, 6).alias("quality"),
        (score >= 0.5).alias("keep"),
    )


def _marker_score(text: Column, words: list[str]) -> Column:
    """Number of marker words present (word-boundary contains)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    s = F.lit(0)
    for w in words:
        s = s + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return s


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-marker language ID: score each candidate language by
    marker-word presence; argmax with deterministic tie-break (declared
    LANG_MARKERS order). Docs with zero hits → 'und' (undetermined).
    Pure expressions; the SQL oracle replicates the same CASE chain."""
    t = F.col(text_col)
    scores = {lang: _marker_score(t, ws) for lang, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    # build the WHEN chain in reverse so earlier languages win ties
    for lang in reversed(langs):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
    )


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: lexical
    diversity (distinct-word fraction — in-row, no shuffle) and the
    most-frequent-bigram fraction (templated/spammy text repeats one
    phrase; natural text doesn't). Output: ``(id, n_words,
    distinct_word_frac, n_bigrams, top_bigram_n, top_bigram_frac)``.

    The bigram mode is a genuine distributed mode computation:
    explode → count per (doc, bigram) → max/sum per doc. Both
    aggregations key on doc id (uniform), partial aggregation combines
    map-side, and the exploded stream is the only wide data — at
    100 TB this is the same shape as a word-count, the canonical
    well-scaling job. Docs with < 2 tokens report zero bigram stats
    rather than a degenerate whole-text "bigram"."""
    tk = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk"))
    n_words = F.size(F.col("__tk"))
    base = tk.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(
            F.size(F.array_distinct(F.col("__tk")))
            / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("distinct_word_frac"),
    )
    bg_agg = (
        tk.filter(F.size(F.col("__tk")) >= 2)
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("__tk"), 2)).alias("__bg"),
        )
        .groupBy(id_col, "__bg")
        .count()
        .groupBy(id_col)
        .agg(
            F.max("count").alias("top_bigram_n"),
            F.sum("count").alias("n_bigrams"),
        )
    )
    return base.join(bg_agg, id_col, "left").select(
        F.col(id_col),
        "n_words",
        "distinct_word_frac",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).alias("top_bigram_n"),
        F.round(
            F.coalesce(F.col("top_bigram_n"), F.lit(0))
            / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )


def url_normalize(col: Column) -> Column:
    """Canonical URL for web-corpus dedup blocking: drop the fragment,
    lowercase the scheme+authority (host names are case-insensitive;
    paths are NOT and keep their case), drop explicit default ports
    (http:80 / https:443), and drop a bare "/" path — so the casing,
    #fragment, and default-port variants of one resource collide into
    one blocking key before near-dup comparison.

    Deliberately NOT full RFC 3986 (no %-decoding, no query-param
    sorting/stripping — those change semantics for some sites); pure
    Column expressions over lookaround-free regexes, so an ANSI engine
    reproduces every canonical form for the differential gate.
    Non-URL strings (no scheme://) pass through with only the fragment
    dropped."""
    no_frag = F.regexp_replace(col, r"#.*$", "")
    head = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    rest = no_frag.substr(F.length(head) + 1, F.length(no_frag))
    low = F.lower(head)
    low = F.regexp_replace(low, r"^(http://[^/:]+):80$", "$1")
    low = F.regexp_replace(low, r"^(https://[^/:]+):443$", "$1")
    rest = F.when(rest == "/", F.lit("")).otherwise(rest)
    return F.when(head == "", no_frag).otherwise(F.concat(low, rest))


def word_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Shannon entropy of the word distribution per document — the
    information-theoretic quality signal next to the ratio-based ones
    (``quality_score``) and repetition modes (``repetition_signals``):
    near-zero for degenerate/templated text, ~log2(n) for fully diverse
    text. Output ``(id, n_words, n_distinct, entropy, norm_entropy)``
    with ``norm_entropy = H / log2(n_distinct)`` in [0, 1].

    Algebraic form: H = log2(n) − Σ c·log2(c) / n over per-word counts
    c — ONE pass over the exploded words with map-side partial sums;
    the per-word count stream never needs a second normalization join.
    Same word-count shuffle shape as ``repetition_signals``; rounded to
    6 so engines agree."""
    counts = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy(id_col, "__w")
        .count()
    )
    agg = counts.groupBy(id_col).agg(
        F.sum("count").alias("__n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("count") * F.log2("count")).alias("__s"),
    )
    h = F.log2(F.col("__n")) - F.col("__s") / F.col("__n")
    return agg.select(
        F.col(id_col),
        F.col("__n").alias("n_words"),
        "n_distinct",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(
                F.col("n_distinct") > 1, h / F.log2(F.col("n_distinct"))
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("norm_entropy"),
    )


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 retrieval scoring of every document against a fixed bag of
    ``query_terms`` (Robertson/Sparck-Jones with the Lucene-style
    non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — the
    standard relevance ranker for corpus search and for building
    retrieval-based eval sets. The reference has no IR surface at all;
    this extends its query-capability the way `text_tfidf_top_terms`
    does (SURVEY.md §2.11).

    Scale shape: the exploded token stream is filtered to the query
    terms BEFORE any shuffle, so the groupBys carry only matching
    (doc, term) rows — O(matches), not O(corpus tokens). Document
    lengths are one word-count aggregate over the same stream; the
    per-term document frequencies and the scalar avgdl/N are tiny and
    broadcast. Top-k compiles to TakeOrderedAndProject (local top-k per
    task, driver merge of O(tasks × k)).

    Determinism: scores are rounded to 6 dp BEFORE ranking and ties
    break by id, so last-ulp ln() divergence between engines cannot
    reorder the cutoff.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got k1={k1} b={b}")
    terms = sorted({t.lower() for t in query_terms})
    # ONE corpus tokenize/explode + ONE (doc, term) shuffle: dl, tf and
    # df all derive from the per-(doc, term) count aggregate, whose
    # exchange Spark reuses across the three consumers — the naive
    # three-subtree form re-ran the explode (the dominant cost) 3×
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w"))
    per_doc = tok.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    dl = per_doc.groupBy(id_col).agg(F.sum("__c").alias("__dl"))
    hits = per_doc.filter(F.col("__w").isin(terms))
    tf = hits.select(F.col(id_col), "__w", F.col("__c").alias("__tf"))
    # per_doc is distinct on (doc, term), so rows-per-term IS the
    # document frequency — no countDistinct needed
    dfreq = hits.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    # scalars as 1-row broadcast frames, NOT driver collects: a collect
    # would execute dl's whole token aggregate once for the scalar and
    # again in the join below — as a cross-joined subtree the exchange
    # is computed once and reused (ReuseExchange)
    stats = dl.agg(
        F.coalesce(F.avg("__dl"), F.lit(1.0)).alias("__avgdl")
    ).crossJoin(df.agg(F.count(F.lit(1)).cast("double").alias("__n")))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * F.col("__tf") * (k1 + 1.0) / norm
    scored = (
        tf.join(F.broadcast(dfreq), "__w")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_k)
        .select(F.col(id_col), "n_terms_hit", "bm25")
    )


def unigram_logprob(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus' own
    unigram distribution — the cheapest useful perplexity proxy for
    quality filtering (docs full of rare tokens score very negative;
    boilerplate scores near the mode). ``mean_log2p`` =
    avg over tokens w of log2(count(w) / total_tokens); ``ppl_proxy`` =
    2^(−mean_log2p) is the corresponding perplexity.

    Scale shape: two word-count shuffles over the same exploded stream
    (per-doc-term counts, then global term counts), one shuffle join on
    the term, one per-doc aggregate. The global term table is
    vocabulary-sized; the total-token count is a scalar broadcast. No
    driver materialization beyond the single aggregate row.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w"))
    per_doc = tok.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    corpus = per_doc.groupBy("__w").agg(F.sum("__c").alias("__cw"))
    # 1-row broadcast frame, not a driver collect (see bm25_rank: the
    # collect would run the corpus aggregate twice; ReuseExchange runs
    # it once)
    total = corpus.agg(
        F.coalesce(F.sum("__cw"), F.lit(1)).cast("double").alias("__t")
    )
    logp = F.log2(F.col("__cw") / F.col("__t"))
    agg = (
        per_doc.join(corpus, "__w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            (F.sum(F.col("__c") * logp) / F.sum("__c")).alias("__m"),
        )
    )
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.col("__m"), 6).alias("mean_log2p"),
        F.round(F.pow(F.lit(2.0), -F.col("__m")), 4).alias("ppl_proxy"),
    )


def nb_train(
    df: DataFrame, text_col: str, label_col: str
) -> "tuple[DataFrame, DataFrame]":
    """Train a multinomial Naive Bayes text classifier — the one-pass
    MULTI-CLASS complement of ``train_hashed_linear`` (binary,
    iterative): closed-form add-one-smoothed token likelihoods, no
    gradient steps, the classic seed-classifier recipe behind
    CCNet/GPT-3-style quality and language filters ("label a small
    seed set, train in one aggregate pass, score the corpus").

    Returns ``(model, priors)``, both persistable:
    * model — one row per (label, token):
      ``log_lik = ln((count + 1) / (n_label_tokens + V))``;
    * priors — one row per label: ``log_prior = ln(docs/total_docs)``,
      ``log_unseen = ln(1 / (n_label_tokens + V))`` (the smoothing
      mass an unseen token contributes), plus the audit counts.
    All log-likelihoods are 6-dp-rounded so scoring sums replay
    identically across engines (the unigram_logprob convention).
    NULL labels and token-less docs are excluded (they carry no
    counts).

    Scale shape: one exploded word-count shuffle (label, token) — the
    same shape as ``unigram_logprob`` — then label-sized and
    vocabulary-sized aggregates; the vocabulary size V and doc totals
    ride as 1-row broadcast frames, never driver collects."""
    base = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("__lbl"), tokens(F.col(text_col)).alias("__tk")
    ).where(F.size("__tk") > 0)
    tok = base.select("__lbl", F.explode("__tk").alias("__w"))
    counts = tok.groupBy("__lbl", "__w").agg(F.count(F.lit(1)).alias("__c"))
    vocab = counts.select("__w").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__v")
    )
    label_tokens = counts.groupBy("__lbl").agg(
        F.sum("__c").cast("double").alias("__nt")
    )
    model = (
        counts.join(label_tokens, "__lbl")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("__lbl").alias("label"),
            F.col("__w").alias("token"),
            F.round(
                F.log((F.col("__c") + 1) / (F.col("__nt") + F.col("__v"))), 6
            ).alias("log_lik"),
        )
    )
    docs = base.groupBy("__lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    total_docs = docs.agg(
        F.sum("n_docs").cast("double").alias("__td")
    )
    priors = (
        docs.join(label_tokens, "__lbl")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total_docs))
        .select(
            F.col("__lbl").alias("label"),
            "n_docs",
            F.col("__nt").cast("long").alias("n_tokens"),
            F.round(F.log(F.col("n_docs") / F.col("__td")), 6).alias(
                "log_prior"
            ),
            F.round(
                F.log(F.lit(1.0) / (F.col("__nt") + F.col("__v"))), 6
            ).alias("log_unseen"),
        )
    )
    return model, priors


def nb_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    priors: DataFrame,
    *,
    broadcast_limit: int | None = 5_000_000,
) -> DataFrame:
    """Score documents with a trained ``nb_train`` model: per doc the
    argmax-label posterior ``log_prior + Σ_tokens log_lik`` (unseen
    tokens contribute the label's ``log_unseen`` smoothing mass; token
    REPEATS each count, the multinomial model). Returns
    (id, predicted, score, margin) — margin = score − runner-up score
    (0.0 for a single-label model), the abstention knob a quality
    gate thresholds on. Ties break to the lexicographically smallest
    label; token-less docs are dropped (no evidence, no verdict).

    Scale shape: the exploded token stream multiplies by the LABEL
    count (labels are few by construction — a seed classifier) via a
    broadcast label join, the model joins broadcast on (token, label),
    and the per-(doc,label) sums reduce with map-side combine; the
    argmax is a per-doc WindowGroupLimit, keyed, never global.

    "Seed-sized model" is a user promise, not a law — the same loud
    bounded-probe contract as ``similarity._guard_broadcast_side``:
    ``broadcast_limit`` caps the model's (token, label) row count at
    plan-build time, so a model trained on a whole-corpus vocabulary
    fails with a ValueError instead of a broadcast OOM mid-join. Pass
    ``None`` only when the caller already bounded the model (or cannot
    run jobs at build time)."""
    if broadcast_limit is not None:
        from .similarity import _guard_broadcast_side

        _guard_broadcast_side(model, "token", broadcast_limit, "nb_score")
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w")
    )
    labels = priors.select(
        F.col("label").alias("__lbl"), "log_prior", "log_unseen"
    )
    scored_tokens = (
        tok.crossJoin(F.broadcast(labels))
        .join(
            F.broadcast(
                model.select(
                    F.col("token").alias("__w"),
                    F.col("label").alias("__lbl"),
                    "log_lik",
                )
            ),
            ["__w", "__lbl"],
            "left",
        )
        .select(
            F.col(id_col),
            "__lbl",
            "log_prior",
            F.coalesce(F.col("log_lik"), F.col("log_unseen")).alias("__ll"),
        )
    )
    per_label = scored_tokens.groupBy(id_col, "__lbl").agg(
        F.round(F.first("log_prior") + F.sum("__ll"), 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("__lbl").asc()
    )
    ranked = per_label.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__next", F.lead("score").over(w)
    )
    return ranked.where(F.col("__rn") == 1).select(
        F.col(id_col),
        F.col("__lbl").alias("predicted"),
        "score",
        F.round(
            F.col("score") - F.coalesce(F.col("__next"), F.col("score")), 6
        ).alias("margin"),
    )


def ngram_novelty(
    df: DataFrame, text_col: str, id_col: str, *, shingle_n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word ``shingle_n``-gram shingles that appear in no other document —
    the inverse of the contamination/overlap scans, used to rank docs
    by how much genuinely new text they add to a corpus (boilerplate
    and templated docs score ~0).

    Scale shape: one narrow distinct-shingle stream per doc
    (``dedup.shingle_hash_stream``, zero shuffles), one global
    shingle-frequency aggregate (word-count shape), one join back, one
    per-doc mean. Nothing quadratic; the frequency table is
    shingle-vocabulary sized and stays distributed.
    """
    from .dedup import shingle_hash_stream

    flat = shingle_hash_stream(df, id_col, text_col, shingle_n)
    dfreq = flat.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    return (
        flat.join(dfreq, "__h")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.avg(F.when(F.col("__df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
        .withColumnRenamed("__id", id_col)
    )


def doc_fingerprint(
    df: DataFrame, text_col: str, id_col: str, *, shingle_n: int = 3
) -> DataFrame:
    """Winnowing-style document fingerprint: the lexicographic minimum
    of md5(shingle) over word n-gram shingles (a 1-sample MinHash with a
    portable hash — md5 exists in every engine, so the DuckDB oracle can
    reproduce it bit-for-bit). Equal fingerprints ⇒ near-identical
    leading content; used as a cheap grouping key before heavier
    near-dup passes."""
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).select(
        F.col(id_col), shingles_from_tokens(F.col("__tk"), shingle_n).alias("__sh")
    )
    fp = F.array_min(F.transform(F.col("__sh"), lambda s: F.md5(s)))
    return staged.select(F.col(id_col), fp.alias("fingerprint"))


def compression_ratio(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher-style redundancy signal: templated/repetitive text compresses
    far below natural prose. Arrow-batched ``pandas_udf`` (stdlib zlib,
    level 6 pinned for determinism across runs); no SQL engine exposes
    an identical codec, so the registry entry is rows-only by design.
    Empty docs report ratio 0.0."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio_fn(sr):
        import zlib

        def one(v):
            if v is None:
                return None
            b = v.encode("utf-8")
            if not b:
                return 0.0
            return round(len(zlib.compress(b, 6)) / len(b), 6)

        return sr.map(one)

    _ratio_fn.__annotations__ = {"sr": pd.Series, "return": pd.Series}
    ratio = pandas_udf(_ratio_fn, "double")
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        ratio(F.col(text_col)).alias("compression_ratio"),
    )


def zipf_slope(
    df: DataFrame, text_col: str, *, top_n: int = 1_000
) -> DataFrame:
    """One-row corpus-health metric: the OLS slope of ln(frequency) vs
    ln(rank) over the ``top_n`` most frequent words — natural language
    sits near −1 (Zipf's law); heavily templated or synthetic corpora
    drift away. Shape: one word-count shuffle, a TakeOrderedAndProject
    top-N, a ≤N-row window for ranks, one aggregate."""
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__w"))
        .limit(top_n)
    )
    ranked = counts.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.desc("__c"), F.asc("__w")))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.regr_slope(F.log(F.col("__c")), F.log(F.col("__r"))), 6
        ).alias("zipf_slope"),
        F.round(
            F.regr_r2(F.log(F.col("__c")), F.log(F.col("__r"))), 6
        ).alias("r2"),
    )


def bigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    log2 P(w_i | w_{i-1}) under the corpus' own bigram counts — the
    2-gram step up from ``unigram_logprob``: fluent text scores high
    (its transitions are common), shuffled or templated word salad
    scores very negative even when every individual word is frequent.

    P(w2|w1) = c(w1,w2) / c(w1·) with the denominator counted over
    bigram PREFIXES (so the distribution sums to 1 per prefix). Docs
    with fewer than 2 tokens have no bigrams and are excluded.

    Scale shape: one narrow in-row bigram expansion (no shuffle), two
    word-count-shaped aggregates (bigram and prefix counts), two joins
    back on the bigram stream, one per-doc aggregate — every exchange
    carries (hash, count) pairs.
    """
    tk = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).filter(F.size("__tk") >= 2)
    pairs = F.expr(
        "transform(sequence(0, size(__tk) - 2), "
        "i -> struct(__tk[i] AS w1, __tk[i + 1] AS w2))"
    )
    bg = tk.select(F.col(id_col), F.explode(pairs).alias("__p")).select(
        F.col(id_col), F.col("__p.w1").alias("__w1"), F.col("__p.w2").alias("__w2")
    )
    # aggregate per (doc, bigram) FIRST: cbg/cpre derive from that
    # exchange (ReuseExchange) and the probe side is the same aggregate
    # — one corpus tokenize/explode instead of three (the unigram
    # operator's per_doc → corpus pattern)
    per_doc = bg.groupBy(id_col, "__w1", "__w2").agg(
        F.count(F.lit(1)).alias("__c")
    )
    cbg = per_doc.groupBy("__w1", "__w2").agg(F.sum("__c").alias("__cbg"))
    cpre = cbg.groupBy("__w1").agg(F.sum("__cbg").alias("__cpre"))
    logp = F.log2(F.col("__cbg") / F.col("__cpre"))
    return (
        per_doc.join(cbg, ["__w1", "__w2"])
        .join(cpre, "__w1")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("__c") * logp) / F.sum("__c"), 6
            ).alias("mean_log2p"),
        )
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_features: int = 64,
    bias: float = 0.0,
    seed: str = "qc0",
    weights: Optional[Sequence[float]] = None,
) -> DataFrame:
    """Model-based quality scoring via the hashing trick: each token is
    hashed into one of ``n_features`` buckets (portable md5, so the
    featurization is engine-reproducible), and the document score is
    ``sigmoid(bias + mean over tokens of w[bucket])`` — a linear
    classifier over the L1-normalized hashed bag of words, the
    fastText-style quality-filter shape (CCNet/Gopher pipelines) one
    rung above the heuristic ``quality_score``. The weight vector here
    is a fixed closed-form stand-in (``w_j = ((37 j + 11) mod 97)/97 −
    0.5`` — exact rational arithmetic any engine reproduces bit-for-
    bit); a trained model drops in by replacing that expression with a
    literal array, the plan is unchanged.

    Returns (id_col, n_tokens, qc_score), score NULL for token-less
    documents (no features — scoring them 0.5 would hide empty docs in
    the mid-quality band).

    100 TB shape: a PURE PROJECTION — tokenize, hash, and fold entirely
    in-row (one ``aggregate`` over the token array); zero shuffles,
    zero joins, no vocabulary table. That is the hashing trick's whole
    point: the feature space is fixed-width, so scoring never touches
    corpus-global state.
    """
    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    score = _hashed_sigmoid_sql(
        "__tk", n_features=n_features, bias=bias, seed=seed, weights=weights
    )
    return df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).select(
        id_col,
        # NULL text → NULL count (size(NULL) is -1 under non-ANSI
        # sessions; the oracle's len(ts) is NULL — match it)
        F.when(F.col("__tk").isNotNull(), F.size("__tk"))
        .cast("long")
        .alias("n_tokens"),
        F.when(F.size("__tk") > 0, F.expr(score)).alias("qc_score"),
    )

def _hashed_bucket_sql(token_var: str, *, n_features: int, seed: str) -> str:
    """The ONE source of the hashing-trick bucket assignment (portable
    md5 → bucket id) — shared by scoring (``_hashed_sigmoid_sql``) and
    training (``train_hashed_linear``), because a trained model only
    works if inference buckets tokens byte-identically to training."""
    return (
        f"cast(conv(substring(md5(concat({token_var}, ':{seed}')), 1, 15), "
        f"16, 10) as bigint) % {n_features}"
    )


def _hashed_sigmoid_sql(
    tokens_sql: str,
    *,
    n_features: int,
    bias: float,
    seed: str,
    weights: Optional[Sequence[float]] = None,
) -> str:
    """SQL for ``sigmoid(bias + mean bucket weight)`` over a token-array
    expression — the single source of the hash, the weights and the
    fold, shared by the operator form (``hashed_linear_score``) and the
    in-plan gate form (``hashed_linear_expr``) so the two can never
    drift. ``weights`` (length ``n_features``) inlines a TRAINED model
    as an array literal; None keeps the closed-form stand-in
    ``w_j = ((37 j + 11) mod 97)/97 − 0.5``."""
    bucket = _hashed_bucket_sql("t", n_features=n_features, seed=seed)
    if weights is None:
        w = f"((cast({bucket} as double) * 37.0 + 11.0) % 97.0) / 97.0 - 0.5"
    else:
        if len(weights) != n_features:
            raise ValueError(
                f"weights has {len(weights)} entries, expected {n_features}"
            )
        arr = "array(" + ", ".join(f"{float(v)!r}D" for v in weights) + ")"
        w = f"element_at({arr}, cast({bucket} as int) + 1)"
    return (
        f"round(1.0 / (1.0 + exp(-({float(bias)!r}D + "
        f"aggregate({tokens_sql}, cast(0 as double), (s, t) -> s + ({w}))"
        f" / size({tokens_sql})))), 6)"
    )


def hashed_linear_expr(
    col_name: str,
    *,
    n_features: int = 64,
    bias: float = 0.0,
    seed: str = "qc0",
    weights: Optional[Sequence[float]] = None,
    pre_tokenized: bool = False,
) -> Column:
    """Column form of ``hashed_linear_score`` for in-plan gates
    (``TableSpec.quality_filter.method: classifier``): same tokenizer,
    hash, weights and rounding, inlined over the named column so the
    compiler can use it as a pure filter projection. NULL / empty text
    scores NULL (the gate audits such rows as rejects).

    With ``pre_tokenized=True`` the named column is an ALREADY-STAGED
    token array (the compiler materializes it once with
    ``functions.tokens`` in a temp column), so the size guard, the
    aggregate input and the mean denominator are plain column
    references — without it the tokenizer split would be inlined and
    re-evaluated three times per row (ADVICE r4 #3). ``weights``
    inlines a trained model exactly as in ``hashed_linear_score``."""
    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    quoted = "`" + col_name.replace("`", "``") + "`"
    tk = (
        quoted
        if pre_tokenized
        else f"filter(split(lower({quoted}), '[^a-z0-9]+'), x -> x != '')"
    )
    score = _hashed_sigmoid_sql(
        tk, n_features=n_features, bias=bias, seed=seed, weights=weights
    )
    return F.when(F.expr(f"size({tk})") > 0, F.expr(score))


def train_hashed_linear(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    *,
    n_features: int = 64,
    seed: str = "qc0",
    steps: int = 20,
    lr: float = 4.0,
    l2: float = 0.0,
) -> "tuple[list[float], float]":
    """Minimal distributed trainer for the hashing-trick quality
    classifier (VERDICT r4 ask #5): full-batch logistic-regression
    gradient descent over the SAME featurization ``hashed_linear_score``
    scores with (md5 token hash → ``n_features`` buckets, L1-normalized
    bag), implemented purely with DataFrame aggregates — no MLlib, no
    per-row Python. Returns ``(weights, bias)`` ready to inline into
    ``hashed_linear_score(weights=...)`` / ``hashed_linear_expr`` /
    ``quality_filter.weights``.

    ``label_col`` is a numeric/boolean 0-or-1 column; rows with NULL
    label or token-less text are skipped (they carry no gradient).

    100 TB shape: featurization runs ONCE — tokenize/hash in-row, one
    groupBy(doc, bucket) whose exchange carries at most
    min(total tokens, docs × n_features) rows, pinned by
    ``localCheckpoint`` so the per-step lineage doesn't re-tokenize the
    corpus. Each step is one groupBy(doc) margin aggregate, an id join
    of the per-doc error back to the sparse features, and one
    groupBy(bucket) gradient aggregate that collects exactly
    ``n_features`` rows to the driver — the model is the only
    driver-side state, exactly like the centroid loop in
    ``similarity.ivf_train``.
    """
    import math

    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    if steps < 1:
        raise ValueError("steps must be >= 1")
    bucket = _hashed_bucket_sql("__t", n_features=n_features, seed=seed)
    feats = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("double").alias("__y"),
            tokens(F.col(text_col)).alias("__tk"),
        )
        .filter(F.col("__y").isNotNull() & (F.size("__tk") > 0))
        .select(
            "__id", "__y", F.size("__tk").alias("__n"),
            F.explode("__tk").alias("__t"),
        )
        .groupBy("__id", "__y", "__n", F.expr(bucket).alias("__b"))
        .agg((F.count(F.lit(1)) / F.first("__n")).alias("__x"))
        .select("__id", "__y", "__b", "__x")
        .localCheckpoint()
    )
    n_docs = feats.select("__id").distinct().count()
    if n_docs == 0:
        raise ValueError("no trainable rows (all labels NULL or texts empty)")
    w = [0.0] * n_features
    b = 0.0
    for _ in range(int(steps)):
        wlit = lit_double_array(w)
        errs = (
            feats.groupBy("__id", "__y")
            .agg(
                F.sum(
                    F.col("__x") * F.element_at(wlit, F.col("__b").cast("int") + 1)
                ).alias("__m")
            )
            .select(
                "__id",
                (
                    1.0 / (1.0 + F.exp(-(F.col("__m") + F.lit(b)))) - F.col("__y")
                ).alias("__e"),
            )
        )
        # one row per doc — cache so the feature-gradient join and the
        # bias gradient don't each recompute the margin aggregate
        errs = errs.cache()
        try:
            grad_rows = (
                feats.join(errs, "__id")
                .groupBy("__b")
                .agg(F.sum(F.col("__e") * F.col("__x")).alias("__g"))
                .collect()
            )
            grad_b = errs.agg(F.sum("__e")).first()[0]
        finally:
            errs.unpersist()
        g = [0.0] * n_features
        for r in grad_rows:
            g[int(r["__b"])] = float(r["__g"])
        w = [
            wi - lr * (gi / n_docs + l2 * wi)
            for wi, gi in zip(w, g)
        ]
        b -= lr * float(grad_b) / n_docs
    if any(math.isnan(v) or math.isinf(v) for v in w + [b]):
        raise ValueError("training diverged — lower lr")
    return w, b


def bpe_merges(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 8,
) -> DataFrame:
    """Iterated BPE training (VERDICT r4 ask #4): run ``n_merges``
    rounds of the merge-rule selection ``bpe_pair_counts`` computes one
    round of — each round counts adjacent symbol pairs over the corpus
    word frequencies, picks the most frequent pair (count desc, pair
    asc — deterministic), and re-segments every word by that rule.
    Returns (merge_rank, sym_a, sym_b, merged, n_pairs): the first
    ``n_merges`` merge rules, i.e. the tokenizer-training artifact.

    Representation trick that keeps BOTH training rounds and the oracle
    replay in plain string ops: a word's segmentation is a DOUBLE-
    delimited string (``abc`` → ``||a||b||c||``), and applying merge
    (a, b) is ``replace(seg, '|a||b|', '|ab|')`` — plain substring
    replace scans left-to-right non-overlapping, which IS greedy BPE
    merge order. The doubled delimiter is load-bearing: each ``||``
    boundary donates one ``|`` to each neighboring match, so ADJACENT
    applications of the same rule all fire in one pass
    (``||a||b||a||b||`` → ``||ab||ab||``; a single-delimiter encoding
    would consume the shared boundary and miss every second
    occurrence), while ``|a|`` can still only match a COMPLETE symbol.
    No array folds, no per-round UDFs; symbols are alnum-only by the
    tokenizer, so rule literals can never collide with the delimiter.

    100 TB shape: the corpus is reduced ONCE to the (distinct word,
    count) table — the only corpus-wide shuffle, map-side combined,
    pinned with ``localCheckpoint`` so later rounds never re-tokenize.
    Each round is one pair-count aggregate over the VOCABULARY (orders
    of magnitude smaller than the corpus), a 1-row driver collect (the
    argmax — the model is the only driver state, like ``ivf_train``'s
    centroids), and a per-row ``replace`` projection. Merge rules ride
    into the plan as literals, the way ``hashed_linear_expr`` inlines
    its weights.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    seg = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wc"))
        .select(
            F.concat(
                F.lit("||"), F.regexp_replace(F.col("__w"), "(.)", "$1||")
            ).alias("__s"),
            "__wc",
        )
        .localCheckpoint()
    )
    pairs_expr = (
        "transform(sequence(1, size(__sy) - 1), "
        "i -> struct(element_at(__sy, i) as a, element_at(__sy, i + 1) as b))"
    )
    rules = []
    for rank in range(1, int(n_merges) + 1):
        top = (
            seg.select(
                F.expr("filter(split(__s, '[|]'), x -> x != '')").alias("__sy"),
                "__wc",
            )
            # sequence(1, 0) would be DESCENDING [1, 0] under non-ANSI
            # sessions (the trap bpe_pair_counts documents) — gate first
            .filter(F.size("__sy") >= 2)
            .select(F.explode(F.expr(pairs_expr)).alias("__p"), "__wc")
            .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
            .agg(F.sum("__wc").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        rules.append((rank, a, b, a + b, n))
        seg = seg.select(
            F.expr(f"replace(__s, '|{a}||{b}|', '|{a}{b}|')").alias("__s"),
            "__wc",
        )
    return spark.createDataFrame(
        rules,
        "merge_rank int, sym_a string, sym_b string, merged string, n_pairs long",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: Sequence["tuple[str, str]"],
    *,
    head_n: int = 10,
) -> DataFrame:
    """Apply a trained BPE merge table (``bpe_merges`` output) to
    tokenize text into subwords — the other half of tokenizer training:
    train once, inline the rules as literals, encode anywhere. Per
    word: double-delimit (``abc`` → ``||a||b||c||``), apply the merges
    IN TRAINING ORDER as chained substring replaces (identical
    semantics to the training rounds' re-segmentation, so encoding a
    training word reproduces its training segmentation), split back to
    subwords.

    Returns (id_col, n_words, n_subwords, subwords_per_word,
    head_subwords): counts are NULL for NULL text (matching the
    oracle's ``len(NULL)``), ``subwords_per_word`` is the compression
    diagnostic (1.0 = no merges fired), ``head_subwords`` the first
    ``head_n`` subwords joined with spaces for value-level verification.

    100 TB shape: a PURE PROJECTION — tokenize, per-word replace chain,
    split, flatten, all in-row; zero shuffles, no vocabulary join. The
    merge table rides as k string literals exactly like
    ``hashed_linear_expr`` inlines its weights; k chained replaces per
    word is O(k · len), the classic tokenizer-apply cost.
    """
    if not merges:
        raise ValueError("merges must be non-empty (train with bpe_merges)")
    for a, b in merges:
        if not a or not b:
            raise ValueError(f"empty symbol in merge rule ({a!r}, {b!r})")

    def encode_word(w: Column) -> Column:
        cur = F.concat(F.lit("||"), F.regexp_replace(w, "(.)", "$1||"))
        for a, b in merges:
            cur = F.replace(cur, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        return F.filter(F.split(cur, "[|]"), lambda s: s != "")

    tk = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).select(
        id_col,
        "__tk",
        F.flatten(F.transform("__tk", encode_word)).alias("__sw"),
    )
    n_words = F.when(F.col("__tk").isNotNull(), F.size("__tk")).cast("long")
    n_sub = F.when(F.col("__tk").isNotNull(), F.size("__sw")).cast("long")
    return tk.select(
        id_col,
        n_words.alias("n_words"),
        n_sub.alias("n_subwords"),
        F.when(
            F.size("__tk") > 0, F.round(F.size("__sw") / F.size("__tk"), 6)
        ).alias("subwords_per_word"),
        F.when(
            F.col("__tk").isNotNull(),
            F.array_join(F.slice("__sw", 1, int(head_n)), " "),
        ).alias("head_subwords"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    *,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies — the statistic a
    BPE tokenizer-training round consumes (the top pair IS the next
    merge rule): count each within-word adjacent symbol pair, weighted
    by word frequency. Returns the top ``k`` (sym_a, sym_b, n_pairs)
    rows, count desc then pair asc — deterministic.

    100 TB shape: ONE word-count shuffle (map-side combined — the
    exchange carries distinct words per partition, not tokens), then
    pair expansion happens IN-ROW on the distinct-word table (tiny
    relative to the corpus) before a second small aggregate; top-k is
    TakeOrderedAndProject. Iterating real BPE training (re-segment,
    recount) keeps this exact plan per round with the merge table as a
    literal, the way ``hashed_linear_expr`` inlines its model.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wc"))
    )
    # length-1 words have no pairs; sequence(1, 0) would be DESCENDING
    # [1, 0] (the non-ANSI sequence trap), so gate on length >= 2
    pairs = (
        f"CASE WHEN length(__w) < 2 THEN array() "
        f"ELSE transform(sequence(1, length(__w) - 1), "
        f"i -> struct(substring(__w, i, 1) as a, substring(__w, i + 1, 1) as b)) END"
    )
    return (
        words.select(F.explode(F.expr(pairs)).alias("__p"), F.col("__wc"))
        .groupBy(
            F.col("__p.a").alias("sym_a"), F.col("__p.b").alias("sym_b")
        )
        .agg(F.sum("__wc").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("sym_a"), F.col("sym_b"))
        .limit(k)
    )


def readability_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    decimals: int = 4,
) -> DataFrame:
    """Flesch reading-ease per document — the classic curation signal
    between raw length stats and a trained quality model ("drop
    documents written like tax code" / "keep children's-book-simple
    text for early curriculum phases"): ``206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words)``. Words are the engine's
    standard alnum tokens; sentences are runs of ``[.!?]`` (min 1 so
    fragments still score); syllables use the standard vowel-group
    proxy (runs of ``[aeiouy]``) — the published approximation every
    non-dictionary implementation uses. Zero-token docs return NULL
    (nothing to score). A pure one-pass projection: three regexp
    counts, no shuffle, trivially 100 TB-safe; every count is an exact
    integer, so the only float math is the final rounded formula and a
    DuckDB oracle replays it bit-for-bit. NULL text scores NULL across
    the board (explicitly gated: non-ANSI ``size(NULL)`` would
    otherwise fabricate ``n_words = -1`` — the repo's catalogued
    size-of-null bug class)."""
    t = F.col(text_col)
    nn = t.isNotNull()
    lower = F.lower(t)
    n_words = F.when(
        nn,
        F.size(
            F.filter(
                F.split(lower, "[^a-z0-9]+"), lambda x: x != F.lit("")
            )
        ),
    ).cast("long")
    n_sent = F.when(
        nn, F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1))
    ).cast("long")
    n_syl = F.when(nn, F.regexp_count(lower, F.lit("[aeiouy]+"))).cast(
        "long"
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent)
        - F.lit(84.6) * (n_syl.cast("double") / n_words),
        decimals,
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        F.when(n_words > 0, flesch).alias("flesch"),
    )


def pii_incidence(
    df: DataFrame,
    text_col: str,
    group_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-slice PII incidence report: what share of documents in each
    group contain a URL / email / phone-like run — the measurement
    BEFORE the ``scrub_text`` rewrite (same regexes, so the report and
    the scrubber can never disagree about what counts as PII) and the
    sign-off after it (post-scrub shares must be 0). One map-side-
    combined aggregate over boolean flags; NULL-text docs count in
    n_docs with no PII. Returns (group, n_docs, url_share, email_share,
    phone_share, any_pii_share)."""
    t = F.col(text_col)
    url = (t.isNotNull() & (F.regexp_count(t, F.lit(URL_RE)) > 0)).cast("int")
    email = (t.isNotNull() & (F.regexp_count(t, F.lit(EMAIL_RE)) > 0)).cast("int")
    phone = (t.isNotNull() & (F.regexp_count(t, F.lit(PHONE_RE)) > 0)).cast("int")
    n = F.count(F.lit(1))

    def share(flag):
        return F.round(F.sum(flag).cast("double") / n, decimals)

    return df.groupBy(F.col(group_col)).agg(
        n.alias("n_docs"),
        share(url).alias("url_share"),
        share(email).alias("email_share"),
        share(phone).alias("phone_share"),
        share(F.greatest(url, email, phone)).alias("any_pii_share"),
    )


def span_corruption(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_tokens: int = 5,
    mask_permille: int = 150,
    seed: str = "sc0",
) -> DataFrame:
    """T5-style span-corruption pair generation, DETERMINISTIC: cut
    each document into ``span_tokens``-token spans on a fixed grid and
    mask each span with probability ``mask_permille``/1000 decided by
    the portable md5 hash of (doc_id, span_index, seed) — the masked
    input/target training pairs of denoising pre-training, minus the
    RNG (re-runs, engines, and incremental appends corrupt the exact
    same spans, so the dataset is reproducible and the DuckDB oracle
    replays it bit-for-bit). Masked span K (0-based order among masked
    spans) becomes ``<extra_id_K>`` in the input; the target is the
    ``<extra_id_K> span-text`` concatenation, '' when nothing masked.
    Zero-token docs are dropped (nothing to corrupt — the span-op
    contract). Returns (id, n_spans, n_masked, input_text,
    target_text).

    Scale shape: ENTIRELY in-row (tokenize → grid spans → hash flags →
    sentinel rewrite are higher-order expressions in one projection) —
    zero shuffles, the same class as ``intradoc_span_dedup``; per-row
    cost O(spans²) from the running masked-count, bounded by doc
    length / span_tokens."""
    from ..functions import md5_hash60, tokens as _tokens
    from .dedup import _span_segments

    k = int(span_tokens)
    if k < 1:
        raise ValueError("span_tokens must be >= 1")
    if not 0 <= int(mask_permille) <= 1000:
        raise ValueError(f"mask_permille must be in [0,1000], got {mask_permille}")
    base = df.select(
        F.col(id_col),
        F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>")).alias(
            "__tk"
        ),
    ).filter(F.size("__tk") > 0)
    staged = base.withColumn(
        "__segs", _span_segments(F.col("__tk"), k)
    ).withColumn(
        "__flags",
        span_mask_flags_expr(
            F.col(id_col), F.col("__segs"), mask_permille=mask_permille, seed=seed
        ),
    )
    inp, tgt = span_corruption_exprs(F.col("__segs"), F.col("__flags"))
    return staged.select(
        F.col(id_col),
        F.size("__segs").cast("long").alias("n_spans"),
        F.size(F.filter("__flags", lambda x: x)).cast("long").alias("n_masked"),
        inp.alias("input_text"),
        tgt.alias("target_text"),
    )


def span_mask_flags_expr(
    id_expr: Column, segs: Column, *, mask_permille: int, seed: str
) -> Column:
    """array<boolean> mask decisions for a STAGED segment-array column:
    span j of document ``id_expr`` is masked iff the portable
    (id, j, seed) md5 hash lands under ``mask_permille``. Shared by
    ``span_corruption`` and the compiler's declarative ``augment:``
    stage (stage ``segs`` with ``withColumn`` first — the hash lambda
    re-evaluates inlined expressions per element)."""
    from ..functions import md5_hash60

    return F.transform(
        F.sequence(F.lit(0), F.size(segs) - 1),
        lambda j: md5_hash60(
            F.concat(
                id_expr.cast("string"),
                F.lit(":"),
                j.cast("string"),
                F.lit(":" + seed),
            )
        )
        % 1000
        < F.lit(int(mask_permille)),
    )


def span_corruption_exprs(segs: Column, flags: Column) -> tuple[Column, Column]:
    """(input_text, target_text) sentinel-rewrite expressions over
    STAGED segment/flag array columns (see ``span_corruption`` for the
    contract). Exposed so the declarative ``augment:`` stage can attach
    the pair columns in-row without a join."""

    def k_before(j):
        # masked spans strictly before j — the sentinel index
        return F.size(F.filter(F.slice(flags, 1, j), lambda x: x))

    inp = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.size(segs) - 1),
            lambda j: F.when(
                F.element_at(flags, j + 1),
                F.concat(F.lit("<extra_id_"), k_before(j).cast("string"), F.lit(">")),
            ).otherwise(F.element_at(segs, j + 1)),
        ),
        " ",
    )
    tgt = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.size(segs) - 1),
                lambda j: F.when(
                    F.element_at(flags, j + 1),
                    F.concat(
                        F.lit("<extra_id_"),
                        k_before(j).cast("string"),
                        F.lit("> "),
                        F.element_at(segs, j + 1),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    return inp, tgt


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_word_ratio: str = "0.1",
    max_bullet_line_share: str = "0.9",
    max_ellipsis_line_share: str = "0.3",
    min_alpha_word_share: str = "0.8",
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher/MassiveText-style HARD rule gate (Rae et al. 2021 §A1.1,
    the production ancestor of Dolma/RefinedWeb filters): per-document
    boolean verdict per rule + the list of failed rule names →
    ``(id, n_words, r_word_count, r_mean_word_len, r_symbol_ratio,
    r_bullet_lines, r_ellipsis_lines, r_alpha_words, r_stopwords,
    failed_rules, keep)``. The categorical complement of the continuous
    ``quality_score``: a release gate needs WHICH rule failed (for
    per-rule loss dashboards and appeal review), not a blended scalar.
    Ratio thresholds are passed as DECIMAL STRINGS and compared via
    exact integer cross-multiplication (count * denom_scale vs
    threshold_num * denom) — no float-boundary drift between engines.

    100 TB shape: one zero-shuffle projection — every rule is a
    JVM-side expression over the token/line arrays staged once per row;
    compose with a filter on ``keep`` for the gate itself.
    """
    from ..functions import tokens as _tokens

    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.select(
        F.col(id_col),
        t.alias("__t"),
        _tokens(t).alias("__tk"),
        F.split(t, "\n").alias("__ln"),
    )
    rules = gopher_rule_conds(
        F.col("__t"),
        F.col("__tk"),
        F.col("__ln"),
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        max_bullet_line_share=max_bullet_line_share,
        max_ellipsis_line_share=max_ellipsis_line_share,
        min_alpha_word_share=min_alpha_word_share,
        min_stopword_hits=min_stopword_hits,
    )
    failed = gopher_failed_expr(rules)
    return staged.select(
        F.col(id_col),
        F.size("__tk").cast("long").alias("n_words"),
        *[cond.alias(f"r_{name}") for name, cond in rules],
        F.array_join(failed, ",").alias("failed_rules"),
        (F.size(failed) == 0).alias("keep"),
    )


def gopher_rule_conds(
    t: Column,
    tk: Column,
    ln: Column,
    *,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_word_ratio: str = "0.1",
    max_bullet_line_share: str = "0.9",
    max_ellipsis_line_share: str = "0.3",
    min_alpha_word_share: str = "0.8",
    min_stopword_hits: int = 2,
) -> list[tuple[str, Column]]:
    """The 7 Gopher rule conditions as (name, boolean Column) pairs over
    ALREADY-STAGED text / token-array / line-array columns (stage them
    with ``withColumn`` first — expressions inlined into higher-order
    lambdas re-evaluate per element). Shared by ``gopher_rules`` and the
    compiler's declarative ``quality_filter: {method: gopher}`` gate."""

    def _ratio(s: str) -> tuple[int, int]:
        from decimal import Decimal

        d = Decimal(s)
        scale = 10 ** max(0, -d.as_tuple().exponent)
        return int(d * scale), scale

    sym_n, sym_d = _ratio(max_symbol_word_ratio)
    bul_n, bul_d = _ratio(max_bullet_line_share)
    ell_n, ell_d = _ratio(max_ellipsis_line_share)
    alp_n, alp_d = _ratio(min_alpha_word_share)

    n_words = F.size(tk)
    n_lines = F.size(ln)
    sum_wl = F.aggregate(tk, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    n_symbols = (
        F.length(t)
        - F.length(F.regexp_replace(t, "#", ""))
        + F.size(F.regexp_extract_all(t, F.lit(r"(\.\.\.|…)"), 0))
    )
    n_bullet = F.size(F.filter(ln, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ellipsis = F.size(F.filter(ln, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
    n_alpha = F.size(F.filter(tk, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tk),
            F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
        )
    )
    return [
        ("word_count", (n_words >= min_words) & (n_words <= max_words)),
        (
            "mean_word_len",
            (sum_wl >= F.lit(min_mean_word_len) * n_words)
            & (sum_wl <= F.lit(max_mean_word_len) * n_words),
        ),
        ("symbol_ratio", n_symbols * sym_d <= F.lit(sym_n) * n_words),
        ("bullet_lines", n_bullet * bul_d <= F.lit(bul_n) * n_lines),
        ("ellipsis_lines", n_ellipsis * ell_d <= F.lit(ell_n) * n_lines),
        ("alpha_words", n_alpha * alp_d >= F.lit(alp_n) * n_words),
        ("stopwords", stop_hits >= min_stopword_hits),
    ]


def gopher_failed_expr(rules: list[tuple[str, Column]]) -> Column:
    """array<string> of failed rule names from ``gopher_rule_conds``
    output; ``F.size(...) == 0`` is the keep condition."""
    return F.filter(
        F.array(*[F.when(~cond, F.lit(name)) for name, cond in rules]),
        lambda x: x.isNotNull(),
    )


# The Gopher rule-set's "must contain >= 2 of" English stop list.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in"]


def vocab_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str,
    *,
    top_terms: int = 20,
    decimals: int = 9,
) -> DataFrame:
    """Per-term Jensen-Shannon divergence contributions between two
    corpus slices' unigram distributions — "did the new crawl / the
    filtered corpus shift the token distribution, and WHICH words
    moved?": for every term, smoothed probabilities under each side
    (add-one over the union vocabulary) and its JSD contribution
    ``½(p_a·log2(2p_a/(p_a+p_b)) + p_b·log2(2p_b/(p_a+p_b)))``; the
    ``top_terms`` largest contributors are returned →
    ``(term, n_a, n_b, p_a, p_b, jsd_contrib)``, the drilldown behind a
    scalar drift score (summing the column over ALL terms gives total
    JSD; the numeric-column analog is ``reconcile.js_divergence``).
    Contributions are ROUNDED before the cutoff (round-before-rank)
    with the term as tiebreak.

    100 TB shape: one word-count aggregate per side (map-side
    combined), a full outer join on the term (word-count-shaped, the
    same exchange class as TF-IDF), one-row totals broadcast, and a
    TakeOrderedAndProject top-k — corpora never shuffle, only their
    vocabularies."""
    if top_terms < 1:
        raise ValueError(f"top_terms must be >= 1, got {top_terms}")

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("__t"))
            .groupBy("__t")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ca, cb = counts(a, "n_a"), counts(b, "n_b")
    joined = ca.join(cb, "__t", "full_outer").select(
        F.col("__t").alias("term"),
        F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
    )
    tot = F.broadcast(
        joined.agg(
            F.sum("n_a").alias("__ta"),
            F.sum("n_b").alias("__tb"),
            F.count(F.lit(1)).alias("__v"),
        )
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("__ta") + F.col("__v"))
    pb = (F.col("n_b") + 1).cast("double") / (F.col("__tb") + F.col("__v"))
    m2 = pa + pb  # 2 * midpoint
    contrib = F.lit(0.5) * (
        pa * F.log2(F.lit(2.0) * pa / m2) + pb * F.log2(F.lit(2.0) * pb / m2)
    )
    return (
        joined.crossJoin(tot)
        .select(
            "term",
            "n_a",
            "n_b",
            F.round(pa, decimals).alias("p_a"),
            F.round(pb, decimals).alias("p_b"),
            F.round(contrib, decimals).alias("jsd_contrib"),
        )
        .orderBy(F.col("jsd_contrib").desc(), F.col("term"))
        .limit(int(top_terms))
    )


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rate: float = 0.5,
    seed: str = "fim0",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    for a deterministic ``rate`` fraction of documents, cut the text at
    two hash-derived character positions into (prefix, middle, suffix)
    — the PSM triple the trainer reorders to teach infilling; the
    remaining documents pass through whole (prefix = text, empty
    middle/suffix), preserving ordinary left-to-right capability, per
    the paper's joint-training recipe. Character-level splits, again
    per the paper (robust mid-token splits beat token-aligned ones).

    No RNG anywhere (the (id, seed)-hash decides BOTH the apply flag
    and the two cut points), so re-runs, engines, and partitionings
    produce the identical corpus, and a SQL oracle replays every byte.
    NULL text is treated as empty. Zero shuffles: one projection.
    """
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    applied, prefix, middle, suffix = fim_exprs(
        F.col(id_col), F.col(text_col),
        rate_permille=int(round(rate * 1000)), seed=seed,
    )
    return df.select(
        F.col(id_col),
        applied.alias("fim_applied"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
    )


def fim_exprs(
    id_expr: Column,
    text_expr: Column,
    *,
    rate_permille: int = 500,
    seed: str = "fim0",
) -> tuple[Column, Column, Column, Column]:
    """The in-row expression core of ``fim_transform`` →
    ``(applied, prefix, middle, suffix)`` columns — shared with the
    compiler's declarative ``augment: {method: fim}`` stage so the two
    can never diverge (the same single-source rule as
    ``span_corruption_exprs``). Non-applied rows: whole text as prefix,
    empty middle/suffix."""
    from ..functions import md5_hash60

    def h(tag: str) -> Column:
        return md5_hash60(
            F.concat(id_expr.cast("string"), F.lit(f":{seed}:{tag}"))
        )

    s = F.coalesce(text_expr.cast("string"), F.lit(""))
    n = F.length(s)
    applied = h("apply") % 1000 < int(rate_permille)
    c1 = h("cut1") % (n + 1)
    c2 = h("cut2") % (n + 1)
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")
    prefix = F.when(applied, F.substring(s, 1, lo)).otherwise(s)
    middle = F.when(applied, F.substring(s, lo + 1, hi - lo)).otherwise(
        F.lit("")
    )
    suffix = F.when(applied, F.substring(s, hi + 1, n - hi)).otherwise(
        F.lit("")
    )
    return applied, prefix, middle, suffix
