"""Text-analysis queries (SURVEY.md §2.11): language-ID, quality scoring, tokenization, vocab statistics, LM proxies, chunking.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, text
from .queries_shared import (
    _BM25_SQL_CTES,
    _BM25_TERMS,
    _BPE_RULES,
    _CHUNK_ORACLE_CTE,
    _GOPHER_RULES_SQL,
    _QC_TRAINED_B,
    _QC_TRAINED_W,
    _QUALITY_SQL,
    _SHINGLE_CTE,
    _bpe_encode_sql,
    _bpe_merges_sql,
    _fim_sql,
    _hex2int_sql,
    _langid_sql,
    _nb_chain_sql,
    _span_corruption_sql,
    _t,
    query,
)


@query(
    "text_stats",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_re_tokens,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 / greatest(length(text), 1), 6) AS digit_ratio,
           round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                 / greatest(length(text), 1), 6) AS alpha_ratio,
           round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                 / greatest(length(text), 1), 6) AS punct_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface statistics + whitespace/BPE-ish token counting."""
    d = _t(spark, sf_dir, "documents")
    return text.text_stats(d, "text", "doc_id")


@query(
    "text_quality",
    """
    WITH s AS (
      SELECT doc_id,
             length(text) AS nc,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt,
             length(regexp_replace(text, '\\s+', '', 'g')) AS nonws,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct
      FROM documents
    )
    SELECT doc_id,
           round(0.3 * (CASE WHEN nonws::DOUBLE / greatest(nt, 1) BETWEEN 3 AND 10
                             THEN 1.0 ELSE 0.0 END)
               + 0.3 * (alpha::DOUBLE / greatest(nc, 1))
               + 0.2 * (1 - least(punct::DOUBLE / greatest(nc, 1) * 5, 1.0))
               + 0.2 * (CASE WHEN nc >= 100 THEN 1.0 ELSE nc / 100.0 END), 6) AS quality,
           (0.3 * (CASE WHEN nonws::DOUBLE / greatest(nt, 1) BETWEEN 3 AND 10
                        THEN 1.0 ELSE 0.0 END)
            + 0.3 * (alpha::DOUBLE / greatest(nc, 1))
            + 0.2 * (1 - least(punct::DOUBLE / greatest(nc, 1) * 5, 1.0))
            + 0.2 * (CASE WHEN nc >= 100 THEN 1.0 ELSE nc / 100.0 END)) >= 0.5 AS keep
    FROM s
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score + keep flag."""
    d = _t(spark, sf_dir, "documents")
    return text.quality_score(d, "text", "doc_id")


@query(
    "text_scrub",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               text,
               'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\s+', ' ', 'g')) AS clean_text,
           len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails
    FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/noise scrubbing (URL/email → placeholder tokens, whitespace
    normalization) + removal counts — ``text.scrub_documents``. The
    patterns avoid Java-only regex features so the oracle replicates
    replacement behavior exactly."""
    d = _t(spark, sf_dir, "documents")
    return text.scrub_documents(d, "text", "doc_id")


@query("text_langid", _langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID with deterministic tie-break."""
    d = _t(spark, sf_dir, "documents")
    return text.language_id(d, "text", "doc_id")


@query(
    "text_repetition",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(ts) AS n_words,
             round(len(list_distinct(ts))::DOUBLE / greatest(len(ts), 1), 6)
               AS distinct_word_frac
      FROM tk
    ),
    bg AS (
      SELECT doc_id,
             unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS b
      FROM tk WHERE len(ts) >= 2
    ),
    c AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
    agg AS (SELECT doc_id, max(n) AS top_bigram_n, sum(n)::BIGINT AS n_bigrams
            FROM c GROUP BY 1)
    SELECT base.doc_id, n_words, distinct_word_frac,
           coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(top_bigram_n, 0) AS top_bigram_n,
           round(coalesce(top_bigram_n, 0)::DOUBLE
                 / greatest(coalesce(n_bigrams, 0), 1), 6) AS top_bigram_frac
    FROM base LEFT JOIN agg USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text.py):
    distinct-word fraction + most-frequent-bigram fraction."""
    d = _t(spark, sf_dir, "documents")
    return text.repetition_signals(d, "text", "doc_id")


@query(
    "text_vocab_topk",
    """
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS t
          FROM documents)
    GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by frequency — the word-count
    shape (explode → partial-agg count → TakeOrderedAndProject); ties
    broken by token so the result set is deterministic."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens

    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@query(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 scoring terms per document. Term frequencies and
    document frequencies are two groupBys over one exploded token
    stream (word-count shape, map-side combined); the document-
    frequency table is vocabulary-sized and BROADCAST back onto the
    term stream; smooth idf = ln((N+1)/(df+1)) + 1. Scores are rounded
    BEFORE the per-doc ranking in both engines so near-tie ordering
    cannot diverge on last-ulp ln() differences; ties break by term."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    from .functions import tokens as _tokens

    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.count()
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * (F.log((F.lit(n) + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "score")
    )


@query(
    "text_chunk_windows",
    _CHUNK_ORACLE_CTE
    + """
    SELECT doc_id, chunk_idx, token_start, chunk_text, n_tokens FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (operators/chunking.py:chunk_by_tokens):
    every document exploded into 64-token windows with stride 48
    (16-token overlap). Flat-map projection — tokenize once, slice per
    window, no shuffle; the exact text of every chunk is oracled."""
    d = _t(spark, sf_dir, "documents")
    from .operators.chunking import chunk_by_tokens

    return chunk_by_tokens(d, "text", "doc_id", window=64, stride=48)


@query(
    "text_chunk_stats",
    _CHUNK_ORACLE_CTE
    + """
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max_by(n_tokens, chunk_idx) AS INT) AS last_chunk_tokens
    FROM chunks GROUP BY doc_id
    """,
)
def text_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk accounting (operators/chunking.py:chunk_stats) composed on
    top of chunk_by_tokens: per-doc sequence count, total tokens across
    chunks (overlap counted), and the tail-chunk length — one
    hash-aggregate keyed by doc id."""
    d = _t(spark, sf_dir, "documents")
    from .operators.chunking import chunk_by_tokens, chunk_stats

    chunks = chunk_by_tokens(d, "text", "doc_id", window=64, stride=48)
    return chunk_stats(chunks, "doc_id")


@query(
    "text_url_normalize",
    """
    WITH u AS (
      SELECT doc_id,
             'HTTP://Example' || (doc_id % 50)::VARCHAR || '.COM'
             || CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN '/'
                     ELSE '/P' || (doc_id % 5)::VARCHAR END
             || CASE WHEN doc_id % 7 = 0 THEN '#Frag' ELSE '' END AS url
      FROM documents
    ),
    n AS (
      SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS nf
      FROM u
    ),
    h AS (
      SELECT doc_id, url, nf,
             regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', 0) AS head
      FROM n
    ),
    c AS (
      SELECT doc_id, url,
             CASE WHEN head = '' THEN nf
                  ELSE regexp_replace(
                         regexp_replace(lower(head),
                                        '^(http://[^/:]+):80$', '\\1'),
                         '^(https://[^/:]+):443$', '\\1')
                       || CASE WHEN substr(nf, len(head) + 1) = '/'
                               THEN '' ELSE substr(nf, len(head) + 1) END
             END AS canonical
      FROM h
    )
    SELECT doc_id, url, canonical FROM c
    """,
)
def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Canonical-URL dedup blocking
    (operators/text.py:url_normalize): deterministic per-doc synthetic
    URLs (the fixture corpus carries none) exercising every rule —
    uppercase scheme/host lowered, :80 default port dropped, #fragment
    stripped, bare "/" path removed, path case preserved. The oracle
    replays each regex step."""
    from .operators.text import url_normalize

    d = _t(spark, sf_dir, "documents")
    u = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Example"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".COM"),
            F.when(F.col("doc_id") % 3 == 0, ":80").otherwise(""),
            F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(
                F.concat(F.lit("/P"), (F.col("doc_id") % 5).cast("string"))
            ),
            F.when(F.col("doc_id") % 7 == 0, "#Frag").otherwise(""),
        ).alias("url"),
    )
    return u.select("doc_id", "url", url_normalize(F.col("url")).alias("canonical"))


@query(
    "text_word_entropy",
    """
    WITH w AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
    a AS (SELECT doc_id, sum(c)::BIGINT AS n_words, count(*) AS n_distinct,
                 sum(c * log2(c)) AS s
          FROM c GROUP BY 1)
    SELECT doc_id, n_words, n_distinct,
           round(log2(n_words) - s / n_words, 6) AS entropy,
           round(CASE WHEN n_distinct > 1
                      THEN (log2(n_words) - s / n_words) / log2(n_distinct)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM a
    """,
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Shannon word-entropy quality signal
    (operators/text.py:word_entropy): H = log2(n) − Σ c·log2(c)/n in
    one pass over the exploded words (algebraic form avoids a second
    normalization join); norm_entropy rescales by the max possible
    log2(n_distinct). Word-count shuffle shape — the canonical
    well-scaling job."""
    d = _t(spark, sf_dir, "documents")
    return text.word_entropy(d, "text", "doc_id")


@query(
    "text_vocab_topk_pruned",
    # the SAME oracle as text_vocab_topk: the pruned path must give the
    # bit-identical exact answer or raise — never a different answer
    """
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS t
          FROM documents)
    GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50
    """,
)
def text_vocab_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-50 vocabulary via the BOUNDED-SHUFFLE path
    (operators/freq.py:heavy_hitters_exact): per-partition Misra-Gries
    candidates, broadcast semi-join recount, and a proof gate that
    raises rather than return an unproven answer. Same oracle as
    text_vocab_topk — the scale formulation must match the plain
    aggregate bit-for-bit."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    from .functions import tokens as _tokens
    from .operators.freq import heavy_hitters_exact

    toks = d.select(F.explode(_tokens(F.col("text"))).alias("token"))
    return heavy_hitters_exact(toks, "token", k=50, counters=4096)


@query(
    "text_vocab_approx_topk",
    # exact oracle: maxItemsTracked far exceeds the fixture vocabulary,
    # and the sketch is exact while nothing is evicted — same contract
    # as the Misra-Gries pruned path
    """
    SELECT t AS token, count(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    x -> x <> '')) AS t
          FROM documents)
    GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50
    """,
)
def text_vocab_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark's native ``approx_top_k`` sketch — the
    third sketch next to HLL distinct counts and approx percentiles.
    One aggregation to a fixed-size sketch per partition, merged on the
    driver side of the agg; the result explodes back to (token, n)
    rows re-sorted with the engine's deterministic tie-break."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens

    toks = d.select(F.explode(_tokens(F.col("text"))).alias("token"))
    # over-fetch (200 > 50) so count-ties AT the rank-50 boundary are
    # re-broken deterministically (n desc, token asc) — the sketch's own
    # truncation order at exactly k is unspecified and would flake the
    # differential gate on boundary ties
    sk = toks.agg(
        F.expr("approx_top_k(token, 200, 65536)").alias("top")
    )
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@query(
    "text_bm25_rank",
    _BM25_SQL_CTES
    + """
    SELECT doc_id, n_terms_hit, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BM25 retrieval scoring (operators/text.py:bm25_rank): rank
    the corpus against a fixed query-term bag with Lucene-style idf.
    Token stream is filtered to the 5 query terms BEFORE any shuffle;
    doc lengths are one word-count agg; top-20 compiles to
    TakeOrderedAndProject. Scores rounded before ranking, ties by id."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.bm25_rank(d, "text", "doc_id", _BM25_TERMS, top_k=20)


@query(
    "text_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    per_doc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
    corpus AS (SELECT w, sum(c)::BIGINT AS cw FROM per_doc GROUP BY 1),
    total AS (SELECT sum(cw) AS t FROM corpus),
    agg AS (
      SELECT per_doc.doc_id,
             sum(per_doc.c)::BIGINT AS n_tokens,
             sum(per_doc.c * log2(corpus.cw / total.t))
               / sum(per_doc.c) AS m
      FROM per_doc JOIN corpus USING (w) CROSS JOIN total
      GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(m, 6) AS mean_log2p,
           round(pow(2.0, -m), 4) AS ppl_proxy
    FROM agg
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Unigram log-probability quality signal
    (operators/text.py:unigram_logprob): per-doc mean log2 P(token)
    under the corpus' own unigram distribution, plus the 2^(−mean)
    perplexity proxy — the cheapest LM-style quality filter. Two
    word-count shuffles + one vocabulary join; the total-token count is
    the only driver scalar."""
    d = _t(spark, sf_dir, "documents")
    return text.unigram_logprob(d, "text", "doc_id")


@query(
    "text_nb_classifier",
    _nb_chain_sql("doc_id % 3 = 0")
    + """
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END)::BIGINT
             AS n_correct,
           round(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 4) AS accuracy
    FROM nbpred GROUP BY lang
    """,
)
def text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Multinomial Naive Bayes seed classifier
    (operators/text.py:nb_train/nb_score) — the one-pass MULTI-CLASS
    complement of the iterative binary ``train_hashed_linear``: train
    add-one-smoothed token likelihoods on the doc_id % 3 != 0 seed
    split with lang as the label, score the held-out third, and report
    per-language accuracy — the CCNet/GPT-3 quality-and-language
    filter recipe (label a seed set, one aggregate pass, score the
    corpus) exercised train-to-eval in one plan. Every stage is
    value-oracled: counts and smoothing are exact rationals, each
    log-likelihood 6-dp-rounded before the scoring sums (the
    unigram_logprob convention), argmax ties to the smallest label.
    Training is one word-count shuffle + label/vocab-sized aggregates;
    scoring multiplies the token stream by the (few) labels via
    broadcast joins and reduces with map-side combine."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    model, priors = text.nb_train(
        d.where(F.col("doc_id") % 3 != 0), "text", "lang"
    )
    test = d.where(F.col("doc_id") % 3 == 0)
    scored = text.nb_score(test, "doc_id", "text", model, priors)
    hit = F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0)
    return (
        scored.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(hit).cast("long").alias("n_correct"),
            F.round(F.sum(hit) / F.count(F.lit(1)), 4).alias("accuracy"),
        )
    )


@query(
    "text_ngram_novelty",
    _SHINGLE_CTE
    + """
    , flat AS (SELECT doc_id, unnest(shs) AS h FROM sh),
    dfq AS (SELECT h, count(*) AS df FROM flat GROUP BY 1)
    SELECT doc_id, count(*) AS n_shingles,
           round(avg(CASE WHEN dfq.df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
    FROM flat JOIN dfq USING (h)
    GROUP BY 1
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-doc n-gram novelty (operators/text.py:ngram_novelty):
    fraction of a doc's distinct 3-gram shingles appearing in no other
    document — ranks docs by genuinely new text. One narrow shingle
    stream, one word-count-shaped frequency aggregate, one join back."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.ngram_novelty(d, "text", "doc_id")


@query(
    "text_distinctive_terms",
    """
    WITH tok AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    cnt AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
    tot AS (SELECT lang, sum(c)::BIGINT AS t FROM cnt GROUP BY 1),
    gcnt AS (SELECT w, sum(c)::BIGINT AS g FROM cnt GROUP BY 1),
    gtot AS (SELECT sum(g) AS gt FROM gcnt),
    scored AS (
      SELECT cnt.lang, cnt.w, cnt.c,
             round(ln((cnt.c + 0.5) / (tot.t - cnt.c + 0.5))
                   - ln((gcnt.g - cnt.c + 0.5)
                        / (gtot.gt - tot.t - gcnt.g + cnt.c + 0.5)), 6)
               AS log_odds
      FROM cnt JOIN tot USING (lang) JOIN gcnt USING (w) CROSS JOIN gtot
    )
    SELECT lang, w AS term, c AS n, log_odds
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY log_odds DESC, w ASC) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-group distinctive vocabulary: top-5 terms per language
    by smoothed log-odds ratio of in-group vs out-of-group usage
    (Monroe et al.'s "Fightin' Words" ratio with ±0.5 smoothing) — the
    corpus-segmentation complement of per-doc TF-IDF. One word-count
    shuffle, a groups-sized totals broadcast, a vocabulary-sized
    global-counts join, round-before-rank + WindowGroupLimit top-k."""
    d = _t(spark, sf_dir, "documents")
    from .functions import tokens as _tokens

    tok = d.select("lang", F.explode(_tokens(F.col("text"))).alias("w"))
    cnt = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    glob = cnt.groupBy("w").agg(F.sum("c").alias("g"))
    # grand total as a 1-row broadcast frame (exchange reuse, no collect)
    gt = glob.agg(F.sum("g").cast("double").alias("gt"))
    lo = F.round(
        F.log((F.col("c") + 0.5) / (F.col("t") - F.col("c") + 0.5))
        - F.log(
            (F.col("g") - F.col("c") + 0.5)
            / (F.col("gt") - F.col("t") - F.col("g") + F.col("c") + 0.5)
        ),
        6,
    )
    scored = (
        cnt.join(F.broadcast(tot), "lang")
        .join(glob, "w")
        .crossJoin(F.broadcast(gt))
        .select("lang", "w", "c", lo.alias("log_odds"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("log_odds"), F.asc("w"))
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 5)
        .select("lang", F.col("w").alias("term"), F.col("c").alias("n"), "log_odds")
    )


@query(
    "text_unicode_normalize",
    """
    SELECT doc_id,
           nfc_normalize(substr(text, 1, 24) || 'e' || chr(769)) AS norm_text,
           length(substr(text, 1, 24) || 'e' || chr(769))
             - length(nfc_normalize(substr(text, 1, 24) || 'e' || chr(769)))
             AS codepoints_folded
    FROM documents
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Unicode NFC normalization
    (operators/transforms.py:op_normalize_unicode): each doc prefix gets
    a decomposed e+combining-acute appended, then normalizes — the
    é-as-two-codepoints mismatch that silently splits dedup groups,
    folded before comparison. The documented pandas_udf escape hatch:
    Arrow-batched vectorized Python (the JVM has no normalizer
    expression), columnar transfer, never per-row."""
    from .operators.transforms import op_normalize_unicode

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(F.substring(F.col("text"), 1, 24), F.lit("e\u0301"))
    norm = op_normalize_unicode(raw)
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        (F.length(raw) - F.length(norm)).alias("codepoints_folded"),
    )


@query(
    "text_zipf_slope",
    """
    WITH counts AS (
      SELECT w AS __w, count(*) AS __c
      FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                      x -> x <> '')) AS w
            FROM documents)
      GROUP BY 1
      ORDER BY __c DESC, __w ASC
      LIMIT 1000
    ),
    ranked AS (
      SELECT __c, row_number() OVER (ORDER BY __c DESC, __w ASC) AS __r
      FROM counts
    )
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(__c), ln(__r)), 6) AS zipf_slope,
           round(regr_r2(ln(__c), ln(__r)), 6) AS r2
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Zipf rank-frequency slope (operators/text.py:zipf_slope):
    OLS slope of ln(freq) vs ln(rank) over the top-1000 words — a
    one-row corpus-health metric (natural text ≈ −1; templated or
    synthetic corpora drift). One word-count shuffle + a bounded
    top-N."""
    d = _t(spark, sf_dir, "documents")
    return text.zipf_slope(d, "text", top_n=1000)


@query(
    "text_compression_ratio",
    """
    SELECT doc_id, length(text) AS n_chars, strlen(text) AS n_bytes,
           CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS within_bounds
    FROM documents
    """,
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] zlib compression-ratio redundancy signal
    (operators/text.py:compression_ratio). No SQL engine exposes a
    bit-identical codec, so the differential check is BOUNDED (the HLL
    pattern, VERDICT r7 ask #3): the query emits ``within_bounds`` —
    the implied compressed size (ratio × bytes) must sit inside zlib's
    hard guarantees (≥ 8-byte header+adler floor for nonempty input,
    ≤ raw + 5·ceil(raw/16383) + 6 stored-block worst case, plus
    1 + ceil(5e-7·raw) slack because the 6-dp-rounded ratio can
    overshoot the true compressed size by up to 5e-7·raw bytes) — and
    the oracle pins it TRUE per doc, plus both engines compute
    n_chars/n_bytes exactly. A ratio
    drifting outside the codec's envelope now hash-mismatches instead
    of passing a rows-only check; exact ratio values stay pinned in
    tests/test_text.py."""
    d = _t(spark, sf_dir, "documents")
    r = text.compression_ratio(d, "text", "doc_id")
    b = d.select("doc_id", F.octet_length("text").alias("n_bytes"))
    clen = F.col("compression_ratio") * F.col("n_bytes")
    return r.join(b, "doc_id").select(
        "doc_id",
        "n_chars",
        "n_bytes",
        F.when(F.col("n_bytes").isNull(), F.lit(None).cast("boolean"))
        .when(F.col("n_bytes") == 0, F.col("compression_ratio") == 0.0)
        .otherwise(
            (clen >= 8.0)
            & (
                clen
                <= F.col("n_bytes")
                + 5.0 * F.ceil(F.col("n_bytes") / 16383.0)
                + 7.0
                + F.ceil(F.col("n_bytes") * 5e-7)
            )
        )
        .alias("within_bounds"),
    )


@query(
    "text_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM toks,
           (SELECT unnest(range(1, (SELECT coalesce(max(len(ts)), 2)
                                    FROM toks))) AS i) ix
      WHERE len(ts) >= 2 AND i <= len(ts) - 1
    ),
    cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    cpre AS (SELECT w1, count(*) AS cp FROM bg GROUP BY 1)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(avg(log2(cbg.c / cpre.cp)), 6) AS mean_log2p
    FROM bg JOIN cbg USING (w1, w2) JOIN cpre USING (w1)
    GROUP BY 1
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Bigram conditional log-probability quality signal
    (operators/text.py:bigram_logprob): per-doc mean
    log2 P(w_i | w_{i-1}) under corpus bigram counts — scores fluency,
    not just word frequency. In-row bigram expansion + two word-count
    aggregates; every exchange carries (hash, count) pairs."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.bigram_logprob(d, "text", "doc_id")


@query(
    "text_quality_classifier",
    """
    SELECT doc_id,
           len(ts)::BIGINT AS n_tokens,
           CASE WHEN len(ts) > 0 THEN
             round(1.0 / (1.0 + exp(-(0.0 + list_sum(
               [ ((CAST("""
    + _hex2int_sql("md5(t || ':qc0')")
    + """ % 64 AS DOUBLE) * 37.0 + 11.0) % 97.0) / 97.0 - 0.5
                 FOR t IN ts ]) / len(ts)))), 6)
           END AS qc_score
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    )
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Hashing-trick linear quality classifier
    (operators/text.py:hashed_linear_score): tokens hashed into 64
    portable-md5 buckets, document scored by a sigmoid over the mean
    bucket weight — the fastText-style model-based filter, computed as
    a zero-shuffle pure projection. The oracle replays the hash, the
    closed-form weights, and the fold."""
    d = _t(spark, sf_dir, "documents")
    return text.hashed_linear_score(d, "text", "doc_id")


@query(
    "text_quality_classifier_trained",
    """
    SELECT doc_id,
           len(ts)::BIGINT AS n_tokens,
           CASE WHEN len(ts) > 0 THEN
             round(1.0 / (1.0 + exp(-("""
    + repr(_QC_TRAINED_B)
    + """ + list_sum(
               [ (["""
    + ", ".join(repr(v) for v in _QC_TRAINED_W)
    + """])[CAST("""
    + _hex2int_sql("md5(t || ':qc0')")
    + """ % 64 AS INT) + 1]
                 FOR t IN ts ]) / len(ts)))), 6)
           END AS qc_score
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    )
    """,
)
def text_quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Hashing-trick classifier with a TRAINED model inlined
    (operators/text.py:hashed_linear_score(weights=...) +
    train_hashed_linear): same zero-shuffle projection as
    ``text_quality_classifier``, but the per-bucket weights come from
    distributed logistic-regression training instead of the closed-form
    stand-in — the end-to-end path a production quality gate uses
    (train once → inline the literal model → score as a projection).
    The oracle replays the identical literal weight array indexed by
    the same portable md5 bucket."""
    d = _t(spark, sf_dir, "documents")
    return text.hashed_linear_score(
        d, "text", "doc_id", weights=_QC_TRAINED_W, bias=_QC_TRAINED_B
    )


@query(
    "chunk_length_batches",
    """
    SELECT doc_id, n_tokens, bucket,
           (bucket * 1099511627776 + ((rn - 1) // 8))::BIGINT AS batch_id
    FROM (
      SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
             row_number() OVER (
               PARTITION BY n_tokens // 64 ORDER BY ord, doc_id
             ) AS rn
      FROM (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''))::BIGINT AS n_tokens,
    """
    + _hex2int_sql("md5(CAST(doc_id AS VARCHAR) || ':lb0')")
    + """ AS ord
        FROM documents WHERE text IS NOT NULL
      )
    )
    """,
)
def chunk_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Length-bucketed inference batching
    (operators/chunking.py:length_bucket_batches): docs grouped into
    batches of 8 within 64-token length bands, numbered in portable
    hash order — similar-length batches pad minimally. The oracle
    replays the band, the hash order, and the batch arithmetic
    (2^40 = 1099511627776 stride keeps batch ids globally unique)."""
    from .operators.chunking import length_bucket_batches

    d = _t(spark, sf_dir, "documents")
    return length_bucket_batches(d, "text", "doc_id", bucket_tokens=64, batch_size=8)


@query(
    "text_bpe_pair_counts",
    """
    WITH words AS (
      SELECT w AS word, count(*) AS wc FROM (
        SELECT unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    pairs AS (
      SELECT substring(word, i, 1) AS sym_a,
             substring(word, i + 1, 1) AS sym_b,
             wc
      FROM (SELECT word, wc, unnest(range(1, len(word))) AS i
            FROM words WHERE len(word) >= 2)
    )
    SELECT sym_a, sym_b, sum(wc)::BIGINT AS n_pairs
    FROM pairs GROUP BY sym_a, sym_b
    ORDER BY n_pairs DESC, sym_a, sym_b
    LIMIT 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BPE merge statistics
    (operators/text.py:bpe_pair_counts): adjacent within-word character
    pairs weighted by word frequency, top-20 — the count a BPE
    tokenizer-training round consumes; pair expansion runs on the
    distinct-word table, never the raw corpus. The oracle replays the
    word count, the positional pair expansion, and the tie-break."""
    d = _t(spark, sf_dir, "documents")
    return text.bpe_pair_counts(d, "text", k=20)


@query("text_bpe_merges", _bpe_merges_sql(8))
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Iterated BPE tokenizer training
    (operators/text.py:bpe_merges): 8 merge rounds — per round, pair
    counts over the checkpointed (distinct word, count) table, argmax
    rule (count desc, pair asc), greedy re-segmentation via plain
    substring replace on delimiter-framed words. Returns the first 8
    merge rules with their pair counts. The oracle replays all 8
    rounds unrolled with the identical replace() semantics."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.bpe_merges(d, "text", n_merges=8)


@query("text_bpe_encode", _bpe_encode_sql(_BPE_RULES))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BPE tokenizer APPLICATION
    (operators/text.py:bpe_encode): the trained merge table (8 rules
    from ``text_bpe_merges``, literals above) applied per word as the
    identical chained-replace re-segmentation training used — per-doc
    word/subword counts, compression ratio, and the first 10 subwords.
    Pure projection, zero shuffles. The oracle replays the replace
    chain rule-for-rule."""
    d = _t(spark, sf_dir, "documents")
    return text.bpe_encode(d, "text", "doc_id", _BPE_RULES)


@query(
    "text_langid_confusion",
    """
    WITH pred AS ("""
    + _langid_sql()
    + """)
    SELECT d.lang AS declared, p.pred_lang AS predicted,
           count(*)::BIGINT AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Language-ID confusion matrix: the declared `lang` column
    crossed with the n-gram-marker classifier's prediction — the QA
    census every corpus pipeline runs to decide whether to trust its
    metadata (rows off the diagonal = mislabeled or ambiguous docs).
    Composes the oracled langid projection with one id join + a tiny
    census aggregate; the corpus-wide shuffle carries ids + two short
    strings."""
    d = _t(spark, sf_dir, "documents")
    pred = text.language_id(d, "text", "doc_id").select("doc_id", "pred_lang")
    return (
        d.select("doc_id", F.col("lang").alias("declared"))
        .join(pred, "doc_id")
        .groupBy("declared", F.col("pred_lang").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("declared", "predicted")
    )


@query(
    "text_vocab_richness",
    """
    WITH w AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS t
      FROM documents
    ),
    c AS (SELECT t, count(*)::BIGINT AS n FROM w GROUP BY t)
    SELECT count(*)::BIGINT AS vocab_size,
           sum(n)::BIGINT AS n_tokens,
           round(count(*) / sum(n)::DOUBLE, 6) AS type_token_ratio,
           sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_count,
           round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
             AS hapax_frac
    FROM c
    """,
)
def text_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Vocabulary-richness corpus health: type-token ratio and
    hapax-legomenon share — the lexical-diversity companions to the
    Zipf slope (template-generated or duplicated corpora crater the TTR
    and hapax share; natural text holds them up). ONE word-count
    shuffle (map-side combined) + a one-row summary."""
    from .functions import tokens as _tokens

    d = _t(spark, sf_dir, "documents")
    w = d.select(F.explode(_tokens(F.col("text"))).alias("t"))
    c = w.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("n").alias("n_tokens"),
        F.round(F.count(F.lit(1)) / F.sum("n"), 6).alias("type_token_ratio"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_frac"),
    )


@query(
    "text_classifier_calibration",
    """
    WITH scored AS (
      SELECT doc_id,
             CASE WHEN len(ts) > 0 THEN
               round(1.0 / (1.0 + exp(-("""
    + repr(_QC_TRAINED_B)
    + """ + list_sum(
                 [ (["""
    + ", ".join(repr(v) for v in _QC_TRAINED_W)
    + """])[CAST("""
    + _hex2int_sql("md5(t || ':qc0')")
    + """ % 64 AS INT) + 1]
                   FOR t IN ts ]) / len(ts)))), 6)
             END AS qc_score,
    """
    + _QUALITY_SQL
    + """ AS heur
      FROM (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ts
        FROM documents
      )
    )
    SELECT CAST(least(floor(qc_score * 10), 9) AS INTEGER) AS score_bin,
           count(*)::BIGINT AS n_docs,
           round(avg(qc_score), 6) AS mean_score,
           round(avg(CASE WHEN heur >= 0.5 THEN 1.0 ELSE 0.0 END), 6)
             AS heuristic_pass_rate
    FROM scored WHERE qc_score IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def text_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Classifier calibration (reliability) curve: the trained
    quality model's score deciles vs the heuristic gate's pass rate in
    each bin — the model-eval readout that says whether 0.8 "means"
    80% (a well-calibrated gate lets you set thresholds by target
    precision instead of guessing). Two zero-shuffle scoring
    projections + one 10-key census; NULL scores (empty docs)
    excluded."""
    from .operators.text import quality_expr

    d = _t(spark, sf_dir, "documents", fanout=True)
    scored = text.hashed_linear_score(
        d, "text", "doc_id", weights=_QC_TRAINED_W, bias=_QC_TRAINED_B
    ).join(d.select("doc_id", "text"), "doc_id")
    scored = scored.withColumn("heur", F.round(quality_expr(F.col("text")), 6))
    return (
        scored.filter(F.col("qc_score").isNotNull())
        .groupBy(
            F.least(F.floor(F.col("qc_score") * 10), F.lit(9))
            .cast("int")
            .alias("score_bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("qc_score"), 6).alias("mean_score"),
            F.round(
                F.avg(F.when(F.col("heur") >= 0.5, 1.0).otherwise(0.0)), 6
            ).alias("heuristic_pass_rate"),
        )
        .orderBy("score_bin")
    )


@query(
    "text_readability",
    """
    SELECT doc_id,
           len(ws)::BIGINT AS n_words,
           CASE WHEN text IS NOT NULL THEN
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           END::BIGINT AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
             AS n_syllables,
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
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Flesch reading-ease scores over the documents corpus
    (operators/text.py:readability_scores): vowel-group syllable proxy,
    punctuation-run sentences, alnum-token words — one zero-shuffle
    projection; all counts exact integers so the oracle replays the
    formula bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    return text.readability_scores(d, "text", "doc_id")


@query(
    "text_pii_incidence",
    r"""
    WITH f AS (
      SELECT lang,
             CASE WHEN text IS NOT NULL
                  AND regexp_matches(text, 'https?://[^\s]+')
                  THEN 1 ELSE 0 END AS u,
             CASE WHEN text IS NOT NULL
                  AND regexp_matches(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                  THEN 1 ELSE 0 END AS e,
             CASE WHEN text IS NOT NULL
                  AND regexp_matches(text, '\+?[0-9][0-9()\-. ]{7,}[0-9]')
                  THEN 1 ELSE 0 END AS p
      FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           round(sum(u)::DOUBLE / count(*), 6) AS url_share,
           round(sum(e)::DOUBLE / count(*), 6) AS email_share,
           round(sum(p)::DOUBLE / count(*), 6) AS phone_share,
           round(sum(greatest(u, e, p))::DOUBLE / count(*), 6)
             AS any_pii_share
    FROM f GROUP BY lang
    """,
)
def text_pii_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-language PII incidence
    (operators/text.py:pii_incidence): share of docs containing
    URLs/emails/phone-like runs, using the SAME regexes as scrub_text
    so the report and the scrubber can never disagree — the measure
    step before the rewrite and the zero-check after it. One aggregate,
    counts-only shuffle."""
    d = _t(spark, sf_dir, "documents")
    return text.pii_incidence(d, "text", "lang")


@query("text_span_corruption", _span_corruption_sql())
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic T5-style span-corruption pairs
    (operators/text.py:span_corruption): grid spans masked by the
    portable (doc, span, seed) hash at 15%, masked input with
    <extra_id_K> sentinels + extraction target — denoising pre-training
    data that is bit-reproducible across runs, engines, and appends.
    Entirely in-row (zero shuffles); the oracle replays hash, grid,
    sentinels, and reassembly exactly."""
    d = _t(spark, sf_dir, "documents")
    return text.span_corruption(
        d, "text", "doc_id", span_tokens=3, mask_permille=150
    )


@query("text_gopher_rules", _GOPHER_RULES_SQL)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Gopher/MassiveText hard rule gate
    (operators/text.py:gopher_rules): per-document verdict for each of
    the 7 classic rules (word count, mean word length, symbol ratio,
    bullet/ellipsis line shares, alpha-word share, stopword presence) +
    the failed-rule list — the categorical release gate next to the
    continuous quality_score. Ratio rules compare by exact integer
    cross-multiplication; one zero-shuffle projection. Oracle replays
    every rule bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    return text.gopher_rules(d, "text", "doc_id")


@query(
    "text_tokenizer_fertility",
    f"""
    SELECT d.lang,
           sum(e.n_words)::BIGINT AS total_words,
           sum(e.n_subwords)::BIGINT AS total_subwords,
           CASE WHEN sum(e.n_words) > 0
                THEN round(sum(e.n_subwords) / sum(e.n_words)::DOUBLE, 6)
           END AS fertility
    FROM ({_bpe_encode_sql(_BPE_RULES)}) e
    JOIN documents d ON d.doc_id = e.doc_id
    GROUP BY d.lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Tokenizer fertility per language: corpus subwords-per-word
    of the trained BPE merge table, per lang slice — the tokenizer
    health readout (a language with outsized fertility pays more
    sequence length per word and needs merges or vocab). Composes the
    zero-shuffle bpe_encode projection with one id-equi join + tiny
    per-lang aggregate; fertility from INTEGER subword/word totals
    (sum-then-divide), so engines agree exactly."""
    d = _t(spark, sf_dir, "documents")
    enc = text.bpe_encode(d, "text", "doc_id", _BPE_RULES)
    return (
        enc.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_subwords").cast("long").alias("total_subwords"),
            F.when(
                F.sum("n_words") > 0,
                F.round(
                    F.sum("n_subwords") / F.sum("n_words").cast("double"), 6
                ),
            ).alias("fertility"),
        )
    )


@query(
    "text_contrastive_views",
    f"""
    WITH a AS ({_span_corruption_sql(k=3, permille=300, seed="cv_a")}),
         b AS ({_span_corruption_sql(k=3, permille=300, seed="cv_b")})
    SELECT a.doc_id,
           a.input_text AS view_a,
           b.input_text AS view_b,
           (a.input_text <> b.input_text) AS views_differ
    FROM a JOIN b ON a.doc_id = b.doc_id
    """,
)
def text_contrastive_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Contrastive two-view augmentation (SimCSE/InfoNCE input
    prep): two INDEPENDENT deterministic span corruptions of every
    document (seeds cv_a/cv_b at 30% masking) — the positive-pair
    generator of contrastive representation training, reproducible
    across runs and engines because the masks are (doc, span, seed)
    hashes, not RNG. Both views are zero-shuffle projections of the
    same scan; the id-equi self-join is the only exchange. Oracle
    replays both corruptions and the pairing."""
    d = _t(spark, sf_dir, "documents")
    a = text.span_corruption(
        d, "text", "doc_id", span_tokens=3, mask_permille=300, seed="cv_a"
    ).select("doc_id", F.col("input_text").alias("view_a"))
    b = text.span_corruption(
        d, "text", "doc_id", span_tokens=3, mask_permille=300, seed="cv_b"
    ).select("doc_id", F.col("input_text").alias("view_b"))
    return a.join(b, "doc_id").select(
        "doc_id",
        "view_a",
        "view_b",
        (F.col("view_a") != F.col("view_b")).alias("views_differ"),
    )


@query(
    "text_vocab_divergence",
    """
    WITH ca AS (
      SELECT t, count(*)::BIGINT AS c
      FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
                     '[^a-z0-9]+'), x -> x <> '')) AS t
            FROM documents WHERE doc_id % 3 = 0)
      GROUP BY t
    ),
    cb AS (
      SELECT t, count(*)::BIGINT AS c
      FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
                     '[^a-z0-9]+'), x -> x <> '')) AS t
            FROM documents WHERE doc_id % 3 <> 0)
      GROUP BY t
    ),
    j AS (
      SELECT coalesce(ca.t, cb.t) AS term,
             coalesce(ca.c, 0)::BIGINT AS n_a,
             coalesce(cb.c, 0)::BIGINT AS n_b
      FROM ca FULL JOIN cb ON ca.t = cb.t
    ),
    tot AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb,
                   count(*)::BIGINT AS v
            FROM j),
    p AS (
      SELECT term, n_a, n_b,
             (n_a + 1)::DOUBLE / (tot.ta + tot.v) AS pa,
             (n_b + 1)::DOUBLE / (tot.tb + tot.v) AS pb
      FROM j, tot
    )
    SELECT term, n_a, n_b,
           round(pa, 9) AS p_a, round(pb, 9) AS p_b,
           round(0.5 * (pa * log2(2.0 * pa / (pa + pb))
                      + pb * log2(2.0 * pb / (pa + pb))), 9) AS jsd_contrib
    FROM p
    ORDER BY jsd_contrib DESC, term
    LIMIT 20
    """,
)
def text_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Vocabulary drift drilldown
    (operators/text.py:vocab_divergence): the 20 terms contributing
    most Jensen-Shannon divergence between the 'new ingest' slice
    (doc_id % 3 == 0) and the rest of the corpus — the which-words-
    moved report behind a scalar drift score (the token analog of the
    numeric js_divergence sign-off). Word-count aggregates + one
    vocab-shaped full outer join + broadcast totals + TakeOrdered;
    corpora never shuffle. Oracle replays the smoothing and the log2
    contributions."""
    from .operators.text import vocab_divergence

    d = _t(spark, sf_dir, "documents")
    return vocab_divergence(
        d.filter(F.col("doc_id") % 3 == 0),
        d.filter(F.col("doc_id") % 3 != 0),
        "text",
    )


@query("text_fim_transform", _fim_sql())
def text_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Fill-in-the-middle transform (operators/text.py:
    fim_transform, Bavarian et al. 2022): a deterministic 50% of docs
    cut at two (id, seed)-hash character positions into PSM
    (prefix, middle, suffix) triples; the rest pass through whole —
    the joint FIM+AR training mix. No RNG, zero shuffles; the oracle
    replays apply flags, cut points, and every substring byte."""
    from .operators.text import fim_transform

    d = _t(spark, sf_dir, "documents")
    return fim_transform(d, "doc_id", "text")
