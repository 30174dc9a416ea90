"""Deduplication / entity-resolution / graph queries (SURVEY.md §2.11): exact/fingerprint/MinHash/SimHash/span dedup, ER, PageRank, skew joins.

Split out of the original single-module registry (r11): registration
order is restored by ``queries.py``; behavior is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, text
from .operators import multimodal
from .queries_shared import (
    _MINHASH_IX_PARAMS,
    _NGRAM_DECON_SQL,
    _SHINGLE_CTE,
    _bloom_probe_sql,
    _lpa_sql,
    _minhash_ix_dir,
    _minhash_pairs_cached,
    _pagerank_sql,
    _simhash_sql,
    _t,
    _winnow_sql,
    query,
)


@query(
    "dedup_exact_keys",
    """
    SELECT lang, source, min(doc_id) AS doc_id, count(*) AS dup_count
    FROM documents GROUP BY lang, source
    """,
)
def dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a key set: one survivor (min id) per group."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, ["lang", "source"], "doc_id")


@query(
    "dedup_fingerprint",
    """
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS doc_id, count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text md5 fingerprint dedup."""
    d = _t(spark, sf_dir, "documents")
    return dedup.fingerprint_dedup(d, "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    _SHINGLE_CTE
    + """
    SELECT a.doc_id AS id_i, b.doc_id AS id_j,
           round(len(list_intersect(a.shs, b.shs))::DOUBLE
                 / len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
    FROM sh a, sh b
    WHERE a.doc_id < b.doc_id
      AND len(list_intersect(a.shs, b.shs))::DOUBLE
          / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (inverted-index join)."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.8)


@query(
    "dedup_minhash",
    _SHINGLE_CTE
    + """
    SELECT a.doc_id AS id_i, b.doc_id AS id_j,
           round(len(list_intersect(a.shs, b.shs))::DOUBLE
                 / len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
    FROM sh a, sh b
    WHERE a.doc_id < b.doc_id
      AND len(list_intersect(a.shs, b.shs))::DOUBLE
          / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified. The oracle is the
    exact Jaccard pair set: with 128 hashes / 32 bands the probability
    of LSH missing a ≥0.8 pair is < 1e-7 per pair, and candidates are
    exact-verified, so the outputs coincide."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.minhash_near_dups(
        d, "doc_id", "text", shingle_n=3, num_hashes=128, bands=32, threshold=0.8
    )


@query(
    "dedup_clusters",
    # exact-Jaccard pairs (same argument as dedup_minhash: LSH at
    # 128/32 + exact verification coincides with the exact pair set)
    # + transitive closure via recursive CTE → min-id component labels.
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
    )
    SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: MinHash+LSH pairs → connected
    components via iterative min-label propagation
    (``dedup.near_dup_clusters``) — the step that turns pair output
    into dedup groups + survivor choice (min id per cluster)."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    pairs = dedup.minhash_near_dups(
        d, "doc_id", "text", shingle_n=3, num_hashes=128, bands=32, threshold=0.8
    )
    return dedup.near_dup_clusters(pairs)


@query("dedup_simhash", _simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 on 60-bit signatures). The
    token hash is md5-derived (``functions.md5_hash60``) specifically so
    the whole operator is oracle-checkable bit-for-bit."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.simhash_near_dups(d, "doc_id", "text", max_hamming=3)


@query(
    "doc_fingerprint",
    # min(md5(shingle)) is invariant under list_distinct, so the shared
    # shingle CTE (distinct) matches the Spark side (raw list) exactly.
    _SHINGLE_CTE
    + """
    SELECT doc_id, list_aggregate(list_transform(shs, x -> md5(x)), 'min') AS fingerprint
    FROM sh
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-md5-shingle fingerprint (portable hash)."""
    d = _t(spark, sf_dir, "documents")
    return text.doc_fingerprint(d, "text", "doc_id", shingle_n=3)


@query(
    "binary_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + JVM-side byte stats
    (octet_length + sha2) — no Python in the loop."""
    d = _t(spark, sf_dir, "documents")
    b = multimodal.attach_fake_binary(d, "text", "doc_id")
    return multimodal.binary_stats(b)


@query(
    "skew_salted_cohort_join",
    """
    SELECT e.event_id, e.user_id, round(e.value, 6) AS value,
           (e.user_id % 7)::INT AS cohort
    FROM events e
    JOIN (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0) d
      USING (user_id)
    """,
)
def skew_salted_cohort_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Skew-salted join (operators/skew.py:salted_join) — hot keys
    found by a pre-pass top-N are salted across 8 reducers, the dim side
    replicated only for those keys. The oracle is the PLAIN join: the
    salt must never change the result multiset, only how it spreads
    across tasks (the salt values themselves are partitioning-dependent
    and are dropped before output)."""
    from .operators.skew import salted_join

    e = _t(spark, sf_dir, "events")
    big = e.select("event_id", "user_id", F.round("value", 6).alias("value"))
    dim = (
        e.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 == 0)
        .withColumn("cohort", (F.col("user_id") % 7).cast("int"))
    )
    hot = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), "user_id")
        .limit(5)
        .select("user_id")
    )
    return salted_join(big, dim, ["user_id"], "inner", salt=8, hot_keys=hot)


@query(
    "dedup_incremental_batch",
    """
    WITH hist AS (
      SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 5 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT b.doc_id, b.fp AS fingerprint
    FROM batch b LEFT JOIN hist h ON b.fp = h.fp
    WHERE h.fp IS NULL
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW document batch (every 5th doc here)
    anti-joined against the HISTORICAL corpus fingerprint set — the
    shape of continuous ingestion, where each drop dedups against
    everything already accepted without re-clustering the archive.
    At 100 TB the history side is a pre-computed fingerprint table
    (longs/md5 only, no text), the join is a broadcast or bucketed
    left-anti, and the batch is touched once."""
    d = _t(spark, sf_dir, "documents")
    from .operators.dedup import normalize_text

    fp = F.md5(normalize_text(F.col("text"))).alias("fingerprint")
    hist = (
        d.filter(F.col("doc_id") % 5 != 0).select(fp).distinct()
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).select("doc_id", fp)
    return batch.join(hist, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


@query(
    "dedup_containment",
    _SHINGLE_CTE
    + """
    SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
           round(len(list_intersect(a.shs, b.shs))::DOUBLE / len(a.shs), 6)
             AS containment
    FROM sh a, sh b
    WHERE a.doc_id != b.doc_id
      AND len(list_intersect(a.shs, b.shs))::DOUBLE / len(a.shs) >= 0.8
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Asymmetric shingle-containment pairs
    (operators/dedup.py:containment_pairs): |S(sub) ∩ S(super)| /
    |S(sub)| ≥ 0.8 — catches excerpt/boilerplate-wrapper near-dups that
    Jaccard's symmetric denominator hides. Same inverted-index
    postings join as `dedup_ngram_jaccard`."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.containment_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.8)


@query(
    "affinity_part_pairs",
    """
    WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    n AS (SELECT count(DISTINCT b) AS n FROM bi),
    itemn AS (SELECT i, count(*) AS ni FROM bi GROUP BY 1),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_pair
      FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    scored AS (
      SELECT p.item_a, p.item_b, p.n_pair,
             round(p.n_pair * n.n / (na.ni * nb.ni), 6) AS lift
      FROM pairs p
      JOIN itemn na ON na.i = p.item_a
      JOIN itemn nb ON nb.i = p.item_b
      CROSS JOIN n
    )
    SELECT item_a, item_b, n_pair, lift
    FROM scored
    ORDER BY lift DESC, item_a ASC, item_b ASC
    LIMIT 20
    """,
)
def affinity_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Market-basket affinity (operators/affinity.py:
    item_pairs_lift): top part pairs by lift over orders-as-baskets.
    One co-partitioned self-join on the order key (pair volume bounded
    by per-basket fan-out, degenerate baskets capped), broadcast
    per-item frequencies, lift rounded before the deterministic
    top-k."""
    from .operators.affinity import item_pairs_lift

    li = _t(spark, sf_dir, "lineitem")
    return item_pairs_lift(
        li, "l_orderkey", "l_partkey", min_pair_count=2, top_k=20
    )


@query(
    "er_fuzzy_join_parts",
    """
    WITH dirty AS (
      SELECT p_partkey AS dirty_key,
             CASE WHEN p_partkey % 3 = 0
                  THEN substr(p_name, 1, length(p_name) - 1)
                  ELSE p_name END AS dirty_name
      FROM part WHERE p_partkey % 7 = 0
    ),
    clean AS (SELECT p_partkey, p_name FROM part),
    blocked AS (
      SELECT d.dirty_key, d.dirty_name, c.p_partkey, c.p_name,
             levenshtein(d.dirty_name, c.p_name) AS distance
      FROM dirty d
      JOIN clean c
        ON lower(string_split_regex(trim(d.dirty_name), '\\s+')[1])
         = lower(string_split_regex(trim(c.p_name), '\\s+')[1])
    )
    SELECT dirty_key, dirty_name, p_partkey, p_name, distance
    FROM blocked
    WHERE distance <= 1
    """,
)
def er_fuzzy_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Fuzzy entity resolution (operators/er.py:fuzzy_join): a
    deterministically-dirtied slice of part names (every 3rd loses its
    final character) is matched back to the clean catalog within 1
    Levenshtein edit, candidates blocked on the lowercased first name
    token — one hash equi-join, JVM-side early-exit edit distance,
    never a cartesian. The oracle replays the identical dirt, block,
    and bound."""
    from .operators.er import fuzzy_join
    from .sources.files import scan_fanout

    # the verify stage is compute-dense per CANDIDATE PAIR (blocks fan
    # the ~200-row color blocks into ~600k Levenshtein evaluations), and
    # part.parquet lands as one file → the whole verify ran on ONE task
    # (profiled: a single 3.4 s single-task stage, 31 cores idle).
    # Fan the clean-side scan so the blocked join streams wide; the
    # dirty side is broadcast, so only the probe side needs width.
    p = scan_fanout(
        spark,
        spark.read.parquet(f"{sf_dir}/part.parquet"),
        f"{sf_dir}/part.parquet",
    ).select("p_partkey", "p_name")
    dirty = p.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("dirty_key"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.col("p_name"))
        .alias("dirty_name"),
    )
    return fuzzy_join(dirty, p, "dirty_name", "p_name", max_distance=1).select(
        "dirty_key", "dirty_name", "p_partkey", "p_name", "distance"
    )


@query(
    "er_resolve_parts",
    """
    WITH RECURSIVE dirty AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 11 = 0
                  THEN substr(p_name, 1, length(p_name) - 1)
                  ELSE p_name END AS nm
      FROM part WHERE p_partkey <= 200
    ),
    pairs AS (
      SELECT a.p_partkey AS i, b.p_partkey AS j
      FROM dirty a
      JOIN dirty b
        ON lower(string_split_regex(trim(a.nm), '\\s+')[1])
         = lower(string_split_regex(trim(b.nm), '\\s+')[1])
       AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.nm, b.nm) <= 1
    ),
    edges AS (
      SELECT i AS src, j AS dst FROM pairs
      UNION
      SELECT j, i FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    lab AS (SELECT id, min(lbl) AS entity_id FROM reach GROUP BY id)
    SELECT d.p_partkey,
           coalesce(l.entity_id, d.p_partkey) AS entity_id,
           coalesce(l.entity_id, d.p_partkey) = d.p_partkey AS is_canonical
    FROM dirty d LEFT JOIN lab l ON l.id = d.p_partkey
    """,
)
def er_resolve_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Entity resolution end-to-end
    (operators/er.py:resolve_entities): a dirtied slice of part names
    fuzzy-self-matched within 1 edit (first-token blocking), clustered
    transitively, min-id canonical per entity, singletons canonical of
    themselves. The oracle replays the identical block, bound, and a
    recursive-CTE closure."""
    from .operators.er import resolve_entities

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    dirty = p.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 11 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.col("p_name"))
        .alias("nm"),
    )
    return resolve_entities(dirty, "p_partkey", "nm", max_distance=1)


@query(
    "dedup_repeated_spans",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
      FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS pos,
             array_to_string(ts[i * 3 + 1 : i * 3 + 3], ' ') AS seg
      FROM (SELECT doc_id, ts,
                   unnest(range(CAST(ceil(len(ts) / 3.0) AS BIGINT))) AS i
            FROM toks WHERE len(ts) > 0)
    ),
    hot AS (
      SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           count(*)::BIGINT AS n_segments,
           coalesce(sum(CASE WHEN h.seg IS NOT NULL THEN 1 END), 0)::BIGINT
             AS n_removed,
           coalesce(string_agg(CASE WHEN h.seg IS NULL THEN s.seg END,
                               ' ' ORDER BY s.pos), '') AS new_text
    FROM segs s LEFT JOIN hot h USING (seg)
    GROUP BY s.doc_id
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] C4-style cross-document repeated-span removal
    (operators/dedup.py:repeated_span_dedup): 3-token segments whose
    exact text recurs in >= 2 documents are stripped from every
    document; per-doc segment/removal counts plus the rewritten text.
    The oracle replays segmentation with list slicing over the same
    tokenizer and an ORDER BY pos string_agg reassembly."""
    d = _t(spark, sf_dir, "documents")
    return dedup.repeated_span_dedup(d, "text", "doc_id", span_tokens=3, min_docs=2)


@query(
    "dedup_minhash_join",
    _SHINGLE_CTE
    + """
    SELECT a.doc_id AS id_i, b.doc_id AS id_j,
           round(len(list_intersect(a.shs, b.shs))::DOUBLE
                 / len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
    FROM sh a, sh b
    WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
      AND len(list_intersect(a.shs, b.shs))::DOUBLE
          / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    """,
)
def dedup_minhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Cross-corpus MinHash LSH near-dup JOIN
    (operators/dedup.py:minhash_join) — the decontamination shape:
    training-side documents (doc_id % 7 != 0) that near-duplicate a
    'benchmark' document (doc_id % 7 == 0) at Jaccard >= 0.8, LSH
    candidates exact-verified. The oracle brute-forces the exact
    cross Jaccard; 128 hashes / 32 bands (as the sibling dedup_minhash
    queries pass) push the LSH miss probability at Jaccard 0.8 below
    1e-7, so the sets coincide."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    train = d.filter(F.col("doc_id") % 7 != 0)
    bench = d.filter(F.col("doc_id") % 7 == 0)
    return dedup.minhash_join(
        train, bench, "doc_id", "text", num_hashes=128, bands=32
    )


@query(
    "dedup_repeated_spans_strided",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS st, array_to_string(ts[i + 1 : i + 3], ' ') AS w
      FROM (SELECT doc_id, ts,
                   unnest(range(CAST(floor((len(ts) - 3) / 1.0) AS BIGINT) + 1))
                     AS i
            FROM toks WHERE len(ts) >= 3)
    ),
    hot AS (SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
    hotw AS (SELECT doc_id, st FROM wins JOIN hot USING (w)),
    rm AS (SELECT DISTINCT doc_id, unnest(range(st, st + 3)) AS pos FROM hotw),
    nhot AS (SELECT doc_id, count(*) AS n_hot FROM hotw GROUP BY doc_id),
    nrm AS (SELECT doc_id, count(*) AS n_rm FROM rm GROUP BY doc_id),
    tokpos AS (
      SELECT doc_id, unnest(ts) AS tok, unnest(range(len(ts))) AS pos
      FROM toks WHERE len(ts) > 0
    )
    SELECT t.doc_id,
           any_value(CASE WHEN len(k.ts) >= 3
                          THEN CAST(floor((len(k.ts) - 3) / 1.0) AS BIGINT) + 1
                          ELSE 0 END) AS n_windows,
           coalesce(any_value(nhot.n_hot), 0)::BIGINT AS n_hot_windows,
           coalesce(any_value(nrm.n_rm), 0)::BIGINT AS n_tokens_removed,
           coalesce(string_agg(CASE WHEN rm.pos IS NULL THEN t.tok END,
                               ' ' ORDER BY t.pos), '') AS new_text
    FROM tokpos t
    JOIN toks k USING (doc_id)
    LEFT JOIN rm ON rm.doc_id = t.doc_id AND rm.pos = t.pos
    LEFT JOIN nhot ON nhot.doc_id = t.doc_id
    LEFT JOIN nrm ON nrm.doc_id = t.doc_id
    GROUP BY t.doc_id
    """,
)
def dedup_repeated_spans_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Overlapping-window repeated-span removal
    (operators/dedup.py:repeated_span_dedup_strided): 3-token windows
    starting at EVERY token (stride 1), hot windows (>= 2 docs) drop
    every token they cover — catches boilerplate shifted by < span
    tokens between documents, which the fixed segmentation of
    ``dedup_repeated_spans`` provably misses (unit-pinned fixture).
    The oracle replays windowing, hotness, token-level coverage, and
    the positional reassembly."""
    d = _t(spark, sf_dir, "documents")
    return dedup.repeated_span_dedup_strided(
        d, "text", "doc_id", span_tokens=3, stride=1, min_docs=2
    )


@query(
    "dedup_canonical_corpus",
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
    clusters AS (
      SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    )
    SELECT doc_id, lang, n_chars FROM (
      SELECT d.doc_id, d.lang, d.n_chars,
             row_number() OVER (
               PARTITION BY coalesce(c.cluster_id, d.doc_id)
               ORDER BY d.n_chars DESC, d.doc_id) AS rk
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    ) WHERE rk = 1
    """,
)
def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] End-to-end dedup with POLICY survivor selection
    (operators/dedup.py:canonical_pick): MinHash pairs -> connected
    components -> keep the LONGEST document per duplicate cluster
    (doc_id tiebreak), pass unclustered docs through. Completes the
    dedup story past the min-id survivor the cluster label encodes:
    real pipelines keep the best copy, not the smallest id. The
    ranking window touches only the edge-connected subset; the corpus
    majority exits via an anti join against the broadcastable ids-only
    cluster map. Oracle replays clustering via recursive CTE and the
    same pick with one QUALIFY-style window.

    The pair set is the SAME (shingle_n=3, 128 hashes, 32 bands, 0.8)
    computation ``dedup_minhash`` runs live, so it rides the per-sf
    materialized-layout cache (r5 VERDICT ask #4: the suite was paying
    for the MinHash join twice) — the marker records every pair-set
    parameter per the ADVICE r4 #1 rule, and the first consumer builds
    it. In production this is the standard pattern: land the pair set
    once, fan multiple survivorship policies off it."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    pairs = _minhash_pairs_cached(spark, sf_dir)
    clusters = dedup.near_dup_clusters(pairs)
    return dedup.canonical_pick(
        d.select("doc_id", "lang", "n_chars"),
        clusters,
        [F.col("n_chars").desc(), F.col("doc_id")],
    )


@query(
    "er_blocking_report",
    """
    WITH dirty AS (
      SELECT CASE WHEN p_partkey % 3 = 0
                  THEN substr(p_name, 1, length(p_name) - 1)
                  ELSE p_name END AS dirty_name
      FROM part WHERE p_partkey % 7 = 0
    ),
    lc AS (
      SELECT lower(string_split_regex(trim(dirty_name), '\\s+')[1]) AS block_key,
             count(*)::BIGINT AS left_rows
      FROM dirty GROUP BY 1
    ),
    rc AS (
      SELECT lower(string_split_regex(trim(p_name), '\\s+')[1]) AS block_key,
             count(*)::BIGINT AS right_rows
      FROM part GROUP BY 1
    ),
    pk AS (
      SELECT lc.block_key, left_rows, right_rows,
             (left_rows * right_rows)::BIGINT AS candidates
      FROM lc JOIN rc USING (block_key)
    )
    SELECT block_key, left_rows, right_rows, candidates,
           round(candidates / (SELECT sum(candidates) FROM pk), 6) AS share
    FROM pk
    ORDER BY candidates DESC, block_key
    LIMIT 10
    """,
)
def er_blocking_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] ER blocking-quality diagnostic
    (operators/er.py:blocking_report): the top-10 heaviest blocking
    keys of the er_fuzzy_join_parts dirty↔catalog join with candidate volume
    and share — the pre-flight readout that decides max_block_size /
    block-function choice before the quadratic verify runs. Oracle
    replays the first-token key and the per-key products."""
    from .operators.er import blocking_report

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    dirty = p.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("dirty_key"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.col("p_name"))
        .alias("dirty_name"),
    )
    return blocking_report(dirty, p, "dirty_name", "p_name")


@query(
    "dedup_impact_report",
    """
    WITH surv AS (
      SELECT min(doc_id) AS keep_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    )
    SELECT (SELECT count(*) FROM documents)::BIGINT AS rows_in,
           (SELECT count(*) FROM surv)::BIGINT AS rows_out,
           (SELECT sum(n_chars) FROM documents)::BIGINT AS chars_in,
           (SELECT sum(d.n_chars) FROM documents d
            JOIN surv s ON s.keep_id = d.doc_id)::BIGINT AS chars_out,
           round(1.0 - (SELECT count(*) FROM surv)::DOUBLE
                       / (SELECT count(*) FROM documents), 6) AS row_dup_frac,
           round(1.0 - (SELECT sum(d.n_chars) FROM documents d
                        JOIN surv s ON s.keep_id = d.doc_id)::DOUBLE
                       / (SELECT sum(n_chars) FROM documents), 6) AS char_dup_frac
    """,
)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Dedup impact summary: rows/chars before vs after
    fingerprint dedup with the duplicate fractions — the one-row
    "how dirty is this corpus" readout pipeline owners check before
    committing to a dedup pass. One survivor aggregate + two tiny
    rollups; the corpus text shuffles once (the fingerprint groupBy)."""
    d = _t(spark, sf_dir, "documents")
    # fingerprint_dedup returns survivor ids — join back for the sizes
    kept = d.join(
        dedup.fingerprint_dedup(d, "text", "doc_id").select("doc_id"), "doc_id"
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("rows_in"), F.sum("n_chars").alias("chars_in")
    )
    out = kept.agg(
        F.count(F.lit(1)).alias("rows_out"), F.sum("n_chars").alias("chars_out")
    )
    return (
        tot.crossJoin(out)
        .select(
            "rows_in",
            "rows_out",
            "chars_in",
            "chars_out",
            F.round(1.0 - F.col("rows_out") / F.col("rows_in"), 6).alias(
                "row_dup_frac"
            ),
            F.round(
                1.0 - F.col("chars_out").cast("double") / F.col("chars_in"), 6
            ).alias("char_dup_frac"),
        )
    )


@query("graph_supplier_pagerank", _pagerank_sql())
def graph_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Weighted PageRank over the supplier co-occurrence graph
    (operators/graph.py:pagerank): suppliers are linked when they ship
    lines of the same order (symmetrized, co-occurrence-count weights,
    so no dangling mass), 5 iterations at damping 0.85, top-20 most
    central suppliers (rank rounded BEFORE the cutoff, id tiebreak).
    The iteration is an unrolled declarative plan — per round one
    node-sized rank⋈edges join + one groupBy(dst) partial-agg sum; no
    collect inside the loop, edges reusable from a bucketed layout.
    Oracle replays all 5 iterations as unrolled CTEs with the identical
    float expression shape."""
    from .operators.graph import pagerank

    # repartition by the join key before the self-join: the raw scan's
    # partition count is a file-size artifact (3 tasks at sf0.1 —
    # underutilizing every core), and hash-partitioning on l_orderkey
    # makes both sides co-partitioned, the portable shape for a
    # fact-table self-join at any scale
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .repartition(F.col("l_orderkey"))
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(pairs, "src", "dst", weight_col="w")
    return (
        ranks.select(
            F.col("id").alias("supp_key"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.col("rank").desc(), F.col("supp_key"))
        .limit(20)
    )


@query(
    "dedup_incremental_minhash",
    _SHINGLE_CTE
    + """
    SELECT b.doc_id AS id_i, a.doc_id AS id_j,
           round(len(list_intersect(a.shs, b.shs))::DOUBLE
                 / len(list_distinct(list_concat(a.shs, b.shs))), 6) AS jaccard
    FROM sh a, sh b
    WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
      AND len(list_intersect(a.shs, b.shs))::DOUBLE
          / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] INCREMENTAL near-dup dedup against a PERSISTED MinHash
    index (operators/dedup.py:minhash_index_build/lookup): the corpus
    index (doc_id % 5 != 0 — banded signatures + shingle stream,
    ids+hashes parquet, built once through the layout cache with every
    band parameter recorded in the marker) answers "which docs of this
    NEW batch (doc_id % 5 == 0) near-duplicate something we already
    have?" without re-reading the corpus text. The text-similarity
    upgrade of the fingerprint-exact ``dedup_incremental_batch``
    anti-join; at 100 TB the index is the durable artifact and each
    day's batch is one bucket join + verify against it. Oracle
    brute-forces the exact cross Jaccard (128/32 banding miss
    probability < 1e-7 at 0.8, so the sets coincide)."""
    import os as _os

    cache = _minhash_ix_dir(spark, sf_dir)
    batch = _t(spark, sf_dir, "documents", fanout=True).filter(F.col("doc_id") % 5 == 0)
    return dedup.minhash_index_lookup(
        batch,
        spark.read.parquet(_os.path.join(cache, "ix_bands")),
        spark.read.parquet(_os.path.join(cache, "ix_shingles")),
        "doc_id",
        "text",
        shingle_n=_MINHASH_IX_PARAMS["shingle_n"],
        num_hashes=_MINHASH_IX_PARAMS["num_hashes"],
        bands=_MINHASH_IX_PARAMS["bands"],
        seed=_MINHASH_IX_PARAMS["seed"],
        threshold=0.8,
    )


@query(
    "dedup_intradoc_spans",
    """
    WITH toks AS (
      SELECT doc_id,
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
      SELECT doc_id, pos, seg,
             row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS rn
      FROM segs
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_segments,
           sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos)
             AS new_text
    FROM firsts
    GROUP BY doc_id
    """,
)
def dedup_intradoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] WITHIN-document repeated-span collapse
    (operators/dedup.py:intradoc_span_dedup): keep the first occurrence
    of each distinct 3-token segment inside its own doc — the
    self-repetition (spam/template) rewrite the cross-doc op ignores by
    design. Entirely in-row higher-order expressions: no explode, no
    aggregate, ZERO shuffles — the cheapest rewrite in the family. The
    oracle replays segmentation + a per-(doc, seg) first-occurrence
    window."""
    d = _t(spark, sf_dir, "documents")
    return dedup.intradoc_span_dedup(d, "text", "doc_id", span_tokens=3)


@query("dedup_ngram_decontaminate", _NGRAM_DECON_SQL)
def dedup_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact 13-gram eval decontamination
    (operators/dedup.py:ngram_overlap_pairs): training docs (doc_id % 7
    != 0) sharing any verbatim 13-token gram with a 'benchmark' doc
    (doc_id % 7 == 0) — the GPT-3-style exact-overlap check that
    catches a pasted benchmark sentence near-dup joins miss. Benchmark
    gram postings broadcast; the training side never shuffles before
    the pair-count aggregate. Oracle replays the gram expansion and
    join on gram text exactly."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.ngram_overlap_pairs(
        d.filter(F.col("doc_id") % 7 != 0),
        d.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=13,
    )


@query("dedup_ngram_bloom_prescreen", _NGRAM_DECON_SQL)
def dedup_ngram_bloom_prescreen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The Bloom semi-join escape hatch for n-gram
    decontamination when the benchmark gram postings exceed the
    broadcast guard (operators/dedup.py:ngram_overlap_pairs,
    bench_join='bloom'): bench grams compress into a fixed ≤512 KiB
    Bloom bitmap, training grams are pre-filtered by a zero-join probe,
    and a plain shuffled equi-join replaces the broadcast — the
    definite-miss majority of training grams never reaches the
    exchange. Result IDENTICAL to ``dedup_ngram_decontaminate`` by
    construction (Bloom false positives die in the exact join, false
    negatives are impossible), which is exactly what this query pins:
    the SAME oracle as the broadcast twin."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.ngram_overlap_pairs(
        d.filter(F.col("doc_id") % 7 != 0),
        d.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=13,
        bench_join="bloom",
        bloom_m_bits=1 << 18,
    )


@query(
    "dedup_contamination_report",
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
    SELECT d.source,
           count(*)::BIGINT AS n_docs,
           count(f.doc_id)::BIGINT AS n_contaminated,
           round(count(f.doc_id) / count(*)::DOUBLE, 6) AS contaminated_share
    FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
    WHERE d.doc_id % 7 <> 0
    GROUP BY d.source
    """,
)
def dedup_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-source contamination report: for each source slice of
    the training split, how many docs share a verbatim 13-gram with the
    benchmark slice — the release sign-off table a decontamination run
    ends with (which ingest pipelines leak eval data). Composes
    ngram_overlap_pairs (broadcast bench grams) with a distinct-ids
    semi join + counts-only aggregate."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    train = d.filter(F.col("doc_id") % 7 != 0)
    flagged = (
        dedup.ngram_overlap_pairs(
            train, d.filter(F.col("doc_id") % 7 == 0), "doc_id", "text", n=13
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        train.join(F.broadcast(flagged), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("__hit").cast("long").alias("n_contaminated"),
            F.round(
                F.count("__hit") / F.count("*").cast("double"), 6
            ).alias("contaminated_share"),
        )
    )


@query("dedup_winnow_pairs", _winnow_sql())
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Winnowing candidate pairs
    (operators/dedup.py:winnow_candidate_pairs): MOSS-style
    local-minimum fingerprint selection (k=5 gram hashes, window 4 —
    any shared run of >= 8 tokens guarantees a shared fingerprint),
    pairs sharing >= 2 selections. ~1/window of the shingle postings
    enter the self-join; hot fingerprints capped. Oracle replays the
    portable hash, the window minima, and the pair count."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return dedup.winnow_candidate_pairs(
        d, "doc_id", "text", k=5, window=4, min_shared=2
    )


@query(
    "dedup_soft_weights",
    # exact-Jaccard pairs (the LSH-at-128/32 + exact-verify set
    # coincides with the exact pair set — same argument as
    # dedup_minhash/dedup_clusters) → transitive closure → cluster
    # sizes → reciprocal sampling weights; singletons weigh 1.0.
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
    SELECT d.doc_id, d.lang,
           coalesce(c.cl, d.doc_id)::BIGINT AS cluster_id,
           coalesce(s.nd, 1)::BIGINT AS n_dups,
           round(1.0::DOUBLE / coalesce(s.nd, 1), 6) AS sample_weight
    FROM documents d
    LEFT JOIN comp c ON c.id = d.doc_id
    LEFT JOIN sizes s ON s.cl = c.cl
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Soft deduplication — reweight, don't remove
    (operators/dedup.py:soft_dedup_weights): every document ships, but
    each near-dup cluster shares one row of sampling mass
    (sample_weight = 1/|cluster|; singletons 1.0) — the gentler
    alternative to survivor-pick dedup when duplicated content still
    carries signal. Reuses the suite's layout-cached MinHash pair set
    (the banded join runs once per sf); components and counts touch
    only the edge-connected subset, the corpus sees ONE id-keyed join.
    The oracle replays exact pairs → transitive closure → reciprocal
    weights."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = _minhash_pairs_cached(spark, sf_dir)
    return dedup.soft_dedup_weights(d, "doc_id", pairs)


@query(
    "dedup_pair_evidence",
    _SHINGLE_CTE
    + """
    , pairs AS (
      SELECT a.doc_id AS id_i, b.doc_id AS id_j,
             round(len(list_intersect(a.shs, b.shs))::DOUBLE
                   / len(list_distinct(list_concat(a.shs, b.shs))), 6)
               AS jaccard
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.shs, b.shs))::DOUBLE
            / len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8
    )
    SELECT p.id_i, p.id_j, p.jaccard,
           len(list_intersect(sa.shs, sb.shs))::BIGINT AS n_shared,
           array_to_string(
             list_sort(list_intersect(sa.shs, sb.shs))[1:5], ' | '
           ) AS evidence
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.id_i
    JOIN sh sb ON sb.doc_id = p.id_j
    """,
)
def dedup_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Near-dup pair audit evidence
    (operators/dedup.py:pair_evidence): for every MinHash near-dup pair
    (the suite's layout-cached set), the shared-shingle count and the
    first 5 shared shingles (sorted — deterministic sample) — the
    "show me WHY these two merged" review table a labeling pass starts
    from. Two id-keyed joins attach in-row distinct shingle sets to the
    small pair table; intersection/sort run in-row. Oracle replays the
    exact pairs and the sorted intersection."""
    from .operators.dedup import pair_evidence

    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir)
    ev = pair_evidence(pairs, d, "doc_id", "text", max_shingles=5)
    return ev.select(
        "id_i", "id_j", "jaccard",
        "n_shared",
        F.array_join("evidence", " | ").alias("evidence"),
    )


@query(
    "dedup_bloom_history_probe",
    """
    WITH hist AS (SELECT doc_id FROM documents WHERE doc_id % 4 <> 0),
    inc AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
    """
    + _bloom_probe_sql(
        key="doc_id", hist="hist", inc="inc", seed="bh1", m=65536, k=5
    )
    + """
    SELECT count(*)::BIGINT AS n_incoming,
           sum(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END)::BIGINT
             AS n_true_seen,
           sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS n_maybe_seen,
           sum(CASE WHEN maybe AND doc_id % 4 <> 2 THEN 1 ELSE 0 END)::BIGINT
             AS n_false_positive,
           sum(CASE WHEN NOT maybe AND doc_id % 4 = 2 THEN 1 ELSE 0 END)
             ::BIGINT AS n_false_negative
    FROM flags
    """,
)
def dedup_bloom_history_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Bloom-filter pre-screen for incremental exact dedup
    (operators/aggstate.py:build_bloom_state/probe_bloom): the history
    corpus (75% of documents) is compressed into a 2^16-bit portable-
    hash Bloom state; the incoming batch (the even doc_ids — half
    overlapping, half genuinely new) probes it with ZERO joins and ZERO
    shuffles (the m/64-long word array is a bounded driver collect
    embedded as a literal, the codebook pattern). Output pins the
    one-sided guarantee the operator exists for: ``n_false_negative``
    is structurally 0 (a miss is a DEFINITE first sighting), while
    ``n_false_positive`` is whatever the hash geometry yields — the
    DuckDB oracle recomputes the identical md5 double-hash bit sets, so
    the FP count matches EXACTLY, not within an envelope. At 100 TB the
    definite-new majority skips the exact anti-join against history
    entirely; only the maybe-seen sliver pays it."""
    from .operators import aggstate as A

    d = _t(spark, sf_dir, "documents", fanout=True).select("doc_id")
    hist = d.where(F.col("doc_id") % 4 != 0)
    inc = d.where(F.col("doc_id") % 2 == 0)
    state = A.build_bloom_state(hist, "doc_id", m_bits=1 << 16, k=5, seed="bh1")
    probed = A.probe_bloom(inc, "doc_id", state, out_col="maybe")
    seen = F.col("doc_id") % 4 == 2
    maybe = F.col("maybe")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_incoming"),
        one(seen).alias("n_true_seen"),
        one(maybe).alias("n_maybe_seen"),
        one(maybe & ~seen).alias("n_false_positive"),
        one(~maybe & seen).alias("n_false_negative"),
    )


@query("graph_part_communities", _lpa_sql())
def graph_part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Synchronous label-propagation communities over the part
    CO-PURCHASE graph (operators/graph.py:label_propagation, Raghavan
    et al. 2007): parts linked when they are repeatedly bought in the
    same order (symmetrized co-occurrence counts, sparsified at
    weight >= 2 — the supplier graph is complete at this scale and
    would trivially collapse), 3 synchronous rounds with the
    deterministic (weight DESC, label ASC) argmax — parts sharing a
    label form a community, the product-category discovery behind
    "frequently bought together". Completes the graph family next to
    PageRank (centrality) and connected components (reachability):
    LPA finds DENSE groups. Per round: one broadcast labels⋈edges
    join + one (dst,label) partial-agg count + one per-dst struct-max
    riding the same exchange, lineage checkpoint-truncated — no
    collect in the loop, edges reusable from a bucketed layout. The
    oracle unrolls all 3 rounds."""
    from .operators.graph import label_propagation

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(F.col("l_orderkey"))
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2)
    )
    labs = label_propagation(pairs, "src", "dst", weight_col="w", iterations=3)
    return labs.select(
        F.col("id").alias("part_key"), F.col("label").alias("community")
    )
