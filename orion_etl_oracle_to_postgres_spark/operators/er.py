"""[EXT] Entity resolution: fuzzy (approximate-string) joins
(SURVEY.md §2.11). The reference joins only on exact keys
(`/root/reference/plugins/default_lookup.py:49-95` — equality probes);
real migrations constantly need "same entity, dirty spelling" matching
— names, addresses, product titles.

Scale shape: the classic blocking + verify decomposition. Candidates
are generated ONLY within equal blocking keys (one hash equi-join —
never a cartesian); each candidate is then verified with an exact
Levenshtein bound. Blocking keys that occur too often on the right side
are dropped (``max_block_size``, the stop-shingle cap pattern from
``ngram_jaccard_pairs``): a degenerate block ("smith") is quadratic in
the join while contributing mostly false candidates. Recall depends on
the blocking function — the default (lowercased first token) suits
"typo in the tail" dirt; callers pass ``block_fn`` for
domain-appropriate keys (phonetic codes, sorted-token prefixes,
multi-key unions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def default_block_key(col: Column) -> Column:
    """Lowercased first whitespace token — a cheap, high-recall block
    for strings whose dirt is in the tail."""
    return F.lower(F.split(F.trim(col), r"\s+").getItem(0))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    *,
    max_distance: int = 2,
    block_fn=None,
    max_block_size: int = 10_000,
) -> DataFrame:
    """All (left row, right row) pairs whose texts are within
    ``max_distance`` Levenshtein edits, candidates restricted to equal
    blocking keys. Returns the left columns, the right columns (suffixed
    ``_r`` on collision), and ``distance``.

    ``block_fn`` is ``Column -> Column``, applied to each side's text
    column separately (a function, not a pre-built Column: the right
    frame's columns are renamed on collision, so a shared Column
    expression could not resolve against both sides). Default:
    ``default_block_key``.

    The verify predicate is JVM-side ``levenshtein`` (whole-stage
    codegen, no Python). With Spark's 3-arg form the DP computation
    early-exits past the bound, so verification cost is
    O(candidates × max_distance × len), not O(candidates × len²).
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if max_block_size < 1:
        raise ValueError(f"max_block_size must be >= 1, got {max_block_size}")
    fn = block_fn if block_fn is not None else default_block_key

    lcols = set(left.columns)
    taken = lcols | set(right.columns)
    rename = {}
    for c in right.columns:
        if c in lcols:
            # collision-free suffix: '{c}_r' may itself already exist on
            # either side ('name' next to a real 'name_r' column), which
            # would produce duplicate names and ambiguous references
            cand = f"{c}_r"
            while cand in taken:
                cand += "_r"
            rename[c] = cand
            taken.add(cand)
    r = right.withColumnsRenamed(rename)
    r_text = rename.get(right_text, right_text)

    l_b = left.withColumn("__blk", fn(F.col(left_text)))
    r_b = r.withColumn("__blk", fn(F.col(r_text)))
    # drop degenerate blocks (counted on the right/clean side)
    keep = (
        r_b.groupBy("__blk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_block_size)
        .select("__blk")
    )
    # Length band BELOW the verify: |len(a) − len(b)| > d implies
    # levenshtein(a, b) > d (each edit changes length by ≤ 1), so the
    # O(1) length test discards candidates before the O(d·len) DP ever
    # runs — the distance is computed under when(), not just filtered
    # after the fact. Result set unchanged by construction.
    len_ok = (
        F.abs(F.length(F.col(left_text)) - F.length(F.col(r_text)))
        <= F.lit(max_distance)
    )
    dist = F.when(
        len_ok, F.levenshtein(F.col(left_text), F.col(r_text), max_distance)
    ).otherwise(F.lit(-1))
    return (
        l_b.join(r_b.join(keep, "__blk"), "__blk")
        .withColumn("distance", dist)
        # 3-arg levenshtein returns -1 past the bound
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .drop("__blk")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 1,
    block_fn=None,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Entity resolution within ONE table: fuzzy self-match → transitive
    clusters → canonical id per entity. Returns one row per input id:
    (id, entity_id, is_canonical) where entity_id is the cluster's
    minimum id — the dedup-and-survivorship step after ``fuzzy_join``
    finds candidate duplicates (same composition as
    ``similarity.semantic_dedup``: pairs → large-star/small-star →
    ids-only labeling join).
    """
    from .dedup import near_dup_clusters

    lhs = df.select(F.col(id_col).alias("__lid"), F.col(text_col))
    rhs = df.select(F.col(id_col).alias("__rid"), F.col(text_col))
    pairs = fuzzy_join(
        lhs,
        rhs,
        text_col,
        text_col,
        max_distance=max_distance,
        block_fn=block_fn,
        max_block_size=max_block_size,
    ).filter(F.col("__lid") < F.col("__rid"))
    clusters = near_dup_clusters(
        pairs.select("__lid", "__rid"), id_i="__lid", id_j="__rid"
    ).withColumnsRenamed({"doc_id": "__cid", "cluster_id": "__lbl"})
    return (
        df.select(F.col(id_col))
        .join(clusters, F.col(id_col) == F.col("__cid"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__lbl"), F.col(id_col)).alias("entity_id"),
            (F.coalesce(F.col("__lbl"), F.col(id_col)) == F.col(id_col)).alias(
                "is_canonical"
            ),
        )
    )


def blocking_report(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    *,
    block_fn=None,
    top_n: int = 10,
) -> DataFrame:
    """Blocking-quality diagnostic for ``fuzzy_join``: per blocking key
    (the ``top_n`` heaviest by candidate count) — left rows, right
    rows, candidate pairs (their product), and each key's share of the
    total candidate volume. The report that decides ``max_block_size``
    and whether the block function is discriminative enough BEFORE the
    quadratic verify runs: one degenerate key carrying 40% of all
    candidates means a better key, not a bigger cluster. Two tiny
    per-key aggregates + one join on the key — the texts never move."""
    fn = block_fn if block_fn is not None else default_block_key
    lc = (
        left.select(fn(F.col(left_text)).alias("block_key"))
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("left_rows"))
    )
    rc = (
        right.select(fn(F.col(right_text)).alias("block_key"))
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("right_rows"))
    )
    per_key = lc.join(rc, "block_key").withColumn(
        "candidates", F.col("left_rows") * F.col("right_rows")
    )
    total = per_key.agg(F.sum("candidates").alias("__tot"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "block_key",
            "left_rows",
            "right_rows",
            "candidates",
            F.round(F.col("candidates") / F.col("__tot"), 6).alias("share"),
        )
        .orderBy(F.col("candidates").desc(), "block_key")
        .limit(top_n)
    )
