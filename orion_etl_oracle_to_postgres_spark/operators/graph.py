"""[EXT] Iterative graph analytics as unrolled DataFrame plans.

The repo already does transitive closure (``dedup.near_dup_clusters``,
large-star/small-star). This module adds fixed-iteration algorithms —
PageRank first — expressed the Spark-right way: the driver LOOP only
composes the plan (k joins + aggregates, k known up front); no
``collect()`` inside the loop, no RDD fold, so Catalyst sees the whole
computation and AQE re-plans each stage at runtime.

Scale shape per iteration: ONE join of the node-sized rank table
against the edge list on ``src`` (ranks broadcast while nodes ≪ edges;
AQE decides) + ONE groupBy(dst) partial-aggregated sum. Edges never
change across iterations — persist or bucket them by ``src`` and every
iteration reuses the layout. Memory is O(nodes) per executor only when
broadcasting; otherwise everything streams.

No counterpart in the reference (row-loop ETL only); standard public
formulation (Brin & Page 1998; same shape as GraphX/Pregel's
aggregateMessages loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
)


def _require_numeric_ids(edges: DataFrame, src: str, dst: str, op: str) -> None:
    """Validate the documented numeric-id determinism contract up front.

    Both iterative operators compare and tie-break node ids as numbers
    (``-F.col(...)`` / uniform-rank arithmetic); a string id column
    would otherwise surface as a raw ANSI ``AnalysisException`` deep in
    round 1 instead of a contextual error at the call site."""
    dtypes = dict(edges.select(src, dst).dtypes)
    bad = {
        c: t for c, t in dtypes.items()
        if not t.startswith(_NUMERIC_PREFIXES)
    }
    if bad:
        cols = ", ".join(f"{c} ({t})" for c, t in sorted(bad.items()))
        raise ValueError(
            f"{op}: node id columns must be numeric — got {cols}. "
            "Ids are compared and tie-broken as numbers (the "
            "determinism contract); hash or dictionary-encode string "
            "ids first, e.g. F.xxhash64(col)."
        )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
    decimals: int = 6,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Fixed-iteration weighted PageRank → ``(id, rank)``.

    Transition weights are out-degree-normalized (``w(u→v) =
    w_uv / Σ_t w_ut`` — exact integer division when ``weight_col`` is a
    count, so every engine derives identical doubles), rank starts
    uniform at ``1/N`` over the nodes APPEARING IN EDGES, and each of
    the ``iterations`` rounds computes ``r'(v) = (1−d)/N +
    d·Σ_u r(u)·w(u→v)``. Dangling nodes (no out-edges) leak their mass
    by this formulation — feed a symmetrized edge list (as the
    co-occurrence query does) or append self-loops if that matters for
    your graph. Ranks are rounded only in the caller's final
    projection, not between iterations (both engines iterate on raw
    doubles; last-ulp drift over a handful of iterations stays far
    below 1e-6).

    Multi-consumer lineage is TRUNCATED with lazy local checkpoints:
    the normalized edge list and node set materialize once (to executor
    storage — the standard iterative-graph trade, cf. GraphX caching),
    so the caller's edge-construction plan (the supplier query's
    lineitem self-join) never re-runs. The per-round ranks are NOT
    checkpointed — see the loop comment: the chain is linear, and the
    pin's plan-build-time stage finalization cost a driver round-trip
    per iteration.

    ``broadcast_ranks`` (default True) pins the rank⋈edges join
    strategy: checkpointed frames carry no size stats, so the planner
    would otherwise sort-merge — shuffling the EDGE list every
    iteration. The rank table is node-cardinality (the small side of
    any real graph); broadcasting it keeps the edges where they are
    and only the per-dst partial sums move. Set False for graphs whose
    node set exceeds executor memory (a billion-node web graph) — the
    join falls back to the shuffle the planner picks.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    _require_numeric_ids(edges, src, dst, "pagerank")
    w = F.col(weight_col) if weight_col else F.lit(1)
    # the caller's edge-construction plan (often a self-join) is read by
    # deg, norm AND nodes — materialize it once, not 3-4×
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
    norm = (
        e.join(deg, "__src")
        .select(
            "__src", "__dst", (F.col("__w") / F.col("__deg")).alias("__tw")
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__src").alias("id"))
        .unionByName(e.select(F.col("__dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_tot = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    ranks = nodes.crossJoin(n_tot).select(
        "id", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for i in range(iterations):
        r_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            r_side.join(norm, ranks["id"] == norm["__src"])
            .groupBy(F.col("__dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("__tw")).alias("__c"))
        )
        if broadcast_ranks:
            contrib = F.broadcast(contrib)
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(n_tot)
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # NO per-round checkpoint: each round's ranks feed the next
        # round exactly ONCE (contrib), and the new ranks rebuild from
        # the pinned ``nodes`` — the unrolled plan is LINEAR in k, so
        # nothing recomputes. A per-round localCheckpoint(eager=False)
        # here was not lazy in practice: converting to an RDD finalizes
        # AQE query stages at plan-BUILD time, so every iteration ran
        # its exchanges as separate driver-visible jobs; composing all
        # k rounds into the final action executes the same exchanges
        # inside ONE query (measured: 24→9 jobs for the supplier
        # query). Contrast label_propagation below, whose labels ARE
        # consumed twice per round and keep their pin.
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    weight_col: "str | None" = None,
    iterations: int = 3,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Fixed-iteration SYNCHRONOUS label propagation (Raghavan et al.
    2007) → ``(id, label)`` — community detection for the co-occurrence
    graphs this module already ranks: every node starts labeled with
    its own id, and each round adopts the label carrying the highest
    incoming vote weight (ties → the SMALLEST label; a node receiving
    no votes keeps its current label). After k rounds, nodes sharing a
    label form a community. Votes flow ``src → dst`` along the given
    edges — feed a symmetrized edge list for the undirected semantics
    (as the supplier co-occurrence query does).

    Determinism contract (the differential-testing rule): node ids
    must be NUMERIC (labels are compared and tie-broken as numbers;
    hash string ids first), vote weights integral, and the argmax is
    (weight DESC, label ASC) — so an unrolled SQL oracle replays every
    round exactly. Unlike asynchronous LPA (order-dependent, not
    reproducible) the synchronous fixed-k form is a pure function of
    the edge list.

    Scale shape per round (the ``pagerank`` pattern): ONE node-sized
    labels⋈edges join (broadcast while nodes ≪ edges —
    ``broadcast_labels``, same trade as ``broadcast_ranks``) + one
    (dst, label) partial-agg count + one per-dst struct-max argmax
    riding the same exchange. No collect in the loop; iteration
    lineage truncated with lazy local checkpoints so round k never
    re-runs rounds 1..k-1 or the caller's edge-construction plan."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    _require_numeric_ids(edges, src, dst, "label_propagation")
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("__src").alias("id"))
        .unionByName(e.select(F.col("__dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("id", F.col("id").alias("label"))
    for i in range(iterations):
        l_side = F.broadcast(labels) if broadcast_labels else labels
        votes = (
            l_side.join(e, labels["id"] == e["__src"])
            .groupBy(F.col("__dst").alias("id"), F.col("label"))
            .agg(F.sum("__w").alias("__cnt"))
        )
        # deterministic argmax: max over (count, -label) structs — the
        # struct comparison orders by count first, then by the SMALLEST
        # label among ties (max of the negation)
        winner = votes.groupBy("id").agg(
            F.max(
                F.struct(
                    F.col("__cnt").alias("c"),
                    (-F.col("label")).alias("nl"),
                )
            ).alias("__m")
        ).select("id", (-F.col("__m.nl")).alias("__new"))
        if broadcast_labels:
            winner = F.broadcast(winner)
        labels = (
            nodes.join(labels, "id")
            .join(winner, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
        )
        if i < iterations - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels
