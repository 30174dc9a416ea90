"""[EXT] Similarity search over embedding columns (SURVEY.md §2.11).

The ``embeddings`` fixture is ``(vec_id bigint, embedding array<float>,
label int)``. Three tiers:

1. ``cosine_topk_query`` — brute-force top-k for ONE query vector:
   a single scan + TakeOrderedAndProject; no shuffle of vector data at
   all. This is the correctness baseline and is already the right plan
   for "scan 100 TB, keep k rows".
2. ``cosine_topk_pairs`` — all-pairs per-vector top-k (crossJoin +
   window). Quadratic; only for small/filtered sets — the scale path is
   (3).
3. ``lsh_topk`` / ``embedding_near_dups`` — random-hyperplane LSH:
   deterministic planes (seeded numpy, shipped as literals), bucket on
   the sign-bit signature, search within bucket (multi-probe via
   signature prefix length). Turns the quadratic join into a bucketed
   equi-join — the standard ANN trade (recall < 1 for cosine ranges
   near the plane boundaries).

Cosine math is ``F.zip_with``/``F.aggregate`` over the array column —
JVM-side, no UDFs. At scale, pre-normalizing vectors once
(``l2_normalize``) turns cosine into a dot product and halves the work
in repeated queries.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine, dot, l2_norm, lit_double_array

# Bump when ivf_materialize / pq_materialize numerics or on-disk layout
# change — cache markers (queries.py) compare these so a code change
# invalidates previously materialized layouts instead of silently
# reusing them (ADVICE r4 #1).
IVF_LAYOUT_VERSION = 1
PQ_LAYOUT_VERSION = 1


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an array<float|double> column (NULL on zero
    norm). The norm is LET-BOUND (1-element ``transform`` array) so it
    evaluates once per row — a bare ``transform(vec, x / l2_norm(vec))``
    would re-inline the norm per element (d² work per row, the
    CollapseProject trap)."""
    return F.flatten(
        F.transform(
            F.array(l2_norm(vec)),
            lambda n: F.when(n > 0, F.transform(vec, lambda x: x / n)),
        )
    )


def _lit_vec(vec: Sequence[float]) -> Column:
    # one SQL parse, not one py4j lit per element — a 64-dim query
    # vector or hyperplane costs ~30-60 ms the elementwise way and the
    # signature helpers build 8-12 of them per plan (bit-identical
    # literal; see functions.lit_double_array)
    return lit_double_array(vec)


def cosine_topk_query(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to one literal query vector.

    Plan shape: parquet scan → project (cosine) → global top-k
    (TakeOrderedAndProject — Spark keeps k rows per partition then
    merges, no full sort, no shuffle of the data)."""
    sim = cosine(F.col(vec_col).cast("array<double>"), _lit_vec(query_vec))
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_pairs(
    df: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector top-k neighbors, brute force (all-pairs + window).

    O(n²) — correctness baseline / small filtered sets only; use
    ``lsh_topk`` at scale. Excludes self-pairs; ties break on neighbor
    id for determinism."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("__vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine_sim").desc(), F.col("id_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cosine_sim", "rank")
    )


def hyperplane_signature(
    vec: Column, planes: np.ndarray
) -> Column:
    """LSH bucket id: sign bit per random hyperplane, packed to a long.
    ``planes`` is (n_planes, dim); shipped as literals (deterministic).

    The per-plane dot stays a higher-order ``aggregate`` fold: an
    expanded flat sum of dim×n_planes products measures ~4× SLOWER here
    — the generated method blows past codegen size limits and the whole
    stage falls back to interpreted eval. (Measured at dim=64 × 8
    planes; revisit only with benchmarks.)"""
    bits = [
        F.when(dot(vec, _lit_vec(p)) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b  # disjoint bits → sum == OR
    return out


def make_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def _query_signature(query_vec: Sequence[float], planes: np.ndarray) -> int:
    """Driver-side signature for one query vector via a plain sequential
    left-to-right sum — the SAME association order as the SQL-side
    aggregate in ``hyperplane_signature`` (np.dot uses pairwise
    summation, which can flip the sign of a dot product landing near
    the 0 boundary and put the query in a bucket its own row isn't in).
    Keeps the bucket choice reproducible by any engine that folds the
    product list sequentially."""
    qsig = 0
    for i, p in enumerate(planes):
        acc = 0.0
        for x, y in zip(query_vec, p):
            acc = acc + float(x) * float(y)
        if acc >= 0:
            qsig += 1 << i
    return qsig


def plane_families(
    dim: int, n_planes: int, seed: int, n_families: int
) -> list[np.ndarray]:
    """``n_families`` independent deterministic plane sets: family ``f``
    seeds at ``seed + f``, so family 0 is exactly the single-family
    planes (back-compatible buckets) and every family is reproducible
    by any engine from the same rule."""
    return [make_planes(dim, n_planes, seed + f) for f in range(n_families)]


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    n_families: int = 1,
) -> DataFrame:
    """ANN top-k for one query: scan only rows whose LSH bucket matches
    the query's bucket (partition-prunable if the table is written
    bucketed/partitioned by signature). Approximate — recall depends on
    n_planes; lower n_planes = bigger buckets = higher recall & cost.

    ``n_families > 1`` unions several independent plane families
    (VERDICT r3 #6 — the standard multi-family OR-construction): a row
    is a candidate if it shares the query's bucket in ANY family, so
    recall rises as 1-(1-p^n_planes)^n_families while per-bucket cost
    stays at n_planes bits. Still ONE scan — the per-family equality
    tests are OR-ed into a single filter predicate."""
    fams = plane_families(len(query_vec), n_planes, seed, n_families)
    v = F.col(vec_col).cast("array<double>")
    cond = None
    for planes in fams:
        qsig = _query_signature(query_vec, planes)
        term = hyperplane_signature(v, planes) == F.lit(qsig)
        cond = term if cond is None else (cond | term)
    sim = cosine(v, _lit_vec(query_vec))
    return (
        df.filter(cond)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    nearest-by-cosine centroid. Returns (id_col, cluster_id).

    Default centroids are the vectors with ``id < n_centroids`` —
    deterministic and engine-independent (any SQL engine reproduces the
    exact assignment), unlike k-means training. For real corpora pass a
    trained codebook as ``centroids`` — a ``(cluster_id, centroid)``
    DataFrame, e.g. from ``ivf_train`` — the plan shape is identical.

    Plan: broadcast the k centroids, cross-join, then ONE hash
    aggregate ``max_by`` per vector (map-side partial max — the shuffle
    payload is (id, sim, cid), never the vectors; no sort window).
    Ties break to the lowest centroid id. At scale, write the corpus
    partitioned by ``cluster_id`` once so probes become partition
    pruning instead of a runtime join.
    """
    if centroids is not None:
        cent = centroids.select(
            F.col("cluster_id").alias("__cid"),
            F.col("centroid").cast("array<double>").alias("__cv"),
        )
    else:
        cent = df.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    sim = cosine(F.col("__v"), F.col("__cv"))
    return (
        v.crossJoin(F.broadcast(cent))
        .select(F.col(id_col), sim.alias("__sim"), F.col("__cid"))
        .groupBy(id_col)
        .agg(
            # max of (sim, -cid) ⇒ highest similarity, lowest cid on ties
            F.max_by(
                "__cid", F.struct(F.col("__sim"), (-F.col("__cid")).alias("__nc"))
            ).alias("cluster_id")
        )
    )


def _ivf_candidates(
    df: DataFrame,
    query_vec: Sequence[float],
    *,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    nprobe: int,
) -> DataFrame:
    """Shared IVF candidate restriction (``ivf_topk`` + ``ivf_pq_topk``):
    rank the deterministic centroids (id < n_centroids) by cosine to the
    query, keep the ids assigned to the best ``nprobe`` cells. Probe
    selection is a k-row top-n; the restriction is a broadcast
    semi-join on ``cluster_id``."""
    cent = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    probes = (
        cent.select(
            "__cid", cosine(F.col("__cv"), _lit_vec(query_vec)).alias("__qs")
        )
        .orderBy(F.col("__qs").desc(), F.col("__cid"))
        .limit(nprobe)
        .select(F.col("__cid").alias("cluster_id"))
    )
    assign = ivf_assign(
        df, vec_col=vec_col, id_col=id_col, n_centroids=n_centroids
    )
    return assign.join(F.broadcast(probes), "cluster_id", "left_semi").select(
        id_col
    )


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k via IVF: rank centroids by similarity to the query,
    exact-search only the vectors assigned to the best ``nprobe``
    clusters. The second scale path next to sign-LSH (``lsh_topk``) —
    recall rises with ``nprobe`` (``nprobe == n_centroids`` is exact).

    Everything is relational: probe selection is a k-row top-n, the
    candidate restriction is a broadcast semi-join on ``cluster_id``,
    and the final ranking is TakeOrderedAndProject. With the corpus
    pre-partitioned by ``cluster_id`` the candidate join disappears
    into partition pruning.
    """
    cand_ids = _ivf_candidates(
        df,
        query_vec,
        vec_col=vec_col,
        id_col=id_col,
        n_centroids=n_centroids,
        nprobe=nprobe,
    )
    sim = cosine(F.col(vec_col).cast("array<double>"), _lit_vec(query_vec))
    return (
        df.join(cand_ids, id_col)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_materialize(
    df: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
) -> None:
    """Write the corpus ONCE partitioned by IVF cluster — the scale form
    of IVF (VERDICT r2 #6): per-query nearest-centroid re-assignment
    (a broadcast cross-join over the whole corpus, ``ivf_assign``)
    becomes a one-time layout cost, and every subsequent probe is pure
    partition pruning — the query reads only ``nprobe`` directories out
    of ``n_centroids``, never touching the rest of the 100 TB.

    Layout: ``<path>/cluster_id=<c>/...`` (Hive-partitioned parquet) +
    the centroid codebook at ``<path>/_centroids`` (underscore-prefixed
    ⇒ invisible to the data reader).
    """
    # ONE centroid frame drives both the assignment and the persisted
    # codebook — deriving them independently would let the seeding rule
    # drift apart and leave a layout whose _centroids lies about it
    cent = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("centroid"),
    )
    assign = ivf_assign(df, vec_col=vec_col, id_col=id_col, centroids=cent)
    (
        df.join(assign, id_col)
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )
    (
        cent.select(F.col("cluster_id").alias("cid"), F.col("centroid").alias("cv"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_centroids")
    )


def ivf_probe_clusters(
    spark, path: str, query_vec: Sequence[float], nprobe: int = 4
) -> list:
    """The ``nprobe`` cluster ids nearest the query, from the codebook
    written by ``ivf_materialize``. A tiny driver collect (codebook is
    n_centroids rows) whose result becomes a literal partition filter.
    Tie-break (sim desc, cid asc) matches ``ivf_topk``/the oracle."""
    cent = spark.read.parquet(f"{path}/_centroids")
    return [
        r["cid"]
        for r in cent.select(
            "cid", cosine(F.col("cv"), _lit_vec(query_vec)).alias("__qs")
        )
        .orderBy(F.col("__qs").desc(), F.col("cid"))
        .limit(nprobe)
        .collect()
    ]


def ivf_topk_materialized(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over an ``ivf_materialize``d layout.

    Probe selection collects ``nprobe`` centroid ids to the driver (a
    k-row collect over the tiny codebook — same class as the JDBC
    bounds probe) so the cluster restriction is a LITERAL ``IN`` filter
    on the partition column: the parquet scan plans only the probed
    ``cluster_id=`` directories (PartitionFilters), no join, no
    re-assignment. Tie-breaks (sim desc, cid asc) match ``ivf_topk``
    and the DuckDB oracle exactly.
    """
    probes = ivf_probe_clusters(spark, path, query_vec, nprobe=nprobe)
    d = spark.read.parquet(path).filter(F.col("cluster_id").isin(probes))
    sim = cosine(F.col(vec_col).cast("array<double>"), _lit_vec(query_vec))
    return (
        d.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold),
    returned as (id_i, id_j, cosine_sim) with id_i < id_j.

    ``exact=True``: block-matrix brute force — the comparison side is
    collected to a numpy matrix, broadcast, and BLAS-multiplied against
    each Arrow batch in ``mapInPandas`` (one matmul per batch). This is
    the fastest exact formulation at ANY size that fits the broadcast:
    a pure-expression cross-join was measured ~65× slower at 2k×2k
    because higher-order array functions (zip_with/aggregate) never
    enter whole-stage codegen — every pair's cosine runs interpreted
    with per-call allocations. The collected matrix is cached per
    session keyed by the input plan (``_BLOCK_SIDE_CACHE``), so
    repeated invocations — bench passes, threshold sweeps — skip the
    re-collect/re-broadcast (VERDICT r3 #3). The broadcast side must
    fit in executor memory (``broadcast_limit`` rows guard) — beyond
    that, use ``exact=False``.

    ``exact=False``: candidates restricted to equal random-hyperplane
    LSH buckets — the 100 TB path; high-cosine pairs collide with
    probability (1 − θ/π)^n_planes per plane set. Cosines are then
    exact-verified, so precision is 1 and only recall is approximate.
    """
    if exact:
        return _near_dups_block_matrix(
            df, vec_col, id_col, threshold, broadcast_limit
        )
    if n_planes < 1:
        # a 0-plane signature is constant: the bucket join becomes an
        # all-pairs self-join of the corpus — refuse loudly
        raise ValueError(f"n_planes must be >= 1, got {n_planes}")
    dim = _first_dim(df, vec_col)  # clear error on empty/NULL input
    planes = make_planes(dim, n_planes, seed)
    # ONE canonical (id, vec, bucket) plan self-joined under different
    # aliases: both join inputs shuffle on the bucket with IDENTICAL
    # subplans, so Spark's ReuseExchange computes signatures once and
    # replays the exchange for the other side.
    sig = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        hyperplane_signature(F.col(vec_col).cast("array<double>"), planes).alias("__b"),
    )
    cand = sig.alias("a").join(
        sig.alias("b"),
        (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__id") < F.col("b.__id")),
    )
    return (
        cand.select(
            F.col("a.__id").alias("id_i"),
            F.col("b.__id").alias("id_j"),
            F.round(cosine(F.col("a.__v"), F.col("b.__v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# Per-session cache of the collected+broadcast comparison side, keyed by
# the input plan's semantic hash (verified with sameSemantics before use
# — a hash collision must never serve the wrong matrix). Lets repeated
# exact-near-dup invocations over the same frame skip the
# collect+broadcast rebuild, which dominated the small-input cost.
# BOUNDED: at most _BLOCK_CACHE_MAX entries; eviction UNPERSISTS the old
# Spark broadcasts (frees executor copies now, keeps previously-returned
# plans re-executable — see the eviction-loop comment) so a threshold
# sweep over many frames can't pin every collected matrix in
# driver+executor memory for the session's lifetime.
_BLOCK_SIDE_CACHE: dict = {}
_BLOCK_CACHE_MAX = 4


def _block_side(df: DataFrame, vec_col: str, id_col: str, broadcast_limit: int):
    proj = df.select(F.col(id_col), F.col(vec_col))
    key = (proj.semanticHash(), id_col, vec_col)
    hit = _BLOCK_SIDE_CACHE.get(key)
    # a cached side is reusable only if it passes the CALLER's limit
    if hit is not None and hit[0].sameSemantics(proj) and hit[1] <= broadcast_limit:
        return hit[2]
    rows = proj.limit(broadcast_limit + 1).collect()
    if len(rows) > broadcast_limit:
        raise ValueError(
            f"exact near-dup side exceeds broadcast_limit={broadcast_limit}; "
            "use exact=False (LSH) at this scale"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.inf  # zero vectors never match
    sc = df.sparkSession.sparkContext
    payload = (sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms))
    while len(_BLOCK_SIDE_CACHE) >= _BLOCK_CACHE_MAX:
        oldest = next(iter(_BLOCK_SIDE_CACHE))
        _, _, old = _BLOCK_SIDE_CACHE.pop(oldest)
        for b in old:
            try:
                # unpersist (not destroy): frees the executor copies now;
                # a previously-returned plan that still references the
                # broadcast stays re-executable (the driver re-ships it)
                b.unpersist(blocking=False)
            except Exception:  # noqa: BLE001 — a dead context must not break the caller
                pass
    _BLOCK_SIDE_CACHE[key] = (proj, len(rows), payload)
    return payload


_SMALL_PAIRS_LIMIT = 5000


def _near_dups_block_matrix(
    df: DataFrame, vec_col: str, id_col: str, threshold: float, broadcast_limit: int
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via broadcast numpy + per-batch
    BLAS matmul. Distributed over the row side; the column side is one
    driver collect (guarded, session-cached per input plan).

    Below ``_SMALL_PAIRS_LIMIT`` rows the pair set is computed straight
    from the already-collected side matrix — one driver BLAS matmul +
    ``createDataFrame`` — instead of a second pass through mapInPandas
    (VERDICT r4 ask #3: the Arrow→Python→Arrow roundtrip has a ~0.3 s
    floor at ANY size, dominating the small case; the matmul itself is
    ~20 ms at 2k×64). No extra data movement: the matrix was collected
    for the broadcast side anyway, and the numerics are the identical
    numpy expressions the distributed branch runs. Past the threshold
    the probe side streams distributed, same as before."""
    import pandas as pd

    b_ids, b_mat, b_norms = _block_side(df, vec_col, id_col, broadcast_limit)
    if len(b_ids.value) <= _SMALL_PAIRS_LIMIT:
        ids, mat, norms = b_ids.value, b_mat.value, b_norms.value
        sims = (mat @ mat.T) / np.outer(norms, norms)
        ii, jj = np.nonzero(
            (np.round(sims, 6) >= threshold) & (ids[:, None] < ids[None, :])
        )
        pdf = pd.DataFrame(
            {
                "id_i": ids[ii],
                "id_j": ids[jj],
                "cosine_sim": np.round(sims[ii, jj], 6),
            }
        )
        return df.sparkSession.createDataFrame(
            pdf, schema="id_i long, id_j long, cosine_sim double"
        )

    def batches(it):
        for pdf in it:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = np.inf
            sims = (q @ b_mat.value.T) / np.outer(qn, b_norms.value)
            # id_i < id_j ordering dedups the symmetric matrix
            ii, jj = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (q_ids[:, None] < b_ids.value[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_i": q_ids[ii],
                    "id_j": b_ids.value[jj],
                    "cosine_sim": np.round(sims[ii, jj], 6),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        batches, schema="id_i long, id_j long, cosine_sim double"
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str, *, decimals: int = 6
) -> DataFrame:
    """Mean vector per label — the vector-aggregate behind IVF centroid
    training, class prototypes, and cluster summaries.

    Relational formulation: ``posexplode`` the vector and average per
    (label, position), then fold positions back into an ordered array.
    The exploded stream is rows × dim but map-side partial aggregation
    collapses it to labels × dim BEFORE the exchange — at 100 TB the
    shuffle payload is the centroid matrix, not the corpus. The
    rebuild's ``collect_list`` is bounded by dim per (label) group.
    Components are rounded so differently-ordered partial sums agree
    across engines and runs.
    """
    pos = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    per_dim = pos.groupBy(label_col, "pos").agg(
        F.round(F.avg("col"), decimals).alias("__v")
    )
    return per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "__v"))), lambda s: s["__v"]
        ).alias("centroid")
    )


def ivf_train(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Train an IVF codebook with Lloyd iterations: deterministic init
    (the ``id < n_centroids`` vectors), then ``iters`` rounds of
    assign-to-nearest (``ivf_assign`` — broadcast centroids, map-side
    ``max_by``) and recompute-means (``label_centroids`` — map-side
    partial vector sums). Returns ``(cluster_id, centroid)``.

    Per iteration the corpus is scanned once and the only exchanges
    carry (id, cluster) pairs and the k×dim centroid matrix — nothing
    vector-sized ever shuffles, which is what makes Lloyd viable at
    100 TB. ``localCheckpoint`` truncates lineage per round (iterative
    plans would otherwise nest ``iters`` deep). Clusters that lose all
    members simply drop out of the codebook (standard small-k Lloyd
    behavior; callers needing exactly k re-seed from the data).
    Deterministic end-to-end: init, tie-breaks (lowest cluster id),
    and rounded means are all engine-stable.
    """
    cent = df.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("centroid"),
    )
    for _ in range(iters):
        assign = ivf_assign(
            df, vec_col=vec_col, id_col=id_col, centroids=cent
        )
        members = df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__mv")
        ).join(assign, id_col)
        cent = (
            label_centroids(members, "cluster_id", "__mv")
            .select("cluster_id", "centroid")
            .localCheckpoint()
        )
    return cent


def _first_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from one row — a single-row driver probe
    (same class as the JDBC bounds probe), used once per plan build."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError(f"cannot infer dim: {vec_col!r} has no rows")
    return int(row["d"])


def _guard_broadcast_side(
    df: DataFrame, id_col: str, limit: int, op_name: str
) -> None:
    """Raise if a side about to be broadcast exceeds ``limit`` rows —
    the same loud-failure contract as ``embedding_near_dups``'s
    ``broadcast_limit``: a ValueError at plan-build time beats an
    executor OOM mid-job. The probe is a bounded narrow count
    (``limit(limit+1).count()``) over the id column only."""
    n = df.select(id_col).limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"{op_name}: query side exceeds broadcast_limit={limit} rows; "
            "swap the sides (broadcast the smaller one) or raise the limit "
            "only if executors have the memory for it"
        )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Batch k-NN join (retrieval): for EVERY query vector, the top-k
    most-cosine-similar corpus vectors →
    ``(query_id, neighbor_id, cosine_sim, rank)``.

    The many-queries generalization of ``cosine_topk_query`` — the
    shape behind retrieval-augmented dataset construction, eval-set
    mining, and hard-negative sampling. Exact scoring: the query side
    is broadcast (queries ≪ corpus is the working assumption, enforced
    by a ``broadcast_limit`` count probe that raises loudly instead of
    OOMing an executor — VERDICT r3 #2), every corpus partition scores
    all queries locally, and the per-query top-k uses ``row_number() <= k`` which
    Spark executes with a map-side WindowGroupLimit: each scan
    partition forwards at most k candidates per query, so the one
    shuffle carries O(queries × k × partitions) rows — never the
    |Q|×|C| score matrix. Self-matches are NOT excluded (a query table
    disjoint from the corpus has none; filter afterwards when querying
    the corpus against itself).

    Ties break on rounded similarity then neighbor id, so ranks are
    deterministic and engine-portable (round-before-rank, same as the
    DuckDB oracle).
    """
    _guard_broadcast_side(queries, query_id, broadcast_limit, "knn_join")
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def knn_join_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    broadcast_limit: int = 2_000_000,
    n_families: int = 1,
) -> DataFrame:
    """ANN variant of ``knn_join``: both sides are sign-LSH bucketed by
    the SAME deterministic hyperplanes and candidates come from an
    equi-join on the bucket — per-query work shrinks from |corpus| to
    the bucket occupancy (~|corpus| / 2^n_planes for centered data).
    Recall is approximate (a true neighbor in another bucket is
    missed; queries may return fewer than k rows); raise recall with
    fewer planes or with ``n_families > 1`` (VERDICT r3 #6): each side
    gets one bucket per independent plane family and candidates come
    from matching in ANY family — a (family, bucket) equi-join after
    ``posexplode``, deduped before ranking, so the plan stays a bucket
    equi-join and the result is a superset of every single family's.
    At 100 TB the corpus side can be written bucketed/partitioned by
    ``__bk`` so the probe prunes partitions instead of shuffling.
    """
    _guard_broadcast_side(queries, query_id, broadcast_limit, "knn_join_lsh")
    fams = plane_families(
        _first_dim(corpus, corpus_vec), n_planes, seed, n_families
    )

    def bucketed(sdf, idc, vecc, out_id, out_vec):
        v = F.col(vecc).cast("array<double>")
        return sdf.select(
            F.col(idc).alias(out_id),
            v.alias(out_vec),
            F.posexplode(
                F.array(*[hyperplane_signature(v, p) for p in fams])
            ).alias("__fam", "__bk"),
        )

    q = bucketed(queries, query_id, query_vec, "query_id", "__qv")
    c = bucketed(corpus, corpus_id, corpus_vec, "neighbor_id", "__cv")
    scored = c.join(F.broadcast(q), ["__fam", "__bk"]).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine_sim"),
    )
    if n_families > 1:
        # a pair colliding in several families must score/rank once
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale`` = max |x_i|,
    ``qvec[i] = round(127 · x_i / scale)`` — 4× (vs float32) to 8×
    (vs float64) smaller storage/scan footprint for a 100 TB embedding
    corpus, with dot products recoverable as
    ``(scale_a·scale_b/127²) · Σ qa_i·qb_i``.

    Pure projection (zero shuffle), JVM-side higher-order expressions.
    Zero vectors quantize to all-zero with scale 0 (dequantize returns
    the zero vector). Round is ties-away-from-zero in both Spark and
    DuckDB, so the differential oracle reproduces every code exactly."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(scale > 0, F.transform(v, lambda x: F.round(x * 127.0 / scale).cast("tinyint"))).otherwise(
        F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
    )


def dequantize(qvec: Column, scale: Column) -> Column:
    """array<double> reconstruction of a quantized vector."""
    return F.transform(qvec, lambda q: q.cast("double") * scale / F.lit(127.0))


def quantization_error(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 8,
) -> DataFrame:
    """Per-vector reconstruction error of the int8 quantization:
    ``(id, scale, max_abs_err, mse)`` — the acceptance report before
    switching a retrieval corpus to the quantized layout. Bound by
    construction: max_abs_err ≤ scale/254 (half a quantization step).
    Sums fold sequentially (``F.aggregate``) so any engine replaying
    the fold gets bit-identical error values."""
    qd = quantize_embeddings(df, vec_col=vec_col, id_col=id_col)
    # the UNROUNDED scale must feed the reconstruction; under the same
    # output name, Spark 4's lateral-column-alias resolution would bind
    # the error expressions to the ROUNDED `scale` alias in the final
    # select (silently inflating max_abs_err by up to half an ulp of
    # the 6-decimal rounding — caught by the differential gate), so the
    # working column is renamed before any aliasing can shadow it
    joined = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).join(qd.withColumnRenamed("scale", "__scale"), id_col)
    diff = F.zip_with(
        F.col("__v"),
        dequantize(F.col("qvec"), F.col("__scale")),
        lambda a, b: a - b,
    )
    max_err = F.array_max(F.transform(diff, lambda d: F.abs(d)))
    mse = F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d) / F.size("__v")
    return joined.select(
        F.col(id_col),
        F.round("__scale", 6).alias("scale"),
        F.round(max_err, decimals).alias("max_abs_err"),
        F.round(mse, decimals).alias("mse"),
    )


def semantic_dedup(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-space (semantic) deduplication: near-dup pairs →
    transitive clusters → one survivor per cluster. The semantic twin
    of the MinHash dedup_clusters pipeline — catches paraphrase-level
    duplicates whose token shingles share nothing. Returns one row per
    input id: (id, cluster_id, keep) where cluster_id is the
    component's minimum id and keep marks the survivor; rows with no
    near-dup edge are singleton clusters of themselves.

    Scale shape: pairs come from ``embedding_near_dups`` (LSH-bucketed
    by default — the 100 TB path; ``exact=True`` for the guarded
    small-side baseline), clustering from the O(log n)-round
    large-star/small-star contraction over the EDGE list only, and the
    final labeling is one ids-only left join back onto the corpus —
    vectors never enter the clustering shuffles.
    """
    from .dedup import near_dup_clusters

    pairs = embedding_near_dups(
        df,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        n_planes=n_planes,
        seed=seed,
        exact=exact,
    )
    clusters = near_dup_clusters(pairs).withColumnsRenamed(
        {"doc_id": "__cid", "cluster_id": "__lbl"}
    )
    return (
        df.select(F.col(id_col))
        .join(clusters, F.col(id_col) == F.col("__cid"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__lbl"), F.col(id_col)).alias("cluster_id"),
            (F.coalesce(F.col("__lbl"), F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )


def semdedup_cells(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding cloud into cells, find near-duplicate pairs ONLY within
    each cell, and keep per duplicate group the member LEAST similar to
    its cell centroid — the paper's diversity-preserving survivor rule
    (the most prototypical copies go; the outlier phrasing stays). The
    cell restriction is the alternative scale path to the LSH
    bucketing of ``semantic_dedup``: candidate work is bounded by
    Σ|cell|² instead of bucket collisions, and the cell width is an
    explicit knob (more centroids = smaller cells = less work, at
    recall cost for cross-cell twins — the same trade the paper makes).

    Returns one row per usable input id: (id, cell, cluster_id,
    cent_sim, keep) — cluster_id is the duplicate component's minimum
    id, singletons keep themselves, cent_sim is the 6-dp-rounded
    cosine to the assigned centroid (the survivor-rule key, exposed so
    the choice is auditable). NULL and zero-norm vectors are excluded
    (no cosine exists for them — the ``emb_ivf_train`` contract).

    Default centroids are the deterministic ``id < n_centroids``
    vectors (engine-independent, so a SQL oracle replays assignment,
    pairs, clustering, and survivor choice EXACTLY); pass a trained
    ``(cluster_id, centroid)`` codebook (e.g. from ``ivf_train``) for
    real corpora — the plan shape is identical.

    Plan shape: one broadcast-centroid assignment aggregate (ids and
    sims shuffle, never vectors), then ONE vector-carrying equi-join
    keyed on the cell — the only stage where vectors shuffle, grouped
    and bounded by cell; clustering runs on the ids-only edge list
    (large-star/small-star), and the survivor window partitions by the
    cluster label. At 100 TB write the corpus partitioned by cell once
    and the pair join becomes partition-local."""
    from pyspark.sql import Window

    from .dedup import near_dup_clusters

    def _usable(frame, vcol):
        # NULL/zero-norm vectors can't serve as centroids any more than
        # they can be members: a NULL centroid cosine would poison every
        # cent_sim — and the oracle draws centroids from the FILTERED
        # vector set, so the engine must too
        return frame.where(
            F.col(vcol).isNotNull()
            & (
                F.aggregate(
                    F.col(vcol).cast("array<double>"),
                    F.lit(0.0),
                    lambda a, x: a + x * x,
                )
                > F.lit(0.0)
            )
        )

    if centroids is not None:
        cent = _usable(centroids, "centroid").select(
            F.col("cluster_id").alias("__cid"),
            F.col("centroid").cast("array<double>").alias("__cv"),
        )
    else:
        cent = _usable(
            df.filter(F.col(id_col) < n_centroids), vec_col
        ).select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
    # an EMPTY centroid set would assign nothing and silently return an
    # empty frame — a dedup that drops the whole corpus. Fail loudly
    # (bounded 1-row probe; the operator is already eager through the
    # clustering, so this adds no new execution class).
    if not cent.limit(1).count():
        raise ValueError(
            "semdedup_cells: no usable centroids — default centroids are "
            f"the NULL/zero-norm-filtered vectors with {id_col} < "
            f"n_centroids ({n_centroids}); ids not starting near 0 need "
            "an explicit centroids codebook"
        )
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).where(
        F.col(vec_col).isNotNull()
        & (F.aggregate(F.col(vec_col).cast("array<double>"),
                       F.lit(0.0), lambda a, x: a + x * x) > F.lit(0.0))
    )
    assign = (
        v.crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            cosine(F.col("__v"), F.col("__cv")).alias("__sim"),
            F.col("__cid"),
        )
        .groupBy(id_col)
        .agg(
            # ties break to the lowest centroid id, the ivf_assign rule
            F.max_by(
                "__cid", F.struct(F.col("__sim"), (-F.col("__cid")).alias("__nc"))
            ).alias("cell"),
            F.round(F.max("__sim"), 6).alias("cent_sim"),
        )
    )
    # pre-normalize ONCE per member so each within-cell pair pays one
    # dot product instead of dot + two norms — the r8 semantic-gate
    # lesson (3× measured there); the oracle normalizes identically
    # (x / sqrt(Σx²) per element, then a sequential dot), so the
    # rounded threshold compare stays value-exact
    # members feeds THREE consumers (both sides of the pair join and the
    # final labeling) — without a checkpoint the broadcast-centroid
    # assignment aggregate and the per-member normalization recompute
    # once per consumer (measured ~3× the assignment cost at sf0.1).
    # Lazy checkpoint: the first consumer's job materializes it; at
    # 100 TB this is the "write the corpus partitioned by cell once"
    # step the docstring prescribes, paid once instead of three times.
    members = (
        v.join(assign, id_col)
        .withColumn(
            "__nrm",
            F.sqrt(F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)),
        )
        .withColumn(
            "__vn", F.transform(F.col("__v"), lambda x: x / F.col("__nrm"))
        )
        .drop("__v", "__nrm")
        .localCheckpoint(eager=False)
    )
    a = members.select(
        F.col(id_col).alias("__ia"), F.col("__vn").alias("__va"), "cell"
    )
    b = members.select(
        F.col(id_col).alias("__ib"), F.col("__vn").alias("__vb"), "cell"
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("__ia") < F.col("__ib"))
        .where(
            F.round(dot(F.col("__va"), F.col("__vb")), 6)
            >= F.lit(float(threshold))
        )
        .select(F.col("__ia").alias("id_i"), F.col("__ib").alias("id_j"))
    )
    clusters = near_dup_clusters(pairs).withColumnsRenamed(
        {"doc_id": "__nid", "cluster_id": "__lbl"}
    )
    labeled = (
        members.select(id_col, "cell", "cent_sim")
        .join(clusters, F.col(id_col) == F.col("__nid"), "left")
        .select(
            id_col,
            "cell",
            F.coalesce(F.col("__lbl"), F.col(id_col)).alias("cluster_id"),
            "cent_sim",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("cent_sim").asc(), F.col(id_col).asc()
    )
    return labeled.withColumn(
        "keep", F.row_number().over(w) == 1
    )


def mmr_diversify(
    candidates: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    k: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity stage of a retrieval pipeline: from a
    CANDIDATE set (already bounded by a retriever — this operator's
    contract, like the rerank stage of ``ir_retrieve_rerank``) pick
    ``k`` items greedily, each maximizing ``λ·relevance − (1−λ)·max
    cosine to the already-picked set`` — relevant results that aren't
    near-duplicates of each other, the classic fix for a result page
    of ten paraphrases. Returns (``sel_rank``, id, rel, ``mmr_score``);
    the first pick maximizes relevance alone (score ``λ·rel`` by
    convention), ties break to the lowest id at every step.

    Deterministic and oracle-replayable: pair cosines are dots of
    6-dp-stable pre-normalized vectors rounded to 6 dp (the semdedup
    pair rule), the greedy argmax orders by the 6-dp-rounded score then
    id — a SQL oracle unrolls the k rounds and reproduces every pick
    value-exactly. NULL/zero-norm vectors are excluded (no cosine
    exists for them).

    Scale shape: everything is bounded by the CANDIDATE count, never
    the corpus — per round, one ids-only anti-join, one 1-row
    collect_list aggregate of the picked (id, vector) structs, one
    broadcast nested-loop join of that single row (the broadcast
    one-row stats pattern), an IN-ROW array_max over the picked set,
    and a TakeOrderedAndProject(1). The corpus-sized work happened in
    the retriever; MMR adds k tiny stages on top. Like the other
    iterative operators (``ivf_train``), each round eagerly
    ``localCheckpoint``s the ≤ k-row picked set — without it every
    round's plan re-embeds all prior rounds' subtrees and the lazy
    composition blows up combinatorially.

    Execution contract: EAGER — calling this function RUNS Spark jobs
    (the candidate-set checkpoint, plus a checkpoint and a bounded
    count per round), unlike the build-a-lazy-plan default most
    operators keep. Any explain-only / plan-review consumer must treat
    it like the other iterative operators (``ivf_train``,
    ``connected components``): constructing it is executing it. It is
    deliberately NOT mounted behind a declarative spec for this
    reason; if it ever is, gate it the way the compiler's
    ``ctx.explain_only`` skips the nb keep_labels probe."""
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cand = (
        candidates.select(
            F.col(id_col),
            F.col(rel_col).alias("__rel"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .where(
            F.col(vec_col).isNotNull()
            & (
                F.aggregate(
                    F.col(vec_col).cast("array<double>"),
                    F.lit(0.0),
                    lambda a, x: a + x * x,
                )
                > F.lit(0.0)
            )
        )
        .withColumn(
            "__nrm",
            F.sqrt(
                F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)
            ),
        )
        .withColumn("__vn", F.transform(F.col("__v"), lambda x: x / F.col("__nrm")))
        .select(id_col, "__rel", "__vn")
        # checkpoint the candidate set too: every round's anti-join and
        # argmax reference it, and without the pin each reference
        # re-runs the RETRIEVER's corpus scan k times
        .localCheckpoint()
    )
    first = (
        cand.orderBy(F.desc("__rel"), F.asc(id_col))
        .limit(1)
        .select(
            F.lit(1).alias("sel_rank"),
            F.col(id_col),
            F.col("__rel"),
            F.round(F.lit(float(lam)) * F.col("__rel"), 6).alias("mmr_score"),
            F.col("__vn"),
        )
    )
    picked = first.localCheckpoint()
    for r in range(2, int(k) + 1):
        sel_arr = picked.agg(
            F.collect_list(F.struct(F.col(id_col), F.col("__vn"))).alias("__sel")
        )
        remaining = cand.join(
            picked.select(id_col), id_col, "left_anti"
        )
        scored = remaining.crossJoin(F.broadcast(sel_arr)).withColumn(
            "__ms",
            F.array_max(
                F.transform(
                    F.col("__sel"),
                    lambda s: F.round(dot(F.col("__vn"), s["__vn"]), 6),
                )
            ),
        )
        pick = (
            scored.withColumn(
                "__score",
                F.round(
                    F.lit(float(lam)) * F.col("__rel")
                    - F.lit(1.0 - float(lam)) * F.col("__ms"),
                    6,
                ),
            )
            .orderBy(F.desc("__score"), F.asc(id_col))
            .limit(1)
            .select(
                F.lit(int(r)).alias("sel_rank"),
                F.col(id_col),
                F.col("__rel"),
                F.col("__score").alias("mmr_score"),
                F.col("__vn"),
            )
        )
        picked = picked.unionByName(pick).localCheckpoint()
        if picked.count() < r:
            # candidate set exhausted before k picks — stop instead of
            # paying join+checkpoint jobs for k−r guaranteed-empty
            # rounds (the count is a cheap probe on the ≤ k-row
            # checkpointed frame)
            break
    return picked.select(
        "sel_rank", id_col, F.col("__rel").alias(rel_col), "mmr_score"
    )


def centroid_drift(
    old: DataFrame,
    new: DataFrame,
    label_col: str,
    vec_col: str,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots: per
    label, the cosine distance (1 − cos) between the old and new mean
    vectors, plus both side counts — the semantic complement of the
    scalar PSI drift report (``reconcile.distribution_drift``): "did
    this class's embedding cloud MOVE?" catches encoder swaps, prompt
    changes, and data-source shifts that per-column stats cannot see.

    Relational all the way: both sides posexplode → per-(label, dim)
    sums with map-side combine (the exchange carries labels × dim, not
    vectors) → one join on (label, dim) → one aggregate folding the
    dot product and norms. Nothing vector-sized shuffles; no UDFs.
    Labels present on only one side are dropped (no drift to measure).
    """

    def per_dim(df, prefix):
        pos = df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")),
        )
        return pos.groupBy("label", "pos").agg(
            F.avg("col").alias(f"{prefix}_v"),
            F.count(F.lit(1)).alias(f"{prefix}_n"),
        )

    a, b = per_dim(old, "a"), per_dim(new, "b")
    joined = a.join(b, ["label", "pos"])
    return (
        joined.groupBy("label")
        .agg(
            F.max("a_n").alias("n_old"),
            F.max("b_n").alias("n_new"),
            F.sum(F.col("a_v") * F.col("b_v")).alias("__dot"),
            F.sqrt(F.sum(F.col("a_v") * F.col("a_v"))).alias("__na"),
            F.sqrt(F.sum(F.col("b_v") * F.col("b_v"))).alias("__nb"),
        )
        .select(
            "label",
            "n_old",
            "n_new",
            # zero-norm centroid (all-zero placeholder embeddings):
            # cosine is undefined — emit NULL explicitly rather than a
            # non-ANSI silent NULL / ANSI DIVIDE_BY_ZERO crash
            F.when(
                (F.col("__na") > 0) & (F.col("__nb") > 0),
                F.round(
                    1.0 - F.col("__dot") / (F.col("__na") * F.col("__nb")), 6
                ),
            ).alias("cosine_drift"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def pq_codebook(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_codes: int = 16,
) -> list[list[float]]:
    """Deterministic PQ codebook: the full vectors with ``id_col <
    n_codes`` (same engine-independent convention as ``ivf_assign``
    centroids — any SQL engine reproduces the identical codes; for real
    corpora substitute per-subspace k-means codewords, the encode plan
    is unchanged). A k-row driver probe, like the IVF probe collects.
    """
    rows = (
        df.filter(F.col(id_col) < n_codes)
        .orderBy(id_col)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(f"codebook needs {n_codes} rows with {id_col} < {n_codes}")
    return [list(r[0]) for r in rows]


def _pq_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return dim // m


def _sq_subdist(v_expr: str, v_off: str, cb_off: str, sd: int) -> str:
    """SQL for the squared L2 distance between one subvector of ``v_expr``
    (starting at ``v_off``) and the codebook slice starting at ``cb_off``
    in the flat literal ``__cb``. Left-to-right fold so the float sum is
    order-deterministic and bit-reproducible by the DuckDB oracle."""
    a = f"element_at({v_expr}, {v_off} + i)"
    b = f"element_at(__cb, {cb_off} + i)"
    return (
        f"aggregate(sequence(1, {sd}), cast(0 as double), "
        f"(s, i) -> s + ({a} - {b}) * ({a} - {b}))"
    )


def pq_encode(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    codebook: list[list[float]] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Product quantization: split each vector into ``m`` subvectors and
    replace each with the id of its nearest (squared-L2) codeword —
    dim × 4 bytes become ``m`` small ints (codes), an 8-32× corpus
    compression that makes billion-vector scans RAM-resident. Returns
    (id_col, pq_codes array<int>, pq_err double) where ``pq_err`` is
    the total squared reconstruction error (= sum of per-subspace
    minimum distances — no second pass needed).

    Plan shape: the codebook is a tiny literal (≈ n_codes × dim doubles,
    the broadcast-variable equivalent), so encoding is a PURE PROJECTION
    — zero shuffles, zero joins; at 100 TB it's a single narrow map over
    the corpus, the cheapest shape Spark has. Ties (equal subdistance)
    take the lowest code id: the fold keeps the FIRST winner of a strict
    ``<`` over ascending code ids.

    ``dim`` (optional) skips the one-row dimensionality probe when the
    caller already knows it — important when ``df``'s lineage is
    expensive (``ivf_pq_topk``'s candidate join would re-run the whole
    coarse assignment just to read one row). Every row is still
    dim-checked IN the plan: a vector of any other length raises from
    the executor instead of silently mis-striding the codebook.
    """
    if dim is None:
        dim = _first_dim(df, vec_col)
    sd = _pq_geometry(dim, m)
    cb = codebook if codebook is not None else pq_codebook(
        df, vec_col=vec_col, id_col=id_col, n_codes=n_codes
    )
    if len(cb) != n_codes or any(len(c) != dim for c in cb):
        raise ValueError("codebook must be n_codes x dim")
    flat = ", ".join(repr(float(x)) + "D" for c in cb for x in c)
    dist = _sq_subdist("__v", f"j * {sd}", f"cc * {dim} + j * {sd}", sd)
    best = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"aggregate(sequence(0, {n_codes - 1}), "
        f"struct(cast(-1 as int) as c, cast('Infinity' as double) as d), "
        f"(acc, cc) -> if({dist} < acc.d, "
        f"struct(cast(cc as int) as c, {dist} as d), acc)))"
    )
    guarded_vec = (
        f"if(size({vec_col}) = {dim}, cast({vec_col} as array<double>), "
        f"raise_error(concat('pq_encode: vector dim ', "
        f"cast(size({vec_col}) as string), ' != codebook dim {dim}')))"
    )
    # stage the per-subspace argmin structs ONCE and derive both outputs
    # from the staged array — inlining `best` into each output would
    # lean on codegen subexpression elimination to avoid running the
    # dominant m × n_codes fold twice (ADVICE r4 #4)
    return (
        df.select(F.col(id_col), F.expr(guarded_vec).alias("__v"))
        .withColumn("__cb", F.expr(f"array({flat})"))
        .withColumn("__best", F.expr(best))
        .select(
            id_col,
            F.expr("transform(__best, x -> x.c)").alias("pq_codes"),
            F.expr(
                "round(aggregate(__best, cast(0 as double), (s, x) -> s + x.d), 6)"
            ).alias("pq_err"),
        )
    )


def pq_adc_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    full-precision, every corpus vector is scored by summing its ``m``
    query↔codeword subdistances — the IVF-PQ second stage (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search"). Returns the k
    (id, adc_dist) rows with the SMALLEST approximate distance.

    The classical ADC lookup table (m × n_codes floats, computed once
    per query) is folded inline here: the per-subspace query↔codeword
    distance is an expression over two literals, so Catalyst
    constant-folds what a hand-built LUT would cache, with identical
    left-to-right numerics. Scoring reads ONLY the m int codes — at
    scale the full vectors never leave parquet (column pruning), and
    the ranking is a TakeOrderedAndProject, no global sort.
    """
    cb = codebook if codebook is not None else pq_codebook(
        df, vec_col=vec_col, id_col=id_col, n_codes=n_codes
    )
    # geometry from the codebook (saves a corpus probe); the query must
    # match it — a mis-sized query would silently mis-stride the
    # codebook lookups into plausible-looking garbage distances
    dim = len(cb[0])
    if len(query_vec) != dim:
        raise ValueError(
            f"query_vec dim {len(query_vec)} != codebook dim {dim}"
        )
    sd = _pq_geometry(dim, m)
    enc = pq_encode(
        df,
        vec_col=vec_col,
        id_col=id_col,
        m=m,
        n_codes=n_codes,
        codebook=cb,
        dim=dim,
    )
    qflat = ", ".join(repr(float(x)) + "D" for x in query_vec)
    cbflat = ", ".join(repr(float(x)) + "D" for c in cb for x in c)
    lut = _sq_subdist("__q", f"j * {sd}", f"element_at(pq_codes, j + 1) * {dim} + j * {sd}", sd)
    score = (
        f"round(aggregate(sequence(0, {m - 1}), cast(0 as double), "
        f"(s, j) -> s + {lut}), 6)"
    )
    return (
        enc.withColumn("__q", F.expr(f"array({qflat})"))
        .withColumn("__cb", F.expr(f"array({cbflat})"))
        .select(id_col, F.expr(score).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN stack (Jégou et al.; FAISS
    ``IVFx,PQy``) — IVF coarse quantization prunes the corpus to the
    ``nprobe`` most promising cells, then ADC ranks ONLY those
    candidates in the compressed domain. Composes ``ivf_assign`` +
    ``pq_adc_topk``; the PQ codebook is taken from (or passed for) the
    FULL corpus, never the probed subset, so codes are query-independent
    and materializable.

    100 TB shape: with the corpus written ``partitionBy(cluster_id)``
    (``ivf_materialize``) and codes stored next to the vectors, a query
    reads nprobe/n_centroids of the dataset, scans m-byte codes instead
    of dim×4-byte vectors (the PQ win: candidate I/O shrinks ~32×), and
    ends in a TakeOrderedAndProject — no global sort, no full-precision
    vector ever read for scoring.
    """
    cb = codebook if codebook is not None else pq_codebook(
        df, vec_col=vec_col, id_col=id_col, n_codes=n_codes
    )
    cand_ids = _ivf_candidates(
        df,
        query_vec,
        vec_col=vec_col,
        id_col=id_col,
        n_centroids=n_centroids,
        nprobe=nprobe,
    )
    cand = df.join(cand_ids, id_col)
    return pq_adc_topk(
        cand,
        query_vec,
        k,
        vec_col=vec_col,
        id_col=id_col,
        m=m,
        n_codes=n_codes,
        codebook=cb,
    )


def pq_materialize(
    df: DataFrame,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
) -> None:
    """Encode the corpus ONCE and persist the PQ codes — the scale form
    of ADC search (mirror of ``ivf_materialize``): per-query encoding
    (a full-corpus fold) becomes a one-time layout cost; queries then
    scan the codes table alone — ``m`` small ints per vector instead of
    dim × 4 bytes, the 8-32× I/O shrink that makes billion-vector ADC
    scans RAM-speed.

    Layout: ``<path>/`` parquet of (id, pq_codes, pq_err) + the
    codebook at ``<path>/_codebook`` (underscore-prefixed ⇒ invisible
    to the data reader). ``pq_err`` rides along so the layout carries
    its own quantization-quality audit.
    """
    cb = pq_codebook(df, vec_col=vec_col, id_col=id_col, n_codes=n_codes)
    enc = pq_encode(
        df, vec_col=vec_col, id_col=id_col, m=m, n_codes=n_codes, codebook=cb
    )
    enc.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    rows = [(i, list(c)) for i, c in enumerate(cb)]
    (
        spark.createDataFrame(rows, "code int, cv array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_codebook")
    )


def pq_adc_topk_materialized(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    m: int = 8,
) -> DataFrame:
    """ADC top-k against a ``pq_materialize`` layout: read the codebook
    (n_codes tiny rows), score the persisted codes with the same inline
    query↔codeword fold as ``pq_adc_topk`` — identical numerics and
    tie-breaks, so the same oracle stays green via this path. The scan
    touches ONLY the codes column; no full-precision corpus vector is
    read anywhere.
    """
    cb_rows = spark.read.parquet(f"{path}/_codebook").orderBy("code").collect()
    cb = [list(r["cv"]) for r in cb_rows]
    dim = len(cb[0])
    if len(query_vec) != dim:
        raise ValueError(f"query_vec dim {len(query_vec)} != codebook dim {dim}")
    sd = _pq_geometry(dim, m)
    enc = spark.read.parquet(path).select(id_col, "pq_codes")
    qflat = ", ".join(repr(float(x)) + "D" for x in query_vec)
    cbflat = ", ".join(repr(float(x)) + "D" for c in cb for x in c)
    lut = _sq_subdist(
        "__q", f"j * {sd}", f"element_at(pq_codes, j + 1) * {dim} + j * {sd}", sd
    )
    score = (
        f"round(aggregate(sequence(0, {m - 1}), cast(0 as double), "
        f"(s, j) -> s + {lut}), 6)"
    )
    return (
        enc.withColumn("__q", F.expr(f"array({qflat})"))
        .withColumn("__cb", F.expr(f"array({cbflat})"))
        .select(id_col, F.expr(score).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def int8_topk_query(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar-quantized (int8) ANN top-k — the storage-first sibling of
    the PQ stack: the corpus is scored in its 4-8× smaller int8 form
    (``quantize_embeddings``), and because symmetric per-vector scales
    CANCEL in the cosine, the quantized cosine is just the cosine of
    the raw int code arrays — pure integer dot products, one sqrt at
    the end, no dequantize multiply per element. The query is quantized
    driver-side with the same ties-away-from-zero rule, so engine and
    oracle agree code-for-code. Scan → project → TakeOrderedAndProject;
    zero shuffles."""
    import math

    s = max(abs(float(x)) for x in query_vec)
    if s == 0:
        raise ValueError("int8_topk_query: zero query vector")
    qq = [
        math.copysign(math.floor(abs(float(x)) * 127.0 / s + 0.5), x)
        for x in query_vec
    ]
    # zero vectors quantize to scale 0 / all-zero codes — cosine is
    # undefined there; drop them (the oracle applies the same guard)
    qd = quantize_embeddings(df, vec_col=vec_col, id_col=id_col).filter(
        F.col("scale") > 0
    )
    sim = cosine(F.col("qvec").cast("array<double>"), _lit_vec(qq))
    return (
        qd.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def kcenter_sample(
    df: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset: start from the minimum
    id, then repeatedly add the point FARTHEST from the selected set
    (max over rows of min distance to any selected vector; euclidean,
    rounded to 6 before the argmax so the pick is engine-stable, id
    tiebreak) — the classic 2-approximation diverse-subset selection
    used to seed clustering and to pick maximally-diverse training
    examples.

    Scale shape: k-1 passes, each ONE scan + TakeOrderedAndProject(1)
    — the selected vectors ride as literals (like the IVF/PQ codebooks)
    so no join and no shuffle of the corpus; the driver holds k rows
    (small-by-construction collect). k is the caller's budget — this is
    for tens-to-hundreds of centers, not millions (use ivf_train's
    sampled k-means path there)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    first = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy(F.col(id_col))
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kcenter_sample: empty input")
    selected = [(first[0][0], [float(x) for x in first[0][1]])]
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    seen = {selected[0][0]}
    while len(selected) < k:
        dists = [
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("__v"), _lit_vec(vec), lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            for _, vec in selected
        ]
        mind = F.round(F.least(*dists) if len(dists) > 1 else dists[0], 6)
        nxt = (
            base.select(F.col(id_col), F.col("__v"), mind.alias("__md"))
            .orderBy(F.col("__md").desc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        if nxt[0] in seen:
            # every row is already selected (k exceeds the corpus) — a
            # "diverse coreset" with duplicate ids would be silent
            # nonsense downstream
            raise ValueError(
                f"kcenter_sample: k={k} exceeds the {len(selected)} "
                "distinct input rows"
            )
        seen.add(nxt[0])
        selected.append((nxt[0], [float(x) for x in nxt[1]]))
    spark = df.sparkSession
    # preserve the caller's id TYPE (string ids are fine) — build the
    # result with the input column's own schema
    return spark.createDataFrame(
        [(i,) for i, _ in selected], df.select(id_col).schema
    ).orderBy(id_col)


def matryoshka_recall_audit(
    df: DataFrame,
    query_vec: list[float],
    *,
    dims: tuple[int, ...] = (8, 16, 32),
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka truncation audit: recall@k of TRUNCATED-dimension
    cosine retrieval (first ``d`` coordinates, renormalized — the MRL
    deployment trick: store one 64-d vector, serve 8-d candidates)
    against the full-dimension exact top-k, one row per ``d`` —
    (dims, n_common, recall_at_k). The decision table for "how few
    dimensions can the first-stage retriever keep": pairs with the
    PQ/int8/LSH recall audits as the fourth compression axis.

    Plan: one scan projects EVERY truncated cosine at once (slices of
    the same array — no per-d scan), each d's top-k is a
    TakeOrderedAndProject over its own column (round-before-rank, id
    tiebreak), and the tiny k-row lists are intersected with one join
    per d. Nothing shuffles but k-row frames."""
    if not dims:
        raise ValueError("dims must be non-empty")
    if any(d < 1 for d in dims):
        raise ValueError(f"dims must be positive, got {dims}")
    if any(d > len(query_vec) for d in dims):
        # F.slice past the array end silently returns the full vector,
        # so an oversized d would audit full-width retrieval and report
        # recall 1.0 labeled as the truncation — refuse instead
        raise ValueError(
            f"dims {tuple(d for d in dims if d > len(query_vec))} exceed "
            f"the {len(query_vec)}-d query vector"
        )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )

    def topk_ids(d: int | None):
        qv = query_vec if d is None else query_vec[:d]
        v = F.col("__v") if d is None else F.slice(F.col("__v"), 1, d)
        sim = F.round(cosine(v, _lit_vec(qv)), 6)
        return (
            base.select("__id", sim.alias("__s"))
            .orderBy(F.col("__s").desc(), F.col("__id"))
            .limit(int(k))
            .select("__id")
        )

    full = topk_ids(None)
    out = None
    for d in dims:
        hits = topk_ids(d).join(full, "__id").agg(
            F.count(F.lit(1)).alias("n_common")
        )
        row = hits.select(
            F.lit(int(d)).alias("dims"),
            "n_common",
            F.round(F.col("n_common") / F.lit(int(k)), 6).alias("recall_at_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dims")


def hard_negative_mining(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    query_label: str = "label",
    corpus_label: str = "label",
    broadcast_limit: int = 2_000_000,
    exclude_self: bool | None = None,
) -> DataFrame:
    """Contrastive-training hard negatives: for every query, the ``k``
    most-similar corpus vectors with a DIFFERENT label →
    ``(query_id, neighbor_id, cosine_sim, rank)``. The mining step of
    embedding-model training (most-confusable wrong-class examples are
    where the gradient is); same broadcast + WindowGroupLimit shape as
    ``knn_join``, with the label-mismatch predicate applied BEFORE the
    per-query top-k so negatives never compete with positives for rank
    slots. NULL labels match nothing and are excluded from both sides
    (a NULL-label "negative" is an unlabeled example, not a
    counter-example). Self-pairs are excluded by id only when mining a
    corpus against itself: ``exclude_self`` defaults to "queries IS
    corpus" (same DataFrame object) — raw id equality across two
    UNRELATED tables with coinciding id spaces must not veto legitimate
    negatives; pass ``exclude_self`` explicitly to override either
    way."""
    if exclude_self is None:
        exclude_self = queries is corpus
    _guard_broadcast_side(queries, query_id, broadcast_limit, "hard_negative_mining")
    q = queries.filter(F.col(query_label).isNotNull()).select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("__qv"),
        F.col(query_label).alias("__ql"),
    )
    c = corpus.filter(F.col(corpus_label).isNotNull()).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("__cv"),
        F.col(corpus_label).alias("__cl"),
    )
    pred = F.col("__ql") != F.col("__cl")
    if exclude_self:
        pred = pred & (F.col("query_id") != F.col("neighbor_id"))
    scored = (
        c.join(F.broadcast(q))
        .filter(pred)
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def dim_stats(
    df: DataFrame, vec_col: str, *, decimals: int = 6
) -> DataFrame:
    """Per-dimension distribution stats of an embedding column →
    ``(dim, mean, std)`` (population std). The preprocessing readout
    feature-scaling needs (and the input to ``whiten``); also the
    anisotropy smell test — one dimension dominating the variance means
    cosine distances are effectively that dimension.

    100 TB shape: ``posexplode`` then ONE hash aggregate — map-side
    partial aggregation collapses rows × dim to dim (e.g. 64) partials
    per task before the exchange, so the shuffle payload is the stats
    table, not the corpus. Stats are rounded so differently-ordered
    partial sums agree across engines and runs (the round-before-use
    contract ``whiten`` relies on)."""
    pos = df.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    return (
        pos.groupBy(F.col("pos").alias("dim"))
        .agg(
            F.round(F.avg("col"), decimals).alias("mean"),
            F.round(F.stddev_pop("col"), decimals).alias("std"),
        )
        .orderBy("dim")
    )


def whiten(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-dimension standardization (z-score whitening) of an
    embedding column → ``(id, whitened)``: ``(x - mean) / std`` per
    dimension, zero-variance dimensions mapped to 0.0 (a constant
    dimension carries no signal; dividing by 0 would poison the
    vector). The classic pre-clustering / pre-PCA normalization —
    without it, high-variance dimensions dominate every distance.

    Two-job shape, both cheap: (1) the ``dim_stats`` aggregate (shuffle
    payload = dim rows) collected to the driver — a scalar-sized
    result, same contract as the IVF/centroid literals; (2) ONE
    zero-shuffle projection with the rounded stats inlined as literal
    arrays (``zip_with`` twice — no explode/regroup round-trip of the
    corpus, which would double the data motion at 100 TB). Stats are
    rounded BEFORE use in both engines, so the division is
    deterministic float64 on identical inputs — bit-stable parity."""
    stats = whiten_stats(df, vec_col, decimals=decimals)
    if not stats:
        return df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("whitened")
        ).limit(0)
    z = whiten_expr(F.col(vec_col), stats, decimals=decimals)
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), z.alias("whitened")
    )


def whiten_stats(
    df: DataFrame, vec_col: str, *, decimals: int = 6
) -> dict[int, tuple[float, float]]:
    """Collect the rounded per-dimension (mean, std) literals
    ``whiten_expr`` standardizes with — the bounded driver probe
    (``dim_stats`` aggregate: shuffle payload = dim rows)."""
    return {
        int(r["dim"]): (float(r["mean"]), float(r["std"]))
        for r in dim_stats(df, vec_col, decimals=decimals).collect()
    }


def whiten_expr(
    vec: Column, stats: dict[int, tuple[float, float]], *, decimals: int = 6
) -> Column:
    """The zero-shuffle z-score projection with the rounded stats
    inlined as literal arrays — the in-row half of ``whiten``, exposed
    so the declarative ``vector_transform`` stage can rewrite a column
    in place instead of joining a (id, whitened) frame back."""
    d = max(stats) + 1
    means = lit_double_array([stats[i][0] for i in range(d)])
    stds = lit_double_array([stats[i][1] for i in range(d)])
    centered = F.zip_with(vec.cast("array<double>"), means, lambda x, m: x - m)
    return F.zip_with(
        centered,
        stds,
        lambda c, s: F.when(s == 0.0, F.lit(0.0)).otherwise(
            F.round(c / s, decimals)
        ),
    )


def vector_quality_report(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    expected_dim: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Embedding-column QA gate — the data-quality pass BEFORE any ANN
    index build or semantic dedup trusts the vectors: one summary row
    of ``(n_vecs, n_null, n_wrong_dim, n_nonfinite, n_zero_norm,
    norm_mean, norm_std)``. NULL vectors, width drift (a re-embedding
    job that changed models mid-corpus), NaN/Inf coordinates (overflow
    in a producer), and zero-norm vectors (cosine against them is
    undefined — every downstream operator here would divide by zero)
    each get their own count; norm stats run over the HEALTHY vectors
    only, so a few corrupt rows can't mask a norm-scale shift.
    ``expected_dim`` defaults to the corpus' most common width (ties to
    the smaller), so drift is measured against the dominant population
    when no contract is declared.

    100 TB shape: per-row flags and norms are in-row array folds; ONE
    map-side-combined aggregate produces the single summary row —
    nothing shuffles but partial aggregates. Stats rounded
    (round-before-compare)."""
    v = F.col(vec_col).cast("array<double>")
    nn = v.isNotNull()
    if expected_dim is None:
        base_dim = (
            df.filter(nn)
            .groupBy(F.size(v).alias("__d"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.col("__n").desc(), F.col("__d"))
            .limit(1)
        )
        rows = base_dim.collect()  # 1-row driver probe: config, not data
        expected_dim = int(rows[0]["__d"]) if rows else 0
    dim_ok = nn & (F.size(v) == int(expected_dim))
    finite = F.aggregate(
        v,
        F.lit(True),
        lambda acc, x: acc & x.isNotNull() & ~F.isnan(x) & (F.abs(x) < float("inf")),
    )
    healthy_shape = dim_ok & F.coalesce(finite, F.lit(False))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    zero = healthy_shape & (norm == 0.0)
    healthy = healthy_shape & (norm > 0.0)
    return df.select(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((~nn).cast("int")).cast("long").alias("n_null"),
        F.sum((nn & ~(F.size(v) == int(expected_dim))).cast("int"))
        .cast("long")
        .alias("n_wrong_dim"),
        F.sum((dim_ok & ~F.coalesce(finite, F.lit(False))).cast("int"))
        .cast("long")
        .alias("n_nonfinite"),
        F.sum(zero.cast("int")).cast("long").alias("n_zero_norm"),
        F.round(F.avg(F.when(healthy, norm)), decimals).alias("norm_mean"),
        F.round(F.stddev_pop(F.when(healthy, norm)), decimals).alias("norm_std"),
    )


def label_noise_scan(
    df: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    min_disagreement: float = 0.5,
) -> DataFrame:
    """Mislabeled-example detector by k-NN label disagreement (the
    confident-learning / deep-kNN heuristic): for every labeled vector,
    the fraction of its k nearest neighbors (sign-LSH bucket
    candidates, self excluded) carrying a DIFFERENT label →
    ``(id, label, n_neighbors, n_disagree, disagreement, flagged)``.
    A point whose neighborhood overwhelmingly disagrees with its label
    is a labeling error or a boundary case — route ``flagged`` rows to
    human review before they poison a classifier or a hard-negative
    miner (which would serve actual positives as negatives).

    Unlike ``knn_join``/``knn_join_lsh`` (small query side, broadcast),
    this scans the WHOLE corpus against itself: both sides bucket by
    the same deterministic hyperplanes and candidates come from the
    (bucket) equi-join — a normal shuffle join keyed on the signature,
    no broadcast, so the corpus-self scan stays 100 TB-safe (write the
    corpus bucketed by signature and the join co-locates). Neighbors
    are approximate (bucket recall): isolated points may see fewer
    than k neighbors; points alone in their bucket report zero
    neighbors and are never flagged (no evidence ≠ noise).

    ``rank <= k`` with a constant k compiles to WindowGroupLimit — each
    task pre-limits its bucket-local candidates before the exchange."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 < min_disagreement <= 1.0):
        raise ValueError(
            f"min_disagreement must be in (0, 1], got {min_disagreement}"
        )
    planes = make_planes(_first_dim(df, vec_col), n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    sig = df.select(
        F.col(id_col),
        F.col(label_col),
        v.alias("__v"),
        hyperplane_signature(v, planes).alias("__bk"),
    )
    a = sig.select(
        F.col(id_col).alias("__qid"),
        F.col(label_col).alias("__qlbl"),
        F.col("__v").alias("__qv"),
        "__bk",
    )
    b = sig.select(
        F.col(id_col).alias("__nid"),
        F.col(label_col).alias("__nlbl"),
        F.col("__v").alias("__nv"),
        "__bk",
    )
    scored = (
        a.join(b, "__bk")
        .filter(F.col("__qid") != F.col("__nid"))
        .select(
            "__qid",
            "__qlbl",
            "__nid",
            "__nlbl",
            F.round(cosine(F.col("__qv"), F.col("__nv")), 6).alias("__sim"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("__nid")
    )
    top = scored.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    agg = top.groupBy(F.col("__qid").alias(id_col)).agg(
        F.first("__qlbl").alias(label_col),
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.sum(
            F.when(F.col("__nlbl") != F.col("__qlbl"), 1).otherwise(0)
        ).cast("long").alias("n_disagree"),
    )
    # left join back: points alone in their bucket still report a row
    base = df.select(F.col(id_col), F.col(label_col))
    out = base.join(agg.drop(label_col), id_col, "left")
    dis = F.when(
        F.col("n_neighbors").isNotNull(),
        F.round(F.col("n_disagree") / F.col("n_neighbors"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        label_col,
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        F.coalesce("n_disagree", F.lit(0)).alias("n_disagree"),
        dis.alias("disagreement"),
        (
            F.col("n_neighbors").isNotNull()
            & (
                F.col("n_disagree") * 1000
                >= F.lit(int(round(min_disagreement * 1000)))
                * F.col("n_neighbors")
            )
        ).alias("flagged"),
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str,
    *,
    decimals: int = 6,
    means: dict[int, float] | None = None,
) -> DataFrame:
    """Flattened covariance matrix of an embedding column →
    ``(pos, cov)`` rows with ``pos = i*d + j`` (row-major): ``cov =
    avg((x_i - m_i)(x_j - m_j))`` over non-null vectors, means the
    ROUNDED ``dim_stats`` means (the round-before-use contract, so
    engines center identically).

    100 TB shape: the in-row outer product is LET-BOUND (the centered
    array evaluates once per row, not once per of the d² lambda
    elements — the CollapseProject re-inlining trap), then ONE
    posexplode + map-side-combined aggregate: the exchange carries d²
    partials per task (4096 rows at d=64), never the corpus. Entries
    are rounded so differently-ordered partial sums agree across
    engines — downstream eigen-iterations then run on bit-identical
    inputs everywhere. Pass ``means`` (the rounded ``dim_stats`` means)
    when the caller already collected them — skips a redundant
    full-corpus aggregate."""
    stats = means if means is not None else {
        int(r["dim"]): float(r["mean"])
        for r in dim_stats(df, vec_col, decimals=decimals).collect()
    }
    if not stats:
        return df.sparkSession.createDataFrame([], "pos int, cov double")
    d = max(stats) + 1
    means = lit_double_array([stats[i] for i in range(d)])
    cent = F.zip_with(
        F.col(vec_col).cast("array<double>"), means, lambda x, m: x - m
    )
    # F.array(cent) + transform = let-binding: the lambda variable `c`
    # evaluates the centered array exactly once per row
    outer = F.flatten(
        F.transform(
            F.array(cent),
            lambda c: F.flatten(
                F.transform(c, lambda xi: F.transform(c, lambda xj: xi * xj))
            ),
        )
    )
    pos = df.filter(F.col(vec_col).isNotNull()).select(F.posexplode(outer))
    return pos.groupBy(F.col("pos")).agg(
        F.round(F.avg("col"), decimals).alias("cov")
    )


def _power_iterate(
    c: list[list[float]],
    d: int,
    iters: int,
    *,
    restart: bool,
    context: str,
) -> tuple[list[float], float]:
    """Driver-side power iteration over the rounded covariance matrix
    (shared by ``pca_power`` and every ``pca_topk`` component — ONE
    copy of the matvec loop, so fixes can't land in only one). Starts
    from all-ones (the unrolled-oracle convention). With ``restart``,
    a zero FIRST matvec — the all-ones start sitting in C's null space
    even though real principal directions exist, e.g. probability-
    simplex embeddings where every coordinate sum is constant so
    C·1 = 0 (ADVICE r8) — retries ONCE from the basis vector of the
    highest-variance dimension (first index on ties, matching the
    oracle's list_position tie-break; its matvec is column argmax-diag
    of C, nonzero whenever the data is non-constant). C symmetric PSD
    ⇒ a zero matvec is only reachable on the first step, so the
    restart is a start-vector CASE the SQL oracle mirrors in its t0
    CTE. ``restart`` must be False for DEFLATED components: there a
    zero matvec means the rank is exhausted, and restarting onto
    rounding residue would fabricate a component instead of failing
    loudly. Raises ``ValueError(context)`` when every start dies."""
    starts = [[1.0] * d]
    if restart:
        diag_max = max(range(d), key=lambda i: c[i][i])
        if c[diag_max][diag_max] > 0.0:
            e = [0.0] * d
            e[diag_max] = 1.0
            starts.append(e)
    for v in starts:
        failed = False
        for _ in range(max(1, iters)):
            w = []
            for i in range(d):
                s = 0.0
                for j in range(d):  # sequential fold == list_sum order
                    s += c[i][j] * v[j]
                w.append(s)
            n2 = 0.0
            for x in w:
                n2 += x * x
            lam = n2**0.5
            if lam == 0.0:
                failed = True
                break
            v = [x / lam for x in w]
        if not failed:
            return v, lam
    raise ValueError(context)


def pca_power(
    df: DataFrame,
    vec_col: str,
    *,
    iters: int = 8,
    decimals: int = 6,
    means: dict[int, float] | None = None,
) -> DataFrame:
    """Top principal component by POWER ITERATION →
    ``(dim, loading, eigenvalue, explained_share)`` — the direction
    that dominates the embedding cloud's variance: the anisotropy
    diagnosis behind "all my cosines are 0.9" (one rogue dimension or
    a common-mean artifact), and the first step of PCA whitening /
    ABTT-style post-processing.

    Deterministic and engine-replayable end to end: the covariance
    entries are ROUNDED before iteration (both engines then iterate on
    bit-identical matrices), the start vector is all-ones, and each of
    the ``iters`` matvec+normalize steps uses plain sequential
    double-precision folds — the DuckDB oracle unrolls the SAME
    iterations over list expressions, so even the eigenvector's sign
    matches. Loadings/eigenvalue/share are rounded on output.

    100 TB shape: all corpus work is ``covariance_matrix`` (one
    posexplode + map-side-combined aggregate, d²-bounded exchange);
    the d²-entry matrix is a bounded driver collect (the
    codebook/literals pattern) and the iteration itself is driver
    arithmetic on d doubles — nothing iterative ever touches the
    cluster, unlike a naive per-step distributed matvec which would
    pay ``iters`` corpus scans. ``means`` passes pre-collected rounded
    dim means through to ``covariance_matrix``."""
    cov = {
        int(r["pos"]): float(r["cov"])
        for r in covariance_matrix(
            df, vec_col, decimals=decimals, means=means
        ).collect()
    }
    spark = df.sparkSession
    schema = "dim int, loading double, eigenvalue double, explained_share double"
    if not cov:
        return spark.createDataFrame([], schema)
    d = int(round(len(cov) ** 0.5))
    c = [[cov[i * d + j] for j in range(d)] for i in range(d)]
    v, lam = _power_iterate(
        c,
        d,
        iters,
        restart=True,
        context=(
            "pca_power: zero covariance matvec from every deterministic "
            "start (all-ones AND the max-variance basis vector) — the "
            "vector column is constant; no principal component exists"
        ),
    )
    trace = 0.0
    for i in range(d):
        trace += c[i][i]
    share = round(lam / trace, decimals) if trace > 0 else None
    lam_r = round(lam, decimals)
    rows = [(i, round(v[i], decimals), lam_r, share) for i in range(d)]
    return spark.createDataFrame(rows, schema)


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    corpus_id: str = "vec_id",
    bench_id: str = "vec_id",
    corpus_vec: str = "embedding",
    bench_vec: str = "embedding",
    threshold: float = 0.95,
    decimals: int = 6,
    broadcast_limit: int | None = 2_000_000,
) -> DataFrame:
    """EMBEDDING-SPACE eval decontamination: which corpus vectors sit
    within ``threshold`` cosine of ANY benchmark vector →
    ``(corpus_id, n_matches, max_cosine)``. The semantic sibling of the
    verbatim n-gram and MinHash text checks — a paraphrased benchmark
    item shares no 13-gram and little Jaccard, but its embedding stays
    close. Exact scoring (no LSH recall loss — a decontamination gate
    must not miss): the benchmark side is broadcast behind the usual
    loud ``broadcast_limit`` count probe (eval suites are small; a
    billion-row "benchmark" should fail at plan build, not OOM), each
    corpus partition scores all benchmark vectors locally, and the
    threshold filter runs BEFORE the per-id aggregate, so the one
    exchange carries only flagged (id, cos) pairs. Cosines are rounded
    before the compare — round-before-rank, engines agree on the flag
    set. Drop flagged ids with one broadcast anti-join (the audit
    columns say why each id left). ``broadcast_limit=None`` skips the
    guard's count probe — plan-review (``--explain``) callers only.

    Each side is UNIT-NORMALIZED once before the join (the norm is
    LET-BOUND so it evaluates once per row, not once per of the d
    lambda elements), so the per-pair work inside the N×M loop is one
    dot product — not dot plus two norms recomputed per pair (≈3×
    fewer flops where all the time goes). Zero-norm vectors carry no
    direction and cannot be flagged (NULL normalized → filtered), the
    same outcome ``cosine``'s NULL-on-zero-norm gave."""
    if broadcast_limit is not None:
        _guard_broadcast_side(
            bench, bench_id, broadcast_limit, "semantic_contamination"
        )

    def _unit(vec_col: str) -> Column:
        v = F.col(vec_col).cast("array<double>")
        return F.flatten(
            F.transform(
                F.array(l2_norm(v)),  # let-bind: one norm per row
                lambda n: F.when(n > 0, F.transform(v, lambda x: x / n)),
            )
        )

    b = (
        bench.filter(F.col(bench_vec).isNotNull())
        .select(
            F.col(bench_id).alias("__bid"), _unit(bench_vec).alias("__bv")
        )
        .filter(F.col("__bv").isNotNull())
    )
    c = (
        corpus.filter(F.col(corpus_vec).isNotNull())
        .select(F.col(corpus_id), _unit(corpus_vec).alias("__cv"))
        .filter(F.col("__cv").isNotNull())
    )
    cos = F.round(dot(F.col("__cv"), F.col("__bv")), decimals)
    return (
        c.join(F.broadcast(b))
        .select(F.col(corpus_id), cos.alias("__cos"))
        .filter(F.col("__cos") >= threshold)
        .groupBy(corpus_id)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max("__cos").alias("max_cosine"),
        )
    )


def remove_top_component(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    iters: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """All-But-The-Top embedding post-processing (Mu & Viswanath 2018)
    → ``(id, adjusted array<double>)``: subtract the mean, then project
    out the top principal component — ``x' = c - (c·v₁)v₁`` with
    ``c = x - μ``. The standard fix for anisotropic embedding clouds
    (a dominant common direction inflates every cosine); run
    ``pca_power`` first to SEE the anisotropy, this to remove it.

    Deterministic parity: μ and v₁ are the ROUNDED ``dim_stats`` /
    ``pca_power`` outputs inlined as literals, the per-row dot is a
    sequential fold, outputs rounded — the DuckDB oracle replays every
    step. The centered array and the dot product are each LET-BOUND
    (1-element ``transform`` arrays), so neither recomputes per output
    element (the CollapseProject re-inlining trap).

    100 TB shape: the stats/eigen work is ``pca_power`` (d²-bounded
    exchange + driver arithmetic); the projection itself is ONE
    zero-shuffle in-row expression over the corpus — no explode, no
    regroup, no join. The dim means are collected ONCE here and passed
    through to the covariance step, so the whole pipeline is two corpus
    aggregates (means, covariance) + one projection."""
    mu = {
        int(r["dim"]): float(r["mean"])
        for r in dim_stats(df, vec_col, decimals=decimals).collect()
    }
    comp = pca_power(
        df, vec_col, iters=iters, decimals=decimals, means=mu
    ).collect()
    if not comp:
        return df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("adjusted"),
        ).limit(0)
    v = {int(r["dim"]): float(r["loading"]) for r in comp}
    adjusted = abtt_expr(F.col(vec_col), mu, v, decimals=decimals)
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), adjusted.alias("adjusted")
    )


def abtt_expr(
    vec: Column,
    means: dict[int, float],
    loadings: dict[int, float],
    *,
    decimals: int = 6,
) -> Column:
    """The zero-shuffle ABTT projection ``c - (c·v₁)v₁`` with the
    rounded mean/component literals inlined — the in-row half of
    ``remove_top_component``, exposed for the declarative
    ``vector_transform`` stage. The centered array and the dot product
    are each LET-BOUND (1-element ``transform`` arrays), so neither
    recomputes per output element."""
    d = max(loadings) + 1
    v_lit = lit_double_array([loadings[i] for i in range(d)])
    mu_lit = lit_double_array([means[i] for i in range(d)])
    cent = F.zip_with(vec.cast("array<double>"), mu_lit, lambda x, m: x - m)
    return F.flatten(
        F.transform(
            F.array(cent),  # let-bind c: centered array evaluates once
            lambda c: F.flatten(
                F.transform(
                    # let-bind the dot product the same way
                    F.array(
                        F.aggregate(
                            F.zip_with(c, v_lit, lambda ci, vi: ci * vi),
                            F.lit(0.0),
                            lambda acc, t: acc + t,
                        )
                    ),
                    lambda dt: F.zip_with(
                        c, v_lit, lambda ci, vi: F.round(ci - dt * vi, decimals)
                    ),
                )
            ),
        )
    )


def pca_topk(
    df: DataFrame,
    vec_col: str,
    *,
    k: int = 2,
    iters: int = 8,
    decimals: int = 6,
    means: dict[int, float] | None = None,
) -> DataFrame:
    """Top-k principal components by power iteration WITH DEFLATION →
    ``(component, dim, loading, eigenvalue, explained_share)`` — the
    k-component generalization of ``pca_power`` (subspace analysis,
    ABTT with k>1, 2-D embedding-cloud visualization): after each
    converged component the matrix is deflated, ``C ← C − λ·v vᵀ``,
    and the iteration restarts from all-ones.

    Deflation happens ON THE ROUNDED GRID: λ and v are rounded to
    ``decimals`` first and every deflated entry re-rounded, so each
    component's input matrix is bit-identical across engines and the
    DuckDB oracle replays the whole chain (iterate → round → deflate →
    iterate) exactly — the same contract that makes the single
    component and the Lloyd trainer value-checkable. Rounded deflation
    costs exact orthogonality in the last decimal — documented, not a
    bug. ``explained_share`` is each λ over the ORIGINAL trace.

    100 TB shape: identical to ``pca_power`` — the corpus pays one
    covariance aggregate; all k·iters matvecs are driver arithmetic on
    d² doubles."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cov = {
        int(r["pos"]): float(r["cov"])
        for r in covariance_matrix(
            df, vec_col, decimals=decimals, means=means
        ).collect()
    }
    spark = df.sparkSession
    schema = (
        "component int, dim int, loading double, eigenvalue double, "
        "explained_share double"
    )
    if not cov:
        return spark.createDataFrame([], schema)
    d = int(round(len(cov) ** 0.5))
    if k > d:
        raise ValueError(f"k={k} exceeds the vector dimension {d}")
    c = [[cov[i * d + j] for j in range(d)] for i in range(d)]
    trace = 0.0
    for i in range(d):
        trace += c[i][i]
    rows = []
    for comp in range(1, k + 1):
        # restart only for component 1 (shared contract with
        # pca_power); on a deflated matrix a zero matvec means the
        # rank is exhausted — see _power_iterate
        v, lam = _power_iterate(
            c,
            d,
            iters,
            restart=(comp == 1),
            context=(
                f"pca_topk: zero covariance norm at component {comp} "
                "— fewer than k independent directions exist"
            ),
        )
        lam_r = round(lam, decimals)
        v_r = [round(x, decimals) for x in v]
        share = round(lam_r / trace, decimals) if trace > 0 else None
        rows += [
            (comp, i, v_r[i], lam_r, share) for i in range(d)
        ]
        # deflate ON THE ROUNDED GRID so the SQL replay stays exact
        c = [
            [
                round(c[i][j] - lam_r * v_r[i] * v_r[j], decimals)
                for j in range(d)
            ]
            for i in range(d)
        ]
    return spark.createDataFrame(rows, schema)
