"""[EXT] Mergeable aggregate state (SURVEY.md §2.11): build / merge /
finalize partial aggregates so a continuously-ingesting pipeline can
maintain per-key statistics WITHOUT rescanning history — the batch
analogue of a streaming state store, and the algebraic foundation of
every map-side combine.

The state for each value column is the classic commutative monoid
(count, sum, sum-of-squares, min, max): any two states merge with
sums/min/max, so daily increments fold into the running state in one
key-partitioned shuffle over STATE rows (keys × columns), never over
the raw history. At 100 TB this is the difference between an O(day)
and an O(lifetime) nightly job.

Precision note: variance finalized from (Σx², Σx, n) loses ~half the
mantissa to cancellation when stddev ≪ mean; fine for monitoring-grade
stats (the unit test pins a 1e-6 relative tolerance), but exact-gated
comparisons should stick to the exactly-mergeable count/sum/avg/min/max
(what the driver query exposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import lit_long_array

_SUFFIXES = ("cnt", "sum", "ssq", "min", "max")


def _state_cols(value_cols: list[str]) -> list[str]:
    return [f"{c}__{s}" for c in value_cols for s in _SUFFIXES]


def build_agg_state(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """One state row per key tuple: for each value column, its
    (count, sum, sum-of-squares, min, max) over non-null values."""
    if not keys or not value_cols:
        raise ValueError("keys and value_cols must be non-empty")
    aggs = []
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"{c}__cnt"),
            F.sum(v).alias(f"{c}__sum"),
            F.sum(v * v).alias(f"{c}__ssq"),
            F.min(v).alias(f"{c}__min"),
            F.max(v).alias(f"{c}__max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    states: list[DataFrame], keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Fold any number of state frames into one: union → one key-
    partitioned aggregate (sums for cnt/sum/ssq, min/max for bounds).
    Keys present in only some states merge correctly — absent rows
    simply contribute nothing."""
    if not states:
        raise ValueError("states must be non-empty")
    cols = keys + _state_cols(value_cols)
    missing = [c for s in states for c in cols if c not in s.columns]
    if missing:
        raise ValueError(f"state frames missing columns: {sorted(set(missing))}")
    u = states[0].select(cols)
    for s in states[1:]:
        u = u.unionByName(s.select(cols))
    aggs = []
    for c in value_cols:
        aggs += [
            F.sum(f"{c}__cnt").alias(f"{c}__cnt"),
            F.sum(f"{c}__sum").alias(f"{c}__sum"),
            F.sum(f"{c}__ssq").alias(f"{c}__ssq"),
            F.min(f"{c}__min").alias(f"{c}__min"),
            F.max(f"{c}__max").alias(f"{c}__max"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def finalize_agg_state(
    state: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """State → human statistics: n, total, avg, min, max (+ var_samp /
    stddev_samp derived from the sum-of-squares — see the module
    precision note)."""
    out = [F.col(k) for k in keys]
    for c in value_cols:
        n, s, q = F.col(f"{c}__cnt"), F.col(f"{c}__sum"), F.col(f"{c}__ssq")
        # clamp at 0: cancellation in (q - s²/n) can go slightly negative
        # for (near-)constant groups, which would finalize as a negative
        # variance and a NaN stddev
        var = F.when(n > 1, F.greatest(q - s * s / n, F.lit(0.0)) / (n - 1))
        out += [
            n.alias(f"{c}_n"),
            s.alias(f"{c}_total"),
            F.when(n > 0, s / n).alias(f"{c}_avg"),
            F.col(f"{c}__min").alias(f"{c}_min"),
            F.col(f"{c}__max").alias(f"{c}_max"),
            var.alias(f"{c}_var"),
            F.sqrt(var).alias(f"{c}_stddev"),
        ]
    return state.select(*out)


def build_hll_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HyperLogLog sketch state (Apache DataSketches via Spark's
    ``hll_sketch_agg``) — the DISTINCT-COUNT member of the mergeable-
    state family: the monoid states above handle count/sum/min/max, but
    count-distinct is not algebraic over raw counts; the HLL sketch is
    its mergeable form (union = merge), with ~1.6%/sqrt(2^(lg_k-12))
    standard error at fixed O(2^lg_k) bytes per key. Returns one row
    per key with a ``binary`` sketch column — persist it (parquet) and
    each day's increment folds in WITHOUT rescanning history, exactly
    like ``merge_agg_states``."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias("hll_state")
    )


def merge_hll_states(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    *,
    allow_different_lg_k: bool = True,
) -> DataFrame:
    """Fold two HLL state tables (full outer on keys; a key missing on
    one side keeps the other's sketch). Sketch union is associative and
    commutative, so daily states fold in any order to the identical
    estimate the full-history sketch would give — the property the unit
    test pins.

    lg_k contract: Spark's ``hll_union`` default refuses sketches built
    with different ``lg_k`` — a cryptic runtime error deep in the merge
    job if one day's state was built with a different precision. The
    default here flips that to ``allowDifferentLgConfigK=true``, where
    DataSketches soundly downgrades to the SMALLER lg_k (a wider error
    bar, never a wrong merge). Pass ``allow_different_lg_k=False`` to
    make a precision drift fail loudly instead — then persist ``lg_k``
    beside the state table and assert it before folding."""
    au = a.select(*keys, F.col("hll_state").alias("__ha"))
    bu = b.select(*keys, F.col("hll_state").alias("__hb"))
    both = au.join(bu, keys, "full_outer")
    merged = F.when(
        F.col("__ha").isNull(), F.col("__hb")
    ).when(
        F.col("__hb").isNull(), F.col("__ha")
    ).otherwise(
        F.hll_union(
            F.col("__ha"), F.col("__hb"), bool(allow_different_lg_k)
        )
    )
    return both.select(*keys, merged.alias("hll_state"))


def finalize_hll_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """→ (keys..., approx_distinct) from a sketch state table."""
    return state.select(
        *keys,
        F.hll_sketch_estimate(F.col("hll_state")).alias("approx_distinct"),
    )


def build_hist_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 128,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key equi-width HISTOGRAM state — the QUANTILE member of the
    mergeable-state family (count/sum monoid = exact moments, HLL =
    distinct counts, histogram = order statistics): one row per key
    with a fixed ``n_buckets``-long bucket-count array over the
    caller-declared ``[lo, hi)`` range, plus n/min/max. Two states with
    the SAME layout merge by element-wise bucket sum — EXACTLY, unlike
    HLL's bounded-error union — so daily increments fold into a running
    state and any quantile finalizes from it with error bounded by one
    bucket width, never a rescan of history. Values outside [lo, hi)
    clamp into the edge buckets (the state's min/max record the true
    extent, so a drifting distribution is visible before it silently
    piles into an edge bucket). NULL values contribute nothing.

    The layout (lo, hi, n_buckets) travels IN the state table
    (``__lo``/``__hi``/``__nb`` columns) and ``merge_hist_states``
    validates it — folding a day built with a different layout fails
    loudly at merge time, the contract ADVICE r6 asked of the HLL twin.

    WEIGHTED order statistics: ``weight_col`` (nonneg INTEGER weights —
    cast to long; integerize fractional weights to micro-units first,
    the exactness rule everywhere in this repo) makes every bucket
    count the weight SUM instead of the row count, so the finalized
    quantiles are weighted quantiles (a weight-3 row ≡ the row three
    times — the equivalence the unit test pins) and the fold stays
    EXACT (integer sums). NULL weights contribute nothing, like NULL
    values.

    100 TB shape: one map-side-combined aggregate per build (the
    (keys × occupied-buckets) partial rows are the only shuffle), state
    tables are keys-sized; nothing driver-side."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    v = F.col(value_col).cast("double")
    w = (float(hi) - float(lo)) / int(n_buckets)
    idx = F.least(
        F.greatest(F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("int"), F.lit(0)),
        F.lit(int(n_buckets) - 1),
    )
    wexpr = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    filtered = df.where(v.isNotNull())
    if weight_col is not None:
        filtered = filtered.where(F.col(weight_col).isNotNull())
    per_bucket = (
        filtered
        .groupBy(*keys, idx.alias("__b"))
        .agg(
            F.sum(wexpr).alias("__c"),
            F.min(v).alias("__mn"),
            F.max(v).alias("__mx"),
        )
    )
    agged = per_bucket.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__c"))).alias("__m"),
        F.sum("__c").alias("n"),
        F.min("__mn").alias("vmin"),
        F.max("__mx").alias("vmax"),
    )
    return agged.select(
        *keys,
        F.transform(
            F.sequence(F.lit(0), F.lit(int(n_buckets) - 1)),
            lambda i: F.coalesce(
                F.element_at("__m", i), F.lit(0).cast("long")
            ),
        ).alias("hist"),
        "n",
        "vmin",
        "vmax",
        F.lit(float(lo)).alias("__lo"),
        F.lit(float(hi)).alias("__hi"),
        F.lit(int(n_buckets)).alias("__nb"),
    )


def merge_hist_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of histogram state tables: element-wise bucket
    sums per key (EXACT — fold order can never change the result),
    min/max of extents. Layout drift (different lo/hi/n_buckets) fails
    loudly with a bounded probe over the state rows — state tables are
    keys-sized, so the probe is trivially cheap."""
    if not states:
        raise ValueError("states must be non-empty")
    cols = [*keys, "hist", "n", "vmin", "vmax", "__lo", "__hi", "__nb"]
    u = states[0].select(cols)
    for s in states[1:]:
        u = u.unionByName(s.select(cols))
    layouts = u.select("__lo", "__hi", "__nb").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"merge_hist_states: incompatible layouts {sorted(map(tuple, layouts))} "
            "— states must share (lo, hi, n_buckets) to merge"
        )
    # ONE groupBy folds hist AND stats: a second frame joined back on
    # the keys would drop NULL-key groups (null-unsafe equi join —
    # review finding r7), breaking fold == full-history exactly where a
    # full build keeps the NULL group. The element-wise sum runs over
    # the key's collected arrays (one per folded state — days, not
    # rows), seeded with the first array so the type/length need no
    # synthetic zero vector.
    agged = u.groupBy(*keys).agg(
        F.collect_list("hist").alias("__hs"),
        F.sum("n").alias("n"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
        F.first("__nb").alias("__nb"),
    )
    folded = F.aggregate(
        F.slice(F.col("__hs"), 2, F.size("__hs") - 1),
        F.element_at("__hs", 1),
        lambda acc, h: F.zip_with(acc, h, lambda a, b: a + b),
    )
    return agged.select(
        *keys, folded.alias("hist"), "n", "vmin", "vmax",
        "__lo", "__hi", "__nb",
    )


# Signed-long single-bit masks (index 63 is the sign bit). Kept as a
# Python literal so BOTH the build aggregate and the probe expression
# reference one broadcastable 64-element array literal instead of a
# column-shift (PySpark's shiftleft only takes an int shift amount).
_BLOOM_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
_BLOOM_STATE_COLS = ["word_idx", "word", "__m", "__k", "__seed", "__h"]
_BLOOM_MAX_M = 1 << 22  # 4 Mi bits = 64 Ki words: the driver-probe cap


def _bloom_positions(key, m_bits: int, k: int, seed: str, hash_family: str):
    """array<int> of the k bit positions for a key: Kirsch–Mitzenmacher
    double hashing g_i = (h1 + i·h2) mod m, h2 forced odd so it is
    coprime with the power-of-two m and the probe sequence cycles the
    whole table. Two hash families:

    ``portable`` — two INDEPENDENT 60-bit md5 halves (hex chars 1-15
    and 17-31, the repo's ``functions.md5_hash60`` construction).
    DuckDB computes identical md5 bytes, so an oracle replays every
    bit position exactly (no bounded-error envelope needed, unlike the
    HLL member of this family). Everything stays in exact integer
    range: both halves are < 2^60 before the mod, i·h2 < 16·m ≤ 2^26
    after it.

    ``fast`` — two seeded ``xxhash64`` draws (native JVM, no string
    md5 + hex parse per key): ~5× cheaper per probe, for
    ENGINE-INTERNAL filters whose RESULT is verified independently
    (e.g. the n-gram Bloom prescreen, where false positives die in the
    exact join downstream) — nothing external ever replays these bit
    positions, so portability would buy nothing."""
    if hash_family == "fast":
        salted = F.concat(key.cast("string"), F.lit(":" + seed))
        h1 = F.pmod(F.xxhash64(salted), F.lit(int(m_bits)))
        h2 = F.pmod(F.xxhash64(salted, F.lit(1)), F.lit(int(m_bits))).bitwiseOR(
            F.lit(1)
        )
    else:
        hx = F.md5(F.concat(key.cast("string"), F.lit(":" + seed)))
        h1 = (
            F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
            % F.lit(int(m_bits))
        )
        h2 = (
            F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
            % F.lit(int(m_bits))
        ).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(k) - 1)),
        lambda i: ((h1 + i.cast("long") * h2) % F.lit(int(m_bits))).cast("int"),
    )


def _bloom_validate(m_bits: int, k: int, hash_family: str = "portable") -> None:
    if m_bits < 64 or m_bits > _BLOOM_MAX_M or (m_bits & (m_bits - 1)) != 0:
        raise ValueError(
            f"m_bits must be a power of two in [64, {_BLOOM_MAX_M}], got {m_bits}"
        )
    if not (1 <= k <= 16):
        raise ValueError(f"k must be in [1, 16], got {k}")
    if hash_family not in ("portable", "fast"):
        raise ValueError(
            f"hash_family must be portable|fast, got {hash_family!r}"
        )


def build_bloom_state(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: str = "bloom",
    hash_family: str = "portable",
) -> DataFrame:
    """Bloom-filter MEMBERSHIP state — the set-membership member of the
    mergeable-state family (monoid = moments, HLL = distinct counts,
    histogram = order statistics, Bloom = "have we ingested this key
    before?"). One row per OCCUPIED 64-bit word: (word_idx, word),
    plus the layout columns (__m, __k, __seed) that make a layout-drift
    fold fail loudly, the contract shared with ``build_hist_state``.

    Two states with the same layout merge by word-wise bitwise OR —
    EXACTLY (set union), so daily ingest increments fold into a running
    index and tomorrow's batch probes it WITHOUT joining against the
    raw history. The guarantee is one-sided: a probe miss is a DEFINITE
    first-sighting (no false negatives, ever), a hit is "maybe seen"
    with false-positive rate ≈ (1 − e^(−k·n/m))^k. At 100 TB that
    asymmetry is the point: the index for a billion keys at m=2^22 is
    64 Ki longs (512 KiB broadcast), and the definite-new rows — the
    overwhelming majority in a dedup ingest — skip the expensive exact
    path entirely; only the maybe-seen sliver needs a real
    anti-join/verify against history.

    NULL keys contribute nothing (NULL membership is meaningless).
    Shuffle shape: the explode carries k·rows (key, bit) INTEGERS —
    never payloads — into one map-side-combined bit_or aggregate over
    at most m/64 groups. ``hash_family`` picks the bit-position hash
    (see ``_bloom_positions``): ``portable`` (md5, oracle-replayable —
    the default) or ``fast`` (xxhash64, engine-internal filters); it
    travels in the state like the other layout fields."""
    _bloom_validate(m_bits, k, hash_family)
    pos = _bloom_positions(F.col(key_col), m_bits, k, seed, hash_family)
    bits = (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(pos).alias("__bit"))
    )
    state = bits.groupBy(
        F.shiftright(F.col("__bit"), 6).alias("word_idx")
    ).agg(
        F.bit_or(
            F.element_at(
                lit_long_array(_BLOOM_MASKS),
                F.col("__bit").bitwiseAND(F.lit(63)) + 1,
            )
        ).alias("word")
    )
    return state.select(
        "word_idx",
        "word",
        F.lit(int(m_bits)).alias("__m"),
        F.lit(int(k)).alias("__k"),
        F.lit(seed).alias("__seed"),
        F.lit(hash_family).alias("__h"),
    )


def merge_bloom_states(states: list[DataFrame]) -> DataFrame:
    """Fold any number of Bloom state tables: word-wise bitwise OR per
    word_idx — exact set union, so fold order can never change the
    result and fold == full-history-build IDENTICALLY (the equality the
    unit test and the registry query pin). Layout drift (different
    m/k/seed — which would OR bits from incompatible hash spaces into a
    silently-wrong filter) fails loudly with a bounded probe over the
    word-sized state rows."""
    if not states:
        raise ValueError("states must be non-empty")
    u = states[0].select(_BLOOM_STATE_COLS)
    for s in states[1:]:
        u = u.unionByName(s.select(_BLOOM_STATE_COLS))
    layouts = (
        u.select("__m", "__k", "__seed", "__h").distinct().limit(2).collect()
    )
    if len(layouts) > 1:
        raise ValueError(
            f"merge_bloom_states: incompatible layouts {sorted(map(tuple, layouts))} "
            "— states must share (m_bits, k, seed, hash_family) to merge"
        )
    return u.groupBy("word_idx").agg(
        F.bit_or("word").alias("word"),
        F.first("__m").alias("__m"),
        F.first("__k").alias("__k"),
        F.first("__seed").alias("__seed"),
        F.first("__h").alias("__h"),
    )


def probe_bloom(
    df: DataFrame,
    key_col: str,
    state: DataFrame,
    *,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Probe every row's key against a Bloom state: adds a boolean
    ``out_col`` — False = DEFINITELY never inserted (the load-bearing
    guarantee), True = maybe seen. The state is collected ONCE into a
    dense m/64-long word array (a bounded driver probe — ≤ 64 Ki longs
    at the m cap, the codebook pattern) and embedded as a literal, so
    the probe is a pure zero-shuffle, zero-join projection: k
    element_at + bitwise-AND tests per row, entirely inside
    whole-stage codegen. NULL keys probe NULL (unknown, not False —
    False would falsely certify them as first sightings)."""
    meta = (
        state.select("__m", "__k", "__seed", "__h").distinct().limit(2).collect()
    )
    if len(meta) > 1:
        raise ValueError(
            f"probe_bloom: state has mixed layouts {sorted(map(tuple, meta))}"
        )
    if not meta:  # empty state: nothing ever inserted
        return df.withColumn(
            out_col,
            F.when(F.col(key_col).isNotNull(), F.lit(False)),
        )
    m_bits, k, seed, hash_family = (
        int(meta[0][0]), int(meta[0][1]), str(meta[0][2]), str(meta[0][3])
    )
    _bloom_validate(m_bits, k, hash_family)
    words = [0] * (m_bits // 64)
    # OR-fold, not assign: a same-layout state may legitimately carry
    # duplicate word_idx rows (raw appended increments probed without a
    # merge_bloom_states fold) — dropping earlier increments' bits
    # would FABRICATE false negatives, the one verdict this operator
    # must never emit.  The fold happens distributed (bit_or BEFORE the
    # collect), so the driver probe is bounded at m/64 rows — ≤ 64 Ki
    # longs at the m cap — regardless of how long the unmerged
    # increment history is.
    folded = (
        state.groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
    for r in folded.collect():
        words[int(r[0])] |= int(r[1])
    # ONE-parse literals (functions.lit_long_array): F.lit on the
    # 4096-long word list was 1.6-2.3 s of driver time per probe
    arr = lit_long_array(words)
    masks = lit_long_array(_BLOOM_MASKS)
    pos = _bloom_positions(F.col(key_col), m_bits, k, seed, hash_family)
    hit = F.forall(
        pos,
        lambda b: F.element_at(arr, F.shiftright(b, 6) + 1).bitwiseAND(
            F.element_at(masks, b.bitwiseAND(F.lit(63)) + 1)
        )
        != 0,
    )
    return df.withColumn(
        out_col, F.when(F.col(key_col).isNotNull(), hit)
    )


_KMV_STATE_COLS = ["__hv", "__k", "__seed"]


def _kmv_hash(value) -> "F.Column":
    """Portable 60-bit md5 hash of a value — ``functions.md5_hash60``
    itself (not a re-implementation: the KMV oracle replay contract is
    pinned to that one construction, and a copy could drift from it)."""
    from ..functions import md5_hash60

    return md5_hash60(value.cast("string"))


def build_kmv_state(
    df: DataFrame,
    keys: "list[str]",
    value_col: str,
    *,
    k: int = 64,
    seed: str = "kmv",
) -> DataFrame:
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) — the
    EXACT-REPLAY member of the mergeable-state family's distinct-count
    corner: per key group, the ``k`` SMALLEST distinct portable-md5
    hash values of ``value_col``. Unlike the HLL twin (DataSketches
    bytes a SQL oracle can only bound), every hash here is a plain
    md5-derived integer, so fold, estimate, and tie-breaks replay
    EXACTLY on any engine — the differential-testing-friendly sketch.

    Same-layout states merge by re-taking the bottom-k of the union —
    exactly (the k smallest of a union are each within their side's k
    smallest), so fold == full-history-build verbatim, the family's
    pinned property. ``finalize_kmv`` turns the state into a distinct
    estimate: exact when the group kept fewer than k hashes (it saw
    every distinct value), else the classic (k−1)/U(k) estimator with
    ~1/√k relative error. NULL values contribute nothing.

    Scale shape: one distinct-shuffle on (keys, hash) — integers only,
    never the values — then a WindowGroupLimit bottom-k per key
    (constant k ⇒ map-side partial top-k); state size is ≤ k rows per
    key forever, the O(day) nightly-fold contract."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    h = _kmv_hash(F.concat(F.col(value_col).cast("string"), F.lit(":" + seed)))
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, h.alias("__hv"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__hv").asc())
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
        .withColumn("__k", F.lit(int(k)))
        .withColumn("__seed", F.lit(seed))
    )


def merge_kmv_states(states: "list[DataFrame]", keys: "list[str]") -> DataFrame:
    """Fold any number of KMV states: distinct-union the hash sets and
    re-take the bottom-k per key — exact (fold == full-history-build
    verbatim). Layout drift (different k/seed — incompatible hash
    spaces or truncation depths) fails loudly with a bounded probe."""
    if not states:
        raise ValueError("states must be non-empty")
    cols = list(keys) + _KMV_STATE_COLS
    u = states[0].select(cols)
    for s in states[1:]:
        u = u.unionByName(s.select(cols))
    layouts = u.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"merge_kmv_states: incompatible layouts {sorted(map(tuple, layouts))} "
            "— states must share (k, seed) to merge"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("__hv").asc())
    # the validated single k as a LITERAL bound (not F.col("__k")): a
    # constant rank filter compiles to WindowGroupLimit's map-side
    # partial top-k, the shape the build path gets — a column-valued
    # bound would force the full window sort per key
    k = int(layouts[0][0]) if layouts else 0
    return (
        u.select(*keys, "__hv", "__k", "__seed")
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(k))
        .drop("__rn")
    )


def finalize_kmv(state: DataFrame, keys: "list[str]") -> DataFrame:
    """State → per-key distinct estimate: ``n_kept`` hashes and
    ``approx_distinct`` — EXACT (= n_kept) while the group kept fewer
    than k hashes, else round((k−1) / (U(k)/2^60)) with U(k) the
    largest kept hash. Deterministic integer/double arithmetic on the
    portable hashes, so a SQL oracle replays the estimate exactly —
    no error envelope needed, unlike the HLL twin.

    Layout drift fails loudly here too (same bounded probe as
    ``merge_kmv_states``): finalizing a raw union of mixed-(k, seed)
    states would otherwise silently pick an arbitrary ``__k`` via
    ``first`` and emit a wrong estimate instead of the family's
    contractual loud failure."""
    layouts = state.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"finalize_kmv: incompatible layouts {sorted(map(tuple, layouts))} "
            "— states must share (k, seed); mixed states cannot be folded "
            "or finalized"
        )
    g = state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("__hv").alias("__hk"),
        F.first("__k").alias("__kk"),
    )
    u_k = F.col("__hk").cast("double") / F.lit(float(1 << 60))
    est = F.when(
        F.col("n_kept") < F.col("__kk"), F.col("n_kept").cast("double")
    ).otherwise(F.round((F.col("__kk") - 1) / u_k, 0))
    return g.select(
        *keys, "n_kept", est.cast("long").alias("approx_distinct")
    )


_SAMPLE_STATE_COLS = ["__hv", "__k", "__seed"]


def build_sample_state(
    df: DataFrame,
    keys: "list[str]",
    id_col: str,
    *,
    k: int = 64,
    seed: str = "smp",
    carry: "list[str] | None" = None,
) -> DataFrame:
    """Mergeable DETERMINISTIC RESERVOIR — a bottom-k-by-hash uniform
    sample of ids per key group, the sampling sibling of the KMV
    sketch (same bottom-k machinery, but the ID travels with its hash
    instead of being discarded): maintain a fixed-size uniform
    without-replacement sample (a per-language eval set, a review
    queue, a drift probe panel) across ingest increments WITHOUT ever
    rescanning history. Classic RNG reservoirs (Vitter's R) are
    neither mergeable nor replayable; hash-order sampling is both —
    the k smallest portable-md5 hashes of the DISTINCT ids, so fold ==
    full-history-build row-for-row and a SQL oracle replays every pick.

    Properties that make it the eval-set maintainer:
    * MERGEABLE exactly: bottom-k of the union (``merge_sample_states``).
    * PREFIX-CONSISTENT: the bottom-j (j ≤ k) of a state is itself the
      uniform j-sample — downstream consumers shrink the panel without
      resampling (``finalize_sample`` exposes ``sample_rank``).
    * STABLE: an id in the sample stays in it until genuinely crowded
      out by smaller hashes — no churn between runs on the same data.

    Ids-only by design (the scale-clean shape shared with the pair
    tables): payloads re-join by id at read time, so the state is
    ≤ k (hash, id) rows per key forever. NULL ids contribute nothing;
    duplicate (keys, id) rows collapse via DISTINCT before ranking.

    ``carry`` optionally keeps named payload columns in the state
    (e.g. a token count feeding ``finalize_weighted_sample``); each
    MUST be a pure function of the id — the distinct collapses on the
    full (keys, id, carry…) tuple, so an id re-landing with a drifted
    carry value would keep both rows and skew downstream estimators
    (the caller's data bug; the layout-drift probes cannot see it)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    carry = list(carry or [])
    h = _kmv_hash(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    hashed = (
        df.where(F.col(id_col).isNotNull())
        .select(*keys, F.col(id_col), *carry, h.alias("__hv"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__hv").asc(), F.col(id_col).asc()
    )
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .drop("__rn")
        .withColumn("__k", F.lit(int(k)))
        .withColumn("__seed", F.lit(seed))
    )


def merge_sample_states(
    states: "list[DataFrame]",
    keys: "list[str]",
    id_col: str,
    *,
    carry: "list[str] | None" = None,
) -> DataFrame:
    """Fold sample states: distinct-union the (id, hash) sets and
    re-take the bottom-k per key — exact (fold == full-history-build
    row-for-row, the KMV argument verbatim). Layout drift fails loudly
    with the bounded probe. ``carry`` names any payload columns the
    build carried (same function-of-the-id contract)."""
    if not states:
        raise ValueError("states must be non-empty")
    cols = list(keys) + [id_col] + list(carry or []) + _SAMPLE_STATE_COLS
    u = states[0].select(cols)
    for s in states[1:]:
        u = u.unionByName(s.select(cols))
    layouts = u.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"merge_sample_states: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col("__hv").asc(), F.col(id_col).asc()
    )
    k = int(layouts[0][0]) if layouts else 0
    return (
        u.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(k))
        .drop("__rn")
    )


def finalize_sample(
    state: DataFrame, keys: "list[str]", id_col: str
) -> DataFrame:
    """State → the sample panel: (keys…, ``sample_rank``, id). Rank 1
    is the smallest hash; taking ``sample_rank <= j`` yields the
    uniform j-sample (prefix consistency), so one persisted state
    serves every panel size up to k."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col("__hv").asc(), F.col(id_col).asc()
    )
    return state.select(
        *keys, F.row_number().over(w).alias("sample_rank"), id_col
    )


def finalize_weighted_sample(
    state: DataFrame,
    keys: "list[str]",
    id_col: str,
    weight_col: str,
) -> DataFrame:
    """Distinct-SUM estimation from a bottom-k sample state carrying a
    weight payload — the dedup-aware accounting question ("how many
    tokens across DISTINCT documents have we ingested, counting each
    doc once no matter how often it re-landed?") answered from ≤ k
    rows per key. The state is ``build_sample_state``'s output with
    ``weight_col`` carried through the build's select (the weight MUST
    be a pure function of the id — a doc's token count — or the
    estimate silently skews; re-ingests carrying a drifted weight are
    the caller's data bug, not a fold hazard, because the distinct
    collapses on (id, weight) rows).

    EXACT while the group kept fewer than k ids (it saw every distinct
    id: total = Σw verbatim); else the classic two-part estimator —
    distinct count D̂ = (k−1)/U(k) (the KMV estimator on the carried
    hashes) times the bottom-k's MEAN weight (the bottom-k is a
    uniform sample of the distinct ids, so its mean estimates the
    population mean; relative error ~1/√k on each factor).
    Deterministic double arithmetic on portable hashes, so a SQL
    oracle replays every estimate exactly.

    Returns (keys…, ``n_kept``, ``distinct_est``, ``weight_total_est``
    (double, 2 dp))."""
    g = state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("__hv").alias("__hk"),
        F.first("__k").alias("__kk"),
        F.sum(F.col(weight_col).cast("double")).alias("__wsum"),
    )
    layouts = state.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"finalize_weighted_sample: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    u_k = F.col("__hk").cast("double") / F.lit(float(1 << 60))
    exact = F.col("n_kept") < F.col("__kk")
    d_est = F.when(exact, F.col("n_kept").cast("double")).otherwise(
        F.round((F.col("__kk") - 1) / u_k, 0)
    )
    w_est = F.when(exact, F.col("__wsum")).otherwise(
        d_est * (F.col("__wsum") / F.col("n_kept"))
    )
    return g.select(
        *keys,
        "n_kept",
        d_est.cast("long").alias("distinct_est"),
        F.round(w_est, 2).alias("weight_total_est"),
    )


def finalize_sample_quantiles(
    state: DataFrame,
    keys: "list[str]",
    id_col: str,
    value_col: str,
    qs: "list[float]",
) -> DataFrame:
    """RANGE-FREE mergeable quantiles from a bottom-k sample state
    carrying a value payload — the quantile member the histogram state
    can't be when [lo, hi) isn't known up front: the bottom-k-by-hash
    rows are a uniform without-replacement sample of the distinct ids,
    so the sample's order statistics estimate the population's with
    the standard ~1/√k quantile error — no declared range, no bucket
    layout to drift. EXACT while the group kept fewer than k ids (the
    sample IS the distinct population). ``value_col`` must be a carried
    payload (a pure function of the id — the ``build_sample_state``
    carry contract).

    The estimate is the NEAREST-RANK definition (value at rank
    ⌈q·n⌉, ties broken by id) — deterministic integer arithmetic with
    no interpolation, so a SQL oracle replays every pick verbatim and
    the same state yields the same quantiles on any engine. Returns
    (keys…, ``n_kept``, ``q_<q>``…).

    Scale shape: one keys-partitioned window over ≤ k rows per key
    (the state, never the corpus) and one map-side-combined aggregate
    riding the same exchange."""
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    layouts = state.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"finalize_sample_quantiles: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    n_w = Window.partitionBy(*keys)
    r = state.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(n_w)
    )
    aggs = [F.max("__n").cast("long").alias("n_kept")]
    for q in qs:
        target = F.ceil(F.lit(float(q)) * F.col("__n")).cast("int")
        label = f"q_{str(q).replace('.', '_')}"
        aggs.append(
            F.min(F.when(F.col("__rn") == target, F.col(value_col))).alias(
                label
            )
        )
    return r.groupBy(*keys).agg(*aggs)


def finalize_weighted_quantiles(
    state: DataFrame,
    keys: "list[str]",
    id_col: str,
    value_col: str,
    weight_col: str,
    qs: "list[float]",
) -> DataFrame:
    """WEIGHTED nearest-rank quantiles from a bottom-k sample state
    carrying a value AND a weight payload — "half our TOKENS sit in
    docs longer than X", not "half our docs": the quantile of
    ``value_col`` under the distribution where each sampled id counts
    ``weight_col`` times. The sample is uniform over distinct ids, so
    its weighted order statistics estimate the population's (exact
    while the group kept fewer than k ids). Both payloads must be
    carried (pure functions of the id — the ``build_sample_state``
    contract); weights must be non-negative (a negative weight makes
    the running mass non-monotone and the pick meaningless — the
    caller's data bug, like a drifted carry).

    Estimate: the LOWER weighted quantile — the smallest value whose
    running weight (ordered by (value, id)) reaches q · total_weight.
    Deterministic given integer weights; the same state yields the
    same picks on any engine, so a SQL oracle replays every one.
    Returns (keys…, ``n_kept``, ``q_<q>``…).

    Scale shape: one keys-partitioned running-sum window over ≤ k
    rows per key (the state, never the corpus) and one map-side-
    combined aggregate riding the same exchange."""
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    layouts = state.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"finalize_weighted_quantiles: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_w = Window.partitionBy(*keys)
    r = state.withColumn(
        "__cumw", F.sum(F.col(weight_col)).over(w)
    ).withColumn("__totw", F.sum(F.col(weight_col)).over(n_w))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_kept")]
    for q in qs:
        label = f"q_{str(q).replace('.', '_')}"
        aggs.append(
            F.min(
                F.when(
                    F.col("__cumw") >= F.lit(float(q)) * F.col("__totw"),
                    F.col(value_col),
                )
            ).alias(label)
        )
    return r.groupBy(*keys).agg(*aggs)


def kmv_set_estimates(
    state_a: DataFrame,
    state_b: DataFrame,
    keys: "list[str]",
) -> DataFrame:
    """KMV SET ALGEBRA (Beyer et al. 2007, "On synopses for distinct
    value estimation under multiset operations"): per key group,
    estimate |A ∪ B|, |A ∩ B| and the Jaccard overlap of two KMV
    sketches WITHOUT the raw data — the "how many users do these two
    segments share" / "how much does this corpus slice overlap that
    one" question answered from two ≤ k-longs-per-key states.

    Method: the bottom-k of the two hash sets' union is itself the KMV
    sketch of A ∪ B (the ``merge_kmv_states`` property), so
    ``union_est`` is the family estimator — EXACT (= n_kept) while the
    union kept fewer than k hashes (both sides were complete), else
    (k−1)/U(k). Within that combined bottom-k, the fraction ρ of
    hashes present in BOTH sketches estimates the Jaccard overlap
    (each bottom-k hash is a uniform sample of A ∪ B), and
    ``intersect_est`` = round(ρ · union_est). In the exact branch
    ρ·union = the true intersection count verbatim. Everything is
    deterministic integer/double arithmetic on portable md5 hashes, so
    a SQL oracle replays every estimate value-exactly — the
    differential-testing-friendly sketch, like the rest of the family.

    Keys appearing in only one state behave as the empty-set side:
    intersection 0, Jaccard 0, union = that side's estimate. Layout
    drift (different k/seed) fails loudly with the bounded probe.

    Set DIFFERENCE rides the same combined bottom-k (the theta-sketch
    construction, Dasgupta et al. 2016): the fraction of the union's
    sketch present in exactly one side estimates that side's exclusive
    mass — ``diff_ab_est`` ≈ |A\\B| and ``diff_ba_est`` ≈ |B\\A|
    (exact in the exact branch; the three estimates partition
    ``union_est`` up to rounding).

    Returns (keys…, ``n_kept``, ``union_est``, ``intersect_est``,
    ``diff_ab_est``, ``diff_ba_est``, ``jaccard_e6``).

    Scale shape: one union of two ≤ k-rows-per-key states, one
    (keys, hash) groupBy carrying ≤ 2k integer rows per key, one
    keys-partitioned window over the SAME partitioning (no second
    exchange) and one map-side-combined aggregate. Bounded by k per
    key forever — never by the corpora the sketches summarized."""
    cols = ["__hv", "__k", "__seed"]
    u = state_a.select(
        *keys, *cols, F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b")
    ).unionByName(
        state_b.select(
            *keys, *cols, F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b")
        )
    )
    layouts = u.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"kmv_set_estimates: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    k = int(layouts[0][0]) if layouts else 0
    from pyspark.sql import Window

    g = u.groupBy(*keys, "__hv").agg(
        F.max("__in_a").alias("__in_a"), F.max("__in_b").alias("__in_b")
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__hv").asc())
    # no pre-filter needed: the window input is ≤ 2k rows per key BY
    # CONSTRUCTION (each state keeps ≤ k), so ranking everything and
    # aggregating conditionally is already bounded
    r = g.withColumn("__rn", F.row_number().over(w))
    in_bk = F.col("__rn") <= F.lit(k)
    agg = r.groupBy(*keys).agg(
        F.sum(F.when(in_bk, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.max(F.when(in_bk, F.col("__hv"))).alias("__hk"),
        F.sum(
            F.when(in_bk & (F.col("__in_a") + F.col("__in_b") == 2), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("__both"),
        F.sum(F.when(in_bk & (F.col("__in_a") == 1), 1).otherwise(0))
        .cast("long")
        .alias("__na_bk"),
    )
    u_k = F.col("__hk").cast("double") / F.lit(float(1 << 60))
    union_d = F.when(
        F.col("n_kept") < F.lit(k), F.col("n_kept").cast("double")
    ).otherwise(F.round((F.lit(k) - 1) / u_k, 0))
    rho = F.col("__both").cast("double") / F.col("n_kept")
    rho_a = (F.col("__na_bk") - F.col("__both")).cast("double") / F.col("n_kept")
    rho_b = (
        F.col("n_kept") - F.col("__na_bk")
    ).cast("double") / F.col("n_kept")
    return agg.select(
        *keys,
        "n_kept",
        union_d.cast("long").alias("union_est"),
        F.round(rho * union_d, 0).cast("long").alias("intersect_est"),
        F.round(rho_a * union_d, 0).cast("long").alias("diff_ab_est"),
        F.round(rho_b * union_d, 0).cast("long").alias("diff_ba_est"),
        F.round(rho, 6).alias("jaccard_e6"),
    )


def kmv_overlap_pairs(
    state: DataFrame,
    group_col: str,
) -> DataFrame:
    """ALL-PAIRS set overlap across many group sketches — the
    "which segments share audiences" matrix computed entirely in
    sketch space: given ONE KMV state keyed by ``group_col`` (every
    group ≤ k hashes), estimate union / intersection / Jaccard for
    every group pair that shares at least one bottom-k hash. Pairs
    sharing NO sketch hash are OMITTED — their estimated intersection
    is 0 by construction (ρ = 0), and at scale that omission IS the
    algorithm: candidate pairs come from a hash equi-join (each hash
    matches only the groups that kept it), so the output is sparse in
    the number of genuinely-overlapping pairs, never the G² matrix —
    the same candidates-from-collisions trick as MinHash LSH, applied
    to the sketch layer instead of the corpus.

    Per candidate pair the estimator is ``kmv_set_estimates``
    verbatim (combined bottom-k of the two hash sets = the union's
    sketch; both-sides membership fraction = Jaccard; exact while the
    union kept < k) plus the two CONTAINMENT directions —
    ``contain_g1_e6`` ≈ |g1∩g2|/|g1| and ``contain_g2_e6`` ≈
    |g1∩g2|/|g2| (each side's own distinct estimate from its own
    hashes in the state) — the signal Jaccard hides: a small segment
    fully swallowed by a huge one has Jaccard ≈ 0 but containment ≈ 1,
    the corpus-embedded-in-corpus / eval-set-inside-training-set
    audit. Deterministic portable-md5 arithmetic, so a SQL oracle
    replays every pair. Returns (``g1``, ``g2`` [g1 < g2],
    ``n_kept``, ``union_est``, ``intersect_est``, ``jaccard_e6``,
    ``contain_g1_e6``, ``contain_g2_e6``).

    Scale shape: one hash equi-join over ≤ k-rows-per-group integer
    states (candidates ∝ true overlaps), then each candidate pair
    re-reads the two groups' ≤ k-row hash sets via two ids-only joins
    and ranks ≤ 2k rows per pair. Everything is bounded by
    k × (groups + overlapping pairs) — never by the corpora, never by
    G². Note the plan references ``state`` THREE times (the candidate
    self-join + the two side re-reads): a state read from parquet
    re-scans a k-rows-per-group file cheaply, but a state built inline
    from an expensive corpus plan should be persisted/checkpointed by
    the caller first, or the corpus distinct-shuffle runs three
    times."""
    layouts = state.select("__k", "__seed").distinct().limit(2).collect()
    if len(layouts) > 1:
        raise ValueError(
            f"kmv_overlap_pairs: incompatible layouts "
            f"{sorted(map(tuple, layouts))} — states must share (k, seed)"
        )
    k = int(layouts[0][0]) if layouts else 0
    s = state.select(F.col(group_col).alias("__g"), "__hv")
    a, b = s.alias("a"), s.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__hv") == F.col("b.__hv"))
            & (F.col("a.__g") < F.col("b.__g")),
        )
        .select(F.col("a.__g").alias("g1"), F.col("b.__g").alias("g2"))
        .distinct()
    )
    side1 = cand.join(
        s.select(F.col("__g").alias("g1"), "__hv"), "g1"
    ).select("g1", "g2", "__hv", F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b"))
    side2 = cand.join(
        s.select(F.col("__g").alias("g2"), "__hv"), "g2"
    ).select("g1", "g2", "__hv", F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b"))
    u = side1.unionByName(side2).groupBy("g1", "g2", "__hv").agg(
        F.max("__in_a").alias("__in_a"), F.max("__in_b").alias("__in_b")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g1", "g2").orderBy(F.col("__hv").asc())
    r = u.withColumn("__rn", F.row_number().over(w))
    in_bk = F.col("__rn") <= F.lit(k)
    agg = r.groupBy("g1", "g2").agg(
        F.sum(F.when(in_bk, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.max(F.when(in_bk, F.col("__hv"))).alias("__hk"),
        F.sum(
            F.when(in_bk & (F.col("__in_a") + F.col("__in_b") == 2), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("__both"),
        # per-side sketch stats (over each side's FULL hash set, not
        # the combined bottom-k): the side's own distinct estimate
        # feeds the containment denominators
        F.sum("__in_a").cast("long").alias("__na"),
        F.max(F.when(F.col("__in_a") == 1, F.col("__hv"))).alias("__hka"),
        F.sum("__in_b").cast("long").alias("__nb"),
        F.max(F.when(F.col("__in_b") == 1, F.col("__hv"))).alias("__hkb"),
    )
    u_k = F.col("__hk").cast("double") / F.lit(float(1 << 60))
    union_d = F.when(
        F.col("n_kept") < F.lit(k), F.col("n_kept").cast("double")
    ).otherwise(F.round((F.lit(k) - 1) / u_k, 0))
    rho = F.col("__both").cast("double") / F.col("n_kept")
    inter_d = F.round(rho * union_d, 0)

    def side_d(n, hk):
        uu = F.col(hk).cast("double") / F.lit(float(1 << 60))
        return F.when(
            F.col(n) < F.lit(k), F.col(n).cast("double")
        ).otherwise(F.round((F.lit(k) - 1) / uu, 0))

    return agg.select(
        "g1",
        "g2",
        "n_kept",
        union_d.cast("long").alias("union_est"),
        inter_d.cast("long").alias("intersect_est"),
        F.round(rho, 6).alias("jaccard_e6"),
        F.round(
            F.least(inter_d / side_d("__na", "__hka"), F.lit(1.0)), 6
        ).alias("contain_g1_e6"),
        F.round(
            F.least(inter_d / side_d("__nb", "__hkb"), F.lit(1.0)), 6
        ).alias("contain_g2_e6"),
    )


_CMS_STATE_COLS = ["row_idx", "col_idx", "cnt", "__w", "__d", "__seed"]
_CMS_MAX_CELLS = 1 << 16  # 64 Ki longs = 512 KiB: the driver-probe cap


def _cms_validate(width: int, depth: int) -> None:
    if width < 16 or (width & (width - 1)) != 0:
        raise ValueError(
            f"width must be a power of two >= 16, got {width}"
        )
    if not (1 <= depth <= 8):
        raise ValueError(f"depth must be in [1, 8], got {depth}")
    if width * depth > _CMS_MAX_CELLS:
        raise ValueError(
            f"width*depth = {width * depth} exceeds the "
            f"{_CMS_MAX_CELLS}-cell collected-probe cap"
        )


def _cms_cols(key, width: int, depth: int, seed: str):
    """array<int> of the per-row column indexes for a key — the SAME
    Kirsch–Mitzenmacher double hash as ``_bloom_positions``'s portable
    family (two independent 60-bit md5 halves, h2 forced odd), mod the
    table width: col_r = (h1 + r·h2) mod w. ONE md5 per key covers all
    ``depth`` rows, and DuckDB computes identical md5 bytes, so an
    oracle replays every cell exactly."""
    hx = F.md5(F.concat(key.cast("string"), F.lit(":" + seed)))
    h1 = (
        F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
        % F.lit(int(width))
    )
    h2 = (
        F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
        % F.lit(int(width))
    ).bitwiseOR(F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(depth) - 1)),
        lambda r: ((h1 + r.cast("long") * h2) % F.lit(int(width))).cast("int"),
    )


def build_cms_state(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1 << 12,
    depth: int = 4,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min Sketch FREQUENCY state (Cormode & Muthukrishnan 2005)
    — the frequency member of the mergeable-state family (monoid =
    moments, HLL = distinct counts, histogram = order statistics,
    Bloom = membership, CMS = "how often have we seen this key?").
    One row per occupied cell: (row_idx, col_idx, cnt), plus the layout
    columns (__w, __d, __seed) that make a layout-drift fold fail
    loudly — the family's shared contract.

    Same-layout states merge by cell-wise SUM — exactly (count
    additivity), so daily ingest increments fold into a running sketch
    and any key's frequency is answerable WITHOUT re-aggregating raw
    history. The guarantee is one-sided: ``estimate_cms`` never
    UNDER-estimates (each of the ``depth`` counters holds the key's
    true count plus non-negative collision mass; the min over rows is
    still ≥ truth), and over-estimates by ≤ 2N/width with probability
    ≥ 1 − 2^−depth. At 100 TB that is the point: per-key frequencies
    over billions of keys in ≤ 512 KiB of state, no key-cardinality
    shuffle — the heavy-hitter / frequency-cap primitive.

    Cell positions come from the portable md5 double hash
    (``_cms_cols``), so a DuckDB oracle replays every cell and every
    estimate EXACTLY — no error envelope needed, the Bloom-family
    argument. ``weight_col`` sums that column instead of counting rows
    (a NEGATIVE weight fails loudly at execution — summing it in
    would let a colliding key's min-over-rows estimate drop below its
    true count, silently voiding the guarantee; NULL
    weights contribute nothing, like NULL keys). Shuffle shape: the
    explode carries depth·rows (cell, weight) integers — never
    payloads — into one map-side-combined sum over ≤ width·depth
    groups."""
    _cms_validate(width, depth)
    if weight_col:
        # zero-cost on the happy path (codegen branch); the guarantee
        # violation must be loud, like every other family contract
        w = F.when(
            F.col(weight_col) < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "build_cms_state: negative weight breaks the "
                        "never-underestimate guarantee: "
                    ),
                    F.col(weight_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(F.col(weight_col).cast("long"))
    else:
        w = F.lit(1).cast("long")
    base = df.where(F.col(key_col).isNotNull())
    if weight_col:
        base = base.where(F.col(weight_col).isNotNull())
    cols = _cms_cols(F.col(key_col), width, depth, seed)
    cells = base.select(
        F.posexplode(cols).alias("row_idx", "col_idx"), w.alias("__inc")
    )
    state = cells.groupBy("row_idx", "col_idx").agg(
        F.sum("__inc").alias("cnt")
    )
    return state.select(
        "row_idx",
        "col_idx",
        "cnt",
        F.lit(int(width)).alias("__w"),
        F.lit(int(depth)).alias("__d"),
        F.lit(seed).alias("__seed"),
    )


def merge_cms_states(states: list[DataFrame]) -> DataFrame:
    """Fold any number of CMS state tables: cell-wise SUM per
    (row_idx, col_idx) — exact count additivity, so fold order can
    never change the result and fold == full-history-build IDENTICALLY
    (the equality the unit test and the registry query pin). Layout
    drift (different width/depth/seed — which would sum counts from
    incompatible hash spaces into a silently-wrong sketch) fails
    loudly with a bounded probe."""
    if not states:
        raise ValueError("states must be non-empty")
    u = states[0].select(_CMS_STATE_COLS)
    for s in states[1:]:
        u = u.unionByName(s.select(_CMS_STATE_COLS))
    layouts = (
        u.select("__w", "__d", "__seed").distinct().limit(2).collect()
    )
    if len(layouts) > 1:
        raise ValueError(
            f"merge_cms_states: incompatible layouts {sorted(map(tuple, layouts))} "
            "— states must share (width, depth, seed) to merge"
        )
    return u.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").alias("cnt"),
        F.first("__w").alias("__w"),
        F.first("__d").alias("__d"),
        F.first("__seed").alias("__seed"),
    )


def estimate_cms(
    df: DataFrame,
    key_col: str,
    state: DataFrame,
    *,
    out_col: str = "est_count",
) -> DataFrame:
    """Estimate every row's key frequency from a CMS state: adds a
    long ``out_col`` = min over the ``depth`` rows of the key's cell
    counts — NEVER below the true count inserted into the state (the
    load-bearing one-sided guarantee, for non-negative weights). The
    state is folded DISTRIBUTED (sum before collect — the probe_bloom
    lesson, so raw appended increments cannot blow the driver probe
    past width·depth cells ≤ 64 Ki longs) and embedded as a flat
    literal array; the probe itself is a pure zero-shuffle, zero-join
    codegen projection: one md5, ``depth`` element_at lookups, one
    array_min per row. NULL keys estimate NULL (unknown, not 0 — 0
    would falsely certify them as never-seen); keys never inserted
    estimate 0 or collision mass only."""
    meta = state.select("__w", "__d", "__seed").distinct().limit(2).collect()
    if len(meta) > 1:
        raise ValueError(
            f"estimate_cms: state has mixed layouts {sorted(map(tuple, meta))}"
        )
    if not meta:  # empty state: nothing ever inserted
        return df.withColumn(
            out_col,
            F.when(F.col(key_col).isNotNull(), F.lit(0).cast("long")),
        )
    width, depth, seed = int(meta[0][0]), int(meta[0][1]), str(meta[0][2])
    _cms_validate(width, depth)
    cells = [0] * (width * depth)
    folded = state.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").alias("cnt")
    )
    for r in folded.collect():
        cells[int(r[0]) * width + int(r[1])] += int(r[2])
    arr = F.lit(cells)
    cols = _cms_cols(F.col(key_col), width, depth, seed)
    est = F.array_min(
        F.transform(
            cols,
            lambda c, r: F.element_at(
                arr, r.cast("int") * F.lit(int(width)) + c + 1
            ),
        )
    )
    return df.withColumn(
        out_col, F.when(F.col(key_col).isNotNull(), est)
    )


def finalize_hist_quantiles(
    state: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """State → interpolated quantiles ``q_<q>`` per key (plus n).
    Within the located bucket the value is linearly interpolated:
    ``lo + width·(idx + (q·n − cum_before)/cnt)`` — the standard
    histogram-quantile estimate, error bounded by one bucket width.
    Deterministic closed-form arithmetic on exact integer counts, so a
    SQL oracle replays it bit-for-bit. ``q`` must be in (0, 1]."""
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    from pyspark.sql import Window

    b = state.select(
        *keys, "n", "__lo", "__hi", "__nb",
        F.posexplode("hist").alias("__p", "__c"),
    )
    wspec = Window.partitionBy(*keys).orderBy("__p")
    b = b.withColumn("__cum", F.sum("__c").over(wspec))
    width = (F.col("__hi") - F.col("__lo")) / F.col("__nb")
    aggs = [F.first("n").alias("n")]
    for q in qs:
        target = F.lit(float(q)) * F.col("n")
        val = F.col("__lo") + width * (
            F.col("__p")
            + (target - (F.col("__cum") - F.col("__c"))) / F.col("__c")
        )
        hit = (
            (F.col("__c") > 0)
            & (F.col("__cum") >= target)
            & ((F.col("__cum") - F.col("__c")) < target)
        )
        label = f"q_{str(q).replace('.', '_')}"
        aggs.append(F.min(F.when(hit, F.round(val, 6))).alias(label))
    return b.groupBy(*keys).agg(*aggs)
