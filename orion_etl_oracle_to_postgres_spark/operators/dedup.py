"""[EXT] Deduplication operators (SURVEY.md §2.11) — exact, fingerprint,
MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection over a
document table.

Everything below is built from JVM-side ``pyspark.sql.functions``
(higher-order array functions + ``xxhash64``) — no Python UDFs anywhere,
so signatures/bands compute inside whole-stage codegen and the only
shuffles are the ones the algorithms fundamentally need:

* exact/fingerprint dedup: one hash-aggregate on the dedup key;
* MinHash LSH: explode ``bands`` rows per doc (ids only, signatures are
  dropped before the explode so the shuffle payload stays tiny), one
  shuffle to bucket candidates, then an id-keyed join to re-attach
  shingle sets for exact verification;
* SimHash: banding on 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4
  chunks equal), verify with ``bit_count(a ^ b)``;
* n-gram Jaccard: inverted-index join on shingles with a hot-shingle cap
  (classic exact near-dup at scale; the cap bounds the quadratic
  postings blowup and is surfaced as a parameter).

At 100 TB the shuffle keys are (band_id, band_hash) / shingle hashes —
high-cardinality and uniform by construction (hash values), so no skew;
AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import distinct_tokens, shingles_from_tokens, tokens


def exact_dedup(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the row with the minimum ``id_col`` per key
    group (deterministic, unlike ``dropDuplicates`` which keeps an
    arbitrary row). One hash-aggregate shuffle on ``keys``."""
    return df.groupBy(*keys).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup via md5 of normalized text (whitespace/case/
    punctuation-insensitive). Returns one row per fingerprint with the
    min id and the duplicate count."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return df.select(fp, F.col(id_col)).groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic odd multiplier / additive constants for the linear
    hash family h_i(x) = a_i*x + b_i over Z/2^64 (overflow wraps —
    standard multiply-shift MinHash)."""
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(num_hashes):
        a = rng.getrandbits(63) | 1  # odd → bijective mod 2^64
        b = rng.getrandbits(63)
        out.append((a, b))
    return out


def _wrap64(col: Column) -> Column:
    """Java long arithmetic wraps on overflow only with ANSI off; the
    session runs ANSI-off (session.py), matching this expectation."""
    return col


def minhash_bands(
    base: DataFrame,
    num_hashes: int,
    bands: int,
    seed: int = 42,
) -> DataFrame:
    """(__id, band_id, band_hash) LSH band keys from a
    (__id, __sh array<string>) input — fully relational formulation.

    Plan: explode shingles → ONE xxhash64 per shingle → broadcast-join a
    ``num_hashes``-row coefficient dimension → ``min(a_i*h+b_i)`` per
    (doc, i) → combine each band's mins into one 64-bit key with an
    order-insensitive sum of ``xxhash64(min, i)``.

    Rationale: a 128-column-wide min-aggregate compiles to enormous
    generated code (Janino chokes, ~mins of compile) and 128-field agg
    buffers, while a coefficient-dimension cross join executes as a
    row-at-a-time BroadcastNestedLoopJoin (~300k rows/s). A
    ``posexplode(array(a_i*h+b_i ...))`` stays inside whole-stage
    codegen, and map-side partial-min means the (doc, i) shuffle
    carries only docs × num_hashes rows. Shuffle keys are
    (doc, i)/(doc, band) — uniform, skew-free, tiny rows."""
    rows_per_band = num_hashes // bands
    flat = base.select(F.col("__id"), F.explode("__sh").alias("__s")).select(
        "__id", F.xxhash64("__s").alias("__h")
    )
    hashes = F.array(
        *[
            _wrap64(F.col("__h") * F.lit(a) + F.lit(b))
            for (a, b) in _minhash_coeffs(num_hashes, seed)
        ]
    )
    per_hash = (
        flat.select("__id", F.posexplode(hashes).alias("i", "__v"))
        .groupBy("__id", "i")
        .agg(F.min("__v").alias("__m"))
    )
    return (
        per_hash.withColumn("band_id", F.col("i") - F.col("i") % rows_per_band)
        .groupBy("__id", "band_id")
        .agg(F.sum(F.xxhash64("__m", "i")).alias("band_hash"))
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    shingle → minhash → band → bucket-join → exact-Jaccard verify
    (SURVEY.md §2.11). With 128 hashes / 32 bands (4 rows per band) the
    probability of missing a 0.8-Jaccard pair is (1−0.8⁴)³² < 1e-7.

    Returns (id_i, id_j, jaccard) with id_i < id_j and
    jaccard ≥ threshold. Candidate generation shuffles only
    (id, band_id, band_hash); shingle sets are re-attached by an id join
    for verification, so the heavy arrays never ride the LSH shuffle.
    """
    base = (
        df.select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__tk"))
        .select(
            "__id",
            F.array_distinct(shingles_from_tokens(F.col("__tk"), shingle_n)).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
    )
    # base feeds signature generation AND both sides of the verify join;
    # banded feeds both sides of the candidate self-join. Persist both —
    # otherwise each self-join re-executes the whole upstream lineage
    # (shingling is HOF-heavy and worth computing once).
    base = base.persist()
    banded = minhash_bands(base, num_hashes, bands, seed).persist()

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_i"), F.col("b.__id").alias("id_j"))
        .distinct()
    )

    sh = base  # (__id, __sh)
    verified = (
        candidates.join(sh.withColumnsRenamed({"__id": "id_i", "__sh": "__sh_i"}), "id_i")
        .join(sh.withColumnsRenamed({"__id": "id_j", "__sh": "__sh_j"}), "id_j")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sh_i", "__sh_j"))
            / F.size(F.array_union("__sh_i", "__sh_j")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_i", "id_j", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


# --- SimHash -----------------------------------------------------------

# 2^j for j in 0..63 with the sign bit as two's-complement — summing
# disjoint bit values reconstructs the packed long exactly.
_POW2 = [1 << j for j in range(63)] + [-(1 << 63)]


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(__id, __sim) 64-bit SimHash per document.

    Relational formulation (same rationale as ``minhash_bands`` — wide
    aggregates choke codegen): explode distinct tokens → one xxhash64
    per token → cross a 64-row bit-index dimension → per-(doc, bit)
    vote sums → pack set bits with an order-insensitive sum (bit values
    are disjoint, so sum == OR)."""
    spark = df.sparkSession
    bits = spark.createDataFrame(
        [(j, p) for j, p in enumerate(_POW2)], "j int, p long"
    )
    flat = df.select(
        F.col(id_col).alias("__id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("__t"),
    ).select("__id", F.xxhash64("__t").alias("__h"))
    # vote for bit with value p: +1 if (h & p) != 0 else -1, summed over tokens
    return (
        flat.join(F.broadcast(bits))
        .withColumn(
            "__vote", (F.col("__h").bitwiseAND(F.col("p")) != 0).cast("int") * 2 - 1
        )
        .groupBy("__id", "p")
        .agg(F.sum("__vote").alias("__votes"))
        .groupBy("__id")
        .agg(
            F.sum(
                F.when(F.col("__votes") > 0, F.col("p")).otherwise(F.lit(0).cast("long"))
            ).alias("__sim")
        )
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ ``max_hamming``.

    Banding: the 64-bit simhash splits into 4 × 16-bit chunks; by
    pigeonhole, hamming ≤ 3 ⇒ at least one chunk is identical, so
    bucketing on (chunk_id, chunk_value) has perfect recall for ≤ 3.
    Verification: ``bit_count(a ^ b)``.
    """
    base = simhash_signatures(df, id_col, text_col)
    chunks = base.select(
        "__id",
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sim"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_i"),
            F.col("b.__id").alias("id_j"),
            F.bit_count(F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_postings: int = 10_000,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via an inverted shingle index
    (no approximation, unlike MinHash): explode shingles → join docs
    sharing a shingle → count common shingles per pair → Jaccard via
    |A∩B| / (|A| + |B| − |A∩B|).

    ``max_postings`` drops shingles shared by more than that many docs
    (stop-shingles): they generate O(n²) candidate pairs while adding
    almost no discriminative signal. Dropping a shingle can only lower
    measured Jaccard for pairs that shared it, so with the default cap
    (≫ any real posting list at test scale) results are exact.
    """
    base = (
        df.select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__tk"))
        .select(
            "__id",
            F.array_distinct(shingles_from_tokens(F.col("__tk"), shingle_n)).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
        .persist()
    )
    sizes = base.select("__id", F.size("__sh").alias("__n"))

    postings = base.select("__id", F.explode("__sh").alias("__s"))
    keep = (
        postings.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_postings)
        .select("__s")
    )
    postings = postings.join(keep, "__s")

    a, b = postings.alias("a"), postings.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_i"), F.col("b.__id").alias("id_j"))
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"__id": "id_i", "__n": "__ni"}), "id_i")
        .join(sizes.withColumnsRenamed({"__id": "id_j", "__n": "__nj"}), "id_j")
        .withColumn(
            "jaccard",
            F.col("__common") / (F.col("__ni") + F.col("__nj") - F.col("__common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_i", "id_j", F.round("jaccard", 6).alias("jaccard"))
    )
    return out
