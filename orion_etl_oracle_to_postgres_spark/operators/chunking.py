"""[EXT] Document chunking for training-data pipelines (SURVEY.md §2.11):
split each document into fixed-size token windows with overlap — the
step that turns a curated corpus into model-ready training sequences.

Pure Column-expression formulation: tokenize once, generate the window
start offsets as an array (``sequence(0, n_tokens-1, stride)``), then
``posexplode`` + ``slice`` + ``array_join``. Zero Python in the row
path, zero shuffles — chunking is a flat-map projection, so it scales
linearly with corpus size and composes with any upstream dedup/quality
plan without adding an exchange.

Reference parity note: the reference engine
(Dims24/orion-etl-oracle-to-postgres) has no chunking operator — this is
part of the [EXT] LLM-data surface layered on the same table model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens


def chunk_by_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Explode each document into token-window chunks →
    ``(id, chunk_idx, token_start, chunk_text, n_tokens)``.

    Window ``w`` and stride ``s`` (``s <= w``; overlap = ``w - s``):
    chunk ``k`` covers tokens ``[k*s, k*s + w)``. Starts are generated
    while ``start < n_tokens``, so the last chunk may be short (its
    real length is in ``n_tokens``) and every token appears in at least
    one chunk. Empty documents produce no rows. Deterministic: chunk
    boundaries depend only on the text, never on partitioning — the
    same document chunks identically on 1 or 1000 executors.

    Scale: the token array is materialized ONCE per document (staged
    column), and all per-chunk work is ``slice`` over that array —
    O(total tokens × w/s) with no re-tokenization per chunk. The output
    inherits the input's partitioning; no exchange is introduced.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive, got {window}/{stride}")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would drop tokens between chunks"
        )
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).filter(F.size("__tk") > 0)
    starts = F.sequence(F.lit(0), F.size("__tk") - 1, F.lit(stride))
    return staged.select(
        F.col(id_col),
        F.col("__tk"),
        F.posexplode(starts).alias("chunk_idx", "token_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("token_start").cast("long").alias("token_start"),
        F.array_join(
            F.slice(F.col("__tk"), F.col("token_start") + 1, F.lit(window)), " "
        ).alias("chunk_text"),
        F.least(F.lit(window), F.size("__tk") - F.col("token_start"))
        .cast("int")
        .alias("n_tokens"),
    )


def chunk_stats(chunks: DataFrame, id_col: str) -> DataFrame:
    """Per-document chunk accounting → ``(id, n_chunks, total_tokens,
    last_chunk_tokens)`` — the sanity aggregate a pipeline runs after
    chunking (how many sequences, how much tail padding)."""
    return chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max(F.struct("chunk_idx", "n_tokens"))["n_tokens"]
        .cast("int")
        .alias("last_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    budget: int = 2048,
    n_shards: int = 32,
    seed: str = "s0",
) -> DataFrame:
    """Sequence packing: group documents into training bins of at most
    ``budget`` tokens (greedy next-fit), →
    ``(id, n_tokens, shard, bin_id)``.

    The step after chunking in a pretraining pipeline: short documents
    are concatenated into fixed-budget sequences so padding waste stays
    low. Greedy next-fit is inherently sequential (each bin decision
    depends on the running fill), so the corpus is first cut into
    ``n_shards`` deterministic shards — a portable md5 bucket of the id
    (never partition-dependent), matching ``curation.hash_split`` — and
    the sequential fold runs per shard, docs ordered by id. Bins never
    cross shards; results are bit-stable across cluster sizes and
    engines (the DuckDB oracle replays the same fold as a recursive
    CTE).

    Scale: the fold touches only ``(id, n_tokens)`` — 16 bytes a row —
    via one Arrow-batched ``applyInPandas`` per shard; one shuffle by
    shard. At 100 TB raise ``n_shards`` so a shard's id+count pairs fit
    an executor (tokens themselves never shuffle). A document longer
    than ``budget`` gets a bin of its own (never split, never dropped —
    chunk upstream with ``chunk_by_tokens(window=budget)`` if hard caps
    matter).
    """
    import pandas as pd

    from ..functions import md5_hash60, token_count

    if budget <= 0 or n_shards <= 0:
        raise ValueError(f"budget/n_shards must be positive: {budget}/{n_shards}")

    counted = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        (
            md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
            % n_shards
        )
        .cast("int")
        .alias("shard"),
    )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_tokens long, shard int, bin_id long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for tc in pdf["n_tokens"]:
            if fills and fill + tc > budget:
                bin_id += 1
                fill = 0
            fill += tc
            fills.append(fill)
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[[id_col, "n_tokens", "shard", "bin_id"]]

    return counted.groupBy("shard").applyInPandas(fold, out_schema)


def pack_stats(packed: DataFrame, *, budget: int) -> DataFrame:
    """Per-bin accounting over ``pack_sequences`` output →
    ``(shard, bin_id, n_docs, fill, utilization)`` — the waste report
    that decides whether the budget/shard settings are right."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("fill"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("utilization"),
    )


def length_bucket_batches(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bucket_tokens: int = 64,
    batch_size: int = 8,
    seed: str = "lb0",
) -> DataFrame:
    """Length-bucketed batching — the inference/serving primitive:
    documents are grouped into fixed-size batches of SIMILAR length so a
    batch pads to its longest member with minimal waste (random batching
    pads everything to the corpus tail). Bucket = ``n_tokens div
    bucket_tokens``; within a bucket, documents are numbered in portable
    md5 order and cut into batches of ``batch_size``. Returns
    (id_col, n_tokens, bucket, batch_id) with ``batch_id`` unique
    ACROSS buckets (bucket * 2^40 + intra-bucket batch — collision-free
    while a bucket holds < 2^40 batches, i.e. always).

    Deterministic on any engine/partitioning (same hash-order rule as
    ``curation.stratified_sample``). One shuffle: the per-bucket
    row_number window; buckets are length bands — bounded count, and
    each band's rows spill-sort within its partition. NULL-text docs
    have no length to bucket by and are dropped, same as the oracle.
    """
    if bucket_tokens < 1 or batch_size < 1:
        raise ValueError("bucket_tokens and batch_size must be >= 1")
    from pyspark.sql import Window

    from ..functions import md5_hash60, token_count

    order = md5_hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    w = Window.partitionBy("bucket").orderBy(F.col("__ord").asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn("bucket", (F.col("n_tokens") / bucket_tokens).cast("long"))
        .withColumn("__ord", order)
        .withColumn(
            "batch_id",
            F.col("bucket") * F.lit(1 << 40).cast("long")
            + ((F.row_number().over(w) - 1) / batch_size).cast("long"),
        )
        .select(id_col, "n_tokens", "bucket", "batch_id")
    )
