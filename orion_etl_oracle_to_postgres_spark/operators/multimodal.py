"""[EXT] Multimodal column handling (SURVEY.md §2.11): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` pipelines.

The container has no image/audio codecs (no PIL/opencv/librosa), so the
actual byte decoding is STUBBED: ``decode_image``/``decode_audio`` try
to import the real library and otherwise fall back to a clearly-marked
deterministic fake (hash-derived pseudo features). Everything around the
stub — the schema contract, the Arrow batch iteration, the partition
sizing, the UDF signatures — is real and tested; swapping in a real
decoder is a one-function change.

Scale notes: binary payloads ride in parquet BYTE_ARRAY pages and are
processed partition-by-partition through Arrow batches — nothing is
collected to the driver; per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it down to ~256
for multi-MB payloads).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct carried next to every media column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # doubles, not float32: feature values survive Arrow round-trips
        # bit-exactly, so the decode output is differential-testable
        # against an external oracle computing the same sha256-derived
        # values in float64.
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_binary(
    df: DataFrame, text_col: str, id_col: str, *, media_type: str = "image"
) -> DataFrame:
    """Test/dev helper: materialize a ``binary`` media column + metadata
    struct from a text column (UTF-8 bytes stand in for media payloads).
    Keeps the downstream pipeline identical to a real ingest."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("media_meta")
    )


def _fake_decode(payload: bytes, n_features: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: width/height/features derived from the
    payload's sha256. Stands in for PIL/libjpeg until a codec is present."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + n_features]]
    return width, height, feats


def decode_image_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 8,
) -> DataFrame:
    """Decode + feature-extract an image binary column via
    ``mapInPandas`` (Arrow batches; one Python worker per partition).

    With a real codec installed the ``try: import PIL`` branch decodes
    actual pixels; otherwise the deterministic fake keeps the plumbing
    (batch shape, schema, null handling) fully exercised.
    """
    try:  # pragma: no cover - codec not present in this container
        import PIL.Image  # noqa: F401

        # fail FAST at plan-build time (driver side): the real
        # codec path is honestly unwired, and raising per-row
        # inside the Arrow loop would brick a running job the
        # moment a transitive dependency pulls the library in
        raise NotImplementedError(
            "real codec path not wired yet — this operator ships the "
            "deterministic stub contract; unset the codec library or "
            "wire the decode before using it"
        )
    except ImportError:
        pass

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, 0, None, None, None, None))
                    continue
                b = bytes(payload)
                width, height, feats = _fake_decode(b, n_features)
                rows.append(
                    (doc_id, len(b), hashlib.sha256(b).hexdigest(), width, height, feats)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "sha256", "width", "height", "features"],
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    max_width: int = 224,
    max_height: int = 224,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aspect-fit image resize via ``mapInPandas``: scale each image to
    fit inside ``max_width × max_height`` preserving aspect ratio, never
    upscaling (``scale = min(mw/w, mh/h, 1.0)``).

    The fit arithmetic (the part worth testing) is real; the pixel
    resampling is stubbed like :func:`decode_image_features` — source
    dims come from the sha256-derived fake decode and the "resized"
    payload is the deterministic byte string ``"{src_sha}:{w}x{h}"``, so
    the whole operator (dims math included) is differential-testable
    against a SQL oracle. All float math is plain IEEE-754 float64,
    identical in Python and the oracle engine.
    """
    try:  # pragma: no cover - codec not present in this container
        import PIL.Image  # noqa: F401

        # fail FAST at plan-build time (driver side): the real
        # codec path is honestly unwired, and raising per-row
        # inside the Arrow loop would brick a running job the
        # moment a transitive dependency pulls the library in
        raise NotImplementedError(
            "real codec path not wired yet — this operator ships the "
            "deterministic stub contract; unset the codec library or "
            "wire the decode before using it"
        )
    except ImportError:
        pass

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None, None, None, None, None))
                    continue
                b = bytes(payload)
                src_w, src_h, _ = _fake_decode(b)
                scale = min(max_width / src_w, max_height / src_h, 1.0)
                dst_w = max(1, int(src_w * scale))
                dst_h = max(1, int(src_h * scale))
                src_sha = hashlib.sha256(b).hexdigest()
                out = f"{src_sha}:{dst_w}x{dst_h}".encode()
                rows.append(
                    (
                        doc_id,
                        src_w,
                        src_h,
                        dst_w,
                        dst_h,
                        len(out),
                        hashlib.sha256(out).hexdigest(),
                        out,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_width",
                    "src_height",
                    "width",
                    "height",
                    "n_bytes",
                    "sha256",
                    "payload",
                ],
            )

    return df.mapInPandas(batches, schema=RESIZED_IMAGE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)

# Fake sample-rate codebook for the stub decoder (indexed by digest byte).
_FAKE_SAMPLE_RATES = (8000, 16000, 24000, 48000)


def decode_audio_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode + feature-extract an audio binary column (waveform-level
    stats: sample rate, duration, RMS, peak) via ``mapInPandas``.

    Same honesty contract as :func:`decode_image_features`: with a real
    codec (soundfile/librosa) installed the import branch would decode
    actual samples; in this container the deterministic sha256-derived
    fake keeps the Arrow plumbing, schema, and null handling fully
    exercised and oracle-checkable. Duration pretends one sample per
    payload byte: ``duration_ms = n_bytes * 1000 // sample_rate``.
    """
    try:  # pragma: no cover - codec not present in this container
        import soundfile  # noqa: F401

        # fail FAST at plan-build time (driver side): the real
        # codec path is honestly unwired, and raising per-row
        # inside the Arrow loop would brick a running job the
        # moment a transitive dependency pulls the library in
        raise NotImplementedError(
            "real codec path not wired yet — this operator ships the "
            "deterministic stub contract; unset the codec library or "
            "wire the decode before using it"
        )
    except ImportError:
        pass

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                b = bytes(payload)
                h = hashlib.sha256(b).digest()
                sr = _FAKE_SAMPLE_RATES[h[0] % 4]
                duration_ms = len(b) * 1000 // sr
                rms = round(h[1] / 255.0, 6)
                peak = round(max(h[1], h[2]) / 255.0, 6)
                rows.append(
                    (doc_id, len(b), hashlib.sha256(b).hexdigest(), sr, duration_ms, rms, peak)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "sha256",
                    "sample_rate",
                    "duration_ms",
                    "rms",
                    "peak",
                ],
            )

    return df.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (duration from metadata; payload decode stubbed). The
    explode happens JVM-side; only the (stubbed) per-frame decode would
    run in Python."""
    n_frames = F.greatest(
        (F.col("media_meta.n_bytes") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "ts_ms"),
    ).withColumn("ts_ms", F.col("ts_ms") * every_ms)


def binary_stats(df: DataFrame, *, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """JVM-side binary column statistics (no Python): byte length and
    sha2 digest — the always-available part of media processing."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.sha2(p, 256).alias("sha256"),
    )


def perceptual_hash(
    features: DataFrame,
    *,
    id_col: str = "doc_id",
    feature_col: str = "features",
    n_bits: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Compact perceptual hash from a decoded feature vector: bit i set
    when ``features[i] >= threshold`` — the classic aHash/pHash shape
    (with a real codec the features are DCT coefficients; the stub's
    sha-derived features exercise the identical plumbing). Pure
    JVM-side fold over the array, zero shuffles. Returns
    (id, phash long)."""
    packed = F.lit(0).cast("long")
    for i in range(n_bits):
        packed = packed + F.when(
            F.element_at(F.col(feature_col), i + 1) >= threshold,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return features.select(F.col(id_col).alias("doc_id"), packed.alias("phash"))


def phash_near_dups(
    features: DataFrame,
    *,
    id_col: str = "doc_id",
    feature_col: str = "features",
    n_bits: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance —
    the media twin of ``dedup.simhash_near_dups`` and the same banding
    argument: split the hash into ``max_hamming + 1`` chunks; two
    hashes within ``max_hamming`` bits must share at least one chunk
    (pigeonhole), so candidates come from a chunk-equality self-join
    and are verified with one ``bit_count(xor)``. All hashing and
    banding is JVM-side; the only shuffle is the (chunk_id, chunk_val)
    bucket join over (id, phash) pairs — the media payloads never
    move. Returns (id_i, id_j, hamming <= max_hamming)."""
    n_chunks = max_hamming + 1
    if n_bits % n_chunks:
        raise ValueError(
            f"n_bits={n_bits} must divide into max_hamming+1={n_chunks} chunks"
        )
    width = n_bits // n_chunks
    mask = (1 << width) - 1
    h = perceptual_hash(
        features, id_col=id_col, feature_col=feature_col, n_bits=n_bits
    )
    chunks = h.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("phash"), c * width)
                        .bitwiseAND(mask)
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "phash", "ck.chunk_id", "ck.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_i"),
            F.col("b.doc_id").alias("id_j"),
            F.expr("bit_count(a.phash ^ b.phash)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def frame_hashes(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-sampled-frame content hash → (id, frame_idx, fhash). With a
    real codec the hash covers the decoded frame's pixels; the stub
    hashes the frame's own SLICE of the payload (1 ms ≈ 1 character
    under the UTF-8 stand-in payloads), so two media objects sharing a
    stretch of content genuinely share those frame hashes — the
    property the near-dup join exists to exploit — unlike a
    whole-payload digest, which only exact copies would share.
    Deliberately md5-based (``functions.md5_hash60``) rather than
    xxhash so the differential oracle replays it; the explode, slicing,
    and hashing are all JVM-side and the payload never enters a
    shuffle."""
    from ..functions import md5_hash60

    k = int(every_ms)
    s = F.col(payload_col).cast("string")
    # ceil, not truncate: the trailing partial frame must emit a hash —
    # otherwise content up to every_ms-1 "ms" past the last full frame
    # contributes no dedup evidence, and two media differing only in
    # that tail are indistinguishable
    n_frames = F.greatest(
        F.ceil(F.length(s) / F.lit(k)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        s.alias("__payload_s"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "__z"
        ),
    ).select(
        id_col,
        "frame_idx",
        md5_hash60(
            F.substring(
                F.col("__payload_s"), F.col("frame_idx") * k + 1, k
            )
        ).alias("fhash"),
    )


def video_near_dups(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    min_jaccard: float = 0.8,
    max_postings: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Video near-duplicate pairs by sampled-frame-set overlap — the
    video twin of MinHash doc dedup: two videos are near-dups when the
    Jaccard of their frame-hash SETS reaches ``min_jaccard`` (re-encoded
    or trimmed copies share most frames; the stub's sha-derived frame
    hashes make only exact payload copies collide, but the plan is the
    real one). Returns (id_i, id_j, n_shared, jaccard).

    Scale shape: distinct (video, fhash) postings, a postings-list cap
    (frames seen in > ``max_postings`` videos are dropped — intro
    cards/test patterns would otherwise create quadratic candidate
    blowup; standard recall trade, documented), ONE fhash-bucketed
    self-join for shared counts, then per-video frame counts joined
    back. The threshold test is pure integer arithmetic
    (``shared·1000 ≥ permille·(n_a+n_b−shared)``), so engines agree
    exactly; payloads never enter any shuffle."""
    permille = int(round(min_jaccard * 1000))
    fh = frame_hashes(
        df, every_ms=every_ms, payload_col=payload_col, id_col=id_col
    ).select(F.col(id_col).alias("__id"), "fhash").distinct()
    sizes = fh.groupBy("__id").agg(F.count(F.lit(1)).alias("__nf"))
    rare = (
        fh.groupBy("fhash")
        .agg(F.count(F.lit(1)).alias("__np"))
        .filter(F.col("__np") <= int(max_postings))
        .select("fhash")
    )
    pruned = fh.join(rare, "fhash")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fhash") == F.col("b.fhash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.__id").alias("id_i"), F.col("b.__id").alias("id_j")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_i"), F.col("__nf").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_j"), F.col("__nf").alias("__nb"))
    uni = F.col("__na") + F.col("__nb") - F.col("n_shared")
    return (
        pairs.join(sa, "id_i")
        .join(sb, "id_j")
        .filter(F.col("n_shared") * 1000 >= F.lit(permille) * uni)
        .select(
            "id_i",
            "id_j",
            "n_shared",
            F.round(F.col("n_shared") / uni.cast("double"), decimals).alias(
                "jaccard"
            ),
        )
    )


def audio_quality_gate(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    min_duration_ms: int = 1000,
    max_duration_ms: int = 30_000,
    min_rms: float = 0.1,
    clip_peak: float = 0.99,
) -> DataFrame:
    """Audio-quality hard gate — the AUDIO leg of the rule families
    (``text.gopher_rules`` for text, phash/frame sets for image/video
    dedup): decode waveform stats (:func:`decode_audio_features`) and
    apply the standard speech-corpus keep rules — duration window
    (clips too short carry no training signal, too long blow past the
    context), minimum RMS energy (silence/near-silence), and clipping
    (peak at full scale = distorted capture). → ``(id, duration_ms,
    rms, peak, failed_rules, keep)`` with the failed rules NAMED
    (comma-joined, deterministic order) — a curation gate must say why
    it dropped a clip. NULL payloads fail as ``no_payload``.

    100 TB shape: the Arrow decode is the only Python; the rule checks
    are one zero-shuffle JVM projection over the stats columns, and
    payloads never shuffle (the gate consumes stats, not bytes)."""
    if not (0 <= min_duration_ms <= max_duration_ms):
        raise ValueError(
            f"need 0 <= min_duration_ms <= max_duration_ms, got "
            f"{min_duration_ms}, {max_duration_ms}"
        )
    feats = decode_audio_features(
        df, payload_col=payload_col, id_col=id_col
    )
    rules = [
        ("no_payload", F.col("duration_ms").isNull()),
        (
            "too_short",
            F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") < int(min_duration_ms)),
        ),
        (
            "too_long",
            F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > int(max_duration_ms)),
        ),
        (
            "too_quiet",
            F.col("rms").isNotNull() & (F.col("rms") < float(min_rms)),
        ),
        (
            "clipping",
            F.col("peak").isNotNull() & (F.col("peak") >= float(clip_peak)),
        ),
    ]
    failed = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    # decode_audio_features emits its fixed schema (id column named
    # 'doc_id' carrying id_col's values) — alias it back so a caller's
    # id_col other than 'doc_id' round-trips (review finding r7)
    return feats.select(
        F.col("doc_id").alias(id_col),
        "duration_ms",
        "rms",
        "peak",
        failed.alias("failed_rules"),
        (failed == "").alias("keep"),
    )
