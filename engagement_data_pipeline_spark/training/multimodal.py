"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The decode/resample kernels need codec libraries this environment
doesn't ship, so the kernel boundary is explicit: `decode_image` /
`decode_audio` raise NotImplementedError unless `fake=True`, in which
case a deterministic structural fake (derived from the bytes alone)
stands in. Everything Spark-side — schemas, batch iteration, column
pruning, partitioning — is real and tested; swapping the fake for
PIL/ffmpeg changes ONE function body, not the plan.

Scale notes: binaries stay opaque to Spark (no JVM-side decode);
mapInPandas streams Arrow batches so peak memory is one batch per
core, not one partition; metadata columns (width/height/duration)
live OUTSIDE the binary so filters on them prune parquet row groups
without touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), nullable=False),
    StructField("media_type", StringType()),    # image | audio | video
    StructField("mime_type", StringType()),
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("width", IntegerType()),        # image/video metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),     # audio/video metadata
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feat_hash", LongType()),       # stand-in embedding id
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
])


def _pil_image():
    """PIL's Image module if the codec library is installed, else
    None — probed per executor process, imported lazily inside the
    Arrow kernel so driver and executors resolve it independently."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _rolling_hash(data: bytes, limit: int = 64) -> int:
    h = 0
    for b in data[:limit]:
        h = (h * 131 + b) % (1 << 61)
    return h


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode one encoded image. With `fake=True` (the oracle-tested
    default throughout the query layer) a deterministic structural
    stand-in derives features from the encoded bytes alone. The real
    path decodes via PIL when installed — features are a rolling hash
    over the decoded RGB pixel bytes, so they are codec-exact and just
    as deterministic — and raises NotImplementedError when no codec
    library is present, keeping the boundary explicit rather than
    silently degrading."""
    if fake:
        return {"n_bytes": len(payload), "feat_hash": _rolling_hash(payload)}
    pil = _pil_image()
    if pil is None:
        raise NotImplementedError(
            "image decoding requires an image codec library (PIL); "
            "pass fake=True for the deterministic structural stand-in")
    import io

    with pil.open(io.BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        return {"n_bytes": len(payload),
                "feat_hash": _rolling_hash(rgb.tobytes(), limit=4096),
                "width": rgb.width, "height": rgb.height}


def image_features(media: DataFrame, target: tuple[int, int] = (224, 224),
                   fake: bool = True) -> DataFrame:
    """Decode + resize-to-target feature extraction over the image
    rows, as an Arrow-batched mapInPandas kernel. Column pruning: only
    media_id + payload reach Python."""
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "feat_hash": [f["feat_hash"] for f in feats],
                "out_width": tw,
                "out_height": th,
            })

    images = media.where(F.col("media_type") == "image") \
        .select("media_id", "payload")
    return images.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms)
    at the requested cadence — pure column math on the duration
    metadata (no payload touched); the decode of each planned frame is
    the same kernel boundary as decode_image."""
    n_frames = (F.col("duration_ms") / every_ms).cast("long") + 1
    return (
        media.where((F.col("media_type") == "video")
                    & F.col("duration_ms").isNotNull())
        .select("media_id",
                F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 30_000,
                     overlap_ms: int = 1_000) -> DataFrame:
    """Audio chunking plan: overlapping windows over the duration
    metadata — one row per (media_id, chunk_start_ms, chunk_end_ms),
    stepping chunk_ms - overlap_ms so consecutive chunks share
    overlap_ms (the usual ASR shape so no utterance is cut at every
    boundary). Pure column math on metadata; decoding each planned
    chunk is the same stubbed kernel boundary as decode_audio."""
    if not 0 <= overlap_ms < chunk_ms:
        raise ValueError("need 0 <= overlap_ms < chunk_ms")
    step = chunk_ms - overlap_ms
    return (
        media.where((F.col("media_type") == "audio")
                    & (F.col("duration_ms") > 0))
        .select(
            "media_id", "duration_ms",
            # Last start is capped at duration - overlap - 1: a start
            # inside the final chunk's overlap tail would produce a
            # chunk fully contained in its predecessor (zero new
            # audio, one wasted decode).
            F.explode(
                F.sequence(F.lit(0).cast("long"),
                           F.greatest(
                               F.col("duration_ms") - (overlap_ms + 1),
                               F.lit(0).cast("long")),
                           F.lit(step).cast("long"))).alias("chunk_start_ms"))
        .select(
            "media_id", "chunk_start_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms,
                    F.col("duration_ms")).alias("chunk_end_ms"))
    )


PHASH_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("phash", LongType()),
])


def perceptual_hash_bytes(data: bytes, n_bits: int = 64) -> int:
    """Average-hash over 64 evenly-sampled byte positions: bit i set
    iff the sampled byte is >= the payload's mean byte value. On the
    real path the same formula runs over decoded grayscale pixels
    (PIL resize to 8x8), which is the classical aHash; on the fake
    path it runs over the encoded bytes — still locality-sensitive
    (a small payload edit flips few sampled bits), which is what the
    dedup plumbing needs and what the SQL oracle mirrors exactly."""
    n = len(data)
    if n == 0:
        return 0
    mean = sum(data) / n  # double division, IEEE-identical in SQL
    h = 0
    for i in range(n_bits):
        if data[(i * n) // n_bits] >= mean:
            h |= 1 << i
    # keep the sign bit clear so cross-engine integer semantics never
    # involve negative hashes (bit 63 unused: 63 sampled positions
    # of signal is plenty for near-dup blocking)
    return h & ((1 << 63) - 1)


def image_phash(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, phash): perceptual hash per image row via the same
    Arrow kernel boundary as `image_features`. Real path: PIL 8x8
    grayscale resize, aHash over the 64 pixels; fake path (oracle-
    mirrored): aHash over the encoded payload bytes."""

    def one(payload: bytes) -> int:
        if not fake:
            pil = _pil_image()
            if pil is None:
                raise NotImplementedError(
                    "image decoding requires an image codec library "
                    "(PIL); pass fake=True for the byte-level stand-in")
            import io

            with pil.open(io.BytesIO(payload)) as im:
                px = im.convert("L").resize((8, 8)).tobytes()
            return perceptual_hash_bytes(px)
        return perceptual_hash_bytes(payload)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": [one(p) for p in pdf["payload"]],
            })

    images = media.where(F.col("media_type") == "image") \
        .select("media_id", "payload")
    return images.mapInPandas(kernel, PHASH_SCHEMA)
