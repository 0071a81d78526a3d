"""Registry queries for the multimodal plumbing (brief §multimodal):
MM frame-sampling plan (pure metadata math — exact oracle) and the
Arrow-batched image-feature kernel over deterministic fake payloads
(the rolling-hash fake decode is reproduced in SQL, so even the
mapInPandas path gets an exact value-hash oracle).

The media fixture derives from `events`: event_id % 3 → video /
image / audio, payload = utf-8 bytes of 'payload-<event_id>'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..training.multimodal import (
    audio_chunk_plan,
    frame_sample_plan,
    image_features,
)
from ._helpers import apply_runtime_conf

_EVERY_MS = 1000


def _media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    mtype = (F.when(F.col("event_id") % 3 == 0, "video")
             .when(F.col("event_id") % 3 == 1, "image")
             .otherwise("audio"))
    dur = F.when(F.col("event_id") % 3 != 1,
                 (F.col("event_id") % 7) * 997 + 100).cast("long")
    return ev.select(
        F.concat(F.lit("media-"), F.col("event_id").cast("string")).alias("media_id"),
        mtype.alias("media_type"),
        F.lit(None).cast("string").alias("mime_type"),
        F.encode(F.concat(F.lit("payload-"), F.col("event_id").cast("string")),
                 "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        dur.alias("duration_ms"),
    )


def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan at 1 fps over the media fixture —
    metadata-only column math, payload never touched."""
    return frame_sample_plan(_media_fixture(spark, sf_dir), every_ms=_EVERY_MS)


MM_FRAME_PLAN_SQL = f"""
WITH media AS (
  SELECT 'media-' || CAST(event_id AS VARCHAR) AS media_id,
         (event_id % 7) * 997 + 100 AS duration_ms
  FROM events WHERE event_id % 3 = 0
)
SELECT media_id, frame_idx, frame_idx * {_EVERY_MS} AS frame_ts_ms
FROM media, UNNEST(generate_series(0, duration_ms // {_EVERY_MS})) AS t(frame_idx)
"""


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas feature kernel over the image rows (fake
    decode: deterministic rolling hash of the payload bytes)."""
    return image_features(_media_fixture(spark, sf_dir), target=(224, 224))


MM_IMAGE_FEATURES_SQL = """
WITH img AS (
  SELECT 'media-' || CAST(event_id AS VARCHAR) AS media_id,
         'payload-' || CAST(event_id AS VARCHAR) AS s
  FROM events WHERE event_id % 3 = 1
)
SELECT media_id,
       CAST(strlen(s) AS BIGINT) AS n_bytes,
       CAST(list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           list_transform(generate_series(1, least(64, strlen(s))),
                          i -> CAST(ord(substr(s, i, 1)) AS HUGEINT))),
         (a, b) -> (a * 131 + b) % 2305843009213693952) AS BIGINT) AS feat_hash,
       224 AS out_width, 224 AS out_height
FROM img
"""


_CHUNK_MS = 3000
_OVERLAP_MS = 500


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk plan (3s windows, 0.5s overlap) over the media
    fixture — metadata-only column math, payload never touched."""
    return audio_chunk_plan(_media_fixture(spark, sf_dir),
                            chunk_ms=_CHUNK_MS, overlap_ms=_OVERLAP_MS)


MM_AUDIO_CHUNKS_SQL = f"""
WITH media AS (
  SELECT 'media-' || CAST(event_id AS VARCHAR) AS media_id,
         (event_id % 7) * 997 + 100 AS duration_ms
  FROM events WHERE event_id % 3 = 2
)
SELECT media_id, chunk_start_ms,
       LEAST(chunk_start_ms + {_CHUNK_MS}, duration_ms) AS chunk_end_ms
FROM media,
     UNNEST(generate_series(0, GREATEST(duration_ms - {_OVERLAP_MS + 1}, 0),
                            {_CHUNK_MS - _OVERLAP_MS})) AS t(chunk_start_ms)
"""


# --- perceptual-hash image near-dup ---------------------------------------
#
# Fixture with REAL near-duplicate structure: 64-byte payloads over a
# bimodal {a,z} alphabet, pattern keyed on a well-mixed group hash;
# odd-parity members flip exactly two positions, so intra-group pairs
# sit at hamming distance 0 or 2 and unrelated groups ~32 bits apart.
# The byte-level aHash (training/multimodal.py:perceptual_hash_bytes)
# is mirrored in SQL; the oracle finds pairs by BRUTE FORCE, so the
# hash match certifies the banded join's pigeonhole-exact recall.

def _phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..training.dedup import md5_long

    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 3 == 1)
    grp = (F.col("event_id") / 24).cast("long")
    par = (F.col("event_id") % 2 == 1)
    # base pattern = the group's md5 bits: i.i.d. across groups, so
    # unrelated groups sit ~30 bits apart (no accidental near-dups —
    # a linear congruential pattern here correlated adjacent groups
    # and produced 27x more pairs)
    gh = md5_long(grp.cast("string"))
    chars = []
    for j in range(64):
        base = (F.shiftrightunsigned(gh, j).bitwiseAND(F.lit(1)) == 1
                if j < 60 else F.lit(False))
        flip = F.lit(j in (10, 40)) & par
        chars.append(F.when(base != flip, F.lit("z")).otherwise(F.lit("a")))
    return ev.select(
        F.concat(F.lit("media-"), F.col("event_id").cast("string"))
        .alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.concat(*chars), "UTF-8").alias("payload"))


def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: aHash per image via the Arrow
    kernel, then all pairs within hamming distance 3 via the banded
    join (training/dedup.py:hamming_pairs — exact by pigeonhole, so
    the brute-force oracle is the ground truth it must equal)."""
    from ..training.dedup import hamming_pairs
    from ..training.multimodal import image_phash

    hashed = image_phash(_phash_media(spark, sf_dir))
    return hamming_pairs(hashed, "media_id", "phash",
                         max_dist=3, n_bands=4)


_PH_GH_SQL = ("CAST(('0x' || substr(md5(CAST(event_id // 24 AS VARCHAR)), "
              "1, 15)) AS BIGINT)")

_PH_BYTES_SQL = f"""list_transform(generate_series(0, 63), j ->
      CASE WHEN (j < 60 AND (({_PH_GH_SQL} >> j) & 1) = 1)
                != (event_id % 2 = 1 AND (j = 10 OR j = 40))
           THEN 122 ELSE 97 END)"""

MM_PHASH_PAIRS_SQL = f"""
WITH img AS (
  SELECT 'media-' || CAST(event_id AS VARCHAR) AS media_id,
         {_PH_BYTES_SQL} AS bytes
  FROM events WHERE event_id % 3 = 1
),
ph AS (
  SELECT media_id,
         (SELECT COALESCE(SUM(CASE WHEN bytes[i + 1]
                        >= CAST(list_sum(bytes) AS DOUBLE) / 64
                   THEN CAST(1 AS BIGINT) << i ELSE 0 END), 0)
          FROM generate_series(0, 62) t(i)) AS phash
  FROM img
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS dist
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""
