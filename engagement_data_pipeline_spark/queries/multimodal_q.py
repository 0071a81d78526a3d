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
