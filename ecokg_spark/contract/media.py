"""Multimodal rows: media metadata, image dims/resize, audio chunking, frame sampling (stdlib header decode, mapInPandas)."""

from __future__ import annotations

from pyspark.sql import functions as F
from ecokg_spark.contract._shared import t


def q_audio_chunks(spark, sf):
    """Audio chunk scheduling (operators/multimodal.py audio_chunk_plan):
    30 s chunks with 5 s overlap over synthesized per-doc durations
    (1-121 s from doc_id); last chunk clamps to the duration. Pure
    integer arithmetic — exact cross-engine."""
    from ecokg_spark.operators.multimodal import audio_chunk_plan

    d = t(spark, sf, "documents").select(
        "doc_id",
        (F.lit(1000) + (F.col("doc_id") * 7919) % 120000)
        .cast("long").alias("duration_ms"))
    return audio_chunk_plan(d, chunk_ms=30_000, overlap_ms=5_000)


SQL_AUDIO_CHUNKS = """
WITH d AS (
  SELECT doc_id, CAST(1000 + (doc_id * 7919) % 120000 AS BIGINT) AS dur
  FROM documents
),
n AS (
  SELECT doc_id, dur,
         1 + (greatest(dur - 30000, 0) + 24999) // 25000 AS n_chunks
  FROM d
)
SELECT doc_id,
       CAST(g.i AS BIGINT) AS chunk_idx,
       CAST(g.i * 25000 AS BIGINT) AS start_ms,
       CAST(least(g.i * 25000 + 30000, dur) AS BIGINT) AS end_ms
FROM n CROSS JOIN generate_series(0, 119) g(i)
WHERE g.i < n.n_chunks
"""


def q_media_features(spark, sf):
    """Codec-free byte-level feature extraction (multimodal
    'feature-extract' stage): length / mean byte / marker-byte stats over
    payloads synthesized from doc_id, recomputed by the oracle from the
    identical string construction."""
    from ecokg_spark.operators.multimodal import byte_features

    d = t(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("doc_id"), F.lit("-"),
                     F.repeat(F.lit("x"),
                              (F.col("doc_id") % 50 + 1).cast("int"))),
            "UTF-8").alias("payload"),
    )
    return byte_features(media).select(
        "media_id", "byte_len", "mean_byte", "n_marker", "frac_marker")


SQL_MEDIA_FEATURES = """
WITH p AS (
  SELECT doc_id AS media_id,
         'payload-' || CAST(doc_id AS VARCHAR) || '-'
             || repeat('x', CAST(doc_id % 50 + 1 AS INT)) AS s
  FROM documents
)
SELECT media_id,
       CAST(length(s) AS BIGINT) AS byte_len,
       CAST(list_sum(list_transform(string_split(s, ''),
                                    c -> ascii(c))) AS DOUBLE)
           / length(s) AS mean_byte,
       CAST(length(s) - length(replace(s, 'x', '')) AS BIGINT) AS n_marker,
       CAST(length(s) - length(replace(s, 'x', '')) AS DOUBLE)
           / length(s) AS frac_marker
FROM p
"""


def q_frame_sample(spark, sf):
    """Video frame-sampling plan (operators/multimodal.py
    frame_sample_plan): per-item durations and mixed frame rates derived
    from nation keys; every-24th frame, capped at 8 — all integer div
    arithmetic, exactly recomputable."""
    from ecokg_spark.operators.multimodal import frame_sample_plan

    n = t(spark, sf, "nation")
    media = n.select(
        F.col("n_nationkey").alias("doc_id"),
        (F.col("n_nationkey") * 700 + 300).alias("duration_ms"),
        (F.when(F.col("n_nationkey") % 3 == 0, 24)
          .when(F.col("n_nationkey") % 3 == 1, 30)
          .otherwise(60)).alias("fps"),
    )
    return frame_sample_plan(media, fps_col="fps", every_n=24,
                             max_frames=8)


SQL_FRAME_SAMPLE = """
WITH m AS (
  SELECT n_nationkey AS doc_id,
         n_nationkey * 700 + 300 AS duration_ms,
         CASE n_nationkey % 3 WHEN 0 THEN 24 WHEN 1 THEN 30
              ELSE 60 END AS fps
  FROM nation),
c AS (
  SELECT doc_id, fps,
         least((duration_ms * fps // 1000 + 23) // 24, 8) AS n
  FROM m),
x AS (SELECT doc_id, fps, n, unnest(range(0, n)) AS i FROM c WHERE n > 0)
SELECT doc_id, CAST(i * 24 AS BIGINT) AS frame_idx,
       CAST(i * 24 * 1000 // fps AS BIGINT) AS ts_ms,
       CAST(n AS BIGINT) AS n_sampled
FROM x
"""
