"""Multimodal column plumbing: opaque `binary` payloads + typed metadata.

The Spark-side machinery is real and tested — schema, partition-friendly
batch shape, Arrow UDF signatures over `mapInPandas` — while the actual
media decode is STUBBED (image/audio libs are not in this container):
`decode_image_stub` returns deterministic fake features derived from the
payload bytes, and `decode_image_real` raises NotImplementedError with the
integration point documented. Swapping in a real decoder changes ONE
function, not the plan.

Batch shape: mapInPandas with a bounded `maxRecordsPerBatch` so a batch of
(say) 10k x 1 MB images never materializes more than ~WORKER_MEM/8 at once;
media tables should be written with small row groups for the same reason.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, byte_len long, sha256 string, "
    "width int, height int, n_channels int"
)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Integration point for a real decoder (PIL / libvips / ffmpeg).
    Not available in this environment."""
    raise NotImplementedError(
        "real image decode requires an image library not present in this "
        "container; wire PIL.Image.open(io.BytesIO(payload)) here"
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from payload bytes —
    keeps the full pipeline testable end-to-end."""
    if not payload:
        return (0, 0, 0)
    w = 16 + (payload[0] % 64) * 16
    h = 16 + (payload[-1] % 64) * 16
    return (w, h, 3)


def extract_media_meta(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """(media_id, kind, byte_len, sha256, width, height, n_channels) via
    mapInPandas — the decode loop is per-batch Python over Arrow batches;
    hashing/len are recomputed JVM-side cheaply but kept here to show the
    one-pass batch pattern."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            dims = payloads.map(lambda b: decode_image_stub(bytes(b) if b is not None else b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": pdf[kind_col],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_channels": dims.map(lambda d: d[2]),
                }
            )

    return media.select(id_col, payload_col, kind_col).mapInPandas(
        batches, schema=MEDIA_META_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10,
                      duration_col: str = "n_frames") -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    pure `sequence` + `explode`, no decode needed to PLAN the work (the
    decode itself would be another mapInPandas over (media_id, frame_idx))."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id (expression-only, distributed)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("id"), F.lit("-"),
                     F.repeat(F.lit("x"), (F.col("id") % 50 + 1).cast("int"))),
            "UTF-8",
        ).alias("payload"),
        (F.col("id") % 100 + 1).cast("int").alias("n_frames"),
    )
