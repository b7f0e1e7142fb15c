"""Structured Streaming ingest: incremental KG construction over a growing
pages table.

The reference is batch-only (SURVEY.md §1.4) — this is a new capability:
pages arriving as parquet files stream through the SAME stage functions
(extract_pages / extract_triples are plain DataFrame->DataFrame, so they
compose with readStream unchanged), with a watermark on warc_ts bounding
state for the windowed page-rate aggregation.

At production scale the source would be an Iceberg/Kafka stream; the file
source has identical semantics for the exactly-once sink contract
(checkpointLocation + idempotent parquet append).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecokg_spark.operators.extract import extract_pages
from ecokg_spark.operators.triples import extract_triples
from ecokg_spark.schemas import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)  # bounded micro-batches
        .parquet(path)
    )


def streaming_triples(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> mention-triple stream (stateless: narrow UDF stages
    compose with streaming for free)."""
    return extract_triples(extract_pages(pages_stream))


def streaming_fused(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> fused audit+triples+combiner stream: the SAME
    single-pass mapInArrow operator as the batch pipeline
    (operators/fused.py) — stateless and narrow, so it composes with
    readStream unchanged. One micro-batch pass yields audit rows
    (sent_id=-1), triple rows (sent_id>=0) and the linking/edge combiner
    rows, exactly as in batch."""
    from ecokg_spark.operators.fused import fused_extract_triples

    return fused_extract_triples(pages_stream)


def page_rate(pages_stream: DataFrame) -> DataFrame:
    """Pages per 1-minute event-time window per lang, 10-minute watermark
    for late WARC records."""
    return (
        pages_stream.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "1 minute").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )


def run_stream_to_parquet(
    stream_df: DataFrame, out_path: str, checkpoint: str, timeout_s: int | None = None
):
    """Drive a stream to a parquet sink (exactly-once via checkpoint)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming deduplication: emit the FIRST row per key,
    with the dedup state EVICTED once the event-time watermark passes
    key-arrival + `delay` — Spark's dropDuplicatesWithinWatermark.

    This is the scale-complement of the foreachBatch first-wins merge
    sink (merge_sink.upsert_first_wins_batch): the sink form keeps the
    whole merged table as its dedup set (exact forever, unbounded probe),
    while this form bounds state to the watermark horizon — the right
    shape for infinite streams where duplicates arrive close together
    (retries, at-least-once upstream delivery). A duplicate arriving
    AFTER eviction passes through again; choose `delay` >= the upstream
    redelivery horizon.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys)
