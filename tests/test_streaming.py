"""Structured Streaming ingest: file-source pages stream through the same
extraction stages; windowed page-rate agg."""

import pytest

from ecokg_spark.sources.pages import synth_pages
from ecokg_spark.streaming.ingest import (
    page_rate,
    read_pages_stream,
    run_stream_to_parquet,
    streaming_triples,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream") / "pages"
    synth_pages(spark, 120).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_stream_extract_matches_batch(spark, pages_dir, tmp_path):
    from ecokg_spark.operators.extract import extract_pages
    from ecokg_spark.operators.triples import extract_triples

    stream = read_pages_stream(spark, pages_dir)
    assert stream.isStreaming
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stream_to_parquet(streaming_triples(stream), out, ck, timeout_s=120)
    got = spark.read.parquet(out).count()
    batch = extract_triples(extract_pages(spark.read.parquet(pages_dir))).count()
    assert got == batch > 0


def test_stream_fused_matches_batch(spark, pages_dir, tmp_path):
    """The fused single-pass operator runs unchanged under Structured
    Streaming; the drained stream's rows equal the batch fused output."""
    from pyspark.sql import functions as F

    from ecokg_spark.operators.fused import fused_extract_triples
    from ecokg_spark.streaming.ingest import streaming_fused

    stream = read_pages_stream(spark, pages_dir)
    out = str(tmp_path / "fused")
    ck = str(tmp_path / "fck")
    run_stream_to_parquet(streaming_fused(stream), out, ck, timeout_s=120)
    got = spark.read.parquet(out)
    batch = fused_extract_triples(spark.read.parquet(pages_dir))
    # audit + triple rows match exactly; combiner rows (sent_id=-2/-3) are
    # batch-boundary-dependent by design, so compare their DISTINCT sets
    for kinds, distinct in ((F.col("sent_id") >= -1, False),
                            (F.col("sent_id") < -1, True)):
        g, b = got.where(kinds), batch.where(kinds)
        if distinct:
            g, b = g.distinct(), b.distinct()
        assert g.exceptAll(b).count() == 0
        assert b.exceptAll(g).count() == 0


def test_page_rate_window(spark, pages_dir, tmp_path):
    stream = read_pages_stream(spark, pages_dir)
    out = str(tmp_path / "rate")
    ck = str(tmp_path / "rck")
    q = (
        page_rate(stream).writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append-mode windows only emit once the watermark passes; with a bounded
    # historical corpus all windows close when the stream drains
    rates = spark.read.parquet(out)
    assert set(rates.columns) == {"window_start", "lang", "n_pages"}
