"""Stream-stream windowed join (Structured Streaming).

The attribution primitive of an event pipeline: join two UNBOUNDED
streams (clicks x purchases, impressions x conversions, crawl-fetch x
parse-result) where the right event falls inside a bounded time window
after the left one. Spark's stream-stream inner join requires exactly
what this wrapper enforces — a watermark on BOTH sides plus a time-range
join condition — because together they bound the buffered state: each
side keeps only rows younger than (watermark + window), so state is
O(arrival rate x window), never O(stream length).

Semantics note: for an INNER join the watermark affects only state
eviction and late-data drops, not which in-window pairs match — so a
full availableNow replay of finite inputs produces exactly the batch
join, which is how the contract row (`join_stream`) oracles it against
DuckDB. Outer stream-stream joins additionally delay NULL-side emission
until the watermark passes; this module keeps to the inner form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_s: int = 1800,
    watermark_s: int = 3600,
) -> DataFrame:
    """Inner-join two streams on `key` where
    left_ts <= right_ts <= left_ts + window_s. Both inputs must carry
    distinct column names apart from `key` (rename upstream); both get a
    `watermark_s` watermark here (cast to TIMESTAMP first — parquet
    event times load as TIMESTAMP_NTZ, which watermarks reject).

    Returns left.* + right.* minus the right key column. Works on batch
    DataFrames too (watermark is a no-op there), which is what the
    batch-parity tests exploit.
    """
    window_s, watermark_s = int(window_s), int(watermark_s)
    if window_s <= 0 or watermark_s <= 0:
        raise ValueError(f"need positive window/watermark seconds; got "
                         f"{window_s=}, {watermark_s=}")
    lw = (left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
          .withWatermark(left_ts, f"{watermark_s} seconds"))
    rw = (right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
          .withWatermark(right_ts, f"{watermark_s} seconds")
          .withColumnRenamed(key, "_rkey"))
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop("_rkey")
