"""Sequence packing for LLM pretraining: concat-and-chunk (the GPT-style
scheme — documents concatenate into one token stream per shard, the stream
cuts into fixed-length contexts, a document crossing a cut contributes to
both neighboring contexts).

The packing itself is pure arithmetic over a running token offset: a
window cumsum in deterministic order (md5(id), id — layout-independent),
then each document explodes to the chunk indices its token interval
covers. Integer-exact end to end, so an oracle recomputes every (doc,
chunk, slice) assignment.

100-TB shape: a GLOBAL running offset is inherently sequential, so
production packing is per-shard (`shard_col`) — each shard's window
cumsum runs in its own partition and shards pack independently (what
training-data pipelines do anyway: one packed stream per input shard /
worker). Without a shard column the window is a single partition — fine
for tests, explicitly NOT the cluster shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context_len: int = 2048,
    shard_col: str | None = None,
) -> DataFrame:
    """One row per (document, context chunk) it occupies:
    (shard?, chunk_idx, id, begin_tok, end_tok) — the document's token
    slice lands at [begin_tok, end_tok) inside chunk chunk_idx (0-based
    per shard). Zero/negative-token documents are dropped. Deterministic
    concat order: (md5(id), id) within each shard."""
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    gcols = [shard_col] if shard_col else []
    n = F.col(n_tokens_col).cast("long")
    d = df.where(n > 0).select(
        *gcols, F.col(id_col), n.alias("_n"),
        F.md5(F.col(id_col).cast("string")).alias("_h"))
    w = (Window.partitionBy(*gcols) if gcols else Window.partitionBy()
         ).orderBy("_h", id_col)
    d = d.withColumn("_end", F.sum("_n").over(w))
    d = d.withColumn("_start", F.col("_end") - F.col("_n"))
    # integer `div`, not double division — per-shard stream offsets can
    # legitimately exceed 2^53 tokens at extreme scale, where a double
    # quotient rounds
    first = F.expr(f"_start div {context_len}")
    last = F.expr(f"(_end - 1) div {context_len}")
    out = d.select(
        *gcols, id_col, "_start", "_end",
        F.explode(F.sequence(first, last)).alias("chunk_idx"))
    begin = F.greatest(F.col("_start") - F.col("chunk_idx")
                       * F.lit(context_len), F.lit(0))
    end = F.least(F.col("_end") - F.col("chunk_idx") * F.lit(context_len),
                  F.lit(context_len))
    return out.select(
        *gcols, F.col("chunk_idx").cast("long").alias("chunk_idx"),
        id_col,
        begin.cast("long").alias("begin_tok"),
        end.cast("long").alias("end_tok"))
