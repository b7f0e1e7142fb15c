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


def chunk_sliding(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
):
    """Sliding-window token chunking with overlap — the retrieval/context-
    window prep pass (RAG indexing, long-doc embedding): each document
    yields ceil-spaced windows of `size` whitespace tokens every `stride`
    tokens, so consecutive chunks overlap by size - stride and the final
    window always reaches the last token. Complements pack_sequences
    (which concatenates ACROSS documents with no overlap; this slides
    WITHIN a document).

    Returns (id_col, chunk_idx, n_tokens, chunk_text); empty/blank
    documents yield no rows. chunk_idx counts from 0; n_tokens < size
    only on the final window of a short tail.

    Scale shape: pure Catalyst — tokenize once, compute the chunk count
    with integer `div` (a double quotient would round past 2^53), explode
    a 0..n_chunks-1 sequence, and slice the token array per index. The
    fanout pipelines with the scan (no shuffle at all); output order is
    deterministic per (id, chunk_idx). Expected blowup is size/stride
    (~1.33x at 64/48), the same class as the shingle explode.
    """
    if not 0 < stride <= size:
        raise ValueError(f"need 0 < stride <= size, got {stride}/{size}")
    from ecokg_spark.functions.text import normalize_ws

    norm = normalize_ws(F.col(text_col))
    toks = F.split(norm, " ")
    n = F.size(toks)
    n_chunks = (
        F.expr(f"(greatest(_n - {size}, 0) + {stride - 1}) div {stride}") + 1
    )
    base = (
        df.select(F.col(id_col), toks.alias("_t"), n.alias("_n"))
        .where((F.col("_n") > 0) & (F.length(F.element_at("_t", 1)) > 0))
        .withColumn("_nc", n_chunks)
    )
    idx = F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx")
    chunk = F.slice(
        F.col("_t"), F.col("chunk_idx") * stride + 1, size)
    return (
        base.select(id_col, idx, "_t")
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )
