"""Incremental KG merge sink: stream micro-batches upsert into the
running merged edge/node tables via foreachBatch.

Completes the streaming story (fused ingest -> stateful ops -> HERE):
each micro-batch of new edges is deduplicated against the table built so
far — the streaming equivalent of the batch (s,p,o) merge aggregate
(operators/merge.py), with exactly-once delivery from the sink
checkpoint + idempotent anti-join-then-append writes:

  batch_n: new = batch.dropDuplicates(keys) ANTI-JOIN existing(keys)
           append(new)

A replayed micro-batch (failure between append and commit) re-runs the
anti-join against a table that already contains its rows, appending
nothing — idempotence without a transactional store. On Iceberg the same
hook body becomes a MERGE INTO; the anti-join form is the
format-agnostic fallback (same TableIO philosophy, io.py).

At scale the anti-join's build side is the EXISTING table keyed by
(s,p,o); bucket the table by subject (TableIO.write_bucketed) to keep the
probe co-located and exchange-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EDGE_KEYS = ["subject", "predicate", "object"]


def _existing_keys(spark, table_path: str, keys: list[str]):
    """The (key-projected) table built so far, or None before first write."""
    if os.path.exists(os.path.join(table_path, "_SUCCESS")) or any(
        f.endswith(".parquet") for f in (
            os.listdir(table_path) if os.path.isdir(table_path) else [])
    ):
        return spark.read.parquet(table_path).select(*keys)
    return None


def upsert_edges_batch(batch: DataFrame, table_path: str,
                       keys: list[str] | None = None) -> None:
    """foreachBatch body: append only (key-)new rows to `table_path`."""
    keys = keys or EDGE_KEYS
    spark = batch.sparkSession
    fresh = batch.dropDuplicates(keys)
    existing = _existing_keys(spark, table_path, keys)
    if existing is not None:
        fresh = fresh.join(existing, keys, "left_anti")
    fresh.write.mode("append").parquet(table_path)


def upsert_first_wins_batch(batch: DataFrame, table_path: str,
                            key: str, order_col: str) -> None:
    """foreachBatch body: DETERMINISTIC first-wins upsert — keep the
    order_col-minimal row per key within the batch, then append only
    key-new rows. When micro-batches arrive in ascending order_col ranges
    (a file source fed id-sorted files), the drained table holds exactly
    the GLOBAL order_col-min row per key — the streaming equivalent of
    the batch exact-dedup aggregate (operators/dedup.py exact_dedup).
    Same idempotence argument as upsert_edges_batch: a replayed batch
    anti-joins against a table that already has its keys."""
    spark = batch.sparkSession
    w = Window.partitionBy(key).orderBy(order_col)
    fresh = (batch.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))
    existing = _existing_keys(spark, table_path, [key])
    if existing is not None:
        fresh = fresh.join(existing, [key], "left_anti")
    fresh.write.mode("append").parquet(table_path)


def incremental_edge_merge(edge_stream: DataFrame, table_path: str,
                           checkpoint: str, timeout_s: int | None = None):
    """Drive an edge stream into a continuously merged table."""
    q = (
        edge_stream.writeStream.foreachBatch(
            lambda batch, _epoch: upsert_edges_batch(batch, table_path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def merge_hll_registers_batch(batch: DataFrame, table_path: str,
                              p: int = 12,
                              value_col: str = "v",
                              group_cols: list[str] | None = None) -> None:
    """foreachBatch body: fold a micro-batch into a RUNNING HLL register
    table (max per bucket) — the streaming face of the sketch's
    mergeability (operators/sketch.py): distinct-count state is a fixed
    2^p-row table regardless of stream length, where exact streaming
    COUNT(DISTINCT) state grows with the key universe.

    Append-only-compatible: the new register table is the max-combine of
    the batch's registers with the table so far, REWRITTEN atomically
    per batch (register tables are tiny — 2^p rows — so the rewrite is
    metadata-cheap; an Iceberg MERGE would do it in place). A replayed
    batch max-combines values already absorbed — idempotent, max is."""
    import os
    import shutil

    from ecokg_spark.operators.sketch import hll_registers

    spark = batch.sparkSession
    gcols = list(group_cols or [])
    regs = hll_registers(batch, value_col, p=p, group_cols=gcols)
    existing = _existing_keys(spark, table_path,
                              gcols + ["bucket", "register"])
    if existing is not None:
        regs = (regs.unionByName(existing)
                .groupBy(*gcols, "bucket")
                .agg(F.max("register").alias("register")))
    tmp = table_path + ".tmp"
    regs.coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(table_path):
        shutil.rmtree(table_path)
    os.rename(tmp, table_path)
