"""Deterministically synthesize an sf1 (10x sf0.1) table set for the
scale-evidence run (VERDICT round-4 #5).

/root/testdata is read-only and tops out at sf0.1, so sf1 is built by
key-strided replication of sf0.1 into $OUT (default /tmp/ecokg_sf1):

- 10 copies of every fact/dim row; copy i offsets every join key by
  i * STRIDE, so referential integrity (customer<-orders<-lineitem,
  part/supplier<-lineitem) is preserved while key cardinality scales
  10x — the right model for a corpus that grew 10x, as opposed to
  hotter keys.
- ``documents.text`` is word-rotated per copy (pure Catalyst: split +
  slice + concat_ws), so copies are NOT near-duplicates of each other
  and the dedup rows' candidate volume stays linear in corpus size —
  replicating verbatim would synthesize a 10x-duplicate corpus and
  measure a different (quadratic-candidate) workload, not scale-up.
- ``embeddings.embedding`` is position-rotated per copy (norm-preserving,
  direction-changing), keeping ANN/cosine workloads non-degenerate.
- region/nation are dimensions and stay as-is.

Everything runs as Spark jobs (no driver-side rows); output is parquet
with the same table names, so ``SPARK_GRAFT_SF_DIR=$OUT python bench.py``
benchmarks the identical query set at 10x scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from ecokg_spark.session import get_spark

SRC = os.environ.get("ECOKG_SF01_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("ECOKG_SF1_DIR", "/tmp/ecokg_sf1")
COPIES = int(os.environ.get("ECOKG_SF1_COPIES", "10"))
STRIDE = 10_000_000  # > any sf0.1 key; offsets stay BIGINT-safe

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, table: str) -> DataFrame:
    copies = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("_copy")
    out = df.select("*", copies)
    for k in KEY_COLS.get(table, []):
        out = out.withColumn(k, (F.col(k) + F.col("_copy") * F.lit(STRIDE)).cast("long"))
    if table == "documents":
        # rotate the word sequence by a per-copy offset so copies are not
        # near-duplicates (keeps MinHash/SimHash candidate volume linear)
        w = F.split(F.col("text"), " ")
        n = F.greatest(F.size(w), F.lit(1))
        k = F.pmod(F.col("_copy") * F.lit(17) + F.lit(3), n)
        rotated = F.concat(
            F.slice(w, k + F.lit(1), (n - k).cast("int")),
            F.slice(w, F.lit(1), k.cast("int")),
        )
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", rotated)),
        ).withColumn("n_chars", F.length("text"))  # rotation may renormalize whitespace
    if table == "embeddings":
        e = F.col("embedding")
        n = F.size(e)
        k = F.pmod(F.col("_copy"), n)
        out = out.withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, e).otherwise(
                F.concat(
                    F.slice(e, k + F.lit(1), (n - k).cast("int")),
                    F.slice(e, F.lit(1), k.cast("int")),
                )
            ),
        )
    return out.drop("_copy")


def main() -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = df if t in ("region", "nation") else replicate(df, t)
        # a real 10x corpus arrives in ~10x the files; sf0.1 ships one file
        # per table, so write the replicated tables in 32 so scans get full
        # local[32] split parallelism instead of inheriting 1-2 input splits
        if t not in ("region", "nation"):
            out = out.repartition(32)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(t, "->", spark.read.parquet(f"{OUT}/{t}.parquet").count(), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
