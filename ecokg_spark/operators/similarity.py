"""Similarity search over an embedding column (`array<float>`).

Two paths:

  brute_force_topk   exact cosine top-k: broadcast the (few) query vectors,
                     one narrow pass computes similarities JVM-side
                     (`zip_with` + `aggregate` — whole-stage codegen), then a
                     per-query window top-k. Baseline + verifier.

  lsh_topk           scale path: random-hyperplane (signed random projection)
                     LSH. Plane directions derive from xxhash64(dim, plane) —
                     deterministic, seedable, no stored model. Vectors land in
                     2^planes buckets per table; a query probes its bucket in
                     each of `tables` tables, unioned candidates re-ranked
                     exactly. At 1000 executors this is a bucket-partitioned
                     join instead of an all-pairs scan.

For a 100 TB corpus, brute force is O(N·Q·d) but embarrassingly parallel and
shuffle-free until the final top-k (which reduces to k rows per query per
partition via partial sort); LSH trades recall for a ~(buckets/2^planes)
scan fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecokg_spark.operators.dedup import cosine, rp_bucket


def _norm_cols(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).cast("array<double>").alias(f"{prefix}_vec"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact top-k by cosine, ties broken by
    corpus id for determinism. `queries` is broadcast (small side)."""
    c = _norm_cols(corpus, id_col, vec_col, "c")
    q = _norm_cols(queries, id_col, vec_col, "q")
    sims = c.crossJoin(F.broadcast(q)).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("vec_id"),
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidates, exact re-rank.

    `dim` is accepted for API compatibility but unused: the bucket
    expression derives its index range from size(vec) at execution time
    (operators.dedup.rp_bucket), so building this plan never runs a
    driver-side action against the corpus."""
    del dim
    c = _norm_cols(corpus, id_col, vec_col, "c")
    q = _norm_cols(queries, id_col, vec_col, "q")
    c_b = c.select(
        "c_id", "c_vec",
        F.posexplode(F.array(*[rp_bucket(F.col("c_vec"), planes, t) for t in range(tables)]))
        .alias("table_idx", "bucket"),
    )
    q_b = q.select(
        "q_id", "q_vec",
        F.posexplode(F.array(*[rp_bucket(F.col("q_vec"), planes, t) for t in range(tables)]))
        .alias("table_idx", "bucket"),
    )
    cand = (
        c_b.join(F.broadcast(q_b), ["table_idx", "bucket"])
        .dropDuplicates(["q_id", "c_id"])
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("vec_id"),
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
