"""Similarity search over an embedding column (`array<float>`).

Three paths:

  brute_force_topk   exact cosine top-k: broadcast the (few) query vectors,
                     one narrow pass computes similarities JVM-side
                     (`zip_with` + `aggregate` — whole-stage codegen), then a
                     per-query window top-k. Baseline + verifier.

  lsh_topk           random-hyperplane (signed random projection) LSH.
                     Plane directions derive from xxhash64(dim, plane) —
                     deterministic, seedable, no stored model. Vectors land in
                     2^planes buckets per table; a query probes its bucket in
                     each of `tables` tables, unioned candidates re-ranked
                     exactly. At 1000 executors this is a bucket-partitioned
                     join instead of an all-pairs scan.

  ivf_topk           inverted-file index (the FAISS-IVF pattern): a small
                     centroid codebook is trained driver-side on a
                     deterministic hash-sample (Lloyd iterations in numpy),
                     the corpus is assigned to its nearest centroid with a
                     vectorized pandas UDF (one narrow pass — the "inverted
                     lists" are just a cluster column, bucket-joinable and a
                     natural partition/Z-order key for the stored table),
                     and each query probes its `n_probe` nearest lists.
                     n_probe == n_centroids degenerates to exact search
                     (used by the DuckDB-oracle contract entry); recall at
                     n_probe << n_centroids is asserted in tests.

For a 100 TB corpus, brute force is O(N·Q·d) but embarrassingly parallel and
shuffle-free until the final top-k (which reduces to k rows per query per
partition via partial sort); LSH/IVF trade recall for scanning only a
bucket/list fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import numpy as np
import pandas as pd
from pyspark.sql import functions as _F  # noqa: F401 (re-export convenience)
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_per_centroid: int = 40,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """L2-normalized centroid codebook from a DETERMINISTIC hash-sample.

    Sampling keys on xxhash64(id, seed) — reproducible on any cluster
    layout, no driver-side randomness. Lloyd iterations run in numpy on
    the (tiny) sample; empty clusters re-seed from the farthest points.
    The collect is bounded by n_centroids * sample_per_centroid rows."""
    target = n_centroids * sample_per_centroid
    n = corpus.count()
    p = max(n // max(target, 1), 1)
    # orderBy(hash, id) before limit: when the hash filter passes more than
    # `target` rows, a bare limit would keep whichever rows ARRIVE first
    # (partition-layout-dependent) — sorting by the hash value makes the
    # sample, and therefore the codebook, layout-invariant (ADVICE r2).
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    samp = (
        corpus.where(F.pmod(h, F.lit(p)) == 0)
        .select(F.col(vec_col).alias("_v"), h.alias("_h"), F.col(id_col).alias("_i"))
        .orderBy("_h", "_i")
        .limit(target)
        .select("_v")
        .collect()
    )
    X = np.array([r[0] for r in samp], dtype="float64")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    # deterministic init: order by xxhash-sample order, take first k
    C = X[:k].copy()
    for _ in range(iters):
        sims = X @ C.T                      # cosine == dot on unit vectors
        assign = sims.argmax(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
            else:  # re-seed dead centroid from the worst-covered point
                C[c] = X[sims.max(axis=1).argmin()]
    return C


def _assign_udf(centroids: np.ndarray):
    C = centroids.astype("float64")

    @pandas_udf(T.IntegerType())
    def assign(vec: pd.Series) -> pd.Series:
        X = np.stack(vec.to_numpy())
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ C.T).argmax(axis=1).astype("int32"))

    return assign


def assign_ivf_cluster(
    df: DataFrame, centroids: np.ndarray,
    vec_col: str = "embedding", out_col: str = "cluster",
) -> DataFrame:
    """+ `out_col`: nearest-centroid id (vectorized matmul per Arrow batch).
    The cluster column is the inverted-list key — bucket/partition the
    stored table by it for list-pruned scans."""
    return df.withColumn(out_col, _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via inverted lists: candidates = corpus rows whose
    cluster is among each query's `n_probe` nearest centroids; exact
    cosine re-rank. n_probe >= n_centroids is exhaustive (exact)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, id_col, vec_col, seed=seed)
    c = assign_ivf_cluster(
        _norm_cols(corpus, id_col, vec_col, "c"), centroids, "c_vec", "cluster")

    q = _norm_cols(queries, id_col, vec_col, "q")
    n_probe = min(n_probe, len(centroids))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vec: pd.Series) -> pd.Series:
        X = np.stack(vec.to_numpy())
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ centroids.astype("float64").T), axis=1)
        return pd.Series(list(order[:, :n_probe].astype("int32")))

    q_b = q.select(
        "q_id", "q_vec", F.explode(probe(F.col("q_vec"))).alias("cluster"))
    cand = c.join(F.broadcast(q_b), "cluster").select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("vec_id"),
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def int8_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Integer top-k retrieval over int8-quantized embeddings — the
    serving-side payoff of int8_quantize: similarity = the INTEGER dot
    product of quantized vectors, summed exactly as BIGINTs, so the
    ranking is bit-for-bit reproducible on any engine (float cosine
    rankings need the round-before-rank discipline; integer dots need
    nothing). The standard recall trade: int8 dot ordering ~ cosine
    ordering up to quantization error.

    Both sides quantize with int8_quantize; queries (few, by contract)
    broadcast. One WindowGroupLimit partial top-k per query key over
    (dot DESC, id ASC). Returns (query_id, vec_id, dot, rank).
    """
    from ecokg_spark.operators.embed import int8_quantize

    corpus_q = int8_quantize(df, vec_col, id_col).select(
        F.col(id_col), F.col("qvec"))
    query_q = int8_quantize(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("_qq"))
    j = corpus_q.crossJoin(F.broadcast(query_q)).where(
        F.col(id_col) != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with("qvec", "_qq",
                   lambda a, b: (a.cast("long") * b.cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col(id_col).asc())
    return (
        j.select("query_id", id_col, dot.alias("dot"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "dot",
                F.col("rank").cast("int").alias("rank"))
    )
