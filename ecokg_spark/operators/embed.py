"""Model-free document embeddings: hashed bag-of-words (feature hashing).

The embedding-based operators (cosine top-k, ANN, embedding/semantic
dedup) assume an `array<float>` column exists. Real pipelines get it from
a neural encoder; this operator provides the classic model-free baseline —
the hashing trick (Weinberger et al. 2009): token -> hash bucket, count,
L2-normalize. The result is a genuine sparse-BoW cosine space (hash
collisions add noise bounded by dims), good enough to drive near-dup
detection and similarity search end-to-end WITHIN the engine, with zero
external artifacts — and it exercises the exact plumbing a learned
encoder would need (per-doc dense `array<double>`, unit-norm).

100-TB shape: one (id, bucket) hash aggregate — repeated tokens collapse
map-side, hot-token skew never reaches a single reducer — then one
per-doc aggregate whose input is <= dims rows per document. Everything is
whole-stage-codegen Catalyst; no UDFs, no driver state, no vocabulary
table (that is the point of the hashing trick: the "vocabulary" is the
hash function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecokg_spark.functions.text import normalize_ws


def hashed_bow_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id_col, embedding: array<double>) — L2-normalized hashed
    bag-of-words. Empty/blank documents embed as the zero vector (callers
    gate on it; a NaN vector would poison every cosine downstream).

    ``portable=False`` (default) buckets with xxhash64 — JVM codegen, the
    production path. ``portable=True`` buckets with the repo's md5 spec
    (first 15 hex chars base-16, mod dims) so a SQL oracle recomputes the
    identical vectors verbatim (same certify-the-real-plan idea as
    minhash_banded / simhash's md5 specs).
    """
    tok = F.explode(F.split(normalize_ws(text_col), " ")).alias("_tk")
    toks = df.select(F.col(id_col), tok).where(F.col("_tk") != "")
    if portable:
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("_tk")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(dims),
        )
    else:
        bucket = F.pmod(F.xxhash64("_tk"), F.lit(dims))
    counts = (
        toks.select(F.col(id_col), bucket.cast("int").alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.coalesce(F.element_at("_m", i), F.lit(0.0)),
    )
    # index-ordered sum -> identical float accumulation on any engine.
    # The norm is STAGED as its own column before the normalizing
    # transform: higher-order lambdas are interpreted with no CSE, so a
    # fold closed over inside the lambda would re-run once per element
    # (O(dims^2) per doc — the stage-the-column rule, functions/text.py).
    norm = F.sqrt(F.aggregate(
        "_v", F.lit(0.0), lambda acc, x: acc + x * x))
    vecs = (
        counts.groupBy(id_col)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("_b", "_c"))).alias("_m"))
        .select(F.col(id_col), dense.alias("_v"))
        .select(F.col(id_col), "_v", norm.alias("_n"))
        .select(
            F.col(id_col),
            F.when(
                F.col("_n") > 0,
                F.transform("_v", lambda x: x / F.col("_n")),
            ).otherwise(F.col("_v")).alias("embedding"),
        )
    )
    # tokenless documents dropped by the explode get the zero vector back
    zero = F.transform(F.sequence(F.lit(0), F.lit(dims - 1)),
                       lambda _: F.lit(0.0))
    return (
        df.select(F.col(id_col))
        .join(vecs, id_col, "left")
        .select(F.col(id_col),
                F.coalesce("embedding", zero).alias("embedding"))
    )


def group_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    decimal_scale: int = 18,
) -> DataFrame:
    """Per-group centroid (mean vector) of an embedding column — the
    class-mean / cluster-update primitive (k-means update step, SemDeDup
    cluster centers, per-domain embedding profiles).

    Cross-engine-exact aggregation: each float component converts to its
    SHORTEST decimal string (both engines print the same Ryu round-trip
    repr for the same float) and then to DECIMAL(38, `decimal_scale`),
    so the per-dimension sum is exact integer arithmetic (no float
    accumulation-order drift and no engine-specific float->decimal
    rounding); the single mean division back to double goes THROUGH the
    decimal's string form, so it is the correctly-rounded strtod result
    on every engine — bit-identical, no post-hoc ROUND needed (the
    oracle replays the same staging verbatim). Components below ~1e-10
    would need more than `decimal_scale` places and round — fine for
    unit-scale embeddings. Shape:
    posexplode to (group, dim, value) -> ONE map-side-combinable shuffle
    on (group, dim) -> sort-free array rebuild via array_agg over a
    dim-ordered window-free groupBy (collect_list after an explicit
    sort_array on (dim, mean) structs). Returns (group_col, n_vectors,
    centroid array<double>)."""
    dims = df.select(
        F.col(group_col), F.posexplode(vec_col).alias("dim", "v"))
    per_dim = dims.groupBy(group_col, "dim").agg(
        F.sum(F.col("v").cast("string")
              .cast(f"decimal(38,{decimal_scale})")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    # decimal->double must go THROUGH THE STRING FORM: the fixed-scale
    # decimal string is engine-identical and strtod is correctly rounded
    # everywhere, while native decimal->double conversion differs in the
    # last ulp (and any post-hoc ROUND differs on exact ties: Spark
    # HALF_UP vs DuckDB HALF_EVEN)
    mean = (F.col("_s").cast("string").cast("double")
            / F.col("_n")).alias("_m")
    return (
        per_dim.select(group_col, "dim", mean, "_n")
        .groupBy(group_col)
        .agg(
            F.max("_n").cast("long").alias("n_vectors"),
            F.array_sort(F.collect_list(F.struct("dim", "_m"))).alias("_p"),
        )
        .select(
            group_col, "n_vectors",
            F.transform("_p", lambda x: x["_m"]).alias("centroid"),
        )
    )


def _assign_clusters(df, vec_col, id_col, centroids, round_to):
    """Map-side nearest-centroid assignment against a literal centroid
    list: per row, an array of (dist, cid) structs whose array_min is the
    lexicographic argmin — distance first, cid as the tie-break. Squared
    distance is a strict LEFT fold (F.aggregate) over the zipped
    difference squares, so any engine replaying the same op order gets
    bit-identical doubles; the ROUND to `round_to` dp then guards the
    comparison (the float-before-ranking discipline)."""
    v = F.col(vec_col).cast("array<double>")
    entries = []
    for cid, cent in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in cent])
        d = F.round(
            F.aggregate(
                F.zip_with(v, lit_c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x),
            round_to)
        entries.append(F.struct(d.alias("d"), F.lit(cid).alias("c")))
    best = F.array_min(F.array(*entries))
    return df.select(
        F.col(id_col), F.col(vec_col),
        best["c"].cast("int").alias("cluster"),
        best["d"].alias("dist"),
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iterations: int = 2,
    round_to: int = 9,
) -> DataFrame:
    """Deterministic distributed Lloyd k-means over an embedding column —
    the clustering primitive behind IVF index training, SemDeDup cluster
    partitioning, and topic-balanced corpus mixing. Returns the final
    assignment (id_col, vec_col, cluster, dist) after a FIXED number of
    update rounds (fixed rounds = the deterministic termination choice,
    as in label_propagation).

    Determinism, with no RNG anywhere: seeds are the k vectors whose ids
    hash smallest (md5 order, id tie-break — a global top-k, which Spark
    plans as TakeOrderedAndProject, never a full sort); assignment
    argmin orders by (rounded dist, cid); the update step is
    group_centroids' exact decimal-staged mean, so centroid drift cannot
    accumulate float nondeterminism across rounds. A cluster that loses
    all members keeps its previous centroid (the restart-free convention).

    Scale shape: per round, assignment is MAP-SIDE ONLY (centroids ride
    the plan as literals — k * dims doubles), and the update is
    group_centroids' single (cluster, dim) map-side-combinable shuffle.
    Driver state is bounded at k rows per round (seed take(k) + centroid
    collect — the IVF bounded-training-sample precedent, see SCALE.md).
    """
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"kmeans_lloyd: need >= {k} rows, got {len(seeds)}")
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(iterations):
        assigned = _assign_clusters(df, vec_col, id_col, centroids, round_to)
        rows = group_centroids(
            assigned, vec_col=vec_col, group_col="cluster").collect()
        new = {r["cluster"]: [float(x) for x in r["centroid"]] for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return _assign_clusters(df, vec_col, id_col, centroids, round_to)


def int8_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the embedding-export
    format ANN serving stacks consume (4x smaller than float32, dot
    products in integer SIMD): q_i = round(127 * x_i / max_abs(x)),
    scale = max_abs/127 reconstructs x ~ q * scale. Zero vectors
    quantize to all-zero with scale 0.

    Catalyst-only: max_abs via one fold (max of doubles is order-
    independent and exact), the quantized array via transform; the
    integer rounding is floor(x + 0.5) — ties resolve toward +infinity
    IDENTICALLY in every engine, where ROUND would split between
    HALF_UP (Spark) and HALF_EVEN (DuckDB) on exact midpoints. Scale is
    emitted rounded. Fanout-free — rides the scan. Returns
    (id_col, scale, qvec array<int>).
    """
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.aggregate(
        v, F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)))
    df2 = df.select(F.col(id_col), v.alias("_v"),
                    max_abs.alias("_m"))
    q = F.when(
        F.col("_m") > 0,
        F.transform("_v", lambda x: F.floor(
            F.lit(127.0) * x / F.col("_m") + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform("_v", lambda x: F.lit(0)))
    return df2.select(
        id_col,
        F.round(F.col("_m") / 127.0, decimals).alias("scale"),
        q.alias("qvec"),
    )
