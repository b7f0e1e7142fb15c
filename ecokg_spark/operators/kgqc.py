"""KG schema-quality profiling: predicate cardinality + inverse detection.

The reference's merge phase (eco_kg merge_config + graph stats, see
operators/stats.py for the parity rollup) publishes a merged KGX graph but
leaves schema discovery to the consumer. At web scale, two QC questions
decide whether a constructed KG is usable before anything downstream runs:

  * predicate_profile — per-predicate cardinality: is `biolink:has_size`
    functional (every subject one object)?  Functional/inverse-functional
    flags are what entity-resolution keys and OWL axiom induction are
    built from (public precedent: OWL2 FunctionalProperty semantics,
    AMIE-style rule-mining support counts).
  * inverse_candidates — predicate pairs (p, q) where (s,p,o) co-occurs
    with (o,q,s): detects modelling redundancy (both directions asserted)
    and symmetric predicates (p == q) so the merge can canonicalize one
    direction. Confidence is plain rule support / head support, the
    AMIE/rule-mining convention.

Scale shape: both operators reduce the edge table to distinct (s,p,o)
first (one shuffle, map-side combine absorbs duplicate assertions), then
aggregate to a PREDICATE-sized result — thousands of rows from billions
of edges, so every join after the first distinct is broadcast-sized.
inverse_candidates' self-join keys on the reversed (subject, object)
composite — uniform after distinct; a hot (s,o) pair cannot exist by
construction. No UDFs; everything whole-stage codegen.

Cross-engine float discipline: counts stay BIGINT; ratios are
bigint/bigint divisions, which Spark's Divide and DuckDB's `/` both
evaluate as IEEE-754 double division — bit-identical, no rounding needed
(see verify-skill round-3 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_triples(edges: DataFrame, s: str, p: str, o: str) -> DataFrame:
    return (edges.select(F.col(s).alias("s"), F.col(p).alias("p"),
                         F.col(o).alias("o"))
            .where(F.col("s").isNotNull() & F.col("o").isNotNull())
            .distinct())


def predicate_profile(
    edges: DataFrame,
    s: str = "subject",
    p: str = "predicate",
    o: str = "object",
) -> DataFrame:
    """Per-predicate cardinality profile over distinct (s,p,o) triples.

    Returns (predicate, n_triples, n_subjects, n_objects,
    objs_per_subject, subjs_per_object, is_functional,
    is_inverse_functional, cardinality) — `cardinality` is the usual
    one_to_one / many_to_one / one_to_many / many_to_many class.

    Functional-ness is decided on exact integer counts (n_triples ==
    n_subjects), not on a float threshold, so the flag is reproducible
    across engines and scales.
    """
    t = _distinct_triples(edges, s, p, o)
    prof = t.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.countDistinct("s").cast("long").alias("n_subjects"),
        F.countDistinct("o").cast("long").alias("n_objects"),
    )
    fn = F.col("n_triples") == F.col("n_subjects")
    inv = F.col("n_triples") == F.col("n_objects")
    return prof.select(
        F.col("p").alias("predicate"),
        "n_triples", "n_subjects", "n_objects",
        (F.col("n_triples") / F.col("n_subjects")).alias("objs_per_subject"),
        (F.col("n_triples") / F.col("n_objects")).alias("subjs_per_object"),
        fn.alias("is_functional"),
        inv.alias("is_inverse_functional"),
        F.when(fn & inv, F.lit("one_to_one"))
         .when(fn, F.lit("many_to_one"))
         .when(inv, F.lit("one_to_many"))
         .otherwise(F.lit("many_to_many")).alias("cardinality"),
    )


def inverse_candidates(
    edges: DataFrame,
    s: str = "subject",
    p: str = "predicate",
    o: str = "object",
    min_support: int = 1,
) -> DataFrame:
    """Candidate inverse (and symmetric, when p == q) predicate pairs.

    For every predicate pair (p, q): overlap = |{(s,p,o) : (o,q,s) holds}|
    over distinct triples; conf_p = overlap / n_p and conf_q = overlap /
    n_q (rule confidence in both directions). Rows with overlap <
    min_support are pruned. p == q rows measure symmetry (overlap counts
    ordered triples, so a fully symmetric predicate has conf == 1.0).

    Returns (p, q, overlap, n_p, n_q, conf_p, conf_q), one row per
    UNORDERED pair — the (q, p) mirror is suppressed by keeping p <= q.
    """
    t = _distinct_triples(edges, s, p, o)
    rev = t.select(F.col("o").alias("s"), F.col("p").alias("q"),
                   F.col("s").alias("o"))
    pairs = (
        t.join(rev, ["s", "o"])
        .where(F.col("p") <= F.col("q"))
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
        .where(F.col("overlap") >= min_support)
    )
    sizes = t.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    p_sizes = sizes.select(F.col("p").alias("_pp"), F.col("n").alias("n_p"))
    q_sizes = sizes.select(F.col("p").alias("_qq"), F.col("n").alias("n_q"))
    return (
        pairs
        .join(F.broadcast(p_sizes), F.col("p") == F.col("_pp"))
        .join(F.broadcast(q_sizes), F.col("q") == F.col("_qq"))
        .select("p", "q", "overlap", "n_p", "n_q",
                (F.col("overlap") / F.col("n_p")).alias("conf_p"),
                (F.col("overlap") / F.col("n_q")).alias("conf_q"))
    )


def degree_histogram(
    edges: DataFrame,
    node_col: str,
) -> DataFrame:
    """Log2-bucketed degree distribution — the power-law diagnostic for a
    constructed KG (a healthy web-derived graph shows a roughly straight
    line in log-log; a broken extractor shows a spike). Degree is the
    occurrence count of ``node_col`` in the edge table (pass the subject
    column for out-degree, the object column for in-degree).

    Bucket b holds nodes with degree in [2^(b-1), 2^b - 1]: b is the bit
    length of the degree, computed as LENGTH(BIN(degree)) — an
    integer-exact formulation (no float log2) that evaluates identically
    in Spark and DuckDB, so the histogram is cross-engine reproducible.

    Scale shape: two aggregates — one shuffle on the node key (degree
    census; map-side partials absorb hot nodes) then one tiny shuffle on
    the ~64 possible buckets. Returns
    (bucket, n_nodes, min_degree, max_degree) sorted-agnostic.
    """
    deg = (
        edges.select(F.col(node_col).alias("node"))
        .where(F.col("node").isNotNull())
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.select(F.length(F.bin("deg")).cast("int").alias("bucket"), "deg")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("deg").cast("long").alias("min_degree"),
            F.max("deg").cast("long").alias("max_degree"),
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    decimals: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of (out-degree(src), in-degree(dst)) over directed
    edges — one number separating hub-to-hub topologies (assortative,
    r > 0: citation cliques) from hub-to-leaf (disassortative, r < 0:
    the web's typical shape). A KG whose assortativity shifts between
    releases changed its growth regime — a schema-free QC tripwire next
    to degree_histogram.

    All five correlation sums (n, Sx, Sy, Sxx, Syy, Sxy) accumulate as
    exact integers (degrees are integers; product OPERANDS are cast to
    decimal(19,0) first, so the multiplication itself runs in decimal —
    a decimal(38,0) product that cannot overflow for any BIGINT-ranged
    degree — and the sums stay exact), and only the final closed form
    divides in double,
    ROUNDed — both engines evaluate one identical expression on
    identical integers. Three shuffles: two degree aggregates + the
    final 1-row global sum (map-side combined). Returns one row
    (n_edges, assortativity); NULL when either degree is constant
    (zero variance)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    dout = e.groupBy("u").agg(F.count(F.lit(1)).alias("_dx"))
    din = e.groupBy("v").agg(F.count(F.lit(1)).alias("_dy"))
    j = e.join(dout, "u").join(din, "v")
    d0 = "decimal(38,0)"
    dx19 = F.col("_dx").cast("decimal(19,0)")
    dy19 = F.col("_dy").cast("decimal(19,0)")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("_dx").cast(d0)).alias("_sx"),
        F.sum(F.col("_dy").cast(d0)).alias("_sy"),
        F.sum((dx19 * dx19).cast(d0)).alias("_sxx"),
        F.sum((dy19 * dy19).cast(d0)).alias("_syy"),
        F.sum((dx19 * dy19).cast(d0)).alias("_sxy"),
    )
    n = F.col("n_edges").cast("double")
    sx = F.col("_sx").cast("string").cast("double")
    sy = F.col("_sy").cast("string").cast("double")
    sxx = F.col("_sxx").cast("string").cast("double")
    syy = F.col("_syy").cast("string").cast("double")
    sxy = F.col("_sxy").cast("string").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return s.select(
        "n_edges",
        F.when(den > 0, F.round(num / den, decimals))
         .alias("assortativity"),
    )
