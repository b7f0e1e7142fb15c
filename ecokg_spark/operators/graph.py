"""Web-graph analytics: PageRank over an edge list (webtext axis).

The reference's merged KG lands in a triplestore with no analytics surface
(eco_kg/query.py:7-36 just forwards SELECTs); at web scale the canonical
graph-derived quality prior over a crawl is host-level PageRank (Page et
al. 1999 — Common Crawl publishes exactly this as its host ranks), and the
same kernel ranks KG entities by centrality.

Spark-first iteration shape: each round is ONE shuffle (the groupBy on the
destination key) plus a broadcast of the 1-row dangling-mass aggregate. The
rank vector is localCheckpoint'ed (not merely persisted) each round: the
new plan references the old ranks THREE times (contributions, dangling
mass, node re-join), so without plan truncation the logical tree grows
3^iterations and Catalyst analysis itself becomes the bottleneck long
before any data moves — persist() pins data but keeps the full plan;
localCheckpoint cuts it to a leaf (same pattern as GraphX/Pregel's
checkpointInterval). Edge skew (a hot dst collecting a
large fraction of in-links — the synthetic corpus's hot domain) is a
map-side-combinable SUM, so AQE's partial aggregation absorbs it without
salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank on the DISTINCT edge set.

    Dangling mass (rank held by nodes with no out-edges) redistributes
    uniformly each round — the standard stochastic-matrix completion — so
    total rank stays exactly 1 and ranks are comparable across graphs.
    Returns (id, rank). Deterministic up to float summation order; round
    before hashing results across engines.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    deg = deg.persist()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_c"))
        )
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        nxt = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping)
                 * (F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n)))).alias("rank"),
            )
            .localCheckpoint()
        )
        ranks = nxt
    # the final ranks are an eager checkpoint leaf — the pinned inputs are
    # no longer reachable from it, so release their blocks
    if iterations > 0:
        for df in (e, nodes, deg):
            df.unpersist(blocking=False)
    return ranks


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 32,
) -> DataFrame:
    """Single-source/multi-source BFS: shortest hop-distance from any seed
    over the DIRECTED edge set. Returns (id, dist) for every reachable
    node; unreachable nodes are absent (join against your node table with
    a left join if you need NULL rows). `seeds` is a 1-column DataFrame of
    start ids (its first column is used whatever it is named).

    Frontier iteration, the Pregel BFS shape: round k joins ONLY the
    frontier (nodes first reached at distance k-1) to the edges — one
    shuffle on the join key — and anti-joins the visited set so each node
    settles exactly once (hop distance is the first discovery, so no
    re-relaxation is ever needed, unlike weighted SSSP). Each frontier is
    localCheckpoint'ed: the next plan references both the previous
    frontier and the full visited set, so without plan truncation the
    logical tree doubles per round and Catalyst analysis dominates
    (same rationale as pagerank above). At cluster scale every round is
    one AQE-sized shuffle join; a hot hub node fans out through the
    map-side-combinable distinct, not a single reducer.

    Block hygiene (ADVICE r3): every frontier checkpoint is a leaf of the
    returned `visited` plan, so its blocks stay pinned as long as the plan
    references it. To keep a deep BFS from accumulating one pinned block
    set per round, `visited` is itself collapsed into a single fresh
    checkpoint every `_COMPACT_EVERY` rounds — the superseded frontier
    leaves then have no live reference and the ContextCleaner reclaims
    them — bounding pinned sets to O(_COMPACT_EVERY), not O(depth).
    """
    seed_col = seeds.columns[0]
    frontier = (seeds.select(F.col(seed_col).alias("id"))
                .distinct()
                .select("id", F.lit(0).alias("dist"))
                .localCheckpoint())
    e = (edges.select(F.col(src).alias("id"), F.col(dst).alias("_next"))
         .distinct().persist())
    visited = frontier
    _COMPACT_EVERY = 8
    for depth in range(1, max_depth + 1):
        step = (frontier.join(e, "id")
                .select(F.col("_next").alias("id"))
                .distinct())
        frontier = (step.join(visited, "id", "left_anti")
                    .select("id", F.lit(depth).alias("dist"))
                    .localCheckpoint())
        if frontier.isEmpty():
            break
        # visited is a union of checkpoint LEAVES — the plan grows linearly
        # in rounds and each leaf's blocks are already pinned, so no extra
        # persist is needed between compactions
        visited = visited.unionByName(frontier)
        if depth % _COMPACT_EVERY == 0:
            # collapse the union of frontier leaves into ONE checkpoint so
            # the per-round block sets lose their last reference and get
            # reclaimed (see docstring)
            visited = visited.localCheckpoint()
    e.unpersist(blocking=False)
    return visited


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation count over the undirected simple
    graph. Returns (id, triangles).

    The classic two-join kernel with the degeneracy-ordering trick: edges
    canonicalize to a < b (each undirected edge stored once), the wedge
    join extends (a,b) with (b,c) where a < b < c, and the closing join
    checks (a,c). Ordering every wedge by node id means each triangle is
    found exactly once and the quadratic wedge work lands on each edge's
    LOWER endpoint — the standard skew bound (Suri & Vassilvitskii 2011);
    both joins are plain shuffles on a node key, AQE-splittable.
    """
    e = (edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct().persist())
    wedge = (
        e.select(F.col("a"), F.col("b").alias("_m"))
        .join(e.select(F.col("a").alias("_m"), F.col("b").alias("c")), "_m")
        .select("a", "_m", "c")
    )
    tri = wedge.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select(F.col("a"), F.col("_m").alias("b"), "c")
    exploded = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    nodes = (e.select(F.col("a").alias("id"))
             .union(e.select(F.col("b").alias("id"))).distinct())
    return nodes.join(exploded, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst",
                           decimals: int = 6) -> DataFrame:
    """Local clustering coefficient per node: 2T / (d * (d-1)) over the
    undirected simple graph (Watts & Strogatz 1998), 0.0 where degree < 2.
    Returns (id, degree, triangles, coefficient).

    Reuses the triangle kernel's canonical edge set; degree is one more
    hash aggregate over the exploded endpoints. The division is rounded so
    cross-engine float comparison is exact (the operands are integers, so
    this is belt-and-braces, not load-bearing). The d*(d-1) product runs
    in DOUBLE: a BIGINT product would overflow (ANSI: throw) past degree
    ~3e9, and doubles are exact below 2^53 so results are unchanged for
    every realistic degree (the assortativity operand-staging rule).
    """
    e = (edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct())
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tri = triangle_count(e, src="a", dst="b")
    return deg.join(tri, "id").select(
        "id", "degree", "triangles",
        F.when(
            F.col("degree") < 2, F.lit(0.0)
        ).otherwise(
            F.round(2.0 * F.col("triangles")
                    / (F.col("degree").cast("double")
                       * (F.col("degree") - 1).cast("double")), decimals)
        ).alias("coefficient"),
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int | None = None,
) -> DataFrame:
    """k-core of the undirected simple graph: the maximal subgraph where
    every node has degree >= k (Seidman 1983) — the standard structural
    filter for "well-embedded" entities vs peripheral noise in a web/KG
    graph. Returns (id, core_deg): surviving nodes with their degree
    INSIDE the core.

    Peel iteration: each round is one degree aggregate (hash agg, map-side
    combinable — hub skew collapses before the shuffle) plus two anti-joins
    removing edges incident to under-degree nodes. The edge set only
    shrinks, and each round's survivor set is localCheckpoint'ed so the
    plan stays a leaf (same rationale as pagerank/bfs above). Every
    continuing round removes at least one node, so the peel terminates in
    at most |V| rounds unconditionally — a long chain with k=2 genuinely
    needs ~|V|/2 rounds, which is why there is NO default cap (a cap
    would reject a valid graph); pass ``max_rounds`` only as an explicit
    circuit-breaker, accepting a ValueError past it.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")))
    e = (e.select("u", "v")
         .unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
         .distinct()
         .localCheckpoint())
    prev = e
    rounds = 0
    while True:
        deg = prev.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        bad = deg.where(F.col("_d") < k).select("u")
        if bad.isEmpty():
            return deg.select(
                F.col("u").alias("id"), F.col("_d").cast("long").alias("core_deg"))
        nxt = (prev.join(bad, "u", "left_anti")
               .join(bad.withColumnRenamed("u", "v"), "v", "left_anti")
               .select("u", "v")
               .localCheckpoint())
        prev = nxt
        if prev.isEmpty():
            return prev.sparkSession.createDataFrame(
                [], "id " + dict(e.dtypes)["u"] + ", core_deg long")
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            raise ValueError(
                f"k-core peel exceeded max_rounds={max_rounds}")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (Jeh & Widom 2003 / the random-walk-with-
    restart prior): teleport mass returns to the SEED set instead of the
    uniform vector, ranking nodes by proximity to the seeds — the standard
    relevance prior for KG neighborhoods and seed-based crawl expansion.
    `seeds` is a 1-column DataFrame of node ids (first column used).
    Returns (id, rank); total rank stays exactly 1 (dangling mass restarts
    at the seeds too, the stochastic completion for PPR).

    Same iteration shape as `pagerank` above — ONE shuffle per round plus
    a broadcast 1-row dangling aggregate, rank vector localCheckpoint'ed
    per round so the logical plan stays a leaf.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    seed_col = seeds.columns[0]
    s = (seeds.select(F.col(seed_col).alias("id")).distinct()
         .join(nodes, "id", "left_semi").persist())
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is a graph node")
    # teleport vector: 1/|S| on seeds, 0 elsewhere
    tele = nodes.join(
        s.select("id", F.lit(1.0 / n_seeds).alias("_t")), "id", "left"
    ).select("id", F.coalesce("_t", F.lit(0.0)).alias("_t")).persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    deg = deg.persist()
    ranks = tele.select("id", F.col("_t").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("_c"))
        )
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            tele.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                ((F.lit(1.0 - damping) + F.lit(damping) * F.col("_dm"))
                 * F.col("_t")
                 + F.lit(damping)
                 * F.coalesce(F.col("_c"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint()
        )
    for df in (e, nodes, s, tele, deg):
        df.unpersist(blocking=False)
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) over the
    DISTINCT directed edge set. Returns (id, hub, authority) for every
    node.

    Per round: authority(v) = sum of hub(u) over in-edges u->v, then hub(u)
    = sum of the NEW authority(v) over out-edges u->v, each L1-normalized
    (scores sum to 1 — the classical formulation uses L2, but any p-norm
    yields the same principal-eigenvector direction and L1 keeps the
    cross-engine oracle exactly recomputable in SQL). A node with no
    in-edges has authority 0; no out-edges, hub 0.

    Spark shape (same rationale as pagerank above): each half-round is ONE
    shuffle (groupBy on the gathering key) plus a broadcast 1-row
    normalizer; the score vector localCheckpoints per round so the plan
    stays a leaf instead of growing 2^iterations. Hot hubs/authorities are
    map-side-combinable SUMs — AQE absorbs skew without salting.
    Deterministic up to float summation order; round before hashing across
    engines.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct().persist())
    scores = nodes.select("id", F.lit(1.0).alias("hub"),
                          F.lit(1.0).alias("authority")).localCheckpoint()
    for _ in range(iterations):
        auth = (
            e.join(scores.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("_a"))
        )
        a_tot = auth.agg(F.sum("_a").alias("_at"))
        auth = (nodes.join(auth, "id", "left")
                .crossJoin(F.broadcast(a_tot))
                .select("id", (F.coalesce(F.col("_a"), F.lit(0.0))
                               / F.col("_at")).alias("authority")))
        hub = (
            e.join(auth.select(F.col("id").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("_h"))
        )
        h_tot = hub.agg(F.sum("_h").alias("_ht"))
        scores = (
            nodes.join(hub, "id", "left")
            .crossJoin(F.broadcast(h_tot))
            .join(auth, "id")
            .select("id",
                    (F.coalesce(F.col("_h"), F.lit(0.0))
                     / F.col("_ht")).alias("hub"),
                    "authority")
            .localCheckpoint()
        )
    for df in (e, nodes):
        df.unpersist(blocking=False)
    return scores


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, Phys. Rev. E 76) over the UNDIRECTED simple graph (edges
    symmetrized, self-loops dropped). Returns (id, label).

    Every node starts labeled with its own id; each round it adopts the
    label most frequent among its neighbors, ties broken by SMALLEST label
    (codepoint order) — the deterministic variant (the published algorithm
    breaks ties randomly; a fixed tie-break makes runs and engines agree).
    Isolated-by-filter nodes keep their label. Fixed iteration count: LPA
    on synchronous schedules can oscillate 2-cycles, so a caller-chosen
    bound is the standard termination (GraphX's LPA does the same).

    Spark shape: per round ONE shuffle for the (node, neighbor-label)
    count and one partial-top-1 window on the node key (WindowGroupLimit
    keeps it map-side partial); labels localCheckpoint per round (plan
    truncation, same rationale as pagerank).
    """
    from pyspark.sql import Window

    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (fwd.unionByName(fwd.select(F.col("v").alias("u"),
                                      F.col("u").alias("v")))
           .where(F.col("u") != F.col("v"))
           .distinct().persist())
    nodes = sym.select(F.col("u").alias("id")).distinct().persist()
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()
    w = Window.partitionBy("u").orderBy(F.col("_n").desc(),
                                        F.col("label").asc())
    for _ in range(iterations):
        counts = (
            sym.join(labels.select(F.col("id").alias("v"), "label"), "v")
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        top = (counts.withColumn("_rk", F.row_number().over(w))
               .where(F.col("_rk") == 1)
               .select(F.col("u").alias("id"), F.col("label").alias("_new")))
        labels = (
            labels.join(top, "id", "left")
            .select("id", F.coalesce(F.col("_new"),
                                     F.col("label")).alias("label"))
            .localCheckpoint()
        )
    for df in (sym, nodes):
        df.unpersist(blocking=False)
    return labels


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top: int | None = None,
    max_center_degree: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected simple graph:
    for each NON-adjacent pair (a, b) with at least one common neighbor,
    score = sum over common neighbors z of 1 / ln(degree(z))
    (Adamic & Adar 2003 — the standard KG-completion baseline).
    Returns (node_a, node_b, common_neighbors, score) with node_a <
    node_b, ordered by (score desc, node_a, node_b); `top` keeps the k
    best candidates.

    Scale shape: one wedge self-join keyed on the CENTER node — for each
    z, all pairs of its neighbors — so work is sum(deg(z)^2). That square
    is the known hot spot; `max_center_degree` drops super-hub centers
    before the join (the standard mitigation: a z seen from millions of
    nodes carries ~zero AA weight anyway, 1/ln(deg) -> 0). Everything
    else is a hash aggregate on the pair key plus one anti-join against
    the edge set. ln(deg(z)) is safe: a common neighbor has degree >= 2
    by construction. Scores are rounded BEFORE the ranking so the
    cross-engine order is exact (JVM StrictMath vs libm last-ulp).
    """
    e = (edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct().persist())
    adj = (e.select(F.col("a").alias("z"), F.col("b").alias("x"))
           .union(e.select(F.col("b").alias("z"), F.col("a").alias("x"))))
    # deg is node-sized — NOT broadcastable at corpus scale; the join keys
    # on z, the same key as the wedge self-join below, so the exchange is
    # reused rather than added.
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    centers = adj.join(deg, "z")
    if max_center_degree is not None:
        centers = centers.where(F.col("deg") <= max_center_degree)
    left = centers.select("z", F.col("x").alias("node_a"), "deg")
    right = centers.select("z", F.col("x").alias("node_b"))
    cand = (
        left.join(right, "z")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"),
             F.round(F.sum(1.0 / F.log(F.col("deg"))),
                     decimals).alias("score"))
    )
    existing = e.select(F.col("a").alias("node_a"), F.col("b").alias("node_b"))
    out = (cand.join(existing, ["node_a", "node_b"], "left_anti")
           .orderBy(F.desc("score"), F.asc("node_a"), F.asc("node_b")))
    if top is not None:
        out = out.limit(top)
    return out


def hash_walks(
    edges: DataFrame,
    length: int = 3,
    seed: int = 0,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic random-walk corpus over the directed graph — the
    walk-sequence generator embedding trainers (DeepWalk/node2vec-style)
    consume, derandomized: at step t from node c the walk takes the
    out-neighbor minimizing md5(seed|t|c|neighbor). Hash-argmin is a
    uniform-looking but REPRODUCIBLE choice — two runs (or two engines)
    emit byte-identical walks, unlike rand()-driven samplers; vary `seed`
    for independent walk sets per start node.

    Returns (start, step, node) long-form rows: step 0 is the start node
    (every distinct node), each walk extends until `length` or a dead end
    (no out-edges). At most one row per (start, step).

    Scale shape: the per-step successor function next_t(c) is computed
    ONCE per node per step — a min_by aggregate over the adjacency, NOT
    per walk — then each step is one equi-join of the frontier against
    that successor table on the node key. length L costs L joins + L
    aggregates, all on the same key; frontier size never exceeds the
    node count. No rand(), no driver state.
    """
    adj = (edges.select(F.col(src).alias("c"), F.col(dst).alias("nbr"))
           .where(F.col("c").isNotNull() & F.col("nbr").isNotNull())
           .distinct())
    nodes = (adj.select(F.col("c").alias("node"))
             .union(adj.select(F.col("nbr").alias("node"))).distinct())
    out = nodes.select(F.col("node").alias("start"),
                       F.lit(0).cast("int").alias("step"),
                       F.col("node"))
    frontier = out.select("start", "node")
    for t in range(1, length + 1):
        h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(str(t)),
                              F.col("c"), F.col("nbr")))
        step_t = adj.groupBy("c").agg(F.min_by("nbr", h).alias("_next"))
        frontier = (frontier.join(step_t,
                                  frontier["node"] == step_t["c"])
                    .select("start", F.col("_next").alias("node")))
        out = out.unionByName(
            frontier.select("start", F.lit(t).cast("int").alias("step"),
                            "node"))
    return out


def hyperball(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    radius: int = 3,
    p: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function — for
    every node v and every r in [0, radius], an HLL estimate of
    |ball(v, r)| = |{u : dist(v, u) <= r}| following OUT-edges. The
    standard way to get effective-diameter / centrality statistics of a
    web-scale graph WITHOUT all-pairs BFS: per-node ball sizes at
    radius 2-3 separate hub hosts from peripheral ones, and the
    aggregate curve gives the distance distribution.

    Exactly the ball recurrence run on sketches instead of sets:
    ball_{r+1}(v) = ball_r(v) UNION ball_r(w) for each v->w, and since
    HLL registers union by per-bucket MAX, each round is ONE equi-join of
    the register table with the edge list plus one (id, bucket) max
    aggregate — both map-side combinable, localCheckpoint'ed per round
    (the pagerank plan-truncation discipline). State is bounded by
    |V| * 2^p register rows regardless of ball sizes — the whole point:
    exact ball sets would be |V| * |ball| and explode at radius 3 on a
    web graph. Registers use the portable md5/60-bit HLL spec
    (operators/sketch.py module docstring), so any engine recomputes the
    estimates bit-for-bit.

    Returns (id, r, n_buckets_used, estimate) — radius+1 rows per node.
    """
    from ecokg_spark.operators.sketch import hll_estimate, hll_registers

    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
    )
    state = hll_registers(
        nodes.withColumn("_member", F.col("id")), "_member",
        p=p, group_cols=["id"],
    ).localCheckpoint()
    frames = [
        hll_estimate(state, p=p, group_cols=["id"], round_to=round_to)
        .withColumn("r", F.lit(0).cast("int"))
    ]
    for r in range(1, radius + 1):
        from_nb = (
            e.join(state, state["id"] == e["_d"])
            .select(F.col("_s").alias("id"), "bucket", "register")
        )
        state = (
            state.unionByName(from_nb)
            .groupBy("id", "bucket")
            .agg(F.max("register").alias("register"))
            .localCheckpoint()
        )
        frames.append(
            hll_estimate(state, p=p, group_cols=["id"], round_to=round_to)
            .withColumn("r", F.lit(r).cast("int"))
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.select("id", "r", "n_buckets_used", "estimate")


def distance_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    radius: int = 3,
    p: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """Graph distance distribution from HyperBall: for each radius r, the
    estimated number of reachable pairs within distance r (the
    neighborhood function N(r) = sum over nodes of |ball(v, r)|) and its
    fraction of N(radius) — the curve effective-diameter statements are
    read off of (Boldi & Vigna 2013 §2: the smallest r with
    N(r)/N(max) >= 0.9 is the 90% effective diameter, computed here by
    the caller from the returned fractions so the cut stays explicit).

    One hyperball run + one k-row aggregate per radius; the per-node
    estimates are summed exactly as emitted (already rounded), so the
    oracle recomputes the identical sum. Returns
    (r, reachable_pairs, fraction) with fraction rounded to `round_to`.
    """
    nf = hyperball(edges, src=src, dst=dst, radius=radius, p=p,
                   round_to=round_to)
    per_r = nf.groupBy("r").agg(
        F.round(F.sum("estimate"), round_to).alias("reachable_pairs"))
    total = per_r.where(F.col("r") == radius).select(
        F.col("reachable_pairs").alias("_t"))
    return (
        per_r.crossJoin(F.broadcast(total))
        .select(
            "r", "reachable_pairs",
            F.round(F.col("reachable_pairs") / F.col("_t"), round_to)
            .alias("fraction"),
        )
    )


def harmonic_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    radius: int = 3,
    p: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """Harmonic centrality estimated from HyperBall (Boldi & Vigna 2014
    — the centrality HyperBall was built for): for each node v,
    sum over r >= 1 of (|ball(v, r)| - |ball(v, r-1)|) / r, i.e. each
    newly-reached node contributes 1/distance, truncated at `radius`
    (the published truncated-harmonic form; contributions beyond the
    truncation decay as 1/r). Over OUT-edges, matching hyperball.

    One hyperball run + a per-node lag window over radius+1 rows — the
    derivation adds one small shuffle on the node id. The per-radius
    estimates are already rounded, so the oracle replays the identical
    differences. Returns (id, harmonic) rounded to `round_to`.
    """
    from pyspark.sql import Window

    nf = hyperball(edges, src=src, dst=dst, radius=radius, p=p,
                   round_to=round_to)
    w = Window.partitionBy("id").orderBy("r")
    prev = F.lag("estimate").over(w)
    contrib = F.when(
        F.col("r") > 0, (F.col("estimate") - prev) / F.col("r"))
    return (
        nf.select("id", "r", contrib.alias("_c"))
        .groupBy("id")
        .agg(F.round(F.sum("_c"), round_to).alias("harmonic"))
    )
