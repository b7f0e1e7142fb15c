"""Graph-analytics rows: PageRank/PPR, centralities, components, k-core, label propagation, closures, reachability."""

from __future__ import annotations

from ecokg_spark.functions.curie import make_curie
from ecokg_spark.operators.components import canonical_map
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ecokg_spark.contract._shared import _HEX15, t


def q_connected_components(spark, sf):
    """Large-star/small-star CC vs closed-form oracle: chain nations within
    each region; components must equal the region groups."""
    n = t(spark, sf, "nation")
    node = make_curie("N", F.lpad(F.col("n_nationkey").cast("string"), 2, "0"))
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    ranked = n.select(F.col("n_regionkey"), node.alias("node"),
                      F.row_number().over(w).alias("rn"))
    a = ranked.select("n_regionkey", F.col("node").alias("u"), "rn")
    b = ranked.select("n_regionkey", F.col("node").alias("v"),
                      (F.col("rn") - 1).alias("rn"))
    edges = a.join(b, ["n_regionkey", "rn"]).select("u", "v")
    allnodes = ranked.select(F.col("node"))
    return canonical_map(edges, allnodes).select("node", F.col("canonical").alias("component"))


SQL_CONNECTED_COMPONENTS = """
SELECT 'N:' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS node,
       'N:' || lpad(CAST(min(n_nationkey) OVER (PARTITION BY n_regionkey) AS VARCHAR), 2, '0')
           AS component
FROM nation
"""


def q_pagerank(spark, sf):
    """Host-graph PageRank (operators/graph.py): deterministic directed
    graph synthesized from nation (i -> (3i+1)%25 and (7i+2)%25; sources
    i%5==0 dropped so dangling-mass redistribution is exercised), 3 power
    iterations at d=0.85. Ranks rounded to 6 dp — Spark and DuckDB sum
    doubles in different orders; 1e-16 float noise vs a 5e-7 boundary."""
    from ecokg_spark.operators.graph import pagerank

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.where(k % 5 != 0).select(k.alias("src"),
                                    ((k * 3 + 1) % 25).alias("dst"))
         .union(n.where(k % 5 != 0).select(k.alias("src"),
                                           ((k * 7 + 2) % 25).alias("dst"))))
    pr = pagerank(e, iterations=3)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _pagerank_sql(iters: int, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank as plain CTE SQL (DuckDB has no
    aggregation inside recursive CTEs, so the oracle unrolls)."""
    parts = [
        "WITH e AS ("
        "SELECT DISTINCT src, dst FROM ("
        "SELECT n_nationkey AS src, (3*n_nationkey+1)%25 AS dst "
        "FROM nation WHERE n_nationkey%5<>0 "
        "UNION ALL "
        "SELECT n_nationkey, (7*n_nationkey+2)%25 "
        "FROM nation WHERE n_nationkey%5<>0)),",
        "nds AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nds),",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg "
        "FROM e GROUP BY src),",
        "r0 AS (SELECT id, 1.0/nn.n AS rank FROM nds CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f", c{i} AS (SELECT e.dst AS id, SUM(r.rank/deg.deg) AS c "
            f"FROM e JOIN {p} r ON r.id = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM {p} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = r.id))"
            f", r{i} AS (SELECT nds.id, (1-{d})/nn.n + {d}*(COALESCE(c{i}.c, 0)"
            f" + d{i}.dm/nn.n) AS rank "
            f"FROM nds LEFT JOIN c{i} ON c{i}.id = nds.id "
            f"CROSS JOIN d{i} CROSS JOIN nn)"
        )
    parts.append(f" SELECT id, ROUND(rank, 6) AS rank FROM r{iters}")
    return "".join(parts)


SQL_PAGERANK = _pagerank_sql(3)


def q_triangle_count(spark, sf):
    """Per-node triangle counts (operators/graph.py triangle_count):
    undirected graph from nation (i -- (2i+3)%25, i -- (5i+1)%25; 46
    canonical edges, 8 triangles), wedge-join kernel with a<b<c ordering."""
    from ecokg_spark.operators.graph import triangle_count

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.select(k.alias("src"), ((k * 2 + 3) % 25).alias("dst"))
         .union(n.select(k.alias("src"), ((k * 5 + 1) % 25).alias("dst"))))
    return triangle_count(e).withColumnRenamed("id", "node")


SQL_TRIANGLE_COUNT = """
WITH raw AS (
  SELECT n_nationkey AS x, (2*n_nationkey+3)%25 AS y FROM nation
  UNION ALL
  SELECT n_nationkey, (5*n_nationkey+1)%25 FROM nation),
e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
      FROM raw WHERE x <> y),
tri AS (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
ex AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
       UNION ALL SELECT c FROM tri),
cnt AS (SELECT id, COUNT(*) AS triangles FROM ex GROUP BY id),
nds AS (SELECT a AS id FROM e UNION SELECT b FROM e)
SELECT nds.id AS node, CAST(COALESCE(cnt.triangles, 0) AS BIGINT) AS triangles
FROM nds LEFT JOIN cnt USING (id)
"""


def q_shortest_path(spark, sf):
    """Multi-round BFS hop distances (operators/graph.py bfs_distances):
    pagerank's directed synthetic graph (i -> (3i+1)%25 and (7i+2)%25,
    sources i%5==0 dropped), seeded at node 1. DuckDB recomputes with a
    depth-bounded recursive CTE + MIN(dist) — the CTE's UNION set
    semantics bound the enumeration, the MIN recovers first-discovery."""
    from ecokg_spark.operators.graph import bfs_distances

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.where(k % 5 != 0).select(k.alias("src"),
                                    ((k * 3 + 1) % 25).alias("dst"))
         .union(n.where(k % 5 != 0).select(k.alias("src"),
                                           ((k * 7 + 2) % 25).alias("dst"))))
    seeds = n.where(k == 1).select(k.alias("id"))  # same type as src/dst
    return bfs_distances(e, seeds, max_depth=16).select(
        F.col("id").cast("long").alias("node"),
        F.col("dist").cast("int").alias("dist"))


SQL_SHORTEST_PATH = """
WITH RECURSIVE e AS (
  SELECT n_nationkey AS src, (3*n_nationkey+1)%25 AS dst
  FROM nation WHERE n_nationkey % 5 <> 0
  UNION
  SELECT n_nationkey, (7*n_nationkey+2)%25
  FROM nation WHERE n_nationkey % 5 <> 0),
bfs(id, dist) AS (
  SELECT 1, 0
  UNION
  SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON bfs.id = e.src
  WHERE bfs.dist < 16)
SELECT CAST(id AS BIGINT) AS node, CAST(MIN(dist) AS INTEGER) AS dist
FROM bfs GROUP BY id
"""


def q_hits(spark, sf):
    """HITS hubs/authorities (operators/graph.py hits): the pagerank row's
    dangling-exercising directed graph (i -> (3i+1)%25 and (7i+2)%25,
    sources i%5==0 dropped), 3 rounds, L1 normalization. Scores rounded to
    6 dp — cross-engine float summation order differs."""
    from ecokg_spark.operators.graph import hits

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.where(k % 5 != 0).select(k.alias("src"),
                                    ((k * 3 + 1) % 25).alias("dst"))
         .union(n.where(k % 5 != 0).select(k.alias("src"),
                                           ((k * 7 + 2) % 25).alias("dst"))))
    out = hits(e, iterations=3)
    return out.select("id", F.round("hub", 6).alias("hub"),
                      F.round("authority", 6).alias("authority"))


def _hits_sql(iters: int) -> str:
    """Unrolled fixed-iteration HITS as plain CTE SQL (auth from hubs,
    hub from the NEW auth, each L1-normalized — exactly graph.hits)."""
    parts = [
        "WITH e AS ("
        "SELECT DISTINCT src, dst FROM ("
        "SELECT n_nationkey AS src, (3*n_nationkey+1)%25 AS dst "
        "FROM nation WHERE n_nationkey%5<>0 "
        "UNION ALL "
        "SELECT n_nationkey, (7*n_nationkey+2)%25 "
        "FROM nation WHERE n_nationkey%5<>0)),",
        "nds AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),",
        "s0 AS (SELECT id, 1.0 AS hub FROM nds)",
    ]
    for i in range(1, iters + 1):
        p = f"s{i - 1}"
        parts.append(
            f", ar{i} AS (SELECT e.dst AS id, SUM(s.hub) AS a "
            f"FROM e JOIN {p} s ON s.id = e.src GROUP BY e.dst)"
            f", at{i} AS (SELECT SUM(a) AS t FROM ar{i})"
            f", a{i} AS (SELECT nds.id, COALESCE(ar{i}.a, 0)/at{i}.t "
            f"AS authority FROM nds LEFT JOIN ar{i} ON ar{i}.id = nds.id "
            f"CROSS JOIN at{i})"
            f", hr{i} AS (SELECT e.src AS id, SUM(a.authority) AS h "
            f"FROM e JOIN a{i} a ON a.id = e.dst GROUP BY e.src)"
            f", ht{i} AS (SELECT SUM(h) AS t FROM hr{i})"
            f", s{i} AS (SELECT nds.id, COALESCE(hr{i}.h, 0)/ht{i}.t AS hub,"
            f" a{i}.authority FROM nds LEFT JOIN hr{i} ON hr{i}.id = nds.id "
            f"CROSS JOIN ht{i} JOIN a{i} ON a{i}.id = nds.id)"
        )
    parts.append(
        f" SELECT id, ROUND(hub, 6) AS hub, ROUND(authority, 6) "
        f"AS authority FROM s{iters}")
    return "".join(parts)


SQL_HITS = _hits_sql(3)


def q_label_prop(spark, sf):
    """Label-propagation communities (operators/graph.py
    label_propagation): the kcore row's undirected graph (i -- (3i+1)%25,
    i -- (7i+2)%25), 3 synchronous rounds, min tie-break. Integer labels —
    exact cross-engine match, no rounding."""
    from ecokg_spark.operators.graph import label_propagation

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.select(k.alias("src"), ((k * 3 + 1) % 25).alias("dst"))
         .union(n.select(k.alias("src"), ((k * 7 + 2) % 25).alias("dst"))))
    return label_propagation(e, iterations=3)


def _label_prop_sql(iters: int) -> str:
    """Unrolled synchronous LPA rounds as CTE SQL: per round, count
    neighbor labels and keep the (count DESC, label ASC) argmax."""
    parts = [
        "WITH raw AS ("
        "SELECT n_nationkey AS x, (3*n_nationkey+1)%25 AS y FROM nation "
        "UNION ALL "
        "SELECT n_nationkey, (7*n_nationkey+2)%25 FROM nation),",
        "e AS (SELECT DISTINCT u, v FROM "
        "(SELECT x AS u, y AS v FROM raw UNION ALL SELECT y, x FROM raw) "
        "WHERE u <> v),",
        "nds AS (SELECT DISTINCT u AS id FROM e),",
        "l0 AS (SELECT id, id AS label FROM nds)",
    ]
    for i in range(1, iters + 1):
        p = f"l{i - 1}"
        parts.append(
            f", c{i} AS (SELECT e.u, l.label, COUNT(*) AS n "
            f"FROM e JOIN {p} l ON l.id = e.v GROUP BY e.u, l.label)"
            f", t{i} AS (SELECT u AS id, label AS nw FROM ("
            f"SELECT u, label, ROW_NUMBER() OVER (PARTITION BY u "
            f"ORDER BY n DESC, label ASC) AS rn FROM c{i}) WHERE rn = 1)"
            f", l{i} AS (SELECT l.id, COALESCE(t{i}.nw, l.label) AS label "
            f"FROM {p} l LEFT JOIN t{i} ON t{i}.id = l.id)"
        )
    parts.append(f" SELECT id, label FROM l{iters}")
    return "".join(parts)


SQL_LABEL_PROP = _label_prop_sql(3)


def q_kcore(spark, sf):
    """k-core decomposition (operators/graph.py kcore): peel iteration on
    the undirected graph synthesized from nation (i -- (3i+1)%25 and
    i -- (7i+2)%25); k=3 survivors with their in-core degree. The graph is
    sf-invariant (nation always has 25 rows) so convergence depth matches
    the oracle's unrolled rounds at every scale; extra unrolled rounds
    past the fixpoint are no-ops."""
    from ecokg_spark.operators.graph import kcore

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.select(k.alias("src"), ((k * 3 + 1) % 25).alias("dst"))
         .union(n.select(k.alias("src"), ((k * 7 + 2) % 25).alias("dst"))))
    return kcore(e, k=3)


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peel rounds as plain CTE SQL: round i keeps nodes whose
    degree in the subgraph induced by round i-1's survivors is >= k."""
    parts = [
        "WITH raw AS ("
        "SELECT n_nationkey AS x, (3*n_nationkey+1)%25 AS y FROM nation "
        "UNION ALL "
        "SELECT n_nationkey, (7*n_nationkey+2)%25 FROM nation),",
        "sym AS (SELECT DISTINCT u, v FROM ("
        "SELECT x AS u, y AS v FROM raw UNION ALL SELECT y, x FROM raw) "
        "WHERE u <> v),",
        "a0 AS (SELECT DISTINCT u FROM sym)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", e{i} AS (SELECT s.u, s.v FROM sym s "
            f"JOIN a{i - 1} x ON s.u = x.u JOIN a{i - 1} y ON s.v = y.u)"
            f", d{i} AS (SELECT u, COUNT(*) AS c FROM e{i} GROUP BY u)"
            f", a{i} AS (SELECT u FROM d{i} WHERE c >= {k})"
        )
    parts.append(
        f" SELECT u AS id, CAST(c AS BIGINT) AS core_deg FROM d{rounds} "
        f"WHERE c >= {k}")
    return "".join(parts)


SQL_KCORE = _kcore_sql(3, 10)


def q_ppr(spark, sf):
    """Personalized PageRank (operators/graph.py personalized_pagerank):
    same dangling-exercising directed graph as the pagerank row, teleport
    mass split over seeds {1, 7, 13}; 3 iterations at d=0.85, ranks
    rounded to 6 dp before hashing (float summation order)."""
    from ecokg_spark.operators.graph import personalized_pagerank

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.where(k % 5 != 0).select(k.alias("src"),
                                    ((k * 3 + 1) % 25).alias("dst"))
         .union(n.where(k % 5 != 0).select(k.alias("src"),
                                           ((k * 7 + 2) % 25).alias("dst"))))
    seeds = n.where(k.isin(1, 7, 13)).select(k.alias("id"))
    pr = personalized_pagerank(e, seeds, iterations=3)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _ppr_sql(iters: int, d: float = 0.85) -> str:
    """Unrolled personalized PageRank: teleport vector 1/|S| on seeds, 0
    elsewhere; dangling mass restarts at the seeds."""
    parts = [
        "WITH e AS ("
        "SELECT DISTINCT src, dst FROM ("
        "SELECT n_nationkey AS src, (3*n_nationkey+1)%25 AS dst "
        "FROM nation WHERE n_nationkey%5<>0 "
        "UNION ALL "
        "SELECT n_nationkey, (7*n_nationkey+2)%25 "
        "FROM nation WHERE n_nationkey%5<>0)),",
        "nds AS (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),",
        "sd AS (SELECT id FROM nds WHERE id IN (1, 7, 13)),",
        "ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM sd),",
        "tele AS (SELECT nds.id, "
        "CASE WHEN sd.id IS NOT NULL THEN 1.0/ns.n ELSE 0.0 END AS t "
        "FROM nds LEFT JOIN sd ON sd.id = nds.id CROSS JOIN ns),",
        "deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg "
        "FROM e GROUP BY src),",
        "r0 AS (SELECT id, t AS rank FROM tele)",
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f", c{i} AS (SELECT e.dst AS id, SUM(r.rank/deg.deg) AS c "
            f"FROM e JOIN {p} r ON r.id = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM {p} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = r.id))"
            f", r{i} AS (SELECT tele.id, "
            f"((1-{d}) + {d}*d{i}.dm) * tele.t + {d}*COALESCE(c{i}.c, 0) "
            f"AS rank "
            f"FROM tele LEFT JOIN c{i} ON c{i}.id = tele.id "
            f"CROSS JOIN d{i})"
        )
    parts.append(f" SELECT id, ROUND(rank, 6) AS rank FROM r{iters}")
    return "".join(parts)


SQL_PPR = _ppr_sql(3)


def q_adamic_adar(spark, sf):
    """Adamic-Adar link prediction (operators/graph.py adamic_adar) over
    the triangle_count fixture graph: top-15 non-adjacent pairs by
    sum(1/ln(deg(z))) over common neighbors z, rounded-then-ranked."""
    from ecokg_spark.operators.graph import adamic_adar

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.select(k.alias("src"), ((k * 2 + 3) % 25).alias("dst"))
         .union(n.select(k.alias("src"), ((k * 5 + 1) % 25).alias("dst"))))
    return adamic_adar(e, top=15)


SQL_ADAMIC_ADAR = """
WITH raw AS (
  SELECT n_nationkey AS x, (2*n_nationkey+3)%25 AS y FROM nation
  UNION ALL
  SELECT n_nationkey, (5*n_nationkey+1)%25 FROM nation),
e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
      FROM raw WHERE x <> y),
adj AS (SELECT a AS z, b AS x FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY z),
c AS (
  SELECT l.x AS node_a, r.x AS node_b,
         CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         ROUND(SUM(1.0 / LN(d.deg)), 6) AS score
  FROM adj l JOIN adj r ON l.z = r.z AND l.x < r.x
  JOIN deg d ON d.z = l.z
  GROUP BY l.x, r.x)
SELECT node_a, node_b, common_neighbors, score
FROM c
WHERE NOT EXISTS (SELECT 1 FROM e
                  WHERE e.a = c.node_a AND e.b = c.node_b)
ORDER BY score DESC, node_a, node_b LIMIT 15
"""


def q_hash_walks(spark, sf):
    """Deterministic hash-argmin random walks (operators/graph.py
    hash_walks): 3-step walk corpus over the pagerank fixture graph,
    successor tables recomputed by the oracle via arg_min over the same
    md5 choice hash."""
    from ecokg_spark.operators.graph import hash_walks

    n = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    e = (n.where(k % 5 != 0).select(k.alias("src"),
                                    ((k * 3 + 1) % 25).alias("dst"))
         .union(n.where(k % 5 != 0).select(k.alias("src"),
                                           ((k * 7 + 2) % 25).alias("dst"))))
    return hash_walks(e, length=3, seed=0)


def _hash_walks_sql(length: int, seed: int) -> str:
    parts = ["""
WITH raw AS (
  SELECT n_nationkey AS src, (3*n_nationkey+1)%25 AS dst
  FROM nation WHERE n_nationkey%5<>0
  UNION ALL
  SELECT n_nationkey, (7*n_nationkey+2)%25
  FROM nation WHERE n_nationkey%5<>0),
adj AS (SELECT DISTINCT src AS c, dst AS nbr FROM raw),
nds AS (SELECT DISTINCT c AS node FROM adj
        UNION SELECT DISTINCT nbr FROM adj),
w0 AS (SELECT node AS start, CAST(0 AS INT) AS step, node FROM nds)"""]
    for t_ in range(1, length + 1):
        parts.append(f""",
s{t_} AS (SELECT c, arg_min(nbr,
            md5('{seed}|{t_}|' || CAST(c AS VARCHAR)
                || '|' || CAST(nbr AS VARCHAR))) AS nxt
          FROM adj GROUP BY c),
f{t_} AS (SELECT f.start, CAST({t_} AS INT) AS step, s{t_}.nxt AS node
          FROM {'w0' if t_ == 1 else f'f{t_ - 1}'} f
          JOIN s{t_} ON f.node = s{t_}.c)""")
    sel = " UNION ALL ".join(
        ["SELECT start, step, node FROM w0"]
        + [f"SELECT start, step, node FROM f{t_}"
           for t_ in range(1, length + 1)])
    parts.append("\n" + sel)
    return "".join(parts)


SQL_HASH_WALKS = _hash_walks_sql(3, 0)


def q_degree_histogram(spark, sf):
    """Log2-bucketed degree distribution (operators/kgqc.py
    degree_histogram): per-part lineitem fanout as the degree census;
    bucket = LENGTH(BIN(degree)), integer-exact in both engines."""
    from ecokg_spark.operators.kgqc import degree_histogram

    li = t(spark, sf, "lineitem")
    return degree_histogram(li, node_col="l_partkey")


SQL_DEGREE_HISTOGRAM = """
WITH d AS (
  SELECT l_partkey AS node, COUNT(*) AS deg
  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY l_partkey)
SELECT CAST(LENGTH(BIN(deg)) AS INT) AS bucket,
       COUNT(*) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_degree,
       CAST(MAX(deg) AS BIGINT) AS max_degree
FROM d GROUP BY 1
"""


def q_tc_reachability(spark, sf):
    """Transitive closure by iterative squaring (operators/reasoning.py
    transitive_closure): chain edges event_id -> event_id-1 inside
    20-wide id blocks (depth 19 => the doubling loop must run ~5 rounds);
    because event ids are contiguous the oracle recomputes the closure
    in closed form as a same-block descending-pair join."""
    from ecokg_spark.operators.reasoning import transitive_closure

    e = t(spark, sf, "events")
    edges = e.where(F.col("event_id") % 20 != 0).select(
        F.col("event_id").alias("src"),
        (F.col("event_id") - 1).alias("dst"),
    )
    return transitive_closure(edges, "src", "dst")


SQL_TC_REACHABILITY = """
SELECT a.event_id AS src, b.event_id AS dst
FROM events a JOIN events b
  ON a.event_id // 20 = b.event_id // 20 AND b.event_id < a.event_id
"""


def q_rdfs_closure(spark, sf):
    """RDFS (rho-df) materialization (operators/reasoning.py
    rdfs_materialize): class hierarchy B:<brand> < M:<mfgr> < Product <
    Entity built from part, instance types + a sized triple per part,
    and a subPropertyOf/domain/range schema — every rule (rdfs2/3/7/9 +
    both closures) fires; the oracle unrolls the fixture's known-depth
    closure explicitly."""
    from ecokg_spark.operators.reasoning import rdfs_materialize

    p = t(spark, sf, "part")
    tp = lambda s_, p_, o_: [s_.alias("subject"), p_.alias("predicate"),
                             o_.alias("object")]
    brand = F.concat(F.lit("B:"), F.col("p_brand"))
    mfgr = F.concat(F.lit("T:"), F.col("p_type"))
    pid = F.concat(F.lit("P:"), F.col("p_partkey"))
    size = F.concat(F.lit("SZ:"), F.col("p_size"))
    triples = (
        p.select(*tp(brand, F.lit("rdfs:subClassOf"), mfgr)).distinct()
        .unionByName(
            p.select(*tp(mfgr, F.lit("rdfs:subClassOf"),
                         F.lit("eco:Product"))).distinct())
        .unionByName(spark.createDataFrame(
            [("eco:Product", "rdfs:subClassOf", "eco:Entity"),
             ("eco:sized", "rdfs:subPropertyOf", "eco:dimension"),
             ("eco:dimension", "rdfs:domain", "eco:Measured"),
             ("eco:dimension", "rdfs:range", "eco:Size")],
            "subject string, predicate string, object string"))
        .unionByName(p.select(*tp(pid, F.lit("rdf:type"), brand)))
        .unionByName(p.select(*tp(pid, F.lit("eco:sized"), size)))
    )
    return rdfs_materialize(triples)


SQL_RDFS_CLOSURE = """
WITH pp AS (
  SELECT 'B:' || p_brand AS b, 'T:' || p_type AS m,
         'P:' || p_partkey AS pid, 'SZ:' || p_size AS sz
  FROM part),
static AS (
  SELECT * FROM (VALUES
    ('eco:Product', 'rdfs:subClassOf', 'eco:Entity'),
    ('eco:sized', 'rdfs:subPropertyOf', 'eco:dimension'),
    ('eco:dimension', 'rdfs:domain', 'eco:Measured'),
    ('eco:dimension', 'rdfs:range', 'eco:Size')) v(s, p, o)),
all_t AS (
  -- asserted
  SELECT DISTINCT b AS s, 'rdfs:subClassOf' AS p, m AS o FROM pp
  UNION ALL SELECT DISTINCT m, 'rdfs:subClassOf', 'eco:Product' FROM pp
  UNION ALL SELECT s, p, o FROM static
  UNION ALL SELECT pid, 'rdf:type', b FROM pp
  UNION ALL SELECT pid, 'eco:sized', sz FROM pp
  -- rdfs7: subproperty expansion
  UNION ALL SELECT pid, 'eco:dimension', sz FROM pp
  -- rdfs2/3 on the expanded triple
  UNION ALL SELECT pid, 'rdf:type', 'eco:Measured' FROM pp
  UNION ALL SELECT sz, 'rdf:type', 'eco:Size' FROM pp
  -- rdfs9 through the 3-level class closure; brand -> type is a DAG
  -- (multi-parent), so each part inherits EVERY type of its brand
  UNION ALL SELECT pp.pid, 'rdf:type', bt.m
            FROM pp JOIN (SELECT DISTINCT b, m FROM pp) bt ON pp.b = bt.b
  UNION ALL SELECT pid, 'rdf:type', 'eco:Product' FROM pp
  UNION ALL SELECT pid, 'rdf:type', 'eco:Entity' FROM pp
  -- subClassOf closure rows are entailed triples too? NO — the operator
  -- derives only type/property triples; closure tables stay internal.
)
SELECT DISTINCT s AS subject, p AS predicate, o AS object FROM all_t
"""


def q_hyperball(spark, sf):
    """HyperBall neighborhood function (operators/graph.py hyperball,
    radius=2, p=8): functional graph on 997 nodes derived from event ids;
    the oracle unrolls ball membership explicitly (radius 2 => two join
    steps) and recomputes the portable-HLL registers and estimates per
    (node, r) — the register union along edges must equal the sketch of
    the exact ball."""
    from ecokg_spark.operators.graph import hyperball

    e = t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("g"), F.col("event_id") % 997).alias("src"),
        F.concat(F.lit("g"), (F.col("event_id") * 31 + 7) % 997).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return hyperball(edges, radius=2, p=8)


def _sql_hyperball(p: int = 8) -> str:
    from ecokg_spark.operators.sketch import _alpha

    m = 2 ** p
    w = 2 ** (60 - p)
    s50 = 2 ** 50
    num = repr(_alpha(m) * m * m * float(s50))
    return f"""
WITH e AS (
  SELECT DISTINCT 'g' || (event_id % 997) AS s,
                  'g' || ((event_id * 31 + 7) % 997) AS d
  FROM events
  WHERE 'g' || (event_id % 997) <> 'g' || ((event_id * 31 + 7) % 997)),
nodes AS (SELECT s AS id FROM e UNION SELECT d FROM e),
b0 AS (SELECT id AS v, id AS u FROM nodes),
b1 AS (SELECT v, u FROM b0 UNION SELECT s, d FROM e),
b2 AS (SELECT v, u FROM b1
       UNION SELECT b1.v, e.d FROM b1 JOIN e ON b1.u = e.s),
mem AS (
  SELECT 0 AS r, v, u FROM b0
  UNION ALL SELECT 1, v, u FROM b1
  UNION ALL SELECT 2, v, u FROM b2),
x AS (SELECT r, v, {_HEX15.format(h='md5(u)')} AS h FROM mem),
reg AS (
  SELECT r, v, h // {w} AS bucket,
         MAX(CASE WHEN h % {w} = 0 THEN {60 - p + 1}
                  ELSE {60 - p + 1} - length(bin(h % {w})) END) AS register
  FROM x GROUP BY 1, 2, 3),
agg AS (SELECT r, v, CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
               SUM(CAST(pow(2.0, 50 - register) AS BIGINT)) AS s_used
        FROM reg GROUP BY r, v),
est AS (SELECT r, v, n_buckets_used, ({m} - n_buckets_used) AS zeros,
               {num} / CAST(s_used + ({m} - n_buckets_used)
                            * CAST({s50} AS BIGINT) AS DOUBLE) AS raw
        FROM agg)
SELECT v AS id, CAST(r AS INT) AS r, n_buckets_used,
       ROUND(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)} * ln({float(m)} / zeros)
                  ELSE raw END, 4) AS estimate
FROM est
"""


SQL_HYPERBALL = _sql_hyperball()


def q_hierarchy_cycles(spark, sf):
    """Cycle QC over a hierarchy relation (operators/reasoning.py
    hierarchy_cycles): functional graph n -> 3n+1 mod 211 (every
    functional graph carries cycles); the oracle closes reachability
    with a set-semantics recursive CTE and intersects it with its own
    reverse."""
    from ecokg_spark.operators.reasoning import hierarchy_cycles

    e = t(spark, sf, "events")
    edges = e.select(
        (F.col("event_id") % 211).alias("src"),
        ((F.col("event_id") * 3 + 1) % 211).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    return hierarchy_cycles(edges)


SQL_HIERARCHY_CYCLES = """
WITH RECURSIVE e AS (
  SELECT DISTINCT event_id % 211 AS s, (event_id * 3 + 1) % 211 AS o
  FROM events WHERE event_id % 211 <> (event_id * 3 + 1) % 211),
tc(s, o) AS (
  SELECT s, o FROM e
  UNION
  SELECT tc.s, e.o FROM tc JOIN e ON tc.o = e.s WHERE tc.s <> e.o)
SELECT DISTINCT a.s AS node_a, a.o AS node_b
FROM tc a JOIN tc b ON a.s = b.o AND a.o = b.s
WHERE a.s < a.o
"""


def q_distance_distribution(spark, sf):
    """Graph distance distribution (operators/graph.py
    distance_distribution): per-radius neighborhood-function totals over
    the hyperball fixture graph; the oracle reuses the hyperball CTE
    chain and aggregates the identical rounded estimates."""
    from ecokg_spark.operators.graph import distance_distribution

    e = t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("g"), F.col("event_id") % 997).alias("src"),
        F.concat(F.lit("g"), (F.col("event_id") * 31 + 7) % 997).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return distance_distribution(edges, radius=2, p=8)


SQL_DISTANCE_DISTRIBUTION = f"""
WITH hb AS ({SQL_HYPERBALL}),
per_r AS (
  SELECT r, ROUND(SUM(estimate), 4) AS reachable_pairs FROM hb GROUP BY r),
tot AS (SELECT reachable_pairs AS t FROM per_r WHERE r = 2)
SELECT r, reachable_pairs,
       ROUND(reachable_pairs / t, 4) AS fraction
FROM per_r CROSS JOIN tot
"""


def q_harmonic_centrality(spark, sf):
    """Truncated harmonic centrality from HyperBall (operators/graph.py
    harmonic_centrality): newly-reached-at-r nodes contribute 1/r; the
    oracle derives the same differences from the hyperball CTE chain
    with a lag window."""
    from ecokg_spark.operators.graph import harmonic_centrality

    e = t(spark, sf, "events")
    edges = e.select(
        F.concat(F.lit("g"), F.col("event_id") % 997).alias("src"),
        F.concat(F.lit("g"), (F.col("event_id") * 31 + 7) % 997).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return harmonic_centrality(edges, radius=2, p=8)


SQL_HARMONIC_CENTRALITY = f"""
WITH hb AS ({SQL_HYPERBALL}),
d AS (SELECT id, r, estimate,
             LAG(estimate) OVER (PARTITION BY id ORDER BY r) AS prev
      FROM hb)
SELECT id, ROUND(SUM(CASE WHEN r > 0 THEN (estimate - prev) / r END), 4)
         AS harmonic
FROM d GROUP BY id
"""


def q_assortativity(spark, sf):
    """Degree assortativity (operators/kgqc.py degree_assortativity)
    over the events functional graph: all five correlation sums stage
    as exact integers (decimal(38,0) in Spark, HUGEINT in DuckDB, both
    stringified identically), one closed-form double division at the
    end."""
    from ecokg_spark.operators.kgqc import degree_assortativity

    e = t(spark, sf, "events")
    edges = e.select(
        (F.col("event_id") % 997).alias("src"),
        ((F.col("event_id") * 31 + 7) % 997).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return degree_assortativity(edges)


SQL_ASSORTATIVITY = """
WITH e AS (
  SELECT event_id % 997 AS u, (event_id * 31 + 7) % 997 AS v
  FROM events WHERE event_id % 997 <> (event_id * 31 + 7) % 997),
dout AS (SELECT u, COUNT(*) AS dx FROM e GROUP BY u),
din AS (SELECT v, COUNT(*) AS dy FROM e GROUP BY v),
j AS (SELECT dx, dy FROM e JOIN dout USING (u) JOIN din USING (v)),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(CAST(SUM(dx) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(dy) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(dx * dx) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(dy * dy) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(dx * dy) AS VARCHAR) AS DOUBLE) AS sxy
  FROM j)
SELECT n_edges,
       CASE WHEN sqrt(n_edges * sxx - sx * sx)
                 * sqrt(n_edges * syy - sy * sy) > 0
            THEN ROUND((n_edges * sxy - sx * sy)
                       / (sqrt(n_edges * sxx - sx * sx)
                          * sqrt(n_edges * syy - sy * sy)), 6)
       END AS assortativity
FROM s
"""
