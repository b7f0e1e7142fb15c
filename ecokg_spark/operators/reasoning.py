"""Ontology reasoning operators: transitive closure and RDFS (rho-df)
materialization.

The reference loads class hierarchies from OBO-graph JSON
(`/root/reference/eco_kg/transform_utils/ontology/ontology_transform.py`)
but never materializes entailments — downstream queries see only asserted
`biolink:subclass_of` edges. A KG built from web text needs the closure
explicitly: type queries ("all OrganismalEntity instances") must see
instances of every transitive subclass, and property subsumption
("located_in implies based_in") is how extraction predicates map onto the
target schema. These operators implement the standard rho-df fragment
(Munoz, Perez & Gutierrez 2009 — the minimal RDFS subset real reasoners
implement): subClassOf/subPropertyOf transitive closure, rdfs2 (domain),
rdfs3 (range), rdfs7 (property subsumption), rdfs9 (type inheritance).

Scale shape:
  * `transitive_closure` uses ITERATIVE SQUARING — each round composes the
    closure-so-far with itself, so round r covers paths of length 2^r and
    a depth-d hierarchy converges in ceil(log2 d) + 1 self-join rounds
    (pointer-chasing one hop per round would need d rounds). Each round is
    one equi-join shuffle + distinct, localCheckpoint'ed so the plan stays
    a leaf (the pagerank/kcore discipline). Closure size is the real
    bound: on an ontology (chains/trees, depth << width) it is O(E * depth)
    rows; it is NOT meant for dense general graphs where reachability is
    O(V^2).
  * `rdfs_materialize` keeps the corpus-sized work broadcast-shaped: the
    schema triples (subClassOf / subPropertyOf / domain / range) are an
    ontology-sized minority, so their closures broadcast and every
    derivation rule is a map-side join against the data triples. The only
    corpus-sized shuffle is the final distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_SUBPROP = "rdfs:subPropertyOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Strict transitive closure of a binary relation: every (a, b) with a
    directed path a -> ... -> b of length >= 1, excluding a == b pairs
    (cycles still terminate — intermediate states are finite — but a
    node's self-reachability via a cycle is dropped, keeping the output a
    strict order on DAGs). Returns (src, dst) with the input column names.

    Iterative squaring: closure_{r+1} = closure_r UNION
    (closure_r JOIN closure_r), so depth doubles per round and
    ``max_rounds`` = 20 covers paths of ~1M hops — raise it only for
    pathologically deep chains; convergence is detected by a stable row
    count, so the loop normally exits long before the cap (ValueError
    past it, the kcore circuit-breaker contract).
    """
    c = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("o"))
        .where(F.col("s") != F.col("o"))
        .distinct()
        .localCheckpoint()
    )
    n = c.count()
    for _ in range(max_rounds):
        left = c.select(F.col("s"), F.col("o").alias("_m"))
        right = c.select(F.col("s").alias("_m"), F.col("o"))
        step = left.join(right, "_m").select("s", "o")
        nxt = (
            c.unionByName(step)
            .where(F.col("s") != F.col("o"))
            .distinct()
            .localCheckpoint()
        )
        n2 = nxt.count()
        c = nxt
        if n2 == n:
            return c.select(F.col("s").alias(src), F.col("o").alias(dst))
        n = n2
    raise ValueError(
        f"transitive_closure did not converge in max_rounds={max_rounds}")


def rdfs_materialize(
    triples: DataFrame,
    s: str = "subject",
    p: str = "predicate",
    o: str = "object",
    type_pred: str = RDF_TYPE,
    subclass_pred: str = RDFS_SUBCLASS,
    subprop_pred: str = RDFS_SUBPROP,
    domain_pred: str = RDFS_DOMAIN,
    range_pred: str = RDFS_RANGE,
) -> DataFrame:
    """Materialize the rho-df RDFS entailments over a triple table,
    returning asserted + derived triples, distinct, same (s, p, o) column
    names. Rules, in dependency order:

      rdfs5/7 (subPropertyOf closure, then property subsumption):
        (p1 subPropertyOf* p2) & (x p1 y)  =>  (x p2 y)
      rdfs2 (domain):  (p domain C) & (x p y)  =>  (x type C)
      rdfs3 (range):   (p range C)  & (x p y)  =>  (y type C)
      rdfs11/9 (subClassOf closure, then type inheritance):
        (C subClassOf* D) & (x type C)  =>  (x type D)

    domain/range fire on the rdfs7-EXPANDED triples and rdfs9 on ALL type
    triples including the rdfs2/3-derived ones — the standard fixpoint
    order for this fragment (each rule's input is closed before it fires,
    so one pass per rule reaches the fixpoint; no iteration needed
    beyond the two closures).

    Schema triples are assumed ontology-sized (they broadcast); the data
    side is never shuffled until the final distinct.
    """
    t = triples.select(
        F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o"))

    sc = transitive_closure(
        t.where(F.col("p") == subclass_pred).select("s", "o"), "s", "o"
    ).select(F.col("s").alias("_sub"), F.col("o").alias("_sup"))
    sp = transitive_closure(
        t.where(F.col("p") == subprop_pred).select("s", "o"), "s", "o"
    ).select(F.col("s").alias("_p1"), F.col("o").alias("_p2"))

    # rdfs7: property subsumption over the data triples
    d7 = (
        t.join(F.broadcast(sp), t["p"] == F.col("_p1"))
        .select("s", F.col("_p2").alias("p"), "o")
    )
    base = t.unionByName(d7)

    dom = t.where(F.col("p") == domain_pred).select(
        F.col("s").alias("_dp"), F.col("o").alias("_dc"))
    rng = t.where(F.col("p") == range_pred).select(
        F.col("s").alias("_rp"), F.col("o").alias("_rc"))

    # rdfs2/3: domain/range type inference on the expanded triples
    d2 = (
        base.join(F.broadcast(dom), base["p"] == F.col("_dp"))
        .select("s", F.lit(type_pred).alias("p"), F.col("_dc").alias("o"))
    )
    d3 = (
        base.join(F.broadcast(rng), base["p"] == F.col("_rp"))
        .select(F.col("o").alias("s"), F.lit(type_pred).alias("p"),
                F.col("_rc").alias("o"))
    )

    typed = (
        base.where(F.col("p") == type_pred).select("s", "o")
        .unionByName(d2.select("s", "o"))
        .unionByName(d3.select("s", "o"))
    )
    # rdfs9: inherit every transitive superclass
    d9 = (
        typed.join(F.broadcast(sc), typed["o"] == F.col("_sub"))
        .select("s", F.lit(type_pred).alias("p"), F.col("_sup").alias("o"))
    )

    return (
        base.unionByName(d2).unionByName(d3).unionByName(d9)
        .distinct()
        .select(F.col("s").alias(s), F.col("p").alias(p),
                F.col("o").alias(o))
    )


def hierarchy_cycles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ontology QC: mutually-reachable pairs in a hierarchy relation —
    subClassOf cycles are always authoring errors (a class both above and
    below another collapses the order) and break closure-dependent
    consumers silently. Computes the strict transitive closure once, then
    self-joins it against its own reverse; each unordered cycle pair is
    reported once as (node_a, node_b) with node_a < node_b.

    Cost is the closure itself (log-depth squaring rounds) plus one
    equi-join of the closure with itself — on an ontology-sized
    hierarchy this is interactive; an acyclic input returns 0 rows.
    """
    c = transitive_closure(edges, src, dst)
    fwd = c.select(F.col(src).alias("node_a"), F.col(dst).alias("node_b"))
    rev = c.select(F.col(dst).alias("node_a"), F.col(src).alias("node_b"))
    return (
        fwd.join(rev, ["node_a", "node_b"], "left_semi")
        .where(F.col("node_a") < F.col("node_b"))
    )
