"""KG QC / link-prediction rows: predicate profiles, inverse detection, negative sampling, KG diff, KGX validation."""

from __future__ import annotations

from pyspark.sql import functions as F
from ecokg_spark.contract._shared import _HEX15, t


def q_kg_diff(spark, sf):
    """KG snapshot diff (operators/merge.py diff_graphs): edge sets
    synthesized from part at two 'releases' (k%3!=0 vs k%2!=0) — the
    added/removed membership audit between graph versions."""
    from ecokg_spark.operators.merge import diff_graphs

    p = t(spark, sf, "part")
    k = F.col("p_partkey")
    edge = [F.concat(F.lit("P:"), k).alias("subject"),
            F.lit("biolink:related_to").alias("predicate"),
            F.concat(F.lit("P:"), ((k * 7 + 3) % 100)).alias("object")]
    old = p.where(k % 3 != 0).select(*edge)
    new = p.where(k % 2 != 0).select(*edge)
    return diff_graphs(old, new)


SQL_KG_DIFF = """
WITH e AS (
  SELECT p_partkey AS k,
         'P:' || CAST(p_partkey AS VARCHAR) AS subject,
         'biolink:related_to' AS predicate,
         'P:' || CAST((p_partkey * 7 + 3) % 100 AS VARCHAR) AS object
  FROM part
),
o AS (SELECT DISTINCT subject, predicate, object FROM e WHERE k % 3 <> 0),
n AS (SELECT DISTINCT subject, predicate, object FROM e WHERE k % 2 <> 0)
SELECT 'added' AS change, subject, predicate, object FROM n
WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.subject = n.subject
  AND o.predicate = n.predicate AND o.object = n.object)
UNION ALL
SELECT 'removed', subject, predicate, object FROM o
WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.subject = o.subject
  AND n.predicate = o.predicate AND n.object = o.object)
"""


def q_kgx_validate(spark, sf):
    """KGX validation report (operators/validate.py validate_kgx — the
    reference toolchain's `kgx validate` publishing gate): graph
    synthesized from part with one planted violation class per id-modulus
    (empty/non-CURIE ids, missing/non-biolink categories, duplicate
    nodes, dangling subjects/objects, bare predicates, self loops)."""
    from ecokg_spark.operators.validate import validate_kgx

    p = t(spark, sf, "part")
    k = F.col("p_partkey")
    node_id = (F.when(k % 10 == 2, F.lit(""))
               .when(k % 10 == 1, F.concat(F.lit("badid"), k))
               .otherwise(F.concat(F.lit("P:"), k)))
    cat = (F.when(k % 10 == 3, F.lit(""))
           .when(k % 10 == 4, F.lit("Gene"))
           .otherwise(F.lit("biolink:Gene")))
    nodes = p.select(node_id.alias("id"), cat.alias("category"))
    nodes = nodes.unionAll(p.where(k % 25 == 0).select(
        node_id.alias("id"), cat.alias("category")))
    subj = F.concat(F.lit("P:"), k)
    obj = (F.when(k % 11 == 0, subj)
           .when(k % 7 == 0, F.concat(F.lit("X:"), k))
           .otherwise(F.concat(F.lit("P:"), (k % 50) + 1)))
    pred = F.when(k % 5 == 0, F.lit("related_to")).otherwise(
        F.lit("biolink:related_to"))
    edges = p.select(subj.alias("subject"), pred.alias("predicate"),
                     obj.alias("object"))
    return validate_kgx(nodes, edges)


SQL_KGX_VALIDATE = """
WITH n0 AS (
  SELECT CASE WHEN p_partkey % 10 = 2 THEN ''
              WHEN p_partkey % 10 = 1 THEN 'badid' || CAST(p_partkey AS VARCHAR)
              ELSE 'P:' || CAST(p_partkey AS VARCHAR) END AS id,
         CASE WHEN p_partkey % 10 = 3 THEN ''
              WHEN p_partkey % 10 = 4 THEN 'Gene'
              ELSE 'biolink:Gene' END AS category,
         p_partkey AS k
  FROM part
),
nodes AS (
  SELECT id, category FROM n0
  UNION ALL SELECT id, category FROM n0 WHERE k % 25 = 0
),
edges AS (
  SELECT 'P:' || CAST(p_partkey AS VARCHAR) AS subject,
         CASE WHEN p_partkey % 5 = 0 THEN 'related_to'
              ELSE 'biolink:related_to' END AS predicate,
         CASE WHEN p_partkey % 11 = 0 THEN 'P:' || CAST(p_partkey AS VARCHAR)
              WHEN p_partkey % 7 = 0 THEN 'X:' || CAST(p_partkey AS VARCHAR)
              ELSE 'P:' || CAST((p_partkey % 50) + 1 AS VARCHAR) END AS object
  FROM part
),
ids AS (SELECT DISTINCT id FROM nodes WHERE id IS NOT NULL)
SELECT 'node_id_null' AS check, CAST(COUNT(*) AS BIGINT) AS n_violations
FROM nodes WHERE id IS NULL OR id = ''
UNION ALL
SELECT 'node_id_duplicate',
       CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
FROM (SELECT COUNT(*) AS c FROM nodes WHERE id IS NOT NULL
      GROUP BY id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'node_id_not_curie', CAST(COUNT(*) AS BIGINT)
FROM nodes WHERE id IS NOT NULL AND id <> ''
  AND NOT regexp_matches(id, '^[A-Za-z_][A-Za-z0-9_.-]*:[^ \\t]+$')
UNION ALL
SELECT 'node_category_missing', CAST(COUNT(*) AS BIGINT)
FROM nodes WHERE category IS NULL OR category = ''
UNION ALL
SELECT 'node_category_not_biolink', CAST(COUNT(*) AS BIGINT)
FROM nodes WHERE category IS NOT NULL AND category <> ''
  AND NOT starts_with(category, 'biolink:')
UNION ALL
SELECT 'edge_subject_dangling', CAST(COUNT(*) AS BIGINT)
FROM edges WHERE subject NOT IN (SELECT id FROM ids)
UNION ALL
SELECT 'edge_object_dangling', CAST(COUNT(*) AS BIGINT)
FROM edges WHERE object NOT IN (SELECT id FROM ids)
UNION ALL
SELECT 'edge_predicate_not_biolink', CAST(COUNT(*) AS BIGINT)
FROM edges WHERE predicate IS NULL OR NOT starts_with(predicate, 'biolink:')
UNION ALL
SELECT 'edge_self_loop', CAST(COUNT(*) AS BIGINT)
FROM edges WHERE subject = object
"""


def _kgqc_edges(spark, sf):
    """Distinct (subject, predicate, object) fixture with all four
    cardinality classes, synthesized from supplier/lineitem/nation:
      biolink:located_in   S:suppkey -> N:nationkey   (many_to_one)
      biolink:has_member   N:nationkey -> S:suppkey   (one_to_many)
      biolink:supplied_by  P:partkey -> S:suppkey     (many_to_many)
      biolink:named        N:nationkey -> NM:name     (one_to_one)
    """
    sup = t(spark, sf, "supplier")
    li = t(spark, sf, "lineitem")
    na = t(spark, sf, "nation")
    s_id = F.concat(F.lit("S:"), F.col("s_suppkey").cast("string"))
    n_id = F.concat(F.lit("N:"), F.col("s_nationkey").cast("string"))
    return (
        sup.select(s_id.alias("subject"),
                   F.lit("biolink:located_in").alias("predicate"),
                   n_id.alias("object"))
        .union(sup.select(n_id.alias("subject"),
                          F.lit("biolink:has_member").alias("predicate"),
                          s_id.alias("object")))
        .union(li.select(
            F.concat(F.lit("P:"), F.col("l_partkey").cast("string"))
             .alias("subject"),
            F.lit("biolink:supplied_by").alias("predicate"),
            F.concat(F.lit("S:"), F.col("l_suppkey").cast("string"))
             .alias("object")))
        .union(na.select(
            F.concat(F.lit("N:"), F.col("n_nationkey").cast("string"))
             .alias("subject"),
            F.lit("biolink:named").alias("predicate"),
            F.concat(F.lit("NM:"), F.col("n_name")).alias("object")))
    )


def q_predicate_profile(spark, sf):
    """Per-predicate cardinality profile (operators/kgqc.py): functional /
    inverse-functional flags from exact integer counts, ratio columns via
    bigint/bigint division (IEEE-identical across engines). The schema-QC
    step the reference's merge phase leaves to the consumer."""
    from ecokg_spark.operators.kgqc import predicate_profile

    return predicate_profile(_kgqc_edges(spark, sf))


SQL_PREDICATE_PROFILE = """
WITH e AS (
  SELECT DISTINCT 'S:' || CAST(s_suppkey AS VARCHAR) AS s,
         'biolink:located_in' AS p,
         'N:' || CAST(s_nationkey AS VARCHAR) AS o FROM supplier
  UNION
  SELECT DISTINCT 'N:' || CAST(s_nationkey AS VARCHAR),
         'biolink:has_member', 'S:' || CAST(s_suppkey AS VARCHAR)
  FROM supplier
  UNION
  SELECT DISTINCT 'P:' || CAST(l_partkey AS VARCHAR),
         'biolink:supplied_by', 'S:' || CAST(l_suppkey AS VARCHAR)
  FROM lineitem
  UNION
  SELECT DISTINCT 'N:' || CAST(n_nationkey AS VARCHAR),
         'biolink:named', 'NM:' || n_name FROM nation),
prof AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_triples,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subjects,
         CAST(COUNT(DISTINCT o) AS BIGINT) AS n_objects
  FROM e GROUP BY p)
SELECT p AS predicate, n_triples, n_subjects, n_objects,
       n_triples / n_subjects AS objs_per_subject,
       n_triples / n_objects AS subjs_per_object,
       n_triples = n_subjects AS is_functional,
       n_triples = n_objects AS is_inverse_functional,
       CASE WHEN n_triples = n_subjects AND n_triples = n_objects
              THEN 'one_to_one'
            WHEN n_triples = n_subjects THEN 'many_to_one'
            WHEN n_triples = n_objects THEN 'one_to_many'
            ELSE 'many_to_many' END AS cardinality
FROM prof
"""


def _inverse_edges(spark, sf):
    """Fixture with a perfect symmetric predicate and a partial inverse
    pair: borders (N:i -- N:3i%25, both directions asserted), part_of
    (N:i -> R:i%5, all 25 nations), contains (R -> N, EVEN nations only,
    so conf(contains->part_of) = 1.0 but conf(part_of->contains) = 0.52).
    """
    na = t(spark, sf, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    n_i = F.concat(F.lit("N:"), k.cast("string"))
    n_3i = F.concat(F.lit("N:"), ((k * 3) % 25).cast("string"))
    r_i = F.concat(F.lit("R:"), (k % 5).cast("string"))
    return (
        na.select(n_i.alias("subject"),
                  F.lit("biolink:borders").alias("predicate"),
                  n_3i.alias("object"))
        .union(na.select(n_3i.alias("subject"),
                         F.lit("biolink:borders").alias("predicate"),
                         n_i.alias("object")))
        .union(na.select(n_i.alias("subject"),
                         F.lit("biolink:part_of").alias("predicate"),
                         r_i.alias("object")))
        .union(na.where(k % 2 == 0)
               .select(r_i.alias("subject"),
                       F.lit("biolink:contains").alias("predicate"),
                       n_i.alias("object")))
    )


def q_inverse_detect(spark, sf):
    """Inverse/symmetric predicate detection (operators/kgqc.py
    inverse_candidates): reversed self-join on the (subject, object)
    composite, AMIE-style support/confidence, p <= q dedup."""
    from ecokg_spark.operators.kgqc import inverse_candidates

    return inverse_candidates(_inverse_edges(spark, sf), min_support=2)


SQL_INVERSE_DETECT = """
WITH e AS (
  SELECT DISTINCT 'N:' || CAST(n_nationkey AS VARCHAR) AS s,
         'biolink:borders' AS p,
         'N:' || CAST((n_nationkey * 3) % 25 AS VARCHAR) AS o FROM nation
  UNION
  SELECT DISTINCT 'N:' || CAST((n_nationkey * 3) % 25 AS VARCHAR),
         'biolink:borders', 'N:' || CAST(n_nationkey AS VARCHAR)
  FROM nation
  UNION
  SELECT DISTINCT 'N:' || CAST(n_nationkey AS VARCHAR), 'biolink:part_of',
         'R:' || CAST(n_nationkey % 5 AS VARCHAR) FROM nation
  UNION
  SELECT DISTINCT 'R:' || CAST(n_nationkey % 5 AS VARCHAR),
         'biolink:contains', 'N:' || CAST(n_nationkey AS VARCHAR)
  FROM nation WHERE n_nationkey % 2 = 0),
rev AS (SELECT o AS s, p AS q, s AS o FROM e),
pr AS (
  SELECT e.p, rev.q, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM e JOIN rev ON e.s = rev.s AND e.o = rev.o
  WHERE e.p <= rev.q
  GROUP BY e.p, rev.q
  HAVING COUNT(*) >= 2),
sz AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY p)
SELECT pr.p, pr.q, pr.overlap, a.n AS n_p, b.n AS n_q,
       pr.overlap / a.n AS conf_p, pr.overlap / b.n AS conf_q
FROM pr JOIN sz a ON a.p = pr.p JOIN sz b ON b.p = pr.q
"""


def q_kg_negatives(spark, sf):
    """Filtered negative sampling for KG-embedding training
    (operators/kgtrain.py kg_negative_samples, k=3, B=16): located_in
    triples from supplier, object corrupted via the salted hash-argmin
    choice table; the oracle recomputes buckets, argmin picks, and the
    positive filter under the portable md5/60-bit spec."""
    from ecokg_spark.operators.kgtrain import kg_negative_samples

    s = t(spark, sf, "supplier")
    triples = s.select(
        F.concat(F.lit("S:"), F.col("s_suppkey")).alias("subject"),
        F.lit("eco:located_in").alias("predicate"),
        F.concat(F.lit("N:"), F.col("s_nationkey")).alias("object"),
    ).distinct()
    return kg_negative_samples(triples, k=3, buckets=16)


_H60T = _HEX15.format(
    h="md5(CAST(length(s) AS VARCHAR) || ':' || s || '|' || CAST(length(p) AS VARCHAR) || ':' || p || '|' || CAST(length(o) AS VARCHAR) || ':' || o || '|' || CAST(neg_idx AS VARCHAR))")


_H60E = _HEX15.format(h="md5(CAST(neg_idx AS VARCHAR) || '#' || ent)")


SQL_KG_NEGATIVES = f"""
WITH t AS (
  SELECT DISTINCT 'S:' || s_suppkey AS s, 'eco:located_in' AS p,
                  'N:' || s_nationkey AS o
  FROM supplier),
e AS (SELECT DISTINCT o AS ent FROM t),
salts AS (SELECT unnest(range(0, 3)) AS neg_idx),
eh AS (SELECT neg_idx, ent, {_H60E} AS h FROM e CROSS JOIN salts),
picks AS (
  SELECT neg_idx, h % 16 AS bucket,
         MIN(lpad(CAST(h AS VARCHAR), 19, '0') || '|' || ent) AS pk
  FROM eh GROUP BY 1, 2),
p2 AS (SELECT neg_idx, bucket, substr(pk, 21) AS pick FROM picks),
cand AS (
  SELECT t.s, t.p, p2.pick, st.neg_idx
  FROM t CROSS JOIN salts st
  JOIN p2 ON p2.neg_idx = st.neg_idx
         AND p2.bucket = ({_H60T.replace('neg_idx', 'st.neg_idx')}) % 16
  WHERE p2.pick <> t.o)
SELECT c.s AS subject, c.p AS predicate, c.pick AS neg_object,
       CAST(c.neg_idx AS INT) AS neg_idx
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM t WHERE t.s = c.s AND t.p = c.p AND t.o = c.pick)
"""


def q_kg_negatives_head(spark, sf):
    """Head-corruption negative sampling — kg_negative_samples with
    swapped roles (the documented two-call protocol): subjects corrupt
    against the subject pool; the oracle mirrors the swap."""
    from ecokg_spark.operators.kgtrain import kg_negative_samples

    s = t(spark, sf, "supplier")
    triples = s.select(
        F.concat(F.lit("N:"), F.col("s_nationkey")).alias("subject"),
        F.lit("eco:hosts").alias("predicate"),
        F.concat(F.lit("S:"), F.col("s_suppkey")).alias("object"),
    ).distinct()
    swapped = triples.select(
        F.col("object").alias("subject"), "predicate",
        F.col("subject").alias("object"))
    negs = kg_negative_samples(swapped, k=2, buckets=16)
    return negs.select(
        F.col("neg_object").alias("neg_subject"), "predicate",
        F.col("subject").alias("object"), "neg_idx")


_H60T2 = _HEX15.format(
    h="md5(CAST(length(s) AS VARCHAR) || ':' || s || '|' || CAST(length(p) AS VARCHAR) || ':' || p || '|' || CAST(length(o) AS VARCHAR) || ':' || o || '|' || CAST(st.neg_idx AS VARCHAR))")


_H60E2 = _HEX15.format(h="md5(CAST(neg_idx AS VARCHAR) || '#' || ent)")


SQL_KG_NEGATIVES_HEAD = f"""
WITH t AS (
  SELECT DISTINCT 'S:' || s_suppkey AS s, 'eco:hosts' AS p,
                  'N:' || s_nationkey AS o
  FROM supplier),
e AS (SELECT DISTINCT o AS ent FROM t),
salts AS (SELECT unnest(range(0, 2)) AS neg_idx),
eh AS (SELECT neg_idx, ent, {_H60E2} AS h FROM e CROSS JOIN salts),
picks AS (
  SELECT neg_idx, h % 16 AS bucket,
         MIN(lpad(CAST(h AS VARCHAR), 19, '0') || '|' || ent) AS pk
  FROM eh GROUP BY 1, 2),
p2 AS (SELECT neg_idx, bucket, substr(pk, 21) AS pick FROM picks),
cand AS (
  SELECT t.s, t.p, p2.pick, st.neg_idx
  FROM t CROSS JOIN salts st
  JOIN p2 ON p2.neg_idx = st.neg_idx
         AND p2.bucket = ({_H60T2}) % 16
  WHERE p2.pick <> t.o)
SELECT c.pick AS neg_subject, c.p AS predicate, c.s AS object,
       CAST(c.neg_idx AS INT) AS neg_idx
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM t WHERE t.s = c.s AND t.p = c.p AND t.o = c.pick)
"""
