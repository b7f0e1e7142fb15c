"""Deterministic-dedup property: every transform whose dedup key does NOT
functionally determine the other columns must emit the IDENTICAL relation
regardless of input row order / partitioning (ADVICE r2 — the four
dropDuplicates sites replaced by dedup_min: eol measurement+association
edges, germplasm numerical-measurement edges, ontology (s,p,o) edges).

Each test builds an input with genuine key collisions whose non-key columns
differ, runs the transform over several adversarial layouts (single
partition, reversed order, many tiny partitions), and asserts the full
output relation is identical across layouts.
"""

from pyspark.sql import functions as F

from ecokg_spark.transforms.eol_kgx import eol_traits_to_kgx
from ecokg_spark.transforms.gaf_kgx import GAF_COLS, germplasm_to_kgx
from ecokg_spark.transforms.ontology_kgx import ontology_to_kgx

TRAIT_COLS = ("eol_pk string, page_id string, object_page_id string, "
              "resource_id string, predicate string, value_uri string, "
              "measurement string, units string, units_uri string, "
              "normal_measurement string, normal_units string, "
              "normal_units_uri string")


def _layouts(df):
    """Adversarial physical layouts of the same logical relation."""
    n = max(df.count(), 1)
    yield df.coalesce(1)
    yield df.orderBy(*[F.desc(c) for c in df.columns]).coalesce(1)
    yield df.repartition(7)
    yield df.repartition(n, df.columns[0])


def _runs(transform, df):
    outs = []
    for lay in _layouts(df):
        nodes, edges = transform(lay)
        outs.append((
            sorted(map(tuple, nodes.collect())),
            sorted(map(tuple, edges.collect())),
        ))
    return outs


def _assert_identical(outs):
    for other in outs[1:]:
        assert other == outs[0]


def test_eol_traits_deterministic_on_duplicate_eol_pk(spark):
    trait_dim = spark.createDataFrame(
        [("uri:leafarea", "measurement", "numerical", "leaf area", "TO:0002"),
         ("uri:eats", "association", "", "eats", "RO:0002470")],
        "trait_uri string, trait_type string, data_type string, label string, curie string")
    value_dim = spark.createDataFrame(
        [], "trait_uri string, value_uri string, label string, curie string")
    pages = spark.createDataFrame(
        [("1", "10", "species", "A"), ("2", "10", "species", "B"),
         ("10", "100", "genus", "G")],
        "page_id string, parent_id string, rank string, canonical string")
    # t1 appears 3x with DIFFERENT measurements; assoc key t9 2x with
    # different object pages — the survivor must not depend on layout
    traits = spark.createDataFrame(
        [("t1", "1", "", "R5", "uri:leafarea", "", "9", "cm2", "", "3.5", "", ""),
         ("t1", "1", "", "R5", "uri:leafarea", "", "7", "cm2", "", "1.5", "", ""),
         ("t1", "1", "", "R5", "uri:leafarea", "", "8", "mm2", "", "9.5", "", ""),
         ("t9", "1", "2", "R5", "uri:eats", "", "", "", "", "", "", ""),
         ("t9", "1", "10", "R6", "uri:eats", "", "", "", "", "", "", "")],
        TRAIT_COLS)

    outs = _runs(
        lambda df: eol_traits_to_kgx(df, pages, trait_dim, value_dim), traits)
    _assert_identical(outs)
    # exactly one measurement edge (key eol_pk=t1) and one assoc edge (t9)
    edges = outs[0][1]
    assert sum(1 for e in edges if e[1] == "biolink:has_phenotype") == 1
    assert sum(1 for e in edges if e[1] == "biolink:interacts_with") == 1


def test_germplasm_numerical_deterministic_on_compound_remap(spark):
    # same (DB_Object_ID, raw Ontology_ID, parsed pheno) but the compound
    # Annotation_Extension remaps onto differently -> num_label/unit differ
    def gaf_row(ae):
        return tuple(
            {"DB": "PO", "DB_Object_ID": "G1", "DB_Object_Symbol": "Acc1",
             "Ontology_ID": "TO:0000969", "Taxon": "taxon:4577",
             "Annotation_Extension": ae}.get(c, "")
            for c in GAF_COLS)

    gaf = spark.createDataFrame(
        [gaf_row("c(EAR_DIAMETER=7_x)"), gaf_row("c(EAR_HEIGHT=7_y)")],
        ", ".join(f"{c} string" for c in GAF_COLS))
    cat = spark.createDataFrame(
        [], "ontology_id string, label string, pheno string, pheno_id string")
    num = spark.createDataFrame(
        [("TO:0000433", "ear diameter", "cm"),
         ("TO:0000683", "ear height", "m")],
        "ontology_id string, label string, unit string")

    outs = _runs(lambda df: germplasm_to_kgx(df, cat, num), gaf)
    _assert_identical(outs)
    phen = [e for e in outs[0][1] if e[1] == "biolink:has_phenotype"]
    assert len(phen) == 1  # one survivor for the shared (obj, onto, pheno) key


def test_ontology_edges_deterministic_on_relation_collision(spark):
    # two raw preds bucket to biolink:related_to with DIFFERENT relation
    # CURIEs for the same (s, o) — survivor relation must be layout-free
    obo = "http://purl.obolibrary.org/obo/"
    rows = [(f"{obo}TO_0000001", f"{obo}RO_000900{i}", f"{obo}TO_0000002")
            for i in range(4)]
    base = spark.createDataFrame(rows, "sub string, pred string, obj string")

    def transform(df):
        raw = (
            df.select(F.struct("sub", "pred", "obj").alias("edge"))
            .agg(F.collect_list("edge").alias("edges"))
            .select(F.array(F.struct(
                F.array(
                    F.struct(F.lit(f"{obo}TO_0000001").alias("id"),
                             F.lit("a").alias("lbl")),
                    F.struct(F.lit(f"{obo}TO_0000002").alias("id"),
                             F.lit("b").alias("lbl")),
                ).alias("nodes"),
                F.col("edges"),
            )).alias("graphs"))
        )
        return ontology_to_kgx(raw, source_name="to")

    outs = _runs(transform, base)
    _assert_identical(outs)
    edges = outs[0][1]
    assert len(edges) == 1
    # dedup_min picks the lexicographically smallest relation
    rel = [e for e in edges][0]
    assert "RO:0009000" in rel
