"""Golden stats-YAML test at the reference's full key-set scale: a graph
synthesized with the production merged-kg_stats.yaml predicate/category
distribution (reference merged-kg_stats.yaml:2-58 — 27 predicates incl. the
48%-mass biolink:has_phenotype — and :479-508 — 15 Biolink classes), counts
scaled 1/1000, then write_stats_yaml's output diffed byte-for-byte against
an independently rendered golden string (VERDICT r2 #8)."""

import math

from ecokg_spark.operators.stats import write_stats_yaml

# (predicate, production count) — merged-kg_stats.yaml:2-58
REF_PREDICATES = [
    ("biolink:active_in", 196960), ("biolink:causes", 2),
    ("biolink:coexists_with", 13), ("biolink:decreases_expression_of", 4960),
    ("biolink:develops_from", 133), ("biolink:enables", 333076),
    ("biolink:expressed_in", 1409287), ("biolink:has_attribute", 279),
    ("biolink:has_part", 129), ("biolink:has_participant", 19),
    ("biolink:has_phenotype", 2561504), ("biolink:in_taxon", 340298),
    ("biolink:increases_expression_of", 5562), ("biolink:interacts_with", 103),
    ("biolink:located_in", 4), ("biolink:negatively_regulates", 2765),
    ("biolink:occurs_in", 1), ("biolink:orthologous_to", 71983),
    ("biolink:part_of", 7921), ("biolink:participates_in", 30),
    ("biolink:positively_regulates", 2766), ("biolink:preceded_by", 20),
    ("biolink:precedes", 3), ("biolink:produces", 1),
    ("biolink:regulates", 290194), ("biolink:related_to", 287),
    ("biolink:subclass_of", 97010),
]
# (category, production count) — merged-kg_stats.yaml:479-508
REF_CATEGORIES = [
    ("biolink:AnatomicalEntity", 1450), ("biolink:BiologicalProcess", 30516),
    ("biolink:CellularComponent", 4479), ("biolink:ChemicalEntity", 1),
    ("biolink:ChemicalSubstance", 919), ("biolink:EnvironmentalExposure", 5),
    ("biolink:GenomicEntity", 224751), ("biolink:LifeStage", 338),
    ("biolink:MolecularActivity", 12284), ("biolink:MolecularFunction", 3005),
    ("biolink:NamedThing", 47), ("biolink:OntologyClass", 8176),
    ("biolink:OrganismTaxon", 5050), ("biolink:OrganismalEntity", 130772),
    ("biolink:PhenotypicFeature", 486),
]


def _scaled(pairs):
    return [(k, max(math.ceil(c / 1000), 1)) for k, c in pairs]


def test_stats_yaml_golden_at_reference_shape(spark, tmp_path):
    preds = _scaled(REF_PREDICATES)
    cats = _scaled(REF_CATEGORIES)
    edges = spark.createDataFrame(
        [(f"S:{p}:{i}", p, f"O:{i}") for p, c in preds for i in range(c)],
        "subject string, predicate string, object string")
    nodes = spark.createDataFrame(
        [(f"N:{cat}:{i}", cat) for cat, c in cats for i in range(c)],
        "id string, category string")

    out = str(tmp_path / "stats.yaml")
    summary = write_stats_yaml(nodes, edges, out)

    # independently rendered golden block (reference layout: sorted keys,
    # nested `count:` lines, totals after each block)
    want = ["edge_stats:", "  count_by_predicates:"]
    for k, c in sorted(preds):
        want += [f"    {k}:", f"      count: {c}"]
    want.append(f"  total_edges: {sum(c for _, c in preds)}")
    want.append("graph_name: Merged Graph")
    want.append("node_stats:")
    want.append("  count_by_category:")
    for k, c in sorted(cats):
        want += [f"    {k}:", f"      count: {c}"]
    want.append(f"  total_nodes: {sum(c for _, c in cats)}")
    golden = "\n".join(want) + "\n"

    assert open(out).read() == golden
    assert len(summary["count_by_predicate"]) == 27
    assert len(summary["count_by_category"]) == 15
    # the production skew survives scaling: has_phenotype carries ~48% of
    # edge mass — the reason degree stats take the salted two-phase path
    assert summary["count_by_predicate"]["biolink:has_phenotype"] >= (
        0.45 * summary["total_edges"]
    )


def test_rollup_facet_gate(spark):
    """The stats facet collect is size-gated (SCALE.md): a high-cardinality
    column raises a named error instead of pulling an unbounded result onto
    the driver; a within-bound column still aggregates exactly."""
    import pytest

    from ecokg_spark.operators.stats import _rollup_counts

    df = spark.range(50).selectExpr("CAST(id AS STRING) AS k")
    with pytest.raises(ValueError, match="'k'.*distinct"):
        _rollup_counts(df, "k", max_facets=10)
    total, facet = _rollup_counts(df, "k", max_facets=50)
    assert total == 50 and len(facet) == 50 and facet["7"] == 1
