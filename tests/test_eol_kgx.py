"""EOL TraitBank -> KGX transform: golden tests for hierarchy, measurement
decode (categorical + numerical priority pick), association join + self-loop
drop (reference: eol_traits.py)."""

from ecokg_spark.transforms.eol_kgx import eol_pages_to_kgx, eol_traits_to_kgx

PAGES = [
    # page_id, parent_id, rank, canonical
    ("1", "10", "species", "Solanum lycopersicum"),
    ("2", "10", "species", "Solanum tuberosum"),
    ("10", "100", "genus", "Solanum"),
]

TRAIT_COLS = ("eol_pk string, page_id string, object_page_id string, "
              "resource_id string, predicate string, value_uri string, "
              "measurement string, units string, units_uri string, "
              "normal_measurement string, normal_units string, "
              "normal_units_uri string")


def _pages(spark):
    return spark.createDataFrame(
        PAGES, "page_id string, parent_id string, rank string, canonical string")


def test_pages_hierarchy(spark):
    nodes, edges = eol_pages_to_kgx(_pages(spark))
    nm = {r["id"]: (r["name"], r["has_attribute"]) for r in nodes.collect()}
    # page node keeps canonical + rank; bare parent (100) has empty label
    assert nm["EOL:1"] == ("Solanum lycopersicum", "species")
    assert nm["EOL:100"] == ("", "")
    # 10 is both a parent and a page -> labeled row wins
    assert nm["EOL:10"] == ("Solanum", "genus")
    es = {(r["subject"], r["predicate"], r["object"]) for r in edges.collect()}
    assert ("EOL:1", "biolink:subclass_of", "EOL:10") in es
    assert ("EOL:10", "biolink:subclass_of", "EOL:100") in es
    assert len(es) == 3


def test_traits_measurement_and_association(spark):
    trait_dim = spark.createDataFrame(
        [
            ("uri:leafarea", "measurement", "numerical", "leaf area", "TO:0002"),
            ("uri:habit", "measurement", "categorical", "growth habit", "TO:0099"),
            ("uri:eats", "association", "", "eats", "RO:0002470"),
            ("uri:loc", "measurement", "numerical", "location", "ENVO:1"),
        ],
        "trait_uri string, trait_type string, data_type string, label string, curie string",
    )
    value_dim = spark.createDataFrame(
        [("uri:habit", "uri:vine", "vine", "PATO:1")],
        "trait_uri string, value_uri string, label string, curie string",
    )
    unit_dim = spark.createDataFrame(
        [("uri:cm2", "square centimeter")], "unit_uri string, label string")
    traits = spark.createDataFrame(
        [
            # numerical with normal_* present -> normal pick + unit uri decode
            ("t1", "1", "", "R5", "uri:leafarea", "", "9", "cm2", "", "3.5", "", "uri:cm2"),
            # numerical without normal_* -> falls back to measurement/units
            ("t2", "2", "", "R5", "uri:leafarea", "", "7", "cm2raw", "", "", "", ""),
            # categorical -> (uri, value) nested decode
            ("t3", "1", "", "R5", "uri:habit", "uri:vine", "", "", "", "", "", ""),
            # association -> pages join, org-org edge
            ("t4", "1", "2", "R5", "uri:eats", "", "", "", "", "", "", ""),
            # association self-loop -> dropped
            ("t5", "1", "1", "R5", "uri:eats", "", "", "", "", "", "", ""),
            # association to unknown page -> join miss -> dropped
            ("t6", "1", "999", "R5", "uri:eats", "", "", "", "", "", "", ""),
            # skipped location uri
            ("t7", "1", "", "R5", "uri:loc", "", "1", "", "", "", "", ""),
        ],
        TRAIT_COLS,
    )
    nodes, edges = eol_traits_to_kgx(
        traits, _pages(spark), trait_dim, value_dim, unit_dim,
        location_uris=["uri:loc"],
    )
    e = {r["subject"] + "|" + r["object"]: r.asDict() for r in edges.collect()}

    m1 = e["EOL:1|TO:0002"]
    assert m1["predicate"] == "biolink:has_phenotype"
    assert m1["has_quantitative_value"] == "3.5"
    assert m1["has_unit"] == "square centimeter"  # uri -> label decode
    assert m1["provided_by"] == "R5-EOL"

    m2 = e["EOL:2|TO:0002"]
    assert m2["has_quantitative_value"] == "7"
    assert m2["has_unit"] == "cm2raw"  # fallback path, no decode available

    m3 = e["EOL:1|TO:0099"]
    assert m3["has_attribute"] == "vine" and m3["has_attribute_type"] == "PATO:1"
    assert m3["has_quantitative_value"] == ""

    a = e["EOL:1|EOL:2"]
    assert a["predicate"] == "biolink:interacts_with" and a["relation"] == "RO:0002434"
    assert a["has_attribute"] == "eats"

    # self-loop, join-miss, and location rows produced no edges
    assert len(e) == 4
    nm = {r["id"]: r["name"] for r in nodes.collect()}
    assert nm["EOL:2"] == "Solanum tuberosum"  # association target node
    assert nm["TO:0002"] == "leaf area"
