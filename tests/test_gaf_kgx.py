"""GAF -> KGX transform: golden-output test against hand-derived expected
rows (reference semantics: planteome.py 'genetic' + ortholog paths)."""

from pyspark.sql import functions as F

from ecokg_spark.transforms.gaf_kgx import GAF_COLS, gaf_to_kgx


def _row(**kw):
    base = {c: "" for c in GAF_COLS}
    base.update(DB="PO", DB_Reference="REF", Evidence_Code="IEA",
                DB_Object_Type="gene", Date="20240101", Assigned_By="PO")
    base.update(kw)
    return tuple(base[c] for c in GAF_COLS)


def _gaf(spark, rows):
    return spark.createDataFrame(rows, ", ".join(f"{c} string" for c in GAF_COLS))


def test_genetic_transform_golden(spark):
    rows = [
        # arabidopsis: gene id from DB_Object_Name; AT + '.' suffix stripped
        _row(DB_Object_ID="X1", DB_Object_Symbol="SYM1", Ontology_ID="TO:0000001",
             Aspect="T", DB_Object_Name="AT1G01010.2", Taxon="taxon:3702"),
        # rice: gene id from DB_Object_ID, '-' suffix stripped, LOC kept
        _row(DB_Object_ID="LOC_Os01g01010-1", DB_Object_Symbol="SYM2",
             Ontology_ID="GO:0005634", Aspect="C", Taxon="taxon:4530"),
        # maize: '_' suffix stripped
        _row(DB_Object_ID="Zm00001eb000010_T001", DB_Object_Symbol="SYM3",
             Ontology_ID="GO:0008150", Aspect="P", Taxon="taxon:4577"),
        # unknown taxon -> dropped (reference: continue)
        _row(DB_Object_ID="G4", DB_Object_Symbol="SYM4", Ontology_ID="TO:9",
             Aspect="T", Taxon="taxon:9606"),
        # duplicate of row 1 -> dedup gates collapse it
        _row(DB_Object_ID="X1", DB_Object_Symbol="SYM1", Ontology_ID="TO:0000001",
             Aspect="T", DB_Object_Name="AT1G01010.2", Taxon="taxon:3702"),
    ]
    nodes, edges = gaf_to_kgx(_gaf(spark, rows))
    node_map = {r["id"]: (r["name"], r["category"], r["provided_by"])
                for r in nodes.collect()}
    edge_set = {(r["subject"], r["predicate"], r["object"], r["relation"])
                for r in edges.collect()}

    assert node_map["AT1G01010"] == ("SYM1", "biolink:GenomicEntity", "PO-planteome")
    assert node_map["LOC_Os01g01010"][1] == "biolink:GenomicEntity"
    assert node_map["Zm00001eb000010"][1] == "biolink:GenomicEntity"
    assert node_map["NCBITaxon:3702"] == (
        "Arabidopsis thaliana", "biolink:OrganismTaxon", "PO-planteome")
    assert node_map["TO:0000001"][1] == "biolink:PhenotypicFeature"
    assert node_map["GO:0005634"][1] == "biolink:CellularComponent"
    assert node_map["GO:0008150"][1] == "biolink:BiologicalProcess"
    assert "G4" not in node_map and "NCBITaxon:9606" not in node_map

    assert ("AT1G01010", "biolink:in_taxon", "NCBITaxon:3702", "RO:0002162") in edge_set
    assert ("AT1G01010", "biolink:has_phenotype", "TO:0000001", "RO:0002200") in edge_set
    assert ("LOC_Os01g01010", "biolink:active_in", "GO:0005634", "RO:0002432") in edge_set
    assert ("Zm00001eb000010", "biolink:regulates", "GO:0008150", "RO:0011002") in edge_set
    # one dedup'd edge per (subject, object)
    assert edges.count() == edges.dropDuplicates(["subject", "object"]).count()
    assert edges.columns == [
        "subject", "predicate", "object", "relation", "has_attribute",
        "has_attribute_type", "has_quantitative_value", "has_unit",
        "has_qualitative_value", "provided_by"]


def test_alias_map_fallback(spark):
    rows = [
        # rice id without LOC anywhere -> alias map lookup
        _row(DB_Object_ID="Os01g0100100", DB_Object_Symbol="SYM5",
             Ontology_ID="GO:0003674", Aspect="F",
             DB_Object_Name="x", Taxon="taxon:39947"),
    ]
    rice_map = spark.createDataFrame(
        [("Os01g0100100", "LOC_Os01g01010")], "from_id string, to_id string")
    nodes, edges = gaf_to_kgx(_gaf(spark, rows), rice_map=rice_map)
    ids = {r["id"] for r in nodes.collect()}
    assert "LOC_Os01g01010" in ids and "Os01g0100100" not in ids
    assert ("LOC_Os01g01010", "biolink:enables", "GO:0003674", "RO:0002327") in {
        (r["subject"], r["predicate"], r["object"], r["relation"])
        for r in edges.collect()}


def _trait_dims(spark):
    cat = spark.createDataFrame(
        [
            ("TO:0000100", "flower color", "purple", "TO:0000101"),
            ("TO:0000100", "flower color", "white", "TO:0000102"),
            ("TO:0000433", "ear diameter", "thick", "TO:0000434"),
        ],
        "ontology_id string, label string, pheno string, pheno_id string",
    )
    num = spark.createDataFrame(
        [
            ("TO:0000200", "plant height", "cm"),
            ("TO:0000344", "lodging", "scale"),
        ],
        "ontology_id string, label string, unit string",
    )
    return cat, num


def test_germplasm_transform_golden(spark):
    """planteome.py:283-478 semantics: germplasm/org/trait nodes,
    in_taxon + has_phenotype edges, '='/'(' pheno parse, compound remap,
    1-9 banding, 999/MX skip, measurement property columns."""
    from ecokg_spark.transforms.gaf_kgx import germplasm_to_kgx

    rows = [
        # categorical via '=' delimiter (+ '_' suffix trim: purple_x -> purple)
        _row(DB_Object_ID="GERM1", DB_Object_Symbol="Acc-1",
             Ontology_ID="TO:0000100", Taxon="taxon:4577",
             Annotation_Extension="has_phenotype(FLOWER_COLOR=purple_x)"),
        # numerical via '(' delimiter; value 12.5 with (cm) unit marker
        _row(DB_Object_ID="GERM1", DB_Object_Symbol="Acc-1",
             Ontology_ID="TO:0000200", Taxon="taxon:4577",
             Annotation_Extension="plant_height(12.5)"),
        # compound trait id remapped by AE substring (EAR_DIAMETER -> TO:0000433)
        _row(DB_Object_ID="GERM2", DB_Object_Symbol="Acc-2",
             Ontology_ID="TO:0000969", Taxon="taxon:4577",
             Annotation_Extension="trait(EAR_DIAMETER=thick)"),
        # 1-9 banding on TO:0000344: 5 -> TO:2000432
        _row(DB_Object_ID="GERM3", DB_Object_Symbol="Acc-3",
             Ontology_ID="TO:0000344", Taxon="taxon:4577",
             Annotation_Extension="lodging(5)"),
        # missing-value row: trait skipped, germplasm/org kept
        _row(DB_Object_ID="GERM4", DB_Object_Symbol="Acc-4",
             Ontology_ID="TO:0000100", Taxon="taxon:4577",
             Annotation_Extension="x(999)"),
        # unknown taxon -> dropped entirely
        _row(DB_Object_ID="GERM5", DB_Object_Symbol="Acc-5",
             Ontology_ID="TO:0000100", Taxon="taxon:9606",
             Annotation_Extension="x(=purple)"),
    ]
    cat, num = _trait_dims(spark)
    nodes, edges = germplasm_to_kgx(_gaf(spark, rows), cat, num)
    node_map = {r["id"]: (r["name"], r["category"]) for r in nodes.collect()}
    e_rows = edges.collect()
    e_map = {(r["subject"], r["object"]): r for r in e_rows}

    # nodes: germplasm (OrganismalEntity), org, trait labels from dicts
    assert node_map["GERMPLASM:GERM1"] == ("Acc-1", "biolink:OrganismalEntity")
    assert node_map["GERMPLASM:GERM4"][1] == "biolink:OrganismalEntity"
    assert "GERMPLASM:GERM5" not in node_map
    assert node_map["NCBITaxon:4577"] == ("Zea mays", "biolink:OrganismTaxon")
    assert node_map["TO:0000100"] == ("flower color", "biolink:PhenotypicFeature")
    assert node_map["TO:0000200"] == ("plant height", "biolink:PhenotypicFeature")
    assert node_map["TO:0000433"] == ("ear diameter", "biolink:PhenotypicFeature")
    # banding emits NO trait node (reference `continue`s before node write)
    assert "TO:0000344" not in node_map

    # in_taxon edges for every germplasm incl. the 999 row
    for g in ["GERM1", "GERM2", "GERM3", "GERM4"]:
        r = e_map[(f"GERMPLASM:{g}", "NCBITaxon:4577")]
        assert (r["predicate"], r["relation"]) == ("biolink:in_taxon", "RO:0002162")

    # categorical: has_attribute_type = value curie
    r = e_map[("GERMPLASM:GERM1", "TO:0000100")]
    assert r["predicate"] == "biolink:has_phenotype"
    assert r["has_attribute_type"] == "TO:0000101"
    # compound remap row resolves against the remapped id's value dict
    assert e_map[("GERMPLASM:GERM2", "TO:0000433")]["has_attribute_type"] == "TO:0000434"
    # numerical: label/value/unit property columns
    r = e_map[("GERMPLASM:GERM1", "TO:0000200")]
    assert (r["has_attribute"], r["has_attribute_type"],
            r["has_quantitative_value"], r["has_unit"]) == (
        "plant height", "TO:0000200", "12.5", "cm")
    # banding: 5 -> TO:2000432 in has_attribute_type
    assert e_map[("GERMPLASM:GERM3", "TO:0000344")]["has_attribute_type"] == "TO:2000432"
    # 999 row contributes no trait edge
    assert ("GERMPLASM:GERM4", "TO:0000100") not in e_map


def test_germplasm_measurement_dedup_key(spark):
    """Two distinct numerical values for the same (germplasm, trait) both
    survive (reference key r = ECO:obj-onto-pheno, planteome.py:450); the
    same value twice collapses."""
    from ecokg_spark.transforms.gaf_kgx import germplasm_to_kgx

    rows = [
        _row(DB_Object_ID="G", DB_Object_Symbol="A", Ontology_ID="TO:0000200",
             Taxon="taxon:4577", Annotation_Extension="h(12.5)"),
        _row(DB_Object_ID="G", DB_Object_Symbol="A", Ontology_ID="TO:0000200",
             Taxon="taxon:4577", Annotation_Extension="h(13)"),
        _row(DB_Object_ID="G", DB_Object_Symbol="A", Ontology_ID="TO:0000200",
             Taxon="taxon:4577", Annotation_Extension="h(12.5)"),
    ]
    cat, num = _trait_dims(spark)
    _nodes, edges = germplasm_to_kgx(_gaf(spark, rows), cat, num)
    vals = sorted(
        r["has_quantitative_value"] for r in edges.collect()
        if r["predicate"] == "biolink:has_phenotype")
    assert vals == ["12.5", "13"]


def test_qtl_transform_golden(spark):
    from ecokg_spark.transforms.gaf_kgx import qtl_to_kgx

    rows = [
        _row(DB_Object_ID="QTL1", DB_Object_Symbol="q1", Ontology_ID="TO:0000050",
             Taxon="taxon:4530"),
        _row(DB_Object_ID="QTL1", DB_Object_Symbol="q1", Ontology_ID="TO:0000051",
             Taxon="taxon:4530"),
        _row(DB_Object_ID="QTL2", DB_Object_Symbol="q2", Ontology_ID="TO:0000050",
             Taxon="taxon:9606"),  # unknown taxon dropped
    ]
    nodes, edges = qtl_to_kgx(_gaf(spark, rows))
    node_map = {r["id"]: (r["name"], r["category"]) for r in nodes.collect()}
    assert node_map["QTL1"] == ("q1", "biolink:GenomicEntity")
    assert "QTL2" not in node_map
    e = {(r["subject"], r["predicate"], r["object"], r["relation"])
         for r in edges.collect()}
    assert ("QTL1", "biolink:in_taxon", "NCBITaxon:4530", "RO:0002162") in e
    assert ("QTL1", "biolink:has_phenotype", "TO:0000050", "RO:0002200") in e
    assert ("QTL1", "biolink:has_phenotype", "TO:0000051", "RO:0002200") in e
    assert len(e) == 3


def test_ortholog_fanout(spark):
    rows = [
        _row(DB_Object_ID="LOC_Os01g01010", DB_Object_Symbol="S",
             Ontology_ID="GO:0008150", Aspect="P",
             With_or_From="UniProtKB:Q1|UniProtKB:Q2|UniProtKB:Q1",
             Taxon="taxon:4530"),
    ]
    nodes, edges = gaf_to_kgx(_gaf(spark, rows), with_orthologs=True)
    e = {(r["subject"], r["predicate"], r["object"]) for r in edges.collect()}
    assert ("LOC_Os01g01010", "biolink:orthologous_to", "Q1") in e
    assert ("LOC_Os01g01010", "biolink:orthologous_to", "Q2") in e
    # pipe-dedup: Q1 appears once
    assert len([x for x in e if x[2] == "Q1" and x[1] == "biolink:orthologous_to"]) == 1
    n = {r["id"]: r["name"] for r in nodes.collect()}
    assert n["Q1"] == "" and n["Q2"] == ""
