"""GAF -> KGX transform: golden-output test against hand-derived expected
rows (reference semantics: planteome.py 'genetic' + ortholog paths)."""

from pyspark.sql import functions as F

from ecokg_spark.transforms.gaf_kgx import gaf_to_kgx

GAF_COLS = [
    "DB", "DB_Object_ID", "DB_Object_Symbol", "Qualifier", "Ontology_ID",
    "DB_Reference", "Evidence_Code", "With_or_From", "Aspect",
    "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type", "Taxon",
    "Date", "Assigned_By", "Annotation_Extension", "Gene_Product_Form_ID",
]


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
