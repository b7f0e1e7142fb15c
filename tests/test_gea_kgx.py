"""Gene Expression Atlas -> KGX: alias-list explode, mystery-gene
passthrough, sorghum regex normalization, predicate->relation dispatch."""

from ecokg_spark.transforms.gea_kgx import GEA_COLS, gea_to_kgx


def _row(**kw):
    base = {c: "" for c in GEA_COLS}
    base.update(Experiment_accession="E1")
    base.update(kw)
    return tuple(base[c] for c in GEA_COLS)


def _df(spark, rows):
    return spark.createDataFrame(rows, ", ".join(f"{c} string" for c in GEA_COLS))


def test_gea_transform(spark):
    rows = [
        # rice: alias map 1:2 -> explode into two genes/edges
        _row(Gene="Os01g0100100", Species="oryza sativa", PECOid="PECO:0007048",
             ROid="biolink:increases_expression_of"),
        # corn mystery gene: passthrough, no map lookup
        _row(Gene="Zm00001d027187", Species="zea mays", PECOid="PECO:0007048",
             ROid="biolink:decreases_expression_of"),
        # corn mapped gene
        _row(Gene="GRMZM2G000001", Species="zea mays", PECOid="PECO:0007174",
             ROid="biolink:increases_expression_of"),
        # sorghum regex normalization
        _row(Gene="SORBI_3001G000100", Species="sorghum bicolor",
             PECOid="PECO:0007174", ROid="biolink:decreases_expression_of"),
        # unknown predicate -> dropped
        _row(Gene="Gx", Species="zea mays", PECOid="PECO:1",
             ROid="biolink:unknown"),
    ]
    rice_map = spark.createDataFrame(
        [("Os01g0100100", ["LOC_Os01g01010", "LOC_Os01g01011"])],
        "from_id string, to_ids array<string>")
    corn_map = spark.createDataFrame(
        [("GRMZM2G000001", ["Zm00001eb000010"]),
         ("Zm00001d027187", ["SHOULD_NOT_APPLY"])],
        "from_id string, to_ids array<string>")
    nodes, edges = gea_to_kgx(_df(spark, rows), rice_map, corn_map)

    nm = {r["id"]: r["category"] for r in nodes.collect()}
    es = {(r["subject"], r["predicate"], r["object"], r["relation"])
          for r in edges.collect()}

    # rice alias fanout
    assert ("PECO:0007048", "biolink:increases_expression_of",
            "LOC_Os01g01010", "RO:0003003") in es
    assert ("PECO:0007048", "biolink:increases_expression_of",
            "LOC_Os01g01011", "RO:0003003") in es
    # mystery gene untouched despite being in the corn map
    assert ("PECO:0007048", "biolink:decreases_expression_of",
            "Zm00001d027187", "RO:0003002") in es
    assert "SHOULD_NOT_APPLY" not in nm
    # corn mapped
    assert ("PECO:0007174", "biolink:increases_expression_of",
            "Zm00001eb000010", "RO:0003003") in es
    # sorghum regex
    assert ("PECO:0007174", "biolink:decreases_expression_of",
            "Sobic.001G000100", "RO:0003002") in es
    # unknown predicate dropped entirely
    assert "Gx" not in nm and len(es) == 5
    # node categories
    assert nm["PECO:0007048"] == "biolink:EnvironmentalExposure"
    assert nm["LOC_Os01g01010"] == "biolink:GenomicEntity"
