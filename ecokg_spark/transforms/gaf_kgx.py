"""GAF -> KGX transform: the reference's Planteome association pipeline
re-expressed as one declarative Spark dataflow.

Mirrors /root/reference/eco_kg/transform_utils/planteome/planteome.py
("genetic" + ortholog file kinds) operator-for-operator:

  - GAF scan: 17 fixed columns, '!' comment lines (planteome.py:122-124; S6)
  - taxon whitelist dispatch, unknown taxa dropped (planteome.py:174-219; P6)
    -> broadcast dim join, drop = inner-join miss
  - gene-id selection + normalization chains (planteome.py:222-264; F1/F5/J4)
    -> when/coalesce chains + broadcast alias-map left joins
  - Aspect 6-way dispatch to (node category, predicate, relation)
    (planteome.py:562-608 + constants :127-170; F7) -> broadcast dim join
  - With_or_From '|'-split ortholog fanout, per-row dedup
    (planteome.py:644-681; J7) -> explode(array_distinct(split))
  - seen_node / seen_edge dedup gates (planteome.py:102-103; A1)
    -> dropDuplicates on the reference's exact keys (id; subject+object)

Output shapes match the reference headers: nodes
['id','name','category','provided_by'] (planteome.py:27), edges the 10-col
KGX header (planteome.py:28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_COLS = ["id", "name", "category", "provided_by"]
EDGE_COLS = [
    "subject", "predicate", "object", "relation",
    "has_attribute", "has_attribute_type", "has_quantitative_value",
    "has_unit", "has_qualitative_value", "provided_by",
]

# taxon whitelist: tax_id -> (org_name, gene id source column)
# planteome.py:181-218 — the 12-way elif chain; unknown taxa `continue`
TAXON_DIM = [
    ("3702", "Arabidopsis thaliana", "DB_Object_Name"),
    ("4530", "Oryza sativa", "DB_Object_ID"),
    ("39947", "Oryza sativa japonica", "DB_Object_ID"),
    ("39946", "Oryza sativa indica", "DB_Object_ID"),
    ("1080340", "Oryza sativa japonica x indica", "DB_Object_ID"),
    ("4558", "Sorghum bicolor", "DB_Object_ID"),
    ("3694", "Populus trichocarpa", "DB_Object_ID"),
    ("4577", "Zea mays", "DB_Object_ID"),
    ("381124", "Zea mays mays", "DB_Object_ID"),
    ("112001", "Zea mays huehuetenangensis", "DB_Object_ID"),
    ("76912", "Zea mays parviglumis", "DB_Object_ID"),
    ("4579", "Zea mays mexicana", "DB_Object_ID"),
]
RICE_TAXA = ["4530", "39947", "39946", "1080340"]
CORN_TAXA = ["381124", "4577", "112001", "76912", "4579"]

# Aspect -> (ontology-node category, predicate, relation)
# node types planteome.py:129-135, edge constants :149-166, dispatch :562-608
ASPECT_DIM = [
    ("T", "biolink:PhenotypicFeature", "biolink:has_phenotype", "RO:0002200"),
    ("A", "biolink:AnatomicalEntity", "biolink:expressed_in", "RO:0002206"),
    ("G", "biolink:LifeStage", "biolink:expressed_in", "RO:0002206"),
    ("C", "biolink:CellularComponent", "biolink:active_in", "RO:0002432"),
    ("F", "biolink:MolecularFunction", "biolink:enables", "RO:0002327"),
    ("P", "biolink:BiologicalProcess", "biolink:regulates", "RO:0011002"),
]

GENE_CATEGORY = "biolink:GenomicEntity"       # planteome.py:128
ORG_CATEGORY = "biolink:OrganismTaxon"        # planteome.py:127
IN_TAXON = ("biolink:in_taxon", "RO:0002162")  # planteome.py:149-150
ORTHOLOG = ("biolink:orthologous_to", "RO:HOM0000017")  # planteome.py:165-166


def _empty_edge_props(df: DataFrame) -> DataFrame:
    for c in ["has_attribute", "has_attribute_type", "has_quantitative_value",
              "has_unit", "has_qualitative_value"]:
        df = df.withColumn(c, F.lit(""))
    return df


def _normalize_gene_id(df: DataFrame, rice_map: DataFrame | None,
                       corn_map: DataFrame | None) -> DataFrame:
    """Declarative mirror of planteome.py:222-264 (genetic file type).

    rice taxa : prefer a 'LOC'-bearing id from (picked, Name, Symbol);
                strip a '-suffix'; alias-map LOC lookup as fallback.
    corn taxa : strip a '_suffix'; alias-map lookup unless already Zm00001eb.
    3702      : keep 'AT...' ids ('.'-suffix stripped), else first '|'-token
                of Synonym, else DB_Object_ID; 'At' -> upper-case.
    """
    g = F.col("_gene_raw")
    is_rice = F.col("tax_id").isin(RICE_TAXA)
    is_corn = F.col("tax_id").isin(CORN_TAXA)
    is_arab = F.col("tax_id") == "3702"

    rice_pick = F.when(
        g.contains("LOC"), g
    ).when(F.col("DB_Object_Name").contains("LOC"), F.col("DB_Object_Name")) \
     .when(F.col("DB_Object_Symbol").contains("LOC"), F.col("DB_Object_Symbol")) \
     .otherwise(g)
    rice_pick = F.when(rice_pick.contains("-"),
                       F.substring_index(rice_pick, "-", 1)).otherwise(rice_pick)

    corn_pick = F.when(g.contains("_"), F.substring_index(g, "_", 1)).otherwise(g)

    syn_first = F.substring_index(F.col("DB_Object_Synonym"), "|", 1)
    arab_pick = (
        F.when(g.contains("AT") & g.contains("."), F.substring_index(g, ".", 1))
        .when(g.contains("AT") & (F.length(g) > 9), syn_first)
        .when(g.contains("AT"), g)
        .when(syn_first.contains("AT"), syn_first)
        .otherwise(F.col("DB_Object_ID"))
    )
    arab_pick = F.when(arab_pick.contains("At"), F.upper(arab_pick)).otherwise(arab_pick)

    df = df.withColumn(
        "_gene_norm",
        F.when(is_rice, rice_pick).when(is_corn, corn_pick)
        .when(is_arab, arab_pick).otherwise(g),
    )

    # alias-map fallbacks (J4): broadcast left join + coalesce(alias, orig)
    if rice_map is not None:
        m = F.broadcast(rice_map.select(F.col("from_id").alias("_rm_from"),
                                        F.col("to_id").alias("_rm_to")))
        df = df.join(m, (F.col("_gene_norm") == F.col("_rm_from"))
                     & is_rice & ~F.col("_gene_norm").contains("LOC"), "left")
        df = df.withColumn("_gene_norm", F.coalesce("_rm_to", "_gene_norm")).drop(
            "_rm_from", "_rm_to")
    if corn_map is not None:
        m = F.broadcast(corn_map.select(F.col("from_id").alias("_cm_from"),
                                        F.col("to_id").alias("_cm_to")))
        df = df.join(m, (F.col("_gene_norm") == F.col("_cm_from"))
                     & is_corn & ~F.col("_gene_norm").contains("Zm00001eb"), "left")
        df = df.withColumn("_gene_norm", F.coalesce("_cm_to", "_gene_norm")).drop(
            "_cm_from", "_cm_to")

    # AGI_LocusCode:AT... -> AT... (planteome.py:526-528)
    return df.withColumn(
        "gene_id",
        F.when(F.col("_gene_norm").contains("AGI_LocusCode"),
               F.substring_index(F.col("_gene_norm"), ":", -1))
        .otherwise(F.col("_gene_norm")),
    )


def gaf_to_kgx(
    gaf: DataFrame,
    source_name: str = "planteome",
    with_orthologs: bool = False,
    rice_map: DataFrame | None = None,
    corn_map: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """GAF association DataFrame (17 string columns) -> (nodes, edges) KGX
    DataFrames, 'genetic' file-type semantics. ``with_orthologs`` adds the
    ortholog fanout ('ortholog' in data_file branch, planteome.py:644-681).
    """
    spark = gaf.sparkSession
    taxon_dim = F.broadcast(spark.createDataFrame(
        TAXON_DIM, "tax_id string, org_name string, gene_src string"))
    aspect_dim = F.broadcast(spark.createDataFrame(
        ASPECT_DIM, "Aspect string, onto_category string, predicate string, relation string"))

    base = gaf.withColumn("tax_id", F.substring_index("Taxon", ":", -1))
    # whitelist dispatch: inner join == reference's `continue` on unknown taxa
    base = base.join(taxon_dim, "tax_id", "inner")
    base = base.withColumn(
        "_gene_raw",
        F.when(F.col("gene_src") == "DB_Object_Name", F.col("DB_Object_Name"))
        .otherwise(F.col("DB_Object_ID")),
    )
    base = _normalize_gene_id(base, rice_map, corn_map)
    base = (
        base.withColumn("org_id", F.concat(F.lit("NCBITaxon:"), F.col("tax_id")))
        .withColumn("provided_by", F.concat("DB", F.lit("-"), F.lit(source_name)))
        .withColumn("label", F.col("DB_Object_Symbol"))
        .join(aspect_dim, "Aspect", "inner")
    )

    gene_nodes = base.select(
        F.col("gene_id").alias("id"), F.col("label").alias("name"),
        F.lit(GENE_CATEGORY).alias("category"), "provided_by")
    org_nodes = base.select(
        F.col("org_id").alias("id"), F.col("org_name").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"), "provided_by")
    onto_nodes = base.select(
        F.col("Ontology_ID").alias("id"), F.col("label").alias("name"),
        F.col("onto_category").alias("category"), "provided_by")

    g2org = base.select(
        F.col("gene_id").alias("subject"), F.lit(IN_TAXON[0]).alias("predicate"),
        F.col("org_id").alias("object"), F.lit(IN_TAXON[1]).alias("relation"),
        "provided_by")
    g2onto = base.select(
        F.col("gene_id").alias("subject"), F.col("predicate"),
        F.col("Ontology_ID").alias("object"), F.col("relation"), "provided_by")

    nodes = [gene_nodes, org_nodes, onto_nodes]
    edges = [g2org, g2onto]

    if with_orthologs:
        orth = base.where(F.col("With_or_From").isNotNull()
                          & (F.col("With_or_From") != "")).select(
            "gene_id", "provided_by",
            F.explode(F.array_distinct(F.transform(
                F.split("With_or_From", r"\|"),
                lambda t: F.substring_index(t, ":", -1),
            ))).alias("orth_id"),
        )
        nodes.append(orth.select(
            F.col("orth_id").alias("id"), F.lit("").alias("name"),
            F.lit(GENE_CATEGORY).alias("category"), "provided_by"))
        edges.append(orth.select(
            F.col("gene_id").alias("subject"), F.lit(ORTHOLOG[0]).alias("predicate"),
            F.col("orth_id").alias("object"), F.lit(ORTHOLOG[1]).alias("relation"),
            "provided_by"))

    all_nodes = nodes[0]
    for n in nodes[1:]:
        all_nodes = all_nodes.unionByName(n)
    all_edges = edges[0]
    for e in edges[1:]:
        all_edges = all_edges.unionByName(e)

    # A1 dedup gates: seen_node keys on id; seen_edge keys on subject+object
    # concat (planteome.py edge keys are `str(g)+str(org_id)` etc.)
    out_nodes = all_nodes.dropDuplicates(["id"]).select(*NODE_COLS)
    out_edges = _empty_edge_props(
        all_edges.dropDuplicates(["subject", "object"])
    ).select(*EDGE_COLS)
    return out_nodes, out_edges
