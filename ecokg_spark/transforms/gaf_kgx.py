"""GAF -> KGX transform: the reference's Planteome association pipeline
re-expressed as one declarative Spark dataflow.

Mirrors /root/reference/eco_kg/transform_utils/planteome/planteome.py
("genetic" + ortholog + "germplasm" + "qtl" file kinds)
operator-for-operator:

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

from ecokg_spark.operators.merge import dedup_min

# the 17 fixed GAF columns (planteome.py:124 header_row; S6)
GAF_COLS = [
    "DB", "DB_Object_ID", "DB_Object_Symbol", "Qualifier", "Ontology_ID",
    "DB_Reference", "Evidence_Code", "With_or_From", "Aspect",
    "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type", "Taxon",
    "Date", "Assigned_By", "Annotation_Extension", "Gene_Product_Form_ID",
]

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

GERMPLASM_CATEGORY = "biolink:OrganismalEntity"   # planteome.py:138
TRAIT_CATEGORY = "biolink:PhenotypicFeature"      # planteome.py:133
QTL_CATEGORY = "biolink:GenomicEntity"            # planteome.py:137
HAS_PHENOTYPE = ("biolink:has_phenotype", "RO:0002200")  # planteome.py:169-170

# compound (overloaded) trait ids + their Annotation_Extension-substring
# disambiguation (planteome.py:91, 334-364). The reference applies the 15
# `if` statements sequentially so a LATER match overwrites an earlier one;
# a when() chain takes the FIRST match, so the list is stored in the
# reference's order and the chain is built over reversed(...).
COMPOUND_TRAITS = ["TO:0000969", "TO:0002629", "TO:0000068", "TO:0000439"]
COMPOUND_REMAP = [
    ("EAR_DIAMETER", "TO:0000433"),
    ("EAR_HEIGHT", "TO:0000683"),
    ("EAR_LENGTH", "TO:0000431"),
    ("EAR_NUMBER", "TO:0000443"),
    ("EAR_SHAPE", "TO:0000964"),
    ("KERNEL_ROW_ARRANGEMENT", "TO:2000109"),
    ("KERNEL_TYPE", "TO:0000575"),
    ("ROOT_LODGING", "TO:2000158"),
    ("STALK_LODGING", "TO:2000159"),
    ("DIPLODIA_STALK_ROT", "TO:2000398"),
    ("GRAY_LEAF_SPOT", "TO:2000399"),
    ("COMMON_RUST", "TO:2000400"),
    ("COMMON_SMUT", "TO:2000401"),
    ("NORTHERN_LEAF_BLIGHT", "TO:0000691"),
    ("ECB2STLK", "TO:0005009"),
]

# pheno values carrying no data (planteome.py:411-412)
MISSING_PHENO = ["999", "", "99", "MX", "Mixture"]

# numeric-unit markers that flip a categorical-dict trait to numerical
# (planteome.py:365-374, list `z`)
NUMERIC_UNIT_MARKERS = ["(cm)", "(count)", "(mm)", "(gm)"]

# special full-phrase pheno values exempt from the '_'-prefix trim
# (planteome.py:328, list `q`)
PHRASE_PHENOS = [
    "Very_weak_all_plants_flat_", "Weak_most_plants_nearly_flat_",
    "Strong_no_lodging_", "Intermediate_most_plants_moderately_lodged_",
    "Moderately_strong_most_plants_leaning_", "Short__<30cm_",
    "Intermediate__30-59_cm_", "Tall__>59_cm_",
]

# 1-9 scale banding for TO:0000344 / TO:0000207 (planteome.py:377-383)
VAL_344 = {"1": "TO:2000431", "2": "TO:2000431", "3": "TO:2000431",
           "4": "TO:2000432", "5": "TO:2000432", "6": "TO:2000432",
           "7": "TO:2000430", "8": "TO:2000430", "9": "TO:2000430"}
VAL_207 = {"1": "TO:2000434", "2": "TO:2000434", "3": "TO:2000434",
           "4": "TO:2000435", "5": "TO:2000435", "6": "TO:2000435",
           "7": "TO:2000433", "8": "TO:2000433", "9": "TO:2000433"}


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
    out_nodes = dedup_min(all_nodes, ["id"]).select(*NODE_COLS)
    out_edges = _empty_edge_props(
        dedup_min(all_edges, ["subject", "object"])
    ).select(*EDGE_COLS)
    return out_nodes, out_edges


def _in_chain(col, pairs):
    """when() chain over (substring, value) pairs — FIRST match wins, so
    callers pass reversed(reference-order) for last-if-wins parity."""
    expr = None
    for sub, val in pairs:
        branch = F.when(col.contains(sub), F.lit(val))
        expr = branch if expr is None else expr.when(col.contains(sub), F.lit(val))
    return expr


def _map_chain(col, mapping: dict):
    expr = None
    for k, v in mapping.items():
        expr = (F.when(col == k, F.lit(v)) if expr is None
                else expr.when(col == k, F.lit(v)))
    return expr


def _parse_pheno(ae):
    """Annotation_Extension -> pheno value (planteome.py:317-332).

    '=' delimiter: token after '=', ')' stripped, '_'-prefix trim.
    '(' delimiter: token after '(', ')' stripped, '_'-prefix trim UNLESS
    the value is one of the 8 full-phrase PHRASE_PHENOS.
    Missing/other AE -> NULL (the reference `pass`es and later reads a
    stale `pheno` from the previous row — undefined behavior we replace
    with an explicit null = no trait emission).
    """
    strip_paren = lambda c: F.regexp_replace(c, r"^\)+|\)+$", "")  # noqa: E731
    p_eq = strip_paren(F.split(ae, "=").getItem(1))
    p_eq = F.when(p_eq.contains("_"), F.substring_index(p_eq, "_", 1)).otherwise(p_eq)
    p_par = strip_paren(F.split(ae, r"\(").getItem(1))
    p_par = F.when(
        ~p_par.isin(PHRASE_PHENOS) & p_par.contains("_"),
        F.substring_index(p_par, "_", 1),
    ).otherwise(p_par)
    return (
        F.when(ae.isNull() | (ae == ""), F.lit(None).cast("string"))
        .when(ae.contains("="), p_eq)
        .when(ae.contains("("), p_par)
        .otherwise(F.lit(None).cast("string"))
    )


def germplasm_to_kgx(
    gaf: DataFrame,
    cat_traits: DataFrame,
    num_traits: DataFrame,
    source_name: str = "planteome",
) -> tuple[DataFrame, DataFrame]:
    """Planteome 'germplasm' file-type path (planteome.py:283-478) as one
    declarative dataflow.

    cat_traits: (ontology_id, label, pheno, pheno_id) — the reference's
        plant_traits.txt nested dict {onto: {label, pheno: {value: curie}}}
        exploded to rows (S9 JSON-dict scan -> broadcast dim, J2 nested-key
        join on (ontology_id, pheno)).
    num_traits: (ontology_id, label, unit) — plant_numerical_traits.txt.

    Emits: GERMPLASM: nodes (biolink:OrganismalEntity — the production
    graph's 2nd-largest node class, merged-kg_stats.yaml:519), organism
    nodes, trait nodes, germplasm->org in_taxon edges, and
    germplasm->trait has_phenotype edges with the reference's property
    columns (categorical: has_attribute_type=value curie; numerical:
    has_attribute=label, has_quantitative_value=pheno, has_unit=unit;
    1-9 banding for TO:0000344/207). Dedup keys mirror the reference's
    seen_edge concats exactly (germ+org, germ+pheno_id, and the
    ECO:obj-onto-pheno measurement key).

    Deviation noted: reference KeyError/stale-variable paths
    (planteome.py:422-427, 441-442) are replaced by inner-join drops —
    log-and-continue as data, per SURVEY.md §7 hard-part 4.
    """
    spark = gaf.sparkSession
    taxon_dim = F.broadcast(spark.createDataFrame(
        TAXON_DIM, "tax_id string, org_name string, gene_src string"))
    cat_dim = F.broadcast(
        cat_traits.select(F.col("ontology_id").alias("onto"),
                          F.col("label").alias("cat_label")).distinct())
    cat_val_dim = F.broadcast(
        cat_traits.select(F.col("ontology_id").alias("onto"),
                          F.col("pheno").alias("pheno"),
                          F.col("pheno_id").alias("pheno_id")))
    num_dim = F.broadcast(
        num_traits.select(F.col("ontology_id").alias("onto"),
                          F.col("label").alias("num_label"),
                          F.col("unit").alias("unit")))

    base = (
        gaf.withColumn("tax_id", F.substring_index("Taxon", ":", -1))
        .join(taxon_dim, "tax_id", "inner")  # unknown taxa `continue`
        .withColumn("org_id", F.concat(F.lit("NCBITaxon:"), F.col("tax_id")))
        .withColumn("provided_by", F.concat("DB", F.lit("-"), F.lit(source_name)))
        .withColumn("label", F.col("DB_Object_Symbol"))
        .withColumn("germ_id", F.concat(F.lit("GERMPLASM:"), F.col("DB_Object_ID")))
        .withColumn("pheno", _parse_pheno(F.col("Annotation_Extension")))
    )
    # compound-trait disambiguation (reversed chain = last-if-wins parity)
    remap = _in_chain(F.col("Annotation_Extension"),
                      list(reversed(COMPOUND_REMAP)))
    base = base.withColumn(
        "onto",
        F.when(F.col("Ontology_ID").isin(COMPOUND_TRAITS),
               F.coalesce(remap, F.col("Ontology_ID")))
        .otherwise(F.col("Ontology_ID")),
    )
    base = base.join(cat_dim, "onto", "left").join(num_dim, "onto", "left")

    z_hit = None
    for m in NUMERIC_UNIT_MARKERS:
        cond = F.col("Annotation_Extension").contains(m)
        z_hit = cond if z_hit is None else (z_hit | cond)
    base = base.withColumn(
        "trait_type",
        F.when(F.col("num_label").isNotNull(), "numerical")
        .when(F.col("cat_label").isNotNull() & (F.col("onto") == "TO:0000019"),
              "categorical")
        .when(F.col("cat_label").isNotNull() & z_hit, "numerical")
        .when(F.col("cat_label").isNotNull(), "categorical"),
    )

    # ---- unconditional outputs (written before any pheno gating)
    germ_nodes = base.select(
        F.col("germ_id").alias("id"), F.col("label").alias("name"),
        F.lit(GERMPLASM_CATEGORY).alias("category"), "provided_by")
    org_nodes = base.select(
        F.col("org_id").alias("id"), F.col("org_name").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"), "provided_by")
    g2org = _empty_edge_props(
        base.select(F.col("germ_id").alias("subject"),
                    F.lit(IN_TAXON[0]).alias("predicate"),
                    F.col("org_id").alias("object"),
                    F.lit(IN_TAXON[1]).alias("relation"), "provided_by")
        .transform(lambda d: dedup_min(d, ["subject", "object"]))
    )

    # ---- 1-9 banding rows (TO:0000344/207, numerical dict): emitted BEFORE
    # the missing-pheno skip, then `continue` (planteome.py:375-403)
    band_map = F.when(F.col("onto") == "TO:0000344",
                      _map_chain(F.col("pheno"), VAL_344)).otherwise(
        _map_chain(F.col("pheno"), VAL_207))
    banded_cond = (
        F.col("num_label").isNotNull()
        & F.col("onto").isin("TO:0000344", "TO:0000207")
        & F.col("pheno").isin(list(VAL_344))
    )
    band = base.where(banded_cond).withColumn("pheno_id", band_map)
    band_edges = band.select(
        F.col("germ_id").alias("subject"),
        F.lit(HAS_PHENOTYPE[0]).alias("predicate"),
        F.col("onto").alias("object"),
        F.lit(HAS_PHENOTYPE[1]).alias("relation"),
        F.lit("").alias("has_attribute"),
        F.col("pheno_id").alias("has_attribute_type"),
        F.lit("").alias("has_quantitative_value"),
        F.lit("").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
    ).transform(lambda d: dedup_min(d, ["subject", "has_attribute_type"]))  # germ+pheno_id key

    # ---- remaining trait rows: missing-value skip (P4)
    rest = base.where(~banded_cond).where(
        F.col("pheno").isNotNull() & ~F.col("pheno").isin(MISSING_PHENO)
    )

    cat_rows = rest.where(F.col("trait_type") == "categorical").join(
        cat_val_dim, ["onto", "pheno"], "inner"  # KeyError -> drop
    )
    cat_nodes = cat_rows.select(
        F.col("onto").alias("id"), F.col("cat_label").alias("name"),
        F.lit(TRAIT_CATEGORY).alias("category"), "provided_by")
    cat_edges = cat_rows.select(
        F.col("germ_id").alias("subject"),
        F.lit(HAS_PHENOTYPE[0]).alias("predicate"),
        F.col("onto").alias("object"),
        F.lit(HAS_PHENOTYPE[1]).alias("relation"),
        F.lit("").alias("has_attribute"),
        F.col("pheno_id").alias("has_attribute_type"),
        F.lit("").alias("has_quantitative_value"),
        F.lit("").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
    ).transform(lambda d: dedup_min(d, ["subject", "has_attribute_type"]))  # germ+pheno_id key

    num_rows = rest.where(F.col("trait_type") == "numerical").where(
        F.col("num_label").isNotNull()
    )
    num_nodes = num_rows.select(
        F.col("onto").alias("id"), F.col("num_label").alias("name"),
        F.lit(TRAIT_CATEGORY).alias("category"), "provided_by")
    # measurement dedup key r = ECO:DB_Object_ID-<RAW onto suffix>-pheno
    # (planteome.py:450 — keyed on the raw Ontology_ID column). Rows sharing
    # the key can still differ in the REMAPPED onto / num_label / unit
    # (compound-trait Annotation_Extension variants), so the survivor must
    # be picked deterministically — dedup_min, not dropDuplicates.
    num_edges = dedup_min(
        num_rows, ["DB_Object_ID", "Ontology_ID", "pheno"]
    ).select(
        F.col("germ_id").alias("subject"),
        F.lit(HAS_PHENOTYPE[0]).alias("predicate"),
        F.col("onto").alias("object"),
        F.lit(HAS_PHENOTYPE[1]).alias("relation"),
        F.col("num_label").alias("has_attribute"),
        F.col("onto").alias("has_attribute_type"),
        F.col("pheno").alias("has_quantitative_value"),
        F.col("unit").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
    )

    nodes = (
        germ_nodes.unionByName(org_nodes).unionByName(cat_nodes)
        .unionByName(num_nodes).transform(lambda d: dedup_min(d, ["id"])).select(*NODE_COLS)
    )
    edges = (
        g2org.select(*EDGE_COLS)
        .unionByName(band_edges.select(*EDGE_COLS))
        .unionByName(cat_edges.select(*EDGE_COLS))
        .unionByName(num_edges.select(*EDGE_COLS))
    )
    return nodes, edges


def qtl_to_kgx(
    gaf: DataFrame, source_name: str = "planteome"
) -> tuple[DataFrame, DataFrame]:
    """Planteome 'qtl' file-type path (planteome.py:479-524): QTL nodes
    (biolink:GenomicEntity), qtl->org in_taxon and qtl->trait has_phenotype
    edges. No gene-id normalization (applied only to 'genetic' files,
    planteome.py:225); dedup keys g+org_id / g+ontology_id."""
    spark = gaf.sparkSession
    taxon_dim = F.broadcast(spark.createDataFrame(
        TAXON_DIM, "tax_id string, org_name string, gene_src string"))
    base = (
        gaf.withColumn("tax_id", F.substring_index("Taxon", ":", -1))
        .join(taxon_dim, "tax_id", "inner")
        .withColumn(
            "qtl_id",
            F.when(F.col("gene_src") == "DB_Object_Name", F.col("DB_Object_Name"))
            .otherwise(F.col("DB_Object_ID")),
        )
        .withColumn("org_id", F.concat(F.lit("NCBITaxon:"), F.col("tax_id")))
        .withColumn("provided_by", F.concat("DB", F.lit("-"), F.lit(source_name)))
    )
    qtl_nodes = base.select(
        F.col("qtl_id").alias("id"), F.col("DB_Object_Symbol").alias("name"),
        F.lit(QTL_CATEGORY).alias("category"), "provided_by")
    org_nodes = base.select(
        F.col("org_id").alias("id"), F.col("org_name").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"), "provided_by")
    q2org = base.select(
        F.col("qtl_id").alias("subject"), F.lit(IN_TAXON[0]).alias("predicate"),
        F.col("org_id").alias("object"), F.lit(IN_TAXON[1]).alias("relation"),
        "provided_by")
    q2trait = base.select(
        F.col("qtl_id").alias("subject"),
        F.lit(HAS_PHENOTYPE[0]).alias("predicate"),
        F.col("Ontology_ID").alias("object"),
        F.lit(HAS_PHENOTYPE[1]).alias("relation"), "provided_by")
    nodes = dedup_min(qtl_nodes.unionByName(org_nodes), ["id"]).select(*NODE_COLS)
    edges = _empty_edge_props(
        dedup_min(q2org.unionByName(q2trait), ["subject", "object"])
    ).select(*EDGE_COLS)
    return nodes, edges
