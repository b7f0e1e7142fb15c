"""Gene Expression Atlas -> KGX transform.

Mirrors /root/reference/eco_kg/transform_utils/gene_expression_atlas/
gene_expression_atlas.py (:75-208): 14-column expression TSV ('!' comments)
-> PECO environmental-exposure nodes, gene nodes, and
PECO -increases/decreases_expression_of-> gene edges.

Operator parity:
  - species-conditional gene-id normalization (:115-126): rice/corn alias
    maps (values may be LISTS -> J6 explode fanout, :128-158), corn
    mystery-gene passthrough (:106-108), sorghum `SORBI_3`->`Sobic.`
    regex (:126; F3);
  - predicate -> relation 2-way dispatch (:163-166; F7);
  - seen_node / seen_edge dedup gates (A1) keyed id resp. env_id+gene_id.

Divergence note: the reference hard-indexes the alias dicts (KeyError
aborts the run); here a map miss keeps the original id — left join +
coalesce, the engine's log-and-continue stance (SURVEY §7 hard-part 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecokg_spark.operators.merge import dedup_min

GEA_COLS = [
    "Gene", "Species", "Experiment_accession", "Comparison", "PECOid",
    "log2_fold_change", "Adjusted_p_value", "t_statistic", "ROid",
    "developmental_stage", "POid_LifeStage", "anatomical_part",
    "POid_Anatomy", "cultivar",
]
NODE_COLS = ["id", "name", "category", "provided_by"]
EDGE_COLS = [
    "subject", "predicate", "object", "relation",
    "has_attribute", "has_attribute_type", "has_quantitative_value",
    "has_unit", "has_qualitative_value", "provided_by",
]

ENV_CATEGORY = "biolink:EnvironmentalExposure"   # :96
GENE_CATEGORY = "biolink:GenomicEntity"          # :97
RELATION_BY_PREDICATE = {                        # :100-103, dispatch :163-166
    "biolink:increases_expression_of": "RO:0003003",
    "biolink:decreases_expression_of": "RO:0003002",
}
MYSTERY_GENES = [                                # :106-108
    "Zm00001d027187", "ENSRNA049469775", "Zm00001d001633", "Zm00001d039240",
    "Zm00001d000237", "Zm00001d013903", "Zm00001d000909", "ZeamMp108",
    "Zm00001d016401", "Zm00001d008017", "Zm00001d001694", "Zm00001d022886",
    "Zm00001d000942", "Zm00001d000840", "Zm00001d001311",
]


def gea_to_kgx(
    expr: DataFrame,
    rice_map: DataFrame | None = None,
    corn_map: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """expression DataFrame (GEA_COLS, strings) -> (nodes, edges).

    Alias maps are (from_id string, to_ids array<string>) — 1:N values
    explode into one node/edge per alias (J6).
    """
    spark = expr.sparkSession
    base = expr.withColumn(
        "provided_by",
        F.concat("Experiment_accession", F.lit("-Gene Expression Atlas")),
    ).withColumn(
        "_gene0",
        F.when(F.col("Species") == "sorghum bicolor",
               F.regexp_replace("Gene", "SORBI_3", "Sobic."))
        .otherwise(F.col("Gene")),
    )

    def apply_map(df: DataFrame, m: DataFrame | None, species: str,
                  skip: list[str] | None = None) -> DataFrame:
        if m is None:
            return df.withColumn("_genes_m", F.lit(None).cast("array<string>")) \
                if "_genes_m" not in df.columns else df
        cond = (F.col("Species") == species)
        if skip:
            cond = cond & ~F.col("_gene0").isin(skip)
        mm = F.broadcast(m.select(F.col("from_id").alias("_from"),
                                  F.col("to_ids").alias("_to")))
        out = df.join(mm, (F.col("_gene0") == F.col("_from")) & cond, "left")
        prev = F.col("_genes_m") if "_genes_m" in df.columns else F.lit(None).cast("array<string>")
        return out.withColumn("_genes_m", F.coalesce("_to", prev)).drop("_from", "_to")

    base = apply_map(base, rice_map, "oryza sativa")
    base = apply_map(base, corn_map, "zea mays", skip=MYSTERY_GENES)
    genes = base.withColumn(
        "gene_id",
        F.explode(F.coalesce("_genes_m", F.array(F.col("_gene0")))),
    )

    rel_dim = F.broadcast(spark.createDataFrame(
        list(RELATION_BY_PREDICATE.items()), "ROid string, relation string"))
    genes = genes.join(rel_dim, "ROid", "inner")  # unknown predicate dropped

    gene_nodes = genes.select(
        F.col("gene_id").alias("id"), F.lit("").alias("name"),
        F.lit(GENE_CATEGORY).alias("category"), "provided_by")
    env_nodes = genes.select(
        F.col("PECOid").alias("id"), F.lit("").alias("name"),
        F.lit(ENV_CATEGORY).alias("category"), "provided_by")
    nodes = dedup_min(gene_nodes.unionByName(env_nodes), ["id"]).select(*NODE_COLS)

    edges = genes.select(
        F.col("PECOid").alias("subject"),
        F.col("ROid").alias("predicate"),
        F.col("gene_id").alias("object"),
        F.col("relation"),
        F.lit("").alias("has_attribute"),
        F.lit("").alias("has_attribute_type"),
        F.lit("").alias("has_quantitative_value"),
        F.lit("").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
    ).transform(lambda d: dedup_min(d, ["subject", "object"])).select(*EDGE_COLS)
    return nodes, edges
