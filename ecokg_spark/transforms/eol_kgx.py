"""EOL TraitBank -> KGX transform: the reference's eol_traits pipeline
re-expressed as declarative Spark dataflows.

Mirrors /root/reference/eco_kg/transform_utils/eol_traits/eol_traits.py:

  pages  (eol_traits.py:273-324): taxon node per page (EOL: CURIE, canonical
         name, rank as has_attribute), bare parent nodes, subclass_of edges;
         dedup gates A1 (seen_node/seen_edge keyed id resp. org_id+parent_id).
         Divergence note: the reference keeps the FIRST occurrence in file
         order, so a parent seen before its own page row keeps an empty
         label; distributed dedup instead prefers the labeled row (max(name))
         — deterministic and strictly more informative.
  traits (eol_traits.py:326-534): measurement path (J1 broadcast trait-dim
         decode; J2 nested (uri,value) decode for categoricals; F7 priority
         value/unit pick via coalesce(nullif(...))) emits
         org -has_phenotype-> trait edges with quantity/unit properties;
         association path (J3 pages join on object_page_id, inner-join miss
         = reference's log-and-continue; P5 self-loop drop) emits
         org -interacts_with-> org edges.

Node header ['id','name','category','has_attribute','has_attribute_type',
'provided_by'] (eol_traits.py:33), edge header = 10-col KGX
(eol_traits.py:34); constants eol_traits.py:58-67.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecokg_spark.operators.merge import dedup_min

NODE_COLS = ["id", "name", "category", "has_attribute", "has_attribute_type",
             "provided_by"]
EDGE_COLS = [
    "subject", "predicate", "object", "relation",
    "has_attribute", "has_attribute_type", "has_quantitative_value",
    "has_unit", "has_qualitative_value", "provided_by",
]

ORG_CATEGORY = "biolink:OrganismTaxon"
TRAIT_CATEGORY = "biolink:PhenotypicFeature"
ORG_PREFIX = "EOL:"
SUBCLASS = ("biolink:subclass_of", "RO:")            # eol_traits.py:60-61
HAS_PHENOTYPE = ("biolink:has_phenotype", "RO:0002200")  # :58-59
INTERACTS = ("biolink:interacts_with", "RO:0002434")     # :62-63


def _nn(col):
    """'' -> NULL, for priority coalescing (get_item_by_priority F7)."""
    return F.nullif(col, F.lit(""))


def eol_pages_to_kgx(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """pages(page_id, parent_id, rank, canonical) -> (nodes, edges)."""
    org = pages.select(
        F.concat(F.lit(ORG_PREFIX), F.col("page_id")).alias("id"),
        F.col("canonical").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"),
        F.coalesce(F.col("rank"), F.lit("")).alias("has_attribute"),
        F.lit("").alias("has_attribute_type"),
        F.lit("EOL").alias("provided_by"),
    )
    parent = pages.select(
        F.concat(F.lit(ORG_PREFIX), F.col("parent_id")).alias("id"),
        F.lit("").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"),
        F.lit("").alias("has_attribute"),
        F.lit("").alias("has_attribute_type"),
        F.lit("EOL").alias("provided_by"),
    )
    nodes = (
        org.unionByName(parent)
        .groupBy("id")
        .agg(*[F.max(c).alias(c) for c in NODE_COLS if c != "id"])
        .select(*NODE_COLS)
    )
    edges = pages.select(
        F.concat(F.lit(ORG_PREFIX), F.col("page_id")).alias("subject"),
        F.lit(SUBCLASS[0]).alias("predicate"),
        F.concat(F.lit(ORG_PREFIX), F.col("parent_id")).alias("object"),
        F.lit(SUBCLASS[1]).alias("relation"),
        F.lit("").alias("has_attribute"),
        F.lit("").alias("has_attribute_type"),
        F.lit("").alias("has_quantitative_value"),
        F.lit("").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        F.lit("EOL").alias("provided_by"),
    ).dropDuplicates(["subject", "object"]).select(*EDGE_COLS)
    return nodes, edges


def eol_traits_to_kgx(
    traits: DataFrame,
    pages: DataFrame,
    trait_dim: DataFrame,
    value_dim: DataFrame,
    unit_dim: DataFrame | None = None,
    location_uris: list[str] | None = None,
    skip_uris: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """traits(eol_pk, page_id, object_page_id, resource_id, predicate,
    value_uri, measurement, units, units_uri, normal_measurement,
    normal_units, normal_units_uri) + dims -> (nodes, edges).

    trait_dim: (trait_uri, trait_type 'measurement'|'association',
                data_type 'categorical'|'numerical', label, curie)
    value_dim: (trait_uri, value_uri, label, curie)   [J2 nested decode]
    unit_dim:  (unit_uri, label)                      [unit label decode]
    """
    loc = location_uris or []
    skip = skip_uris or []
    td = F.broadcast(trait_dim)
    vd = F.broadcast(value_dim.select(
        F.col("trait_uri"), F.col("value_uri"),
        F.col("label").alias("_v_label"), F.col("curie").alias("_v_curie")))

    base = (
        traits.where(~F.col("predicate").isin(loc) & ~F.col("predicate").isin(skip))
        .join(td, traits["predicate"] == td["trait_uri"], "inner")  # J1; miss = log-and-continue
        .withColumn("org_id", F.concat(F.lit(ORG_PREFIX), F.col("page_id")))
        .withColumn("provided_by", F.concat(F.col("resource_id"), F.lit("-EOL")))
    )

    # ---- measurement path (eol_traits.py:335-441)
    meas = base.where(F.col("trait_type") == "measurement")
    meas = meas.join(vd, ["trait_uri", "value_uri"], "left")
    # numerical priority pick: normal_measurement else measurement; unit:
    # normal_units -> normal_units_uri; on fallback measurement: units -> units_uri
    q_val = F.coalesce(_nn(F.col("normal_measurement")), _nn(F.col("measurement")), F.lit(""))
    unit_pick = F.when(
        _nn(F.col("normal_measurement")).isNotNull(),
        F.coalesce(_nn(F.col("normal_units")), _nn(F.col("normal_units_uri")), F.lit("")),
    ).otherwise(
        F.coalesce(_nn(F.col("units")), _nn(F.col("units_uri")), F.lit("")),
    )
    meas = meas.withColumn("_unit_raw", unit_pick)
    if unit_dim is not None:
        ud = F.broadcast(unit_dim.select(F.col("unit_uri").alias("_unit_raw"),
                                         F.col("label").alias("_unit_label")))
        meas = meas.join(ud, "_unit_raw", "left")
    else:
        meas = meas.withColumn("_unit_label", F.lit(None).cast("string"))

    is_cat = F.col("data_type") == "categorical"
    meas_edges = meas.select(
        F.col("org_id").alias("subject"),
        F.lit(HAS_PHENOTYPE[0]).alias("predicate"),
        F.col("curie").alias("object"),
        F.lit(HAS_PHENOTYPE[1]).alias("relation"),
        F.when(is_cat, F.coalesce("_v_label", F.lit("")))
        .otherwise(F.col("label")).alias("has_attribute"),
        F.when(is_cat, F.coalesce("_v_curie", F.lit("")))
        .otherwise(F.col("curie")).alias("has_attribute_type"),
        F.when(is_cat, F.lit("")).otherwise(q_val).alias("has_quantitative_value"),
        F.when(is_cat, F.lit("")).otherwise(
            F.coalesce("_unit_label", "_unit_raw")).alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
        F.col("eol_pk"),
    ).transform(lambda d: dedup_min(d, ["eol_pk"])).drop("eol_pk")

    trait_nodes = meas.select(
        F.col("curie").alias("id"), F.col("label").alias("name"),
        F.lit(TRAIT_CATEGORY).alias("category"),
        F.lit("").alias("has_attribute"), F.lit("").alias("has_attribute_type"),
        "provided_by",
    )

    # ---- association path (eol_traits.py:443-534): J3 pages join + P5
    assoc = base.where(F.col("trait_type") == "association")
    p = F.broadcast(pages.select(
        F.col("page_id").alias("_assoc_pid"),
        F.col("canonical").alias("_assoc_label"),
        F.coalesce(F.col("rank"), F.lit("")).alias("_assoc_rank")))
    assoc = (
        assoc.join(p, assoc["object_page_id"] == p["_assoc_pid"], "inner")  # miss -> skip
        .where(F.col("page_id") != F.col("object_page_id"))  # P5 self-loop
        .withColumn("assoc_curie", F.concat(F.lit(ORG_PREFIX), F.col("object_page_id")))
    )
    assoc_edges = assoc.select(
        F.col("org_id").alias("subject"),
        F.lit(INTERACTS[0]).alias("predicate"),
        F.col("assoc_curie").alias("object"),
        F.lit(INTERACTS[1]).alias("relation"),
        F.col("label").alias("has_attribute"),
        F.col("curie").alias("has_attribute_type"),
        F.lit("").alias("has_quantitative_value"),
        F.lit("").alias("has_unit"),
        F.lit("").alias("has_qualitative_value"),
        "provided_by",
        F.col("eol_pk"),
    ).transform(lambda d: dedup_min(d, ["eol_pk"])).drop("eol_pk")

    assoc_nodes = assoc.select(
        F.col("assoc_curie").alias("id"), F.col("_assoc_label").alias("name"),
        F.lit(ORG_CATEGORY).alias("category"),
        F.col("_assoc_rank").alias("has_attribute"),
        F.lit("").alias("has_attribute_type"), "provided_by",
    )

    nodes = dedup_min(trait_nodes.unionByName(assoc_nodes), ["id"]).select(*NODE_COLS)
    edges = meas_edges.unionByName(assoc_edges).select(*EDGE_COLS)
    return nodes, edges
