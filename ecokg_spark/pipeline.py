"""End-to-end KG construction: pages -> extract -> triples -> link ->
canonicalize -> merge -> stats (the north-star pipeline).

Shuffle budget of the whole plan (the thing that matters at 100 TB):

  extract + triple UDFs ... narrow (pipelined Arrow batches, zero shuffle)
  entity linking .......... broadcast joins (map-side), zero shuffle; the
                            fuzzy path shuffles only DISTINCT unmatched
                            surface strings (vocabulary-bounded)
  canonicalization ........ O(log n) rounds x 2 small shuffles over the
                            ENTITY-PAIR edge list (dimension-sized, not
                            corpus-sized)
  edge dedup .............. the one corpus-sized shuffle: salted
                            repartition + dropDuplicates(s,p,o)
  stats ................... hash aggs; degree count salted two-phase

Every stage can materialize through StageRunner for mid-run resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecokg_spark.operators.components import canonical_map
from ecokg_spark.operators.extract import extract_pages, text_audit
from ecokg_spark.operators.linking import (
    alias_identity_edges,
    build_termlist,
    link_mentions,
)
from ecokg_spark.operators.merge import merge_edges, merge_nodes
from ecokg_spark.operators.skew import salted_repartition
from ecokg_spark.operators.stats import count_by_category, count_by_predicate
from ecokg_spark.operators.triples import extract_triples, verb_map
from ecokg_spark.sources.pages import alias_table, category_table


def link_triples(
    triples: DataFrame, termlist: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Link subject and object mentions (two broadcast passes — map-side,
    no corpus shuffle). Returns (linked, quarantine)."""
    s_hit, s_miss = link_mentions(triples, termlist, "subj_mention")
    s_hit = s_hit.withColumnRenamed("curie", "subj_curie").withColumnRenamed(
        "match_kind", "subj_match"
    )
    o_hit, o_miss = link_mentions(s_hit, termlist, "obj_mention")
    linked = o_hit.withColumnRenamed("curie", "obj_curie").withColumnRenamed(
        "match_kind", "obj_match"
    )
    quarantine = s_miss.select(
        "url", "sent_id", F.col("subj_mention").alias("mention"), F.lit("subject").alias("role")
    ).unionByName(
        o_miss.select(
            "url", "sent_id", F.col("obj_mention").alias("mention"), F.lit("object").alias("role")
        )
    )
    return linked, quarantine


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame | None = None,
    shuffle_partitions: int | None = None,
    materialize: bool = True,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every materializable stage output.

    `materialize=True` localCheckpoints the UDF-heavy stage boundaries so
    the many downstream consumers (audit, stats, P/R checks) don't re-run
    extraction; a durable-table variant goes through StageRunner instead.
    """
    aliases = aliases if aliases is not None else alias_table(spark)
    termlist = build_termlist(aliases)
    if materialize:
        termlist = termlist.localCheckpoint(eager=True)

    extracted = extract_pages(pages)
    if materialize:
        extracted = extracted.localCheckpoint(eager=True)
    audit = text_audit(extracted)

    triples = extract_triples(extracted)
    linked, quarantine = link_triples(triples, termlist)
    if materialize:
        linked = linked.localCheckpoint(eager=True)

    # canonicalization over the entity-identity graph (dimension-sized)
    ident = alias_identity_edges(termlist)
    all_entities = termlist.select(F.col("curie").alias("node"))
    canon = canonical_map(ident, all_entities)  # (node, canonical)
    canon_b = F.broadcast(canon)

    vmap = F.broadcast(verb_map(spark))

    n_part = shuffle_partitions or spark.sparkContext.defaultParallelism
    edges_raw = (
        linked.join(canon_b.withColumnRenamed("node", "subj_curie")
                    .withColumnRenamed("canonical", "subject"), "subj_curie")
        .join(canon_b.withColumnRenamed("node", "obj_curie")
              .withColumnRenamed("canonical", "object"), "obj_curie")
        .join(vmap, "verb")
        .where(F.col("subject") != F.col("object"))  # self-loop drop (P5)
    )
    edges = (
        salted_repartition(edges_raw, "subject", n_part)
        .dropDuplicates(["subject", "predicate", "object"])
        .select(
            "subject",
            "predicate",
            "object",
            "relation",
            F.lit("ecokg-web").alias("provided_by"),
        )
    )

    # node materialize: canonical entities seen in any edge + dim properties
    cat = category_table(spark).join(canon_b, F.col("curie") == F.col("node"))
    canon_dim = (
        cat.groupBy("canonical")
        .agg(F.min("curie").alias("curie"), F.min("name").alias("name"),
             F.min("category").alias("category"))
        .select(F.col("canonical").alias("id"), "name", "category")
    )
    seen = (
        edges.select(F.col("subject").alias("id"))
        .unionByName(edges.select(F.col("object").alias("id")))
        .distinct()
    )
    nodes = seen.join(F.broadcast(canon_dim), "id", "left").select(
        "id", "name", "category", F.lit("ecokg-web").alias("provided_by")
    )

    merged_nodes = merge_nodes([nodes])
    merged_edges = merge_edges([edges])

    return {
        "termlist": termlist,
        "extracted": extracted,
        "audit": audit,
        "triples": triples,
        "linked": linked,
        "quarantine": quarantine,
        "canonical": canon,
        "nodes": merged_nodes,
        "edges": merged_edges,
        "stats_by_predicate": count_by_predicate(merged_edges),
        "stats_by_category": count_by_category(merged_nodes),
    }
