"""Durable KG-construction job: the spark-submit entry semantics.

Same dataflow as ecokg_spark.pipeline.build_kg, but every stage boundary
materializes to a TableIO table (Iceberg when a catalog is configured,
parquet otherwise) through StageRunner, which also writes per-partition
lineage + latency metrics to the checkpoint table and lets a killed run
RESUME: completed stages are read back instead of recomputed (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Ship it with:  scripts/package_pyfiles.py  ->  dist/ecokg_spark.zip
               spark-submit --py-files dist/ecokg_spark.zip \
                   scripts/run_kg_job.py --pages <parquet> --warehouse <dir>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecokg_spark.io import TableIO
from ecokg_spark.operators.checkpoint import StageRunner
from ecokg_spark.operators.components import canonical_map
from ecokg_spark.operators.fused import (
    AUDIT_SENT_ID,
    MENTION_SENT_ID,
    SVO_SENT_ID,
    fused_extract_triples,
)
from ecokg_spark.operators.linking import (
    alias_identity_edges,
    build_termlist,
    link_mentions,
)
from ecokg_spark.operators.merge import merge_edges, merge_nodes
from ecokg_spark.operators.stats import count_by_category, count_by_predicate
from ecokg_spark.operators.triples import verb_map
from ecokg_spark.sources.pages import alias_table, category_table


def run_kg_job(
    spark: SparkSession,
    pages: DataFrame,
    io: TableIO,
    run_id: str = "run0",
    resume: bool = True,
    aliases: DataFrame | None = None,
) -> StageRunner:
    """Run (or resume) the full pipeline, one durable table per stage.

    Stage tables (under the TableIO warehouse): kg.termlist, kg.fused (the
    one corpus pass: audit + triple + combiner rows, columnar so each
    consumer reads only its columns), kg.audit, kg.triples, kg.linked_raw,
    kg.quarantine, kg.canonical, kg.nodes, kg.edges,
    kg.stats_by_predicate, kg.stats_by_category; per-stage lineage under
    kg._checkpoints.<stage>.
    """
    r = StageRunner(io, run_id=run_id, resume=resume)
    aliases = aliases if aliases is not None else alias_table(spark)

    termlist = r.run("termlist", lambda: build_termlist(aliases))

    fused = r.run(
        "fused",
        lambda: fused_extract_triples(pages).select(
            "url", "sent_id", "subj_mention", "verb", "obj_mention",
            "n_sentences",
            F.when(
                F.col("sent_id") == AUDIT_SENT_ID,
                F.sha2(F.encode(F.col("extracted_text"), "UTF-8"), 256),
            ).alias("text_sha256"),
        ),
    )
    r.run("audit", lambda: fused.where(F.col("sent_id") == AUDIT_SENT_ID)
          .select("url", "text_sha256", "n_sentences"))
    triples = r.run("triples", lambda: fused.where(F.col("sent_id") >= 0)
                    .select("url", "sent_id", "subj_mention", "verb",
                            "obj_mention"))

    def _linked() -> DataFrame:
        surfaces = fused.where(F.col("sent_id") == MENTION_SENT_ID).select(
            F.col("subj_mention").alias("mention")).distinct()
        resolved, _ = link_mentions(surfaces, termlist, "mention")
        res = resolved.select("mention", "curie", "match_kind").localCheckpoint(eager=True)
        s = res.select(F.col("mention").alias("subj_mention"),
                       F.col("curie").alias("subj_curie"),
                       F.col("match_kind").alias("subj_match"))
        o = res.select(F.col("mention").alias("obj_mention"),
                       F.col("curie").alias("obj_curie"),
                       F.col("match_kind").alias("obj_match"))
        return triples.join(F.broadcast(s), "subj_mention", "left").join(
            F.broadcast(o), "obj_mention", "left")

    j = r.run("linked_raw", _linked)
    r.run("quarantine", lambda: (
        j.where(F.col("subj_curie").isNull())
        .select("url", "sent_id", F.col("subj_mention").alias("mention"),
                F.lit("subject").alias("role"))
        .unionByName(j.where(F.col("obj_curie").isNull()).select(
            "url", "sent_id", F.col("obj_mention").alias("mention"),
            F.lit("object").alias("role")))
    ))

    canon = r.run("canonical", lambda: canonical_map(
        alias_identity_edges(termlist),
        termlist.select(F.col("curie").alias("node")),
    ))
    canon_b = F.broadcast(canon)
    vmap = F.broadcast(verb_map(spark))

    def _edges() -> DataFrame:
        # resolve via the durable linked_raw table's (mention -> curie)
        # bindings; candidates = the fused pass's batch-distinct (s,v,o)
        # combiner rows, so this never rescans per-sentence triples
        res = (
            j.select(F.col("subj_mention").alias("mention"),
                     F.col("subj_curie").alias("curie"))
            .unionByName(j.select(F.col("obj_mention").alias("mention"),
                                  F.col("obj_curie").alias("curie")))
            .where(F.col("curie").isNotNull()).distinct()
        )
        svo = fused.where(F.col("sent_id") == SVO_SENT_ID).select(
            "subj_mention", "verb", "obj_mention")
        raw = (
            svo.join(F.broadcast(res.select(
                F.col("mention").alias("subj_mention"),
                F.col("curie").alias("subj_curie"))), "subj_mention")
            .join(F.broadcast(res.select(
                F.col("mention").alias("obj_mention"),
                F.col("curie").alias("obj_curie"))), "obj_mention")
            .join(canon_b.withColumnRenamed("node", "subj_curie")
                  .withColumnRenamed("canonical", "subject"), "subj_curie")
            .join(canon_b.withColumnRenamed("node", "obj_curie")
                  .withColumnRenamed("canonical", "object"), "obj_curie")
            .join(vmap, "verb")
            .where(F.col("subject") != F.col("object"))
            .select("subject", "predicate", "object", "relation",
                    F.lit("ecokg-web").alias("provided_by"))
        )
        return merge_edges([raw])

    edges = r.run("edges", _edges)

    def _nodes() -> DataFrame:
        cat = category_table(spark).join(canon_b, F.col("curie") == F.col("node"))
        dim = (cat.groupBy("canonical")
               .agg(F.min("curie").alias("curie"), F.min("name").alias("name"),
                    F.min("category").alias("category"))
               .select(F.col("canonical").alias("id"), "name", "category"))
        seen = (edges.select(F.col("subject").alias("id"))
                .unionByName(edges.select(F.col("object").alias("id"))).distinct())
        return merge_nodes([
            seen.join(F.broadcast(dim), "id", "left").select(
                "id", "name", "category", F.lit("ecokg-web").alias("provided_by"))
        ])

    nodes = r.run("nodes", _nodes)
    r.run("stats_by_predicate", lambda: count_by_predicate(edges))
    r.run("stats_by_category", lambda: count_by_category(nodes))
    return r
