"""End-to-end KG construction: pages -> extract -> triples -> link ->
canonicalize -> merge -> stats (the north-star pipeline).

Shuffle budget of the whole plan (the thing that matters at 100 TB):

  fused corpus pass ....... ONE narrow mapInArrow stage (scan -> extract ->
                            split -> triple match, operators/fused.py); the
                            only materialized corpus-side artifact is the
                            small audit+triples relation — page text never
                            hits the block store or a shuffle
  entity linking .......... exact+fuzzy resolution over DISTINCT surface
                            forms only (vocabulary-bounded shuffles), then
                            broadcast map-side application to the corpus —
                            zero corpus-sized shuffle
  canonicalization ........ dimension-sized: driver union-find under the
                            broadcast-style size gate, else O(log n)
                            large-star/small-star rounds; corpus-independent,
                            so it runs CONCURRENTLY with the fused pass
  edge dedup + merge ...... the one corpus-sized shuffle: a single hash
                            aggregate on (s,p,o); its map-side partial
                            collapses the hot head entity pre-shuffle
  stats ................... hash aggs; degree count salted two-phase

Every stage can materialize through StageRunner for mid-run resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecokg_spark.operators.components import canonical_map
from ecokg_spark.operators.extract import extract_pages
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


# resolution tables at or under this many rows become driver-local
# relations (broadcast-style size gate, same precedent as
# components.SMALL_GRAPH_EDGES): every downstream broadcast build is then
# free — no job, no checkpoint. ~30 MB of 3-string rows at the limit.
RES_BROADCAST_MAX = 200_000


def link_triples(
    triples: DataFrame,
    termlist: DataFrame,
    surfaces: DataFrame | None = None,
    dim_count: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Link subject and object mentions.
    Returns (linked, quarantine, resolution) — resolution is the
    materialized (mention, curie, match_kind) table, broadcast-applied
    here and reusable by any other mention-shaped relation.

    Scale shape: the exact+fuzzy resolution DAG runs ONCE over the DISTINCT
    surface forms of both roles (vocabulary-bounded, not corpus-sized); the
    resolution table is then broadcast and applied to the corpus with two
    narrow map-side joins. Resolving per-role over the full corpus instead
    would re-run the multi-stage exact/fuzzy DAG per role — 4+ corpus passes
    and 2x the shuffle stages (measured 2-3x slower at 60k pages).

    `surfaces` (col `mention`), when given, is a pre-combined distinct
    surface set (e.g. the fused pass's sent_id=-2 rows) — skips the
    corpus-sized distinct here."""
    if surfaces is None:
        surfaces = (
            triples.select(F.col("subj_mention").alias("mention"))
            .unionByName(triples.select(F.col("obj_mention").alias("mention")))
        )
    surfaces = surfaces.distinct()
    resolved, _unresolved = link_mentions(
        surfaces, termlist, "mention", dim_count=dim_count
    )
    res = resolved.select("mention", "curie", "match_kind")
    # evaluate the resolution DAG exactly ONCE (it is referenced by two
    # broadcast builds below plus linked/quarantine — re-deriving it per
    # consumer re-runs the whole exact/fuzzy DAG each time): take(N+1)
    # doubles as the size gate. Vocabulary-sized results become a
    # driver-local relation — every later broadcast builds with NO job —
    # while oversized results fall back to a checkpoint.
    sample = res.take(RES_BROADCAST_MAX + 1)
    if len(sample) <= RES_BROADCAST_MAX:
        res = triples.sparkSession.createDataFrame(sample, res.schema)
    else:
        res = res.localCheckpoint(eager=True)
    s = res.select(
        F.col("mention").alias("subj_mention"),
        F.col("curie").alias("subj_curie"),
        F.col("match_kind").alias("subj_match"),
    )
    o = res.select(
        F.col("mention").alias("obj_mention"),
        F.col("curie").alias("obj_curie"),
        F.col("match_kind").alias("obj_match"),
    )
    j = triples.join(F.broadcast(s), "subj_mention", "left").join(
        F.broadcast(o), "obj_mention", "left"
    )
    linked = j.where(F.col("subj_curie").isNotNull() & F.col("obj_curie").isNotNull())
    quarantine = (
        j.where(F.col("subj_curie").isNull())
        .select("url", "sent_id", F.col("subj_mention").alias("mention"),
                F.lit("subject").alias("role"))
        .unionByName(
            j.where(F.col("obj_curie").isNull()).select(
                "url", "sent_id", F.col("obj_mention").alias("mention"),
                F.lit("object").alias("role"))
        )
    )
    return linked, quarantine, res


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame | None = None,
    materialize: bool = True,
    materialize_linked: bool = True,
    scratch_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every materializable stage output.

    `materialize=True` materializes the fused corpus pass so the many
    downstream consumers (audit, linking, edges, stats) don't re-run
    extraction. With `scratch_dir` set the materialization is a PARQUET
    staged table (columnar: downstream readers get column pruning +
    sent_id row-group pushdown — the Iceberg-table shape of the north
    rule); otherwise an in-memory localCheckpoint. A durable-table
    variant goes through StageRunner instead (job.py).
    """
    aliases = aliases if aliases is not None else alias_table(spark)
    termlist = build_termlist(aliases)
    if materialize:
        termlist = termlist.localCheckpoint(eager=True)

    # the dimension-only subgraph (termlist -> identity edges -> connected
    # components) is independent of the corpus: overlap its driver barriers
    # (count + collect + createDataFrame) with the fused corpus pass by
    # submitting it from a second thread — Spark's scheduler runs the jobs
    # concurrently, hiding ~1-3s of otherwise-serial latency per run
    canon_future = None
    if materialize:
        from concurrent.futures import ThreadPoolExecutor

        def _vocab_side():
            canon = canonical_map(
                alias_identity_edges(termlist),
                termlist.select(F.col("curie").alias("node")),
            ).localCheckpoint(eager=True)
            # termlist row count = free upper bound for the fuzzy-path
            # size gate (saves link_mentions its own count job)
            return canon, termlist.count()

        _pool = ThreadPoolExecutor(1)
        canon_future = _pool.submit(_vocab_side)
        _pool.shutdown(wait=False)

    # ONE corpus pass (operators/fused.py): audit rows + matched triples.
    # sha256 is computed JVM-side from the audit rows' text, then the text
    # column is dropped — the materialized relation carries only facts.
    fused = fused_extract_triples(pages).select(
        "url", "sent_id", "subj_mention", "verb", "obj_mention", "n_sentences",
        F.when(
            F.col("sent_id") == AUDIT_SENT_ID,
            F.sha2(F.encode(F.col("extracted_text"), "UTF-8"), 256),
        ).alias("text_sha256"),
    )
    if materialize:
        if scratch_dir:
            path = scratch_dir.rstrip("/") + "/fused"
            fused.write.mode("overwrite").parquet(path)
            fused = spark.read.parquet(path)
        else:
            fused = fused.localCheckpoint(eager=True)
    audit = fused.where(F.col("sent_id") == AUDIT_SENT_ID).select(
        "url", "text_sha256", "n_sentences"
    )
    triples = fused.where(F.col("sent_id") >= 0).select(
        "url", "sent_id", "subj_mention", "verb", "obj_mention"
    )
    # canonicalization over the entity-identity graph (dimension-sized);
    # normally precomputed concurrently with the fused pass (above)
    if canon_future is not None:
        canon, n_terms = canon_future.result()
    else:
        ident = alias_identity_edges(termlist)
        all_entities = termlist.select(F.col("curie").alias("node"))
        canon = canonical_map(ident, all_entities)  # (node, canonical)
        n_terms = None
    canon_b = F.broadcast(canon)

    # linking's distinct-surfaces input: the fused pass's batch-combined
    # mention rows (vocabulary-bounded), not a corpus-sized distinct.
    # materialize_linked=False callers act on edges/audit only, so the
    # resolve DAG stays lazy and rides inside the edge-materialize job.
    surfaces = fused.where(F.col("sent_id") == MENTION_SENT_ID).select(
        F.col("subj_mention").alias("mention")
    )
    linked, quarantine, res = link_triples(
        triples, termlist, surfaces=surfaces, dim_count=n_terms,
    )
    if materialize and materialize_linked:
        # worth a barrier only when several downstream consumers will scan
        # linked (stats + P/R + quarantine work); a single-consumer run
        # (edges only) pipelines it from the fused table instead —
        # broadcast application is narrow, so recompute is one cheap pass
        linked = linked.localCheckpoint(eager=True)

    vmap = F.broadcast(verb_map(spark))

    # edge materialize consumes the fused pass's batch-distinct
    # (subj, verb, obj) combiner rows — the distinct edge SURFACE set is
    # vocabulary-bounded, so every join below is dimension-sized; the
    # per-sentence triple rows are never rescanned for edges. Result is
    # identical to resolving per-sentence rows (a batchwise-distinct union
    # aggregated by (s,p,o) equals the full distinct).
    svo = fused.where(F.col("sent_id") == SVO_SENT_ID).select(
        "subj_mention", "verb", "obj_mention"
    )
    edges_raw = (
        svo.join(
            F.broadcast(res.select(F.col("mention").alias("subj_mention"),
                                   F.col("curie").alias("subj_curie"))),
            "subj_mention",
        )
        .join(
            F.broadcast(res.select(F.col("mention").alias("obj_mention"),
                                   F.col("curie").alias("obj_curie"))),
            "obj_mention",
        )
        .join(canon_b.withColumnRenamed("node", "subj_curie")
              .withColumnRenamed("canonical", "subject"), "subj_curie")
        .join(canon_b.withColumnRenamed("node", "obj_curie")
              .withColumnRenamed("canonical", "object"), "obj_curie")
        .join(vmap, "verb")
        .where(F.col("subject") != F.col("object"))  # self-loop drop (P5)
    )
    # (s,p,o) dedup happens inside merge_edges as ONE hash aggregate whose
    # map-side partial collapses the hot subject before any shuffle — a
    # partial agg is skew-immune, so salting here would only add a second
    # full shuffle (salting IS load-bearing where rows of a hot key must
    # meet un-collapsed: degree counts use salted_count, stats.py).
    edges = edges_raw.select(
        "subject",
        "predicate",
        "object",
        "relation",
        F.lit("ecokg-web").alias("provided_by"),
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
        # lazy parity view (recomputes extraction on access; the pipeline
        # itself never materializes corpus text — see fused pass above)
        "extracted": extract_pages(pages),
        "audit": audit,
        "triples": triples,
        "linked": linked,
        "quarantine": quarantine,
        "canonical": canon,
        "nodes": merged_nodes,
        "edges": merged_edges,
        "stats_by_predicate": count_by_predicate(merged_edges),
        "stats_by_category": count_by_category(merged_nodes),
        # materialized intermediates, for callers that loop (bench):
        # unpersist these or block-store pressure evicts + recomputes
        "_materialized": [termlist, fused, linked],
    }


def release(out: dict) -> None:
    """Unpersist a build_kg result's materialized blocks (bench hygiene)."""
    for df in out.get("_materialized", []):
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001
            pass


def release_all(spark: SparkSession) -> None:
    """Drop EVERY persistent RDD (localCheckpoint blocks included — which
    plain DataFrame.unpersist does not reach). Bench-loop hygiene: without
    this, repeated runs accumulate block-store state until eviction starts
    recomputing stage outputs mid-measurement."""
    try:
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jrdds.values():
            jrdd.unpersist()
    except Exception:  # noqa: BLE001
        pass
