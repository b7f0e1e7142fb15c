"""KGX graph validation: the `kgx validate` step of the reference's
toolchain (Knowledge-Graph-Hub pipelines run kgx validation over merged
node/edge TSVs before publishing) re-expressed as distributed counts.

Each check is one aggregate (or one anti-join + count) over the graph
tables — no row ever reaches the driver; the report is a handful of
(check, n_violations) rows. At 100 TB the dangling-edge checks are the
only shuffles (edge-key vs node-id anti-joins); everything else is a
narrow scan + count.

Checks (public KGX/Biolink conventions):
  node_id_null          nodes with a NULL/empty id
  node_id_duplicate     ids appearing more than once (count of EXTRA rows)
  node_id_not_curie     ids that are not prefix:reference CURIEs
  node_category_missing nodes with NULL/empty category
  node_category_not_biolink  categories without the biolink: prefix
  edge_subject_dangling edges whose subject is not a node id
  edge_object_dangling  edges whose object is not a node id
  edge_predicate_not_biolink predicates without the biolink: prefix
  edge_self_loop        subject == object rows
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# prefix:reference — prefix starts with a letter or underscore, reference
# is non-empty and non-whitespace (the KGX TSV convention)
CURIE_RE = "^[A-Za-z_][A-Za-z0-9_.-]*:[^ \\t]+$"


def _count(name: str, df: DataFrame) -> DataFrame:
    return df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")
                  ).select(F.lit(name).alias("check"), "n_violations")


def validate_kgx(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Validation report: (check, n_violations), one row per check."""
    node_id = F.col("id")
    cat = F.col("category")
    bad_id = nodes.where(node_id.isNull() | (node_id == ""))
    dupes = (
        nodes.where(node_id.isNotNull())
        .groupBy("id").agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select((F.col("_n") - 1).alias("_extra"))
        .agg(F.coalesce(F.sum("_extra"), F.lit(0)).cast("long")
             .alias("n_violations"))
        .select(F.lit("node_id_duplicate").alias("check"), "n_violations")
    )
    not_curie = nodes.where(node_id.isNotNull() & (node_id != "")
                            & ~node_id.rlike(CURIE_RE))
    cat_missing = nodes.where(cat.isNull() | (cat == ""))
    cat_not_biolink = nodes.where(cat.isNotNull() & (cat != "")
                                  & ~cat.startswith("biolink:"))

    ids = nodes.where(node_id.isNotNull()).select("id").distinct()
    s_dangling = edges.join(ids.withColumnRenamed("id", "subject"),
                            "subject", "left_anti")
    o_dangling = edges.join(ids.withColumnRenamed("id", "object"),
                            "object", "left_anti")
    pred_not_biolink = edges.where(
        F.col("predicate").isNull()
        | ~F.col("predicate").startswith("biolink:"))
    self_loop = edges.where(F.col("subject") == F.col("object"))

    report = _count("node_id_null", bad_id)
    for piece in (
        dupes,
        _count("node_id_not_curie", not_curie),
        _count("node_category_missing", cat_missing),
        _count("node_category_not_biolink", cat_not_biolink),
        _count("edge_subject_dangling", s_dangling),
        _count("edge_object_dangling", o_dangling),
        _count("edge_predicate_not_biolink", pred_not_biolink),
        _count("edge_self_loop", self_loop),
    ):
        report = report.unionByName(piece)
    return report
