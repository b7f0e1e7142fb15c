"""End-to-end north-star pipeline: triple P/R >= 0.95 vs gold, byte-identity
audit, quarantine containment, predicate-skew sanity."""

import pytest
from pyspark.sql import functions as F

from ecokg_spark.pipeline import build_kg
from ecokg_spark.sources.pages import expected_text, synth_gold, synth_pages

N_PAGES = 300


@pytest.fixture(scope="module")
def kg(spark):
    pages = synth_pages(spark, N_PAGES).localCheckpoint(eager=True)
    out = build_kg(spark, pages)
    out["edges"] = out["edges"].localCheckpoint(eager=True)
    return out


def test_triple_precision_recall(spark, kg):
    got = kg["edges"].select("subject", "predicate", "object")
    gold = synth_gold(spark, N_PAGES).select("subject", "predicate", "object")
    tp = got.intersect(gold).count()
    n_got, n_gold = got.count(), gold.count()
    precision = tp / n_got
    recall = tp / n_gold
    assert precision >= 0.95, f"P={precision:.4f} ({tp}/{n_got})"
    assert recall >= 0.95, f"R={recall:.4f} ({tp}/{n_gold})"


def test_extraction_audit(spark, kg):
    exp = expected_text(spark, N_PAGES).withColumnRenamed("text", "want")
    ext = kg["extracted"].select("url", "extracted_text")
    assert ext.join(exp, "url").where(F.col("extracted_text") != F.col("want")).count() == 0
    assert kg["audit"].count() == N_PAGES


def test_quarantine_only_unlinkable(spark, kg):
    # only Publication-entity mentions (excluded from termlist) may quarantine
    pubs = {"flora journal", "journal of flora", "botany review", "review of botany"}
    bad = kg["quarantine"].where(
        ~F.lower(F.col("mention")).isin(list(pubs))
    )
    # allow misspelled variants of pub names (levenshtein 1 from a pub surface)
    from ecokg_spark.operators.linking import MAX_EDIT_DISTANCE

    rows = [r["mention"].lower() for r in bad.collect()]
    import difflib

    for m in rows:
        close = difflib.get_close_matches(m, pubs, n=1, cutoff=0.8)
        assert close, f"unexpected quarantined mention: {m}"


def test_canonicalization_merged_duplicates(kg):
    # cross-source duplicate ids must never appear in edges (canonical wins)
    ids = kg["edges"].select(F.col("subject").alias("id")).unionByName(
        kg["edges"].select(F.col("object").alias("id"))
    ).distinct()
    dups = {r["id"] for r in ids.collect()} & {"TAX:0001", "TAX:0002", "TAX:0003"}
    assert dups == set(), f"uncanonicalized ids leaked: {dups}"


def test_predicate_skew_present(kg):
    # generator reproduces the reference's head-heavy predicate distribution
    stats = {r["predicate"]: r["n"] for r in kg["stats_by_predicate"].collect()}
    assert max(stats, key=stats.get) == "biolink:has_phenotype"


def test_nodes_have_categories(kg):
    nodes = kg["nodes"]
    assert nodes.where(F.col("category").isNull()).count() == 0
    assert nodes.where(F.col("id").isNull()).count() == 0


def test_portable_corpus_exact_gold(spark):
    """The PORTABLE corpus (md5/60-bit draws, no misspellings) makes the
    pipeline's merged edge set equal the gold set BIT-FOR-BIT — the
    invariant the kg_pipeline contract oracle replays in DuckDB."""
    pages = synth_pages(spark, 150, portable=True).localCheckpoint(eager=True)
    got = build_kg(spark, pages)["edges"].select(
        "subject", "predicate", "object", "relation")
    gold = synth_gold(spark, 150, portable=True)
    got_set = {tuple(r) for r in got.collect()}
    gold_set = {tuple(r) for r in gold.collect()}
    assert got_set == gold_set, (
        f"missing={len(gold_set - got_set)} extra={len(got_set - gold_set)}")
