"""Training-data dedup operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine."""

from pyspark.sql import functions as F

from ecokg_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    with_simhash,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the old river bank tonight"),  # near-dup of 1
    (3, "completely different text about spark shuffle partitions and adaptive execution"),
    (4, "The  Quick brown fox jumps over the lazy dog near the old river bank today"),  # exact dup of 1 (case/ws)
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    surv = exact_dedup(_docs(spark), "text", "doc_id")
    ids = {r["doc_id"] for r in surv.collect()}
    assert ids == {1, 2, 3, 5}  # 4 collapses into 1 (min id wins)


def test_minhash_lsh_finds_neardup(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs
    assert not any({a, b} == {1, 3} for a, b in pairs)


def test_simhash_deterministic_and_neardup(spark):
    h1 = with_simhash(_docs(spark), "text").select("doc_id", "simhash")
    h2 = with_simhash(_docs(spark), "text").select("doc_id", "simhash")
    assert {tuple(r) for r in h1.collect()} == {tuple(r) for r in h2.collect()}
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(_docs(spark), max_hamming=3).collect()}
    # normalized-identical docs hash identically (the exactness guarantee:
    # 4x16-bit chunks find ALL pairs with hamming <= 3 by pigeonhole)
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert all(h <= 3 for h in pairs.values())
    # one-token-diff docs are close in simhash space even if > 3 bits
    hs = {r["doc_id"]: r["simhash"] for r in h1.collect()}
    assert bin(hs[1] ^ hs[2]).count("1") <= 16


def test_ngram_jaccard(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # near-dup of 1
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),      # same direction but other block
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_neardup_pairs(df, block_col="label", threshold=0.99).collect()}
    assert pairs == {(1, 2)}  # (1,4) blocked apart, (1,3) orthogonal
