"""Hashed bag-of-words embeddings (operators/embed.py)."""

import math

from ecokg_spark.operators.embed import hashed_bow_embed


def _vecs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r["embedding"]
            for r in hashed_bow_embed(df, **kw).collect()}


def test_unit_norm_and_dims(spark):
    out = _vecs(spark, [(1, "the cat sat on the mat")], dims=32)
    v = out[1]
    assert len(v) == 32
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)


def test_empty_doc_gets_zero_vector(spark):
    out = _vecs(spark, [(1, "words here"), (2, ""), (3, "   ")], dims=8)
    assert out[2] == [0.0] * 8
    assert out[3] == [0.0] * 8


def test_identical_texts_identical_vectors(spark):
    out = _vecs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
                dims=64)
    assert out[1] == out[2]


def test_cosine_orders_overlap(spark):
    out = _vecs(spark, [
        (1, "spark catalyst shuffle partition join"),
        (2, "spark catalyst shuffle partition merge"),   # 4/5 shared
        (3, "entirely unrelated vocabulary tokens"),
    ], dims=256)

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(out[1], out[2]) > 0.7 > cos(out[1], out[3])


def test_portable_spec_matches_properties(spark):
    # portable md5 bucketing yields the same invariants (unit norm,
    # identical-text equality) — value parity vs DuckDB is the contract row
    out = _vecs(spark, [(1, "a b c a"), (2, "a b c a")], dims=16,
                portable=True)
    assert out[1] == out[2]
    assert math.isclose(sum(x * x for x in out[1]), 1.0, rel_tol=1e-12)


def test_composes_with_semantic_dedup(spark):
    from ecokg_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "completely different text about spark engines"),
    ], "doc_id int, text string")
    emb = hashed_bow_embed(df, dims=64)
    kept = {r["doc_id"] for r in
            semantic_dedup(emb, "embedding", "doc_id", threshold=0.99,
                           exact=True).collect()}
    assert kept == {1, 3}


def test_group_centroids_exact_mean(spark):
    from ecokg_spark.operators.embed import group_centroids

    rows = [(1, [1.0, 2.0, 3.0], "a"), (2, [3.0, 4.0, 5.0], "a"),
            (3, [10.0, 0.0, 0.0], "b")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    got = {r["label"]: (r["n_vectors"], r["centroid"])
           for r in group_centroids(df, group_col="label").collect()}
    assert got["a"] == (2, [2.0, 3.0, 4.0])
    assert got["b"] == (1, [10.0, 0.0, 0.0])


def test_group_centroids_layout_invariant(spark):
    from ecokg_spark.operators.embed import group_centroids

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 5)], i % 2)
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = sorted(map(tuple, group_centroids(df).collect()))
    b = sorted(map(tuple, group_centroids(df.repartition(17)).collect()))
    assert a == b  # decimal staging kills accumulation-order drift
