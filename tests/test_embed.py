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


def test_kmeans_lloyd_separated_blobs(spark):
    """Three well-separated 4-d blobs: with one seed per blob (ids are
    arranged so the 3 smallest-md5 ids — 6, 19, 23 — fall in different
    blobs), 2 Lloyd rounds produce pure clusters. Lloyd's cannot recover
    from all-seeds-in-one-blob, so the fixture pins the seed spread
    deterministically rather than hoping."""
    from ecokg_spark.operators.embed import kmeans_lloyd

    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]
    blob_of = {i: i % 3 for i in range(24)}   # 6 -> 0, 19 -> 1, 23 -> 2
    rows = []
    for i in range(24):
        cx, cy = centers[blob_of[i]]
        dx, dy = ((i % 5) - 2) * 0.1, ((i % 7) - 3) * 0.1
        rows.append((i, [cx + dx, cy + dy, float(blob_of[i]), 0.5]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, iterations=2).collect()
    assert len(out) == 24
    by_blob = {}
    for r in out:
        by_blob.setdefault(blob_of[r["vec_id"]], set()).add(r["cluster"])
    # each blob lands in exactly one cluster; clusters distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    # dists are small within tight blobs
    assert all(r["dist"] < 1.0 for r in out)


def test_kmeans_lloyd_deterministic(spark):
    from ecokg_spark.operators.embed import kmeans_lloyd

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 11)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, kmeans_lloyd(df, k=4, iterations=2)
                   .select("vec_id", "cluster", "dist").collect()))
    b = sorted(map(tuple, kmeans_lloyd(df, k=4, iterations=2)
                   .select("vec_id", "cluster", "dist").collect()))
    assert a == b


def test_int8_quantize(spark):
    from ecokg_spark.operators.embed import int8_quantize

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["scale"], r["qvec"])
           for r in int8_quantize(df).collect()}
    s1, q1 = got[1]
    assert q1 == [127, -63, 32, 0]    # floor(127 * x / 1.0 + 0.5)
    assert abs(s1 - 1.0 / 127) < 1e-6
    # reconstruction error bounded by scale/2 per component
    for orig, q in zip([1.0, -0.5, 0.25, 0.0], q1):
        assert abs(orig - q * (1.0 / 127)) <= (1.0 / 127) / 2 + 1e-9
    assert got[2] == (0.0, [0, 0, 0, 0])
