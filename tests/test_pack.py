"""Concat-and-chunk sequence packing: interval arithmetic and invariants."""

from pyspark.sql import functions as F

from ecokg_spark.operators.pack import pack_sequences


def test_pack_invariants(spark):
    """Every chunk except the shard's last is exactly full; slice lengths
    sum to each doc's token count; slices within a chunk tile [0, L)."""
    rows = [(i, f"s{i % 3}", 100 + (i * 37) % 900) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tokens long")
    L = 512
    out = pack_sequences(df, n_tokens_col="n_tokens", context_len=L,
                         shard_col="shard").collect()

    by_doc, by_chunk = {}, {}
    for r in out:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["end_tok"] - r["begin_tok"]
        by_chunk.setdefault((r["shard"], r["chunk_idx"]), 0)
        by_chunk[(r["shard"], r["chunk_idx"])] += r["end_tok"] - r["begin_tok"]
        assert 0 <= r["begin_tok"] < r["end_tok"] <= L

    truth = {r[0]: r[2] for r in rows}
    assert by_doc == truth  # every token lands exactly once

    last = {}
    for (shard, ci) in by_chunk:
        last[shard] = max(last.get(shard, -1), ci)
    for (shard, ci), filled in by_chunk.items():
        if ci < last[shard]:
            assert filled == L, f"non-final chunk {shard}/{ci} has {filled}"


def test_pack_is_layout_invariant(spark):
    df1 = spark.createDataFrame(
        [(i, 300) for i in range(20)], "doc_id long, n_tokens long")
    df2 = df1.repartition(7)
    a = sorted(map(tuple, pack_sequences(df1, context_len=1024).collect()))
    b = sorted(map(tuple, pack_sequences(df2, context_len=1024).collect()))
    assert a == b


def test_pack_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, -5)], "doc_id long, n_tokens long")
    out = pack_sequences(df, context_len=64).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_chunk_sliding_windows(spark):
    from ecokg_spark.operators.pack import chunk_sliding

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
            (2, "a b c"),                                 # shorter than size
            (3, ""),                                      # no rows
            (4, "   "),                                   # blank, no rows
        ],
        "doc_id long, text string")
    out = chunk_sliding(docs, size=4, stride=3)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: starts 0,3,6 cover tokens 0-9; last window short
    assert rows[(1, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(1, 2)] == (4, "t6 t7 t8 t9")
    assert (1, 3) not in rows
    assert rows[(2, 0)] == (3, "a b c")
    assert not any(d in (3, 4) for d, _ in rows)


def test_chunk_sliding_overlap_and_bounds(spark):
    from ecokg_spark.operators.pack import chunk_sliding

    docs = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(101)))], "doc_id long, text string")
    out = chunk_sliding(docs, size=64, stride=48).collect()
    # 101 tokens: starts 0 and 48 (48+64 >= 101)
    assert sorted(r["chunk_idx"] for r in out) == [0, 1]
    ns = {r["chunk_idx"]: r["n_tokens"] for r in out}
    assert ns[0] == 64 and ns[1] == 53
    # every token appears in some chunk (coverage invariant)
    seen = set()
    for r in out:
        seen.update(r["chunk_text"].split(" "))
    assert seen == {str(i) for i in range(101)}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_sliding(docs, size=4, stride=5)
