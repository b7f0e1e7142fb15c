"""Deterministic KG negative sampling (operators/kgtrain.py)."""

from ecokg_spark.operators.kgtrain import kg_negative_samples


def _triples(spark):
    rows = [(f"s{i}", "p", f"e{i % 7}") for i in range(30)]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string")


def test_negatives_shape_and_filter(spark):
    t = _triples(spark)
    out = kg_negative_samples(t, k=3, buckets=64).collect()
    # no emitted negative is a known positive, and neg_object != object
    positives = {(f"s{i}", "p", f"e{i % 7}") for i in range(30)}
    entities = {f"e{j}" for j in range(7)}
    assert out, "sampling produced no rows"
    for r in out:
        assert (r["subject"], r["predicate"], r["neg_object"]) not in positives
        assert r["neg_object"] in entities
        assert 0 <= r["neg_idx"] < 3
    # at most k negatives per triple
    from collections import Counter
    c = Counter((r["subject"], r["neg_idx"]) for r in out)
    assert all(v == 1 for v in c.values())


def test_negatives_deterministic(spark):
    t = _triples(spark)
    a = sorted(map(tuple, kg_negative_samples(t, k=2, buckets=32).collect()))
    b = sorted(map(tuple, kg_negative_samples(t, k=2, buckets=32).collect()))
    assert a == b


def test_negatives_salt_independence(spark):
    """Different neg_idx values draw from independent choice tables —
    across the triple set the picks must not all coincide."""
    t = _triples(spark)
    out = kg_negative_samples(t, k=2, buckets=64).collect()
    by_idx = {}
    for r in out:
        by_idx.setdefault(r["neg_idx"], set()).add(
            (r["subject"], r["neg_object"]))
    got0 = dict(by_idx.get(0, set()))
    got1 = dict(by_idx.get(1, set()))
    shared = {s for s in got0 if s in got1 and got0[s] == got1[s]}
    assert len(shared) < max(len(got0), 1)


def test_negatives_pipe_in_entity_roundtrips(spark):
    """Entities containing the '|' separator survive the pick-key
    round-trip intact (ADVICE r4: positional substring(_pk, 21), not
    substring_index), and the filtered anti-join compares the REAL
    entity string so known positives are still excluded."""
    rows = [(f"s{i}", "p", f"a|b{i % 5}") for i in range(20)]
    t = spark.createDataFrame(
        rows, "subject string, predicate string, object string")
    out = kg_negative_samples(t, k=3, buckets=8).collect()
    assert out, "sampling produced no rows"
    entities = {f"a|b{j}" for j in range(5)}
    positives = {(f"s{i}", "p", f"a|b{i % 5}") for i in range(20)}
    for r in out:
        # the full pipe-containing entity, never a truncated tail segment
        assert r["neg_object"] in entities, r["neg_object"]
        assert (r["subject"], r["predicate"], r["neg_object"]) \
            not in positives
