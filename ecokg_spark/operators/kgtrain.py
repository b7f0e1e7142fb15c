"""KG-embedding training prep: deterministic negative sampling.

Link-prediction training (TransE, Bordes et al. 2013, and every successor)
pairs each positive (s, p, o) triple with k corrupted negatives whose
object is replaced by a random entity, filtered so a "negative" that is
actually a known positive is dropped (the "filtered" protocol of the KG
benchmark literature). At corpus scale the naive approach — global random
entity indexing — needs either a driver-side entity array or a global
row_number, both of which break at a billion entities (a global window is
ONE task). This operator replaces the index with the engine's hash-argmin
idiom (the hash_walks successor-table trick, operators/graph.py):

  * entities are bucketed by a salted portable hash (md5 60-bit spec,
    bucket = h mod B), and within each (salt, bucket) the argmin-by-hash
    entity is the deterministic "random" pick — one aggregate over the
    entity set, k*B rows out, broadcastable;
  * each (triple, neg_idx) hashes to a bucket under the same salt and
    map-side-joins its pick — no shuffle of the triple table beyond the
    final anti-join against the positive set (the filtered protocol).

Randomness quality: each neg_idx has its own salt, so its B-entry choice
table is an independent uniform draw; a single negative can only land on
B distinct entities per salt, which is exactly the reservoir trade-off —
size B to taste (default 1024; at k=8 that is an 8k-row broadcast).
Everything is exactly recomputable cross-engine (md5 + integer mod +
lexicographic argmin), which the contract oracle exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(col) -> "F.Column":
    """Portable 60-bit hash (first 15 md5 hex chars), the sketch.py spec."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kg_negative_samples(
    triples: DataFrame,
    s: str = "subject",
    p: str = "predicate",
    o: str = "object",
    k: int = 3,
    buckets: int = 1024,
) -> DataFrame:
    """k object-corrupted negatives per positive triple, filtered against
    the positive set. Returns (s, p, neg_object, neg_idx) with the input
    column names for s/p; neg_idx in [0, k) — rows whose pick collided
    with a known positive (or an empty bucket when buckets > |E|) are
    dropped, so a triple can yield fewer than k rows, matching the
    filtered-sampling protocol.

    The entity pool is the distinct OBJECT set (corrupt-object protocol;
    call twice with swapped roles for head corruption).
    """
    t = triples.select(
        F.col(s).alias("_s"), F.col(p).alias("_p"), F.col(o).alias("_o"))
    entities = t.select(F.col("_o").alias("_e")).distinct()

    salts = F.explode(
        F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx")
    eh = _h60(F.concat(F.col("neg_idx").cast("string"), F.lit("#"),
                       F.col("_e")))
    # deterministic argmin-by-hash inside each (salt, bucket): the
    # lexicographic (zero-padded hash, entity) key makes ties — md5
    # collisions aside, impossible anyway — break on the entity itself.
    # The hash prefix is fixed-width (19 digits + 1 separator), so the
    # entity is recovered POSITIONALLY (substring from 21) — entities
    # containing '|' round-trip intact.
    pick_key = F.concat(F.lpad(F.col("_eh").cast("string"), 19, "0"),
                        F.lit("|"), F.col("_e"))
    picks = (
        entities.select(salts, "_e")
        .withColumn("_eh", eh)
        .withColumn("_bucket", F.col("_eh") % buckets)
        .groupBy("neg_idx", "_bucket")
        .agg(F.min(pick_key).alias("_pk"))
        .select(
            "neg_idx", "_bucket",
            F.expr("substring(_pk, 21)").alias("_pick"),
        )
    )

    # length-prefixed record encoding (len:field|len:field|...) keeps the
    # triple hash injective even when field values contain '|'
    def _lp(c):
        return F.concat(F.length(c).cast("string"), F.lit(":"), F.col(c))

    th = _h60(F.concat_ws(
        "|", _lp("_s"), _lp("_p"), _lp("_o"),
        F.col("neg_idx").cast("string")))
    cand = (
        t.select("_s", "_p", "_o", salts)
        .withColumn("_bucket", th % buckets)
        .join(F.broadcast(picks), ["neg_idx", "_bucket"])
        .where(F.col("_pick") != F.col("_o"))
        .select("_s", "_p", F.col("_pick").alias("neg_object"), "neg_idx")
    )
    positives = t.select(
        "_s", "_p", F.col("_o").alias("neg_object")).distinct()
    return (
        cand.join(positives, ["_s", "_p", "neg_object"], "left_anti")
        .select(
            F.col("_s").alias(s), F.col("_p").alias(p),
            "neg_object", F.col("neg_idx").cast("int").alias("neg_idx"),
        )
    )
