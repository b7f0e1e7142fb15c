"""ecokg_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of Knowledge-Graph-Hub/eco-kg (reference at
/root/reference, studied for semantics only) as an idiomatic Spark pipeline:

    pages (CC-style web corpus)
      -> extract     (HTML boilerplate-strip + sentence split, Arrow UDF, sha256 audit)
      -> triples     (ReVerb/OpenIE-style pattern extraction, batched pandas UDF)
      -> linking     (dictionary + MinHash-LSH entity linking vs broadcast alias map)
      -> components  (large-star/small-star connected-component canonicalization)
      -> merge       (KGX-shape node/edge tables, id-merge + dedup + graph stats)

plus the large-scale training-data toolkit (dedup, similarity search, text
analysis, multimodal plumbing) under ``ecokg_spark.operators``.

Everything is the public DataFrame API; per-row Python only inside Arrow-batched
pandas UDFs (BASELINE.json input_hint: no per-row Python).
"""

__version__ = "0.1.0"
