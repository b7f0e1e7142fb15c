"""Canonical schemas: KGX node/edge tables and the CC-style pages corpus.

KGX shapes mirror the reference's per-transform headers
(eco_kg/transform_utils/transform.py:33-34 defaults; extended 10-column edge
header at eol_traits.py:33-34 / planteome.py:27-28). Pages shape is the
BASELINE.json input_hint, verbatim: (url string, warc_ts timestamp,
html binary, text string, lang string).
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# reference default node header ['id','name','category'] + common property cols
NODE_COLUMNS = ["id", "name", "category", "provided_by"]
NODE_SCHEMA = T.StructType([T.StructField(c, T.StringType(), True) for c in NODE_COLUMNS])

# reference 10-column edge header (eol_traits.py:34)
EDGE_COLUMNS = [
    "subject",
    "predicate",
    "object",
    "relation",
    "has_attribute",
    "has_attribute_type",
    "has_quantitative_value",
    "has_unit",
    "has_qualitative_value",
    "provided_by",
]
EDGE_SCHEMA = T.StructType([T.StructField(c, T.StringType(), True) for c in EDGE_COLUMNS])

# alias termlist (Bio Term Hub shape, utils/biohub_converter.py:7-64)
TERMLIST_COLUMNS = ["cui", "resource", "curie", "term", "preferred", "type"]

# GAF 17-column header (planteome.py:110-121 semantics)
GAF_COLUMNS = [
    "DB", "DB_Object_ID", "DB_Object_Symbol", "Qualifier", "Ontology_ID",
    "DB_Reference", "Evidence_Code", "With_or_From", "Aspect", "DB_Object_Name",
    "DB_Object_Synonym", "DB_Object_Type", "Taxon", "Date", "Assigned_By",
    "Annotation_Extension", "Gene_Product_Form_ID",
]
