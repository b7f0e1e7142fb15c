"""CURIE / identifier column expressions (all JVM-side, codegen-friendly).

Parity targets in the reference (semantics only, re-expressed as Catalyst
expressions — zero Python in the hot path):
  - prefix/local split:        eco_kg/utils/transform_utils.py:191 (`identifier.split(':')[0]`)
  - guess_bl_category:         eco_kg/utils/transform_utils.py:183-198
  - collapse_uniprot_curie:    eco_kg/utils/transform_utils.py:201-210
  - CURIE build by concat:     eol_traits.py:274 (`org_prefix + str(page_id)`)
  - get_item_by_priority:      eco_kg/utils/transform_utils.py:83-97
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def curie_prefix(col: Column | str) -> Column:
    """`identifier.split(':')[0]` — the CURIE namespace prefix."""
    return F.substring_index(col, ":", 1)


def curie_local(col: Column | str) -> Column:
    """Everything after the first ':' (CURIE local id)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^[^:]*:", "")


def make_curie(prefix: str, col: Column | str) -> Column:
    """CURIE build by prefix concatenation (eol_traits.py:274 semantics)."""
    return F.concat(F.lit(prefix + ":"), F.col(col) if isinstance(col, str) else col)


def guess_bl_category(col: Column | str) -> Column:
    """Biolink category from CURIE prefix (transform_utils.py:183-198)."""
    p = curie_prefix(col)
    return (
        F.when(p.isin("UniProtKB", "ComplexPortal"), F.lit("biolink:Protein"))
        .when(p == "GO", F.lit("biolink:OntologyClass"))
        .otherwise(F.lit("biolink:NamedThing"))
    )


def collapse_uniprot_curie(col: Column | str) -> Column:
    """Collapse UniProt isoform CURIEs to the parent protein
    (transform_utils.py:201-210): strip a trailing ``-<digits>`` iff the
    string starts with ``uniprotkb:`` case-insensitively."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike("(?i)^uniprotkb:"), F.regexp_replace(c, r"-\d+$", "")).otherwise(c)


def priority_coalesce(*cols: Column | str) -> Column:
    """First non-null, non-empty value in priority order
    (get_item_by_priority, transform_utils.py:83-97): empty string counts
    as missing."""
    parts = [
        F.nullif(F.col(c) if isinstance(c, str) else c, F.lit(""))
        for c in cols
    ]
    return F.coalesce(*parts)
