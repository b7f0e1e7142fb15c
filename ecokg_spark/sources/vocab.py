"""Deterministic domain vocabulary for the synthetic CC-style corpus.

Plays the role of the reference's per-source entity universe (EOL taxa /
Planteome terms / trait dictionaries — eol_traits.py:82-83, planteome.py:88-94)
re-cast for a web-text KG-construction pipeline: a Biolink/KGX-style alias
table whose surface forms seed the page generator, the entity-linking
termlist, and the gold triple set.

Structure notes:
  - three cross-source duplicate pairs (an EOL:9xxx id sharing all surface
    forms with a TAX:0xxx id) exercise canonicalization — connected
    components must merge them (canonical id = min curie in component);
  - two `biolink:Publication` entities exercise the termlist category
    exclusion (reference: utils/biohub_converter.py:38-46, EXCLUDE list);
  - VERBS carry sampling weights reproducing the reference's head-heavy
    predicate skew (biolink:has_phenotype = 48% of the production graph,
    merged-kg_stats.yaml:23-24).
"""

from __future__ import annotations

# (curie, preferred_name, synonyms, biolink_category)
VOCAB: list[tuple[str, str, list[str], str]] = [
    # --- organisms (with cross-source duplicate ids -> CC must merge)
    ("TAX:0001", "tomato", ["Solanum lycopersicum", "tomato plant"], "biolink:OrganismTaxon"),
    ("EOL:9001", "Solanum lycopersicum", ["tomato"], "biolink:OrganismTaxon"),  # dup of TAX:0001
    ("TAX:0002", "maize", ["Zea mays", "corn"], "biolink:OrganismTaxon"),
    ("EOL:9002", "Zea mays", ["maize"], "biolink:OrganismTaxon"),  # dup of TAX:0002
    ("TAX:0003", "rice", ["Oryza sativa"], "biolink:OrganismTaxon"),
    ("EOL:9003", "Oryza sativa", ["rice"], "biolink:OrganismTaxon"),  # dup of TAX:0003
    ("TAX:0004", "wheat", ["Triticum aestivum"], "biolink:OrganismTaxon"),
    ("TAX:0005", "barley", ["Hordeum vulgare"], "biolink:OrganismTaxon"),
    ("TAX:0006", "soybean", ["Glycine max"], "biolink:OrganismTaxon"),
    ("TAX:0007", "poplar", ["Populus trichocarpa"], "biolink:OrganismTaxon"),
    ("TAX:0008", "arabidopsis", ["Arabidopsis thaliana"], "biolink:OrganismTaxon"),
    ("TAX:0009", "sorghum", ["Sorghum bicolor"], "biolink:OrganismTaxon"),
    ("TAX:0010", "grapevine", ["Vitis vinifera"], "biolink:OrganismTaxon"),
    ("TAX:0011", "cucumber", ["Cucumis sativus"], "biolink:OrganismTaxon"),
    ("TAX:0012", "sunflower", ["Helianthus annuus"], "biolink:OrganismTaxon"),
    # --- phenotypes / traits
    ("TO:0001", "drought tolerance", ["drought resistance"], "biolink:PhenotypicFeature"),
    ("TO:0002", "leaf area", ["total leaf area"], "biolink:PhenotypicFeature"),
    ("TO:0003", "plant height", ["stem height"], "biolink:PhenotypicFeature"),
    ("TO:0004", "seed mass", ["grain weight"], "biolink:PhenotypicFeature"),
    ("TO:0005", "root depth", ["rooting depth"], "biolink:PhenotypicFeature"),
    ("TO:0006", "flowering time", ["anthesis time"], "biolink:PhenotypicFeature"),
    ("TO:0007", "salt tolerance", ["salinity tolerance"], "biolink:PhenotypicFeature"),
    ("TO:0008", "frost resistance", ["cold hardiness"], "biolink:PhenotypicFeature"),
    # --- chemicals
    ("CHEBI:0001", "nitrogen", ["elemental nitrogen"], "biolink:ChemicalEntity"),
    ("CHEBI:0002", "phosphorus", ["elemental phosphorus"], "biolink:ChemicalEntity"),
    ("CHEBI:0003", "chlorophyll", ["leaf pigment"], "biolink:ChemicalEntity"),
    ("CHEBI:0004", "auxin", ["growth hormone"], "biolink:ChemicalEntity"),
    # --- anatomy
    ("PO:0001", "leaf blade", ["lamina"], "biolink:AnatomicalEntity"),
    ("PO:0002", "root system", ["root network"], "biolink:AnatomicalEntity"),
    ("PO:0003", "xylem tissue", ["woody tissue"], "biolink:AnatomicalEntity"),
    ("PO:0004", "seed coat", ["testa"], "biolink:AnatomicalEntity"),
    # --- environments
    ("ENV:0001", "alkaline soil", ["basic soil"], "biolink:EnvironmentalFeature"),
    ("ENV:0002", "wetland habitat", ["marsh habitat"], "biolink:EnvironmentalFeature"),
    ("ENV:0003", "temperate forest", ["mixed forest"], "biolink:EnvironmentalFeature"),
    ("ENV:0004", "coastal dune", ["sand dune"], "biolink:EnvironmentalFeature"),
    # --- publications: excluded from the termlist (biohub_converter.py EXCLUDE)
    ("PUB:0001", "flora journal", ["journal of flora"], "biolink:Publication"),
    ("PUB:0002", "botany review", ["review of botany"], "biolink:Publication"),
]

# duplicate-id components (curies sharing every surface form); canonical = min
_DUP_PAIRS = {"TAX:0001": "EOL:9001", "TAX:0002": "EOL:9002", "TAX:0003": "EOL:9003"}

#: per-VOCAB-index canonical curie (None for Publication entities — those
#: mentions must NOT be linked; they land in the quarantine table)
CANONICAL: list[str | None] = []
for curie, _name, _syns, cat in VOCAB:
    if cat == "biolink:Publication":
        CANONICAL.append(None)
    else:
        pair = {**_DUP_PAIRS, **{v: k for k, v in _DUP_PAIRS.items()}}.get(curie)
        CANONICAL.append(min(curie, pair) if pair else curie)

#: per-VOCAB-index surface-form list (preferred name first)
SURFACES: list[list[str]] = [[name, *syns] for _c, name, syns, _cat in VOCAB]

#: per-VOCAB-index category
CATEGORIES: list[str] = [cat for *_rest, cat in VOCAB]

HOT_ENTITY_IDX = 0  # "tomato" — hot subject (head-entity skew, north_rule)

# (verb phrase, biolink predicate, RO relation, cumulative weight /100).
# Weight layout reproduces the reference's predicate skew:
# has_phenotype ~45%, expressed_in ~15% (merged-kg_stats.yaml:15-16,23-24).
VERBS: list[tuple[str, str, str, int]] = [
    ("has phenotype", "biolink:has_phenotype", "RO:0002200", 45),
    ("expressed in", "biolink:expressed_in", "RO:0002206", 60),
    ("is a", "biolink:subclass_of", "rdfs:subClassOf", 70),
    ("found in", "biolink:located_in", "RO:0001025", 78),
    ("grows in", "biolink:occurs_in", "BFO:0000066", 85),
    ("has part", "biolink:has_part", "BFO:0000051", 91),
    ("regulates", "biolink:regulates", "RO:0002211", 96),
    ("interacts with", "biolink:interacts_with", "RO:0002434", 100),
]

VERB_PHRASES = [v[0] for v in VERBS]
VERB_PREDICATES = [v[1] for v in VERBS]
VERB_RELATIONS = [v[2] for v in VERBS]
VERB_CUM_WEIGHTS = [v[3] for v in VERBS]
