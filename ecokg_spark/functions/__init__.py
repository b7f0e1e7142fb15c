from ecokg_spark.functions.curie import (  # noqa: F401
    collapse_uniprot_curie,
    curie_local,
    curie_prefix,
    guess_bl_category,
    make_curie,
    priority_coalesce,
)
from ecokg_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    normalize_ws,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)
