"""Native Column-expression functions (Catalyst-visible, no UDFs)."""

from trial_data_ingestion_spark.functions.text import (  # noqa: F401
    normalize_doi,
    extract_doi,
    clean_title,
    normalize_whitespace,
    stable_doc_id,
    chunk_id,
    body_length,
    sections_to_text,
    coalesce_fields,
    pmcid_digits,
)
from trial_data_ingestion_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    cosine_similarity,
    l2_distance,
    inner_product,
)
