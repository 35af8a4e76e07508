"""trial_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
``mayakrish85/trial_data_ingestion`` (scientific-article ingestion:
bibliography/CSV/JSON scan -> DOI normalization + dedup -> batched
full-text fetch -> JATS XML parse -> overlapping text chunking ->
embedding -> keyed vector-store upsert), re-expressed as idiomatic
Spark DataFrame / SQL / Structured Streaming, and extended with the
large-scale training-data-pipeline operators (exact + near-dup
deduplication, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7):
  * native Column expressions wherever possible (Catalyst-visible),
  * Arrow-batched ``mapInPandas`` kernels only for genuinely
    non-relational work (XML parse, tokenizing chunker, embedders),
  * lazy end-to-end DAGs, AQE on, broadcast for small dims,
  * every operator designed for 100 TB / 1000-executor scale even
    though tests run on local[32].
"""

__version__ = "0.1.0"

from trial_data_ingestion_spark.session import get_spark  # noqa: F401
