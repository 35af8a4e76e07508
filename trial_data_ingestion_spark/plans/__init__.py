"""Query library backing ``__spark_entry__.py``."""

from trial_data_ingestion_spark.plans.library import (  # noqa: F401
    QUERIES, ORACLE, flagship,
)
