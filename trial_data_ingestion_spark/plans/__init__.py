"""Query library backing ``__spark_entry__.py``."""

from trial_data_ingestion_spark.plans.library import (  # noqa: F401
    ALL_ORACLE, ALL_QUERIES, ORACLE, QUERIES, RETIRED_ORACLE,
    RETIRED_QUERIES, flagship,
)
