"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's correctness corpus
(trial_data_ingestion_spark.plans.library) — every implemented
operator from SURVEY.md §2 has a named query, and every
SQL-expressible one has a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from trial_data_ingestion_spark.plans import flagship
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from trial_data_ingestion_spark.plans import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from trial_data_ingestion_spark.plans import ORACLE
    return dict(ORACLE)
