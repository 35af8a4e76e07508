"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's correctness corpus
(trial_data_ingestion_spark.plans.library) — every implemented
operator from SURVEY.md §2 has a named query, and every
SQL-expressible one has a DuckDB oracle twin.
"""

from __future__ import annotations

import os as _os
import sys as _sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Spark python workers must import trial_data_ingestion_spark (the
# mapInPandas kernels are pickled by reference).  Workers inherit
# PYTHONPATH at launch, so export the repo root for consumers whose
# working directory is elsewhere.
_REPO = _os.path.dirname(_os.path.abspath(__file__))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
if _REPO not in _os.environ.get("PYTHONPATH", ""):
    _os.environ["PYTHONPATH"] = (
        _REPO + _os.pathsep + _os.environ.get("PYTHONPATH", ""))


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
