"""Differential test: every oracle-paired query must match DuckDB at
sf0.01 — the same gate the driver applies (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import compare, run_oracle


def _pairs():
    from trial_data_ingestion_spark.plans import ORACLE, QUERIES
    return sorted(ORACLE), QUERIES


ORACLE_NAMES = _pairs()[0]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    from trial_data_ingestion_spark.plans import ORACLE, QUERIES
    sdf = QUERIES[name](spark, SF_DIR_ORACLE)
    odf = run_oracle(ORACLE[name], SF_DIR_ORACLE)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_approx_distinct_within_error(spark):
    """q36 has no SQL oracle (HLL sketches are engine-specific), but
    the estimate must land within ~3x the configured 2% relative
    error of the exact count it carries alongside."""
    from trial_data_ingestion_spark.plans import QUERIES
    rows = QUERIES["q36_approx_distinct"](spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= \
            max(3, 0.06 * r.exact_users), r


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and be deterministic."""
    from trial_data_ingestion_spark.plans import ORACLE, QUERIES
    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, SF_DIR_ORACLE)
        c1 = df.count()
        c2 = fn(spark, SF_DIR_ORACLE).count()
        assert c1 == c2, f"{name} row count not deterministic"


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
