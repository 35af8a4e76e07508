"""hygiene_report: the one-pass corpus sweep — signal consistency,
PII flags, and the zero-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_hygiene_report_signals_and_plan(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report, fingerprint, token_count,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(100).select("doc_id", "text"))
    rep = hygiene_report(docs)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert len(rows) == 100
    # consistency with the individual operators
    ref = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        fingerprint(F.col("text")).alias("fp")).collect()}
    for d, r in rows.items():
        assert r["n_tokens"] == ref[d]["n_tokens"]
        assert r["fingerprint"] == ref[d]["fp"]
        assert 0.0 <= r["quality"] <= 1.0
        assert r["lang"] is not None
    # plan: single pass, no shuffle, Arrow (not row) Python
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_hygiene_report_flags_planted_pii(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    rows = [
        (1, "Contact me at jane.doe@example.com for the dataset."),
        (2, "Server lives at 192.168.10.44 behind the proxy."),
        (3, "Nothing sensitive here, just prose about mountains."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hygiene_report(df).collect()}
    assert got[1]["has_email"] and not got[1]["has_ip"]
    assert got[2]["has_ip"] and not got[2]["has_email"]
    assert not got[3]["has_email"] and not got[3]["has_ip"]


def test_hygiene_report_native_lid_variant(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(30).select("doc_id", "text"))
    arrow = {r["doc_id"]: r["lang"]
             for r in hygiene_report(docs, lid="arrow").collect()}
    native = {r["doc_id"]: r["lang"]
              for r in hygiene_report(docs, lid="native").collect()}
    assert arrow == native
    # fully native variant has no Python at all in the plan
    plan = (hygiene_report(docs, lid="native")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
