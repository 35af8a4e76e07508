"""Corpus card: internal consistency vs direct groupBys, dup-rate
known answer, GROUPING-flag disambiguation under a NULL source, and
the one-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_corpus_card_consistent_with_direct_aggregates(spark):
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    from trial_data_ingestion_spark.pipelines.report import corpus_card

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    card = corpus_card(docs)
    rep = hygiene_report(docs, keep_cols=["source"])
    assert card["overall"]["n_docs"] == docs.count()
    assert card["overall"]["total_tokens"] == \
        rep.agg(F.sum("n_tokens")).collect()[0][0]
    # slice masses partition the corpus
    assert sum(m["n_docs"] for m in card["by_lang"].values()) \
        == docs.count()
    assert sum(m["n_docs"] for m in card["by_source"].values()) \
        == docs.count()
    # per-source doc counts equal a direct groupBy
    direct = {r["source"]: r["count"] for r in
              docs.groupBy("source").count().collect()}
    assert {s: m["n_docs"] for s, m in card["by_source"].items()} \
        == direct
    # quartiles are ordered and bracket the mean-ish region
    q = card["overall"]["quality_quartiles"]
    assert q[0] <= q[1] <= q[2]


def test_corpus_card_dup_rate_known_answer(spark):
    from trial_data_ingestion_spark.pipelines.report import corpus_card

    rows = [(1, "alpha beta gamma", "a"), (2, "alpha beta gamma", "a"),
            (3, "delta epsilon zeta", "a"), (4, "eta theta iota", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = corpus_card(df)
    # 4 docs, 3 distinct fingerprints -> dup rate 0.25
    assert abs(card["overall"]["exact_dup_rate"] - 0.25) < 1e-9
    assert abs(card["by_source"]["a"]["exact_dup_rate"] - (1 - 2 / 3)) \
        < 1e-6
    assert card["by_source"]["b"]["exact_dup_rate"] == 0.0


def test_corpus_card_null_source_not_overall(spark):
    from trial_data_ingestion_spark.pipelines.report import corpus_card

    rows = [(1, "some reasonable english text here", None),
            (2, "other reasonable english text here", "web")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = corpus_card(df)
    assert card["overall"]["n_docs"] == 2
    assert card["by_source"][None]["n_docs"] == 1
    assert card["by_source"]["web"]["n_docs"] == 1


def test_corpus_card_plan_one_shuffle(spark):
    from trial_data_ingestion_spark.pipelines.report import corpus_card_df

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = corpus_card_df(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert plan.count("Exchange") == 1          # grouping sets: 1 shuffle
    assert "Expand" in plan                     # the 3 sets share it
    assert "Join" not in plan                   # signals ride the scan