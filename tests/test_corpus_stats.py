"""Vocabulary statistics and corpus snapshot diffing: DuckDB value
parity for the vocabulary table, summary invariants, and planted
add/remove/change detection."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_vocabulary_stats_matches_duckdb(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        vocabulary_stats,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    got = {r["token"]: (r["count"], r["doc_freq"]) for r in
           vocabulary_stats(docs).collect()}
    con = duckdb.connect()
    ref = con.execute(f"""
        SELECT token, count(*) AS c, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(
                         trim(lower(text)), '\\s+'), x -> x <> ''))
                       AS token
              FROM '{SF_DIR}/documents.parquet')
        GROUP BY token
    """).fetchall()
    assert len(ref) == len(got) > 0
    for token, c, df_ in ref:
        assert got[token] == (c, df_), token


def test_vocabulary_summary_invariants(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        vocabulary_stats, vocabulary_summary,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    s = vocabulary_summary(docs, top_k=10).collect()[0]
    vocab = vocabulary_stats(docs)
    assert s["n_types"] == vocab.count()
    assert s["n_tokens"] == vocab.agg(F.sum("count")).collect()[0][0]
    assert 0 < s["type_token_ratio"] < 1
    assert 0 < s["top10_coverage"] <= 1


def test_corpus_diff_detects_planted_changes(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_diff, corpus_diff_summary,
    )
    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text"),
         (4, "delta text")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha text"),                  # unchanged
         (2, "beta text REVISED"),           # changed
         (3, "gamma   text"),                # ws-normalized: unchanged
         (5, "epsilon text")],               # added; 4 removed
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in
           corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}
    counts = {r["status"]: r["n_docs"] for r in
              corpus_diff_summary(old, new).collect()}
    assert counts == {"unchanged": 2, "changed": 1,
                      "removed": 1, "added": 1}


def test_corpus_diff_identical_snapshots(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_diff_summary,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    counts = {r["status"]: r["n_docs"] for r in
              corpus_diff_summary(docs, docs).collect()}
    assert set(counts) == {"unchanged"}
