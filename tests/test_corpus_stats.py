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


def test_approx_heavy_hitters_two_phase(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        approx_heavy_hitters,
    )
    rows = ([("hot",)] * 500 + [("warm",)] * 120
            + [(f"cold{i}",) for i in range(380)])
    df = spark.createDataFrame(rows, "k string")
    got = approx_heavy_hitters(df, "k", support=0.1).collect()
    assert [(r["value"], r["n_rows"]) for r in got] == \
        [("hot", 500), ("warm", 120)]
    assert abs(got[0]["share"] - 0.5) < 1e-9
    # below-support keys never appear even if freqItems over-reported
    assert all(r["share"] >= 0.1 for r in got)


def test_duplicate_family_stats_histogram(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        duplicate_family_stats,
    )
    # one family {1,2,3} (chain), two pair families {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)],
        "doc_a long, doc_b long")
    got = {r["family_size"]: (r["n_families"], r["n_docs"]) for r in
           duplicate_family_stats(pairs).collect()}
    assert got == {3: (1, 3), 2: (2, 4)}


def test_compression_ratio_signal(spark):
    import zlib

    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.operators.textstats import (
        compression_ratio, hygiene_report,
    )
    varied = ("the quick brown fox jumps over a lazy dog while "
              "seventeen astronomers catalogue distant quasars "
              "beneath unusually luminous skies tonight")
    rows = [(1, "spam spam spam " * 50), (2, varied), (3, ""),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id",
                     compression_ratio(F.col("text")).alias("r"))
             .collect()}
    # repetitive text compresses far below varied prose
    assert got[1] < 0.2 < got[2]
    assert got[3] == 1.0 and got[4] is None
    # exact twin of the python computation
    raw = varied.encode()
    assert got[2] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    # opt-in column on the hygiene sweep
    rep = hygiene_report(df.where("text IS NOT NULL"),
                         lid="native", compression=True)
    assert "compression_ratio" in rep.columns


def test_vocabulary_drift_js_divergence(spark):
    import math

    from trial_data_ingestion_spark.operators.corpus_stats import (
        vocabulary_drift,
    )
    a = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "beta gamma")],
        "doc_id long, text string")
    # identical snapshots -> zero divergence, full overlap
    z = vocabulary_drift(a, a).collect()[0]
    assert z["js_divergence"] == 0.0
    assert z["old_types"] == z["new_types"] == z["shared_types"] == 3
    # disjoint vocabularies -> maximal JS = ln 2
    b = spark.createDataFrame([(1, "delta epsilon zeta")],
                              "doc_id long, text string")
    d = vocabulary_drift(a, b).collect()[0]
    assert d["js_divergence"] == round(math.log(2), 6)
    assert d["shared_types"] == 0
    # known-answer partial drift vs a python reference
    c = spark.createDataFrame([(1, "alpha beta beta gamma gamma")],
                              "doc_id long, text string")
    got = vocabulary_drift(a, c).collect()[0]["js_divergence"]
    pa = {"alpha": 2 / 5, "beta": 2 / 5, "gamma": 1 / 5}
    pc = {"alpha": 1 / 5, "beta": 2 / 5, "gamma": 2 / 5}
    js = 0.0
    for t in set(pa) | set(pc):
        p, q = pa.get(t, 0.0), pc.get(t, 0.0)
        m = (p + q) / 2
        if p:
            js += p * math.log(p / m) / 2
        if q:
            js += q * math.log(q / m) / 2
    assert got == round(js, 6)
