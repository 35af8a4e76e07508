"""Benchmark-decontamination tests: known-answer planting, DuckDB
value parity for the report, anti-join removal semantics, and the
broadcast-join plan shape that makes it 100 TB-safe."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from tests.conftest import SF_DIR as SF_DIR_SMOKE


BENCH_ROWS = [
    (0, "the seven wonders of the ancient world include the great "
        "pyramid of giza and the hanging gardens"),
    (1, "a stitch in time saves nine according to the old proverb "
        "about timely effort preventing larger work"),
]

CORPUS_ROWS = [
    # verbatim copy of a benchmark item -> contaminated
    (10, "Spam intro. The seven wonders of the ancient world include "
         "the GREAT pyramid of Giza and the hanging gardens!"),
    # 8-token overlap only ("a stitch in time saves nine according to")
    (11, "She said: a stitch in time saves nine, according to "
         "somebody; the rest of this text is completely unrelated."),
    # 7-token overlap -> NOT contaminated at n=8
    (12, "a stitch in time saves nine according -- but then it "
         "wanders off into entirely different territory altogether."),
    # no overlap at all
    (13, "Completely novel text speaking of volcanoes, glaciers and "
         "the slow patience of geological time."),
    # too short to form one 8-gram
    (14, "five little tokens only here"),
]


def test_contamination_known_answers(spark):
    from trial_data_ingestion_spark.operators.decontam import (
        benchmark_gram_table, contamination_report,
    )
    bench = spark.createDataFrame(BENCH_ROWS, "doc_id long, text string")
    corpus = spark.createDataFrame(CORPUS_ROWS, "doc_id long, text string")
    grams = benchmark_gram_table(bench, "text", n=8)
    rep = {r["doc_id"]: r for r in
           contamination_report(corpus, grams, n=8).collect()}
    assert rep[10]["is_contaminated"]
    assert rep[10]["matched_grams"] >= 8   # long verbatim run
    assert rep[11]["is_contaminated"]
    assert rep[11]["matched_grams"] == 1   # exactly one shared 8-gram
    assert not rep[12]["is_contaminated"]  # 7-token overlap is below n
    assert not rep[13]["is_contaminated"]
    assert rep[14]["total_grams"] == 0 and not rep[14]["is_contaminated"]
    # ratio sanity: verbatim copy's grams are mostly matched
    assert rep[10]["contamination_ratio"] > 0.4


def test_decontaminate_removes_exactly_the_flagged(spark):
    from trial_data_ingestion_spark.operators.decontam import decontaminate
    bench = spark.createDataFrame(BENCH_ROWS, "doc_id long, text string")
    corpus = spark.createDataFrame(CORPUS_ROWS, "doc_id long, text string")
    kept = decontaminate(corpus, bench, n=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [12, 13, 14]
    assert kept.columns == corpus.columns


def test_multi_benchmark_attribution(spark):
    """Two benchmarks, planted copies of each in the corpus: the
    attribution names the right suite per doc, a doc overlapping
    both benchmarks gets both rows, decontaminate_multi drops the
    union, and the plan is ONE corpus gram pass with one broadcast
    (N benchmarks must never mean N corpus sweeps)."""
    from trial_data_ingestion_spark.operators.decontam import (
        decontaminate_multi, multi_benchmark_contamination,
    )
    import pytest

    bench_a = spark.createDataFrame([BENCH_ROWS[0]],
                                    "doc_id long, text string")
    bench_b = spark.createDataFrame([BENCH_ROWS[1]],
                                    "doc_id long, text string")
    both_text = BENCH_ROWS[0][1] + " and also " + BENCH_ROWS[1][1]
    corpus = spark.createDataFrame(
        CORPUS_ROWS + [(15, both_text)], "doc_id long, text string")
    marks = {"wonders": bench_a, "proverbs": bench_b}
    att = {(r["doc_id"], r["benchmark"]): r["matched_grams"]
           for r in multi_benchmark_contamination(
               corpus, marks, n=8).collect()}
    assert (10, "wonders") in att and (10, "proverbs") not in att
    assert (11, "proverbs") in att and (11, "wonders") not in att
    assert (15, "wonders") in att and (15, "proverbs") in att
    assert not any(d in (12, 13, 14) for d, _ in att)
    kept = decontaminate_multi(corpus, marks, n=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [12, 13, 14]
    assert kept.columns == corpus.columns
    plan = (multi_benchmark_contamination(corpus, marks, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    with pytest.raises(ValueError):
        multi_benchmark_contamination(corpus, {})


def test_scrub_contaminated_spans_known_answers(spark):
    """Surgical scrub: exactly the benchmark-matching token run is
    removed (case-insensitively), the rest of the doc survives,
    clean docs pass through byte-identical, and short docs / short
    benchmark items cannot match."""
    from trial_data_ingestion_spark.operators.decontam import (
        scrub_contaminated_spans,
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")              # exactly 8 tokens
    corpus = spark.createDataFrame([
        # planted mid-doc, case-varied -> scrubbed (8 tokens)
        (1, "intro words here ALPHA beta GAMMA delta epsilon zeta "
            "eta theta and a clean tail"),
        # clean -> byte-identical (incl. odd spacing)
        (2, "totally  unrelated   text with   odd spacing kept"),
        # overlapping occurrence: 9-token run holds two matching
        # 8-gram starts only if both windows match the benchmark —
        # here just the one window matches, 8 tokens scrubbed
        (3, "alpha beta gamma delta epsilon zeta eta theta coda"),
        # 7-token prefix of the item -> below n, survives
        (4, "alpha beta gamma delta epsilon zeta eta stops short"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: (r["text"], r["n_scrubbed_tokens"]) for r in
           scrub_contaminated_spans(corpus, bench, n=8).collect()}
    assert out[1] == ("intro words here and a clean tail", 8)
    assert out[2] == ("totally  unrelated   text with   odd spacing "
                      "kept", 0)
    assert out[3] == ("coda", 8)
    assert out[4][1] == 0 and out[4][0].startswith("alpha beta")
    # case-sensitive mode: the case-varied plant survives
    strict = {r["doc_id"]: r["n_scrubbed_tokens"] for r in
              scrub_contaminated_spans(corpus, bench, n=8,
                                       lowercase=False).collect()}
    assert strict[1] == 0 and strict[3] == 8
    # exact-string keys agree with hashed keys
    unhashed = {r["doc_id"]: r["n_scrubbed_tokens"] for r in
                scrub_contaminated_spans(corpus, bench, n=8,
                                         hash_grams=False).collect()}
    assert unhashed == {1: 8, 2: 0, 3: 8, 4: 0}


def test_scrub_plan_broadcasts_benchmark(spark):
    """The scrubber inherits decontam's 100 TB shape: benchmark grams
    broadcast, no corpus shuffle by gram, no Python."""
    from trial_data_ingestion_spark.operators.decontam import (
        scrub_contaminated_spans,
    )
    bench = spark.createDataFrame(BENCH_ROWS, "doc_id long, text string")
    corpus = spark.createDataFrame(CORPUS_ROWS, "doc_id long, text string")
    plan = (scrub_contaminated_spans(corpus, bench, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_contamination_report_matches_duckdb(spark):
    """Value parity with an independent DuckDB implementation over
    the sf0.001 documents table, benchmark = 5 of its own docs (so
    overlap is guaranteed) plus one never-matching probe."""
    from trial_data_ingestion_spark.operators.decontam import (
        benchmark_gram_table, contamination_report,
    )
    n = 8
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    bench = (docs.where(F.col("doc_id") % 97 == 3)
                 .select("doc_id", "text").limit(5))
    bench_rows = [(r["doc_id"], r["text"]) for r in bench.collect()]
    grams = benchmark_gram_table(bench, "text", n=n)
    got = {r["doc_id"]: (r["total_grams"], r["matched_grams"],
                         round(r["contamination_ratio"], 9))
           for r in contamination_report(docs, grams, n=n).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/documents.parquet'")
    con.execute("CREATE TABLE bench (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    gram_expr = (
        "list_transform(generate_series(1, greatest(len(tk) - {m}, 0)),"
        " i -> array_to_string(tk[i : i + {m}], ' '))"
    ).format(m=n - 1)
    tok = ("list_filter(string_split(trim(regexp_replace(lower(text),"
           " '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')")
    oracle = con.execute(f"""
        WITH bg AS (
          SELECT DISTINCT unnest({gram_expr}) AS g
          FROM (SELECT {tok} AS tk FROM bench)),
        cg AS (
          SELECT doc_id, {gram_expr} AS grams
          FROM (SELECT doc_id, {tok} AS tk FROM documents)),
        m AS (
          SELECT doc_id, count(DISTINCT g) AS matched
          FROM (SELECT doc_id, unnest(grams) AS g FROM cg)
          JOIN bg USING (g) GROUP BY doc_id)
        SELECT cg.doc_id, len(grams) AS total,
               coalesce(matched, 0) AS matched
        FROM cg LEFT JOIN m USING (doc_id)
    """).fetchall()
    assert len(oracle) == len(got)
    for doc_id, total, matched in oracle:
        ratio = round(matched / total, 9) if total else 0.0
        assert got[doc_id] == (total, matched, ratio), doc_id


def test_decontam_plan_broadcasts_benchmark(spark):
    """The benchmark side must broadcast — a corpus-side shuffle by
    gram would be the 100 TB scale-killer."""
    from trial_data_ingestion_spark.operators.decontam import (
        benchmark_gram_table, contamination_report,
    )
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    bench = docs.limit(3).select("doc_id", "text")
    rep = contamination_report(docs, benchmark_gram_table(bench))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan        # fully native pipeline
