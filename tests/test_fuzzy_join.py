"""Fuzzy edit-distance join: DuckDB nested-loop parity proves the
q-gram blocking is lossless; synthetic cases pin the short-string
fallback and the distance semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.fuzzy_join import fuzzy_join_pairs


def _pairs(df):
    return {(r[0], r[1], r[2]) for r in df.collect()}


def test_matches_duckdb_nested_loop_on_real_slices(spark, sf_dir):
    """Blocked join == full quadratic levenshtein join on real text
    prefixes (includes identical-prefix families -> distance 0, and
    near-misses from the synthetic dup corpus)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = (docs.where("doc_id % 2 = 0")
            .select("doc_id", F.substring("text", 1, 40).alias("t")))
    right = (docs.where("doc_id % 2 = 1")
             .select("doc_id", F.substring("text", 1, 40).alias("t")))
    got = _pairs(fuzzy_join_pairs(left, right, "doc_id", "t",
                                  "doc_id", "t", max_distance=3))
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW d AS
        SELECT doc_id, substr(text, 1, 40) AS t
        FROM '{sf_dir}/documents.parquet'""")
    want = set(con.execute("""
        SELECT a.doc_id, b.doc_id, levenshtein(a.t, b.t)
        FROM d a JOIN d b
          ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
         AND levenshtein(a.t, b.t) <= 3
    """).fetchall())
    assert got == want
    assert len(got) > 0


def test_short_string_fallback_is_lossless(spark):
    """Strings below the pigeonhole length share no q-gram yet must
    still match ('cat' ~ 'bat' at distance 1 shares zero 3-grams)."""
    left = spark.createDataFrame(
        [(1, "cat"), (2, "ab"), (3, "hello")], "id long, t string")
    right = spark.createDataFrame(
        [(10, "bat"), (20, "abc"), (30, "hallo"), (40, "zzzzzz")],
        "id long, t string")
    got = _pairs(fuzzy_join_pairs(left, right, "id", "t", "id", "t",
                                  max_distance=1))
    assert got == {(1, 10, 1), (2, 20, 1), (3, 30, 1)}


def test_distance_zero_and_bounds(spark):
    left = spark.createDataFrame(
        [(1, "deterministic blocking join")], "id long, t string")
    right = spark.createDataFrame(
        [(2, "deterministic blocking join"),
         (3, "deterministic blocking joins"),
         (4, "totally different string here")], "id long, t string")
    got = _pairs(fuzzy_join_pairs(left, right, "id", "t", "id", "t",
                                  max_distance=2))
    assert got == {(1, 2, 0), (1, 3, 1)}


def test_no_python_in_plan(spark):
    """The whole join is native (explode/substring/levenshtein) —
    no Arrow or row-at-a-time Python stages anywhere."""
    left = spark.createDataFrame([(1, "abcdefghij")], "id long, t string")
    out = fuzzy_join_pairs(left, left, "id", "t", "id", "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_short_string_path_is_equi_join(spark):
    """The +-d length window is an exploded candidate-length EQUI
    join, never a BroadcastNestedLoopJoin: a corpus dense in short
    titles must not pay a full scan of the long side per short row
    (round-5 verdict item).  Parity on the same input is covered by
    test_short_string_fallback_is_lossless."""
    rows = [(i, f"t{i % 7}") for i in range(50)]      # all short
    df = spark.createDataFrame(rows, "id long, t string")
    out = fuzzy_join_pairs(df, df, "id", "t", "id", "t",
                           max_distance=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    # and the rewrite still finds the matches
    got = _pairs(out)
    assert (0, 7, 0) in got        # 't0' ~ 't0' (ids 0 and 7)
    assert (0, 1, 1) in got        # 't0' ~ 't1'
    assert all(d <= 2 for _, _, d in got)


def test_q_sweep_is_lossless_and_auto_derives_the_dial(spark, sf_dir):
    """The gram-length dial moves ONLY the path split, never the
    output: identical pair sets at q=4/6/9 and q='auto' on real
    text, and 'auto' lands on the pigeonhole-margin optimum
    ((p5 - d) // (d + 1) = 9 for 40-char windows at d=3) instead of
    the r12 bench-side constant."""
    from trial_data_ingestion_spark.operators.fuzzy_join import _auto_q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = (docs.where("doc_id % 2 = 0")
            .select("doc_id", F.substring("text", 1, 40).alias("t")))
    right = (docs.where("doc_id % 2 = 1")
             .select("doc_id", F.substring("text", 1, 40).alias("t")))
    base = _pairs(fuzzy_join_pairs(left, right, "doc_id", "t",
                                   "doc_id", "t", max_distance=3,
                                   q=4))
    for q in (6, 9, "auto"):
        got = _pairs(fuzzy_join_pairs(left, right, "doc_id", "t",
                                      "doc_id", "t", max_distance=3,
                                      q=q))
        assert got == base, f"pair set changed at q={q}"
    lt = left.select(F.col("doc_id").alias("l_id"),
                     F.col("t").alias("l_t"))
    rt = right.select(F.col("doc_id").alias("r_id"),
                      F.col("t").alias("r_t"))
    assert _auto_q(lt, rt, 3) == 9
    # degenerate corpora clamp to the classic default, never below
    tiny = spark.createDataFrame([(1, "ab")], "id long, t string")
    tl = tiny.select(F.col("id").alias("l_id"), F.col("t").alias("l_t"))
    tr = tiny.select(F.col("id").alias("r_id"), F.col("t").alias("r_t"))
    assert _auto_q(tl, tr, 2) == 4
    with pytest.raises(ValueError, match="positive int or 'auto'"):
        fuzzy_join_pairs(tiny, tiny, "id", "t", "id", "t", q=0)
