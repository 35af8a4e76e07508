"""Unit tests for the as-of and salted join operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.joins import asof_join, salted_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_known_answers(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 1.0),
         ("A", _ts("2024-01-01T10:05:00"), 2.0),
         ("B", _ts("2024-01-01T10:02:00"), 9.0)],
        "sym string, qts timestamp, px double")
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T09:59:00")),   # before any quote -> null
         (2, "A", _ts("2024-01-01T10:00:00")),   # tie -> 1.0 (<= semantics)
         (3, "A", _ts("2024-01-01T10:04:59")),   # -> 1.0
         (4, "A", _ts("2024-01-01T10:06:00")),   # -> 2.0
         (5, "B", _ts("2024-01-01T11:00:00")),   # -> 9.0
         (6, "C", _ts("2024-01-01T10:00:00"))],  # no right rows -> null
        "tid long, sym string, tts timestamp")
    out = {r.tid: r.px for r in
           asof_join(trades, quotes, on=["sym"], left_ts="tts",
                     right_ts="qts", value_cols=["px"]).collect()}
    assert out == {1: None, 2: 1.0, 3: 1.0, 4: 2.0, 5: 9.0, 6: None}


def test_asof_join_forward_known_answers_and_duckdb(spark):
    import duckdb
    import pytest

    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 1.0),
         ("A", _ts("2024-01-01T10:05:00"), 2.0),
         ("B", _ts("2024-01-01T10:02:00"), 9.0)],
        "sym string, qts timestamp, px double")
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T09:59:00")),   # next quote -> 1.0
         (2, "A", _ts("2024-01-01T10:00:00")),   # tie -> 1.0 (>= sem.)
         (3, "A", _ts("2024-01-01T10:04:59")),   # -> 2.0
         (4, "A", _ts("2024-01-01T10:06:00")),   # nothing ahead -> null
         (5, "B", _ts("2024-01-01T10:02:00")),   # tie -> 9.0
         (6, "C", _ts("2024-01-01T10:00:00"))],  # no right rows -> null
        "tid long, sym string, tts timestamp")
    out = {r.tid: r.px for r in
           asof_join(trades, quotes, on=["sym"], left_ts="tts",
                     right_ts="qts", value_cols=["px"],
                     direction="forward").collect()}
    assert out == {1: 1.0, 2: 1.0, 3: 2.0, 4: None, 5: 9.0, 6: None}
    # DuckDB's own forward ASOF (l.ts <= r.ts) agrees row for row
    con = duckdb.connect()
    con.register("t", trades.toPandas())
    con.register("q", quotes.toPandas())
    ref = {r[0]: r[1] for r in con.execute(
        """SELECT t.tid, q.px FROM t ASOF LEFT JOIN q
           ON t.sym = q.sym AND t.tts <= q.qts""").fetchall()}
    assert out == ref
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on=["sym"], left_ts="tts",
                  right_ts="qts", value_cols=["px"],
                  direction="sideways")


def test_asof_join_preserves_left_rowcount(spark):
    left = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("lts"))
    right = spark.range(10).select(
        (F.col("id") * 7).alias("k"),
        F.timestamp_seconds(F.col("id")).alias("rts"),
        F.lit(1.0).alias("v"))
    out = asof_join(left, right, on=["k"], left_ts="lts",
                    right_ts="rts", value_cols=["v"])
    assert out.count() == 100


def test_salted_join_matches_plain_join(spark):
    # skewed: 90% of big rows share key 0
    big = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 10)
         .alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], "k long, name string")
    plain = big.join(small, "k").select("payload", "name")
    salted = salted_join(big, small, "k").select("payload", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "dim")], "k long, name string")
    rows = {r.k: r.name for r in
            salted_join(big, small, "k", how="left", salt=4).collect()}
    assert rows == {1: "dim", 99: None}


def test_bucketed_join_is_shuffle_free(spark, tmp_path, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts
    sort-merge-join with zero Exchange — the co-located fact-fact
    join layout for 100 TB (sinks.write_bucketed)."""
    from trial_data_ingestion_spark.sinks import write_bucketed
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select("o_orderkey", "o_totalprice"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(o, "t_orders_b", "o_orderkey", 8,
                       path=str(tmp_path / "o"))
        write_bucketed(li, "t_lineitem_b", "o_orderkey", 8,
                       path=str(tmp_path / "li"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (spark.table("t_orders_b")
             .join(spark.table("t_lineitem_b"), "o_orderkey"))
        n = j.count()
        assert n == li.count()  # every lineitem matches its order
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_rejects_right_and_full_outer(spark):
    # unmatched small-side rows would be emitted once per salt replica
    import pytest
    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(1, "d"), (2, "e")], "k long, name string")
    for how in ("right", "full_outer", "full", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", how=how)


def test_key_skew_report_finds_planted_hot_key(spark):
    """The pre-flight diagnostic for salted_join: a planted hot key
    must surface first with the right count, share, and skew factor
    (count / mean-per-key)."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.operators.joins import (
        key_skew_report,
    )
    rows = [(f"k{i % 10}",) for i in range(100)] + [("hot",)] * 900
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, "k", top_k=3).collect()
    top = rep[0]
    assert top["k"] == "hot" and top["n_rows"] == 900
    assert abs(top["share"] - 0.9) < 1e-9
    # 11 distinct keys, mean = 1000/11; hot factor = 900/(1000/11) = 9.9
    assert abs(top["skew_factor"] - 9.9) < 0.01
    assert len(rep) == 3 and rep[1]["n_rows"] == 10
    # composite-key form runs too
    df2 = df.withColumn("g", F.lit(1))
    assert key_skew_report(df2, ["k", "g"], top_k=1).collect()[0]["n_rows"] == 900
