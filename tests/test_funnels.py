"""Funnel + retention analytics: python-twin exactness of the chain
fold (with and without a window), DuckDB parity for the no-window
funnel and weekly retention on the real events table, known-answer
fixtures, and the one-shuffle plan shapes."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

STEPS = ["signup", "view", "click", "purchase"]


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _py_depth(rows, steps, within_us=None):
    """Driver-side twin of the funnels.merge fold: greedy chain from
    the first step-0 event, window measured from the chain start."""
    sid = {s: i for i, s in enumerate(steps)}
    k = len(steps)
    reached = [None] * k
    for t, s in sorted(rows):
        if s == 0:
            if reached[0] is None:
                reached[0] = t
        elif (reached[s] is None and reached[s - 1] is not None
              and (within_us is None or t - reached[s - 1] <= within_us)):
            reached[s] = reached[s - 1]
    return sum(1 for x in reached if x is not None)


@pytest.mark.parametrize("within", [None, 3 * 24 * 3600.0])
def test_funnel_depths_match_python_twin(spark, within):
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_depths,
    )
    ev = _events(spark)
    got = {r["user_id"]: r["depth"] for r in
           funnel_depths(ev, STEPS,
                         within_seconds=within).collect()}
    sid = {s: i for i, s in enumerate(STEPS)}
    raw = (ev.where(F.col("event_type").isin(*STEPS))
           .select("user_id",
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("t"),
                   "event_type").collect())
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append(
            (r["t"], sid[r["event_type"]]))
    win_us = None if within is None else int(within * 1_000_000)
    ref = {u: _py_depth(rows, STEPS, win_us)
           for u, rows in by_user.items()}
    ref = {u: d for u, d in ref.items() if d > 0}
    assert got == ref and len(got) >= 10


@pytest.mark.slow
def test_funnel_no_window_matches_duckdb(spark):
    """Without a window the greedy chain is exact subsequence
    matching: progressive per-user min-ts in plain SQL must agree."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_counts,
    )
    got = {r["step"]: r["n_users"] for r in
           funnel_counts(_events(spark), STEPS).collect()}
    con = duckdb.connect()
    ref = con.execute(f"""
        WITH e AS (SELECT user_id, ts, event_type
                   FROM '{SF_DIR}/events.parquet'),
        t0 AS (SELECT user_id, min(ts) ts FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        t1 AS (SELECT e.user_id, min(e.ts) ts FROM e JOIN t0 USING (user_id)
               WHERE event_type = 'view' AND e.ts > t0.ts GROUP BY 1),
        t2 AS (SELECT e.user_id, min(e.ts) ts FROM e JOIN t1 USING (user_id)
               WHERE event_type = 'click' AND e.ts > t1.ts GROUP BY 1),
        t3 AS (SELECT e.user_id, min(e.ts) ts FROM e JOIN t2 USING (user_id)
               WHERE event_type = 'purchase' AND e.ts > t2.ts GROUP BY 1)
        SELECT (SELECT count(*) FROM t0), (SELECT count(*) FROM t1),
               (SELECT count(*) FROM t2), (SELECT count(*) FROM t3)
    """).fetchone()
    assert [got[s] for s in STEPS] == list(ref)
    assert got["signup"] >= got["view"] >= got["click"] >= \
        got["purchase"] > 0


def test_funnel_counts_known_answer(spark):
    """Crafted users: full converter, wrong-order user, window
    breaker, late-arriving same-timestamp step still counts."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_counts,
    )
    rows = [
        (1, 100.0, "a"), (1, 200.0, "b"), (1, 300.0, "c"),   # full
        (2, 100.0, "b"), (2, 200.0, "a"),                    # a only
        (3, 100.0, "a"), (3, 5000.0, "b"), (3, 5100.0, "c"), # windowed
        (4, 100.0, "a"), (4, 100.0, "b"),                    # tie -> b
        (5, 50.0, "x"),                                      # never enters
    ]
    ev = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows],
        "user_id long, sec double, event_type string") \
        .withColumn("ts", F.timestamp_seconds("sec"))
    out = {r["step"]: (r["n_users"], r["frac_of_first"]) for r in
           funnel_counts(ev, ["a", "b", "c"]).collect()}
    assert out == {"a": (4, 1.0), "b": (3, 0.75), "c": (2, 0.5)}
    win = {r["step"]: r["n_users"] for r in
           funnel_counts(ev, ["a", "b", "c"],
                         within_seconds=1000.0).collect()}
    assert win == {"a": 4, "b": 2, "c": 1}   # user 3's chain breaks
    with pytest.raises(ValueError):
        funnel_counts(ev, ["a"])
    with pytest.raises(ValueError):
        funnel_counts(ev, ["a", "a"])


def test_funnel_empty_input(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_counts,
    )
    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string")
    out = {r["step"]: (r["n_users"], r["frac_of_first"]) for r in
           funnel_counts(ev, ["a", "b"]).collect()}
    assert out == {"a": (0, 0.0), "b": (0, 0.0)}


def test_retention_matches_duckdb(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        retention_cohorts,
    )
    got = [(str(r["cohort"]), r["period_index"], r["n_active"],
            r["n_cohort"], r["retention"]) for r in
           retention_cohorts(_events(spark),
                             granularity="week").collect()]
    con = duckdb.connect()
    ref = con.execute(f"""
        WITH a AS (SELECT DISTINCT user_id,
                          date_trunc('week', ts)::date p
                   FROM '{SF_DIR}/events.parquet'),
        c AS (SELECT user_id, min(p) cohort FROM a GROUP BY 1),
        x AS (SELECT c.cohort, (a.p - c.cohort) / 7 pi,
                     count(*) n_active
              FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        s AS (SELECT cohort, count(*) n FROM c GROUP BY 1)
        SELECT CAST(x.cohort AS VARCHAR), pi, n_active, s.n,
               round(n_active / s.n, 6)
        FROM x JOIN s USING (cohort) ORDER BY 1, 2
    """).fetchall()
    assert got == [(c, int(p), n, nc, r) for c, p, n, nc, r in ref]
    assert len(got) > 3
    # period 0 is full retention by construction
    assert all(r == 1.0 for c, p, n, nc, r in got if p == 0)


def test_retention_month_and_caps(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        retention_cohorts,
    )
    out = retention_cohorts(_events(spark), granularity="month",
                            max_periods=1).collect()
    assert out and all(r["period_index"] <= 1 for r in out)
    with pytest.raises(ValueError):
        retention_cohorts(_events(spark), granularity="hour")


def test_funnel_and_retention_plan_shapes(spark):
    """funnel_depths: exactly ONE corpus exchange (the per-user
    aggregate) and no Python eval; retention: the corpus contributes
    one keyed exchange, the (cohort, period) rollup and its cohort
    window two more over user-count-sized data, and there is NO join
    (the cohort size rides a window over the rollup)."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_depths, retention_cohorts,
    )
    ev = _events(spark)
    plan = (funnel_depths(ev, STEPS)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "Join" not in plan
    rplan = (retention_cohorts(ev)
             ._jdf.queryExecution().executedPlan().toString())
    assert rplan.count("Exchange hashpartitioning") == 3
    assert "Join" not in rplan and "BatchEvalPython" not in rplan


def test_funnel_tie_semantics_match_progressive_sql(spark):
    """q62's oracle claim under stress: the greedy fold's tie rule
    (same-timestamp later step still counts — sort by (t, step))
    equals progressive per-user min-ts SQL with ``>=`` boundaries on
    EVERY input.  Timestamps drawn from a tiny set so nearly every
    user has colliding-timestamp events — the adversarial case the
    real events table barely exercises."""
    import random

    from trial_data_ingestion_spark.operators.funnels import (
        funnel_counts,
    )
    rng = random.Random(62)
    steps = ["a", "b", "c"]
    rows = []
    for u in range(200):
        for _ in range(rng.randrange(1, 9)):
            rows.append((u, float(rng.randrange(5)),   # 5 distinct ts
                         rng.choice(steps + ["x"])))
    ev = (spark.createDataFrame(
            rows, "user_id long, sec double, event_type string")
          .withColumn("ts", F.timestamp_seconds("sec")))
    got = {r["step"]: r["n_users"] for r in
           funnel_counts(ev, steps).collect()}
    con = duckdb.connect()
    con.register("e", ev.select("user_id", "sec", "event_type")
                 .toPandas())
    ref = con.execute("""
        WITH t0 AS (SELECT user_id, min(sec) s FROM e
                    WHERE event_type = 'a' GROUP BY 1),
        t1 AS (SELECT e.user_id, min(e.sec) s FROM e
               JOIN t0 USING (user_id)
               WHERE event_type = 'b' AND e.sec >= t0.s GROUP BY 1),
        t2 AS (SELECT e.user_id, min(e.sec) s FROM e
               JOIN t1 USING (user_id)
               WHERE event_type = 'c' AND e.sec >= t1.s GROUP BY 1)
        SELECT (SELECT count(*) FROM t0), (SELECT count(*) FROM t1),
               (SELECT count(*) FROM t2)
    """).fetchone()
    assert [got[s] for s in steps] == list(ref)
    # ties actually occurred (the stress is real, not vacuous)
    n_tie_users = (ev.groupBy("user_id", "sec")
                   .agg(F.count(F.lit(1)).alias("n"))
                   .where("n > 1").select("user_id")
                   .distinct().count())
    assert n_tie_users > 50


def test_transitions_match_duckdb(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        next_event_transitions,
    )
    got = [(r["from_event"], r["to_event"], r["n_transitions"],
            r["prob"]) for r in
           next_event_transitions(_events(spark)).collect()]
    con = duckdb.connect()
    ref = con.execute(f"""
        WITH o AS (SELECT user_id, event_type,
                          lead(event_type) OVER
                            (PARTITION BY user_id ORDER BY ts) nxt
                   FROM '{SF_DIR}/events.parquet'),
        m AS (SELECT event_type f, nxt t, count(*) n FROM o
              WHERE nxt IS NOT NULL GROUP BY 1, 2)
        SELECT f, t, n, round(n / sum(n) OVER (PARTITION BY f), 6)
        FROM m ORDER BY f, t
    """).fetchall()
    assert got == [(f, t, n, p) for f, t, n, p in ref]
    # probabilities row-normalize
    from collections import defaultdict
    by_from = defaultdict(float)
    for f, t, n, p in got:
        by_from[f] += p
    assert all(abs(v - 1.0) < 1e-3 for v in by_from.values())


def test_transitions_plan_one_corpus_shuffle(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        next_event_transitions,
    )
    plan = (next_event_transitions(_events(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 3
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_transitions_per_user_cap(spark):
    """The skew guard: a synthetic bot user with a huge event stream
    only contributes its FIRST max_events_per_user events, normal
    users are untouched, and the truncation report counts the cut
    loudly (the estimator bias must never be silent)."""
    import pytest

    from trial_data_ingestion_spark.operators.funnels import (
        next_event_transitions, transition_truncation_report,
    )
    rows = [(1, float(i), "spin") for i in range(500)]        # bot loop
    rows += [(2, 1.0, "a"), (2, 2.0, "b"), (2, 3.0, "c")]     # normal
    ev = (spark.createDataFrame(rows,
                                "user_id long, sec double, "
                                "event_type string")
          .withColumn("ts", F.timestamp_seconds("sec")))
    uncapped = {(r["from_event"], r["to_event"]): r["n_transitions"]
                for r in next_event_transitions(ev).collect()}
    assert uncapped[("spin", "spin")] == 499
    capped = {(r["from_event"], r["to_event"]): r["n_transitions"]
              for r in next_event_transitions(
                  ev, max_events_per_user=10).collect()}
    assert capped[("spin", "spin")] == 9      # first 10 events only
    assert capped[("a", "b")] == 1 and capped[("b", "c")] == 1
    rep = transition_truncation_report(ev, 10).collect()[0]
    assert rep["n_users"] == 2
    assert rep["n_truncated_users"] == 1
    assert rep["max_events"] == 500
    assert rep["events_dropped"] == 490
    with pytest.raises(ValueError):
        next_event_transitions(ev, max_events_per_user=1)


def _py_convert_seconds(rows, steps, within_us=None):
    """Twin of funnel_conversion_times' fold: greedy chain + the
    completing event's own timestamp."""
    k = len(steps)
    reached = [None] * k
    done = None
    for t, s in sorted(rows):
        if s == 0:
            if reached[0] is None:
                reached[0] = t
        elif (reached[s] is None and reached[s - 1] is not None
              and (within_us is None or t - reached[s - 1] <= within_us)):
            reached[s] = reached[s - 1]
            if s == k - 1 and done is None:
                done = t
    if reached[k - 1] is None:
        return None
    return (done - reached[k - 1]) / 1_000_000.0


@pytest.mark.parametrize("within", [None, 3 * 24 * 3600.0])
def test_conversion_times_match_python_twin(spark, within):
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_conversion_times,
    )
    ev = _events(spark)
    got = {r["user_id"]: r["convert_seconds"] for r in
           funnel_conversion_times(ev, STEPS,
                                   within_seconds=within).collect()}
    sid = {s: i for i, s in enumerate(STEPS)}
    raw = (ev.where(F.col("event_type").isin(*STEPS))
           .select("user_id",
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("t"), "event_type").collect())
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append(
            (r["t"], sid[r["event_type"]]))
    win_us = None if within is None else int(within * 1_000_000)
    ref = {u: _py_convert_seconds(rows, STEPS, win_us)
           for u, rows in by_user.items()}
    ref = {u: v for u, v in ref.items() if v is not None}
    assert set(got) == set(ref) and len(got) >= 1
    for u in ref:
        assert got[u] == pytest.approx(ref[u])


def test_conversion_times_known_answer_and_report(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_conversion_report, funnel_conversion_times,
    )
    rows = [
        ("u1", "2026-01-01 00:00:00", "a"),
        ("u1", "2026-01-01 00:00:10", "b"),
        ("u1", "2026-01-01 00:00:25", "c"),
        ("u2", "2026-01-01 00:00:00", "a"),
        ("u2", "2026-01-01 00:00:05", "b"),
        ("u2", "2026-01-01 00:00:30", "c"),
        ("u3", "2026-01-01 00:00:00", "a"),     # never converts
        ("u3", "2026-01-01 00:00:05", "b"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r["convert_seconds"] for r in
           funnel_conversion_times(ev, ["a", "b", "c"]).collect()}
    assert got == {"u1": 25.0, "u2": 30.0}
    # chain window kills the slow chain only
    w = {r["user_id"]: r["convert_seconds"] for r in
         funnel_conversion_times(ev, ["a", "b", "c"],
                                 within_seconds=26).collect()}
    assert w == {"u1": 25.0}
    rep = funnel_conversion_report(ev, ["a", "b", "c"]).collect()[0]
    assert rep["n_converted"] == 2
    assert rep["p50_seconds"] == pytest.approx(27.5)   # exact interp
    assert rep["p90_seconds"] == pytest.approx(29.5)


def test_conversion_report_empty_funnel(spark):
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_conversion_report, funnel_conversion_times,
    )
    ev = spark.createDataFrame(
        [("u1", "2026-01-01 00:00:00", "a")],
        ["user_id", "ts", "event_type"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    assert funnel_conversion_times(ev, ["a", "b"]).count() == 0
    rep = funnel_conversion_report(ev, ["a", "b"]).collect()[0]
    assert rep["n_converted"] == 0
    assert rep["p50_seconds"] is None and rep["p90_seconds"] is None


def test_funnel_per_user_cap(spark):
    """The funnel fold's skew guard (verdict r6 item 6): a bot
    spamming one step contributes only its first
    ``max_events_per_user`` step-events; normal users' depths are
    bit-identical to the uncapped run; unrelated event types never
    count against the cap; the truncation report counts the cut."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_counts, funnel_depths, funnel_truncation_report,
    )
    steps = ["signup", "view", "purchase"]
    # bot: one signup, then spams "view" 500x, purchases at the very
    # end -- beyond any reasonable cap
    rows = [(1, 0.0, "signup")]
    rows += [(1, float(i), "view") for i in range(1, 501)]
    rows += [(1, 501.0, "purchase")]
    # normal user converts; noise event type interleaved (must not
    # count against the cap -- the fold pre-filters to step types)
    rows += [(2, 1.0, "signup"), (2, 1.5, "scroll"), (2, 2.0, "view"),
             (2, 2.5, "scroll"), (2, 3.0, "purchase")]
    ev = (spark.createDataFrame(rows,
                                "user_id long, sec double, "
                                "event_type string")
          .withColumn("ts", F.timestamp_seconds("sec")))
    base = {r["user_id"]: r["depth"]
            for r in funnel_depths(ev, steps).collect()}
    assert base == {1: 3, 2: 3}
    capped = {r["user_id"]: r["depth"]
              for r in funnel_depths(
                  ev, steps, max_events_per_user=10).collect()}
    # bot's purchase falls outside its first 10 step-events -> depth 2
    assert capped == {1: 2, 2: 3}
    by_step = {r["step"]: r["n_users"]
               for r in funnel_counts(
                   ev, steps, max_events_per_user=10).collect()}
    assert by_step == {"signup": 2, "view": 2, "purchase": 1}
    rep = funnel_truncation_report(ev, steps, 10).collect()[0]
    assert rep["n_users"] == 2
    assert rep["n_truncated_users"] == 1
    assert rep["max_step_events"] == 502
    assert rep["events_dropped"] == 492
    with pytest.raises(ValueError):
        funnel_depths(ev, steps, max_events_per_user=2)


def test_conversion_times_per_user_cap(spark):
    """Same cap on the time-to-convert fold: the bot's late purchase
    is not seen under the cap, the normal user's time is unchanged."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_conversion_times,
    )
    steps = ["signup", "purchase"]
    rows = [(1, 0.0, "signup")]
    rows += [(1, float(i), "signup") for i in range(1, 50)]
    rows += [(1, 99.0, "purchase")]
    rows += [(2, 1.0, "signup"), (2, 11.0, "purchase")]
    ev = (spark.createDataFrame(rows,
                                "user_id long, sec double, "
                                "event_type string")
          .withColumn("ts", F.timestamp_seconds("sec")))
    base = {r["user_id"]: r["convert_seconds"]
            for r in funnel_conversion_times(ev, steps).collect()}
    assert base == {1: 99.0, 2: 10.0}
    capped = {r["user_id"]: r["convert_seconds"]
              for r in funnel_conversion_times(
                  ev, steps, max_events_per_user=10).collect()}
    assert capped == {2: 10.0}


def test_funnel_cap_plan_shape(spark):
    """Round-8 fix: the bot cap bounds the AGGREGATION BUFFER, not
    just the fold.  Capped plans pre-filter each user's stream with
    ``row_number() <= N`` BEFORE the groupBy, so collect_list never
    materializes a bot's full event array; and because the window's
    hash partitioning on ``user`` is exactly what the groupBy
    requires, the cap costs one per-partition sort and ZERO extra
    shuffles (exchange census identical to the uncapped plan)."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_conversion_times, funnel_depths, next_event_transitions,
    )
    ev = _events(spark)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    makers = [
        lambda c: funnel_depths(ev, STEPS, max_events_per_user=c),
        lambda c: funnel_conversion_times(ev, STEPS,
                                          max_events_per_user=c),
        lambda c: next_event_transitions(ev, max_events_per_user=c),
    ]
    for mk in makers:
        base, capped = plan(mk(None)), plan(mk(10))
        assert "row_number" not in base
        # the pre-agg filter is physically present ...
        assert "row_number" in capped and "__rn" in capped
        # ... and is free of new shuffles: the window reuses the
        # groupBy's own hash exchange
        assert (base.count("Exchange hashpartitioning")
                == capped.count("Exchange hashpartitioning"))
        # no slice-after-collect remains anywhere in the capped plan
        assert "slice(sort_array" not in capped.replace(" ", "")


def test_funnel_cap_pre_agg_matches_post_collect_slice(spark):
    """The pre-agg row_number cut keeps exactly the prefix the old
    post-collect slice kept: on the real events table the capped
    depths are identical under both formulations (the old one
    re-expressed inline here), and tight caps genuinely bite."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_depths,
    )
    ev = _events(spark)
    for cap in (len(STEPS), 6, 50):
        got = {(r["user_id"], r["depth"]) for r in
               funnel_depths(ev, STEPS,
                             max_events_per_user=cap).collect()}
        # old formulation: slice AFTER the full collect — the
        # behavior-defining twin the round-8 rewrite must match
        sid = {s: i for i, s in enumerate(STEPS)}
        raw = (ev.where(F.col("event_type").isin(*STEPS))
               .select("user_id",
                       F.unix_micros(F.col("ts").cast("timestamp"))
                       .alias("t"), "event_type").collect())
        by_user: dict = {}
        for r in raw:
            by_user.setdefault(r["user_id"], []).append(
                (r["t"], sid[r["event_type"]]))
        ref = {(u, _py_depth(sorted(rows)[:cap], STEPS))
               for u, rows in by_user.items()}
        ref = {(u, d) for u, d in ref if d > 0}
        assert got == ref


def test_truncation_reports_zero_on_empty(spark):
    """ADVICE r8: sum/max over zero rows is NULL — the audit row must
    be all-zero instead, so ``events_dropped == 0`` is a safe gate."""
    from trial_data_ingestion_spark.operators.funnels import (
        funnel_truncation_report, transition_truncation_report,
    )
    ev = (spark.createDataFrame([], "user_id long, sec double, "
                                "event_type string")
          .withColumn("ts", F.timestamp_seconds("sec")))
    rep = funnel_truncation_report(ev, ["a", "b"], 10).collect()[0]
    assert (rep["n_users"], rep["n_truncated_users"],
            rep["max_step_events"], rep["events_dropped"]) == (0, 0, 0, 0)
    rep = transition_truncation_report(ev, 10).collect()[0]
    assert (rep["n_users"], rep["n_truncated_users"],
            rep["max_events"], rep["events_dropped"]) == (0, 0, 0, 0)
