"""Differential test: every oracle-paired query must match DuckDB at
sf0.01 — the same gate the driver applies (SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import compare, run_oracle


def _pairs():
    # ALL includes every query retired from the driver's 50-slot
    # grading budget (see plans.RETIRED_QUERIES for the current set —
    # 12 as of round 6) — retirement removes their driver rows, not
    # their correctness obligation.
    from trial_data_ingestion_spark.plans import ALL_ORACLE
    return sorted(ALL_ORACLE)


ORACLE_NAMES = _pairs()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    from trial_data_ingestion_spark.plans import ALL_ORACLE, ALL_QUERIES
    sdf = ALL_QUERIES[name](spark, SF_DIR_ORACLE)
    odf = run_oracle(ALL_ORACLE[name], SF_DIR_ORACLE)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


# The driver grades at most this many queries, in registration order.
DRIVER_QUERY_BUDGET = 50


def test_corpus_fits_driver_grading_budget():
    """A query registered past the driver's grading budget silently
    loses its correctness row (round 2: q21_text_analysis was
    registered 51st — benchmarked but ungraded).  Fail loudly if the
    corpus ever outgrows the budget again."""
    from trial_data_ingestion_spark.plans import ORACLE, QUERIES
    assert len(QUERIES) <= DRIVER_QUERY_BUDGET, (
        f"{len(QUERIES)} registered queries exceed the driver's "
        f"{DRIVER_QUERY_BUDGET}-query grading budget; the excess are "
        "silently ungraded — unregister or merge one")
    assert set(ORACLE) <= set(QUERIES)


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
    # exact pin (r6 verdict item 2): Spark's HLL++ is deterministic
    # for a fixed input, and at sf0.01's per-type cardinality (150)
    # the sparse-mode sketch is exact -- pin the full rows so a
    # sketch-behavior regression is loud, not silently "within 6%"
    assert sorted(tuple(r) for r in rows) == [
        ("click", 150, 150), ("error", 150, 150),
        ("purchase", 150, 150), ("signup", 150, 150),
        ("view", 150, 150)]


def test_approx_percentiles_within_error(spark):
    """q51 has no SQL oracle (GK summaries vs DuckDB's t-digest), but
    each approximate quantile must sit within the value range implied
    by accuracy=10000: rank error <= n/10000, checked loosely as the
    approx value landing between the exact neighboring percentiles
    +/- 1% of rank.  q51 is unregistered (driver budget is 50 —
    library.py docstring); this bound against hash-verified q41 is its
    correctness gate."""
    from trial_data_ingestion_spark.plans import QUERIES
    from trial_data_ingestion_spark.plans.library import (
        q51_approx_percentiles,
    )
    exact = {r.o_orderpriority: r for r in
             QUERIES["q41_percentiles"](spark, SF_DIR_ORACLE).collect()}
    approx = q51_approx_percentiles(spark, SF_DIR_ORACLE).collect()
    assert approx
    for r in approx:
        e = exact[r.o_orderpriority]
        assert r.n_orders == e.n_orders
        # exact p25/median/p90 bracket: allow 1% relative value slack
        for col, lo_c, hi_c in (("p25", None, "median"),
                                ("median", "p25", "p90"),
                                ("p90", "median", None)):
            v, ev = getattr(r, col), getattr(e, col)
            lo = getattr(e, lo_c) if lo_c else ev * 0.9
            hi = getattr(e, hi_c) if hi_c else ev * 1.1
            assert lo <= v <= hi, (r.o_orderpriority, col, v, ev)
            assert abs(v - ev) <= 0.05 * abs(ev) + 1, \
                (r.o_orderpriority, col, v, ev)


# Streaming-twin window queries are additionally value-checked at
# BENCH scale (sf0.1): window assignment bugs (timezone, boundary
# inclusion, gap merging) can be invisible in a 3k-row sample but
# shift counts at 10x the density.  sf0.01 is covered by
# test_oracle_parity above — this matrix adds the scale dir.
WINDOW_QUERIES = ["q13_hourly_events", "q22_sessionize",
                  "q50_sliding_window",
                  # event-sequence analytics are density-sensitive the
                  # same way: chains and cohorts that never form in a
                  # 3k-row sample do at 10x the events
                  "q62_funnel", "q63_retention",
                  # pathfinder: prefix ranking + top-k rank ties are
                  # exactly the things 10x the users can reshuffle
                  "q67_top_paths",
                  # session buckets shift with event density by
                  # construction
                  "q68_session_stats",
                  # activity segments: day-count thresholds at 10x
                  "q71_activity_segments"]
SF_DIR_BENCH = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", WINDOW_QUERIES)
def test_window_query_parity_at_bench_scale(spark, name):
    from trial_data_ingestion_spark.plans import ALL_ORACLE, ALL_QUERIES
    sdf = ALL_QUERIES[name](spark, SF_DIR_BENCH)
    odf = run_oracle(ALL_ORACLE[name], SF_DIR_BENCH)
    problems = compare(sdf, odf)
    assert not problems, f"{name}@sf0.1: " + "; ".join(problems)


# Dedup/similarity blocking and banding correctness is density-
# dependent: a band that never collides at sf0.01 can collide at
# sf0.1, and a missing candidate pair only shows up once buckets
# actually fill.  Value-hash these against DuckDB at bench scale too.
DEDUP_QUERIES = ["q19_minhash_dedup", "q28_ngram_jaccard",
                 "q29_embedding_dups", "q48_embedding_dups_blocked",
                 "q49_ngram_jaccard_capped", "q58_line_dedup",
                 # training-data-tier rows whose arithmetic is
                 # density-sensitive (gram overlap counts, postings,
                 # bucket membership, rule ratios) — value-hashed at
                 # bench scale too
                 "q52_contamination_report", "q53_bm25_search",
                 "q54_stratified_sample", "q56_word_frequencies",
                 "q59_gopher_rules", "q60_dsir_score",
                 # chat tier: rendering/normalization arithmetic over
                 # 10x the text (multi-byte boundaries, longer runs)
                 "q61_conversation_hygiene",
                 # clustering: argmax stability over 4x the vectors
                 # (measured top-2 cosine gap >= 1e-5 at every scale)
                 "q66_cluster_assign",
                 # prune cut points move with per-cell population
                 "q69_cluster_prune",
                 # keyword lift: df guard + rank ties over 4x vocab
                 "q70_cluster_keywords"]


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_dedup_query_parity_at_bench_scale(spark, name):
    # ALL_*: q49 retired from the driver budget in round 6 but its
    # density-sensitive arithmetic stays value-checked at bench scale
    from trial_data_ingestion_spark.plans import ALL_ORACLE, ALL_QUERIES
    sdf = ALL_QUERIES[name](spark, SF_DIR_BENCH)
    odf = run_oracle(ALL_ORACLE[name], SF_DIR_BENCH)
    problems = compare(sdf, odf)
    assert not problems, f"{name}@sf0.1: " + "; ".join(problems)


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


def test_events_loader_normalizes_all_physical_ts_shapes(spark, tmp_path):
    """The driver has shipped events.ts as nanos-bigint (r1-r3) and
    tz-naive micros (r4+); a flip to UTC-adjusted TIMESTAMP is the
    remaining shape.  _events must normalize every shape to the SAME
    NTZ wall times so no graded expression breaks on regeneration."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.plans.library import _events
    ev = _events(spark, SF_DIR_ORACLE)
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    d = str(tmp_path)
    (ev.limit(200).withColumn("ts", F.to_timestamp(F.col("ts")))
       .write.mode("overwrite").parquet(f"{d}/events.parquet"))
    ev2 = _events(spark, d)
    assert dict(ev2.dtypes)["ts"] == "timestamp_ntz"
    a = sorted(r[0] for r in ev.limit(200).select("ts").collect())
    b = sorted(r[0] for r in ev2.select("ts").collect())
    assert a == b
