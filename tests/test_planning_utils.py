"""LSH parameter planner (S-curve fit) and temperature-flattened
domain mixtures: curve math vs known answers, integration with the
MinHash pipeline, and realized mixture compositions on real data."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR_ORACLE


def test_lsh_plan_midpoint_tracks_threshold():
    from trial_data_ingestion_spark.operators.dedup import lsh_plan

    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        plan = lsh_plan(t, num_hashes=128)
        assert plan["bands"] * plan["rows_per_band"] == plan["num_hashes"]
        assert plan["num_hashes"] <= 128
        assert abs(plan["midpoint"] - t) < 0.1, (t, plan)


def test_lsh_plan_curve_discriminates():
    from trial_data_ingestion_spark.operators.dedup import (
        lsh_candidate_probability,
        lsh_plan,
    )

    plan = lsh_plan(0.8, num_hashes=128)
    b, r = plan["bands"], plan["rows_per_band"]
    # clearly-above pairs are near-certain candidates; clearly-below
    # pairs rarely are (the false-negative weight biases the curve
    # left, so the above-threshold guarantee is the stronger one)
    assert lsh_candidate_probability(0.95, b, r) > 0.99
    assert lsh_candidate_probability(0.85, b, r) > 0.9
    assert lsh_candidate_probability(0.5, b, r) < 0.35
    # monotone in s
    probs = [lsh_candidate_probability(s / 20, b, r) for s in range(21)]
    assert probs == sorted(probs)


def test_lsh_plan_rejects_bad_threshold():
    from trial_data_ingestion_spark.operators.dedup import lsh_plan

    with pytest.raises(ValueError):
        lsh_plan(0.0)
    with pytest.raises(ValueError):
        lsh_plan(1.0)


def test_lsh_plan_drives_minhash_dedup(spark):
    """The planned banding plugs straight into the pipeline and
    catches a high-similarity pair (P(candidate) > 0.999 at the
    planned operating point — deterministic in practice)."""
    from trial_data_ingestion_spark.operators.dedup import (
        lsh_plan,
        minhash_lsh_candidates,
    )

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the cat watches from the warm windowsill")
    rows = [(1, base), (2, base + " tonight"),
            (3, "completely different text about spark physical plans "
                "and shuffle partitioning strategies at scale")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = lsh_plan(0.7, num_hashes=64)
    cands = minhash_lsh_candidates(
        df, "doc_id", "text", k=8,
        num_hashes=plan["num_hashes"], bands=plan["bands"]).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in cands}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_temperature_mixture_alpha_one_is_identity(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    out = temperature_mixture(docs, "source", "doc_id", alpha=1.0)
    # natural weights -> every source keeps fraction 1.0
    assert out.count() == docs.count()


def test_temperature_mixture_flattens_head(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        temperature_mixture,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    before = {r["source"]: r["count"] for r in
              docs.groupBy("source").count().collect()}
    out = temperature_mixture(docs, "source", "doc_id", alpha=0.5)
    after = {r["source"]: r["count"] for r in
             out.groupBy("source").count().collect()}
    assert set(after) == set(before)
    # composition must track count^0.5 proportions (Bernoulli noise
    # allowed); the scarcest source is kept whole
    scarcest = min(before, key=before.get)
    assert after[scarcest] == before[scarcest]
    total = sum(after.values())
    wsum = sum(math.sqrt(n) for n in before.values())
    for s, n in before.items():
        want = math.sqrt(n) / wsum
        got = after[s] / total
        assert abs(got - want) < 0.05, (s, want, got)
    # the real corpus's sources are near-uniform; exercise actual
    # flattening on a skewed synthetic one: 8:1:1 -> sqrt -> ~2.8:1:1
    rows = [(i, "web") for i in range(800)] + \
           [(800 + i, "code") for i in range(100)] + \
           [(900 + i, "papers") for i in range(100)]
    skew = spark.createDataFrame(rows, "doc_id long, source string")
    sk_out = {r["source"]: r["count"] for r in
              temperature_mixture(skew, "source", "doc_id", alpha=0.5)
              .groupBy("source").count().collect()}
    assert sk_out["code"] == 100 and sk_out["papers"] == 100
    ratio = sk_out["web"] / sk_out["code"]
    assert 2.2 < ratio < 3.5, sk_out   # sqrt(800)/sqrt(100) = 2.83
    assert (ratio
            < (800 / 100))             # strictly flatter than natural


def test_temperature_mixture_deterministic(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    a = sorted(r["doc_id"] for r in
               temperature_mixture(docs, "source", "doc_id",
                                   alpha=0.5).collect())
    b = sorted(r["doc_id"] for r in
               temperature_mixture(docs, "source", "doc_id",
                                   alpha=0.5).collect())
    assert a == b
