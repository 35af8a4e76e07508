"""KMV overlap sketches: exact-regime correctness (sketch == set),
estimation accuracy vs known ground truth at k << n, disjoint and
identical extremes, the no-shuffle TakeOrdered plan, and a real-data
containment check."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _vals(spark, lo, hi, name="v"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("item-"), F.col("id")).alias(name))


def test_kmv_exact_when_under_budget(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_overlap,
    )
    # |A| = 300, |B| = 200, |A n B| = 100 — all under k=1024, so the
    # sketches hold the whole sets and every number is EXACT
    a, b = _vals(spark, 0, 300), _vals(spark, 200, 400)
    r = corpus_overlap(a, b, "v", k=1024)
    assert r["distinct_a"] == 300.0
    assert r["distinct_b"] == 200.0
    assert abs(r["jaccard"] - 100 / 400) < 1e-9
    assert abs(r["intersection"] - 100) < 1e-6
    assert abs(r["containment_a"] - 100 / 300) < 1e-6
    assert abs(r["containment_b"] - 100 / 200) < 1e-6


def test_kmv_estimates_at_small_k(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_overlap,
    )
    # 20k vs 20k with 10k shared; k=1024 -> ~3% stderr
    a, b = _vals(spark, 0, 20_000), _vals(spark, 10_000, 30_000)
    r = corpus_overlap(a, b, "v", k=1024)
    assert abs(r["jaccard"] - 1 / 3) < 0.05
    assert abs(r["distinct_a"] - 20_000) / 20_000 < 0.1
    assert abs(r["containment_a"] - 0.5) < 0.08


def test_kmv_extremes(spark):
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_overlap,
    )
    a, b = _vals(spark, 0, 5000), _vals(spark, 5000, 10_000)
    r = corpus_overlap(a, b, "v", k=512)
    assert r["jaccard"] == 0.0 and r["intersection"] == 0.0
    same = _vals(spark, 0, 5000)
    r2 = corpus_overlap(same, same, "v", k=512)
    assert r2["jaccard"] == 1.0
    assert abs(r2["containment_a"] - 1.0) < 1e-6


def test_kmv_sketch_plan_is_take_ordered(spark):
    """The sketch draw must be TakeOrdered (per-partition heap +
    driver merge), never a global sort exchange."""
    from trial_data_ingestion_spark.operators.corpus_stats import (
        kmv_sketch,
    )
    df = _vals(spark, 0, 10_000)
    q = (df.select(F.xxhash64(F.col("v")).alias("h"))
         .orderBy("h").limit(80))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    sk = kmv_sketch(df, "v", k=10)
    assert len(sk) == 10 and sk == sorted(sk)


def test_kmv_on_real_fingerprints(spark):
    """Real documents: half the corpus vs the whole corpus — the half
    must be ~fully contained, and the whole's distinct estimate must
    track the true fingerprint count."""
    from trial_data_ingestion_spark.operators.corpus_stats import (
        corpus_overlap,
    )
    from trial_data_ingestion_spark.operators.textstats import (
        fingerprint,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", fingerprint(F.col("text")).alias("fp")))
    half = docs.where("doc_id % 2 = 0")
    r = corpus_overlap(half, docs, "fp", k=1024)
    assert r["containment_a"] > 0.99
    true_distinct = docs.select("fp").distinct().count()
    assert abs(r["distinct_b"] - true_distinct) / true_distinct < 0.05
