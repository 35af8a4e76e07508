"""Fuzzy decontamination: paraphrased benchmark items are caught at
whole-item Jaccard where the exact 8-gram sweep misses them; clean
docs survive; the corpus-side plan never shuffles on bench buckets
(broadcast gate); exact + fuzzy compose."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


_BENCH = [
    ("the quick brown fox jumps over the lazy dog while autumn "
     "leaves drift slowly across the quiet village square and "
     "children watch from wooden benches near the old stone well",),
    ("name the largest planet orbiting our sun in this solar system",),
]

# light rewrite of bench item 0: word substitutions every <= 7 tokens
# so NO verbatim 8-token run survives (exact decontam blind) while
# the vast majority of 8-char shingles persist (whole-item Jaccard
# ~0.6-0.7 — the fuzzy sweep's regime)
_PARAPHRASE = ("the quick brown fox leaps over the lazy dog while "
               "autumn foliage drift slowly across the quiet village "
               "plaza and children watch from wooden benches close "
               "the old stone well")


def _docs(spark):
    rows = [
        (1, _PARAPHRASE, ),
        (2, "a completely unrelated discussion of spark shuffle "
            "partitioning strategies and adaptive execution plans",),
        (3, "name the largest planet orbiting our sun in this solar "
            "system",),                       # verbatim copy of bench 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_fuzzy_catches_paraphrase_exact_misses(spark):
    from trial_data_ingestion_spark.operators.decontam import (
        decontaminate,
        decontaminate_fuzzy,
    )
    docs = _docs(spark)
    bench = spark.createDataFrame(_BENCH, "text string")
    exact_kept = {r["doc_id"] for r in
                  decontaminate(docs, bench, n=8).collect()}
    # exact removes the verbatim copy but NOT the paraphrase
    assert exact_kept == {1, 2}
    fuzzy_kept = {r["doc_id"] for r in
                  decontaminate_fuzzy(docs, bench,
                                      threshold=0.5).collect()}
    # fuzzy removes both contaminated docs, keeps the clean one
    assert fuzzy_kept == {2}


def test_fuzzy_ids_and_schema(spark):
    from trial_data_ingestion_spark.operators.decontam import (
        decontaminate_fuzzy,
        fuzzy_contaminated_ids,
    )
    docs = _docs(spark)
    bench = spark.createDataFrame(_BENCH, "text string")
    bad = {r["doc_id"] for r in
           fuzzy_contaminated_ids(docs, bench,
                                  threshold=0.5).collect()}
    assert bad == {"1", "3"}
    out = decontaminate_fuzzy(docs, bench, threshold=0.5)
    assert out.columns == docs.columns
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_fuzzy_bench_side_broadcasts(spark):
    from trial_data_ingestion_spark.operators.decontam import (
        fuzzy_contaminated_ids,
    )
    docs = _docs(spark)
    bench = spark.createDataFrame(_BENCH, "text string")
    plan = fuzzy_contaminated_ids(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin [band" in plan \
        or "BroadcastHashJoin [bucket" in plan \
        or plan.count("BroadcastExchange") >= 1
    assert "SortMergeJoin [band" not in plan


def test_fuzzy_rejects_huge_benchmark(spark):
    import pytest

    from trial_data_ingestion_spark.operators.decontam import (
        fuzzy_contaminated_ids,
    )
    big = spark.range(1_000_001).select(
        F.col("id").cast("string").alias("text"))
    with pytest.raises(ValueError, match="broadcast"):
        fuzzy_contaminated_ids(_docs(spark), big)


def test_split_leakage_report(spark):
    from trial_data_ingestion_spark.operators.decontam import (
        split_leakage_report,
    )
    leak = ("this exact overlapping benchmark sentence appears in "
            "both train and validation splits verbatim today")
    rows = [
        (1, leak + " plus train-only context", "train"),
        (2, "ordinary training document with unshared content "
            "entirely its own words here", "train"),
        (3, leak + " plus extra val words", "val"),          # leaked
        (4, "clean validation document with its own vocabulary "
            "and no shared runs at all present", "val"),
        (5, leak, "test"),                                    # leaked
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, split string")
    rep = {r["split"]: (r["n_docs"], r["leaked_docs"], r["leak_rate"])
           for r in split_leakage_report(df, n=8).collect()}
    assert rep == {"val": (2, 1, 0.5), "test": (1, 1, 1.0)}
    # plan: train grams join without reshuffling the eval text
    plan = split_leakage_report(df, n=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_index_probe_matches_direct_sweep(spark, tmp_path):
    """decontaminate_fuzzy(corpus_index=...) — the r13 persisted-
    signature probe — must return the identical survivor set to the
    direct signature pass, and must refuse an index built with
    different banding params."""
    import pytest
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.operators.decontam import (
        decontaminate_fuzzy,
    )
    from trial_data_ingestion_spark.operators.incremental_dedup import (
        write_minhash_index,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    bench = docs.where("doc_id % 20 = 7").select("text")
    path = str(tmp_path / "sigidx")
    write_minhash_index(docs, path, k=8, num_hashes=64, bands=16)
    direct = {r["doc_id"] for r in
              decontaminate_fuzzy(docs, bench, threshold=0.8)
              .select("doc_id").collect()}
    probed = {r["doc_id"] for r in
              decontaminate_fuzzy(docs, bench, threshold=0.8,
                                  corpus_index=path)
              .select("doc_id").collect()}
    assert direct == probed and len(direct) > 0
    with pytest.raises(ValueError, match="keyed differently"):
        decontaminate_fuzzy(docs, bench, threshold=0.8, bands=8,
                            num_hashes=32, corpus_index=path)
