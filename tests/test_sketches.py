"""Mergeable HLL sketch table: exactness in sparse mode, the RSE
bound once dense, shard-append parity with a one-shot build, and the
no-rescan contract (rollups read only the sketch table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def _events(spark, sf=SF_DIR_ORACLE):
    from trial_data_ingestion_spark.plans.library import _events
    return _events(spark, sf)


def test_sharded_sketches_match_exact_distinct(spark, tmp_path):
    """Build the sketch table from daily-ish shards, merge, and
    compare with the exact per-type distinct-user counts.  At the
    oracle sf the per-type cardinality (~150) keeps every sketch in
    sparse mode, so the merged estimates are EXACT — the same
    determinism pin q36 carries."""
    from trial_data_ingestion_spark.operators.sketches import (
        merged_distinct, write_hll_shard,
    )
    ev = _events(spark).select("user_id", "event_type",
                               (F.dayofyear("ts") % 4).alias("shard"))
    path = str(tmp_path / "hll")
    for s in range(4):
        write_hll_shard(ev.where(F.col("shard") == s), path,
                        ["event_type"], "user_id", shard=f"s{s}")
    got = {r["event_type"]: r["n_distinct"] for r in
           merged_distinct(spark, path, ["event_type"]).collect()}
    want = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == want

    # trailing-window rollup: merging a shard subset equals the
    # exact distinct over exactly those shards
    got2 = {r["event_type"]: r["n_distinct"] for r in
            merged_distinct(spark, path, ["event_type"],
                            shards=["s1", "s2"]).collect()}
    want2 = {r["event_type"]: r["n"] for r in
             ev.where(F.col("shard").isin(1, 2)).groupBy("event_type")
               .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got2 == want2


def test_shard_append_is_idempotent_and_incremental(spark, tmp_path):
    """Re-running a shard overwrites only its own partition (ingest
    retry safety), and appending a new shard changes no existing
    sketch rows — the incremental contract."""
    from trial_data_ingestion_spark.operators.sketches import (
        merged_distinct, write_hll_shard,
    )
    ev = _events(spark).select("user_id", "event_type")
    half1 = ev.where(F.col("user_id") % 2 == 0)
    half2 = ev.where(F.col("user_id") % 2 == 1)
    path = str(tmp_path / "hll_inc")
    write_hll_shard(half1, path, ["event_type"], "user_id", "a")
    write_hll_shard(half1, path, ["event_type"], "user_id", "a")  # retry
    one = {r["event_type"]: r["n_distinct"] for r in
           merged_distinct(spark, path, ["event_type"]).collect()}
    want1 = {r["event_type"]: r["n"] for r in
             half1.groupBy("event_type")
                  .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert one == want1                      # retry did not double
    write_hll_shard(half2, path, ["event_type"], "user_id", "b")
    both = {r["event_type"]: r["n_distinct"] for r in
            merged_distinct(spark, path, ["event_type"]).collect()}
    want = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert both == want


def test_dense_mode_within_rse_and_no_rescan(spark, tmp_path):
    """Past sparse mode the estimate must land within ~3x the
    configured RSE of exact; and the rollup plan must read ONLY the
    sketch table — the corpus is never rescanned (the whole point)."""
    from trial_data_ingestion_spark.operators.sketches import (
        HLL_RSE, merged_distinct, write_hll_shard,
    )
    big = spark.range(200_000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v"))
    path = str(tmp_path / "hll_big")
    for s in range(2):
        write_hll_shard(big.where(F.col("id") % 2 == s), path,
                        ["g"], "v", f"s{s}", lgk=12)
    est = merged_distinct(spark, path, ["g"])
    rows = est.collect()
    exact = {r["g"]: r["n"] for r in
             big.groupBy("g").agg(F.countDistinct("v").alias("n"))
             .collect()}
    for r in rows:
        bound = 3 * HLL_RSE[12] * exact[r["g"]]
        assert abs(r["n_distinct"] - exact[r["g"]]) <= bound, (r, bound)
    # no-rescan: the executed plan's only scan reads the sketch
    # table's columns (hll_sketch present), never the corpus column
    scans = [ln.strip() for ln in est._jdf.queryExecution()
             .executedPlan().toString().splitlines()
             if "FileScan" in ln or "Scan parquet" in ln]
    assert scans, "no scan line found in executed plan"
    for ln in scans:
        assert "hll_sketch" in ln, ln
        assert "v#" not in ln, ln
