"""Two-phase global prefix sum: equality with the driver-computed
running total, partitioning invariance, no single-partition window in
the plan; token-budget sharding: balance bounds, determinism, and
parity with a python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_global_cumsum_matches_reference(spark):
    from trial_data_ingestion_spark.operators.prefix import (
        global_cumsum,
    )
    # the synthetic lineitem repeats (orderkey, linenumber) pairs, so
    # aggregate to the unique key global_cumsum requires
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .groupBy(F.concat_ws("|", "l_orderkey", "l_linenumber")
                   .alias("k"))
          .agg(F.sum(F.col("l_quantity").cast("long")).alias("v")))
    got = {r["k"]: r["cumsum"]
           for r in global_cumsum(li, "k", "v").collect()}
    rows = sorted(li.collect(), key=lambda r: r["k"])
    acc = 0
    for r in rows:
        acc += r["v"]
        assert got[r["k"]] == acc, r["k"]


def test_global_cumsum_partitioning_invariant(spark):
    from trial_data_ingestion_spark.operators.prefix import (
        global_cumsum,
    )
    df = spark.range(0, 5000).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        (F.col("id") % 97 + 1).alias("v"))
    a = {r["k"]: r["cumsum"] for r in
         global_cumsum(df.repartition(3), "k", "v").collect()}
    b = {r["k"]: r["cumsum"] for r in
         global_cumsum(df.repartition(17), "k", "v",
                       num_partitions=5).collect()}
    assert a == b


def test_global_cumsum_no_single_partition_window(spark):
    from trial_data_ingestion_spark.operators.prefix import (
        global_cumsum,
    )
    df = spark.range(0, 1000).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.lit(1).alias("v"))
    plan = global_cumsum(df, "k", "v")._jdf.queryExecution() \
        .executedPlan().toString()
    # the window keys on the per-range partition id — never a global
    # single-partition sort (the materialized range layout itself is
    # behind the checkpoint scan)
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__pid" in plan


def test_shard_by_token_budget(spark):
    from trial_data_ingestion_spark.operators.prefix import (
        shard_by_token_budget,
    )
    from trial_data_ingestion_spark.sinks.training_export import (
        _order_key,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text",
                    F.size(F.split("text", r"\s+")).alias("n_tokens")))
    budget = 2000
    out = shard_by_token_budget(docs, "doc_id", "n_tokens", budget)
    assert set(out.columns) == set(docs.columns) | {"shard"}
    sums = {r["shard"]: r["s"] for r in
            out.groupBy("shard").agg(F.sum("n_tokens").alias("s"))
            .collect()}
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    n_shards = max(sums) + 1
    assert set(sums) == set(range(n_shards))
    for sh, s in sums.items():
        if sh < n_shards - 1:                   # all but the tail
            assert budget - max_doc <= s <= budget + max_doc, (sh, s)
    # python reference over the same deterministic order
    rows = docs.withColumn("__o", _order_key(F.col("doc_id"), "s0")) \
        .select("doc_id", "n_tokens", "__o").collect()
    acc, want = 0, {}
    for r in sorted(rows, key=lambda r: r["__o"]):
        want[r["doc_id"]] = acc // budget
        acc += r["n_tokens"]
    got = {r["doc_id"]: r["shard"] for r in out.collect()}
    assert got == want
    # determinism
    again = {r["doc_id"]: r["shard"] for r in
             shard_by_token_budget(docs, "doc_id", "n_tokens",
                                   budget).collect()}
    assert again == got
