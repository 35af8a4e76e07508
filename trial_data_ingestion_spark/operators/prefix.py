"""Scalable global prefix sum (two-phase) and token-budget sharding.

A global running total normally plans as a Window over ONE partition
— the classic single-task bottleneck (q12's running windows are fine
because they partition by a key; a GLOBAL cumsum has no key).  The
distributed-systems answer is the textbook two-phase scan:

  1. range-partition on the order key (one sampling pass + one
     shuffle — Spark's ``repartitionByRange``, the same machinery as
     the z-order and compaction writers);
  2. per-partition totals -> driver (one tiny row per partition);
  3. exclusive prefix offsets broadcast back; each partition windows
     over ITS OWN rows only and adds its offset.

Every partition works independently in steps 1 and 3; the only
serial state is the per-partition totals list (N_partitions rows on
the driver).

``shard_by_token_budget`` applies it to the export problem row-count
sharding cannot solve: shards balanced by TOKEN mass (data loaders
stall on the heaviest shard, and token counts per document are
long-tailed).  Rows are laid on the deterministic content-stable
order (the md5 shuffle key of sinks/training_export), the running
token total is cut every ``budget`` tokens, and each shard's token
sum lands within one document of the budget — deterministic,
partitioning-independent."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(df: DataFrame, order_col: str, value_col: str,
                  out_col: str = "cumsum",
                  num_partitions: int | None = None) -> DataFrame:
    """``df`` plus the INCLUSIVE running sum of ``value_col`` in
    ``order_col`` order — no single-partition window at any size.
    ``order_col`` must be globally unique (ties would make "the"
    running order ambiguous; the callers here order by content
    hashes)."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    # materialize the ranged layout ONCE: repartitionByRange picks
    # its boundaries by sampling, and the totals pass and the window
    # pass would otherwise re-sample independently — different
    # boundaries, wrong offsets
    ranged = (df.repartitionByRange(int(n), F.col(order_col))
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint())
    totals = (ranged.groupBy("__pid")
              .agg(F.sum(value_col).alias("__tot"))
              .collect())
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets[r["__pid"]] = acc
        acc += r["__tot"] or 0
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items()
                       for x in kv]),
        F.col("__pid")) if offsets else F.lit(0)
    w = (Window.partitionBy("__pid").orderBy(F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged.withColumn(out_col,
                              F.sum(value_col).over(w) + off)
            .drop("__pid"))


def shard_by_token_budget(df: DataFrame, key_col: str, token_col: str,
                          budget: int, seed: str = "s0") -> DataFrame:
    """Input columns plus ``shard`` (int), cut along the
    content-stable shuffle order so every shard's ``token_col`` sum
    is as close to ``budget`` as row granularity allows (a shard
    overshoots by at most one row's tokens, never undershoots except
    the last).  Deterministic for a fixed corpus + seed."""
    from trial_data_ingestion_spark.sinks.training_export import (
        _order_key,
    )
    ordk = _order_key(F.col(key_col), seed)
    keyed = df.withColumn("__ord", ordk)
    run = global_cumsum(keyed, "__ord", token_col, out_col="__run")
    return (run.withColumn(
                "shard",
                F.floor((F.col("__run") - F.col(token_col))
                        / F.lit(budget)).cast("int"))
            .drop("__ord", "__run"))
