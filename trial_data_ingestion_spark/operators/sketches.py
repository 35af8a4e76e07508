"""Mergeable distinct-count sketches over shard-partitioned corpora
(Apache DataSketches HLL via Spark's ``hll_sketch_agg`` family).

The 100 TB problem this solves: "distinct users per event type, all
time" over an append-only corpus.  countDistinct re-shuffles every
row of history on every refresh; HLL sketches are MERGEABLE, so each
arriving shard (a day, an ingest batch) is sketched ONCE at O(shard)
cost and persisted as a few-KB binary row, and any later rollup —
all-time, last-N-shards, per-group — is a union over the tiny sketch
table with NO rescan of history.  This is the sketch-table analog of
the persisted MinHash/SRP index tier (``incremental_dedup``): pay
per-delta, query from the artifact.

Error model: estimates are exact while a group's sketch is in
sparse mode (hundreds of values at the default lgK=12) and carry
~1-2% relative standard error once dense (RSE ~ 1.04/sqrt(2^lgK));
``HLL_RSE`` exposes the bound the tests gate on.  Sketches built
with different lgK still merge (DataSketches downsamples), but keep
one lgK per table for predictable error.

Reference parity: the reference has no sketch tier at all (its
counters are exact pandas aggregations, ``fulltext_enricher.py``
run summaries); this is part of the engine's beyond-reference
analytics surface, next to q36's approx_count_distinct.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: relative standard error of an lgK-configured HLL sketch
HLL_RSE = {lgk: 1.04 / math.sqrt(2 ** lgk) for lgk in range(4, 22)}


def hll_shard_sketches(df: DataFrame, group_cols: list[str],
                       value_col: str, lgk: int = 12) -> DataFrame:
    """One (group, sketch) row per group: the mergeable per-shard
    artifact.  One keyed shuffle over the shard — the only time this
    shard's rows are ever read."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
                 .alias("hll_sketch")))


def write_hll_shard(df: DataFrame, path: str, group_cols: list[str],
                    value_col: str, shard: str,
                    lgk: int = 12) -> None:
    """Sketch one shard and append it to the sketch table at
    ``path`` (partitioned by ``shard`` — re-running a shard is an
    overwrite of its own partition, so ingest retries stay
    idempotent)."""
    out = (hll_shard_sketches(df, group_cols, value_col, lgk)
           .withColumn("shard", F.lit(shard)))
    (out.coalesce(1)
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path))
    df.sparkSession.catalog.refreshByPath(path)


def merged_distinct(spark: SparkSession, path: str,
                    group_cols: list[str],
                    shards: list[str] | None = None) -> DataFrame:
    """(group_cols..., n_distinct) from the sketch table alone — the
    union touches a few KB per (group, shard), never the corpus.
    ``shards`` restricts the rollup (e.g. a trailing window); None
    merges everything.  The shard filter is a partition prune on the
    sketch table's own layout."""
    t = spark.read.parquet(path)
    if shards is not None:
        t = t.where(F.col("shard").isin(list(shards)))
    return (t.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_union_agg(F.col("hll_sketch"), F.lit(True)))
                .alias("n_distinct")))
