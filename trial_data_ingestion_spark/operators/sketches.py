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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: relative standard error of an lgK-configured HLL sketch
HLL_RSE = {lgk: 1.04 / math.sqrt(2 ** lgk) for lgk in range(4, 22)}

#: partition values this package writes raw ``dir=value`` paths for
#: (shard deletes, delta-keyed appends).  Spark URL-escapes partition
#: values on write, so a value needing escaping (space, ':', '/', …)
#: would make a hand-built delete path miss the real directory and
#: silently leave stale data in place — reject such values up front.
_SAFE_PARTITION_VALUE = re.compile(r"^[A-Za-z0-9._-]+$")


def check_partition_value(value: str, what: str = "shard") -> str:
    """Validate a caller-supplied partition value against the safe
    charset (letters, digits, ``._-``); raises ``ValueError``
    otherwise.  See :data:`_SAFE_PARTITION_VALUE` for why."""
    if not isinstance(value, str) or not _SAFE_PARTITION_VALUE.match(value):
        raise ValueError(
            f"{what} {value!r} is not a safe partition value: use only "
            "letters, digits, '.', '_', '-' (Spark escapes other "
            "characters in partition paths, which would break the "
            "idempotent shard delete/overwrite)")
    return value


def delete_path(spark, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FS API (so it
    works against whatever filesystem Spark is configured for, not
    just local disk) and drop any cached listing of it.  The shared
    primitive behind the idempotent shard/delta overwrite pattern:
    delete-your-own-partition, then (re)write it."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)
    spark.catalog.refreshByPath(path)


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
                    lgk: int = 12, n_files: int = 1) -> None:
    """Sketch one shard and append it to the sketch table at
    ``path`` (partitioned by ``shard`` — re-running a shard is an
    overwrite of its own partition, so ingest retries stay
    idempotent).

    ``n_files`` sizes the shard's output: the default single file is
    right for low-cardinality group sets (an event-type sketch row is
    a few KB), but a shard sketched over a HIGH-cardinality group set
    (per-URL-host, per-user-agent) would funnel every sketch row
    through one task — pass ``n_files > 1`` to hash-distribute the
    rows by group across that many writers (still one file per task:
    the write repartitions first).

    Empty-shard retries are handled explicitly: dynamic partition
    overwrite writes NO partitions for a zero-row frame, which would
    silently leave a stale prior sketch in place when a retry now
    produces no data — so an empty input DELETES the shard's
    partition instead (idempotency means "the table reflects this
    run", including reflecting emptiness).

    ``shard`` must be a safe partition value
    (:func:`check_partition_value`): the empty-shard delete builds
    the partition path by hand, and Spark escapes unsafe characters
    on write, so an unsafe name would delete the wrong path."""
    check_partition_value(shard)
    spark = df.sparkSession
    if df.isEmpty():
        delete_path(spark, f"{path}/shard={shard}")
        spark.catalog.refreshByPath(path)
        return
    out = (hll_shard_sketches(df, group_cols, value_col, lgk)
           .withColumn("shard", F.lit(shard)))
    if n_files == 1:
        out = out.coalesce(1)
    else:
        out = out.repartition(n_files, *group_cols)
    (out.write.mode("overwrite")
        .partitionBy("shard")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path))
    spark.catalog.refreshByPath(path)


def hll_stream_sink(path: str, group_cols: list[str], value_col: str,
                    lgk: int = 12, shard_prefix: str = "batch",
                    n_files: int = 1):
    """``foreachBatch`` sink maintaining a mergeable HLL sketch table
    from a stream: each micro-batch is sketched ONCE at O(batch) cost
    and lands as its own shard (``{shard_prefix}-{batch_id:09d}``).
    Batch ids are stable across checkpoint restarts, so a REPLAYED
    micro-batch overwrites its own partition instead of
    double-counting — idempotent by construction, the same
    exactly-once trick as the upsert sink; and a replay that now
    carries no rows CLEARS its stale shard (see
    :func:`write_hll_shard`).  :func:`merged_distinct` then answers
    all-time / trailing-window distinct counts from the sketch table
    alone, with no rescan of the stream's history — the streaming
    closure of the r7 sketch-table tier.

    Usage::

        q = (events.writeStream
             .foreachBatch(hll_stream_sink(path, ["event_type"],
                                           "user_id"))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_hll_shard(batch_df, path, group_cols, value_col,
                        shard=f"{shard_prefix}-{batch_id:09d}",
                        lgk=lgk, n_files=n_files)

    return sink


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
