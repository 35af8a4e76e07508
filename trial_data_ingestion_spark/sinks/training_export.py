"""Training-shard export: deterministic global shuffle + fixed shard
count, the last stage of a pretraining data pipeline.

Training jobs want (a) examples in a SHUFFLED order that does not
correlate with source/time locality, (b) a FIXED number of
near-equal shards so data loaders stripe cleanly across workers, and
(c) DETERMINISM — the same corpus and seed must produce bit-identical
shards so runs are reproducible and resumable.  ``df.repartition(n)``
gives none of that (round-robin of whatever order the scan produced).

Design (100 TB):
  * shard assignment and intra-shard order both derive from
    ``md5(seed || key)`` — content-stable, engine-portable (same
    family as operators/sampling.py), independent of input
    partitioning;
  * ONE range-free shuffle: ``repartition(n, shard)`` hash-exchanges
    straight to the target layout, then ``sortWithinPartitions``
    orders each shard without a second exchange;
  * each shard lands as exactly one file per shard id: the
    pre-shuffle puts all of a shard's rows in one partition (hash of
    the shard value — a task may carry two shards, never half of
    one), so ``partitionBy("shard")`` writes one file per shard
    directory (asserted in tests/test_training_export.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_key(key: Column, seed: str) -> Column:
    """Stable pseudo-random order key (same md5 family as
    operators/sampling._bucket, different derivation so a sampling
    pass and the export shuffle are independent draws)."""
    return F.md5(F.concat(F.lit("shuffle|"), F.lit(seed), F.lit("|"),
                          key.cast("string")))


def shuffled_shards(df: DataFrame, key_col: str, n_shards: int,
                    seed: str = "s0") -> DataFrame:
    """The export layout as a DataFrame: input columns plus ``shard``
    (0..n_shards-1), hash-partitioned so each shard is one task, each
    shard internally ordered by the stable shuffle key."""
    ordk = _order_key(F.col(key_col), seed)
    shard = (F.conv(F.substring(ordk, 1, 15), 16, 10).cast("long")
             % n_shards).cast("int")
    # duplicate key_col values tie on __ord; break the tie with a hash
    # over the full row so intra-shard order never depends on the
    # incoming shuffle (rows identical in every column remain
    # interchangeable — output is still bit-identical)
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    return (df.withColumn("__ord", ordk)
              .withColumn("__tb", tiebreak)
              .withColumn("shard", shard)
              .repartition(n_shards, "shard")
              .sortWithinPartitions("shard", "__ord", "__tb")
              .drop("__ord", "__tb"))


def write_training_shards(df: DataFrame, path: str, key_col: str,
                          n_shards: int, seed: str = "s0",
                          fmt: str = "parquet") -> None:
    """Materialize the shuffled shards under
    ``path/shard=<k>/part-*.{fmt}``; with the pre-shuffle each shard
    directory holds exactly one data file, so a loader can stripe
    ``shard=k`` across ranks directly."""
    (shuffled_shards(df, key_col, n_shards, seed)
        .write.partitionBy("shard").mode("overwrite").format(fmt)
        .save(path))
