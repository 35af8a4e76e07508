"""Bucketed-table sink: pre-shuffle a fact table ONCE so every later
join on the bucket key is exchange-free.

The 100 TB join-locality pattern the brief calls "bucketing for
co-located joins": a table written ``bucketBy(N, key)`` (optionally
``sortBy`` within buckets) records its layout in the catalog; when
two tables share bucket count and key — or a single bucketed table is
joined repeatedly — Spark plans a SortMergeJoin with NO Exchange on
the bucketed side(s).  The shuffle is paid once at write time and
amortized over every subsequent join, the same index-vs-scan economics
as the persisted ANN/BM25 layouts (operators/similarity.py §persist,
operators/search.py).

Spark-specific constraints encoded here (and asserted in
tests/test_bucketed.py):
  * bucketed writes must go through ``saveAsTable`` (the bucket
    metadata lives in the catalog, not in parquet footers); passing
    ``path`` makes it an external table, so the data outlives the
    session while remaining re-registerable.
  * both join sides need the SAME bucket count for an exchange-free
    join (Spark does not coalesce mismatched buckets by default).
  * ``sortBy`` additionally removes the per-task Sort before a
    SortMergeJoin when the sort key equals the join key.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         n_buckets: int = 64,
                         sort_col: Optional[str] = None,
                         path: Optional[str] = None,
                         mode: str = "overwrite") -> None:
    """Materialize ``df`` as a bucketed (and optionally intra-bucket
    sorted) catalog table.  One shuffle now, zero shuffles on every
    future join/aggregation keyed on ``bucket_col``.

    The pre-write ``repartition`` on the bucket key yields exactly
    one file per bucket (minimal file count, and the layout a future
    sort-aware scan could exploit).  Note: current Spark eliminates
    the EXCHANGE from bucket-key joins/aggregations but still inserts
    the per-task Sort before a SortMergeJoin — the scan does not
    report intra-bucket sort order (the long-open SPARK-19256) —
    so ``sortBy`` buys parquet row-group locality, not sort
    elimination.  The shuffle is the scale cost; the per-task sort of
    an already-sorted run is cheap and local."""
    writer = (df.repartition(n_buckets, bucket_col)
              .write.mode(mode).format("parquet")
              .bucketBy(n_buckets, bucket_col)
              .sortBy(sort_col if sort_col else bucket_col))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str,
                  right_table: str, on: str,
                  how: str = "inner") -> DataFrame:
    """Join two registered bucketed tables on their bucket key.  With
    matching bucket counts the physical plan contains no Exchange —
    asserted by tests/test_bucketed.py, which is the point of paying
    the write-time shuffle."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=on, how=how)
