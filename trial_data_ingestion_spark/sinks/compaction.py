"""Parquet compaction: rewrite a fragmented dataset into
target-sized files — the routine maintenance every append-heavy
layout here (upsert sink, incremental index appends, streaming
foreachBatch output) eventually needs.

Small files are the classic large-cluster tax: every file costs a
driver listing entry, a footer read, and a scheduled task, so a
dataset accreted by thousands of micro-batches scans an order of
magnitude slower than the same bytes in right-sized files.
Compaction = one job: read, repartition to ``ceil(bytes /
target_file_bytes)`` (size measured from the files themselves, no
data pass), write, atomically swap.

Ordering-preserving option: with ``sort_cols`` the rewrite
range-partitions + sorts instead of round-robin coalescing, so a
z-ordered or bucketed-sorted layout keeps its pruning power after
compaction (footer min/max stay tight).

The swap is directory-rename best-effort (write to ``<path>.__compact``,
move old to ``<path>.__old``, rename new into place, delete old) —
single-writer semantics, the same assumption as upsert_parquet."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import functions as F


def dataset_bytes(path: str) -> int:
    """Total bytes of the dataset's data files (driver-side listing,
    no Spark job)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """{n_files, total_bytes, target_files}: what a compaction run
    would do — cheap enough to poll before deciding to pay the
    rewrite."""
    n_files = 0
    for root, _dirs, files in os.walk(path):
        n_files += sum(1 for f in files
                       if not f.startswith(("_", ".")))
    total = dataset_bytes(path)
    return {"n_files": n_files, "total_bytes": total,
            "target_files": max(1, math.ceil(total
                                             / target_file_bytes))}


def compact_parquet(spark, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None) -> dict:
    """Rewrite ``path`` into ~``target_file_bytes`` parquet files
    (round-robin; or range-partitioned + sorted by ``sort_cols`` to
    preserve a clustered layout's footer pruning).  Returns the plan
    dict with ``files_after`` added."""
    plan = plan_compaction(path, target_file_bytes)
    df = spark.read.parquet(path)
    n = plan["target_files"]
    if sort_cols:
        out = (df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
               .sortWithinPartitions(*sort_cols))
    else:
        out = df.repartition(n)
    tmp, old = path + ".__compact", path + ".__old"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    plan["files_after"] = plan_compaction(path,
                                          target_file_bytes)["n_files"]
    return plan
