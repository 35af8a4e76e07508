"""Parquet compaction: fragmentation collapse with identical content,
target sizing arithmetic, sorted-layout preservation (footer ranges
stay tight after compaction), and the atomic-swap leftovers."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _fragment(spark, tmp_path, parts=40):
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_extendedprice"))
    path = str(tmp_path / "frag")
    li.repartition(parts).write.mode("overwrite").parquet(path)
    return li, path


def test_compact_collapses_files_and_preserves_rows(spark, tmp_path):
    from trial_data_ingestion_spark.sinks.compaction import (
        compact_parquet,
        plan_compaction,
    )
    li, path = _fragment(spark, tmp_path, parts=40)
    before = plan_compaction(path)
    assert before["n_files"] >= 40
    plan = compact_parquet(spark, path,
                           target_file_bytes=before["total_bytes"])
    assert plan["target_files"] == 1
    assert plan["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    sums = lambda d: d.agg(                              # noqa: E731
        F.round(F.sum("l_extendedprice"), 2),
        F.sum("l_orderkey")).collect()
    assert sums(back) == sums(li)
    # atomic swap leaves no droppings
    assert not os.path.exists(path + ".__compact")
    assert not os.path.exists(path + ".__old")


def test_compact_target_sizing(spark, tmp_path):
    from trial_data_ingestion_spark.sinks.compaction import (
        compact_parquet,
    )
    _, path = _fragment(spark, tmp_path, parts=30)
    from trial_data_ingestion_spark.sinks.compaction import (
        dataset_bytes,
    )
    total = dataset_bytes(path)
    plan = compact_parquet(spark, path,
                           target_file_bytes=total // 4 + 1)
    assert plan["target_files"] == 4
    assert plan["files_after"] == 4


def test_compact_preserves_sorted_layout(spark, tmp_path):
    """Compacting WITH sort_cols keeps per-file footer ranges
    disjoint-ish (pruning survives); without it they overlap."""
    from trial_data_ingestion_spark.sinks.compaction import (
        compact_parquet,
        dataset_bytes,
    )
    from trial_data_ingestion_spark.sinks.zorder import (
        file_ranges,
        overlap_fraction,
    )
    li, path = _fragment(spark, tmp_path, parts=30)
    total = dataset_bytes(path)
    compact_parquet(spark, path, target_file_bytes=total // 8 + 1,
                    sort_cols=["l_partkey"])
    rr = file_ranges(path, ["l_partkey"])
    assert len(rr) == 8
    lo, hi = li.approxQuantile("l_partkey", [0.45, 0.55], 0.001)
    assert overlap_fraction(rr, "l_partkey", lo, hi) <= 0.375