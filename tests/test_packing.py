"""Sequence-packing tests: conservation, budget, determinism under
re-partitioning, oversize flagging, and fill efficiency."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _chunks(spark, n=3000, seed=7):
    rng = random.Random(seed)
    rows = [(f"c{i:05d}", rng.choice([64, 128, 200, 256, 300, 512,
                                      750, 1024, 1500]))
            for i in range(n)]
    return spark.createDataFrame(rows, "chunk_id string, n_tokens long")


def test_packing_conserves_budget_and_rows(spark):
    from trial_data_ingestion_spark.operators.packing import (
        pack_sequences, packing_stats,
    )
    df = _chunks(spark)
    packed = pack_sequences(df, max_tokens=2048, num_shards=16)
    rows = packed.collect()
    # conservation: every chunk exactly once, columns preserved
    assert len(rows) == df.count()
    assert len({r["chunk_id"] for r in rows}) == len(rows)
    # (seq_id, seq_pos) is a proper enumeration
    assert len({(r["seq_id"], r["seq_pos"]) for r in rows}) == len(rows)
    stats = packing_stats(packed, max_tokens=2048).collect()
    for s in stats:
        assert s["truncated"] or s["total_tokens"] <= 2048, s
    # FFD on a mixed-size distribution should pack tightly
    fill = sum(s["total_tokens"] for s in stats) / (2048 * len(stats))
    assert fill >= 0.85, fill


def test_packing_deterministic_under_repartitioning(spark):
    from trial_data_ingestion_spark.operators.packing import pack_sequences
    df = _chunks(spark, n=1200)
    a = {r["chunk_id"]: (r["seq_id"], r["seq_pos"])
         for r in pack_sequences(df.repartition(7), num_shards=8).collect()}
    b = {r["chunk_id"]: (r["seq_id"], r["seq_pos"])
         for r in pack_sequences(df.repartition(3).sort(F.desc("chunk_id")),
                                 num_shards=8).collect()}
    assert a == b


def test_packing_flags_oversize_as_singletons(spark):
    from trial_data_ingestion_spark.operators.packing import pack_sequences
    df = spark.createDataFrame(
        [("big", 5000), ("a", 1000), ("b", 900)],
        "chunk_id string, n_tokens long")
    rows = {r["chunk_id"]: r
            for r in pack_sequences(df, max_tokens=2048,
                                    num_shards=1).collect()}
    assert rows["big"]["truncated"] and rows["big"]["seq_pos"] == 0
    # the oversize chunk shares its sequence with nothing
    seq_of_big = rows["big"]["seq_id"]
    assert [r["seq_id"] for r in rows.values()].count(seq_of_big) == 1
    assert not rows["a"]["truncated"] and not rows["b"]["truncated"]


def test_packing_end_to_end_from_token_chunks(spark):
    """Real pipeline shape: documents -> token chunks (C4) -> packed
    sequences; every chunk packed once, budget respected."""
    from trial_data_ingestion_spark.operators.chunking import chunk_by_tokens
    from trial_data_ingestion_spark.operators.packing import (
        pack_sequences, packing_stats,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(200).select("doc_id", "text"))
    chunks = (chunk_by_tokens(docs, "text", "doc_id", max_tokens=128,
                              overlap=0)
              .select("chunk_id", "n_tokens"))
    packed = pack_sequences(chunks, max_tokens=1024, num_shards=8)
    assert packed.count() == chunks.count()
    stats = packing_stats(packed, max_tokens=1024)
    bad = stats.where("NOT truncated AND total_tokens > 1024").count()
    assert bad == 0
