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


def test_packing_fill_ratio_gate_at_bench_scale(spark):
    """The FFD efficiency claim (packing.py docstring), measured on
    the realistic distribution: sf0.1 documents token-chunked 50/10
    (8k chunks, ~37k tokens/shard at 8 shards = 73 bins/shard, well
    inside the shard-sizing rule).  Measured 0.9898 when the gate was
    set; gate at >= 0.98 corpus-level mean fill."""
    from trial_data_ingestion_spark.operators.chunking import chunk_by_tokens
    from trial_data_ingestion_spark.operators.packing import (
        pack_sequences, packing_stats,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .select("doc_id", "text"))
    chunks = (chunk_by_tokens(docs, "text", "doc_id", max_tokens=50,
                              overlap=10).select("chunk_id", "n_tokens"))
    packed = pack_sequences(chunks, max_tokens=512, num_shards=8)
    row = (packing_stats(packed, max_tokens=512)
           .agg(F.avg("fill_ratio").alias("mean_fill")).collect()[0])
    assert row["mean_fill"] >= 0.98, (
        f"mean fill_ratio {row['mean_fill']:.4f} < 0.98 gate "
        "(was 0.9898 at 8 shards/512 budget when gated)")


def test_packing_fill_degrades_only_via_tail_bins(spark):
    """The shard-sizing rule's failure mode, pinned: the SAME corpus
    at 64 shards x 2048 budget has ~2.3 bins/shard, so per-shard tail
    sequences dominate and mean fill drops.  Waste must track the
    predicted num_shards * max_tokens / 2 tail bound — if fill falls
    further than that, FFD itself (not sharding) regressed."""
    from trial_data_ingestion_spark.operators.chunking import chunk_by_tokens
    from trial_data_ingestion_spark.operators.packing import (
        pack_sequences, packing_stats,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            .select("doc_id", "text"))
    chunks = (chunk_by_tokens(docs, "text", "doc_id", max_tokens=50,
                              overlap=10).select("chunk_id", "n_tokens"))
    budget, shards = 2048, 64
    packed = pack_sequences(chunks, max_tokens=budget, num_shards=shards)
    row = (packing_stats(packed, max_tokens=budget)
           .agg(F.sum("total_tokens").alias("tok"),
                F.count(F.lit(1)).alias("n_seqs")).collect()[0])
    minimal = -(-row["tok"] // budget)              # ceil
    # every extra sequence beyond the lower bound is a shard tail;
    # FFD should open at most ~1 underfull tail per shard
    assert row["n_seqs"] - minimal <= shards, (row["n_seqs"], minimal)


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


def test_materialize_sequences_end_to_end(spark):
    """Payload assembly: budget respected, tokens conserved, one EOD
    per member doc, and splitting on EOD recovers every document's
    exact token array."""
    import random

    from trial_data_ingestion_spark.operators.packing import (
        materialize_sequences,
    )
    rng = random.Random(11)
    rows = [(f"d{i:03d}",
             [rng.randrange(0, 50_000) for _ in
              range(rng.randrange(1, 120))])
            for i in range(80)]
    rows.append(("dbig", [7] * 400))          # oversize -> truncated
    df = spark.createDataFrame(rows, "chunk_id string, token_ids array<int>")
    EOD = 50_256
    out = materialize_sequences(df, eod_id=EOD, max_tokens=256,
                                num_shards=4)
    seqs = out.collect()

    for r in seqs:
        assert r["n_tokens"] == len(r["token_ids"])
        assert r["token_ids"].count(EOD) == r["n_docs"]
        if not r["truncated"]:
            assert r["n_tokens"] <= 256
    assert sum(r["n_docs"] for r in seqs) == len(rows)
    assert (sum(r["n_tokens"] for r in seqs)
            == sum(len(t) + 1 for _, t in rows))

    # EOD-split recovery: the multiset of document payloads survives
    def split_docs(ids):
        docs, cur = [], []
        for x in ids:
            if x == EOD:
                docs.append(tuple(cur))
                cur = []
            else:
                cur.append(x)
        assert cur == []          # sequences end on an EOD
        return docs

    got = sorted(d for r in seqs for d in split_docs(r["token_ids"]))
    want = sorted(tuple(t) for _, t in rows)
    assert got == want


def test_materialize_sequences_without_eod(spark):
    from trial_data_ingestion_spark.operators.packing import (
        materialize_sequences,
    )
    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6])],
        "chunk_id string, token_ids array<int>")
    out = materialize_sequences(df, eod_id=None, max_tokens=6,
                                num_shards=1).collect()
    assert sum(r["n_tokens"] for r in out) == 6
    assert all(r["n_tokens"] <= 6 for r in out)
