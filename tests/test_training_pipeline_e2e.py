"""Capstone integration: the full training-data journey on real
testdata — curate (gates + dedup + substring dedup + decontam +
split) -> token-chunk -> FFD-pack -> deterministic shard export ->
reload — with conservation, budget, layout, and bit-reproducibility
asserted at each seam."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def test_training_pipeline_end_to_end(spark, tmp_path):
    from trial_data_ingestion_spark.operators.chunking import (
        chunk_by_tokens,
    )
    from trial_data_ingestion_spark.operators.packing import (
        pack_sequences, packing_stats,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    from trial_data_ingestion_spark.sinks.training_export import (
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 3) \
                .select("doc_id", "text")
    cfg = CurationConfig(lid="native", substring_dedup_ngram=20)

    # ---- curate ------------------------------------------------------
    curated = curate(docs, benchmark=bench, config=cfg)
    curated.cache()
    n_curated = curated.count()
    assert 0 < n_curated < docs.count()
    assert set(curated.select("split").distinct().toPandas()["split"]) \
        <= {"train", "val", "test"}

    # ---- chunk + pack the train split --------------------------------
    train = curated.where("split = 'train'")
    chunks = chunk_by_tokens(train, "text", "doc_id", max_tokens=50,
                             overlap=10)
    n_chunks = chunks.count()
    assert n_chunks > 0
    packed = pack_sequences(chunks.select("chunk_id", "n_tokens"),
                            max_tokens=512, num_shards=4)
    assert packed.count() == n_chunks            # conservation
    stats = packing_stats(packed, max_tokens=512)
    assert stats.where("NOT truncated AND total_tokens > 512") \
        .count() == 0                            # budget

    # ---- export shards, reload, verify layout ------------------------
    out = str(tmp_path / "shards")
    write_training_shards(packed, out, key_col="chunk_id", n_shards=4)
    files = sorted(glob.glob(f"{out}/shard=*/part-*.parquet"))
    shard_dirs = sorted(glob.glob(f"{out}/shard=*"))
    assert len(shard_dirs) == 4
    assert len(files) == 4                       # one file per shard
    reloaded = spark.read.parquet(out)
    assert reloaded.count() == n_chunks
    assert reloaded.select("chunk_id").distinct().count() == n_chunks

    # ---- determinism: rerun produces byte-identical membership -------
    again = curate(docs, benchmark=bench, config=cfg)
    a_ids = sorted(r["doc_id"] for r in curated.collect())
    b_ids = sorted(r["doc_id"] for r in again.collect())
    assert a_ids == b_ids
    out2 = str(tmp_path / "shards2")
    write_training_shards(packed, out2, key_col="chunk_id", n_shards=4)
    r1 = spark.read.parquet(out).orderBy("shard", "chunk_id").collect()
    r2 = spark.read.parquet(out2).orderBy("shard", "chunk_id").collect()
    assert r1 == r2
    curated.unpersist()
