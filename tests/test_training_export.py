"""Training-shard export: one file per shard, deterministic content
and order, near-equal shard sizes."""

from __future__ import annotations

import glob

from tests.conftest import SF_DIR


def _read_shard_orders(spark, path, n_shards):
    out = {}
    for k in range(n_shards):
        files = sorted(glob.glob(f"{path}/shard={k}/part-*"))
        assert len(files) == 1, (k, files)   # exactly one file per shard
        rows = spark.read.parquet(files[0]).collect()
        out[k] = [r["doc_id"] for r in rows]
    return out


def test_training_shards_deterministic_and_balanced(spark, tmp_path):
    from trial_data_ingestion_spark.sinks.training_export import (
        write_training_shards,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    n = docs.count()
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    write_training_shards(docs.repartition(11), p1, "doc_id", 8)
    write_training_shards(docs.coalesce(1), p2, "doc_id", 8)
    a = _read_shard_orders(spark, p1, 8)
    b = _read_shard_orders(spark, p2, 8)
    # bit-level reproducibility: same shards, same in-shard order,
    # whatever the input partitioning was
    assert a == b
    sizes = [len(v) for v in a.values()]
    assert sum(sizes) == n
    # near-equal shards (md5 mod): no shard more than 2x another
    assert max(sizes) <= 2 * min(sizes), sizes
    # the shuffle decorrelates source order: the first shard must not
    # be a contiguous doc_id range
    first = a[0]
    assert sorted(first) != first


def test_training_shards_seed_changes_layout(spark, tmp_path):
    from trial_data_ingestion_spark.sinks.training_export import (
        shuffled_shards,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id").limit(400))
    a = {r["doc_id"]: r["shard"]
         for r in shuffled_shards(docs, "doc_id", 8, seed="s0").collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shuffled_shards(docs, "doc_id", 8, seed="s1").collect()}
    # different seeds give a different (independent) assignment
    assert any(a[d] != b[d] for d in a)


def test_epoch_mixture_exports_deterministic_shards(spark, tmp_path):
    """The multi-epoch mixture composes with shard export: the
    (key, epoch) pair is the export key, so repeated copies of one
    document land at stable, distinct positions and the whole layout
    is bit-reproducible."""
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs,
    )
    from trial_data_ingestion_spark.sinks.training_export import (
        shuffled_shards,
    )
    from pyspark.sql import functions as F
    rows = ([(f"w{i}", "web", f"t{i}") for i in range(300)]
            + [(f"k{i}", "wiki", f"u{i}") for i in range(40)])
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    mixed = mixture_with_epochs(df, "source", {"web": 0.5, "wiki": 0.5},
                                key_col="doc_id", total_rows=200)
    keyed = mixed.withColumn(
        "export_key", F.concat_ws("#", "doc_id", F.col("epoch").cast("string")))
    a = [tuple(r) for r in shuffled_shards(keyed, "export_key", 4)
         .orderBy("shard", "export_key").collect()]
    b = [tuple(r) for r in shuffled_shards(keyed.repartition(7),
                                           "export_key", 4)
         .orderBy("shard", "export_key").collect()]
    assert a == b and len(a) > 0
    # copies of the same wiki doc land in (possibly) different shards
    # but always deterministically
    wiki = [r for r in a if "wiki" in r]
    assert len(wiki) >= 60          # ~2.5 epochs of the kept wiki docs
