"""Embedding tier tests E1/E3/E4/E5 + vector expressions E6."""

from __future__ import annotations

import math

import pytest

from trial_data_ingestion_spark.operators.embedding import (
    HashEmbedder, embed_text, resolve_backend,
)


def test_hash_embedder_deterministic_and_normalized():
    e = HashEmbedder(dim=64)
    v1, v2 = e.encode(["hello world", "hello world"])
    assert v1 == v2
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-5
    assert e.encode(["different text"])[0] != v1
    assert e.encode([""])[0] == [0.0] * 64


def test_embed_text_spark(spark):
    df = spark.createDataFrame([("c1", "alpha beta"), ("c2", "")],
                               "chunk_id string, text string")
    out = embed_text(df, "text", lambda: HashEmbedder(16)).collect()
    by_id = {r["chunk_id"]: r for r in out}
    assert by_id["c1"]["embedding_dim"] == 16
    assert len(by_id["c1"]["embedding"]) == 16
    assert by_id["c2"]["embedding"] == [0.0] * 16
    # deterministic across a second run (per-worker encoder singletons)
    again = {r["chunk_id"]: r["embedding"] for r in
             embed_text(df, "text", lambda: HashEmbedder(16)).collect()}
    assert again["c1"] == by_id["c1"]["embedding"]


def test_e5_prefix_changes_vector(spark):
    df = spark.createDataFrame([("c1", "alpha")], "chunk_id string, text string")
    plain = embed_text(df, "text", lambda: HashEmbedder(16)).collect()[0]
    prefixed = embed_text(df, "text", lambda: HashEmbedder(16),
                          prefix="passage: ").collect()[0]
    assert plain["embedding"] != prefixed["embedding"]
    assert plain["text"] == prefixed["text"] == "alpha"  # stored unprefixed


def test_backend_registry():
    assert isinstance(resolve_backend("hash", dim=8)(), HashEmbedder)
    with pytest.raises(ValueError):
        resolve_backend("nonsense")


def test_vector_metrics(spark):
    from pyspark.sql import functions as F
    from trial_data_ingestion_spark.functions.vector import (
        cosine_similarity, dot, l2_distance, l2_norm,
    )
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [3.0, 4.0])],
        "a array<float>, b array<float>")
    r = df.select(dot("a", "b").alias("d"),
                  cosine_similarity("a", "b").alias("c"),
                  l2_distance("a", "b").alias("l"),
                  l2_norm("a").alias("n")).collect()
    assert r[0]["d"] == 0.0 and abs(r[0]["c"]) < 1e-12
    assert abs(r[0]["l"] - math.sqrt(2)) < 1e-12
    assert r[1]["d"] == 11.0
    assert abs(r[1]["c"] - 11.0 / (math.sqrt(5) * 5)) < 1e-12
