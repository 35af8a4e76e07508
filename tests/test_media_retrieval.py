"""Media similarity retrieval: the multimodal feature column feeds
the SAME vector operators as text embeddings — decode real BMP bytes,
featurize, then brute-force and blocked near-dup search find the
visually-identical pair.  Pins the cross-tier contract (features
array<float> IS an embedding column)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def _bmp(px: np.ndarray) -> bytes:
    from trial_data_ingestion_spark.multimodal.codecs import encode_bmp
    return encode_bmp(px)


def _media_df(spark):
    rng = np.random.default_rng(5)
    base = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    near = base.copy()
    near[0, :4] = [0, 0, 0]                     # a few edited pixels
    # structurally different exposure: luminance histogram disjoint
    far = (rng.random((32, 32, 3)) * 50).astype(np.uint8)
    rows = [("m1", _bmp(base)), ("m2", _bmp(near)), ("m3", _bmp(far))]
    return spark.createDataFrame(rows, "media_id string, media binary")


def test_media_features_feed_vector_search(spark):
    from trial_data_ingestion_spark.multimodal import extract_features
    from trial_data_ingestion_spark.multimodal.codecs import (
        image_decoder,
    )
    from trial_data_ingestion_spark.operators.similarity import (
        topk_bruteforce,
    )
    df = _media_df(spark)
    feats = extract_features(df, decoder=image_decoder, dim=16) \
        .select("media_id", "features")
    dim = len(feats.first()["features"])
    q = feats.where("media_id = 'm1'").select(
        F.col("media_id").alias("query_id"),
        F.col("features").alias("query_vec"))
    top = topk_bruteforce(feats, q, id_col="media_id",
                          vec_col="features", k=2).collect()
    ranked = [r["neighbor_id"] for r in
              sorted(top, key=lambda r: r["rank"])]
    # the lightly-edited variant ranks above the unrelated exposure
    assert ranked == ["m2", "m3"]
    scores = {r["neighbor_id"]: r["score"] for r in top}
    assert scores["m2"] > 0.999 > scores["m3"]


def test_media_near_dups_blocked(spark):
    """The SRP-blocked scale path works unchanged on media features:
    the near-identical pair (and only it) crosses the threshold."""
    from trial_data_ingestion_spark.multimodal import extract_features
    from trial_data_ingestion_spark.multimodal.codecs import (
        image_decoder,
    )
    from trial_data_ingestion_spark.operators.similarity import (
        embedding_near_dups,
    )
    df = _media_df(spark)
    feats = extract_features(df, decoder=image_decoder, dim=16) \
        .select("media_id", "features")
    dim = len(feats.first()["features"])
    pairs = embedding_near_dups(feats, dim=dim, id_col="media_id",
                                vec_col="features", threshold=0.99,
                                num_planes=2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {("m1", "m2")}
