"""Uncompressed-AVI video path: codec round-trip, in-Spark decode/
featurize, REAL frame sampling composing with the image kernels,
spatial resize, and the compressed-format gate."""

from __future__ import annotations

import numpy as np
import pytest


def _frames(n=6, h=12, w=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_bit_exact():
    from trial_data_ingestion_spark.multimodal.codecs import (
        decode_avi, encode_avi,
    )
    frames = _frames()
    payload = encode_avi(frames, fps=5)
    got, fps = decode_avi(payload)
    assert fps == 5
    assert got.shape == frames.shape
    assert np.array_equal(got, frames)


def test_video_features_in_spark_match_numpy(spark):
    from trial_data_ingestion_spark.multimodal import extract_features
    from trial_data_ingestion_spark.multimodal.codecs import (
        encode_avi, video_decoder,
    )
    clips = {f"v{i}": _frames(n=4 + i, seed=i) for i in range(3)}
    rows = [(k, bytearray(encode_avi(v, fps=8)), {"codec": "rawavi"})
            for k, v in clips.items()]
    df = spark.createDataFrame(
        rows, "media_id string, media binary, metadata map<string,string>")
    got = {r["media_id"]: np.array(r["features"], dtype=np.float32)
           for r in extract_features(df, decoder=video_decoder).collect()}
    for k, v in clips.items():
        expected = video_decoder(encode_avi(v, fps=8))
        assert np.allclose(got[k], expected)
        assert got[k].shape == (16,)
        assert 0.0 < got[k][0] < 1.0          # random frames move
        assert abs(float(got[k][1:].sum()) - 1.0) < 1e-5


def test_frame_sample_composes_with_image_kernels(spark):
    """video -> sampled frames (as BMP payloads) -> image decode must
    reproduce the original frames bit-exactly."""
    from trial_data_ingestion_spark.multimodal import frame_sample
    from trial_data_ingestion_spark.multimodal.codecs import (
        decode_bmp, encode_avi, video_frame_extractor,
    )
    frames = _frames(n=10)
    payload = encode_avi(frames, fps=10)          # 100 ms per frame
    df = spark.createDataFrame(
        [("clip", bytearray(payload))], "media_id string, media binary")
    got = (frame_sample(df, every_ms=300,
                        extractor=video_frame_extractor)
           .orderBy("frame_ts_ms").collect())
    # 10 frames at 10 fps sampled every 300 ms -> ts 0/300/600/900
    assert [r["frame_ts_ms"] for r in got] == [0, 300, 600, 900]
    for r, idx in zip(got, [0, 3, 6, 9]):
        assert np.array_equal(decode_bmp(bytes(r["media"])), frames[idx])


def test_video_resizer_shapes_and_rate():
    from trial_data_ingestion_spark.multimodal.codecs import (
        decode_avi, encode_avi, video_resizer,
    )
    frames = _frames(n=5, h=20, w=30)
    resized = video_resizer(encode_avi(frames, fps=12), 15, 10)
    got, fps = decode_avi(resized)
    assert got.shape == (5, 10, 15, 3)
    assert fps == 12
    # nearest-neighbor: every output pixel exists in the source frame
    assert got.dtype == np.uint8


def test_compressed_video_stays_gated():
    from trial_data_ingestion_spark.multimodal.codecs import decode_avi
    import struct
    # well-formed RIFF/AVI wrapper with a non-BI_RGB strf
    strf = struct.pack("<IiiHHI", 40, 4, 4, 1, 24, 0x34363268)  # 'h264'
    body = (b"AVI " + b"LIST" + struct.pack("<I", len(strf) + 12)
            + b"hdrl" + b"strf" + struct.pack("<I", len(strf)) + strf)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_avi(payload)
    with pytest.raises(ValueError):
        decode_avi(b"not a riff at all....")
