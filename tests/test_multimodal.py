"""Multimodal column plumbing tests: schema, batching, stubbed decode."""

from __future__ import annotations

import pytest


def test_fake_media_and_features(spark):
    from trial_data_ingestion_spark import multimodal as mm
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    media = mm.attach_fake_media(docs, "doc_id")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media", "media_path", "metadata"]
    feats = mm.extract_features(media, decoder=mm.fake_decoder).collect()
    assert len(feats) == 10
    assert all(r["feature_dim"] == 16 for r in feats)
    # deterministic: same id -> same features across runs
    again = {r["media_id"]: r["features"] for r in
             mm.extract_features(mm.attach_fake_media(docs, "doc_id"),
                                 decoder=mm.fake_decoder).collect()}
    for r in feats:
        assert again[r["media_id"]] == r["features"]


def test_decode_without_decoder_raises(spark):
    from trial_data_ingestion_spark import multimodal as mm
    docs = spark.range(2).withColumnRenamed("id", "doc_id")
    media = mm.attach_fake_media(docs, "doc_id")
    with pytest.raises(NotImplementedError):
        mm.extract_features(media)


def test_resize_media(spark):
    from trial_data_ingestion_spark import multimodal as mm
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    media = mm.attach_fake_media(docs, "doc_id")
    resized = mm.resize_media(media, 32, 32, resizer=mm.fake_resizer)
    # schema-preserving: composes with the featurize kernel downstream
    # (nullability differs: lit() columns are non-null, kernel output
    # is the canonical all-nullable MEDIA_SCHEMA)
    assert resized.schema == mm.MEDIA_SCHEMA
    rows = resized.collect()
    assert len(rows) == 5
    assert all(r["metadata"]["width"] == 32 and
               r["metadata"]["height"] == 32 for r in rows)
    orig = {r["media_id"]: r["media"] for r in media.collect()}
    for r in rows:  # payload transformed, deterministically
        assert r["media"] != orig[r["media_id"]]
        assert r["media"] == mm.fake_resizer(orig[r["media_id"]], 32, 32)
    feats = mm.extract_features(resized, decoder=mm.fake_decoder)
    assert feats.count() == 5
    with pytest.raises(NotImplementedError):
        mm.resize_media(media, 32, 32)


def test_real_codec_roundtrips():
    # stdlib BMP/PNG codecs: every PNG filter type and BMP row padding
    import numpy as np
    from trial_data_ingestion_spark.multimodal import codecs as c
    rng = np.random.default_rng(7)
    for (h, w) in [(8, 8), (5, 3), (1, 1)]:   # w=3 exercises row pad
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(c.decode_bmp(c.encode_bmp(px)), px)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, (9, 7, ch), dtype=np.uint8)
        for ft in range(5):                   # None/Sub/Up/Avg/Paeth
            got = c.decode_png(c.encode_png(px, filter_type=ft))
            assert np.array_equal(got, px), (ch, ft)
    with pytest.raises(NotImplementedError):  # JPEG stays env-gated
        c.decode_image(b"\xff\xd8\xff...")


def test_real_decode_features_in_spark(spark):
    # the NON-STUB branch end to end: real PNG/BMP bytes -> pixels ->
    # luminance-histogram features inside the mapInPandas kernel,
    # checked against a driver-side numpy reference
    import numpy as np
    from trial_data_ingestion_spark import multimodal as mm
    from trial_data_ingestion_spark.multimodal import codecs as c
    rng = np.random.default_rng(11)
    pixels = {f"m{i}": rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
              for i in range(6)}
    rows = [(mid, bytearray(c.encode_png(px) if i % 2 else
                            c.encode_bmp(px)), None,
             {"media_type": "image",
              "format": "png" if i % 2 else "bmp",
              "width": 10, "height": 12, "duration_ms": 0})
            for i, (mid, px) in enumerate(pixels.items())]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in
             mm.extract_features(media, decoder=c.image_decoder).collect()}
    assert len(feats) == 6
    for mid, px in pixels.items():
        gray = px.astype(np.float32).mean(axis=-1)
        ref, _ = np.histogram(gray, bins=16, range=(0.0, 256.0))
        got = np.array(feats[mid]["features"], dtype=np.float32)
        assert feats[mid]["feature_dim"] == 16
        assert np.allclose(got, ref / gray.size, atol=1e-7), mid


def test_real_resize_in_spark(spark):
    # real nearest-neighbor resize in the kernel: payload re-encoded in
    # its own format, pixel-exact vs the numpy reference, metadata
    # rewritten, and composable with the real featurize kernel
    import numpy as np
    from trial_data_ingestion_spark import multimodal as mm
    from trial_data_ingestion_spark.multimodal import codecs as c
    rng = np.random.default_rng(13)
    px = {f"m{i}": rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
          for i in range(4)}
    rows = [(mid, bytearray(c.encode_bmp(p) if i % 2 else
                            c.encode_png(p)), None,
             {"media_type": "image",
              "format": "bmp" if i % 2 else "png",
              "width": 8, "height": 8, "duration_ms": 0})
            for i, (mid, p) in enumerate(px.items())]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    out = mm.resize_media(media, 4, 4, resizer=c.image_resizer).collect()
    assert len(out) == 4
    sel = (np.arange(4) * 8) // 4
    for r in out:
        assert r["metadata"]["width"] == 4
        assert r["metadata"]["height"] == 4
        got = c.decode_image(bytes(r["media"]))
        ref = px[r["media_id"]][sel][:, sel]
        assert np.array_equal(got, ref), r["media_id"]
        # format preserved
        expect_bmp = r["metadata"]["format"] == "bmp"
        assert (bytes(r["media"])[:2] == b"BM") == expect_bmp

    feats = mm.extract_features(
        mm.resize_media(media, 4, 4, resizer=c.image_resizer),
        decoder=c.image_decoder)
    assert feats.count() == 4


def test_wav_roundtrip():
    # int16 payloads survive encode->decode bit-exactly, mono + stereo
    import numpy as np
    from trial_data_ingestion_spark.multimodal import codecs as c
    rng = np.random.default_rng(17)
    for ch in (1, 2):
        s = rng.integers(-32768, 32768, (400, ch)).astype(np.int16)
        dec, rate = c.decode_wav(c.encode_wav(s, sample_rate=8000))
        assert rate == 8000
        assert np.array_equal((dec * 32768.0).astype(np.int16), s)
    with pytest.raises(NotImplementedError):  # 8-bit stays env-gated
        import io
        import wave
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(b"\x00" * 16)
        c.decode_wav(buf.getvalue())


def test_real_audio_features_in_spark(spark):
    # the NON-STUB audio branch end to end: real WAV bytes -> PCM ->
    # RMS + FFT-band features inside the mapInPandas kernel, checked
    # against a driver-side numpy reference.  Tones at distinct
    # frequencies must put their energy in distinct (ordered) bands.
    import numpy as np
    from trial_data_ingestion_spark import multimodal as mm
    from trial_data_ingestion_spark.multimodal import codecs as c
    rate, n = 8000, 2048
    t = np.arange(n) / rate
    tones = {"low": 250.0, "mid": 1000.0, "high": 3500.0}
    wavs = {mid: c.encode_wav(0.5 * np.sin(2 * np.pi * f * t),
                              sample_rate=rate)
            for mid, f in tones.items()}
    rows = [(mid, bytearray(w), None,
             {"media_type": "audio", "format": "wav",
              "width": None, "height": None,
              "duration_ms": int(1000 * n / rate)})
            for mid, w in wavs.items()]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in
             mm.extract_features(media, decoder=c.audio_decoder).collect()}
    assert len(feats) == 3
    peak_band = {}
    for mid, w in wavs.items():
        got = np.array(feats[mid]["features"], dtype=np.float32)
        assert feats[mid]["feature_dim"] == 16
        ref = c.audio_decoder(w)
        assert np.allclose(got, ref, atol=1e-7), mid
        # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
        assert abs(got[0] - 0.5 / np.sqrt(2)) < 0.01, mid
        assert abs(got[1:].sum() - 1.0) < 1e-5
        peak_band[mid] = int(np.argmax(got[1:]))
    assert peak_band["low"] < peak_band["mid"] < peak_band["high"]


def test_real_audio_resample_in_spark(spark):
    # audio_resampler behind the resize kernel: width carries the
    # target rate; the downsampled payload halves its frame count, and
    # the tone's band peak doubles (same Hz, half the Nyquist range).
    import numpy as np
    from trial_data_ingestion_spark import multimodal as mm
    from trial_data_ingestion_spark.multimodal import codecs as c
    rate, n = 16000, 4096
    t = np.arange(n) / rate
    wav = c.encode_wav(0.5 * np.sin(2 * np.pi * 1800.0 * t),
                       sample_rate=rate)
    media = spark.createDataFrame(
        [("a", bytearray(wav), None,
          {"media_type": "audio", "format": "wav",
           "width": None, "height": None, "duration_ms": 256})],
        mm.MEDIA_SCHEMA)
    out = mm.resize_media(media, 8000, 0,
                          resizer=c.audio_resampler).collect()
    dec, new_rate = c.decode_wav(bytes(out[0]["media"]))
    assert new_rate == 8000
    assert abs(dec.shape[0] - n // 2) <= 1
    # 440 Hz sits at the same fraction of Nyquist after halving both
    # rate and duration -> same normalized band peak
    orig_peak = int(np.argmax(c.audio_decoder(wav)[1:]))
    new_peak = int(np.argmax(c.audio_decoder(bytes(out[0]["media"]))[1:]))
    assert abs(new_peak - 2 * orig_peak) <= 1


def test_frame_sampling(spark):
    from pyspark.sql import functions as F
    from trial_data_ingestion_spark import multimodal as mm
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    media = (mm.attach_fake_media(docs, "doc_id", media_type="video")
             .withColumn("metadata", F.struct(
                 F.lit("video").alias("media_type"),
                 F.lit("fake").alias("format"),
                 F.lit(8).alias("width"), F.lit(8).alias("height"),
                 F.lit(3000).cast("long").alias("duration_ms"))))
    frames = mm.frame_sample_stub(media, every_ms=1000).collect()
    # 3 media x 3 frames (0, 1000, 2000 ms)
    assert len(frames) == 9
    assert sorted({r["frame_ts_ms"] for r in frames}) == [0, 1000, 2000]


def test_resolve_media_loads_out_of_line_payloads(spark, tmp_path):
    """media_path rows materialize to the same bytes an inline row
    carries; inline rows pass through; downstream feature kernels see
    no difference between the two storage modes."""
    import numpy as np

    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.multimodal import (
        extract_features, resolve_media,
    )
    from trial_data_ingestion_spark.multimodal.codecs import (
        encode_bmp, image_decoder,
    )

    def img(seed):
        px = np.random.RandomState(seed).randint(
            0, 256, (8, 8)).astype(np.uint8)
        return encode_bmp(np.stack([px] * 3, axis=-1))

    inline_bytes, outline_bytes = img(1), img(2)
    p = tmp_path / "m2.bmp"
    p.write_bytes(outline_bytes)
    rows = [
        ("m1", bytearray(inline_bytes), None),
        ("m2", None, str(p)),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, media binary, media_path string")
    got = {r.media_id: bytes(r.media)
           for r in resolve_media(df).collect()}
    assert got["m1"] == inline_bytes
    assert got["m2"] == outline_bytes

    feats = {r.media_id: r.features
             for r in extract_features(resolve_media(df),
                                       image_decoder).collect()}
    direct = image_decoder(outline_bytes).tolist()
    assert feats["m2"] == pytest.approx(direct)

    # a bad path must fail loudly, not propagate NULLs
    bad = spark.createDataFrame(
        [("mx", None, str(tmp_path / "missing.bmp"))],
        "media_id string, media binary, media_path string")
    with pytest.raises(Exception, match="missing.bmp"):
        resolve_media(bad).collect()
