"""Stdlib-only media codecs: 24-bit BMP and 8-bit PNG images, 16-bit
PCM WAV audio.

The container has no PIL/libjpeg/librosa, so the multimodal kernels'
"real decode" path is implemented against the formats a Python
stdlib can handle bit-exactly:

* BMP: BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows, 4-byte row
  padding — pure ``struct`` arithmetic.
* PNG: 8-bit greyscale/RGB/RGBA, non-interlaced — chunk walk +
  ``zlib`` inflate + the five scanline filters (None/Sub/Up/
  Average/Paeth) from the PNG spec, un-applied row by row.
* WAV: 16-bit PCM via stdlib ``wave`` (bit-exact int16 decode),
  features via ``numpy.fft``.
* AVI: uncompressed 24-bit BI_RGB 'vids' streams — RIFF chunk walk +
  the same BGR/bottom-up/4-byte-padded frame layout as BMP; frame
  sampling re-encodes sampled frames as BMP so the image kernels
  compose downstream of video.

``image_decoder`` / ``image_resizer`` / ``audio_decoder`` /
``audio_resampler`` / ``video_decoder`` / ``video_resizer`` /
``video_frame_extractor`` match the kernel signatures in
:mod:`trial_data_ingestion_spark.multimodal` (``payload -> features``
and ``payload, w, h -> payload``), so
``extract_features(df, decoder=video_decoder)`` (etc.) runs a REAL
bytes -> samples -> features path with zero third-party dependencies
— formats that genuinely need external libs (JPEG, H.264/VP9/any
compressed video) still raise ``NotImplementedError`` and remain
env-gated.

No reference counterpart (the reference has no media handling) —
north-star component per BASELINE.json.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (H, W, 3), got {px.shape}")
    h, w = px.shape[:2]
    row_len = (w * 3 + 3) & ~3          # rows pad to 4-byte boundaries
    img_size = row_len * h
    # BGR byte order, bottom-up row order, right-padded with zeros
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * h,
        offset=data_offset).reshape(h, row_len)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    return (px if top_down else px[::-1]).copy()


# ---------------------------------------------------------------------------
# PNG (8-bit, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # greyscale, RGB, grey+A, RGBA


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) or (H, W, C in {1,2,3,4}) uint8 -> 8-bit PNG bytes.

    ``filter_type`` applies one filter to every scanline (0 = None is
    the production choice; tests use 1-4 to exercise the un-filters).
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = px.reshape(h, w * ch).astype(np.int16)
    out_rows = []
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        up_left = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            filt = cur - _paeth(left, prev, up_left)
        else:
            raise ValueError(f"bad filter {filter_type}")
        out_rows.append(bytes([filter_type])
                        + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (PNG spec §9.4)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG bytes -> (H, W, C) uint8."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise NotImplementedError(
                    f"only 8-bit PNG supported (depth={depth})")
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
            if color_type == 3:
                raise NotImplementedError("palette PNG not supported")
            ch = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        row = raw[y * (stride + 1): (y + 1) * (stride + 1)]
        ftype, filt = row[0], np.frombuffer(
            row, dtype=np.uint8, offset=1).astype(np.int16)
        if ftype == 0:
            cur = filt
        elif ftype == 2:
            cur = (filt + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential per pixel
            cur = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (filt[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (filt[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (filt[x] + int(_paeth(
                        np.int16(a), np.int16(b), np.int16(c)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, ch)


# ---------------------------------------------------------------------------
# WAV (16-bit PCM, stdlib `wave`)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) samples -> 16-bit PCM WAV bytes.  Float input
    is clipped to [-1, 1] and scaled; int16 passes through exactly."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = (np.clip(s, -1.0, 1.0) * 32767.0).round()
    s = s.astype(np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())      # (n, ch) C-order == interleaved
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV bytes -> ((n, ch) float32 in [-1, 1), rate).
    Decoding is bit-exact: int16 / 32768."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        ch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        if sw != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV supported (sampwidth={sw})")
        raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return s.astype(np.float32) / 32768.0, rate


# ---------------------------------------------------------------------------
# AVI (uncompressed 24-bit BI_RGB 'DIB ' video)
# ---------------------------------------------------------------------------

def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, H, W, 3) uint8 RGB frames -> uncompressed AVI bytes
    (RIFF/AVI, one 'vids' stream, BI_RGB DIB frames stored exactly
    like BMP pixel data: BGR, bottom-up, 4-byte row padding)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[-1] != 3:
        raise ValueError(f"expected (n, H, W, 3) frames, got {f.shape}")
    n, h, w, _ = f.shape
    row_size = (w * 3 + 3) & ~3
    frame_size = row_size * h

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[::-1, :, ::-1]                   # bottom-up, BGR
        rows = np.zeros((h, row_size), dtype=np.uint8)
        rows[:, :w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<10I", 1_000_000 // fps, frame_size * fps, 0,
                       0x10, n, 0, 1, frame_size, w, h) + b"\x00" * 16
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, frame_size, 0)
            + struct.pack("<I", 0) + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(fr)) for fr in f))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI bytes -> ((n, H, W, 3) uint8 RGB frames, fps).
    Only BI_RGB 24-bit 'vids' streams decode; compressed codecs need
    libraries absent here and stay env-gated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    buf = bytes(payload)

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body_at = pos + 8
            yield tag, body_at, size
            pos = body_at + size + (size & 1)

    width = height = nsay = 0
    usec_per_frame = 100_000
    frames: list = []
    bitcount = compression = None

    def scan(start: int, end: int) -> None:
        nonlocal width, height, usec_per_frame, bitcount, compression
        for tag, at, size in walk(start, end):
            if tag == b"LIST":
                scan(at + 4, at + size)
            elif tag == b"avih":
                usec_per_frame, = struct.unpack_from("<I", buf, at)
                width, height = struct.unpack_from("<II", buf, at + 32)
            elif tag == b"strf" and bitcount is None:
                _, bw, bh, _, bitcount, compression = struct.unpack_from(
                    "<IiiHHI", buf, at)
            elif tag in (b"00db", b"00dc"):
                frames.append((at, size))

    scan(12, len(buf))
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB AVI supported "
            f"(bitcount={bitcount}, compression={compression})")
    row_size = (width * 3 + 3) & ~3
    out = np.zeros((len(frames), height, width, 3), dtype=np.uint8)
    for i, (at, size) in enumerate(frames):
        if size < row_size * height:
            raise ValueError(f"frame {i} truncated")
        rows = np.frombuffer(buf, dtype=np.uint8, count=row_size * height,
                             offset=at).reshape(height, row_size)
        bgr = rows[:, :width * 3].reshape(height, width, 3)
        out[i] = bgr[::-1, :, ::-1]                  # top-down, RGB
    fps = max(1, round(1_000_000 / max(1, usec_per_frame)))
    return out, fps


# ---------------------------------------------------------------------------
# Kernel-signature adapters
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the magic bytes and decode to (H, W, C) uint8 pixels.
    Formats needing absent third-party libs stay env-gated."""
    if payload is None:
        raise ValueError("empty payload")
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "unsupported image format (stdlib codecs handle BMP and PNG "
        "images, 16-bit PCM WAV audio via audio_decoder, and "
        "uncompressed AVI video via video_decoder; JPEG and "
        "compressed video codecs need libraries absent in this "
        "environment)")


def image_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """REAL decode+featurize with the :func:`fake_decoder` signature:
    bytes -> pixels -> normalized ``dim``-bin luminance histogram."""
    px = decode_image(payload).astype(np.float32)
    gray = px[..., :3].mean(axis=-1) if px.shape[-1] >= 3 else px[..., 0]
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    return (hist / max(1, gray.size)).astype(np.float32)


def image_resizer(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize with the :func:`fake_resizer` signature:
    nearest-neighbor resample, re-encoded in the input's format."""
    px = decode_image(payload)
    h, w = px.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    resized = px[rows][:, cols]
    if payload[:2] == b"BM":
        return encode_bmp(resized[:, :, :3])
    return encode_png(resized)


def audio_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """REAL audio decode+featurize with the :func:`fake_decoder`
    signature: WAV bytes -> PCM samples -> [rms, band_1..band_{dim-1}]
    where the bands are the mean |rfft| magnitude of the mono mix in
    ``dim - 1`` equal-width frequency bands, normalized to sum to 1 —
    a deterministic spectral envelope (no windowing/mel warping;
    those belong to a real featurizer behind the same signature)."""
    samples, _rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(np.square(mono)))) if mono.size else 0.0
    mag = np.abs(np.fft.rfft(mono))[1:]          # drop DC
    bands = np.zeros(dim - 1, dtype=np.float64)
    if mag.size:
        for i, chunk in enumerate(np.array_split(mag, dim - 1)):
            bands[i] = chunk.mean() if chunk.size else 0.0
        total = bands.sum()
        if total > 0:
            bands /= total
    return np.concatenate([[rms], bands]).astype(np.float32)


def video_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """REAL video decode+featurize with the :func:`fake_decoder`
    signature: AVI bytes -> frames -> [motion, band_1..band_{dim-1}]
    where motion is the mean absolute inter-frame luminance delta
    (0..1) and the bands are the normalized luminance histogram over
    all frames — a deterministic spatiotemporal envelope mirroring
    :func:`audio_decoder`'s [rms, spectrum] shape."""
    frames, _fps = decode_avi(payload)
    gray = frames.astype(np.float32).mean(axis=-1)        # (n, H, W)
    if gray.shape[0] >= 2:
        motion = float(np.abs(np.diff(gray, axis=0)).mean() / 255.0)
    else:
        motion = 0.0
    hist, _ = np.histogram(gray, bins=dim - 1, range=(0.0, 256.0))
    total = hist.sum()
    bands = (hist / total if total else hist).astype(np.float32)
    return np.concatenate([[motion], bands]).astype(np.float32)


def video_resizer(payload: bytes, width: int, height: int) -> bytes:
    """REAL spatial resize behind the resize kernel: nearest-neighbor
    resample of every frame, re-encoded as uncompressed AVI at the
    source frame rate."""
    frames, fps = decode_avi(payload)
    n, h, w, _ = frames.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_avi(frames[:, rows][:, :, cols], fps=fps)


def video_frame_extractor(payload: bytes,
                          every_ms: int = 1000) -> list:
    """Sample frames every ``every_ms`` -> [(ts_ms, bmp_bytes), ...].
    Each sampled frame re-encodes as BMP so the IMAGE kernels
    (:func:`image_decoder` / :func:`image_resizer`) compose directly
    downstream of video frame sampling."""
    frames, fps = decode_avi(payload)
    step_ms = 1000.0 / fps
    out = []
    next_ts = 0.0
    for i in range(frames.shape[0]):
        ts = i * step_ms
        if ts + 1e-9 >= next_ts:
            out.append((int(round(ts)), encode_bmp(frames[i])))
            next_ts += every_ms
    return out


def audio_resampler(payload: bytes, width: int, height: int) -> bytes:
    """REAL audio resample behind the resize kernel's
    ``(payload, width, height)`` slot: ``width`` is the target sample
    rate in Hz (``height`` is ignored — kept for signature parity with
    :func:`image_resizer` so ``resize_media`` drives either medium).
    Linear-interpolation resample per channel, re-encoded as 16-bit
    PCM WAV at the new rate."""
    samples, rate = decode_wav(payload)
    if width == rate or samples.shape[0] < 2:
        return bytes(payload)
    n_in = samples.shape[0]
    n_out = max(1, int(round(n_in * width / rate)))
    t_in = np.arange(n_in, dtype=np.float64) / rate
    t_out = np.arange(n_out, dtype=np.float64) / width
    out = np.stack([np.interp(t_out, t_in, samples[:, c])
                    for c in range(samples.shape[1])], axis=1)
    return encode_wav(out.astype(np.float32), sample_rate=width)
