"""Real-payload coverage for the multimodal decode kernels.

The driver corpus carries text bytes, so the query-level oracles only
exercise the deterministic stand-in branches.  These tests feed the
decoders REAL containers — a valid PNG built from stdlib zlib/struct
and a valid WAV built from stdlib wave — so the production branches
(Pillow when importable, the dependency-free PNG IHDR parse, the
stdlib WAV parse) are covered in every environment, and the stub
branch is pinned to the oracle arithmetic it mirrors.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from parquet_stream_writer_spark.operators.multimodal import (
    _decode_audio,
    _decode_image,
)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid RGBA PNG (stdlib only)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    # each scanline: filter byte 0 + width RGBA pixels
    raw = b"".join(b"\x00" + b"\x10\x20\x30\xff" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(samples: bytes, sampwidth: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        w.writeframes(samples)
    return buf.getvalue()


def test_decode_image_real_png_header():
    """A real PNG decodes to its true dimensions — via Pillow when
    importable, else the IHDR parse; both return the same answer, so
    this passes in every environment."""
    assert _decode_image(make_png(5, 3)) == (5, 3)
    assert _decode_image(make_png(640, 480)) == (640, 480)


def test_decode_image_pillow_branch():
    """When Pillow is importable it must agree with the IHDR parse
    (and handle the PNG end-to-end, not just the header)."""
    pytest.importorskip("PIL")
    from PIL import Image

    png = make_png(7, 2)
    with Image.open(io.BytesIO(png)) as im:
        assert (im.width, im.height) == (7, 2)
    assert _decode_image(png) == (7, 2)


def test_decode_image_stub_matches_oracle_arithmetic():
    """Non-image payloads (the driver corpus) must keep the exact
    arithmetic the SQL oracle replicates: 16+n%64 x 16+(n//64)%64."""
    for text in (b"", b"hello world", b"x" * 200, b"y" * 4097):
        n = len(text)
        assert _decode_image(text) == (16 + n % 64, 16 + (n // 64) % 64)


def test_decode_audio_real_wav_8bit():
    samples = bytes([0, 64, 128, 192, 255] * 7)
    out = _decode_audio(make_wav(samples, sampwidth=1))
    assert out.dtype == np.int64
    assert out.tolist() == list(samples)


def test_decode_audio_real_wav_16bit_rescaled():
    s16 = np.array([-32768, -256, 0, 255, 32767], dtype="<i2")
    out = _decode_audio(make_wav(s16.tobytes(), sampwidth=2))
    # signed 16-bit -> unsigned 8-bit domain: (s // 256) + 128
    assert out.tolist() == [(int(v) // 256) + 128 for v in s16]
    assert out.min() >= 0 and out.max() <= 255


def test_decode_audio_raw_bytes_match_oracle_ascii():
    """Text payloads are raw 8-bit PCM: sample value == byte value,
    which the oracle computes as ascii(ch)."""
    text = b"the quick brown fox"
    assert _decode_audio(text).tolist() == list(text)


def test_image_meta_real_png_through_spark(spark):
    """End-to-end: REAL PNG bytes ride a BinaryType column through
    Arrow into the mapInPandas kernel and come back with their true
    dimensions — the production path, not the corpus stand-in."""
    from parquet_stream_writer_spark.operators.multimodal import image_meta

    rows = [(1, make_png(5, 3)), (2, make_png(640, 480)), (3, b"not an image")]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_meta(docs).collect()}
    assert (out[1]["width"], out[1]["height"]) == (5, 3)
    assert (out[2]["width"], out[2]["height"]) == (640, 480)
    assert out[2]["n_pixels"] == 640 * 480
    n = len(b"not an image")
    assert (out[3]["width"], out[3]["height"]) == (16 + n % 64, 16 + (n // 64) % 64)


def test_audio_features_real_wav_through_spark(spark):
    """End-to-end: a REAL WAV container through the Spark kernel must
    produce the same per-frame energy/peak as direct numpy over the
    samples it encodes."""
    import numpy as np

    from parquet_stream_writer_spark.operators.multimodal import (
        _AUDIO_FRAME,
        audio_features,
    )

    samples = bytes([(i * 7) % 256 for i in range(100)])
    docs = spark.createDataFrame(
        [(1, make_wav(samples, sampwidth=1))], "doc_id long, payload binary"
    )
    got = {r["frame_idx"]: r for r in audio_features(docs).collect()}
    arr = np.frombuffer(samples, dtype=np.uint8).astype(np.int64)
    n_frames = -(-len(arr) // _AUDIO_FRAME)
    assert set(got) == set(range(n_frames))
    for f in range(n_frames):
        frame = arr[f * _AUDIO_FRAME : (f + 1) * _AUDIO_FRAME]
        assert got[f]["energy"] == int((frame * frame).sum())
        assert got[f]["peak"] == int(frame.max())
        assert got[f]["n_samples"] == len(frame)
