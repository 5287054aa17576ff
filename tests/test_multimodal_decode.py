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


def make_jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    """Minimal structurally-valid JPEG marker stream (stdlib only):
    SOI + JFIF APP0 + SOF0 (or SOF2 when progressive) + SOS + EOI.
    Dimension parsers only need the header segments."""
    app0_body = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(app0_body)) + app0_body
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof_body = (
        b"\x08"  # precision
        + struct.pack(">HH", height, width)
        + b"\x03"  # 3 components
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    sof = sof_marker + struct.pack(">H", 2 + len(sof_body)) + sof_body
    sos_body = b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"
    sos = b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body
    return b"\xff\xd8" + app0 + sof + sos + b"\xff\xd9"


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


def test_decode_image_pillow_branch(monkeypatch):
    """The Pillow tier's plumbing (import, Image.open on a BytesIO,
    context-managed width/height read) must execute and win over the
    fallback tiers. Pillow isn't shipped in this container, so inject
    a minimal fake PIL via sys.modules — when a real Pillow is
    present the injection still overrides it, so the test is
    deterministic in every environment."""
    import sys
    import types

    opened = []

    class _FakeImage:
        width, height = 123, 45

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    def _open(fobj):
        opened.append(fobj.read(8))
        return _FakeImage()

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = _open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    png = make_png(7, 2)
    assert _decode_image(png) == (123, 45)  # Pillow tier won, not IHDR
    assert opened and opened[0] == png[:8]  # got the payload as a stream


def test_decode_image_real_jpeg_header():
    """A structurally-valid JPEG decodes to its true SOF dimensions
    via the dependency-free segment walk — baseline and progressive."""
    assert _decode_image(make_jpeg(31, 17)) == (31, 17)
    assert _decode_image(make_jpeg(1920, 1080, progressive=True)) == (1920, 1080)


def test_jpeg_walker_rejects_non_jpeg_and_truncated():
    from parquet_stream_writer_spark.operators.multimodal import _jpeg_dimensions

    assert _jpeg_dimensions(b"plain text payload") is None
    assert _jpeg_dimensions(b"\xff\xd8\xff") is None  # truncated after SOI
    jpeg = make_jpeg(31, 17)
    sof_at = jpeg.index(b"\xff\xc0")
    assert _jpeg_dimensions(jpeg[: sof_at + 4]) is None  # cut mid-SOF
    # SOS before any SOF: no dimensions, walker must stop (not scan
    # entropy-coded bytes for false markers)
    no_sof = jpeg[:sof_at] + jpeg[jpeg.index(b"\xff\xda") :]
    assert _jpeg_dimensions(no_sof) is None


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


def test_decode_audio_sniff_off_forces_raw_pcm():
    """The RIFF/WAVE magic is pure ASCII, so a *text* document can
    collide with it. With sniffing disabled (the corpus query's mode)
    such a payload must decode byte-for-byte as raw PCM — the
    interpretation the ascii() oracle uses — not as a WAV container."""
    trap = b"RIFFxxxxWAVE and then ordinary prose"
    assert _decode_audio(trap, sniff_containers=False).tolist() == list(trap)
    # sanity: with sniffing ON the same bytes take the container path
    # (and fail WAV parsing — proving the two modes actually diverge)
    with pytest.raises(Exception):
        _decode_audio(trap)


def test_image_meta_real_png_through_spark(spark):
    """End-to-end: REAL PNG bytes ride a BinaryType column through
    Arrow into the mapInPandas kernel and come back with their true
    dimensions — the production path, not the corpus stand-in."""
    from parquet_stream_writer_spark.operators.multimodal import image_meta

    rows = [
        (1, make_png(5, 3)),
        (2, make_png(640, 480)),
        (3, b"not an image"),
        (4, make_jpeg(800, 600)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_meta(docs).collect()}
    assert (out[1]["width"], out[1]["height"]) == (5, 3)
    assert (out[2]["width"], out[2]["height"]) == (640, 480)
    assert out[2]["n_pixels"] == 640 * 480
    n = len(b"not an image")
    assert (out[3]["width"], out[3]["height"]) == (16 + n % 64, 16 + (n // 64) % 64)
    assert (out[4]["width"], out[4]["height"]) == (800, 600)


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


def test_frame_hashes_non_ascii_matches_blob_oracle(spark):
    """Frame checksums are computed over PAYLOAD BYTES, not characters,
    and the DuckDB oracle's hex-slicing formula reproduces them exactly
    on a non-ASCII, multi-frame corpus (ADVICE r5: the old VARCHAR
    substr oracle was only coincidentally right on pure ASCII)."""
    import duckdb

    from parquet_stream_writer_spark.operators.multimodal import (
        _FRAME_LEN,
        _FRAME_STRIDE,
        frame_hashes,
    )

    texts = [
        "héllo wörld × " * 40,           # 2-byte UTF-8 seqs straddle frames
        "日本語のテキスト" * 80,            # 3-byte seqs, > 1 frame stride
        "plain ascii filler " * 30,
        "🎥" * 200,                       # 4-byte seqs
    ]
    rows = [(i, t.encode("utf-8")) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["h"]) for r in frame_hashes(docs).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, payload BLOB)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t.encode("utf-8")])
    want = {
        tuple(r)
        for r in con.sql(
            f"""
            WITH doc AS (
              SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS n
              FROM t
            ),
            idx AS (
              SELECT unnest(generate_series(
                0, (SELECT CAST(max(n) / {_FRAME_STRIDE} AS BIGINT) FROM doc))) AS i
            )
            SELECT DISTINCT doc_id,
                   md5(substr(hx, i * {2 * _FRAME_STRIDE} + 1, {2 * _FRAME_LEN}))
            FROM doc CROSS JOIN idx
            WHERE i * {_FRAME_STRIDE} < n
            """
        ).fetchall()
    }
    assert got == want
    # multi-frame coverage: every doc long enough has > 1 frame
    assert len({h for d, h in got if d == 1}) > 1
