"""Multimodal-column plumbing: opaque binary payloads + typed metadata
processed by Arrow-batched Python kernels (``mapInPandas``).

The driver corpus has no real image/audio bytes, so payloads are
derived deterministically from ``documents.text`` (utf-8 bytes). What
is REAL here — and what a production pipeline reuses unchanged — is
the Spark-side shape: binary column handling, Arrow batch transfer,
kernel signature, schema declaration, and partition-parallel
execution. The actual codec call is isolated in ``_decode_image``,
which uses Pillow when importable and otherwise a clearly-marked
deterministic stand-in (this container ships no image libs).

Both queries are still oracle-checkable because the stand-in metadata
is pure arithmetic on byte length + md5 — computable in SQL. A real
deployment would swap ``_decode_image`` and drop to the rows-only
check, changing nothing else.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.operators.dedup import _hex_to_int_sql
from parquet_stream_writer_spark.sources import load_table, scan_parallel

#: Synthetic video framing: frame payload size / stride in bytes.
_FRAME_LEN = 64
_FRAME_STRIDE = 256


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: JPEG frame-header (SOFn) markers that carry image dimensions —
#: every SOF except DHT(C4)/DAC(CC)/RST(D0-D7) per ITU T.81 §B.2.2.
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def _jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG byte stream, or None.

    Dependency-free segment walk per ITU T.81: after the FFD8 SOI,
    each segment is FF <marker> <len:2> <body>; the first SOFn body is
    ``precision:1 height:2 width:2 ...``. Stops at SOS (entropy-coded
    data follows — a SOF after that would be a second image)."""
    if payload[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:  # resync (padding bytes are legal)
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            body = payload[i + 4 : i + 2 + seg_len]
            if len(body) < 5:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            return (w, h) if w and h else None
        if marker == 0xDA:  # SOS — no dimensions found before the scan
            return None
        i += 2 + seg_len
    return None


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Decode (width, height) from an image payload.

    Four tiers, most capable first:

    1. Pillow when importable (any format Pillow reads);
    2. a dependency-free PNG IHDR parse (width/height live at fixed
       offsets 16..24 of every valid PNG) — REAL metadata decode for
       the most common training-corpus format, even in containers
       without image libs;
    3. a dependency-free JPEG SOF0/SOF2 segment walk
       (:func:`_jpeg_dimensions`) — same guarantee for the other
       dominant corpus format;
    4. a deterministic stand-in derived from the byte length (STUB —
       for the driver corpus, whose payloads are text bytes; the
       arithmetic is mirrored in the SQL oracle).
    """
    try:
        import io

        from PIL import Image  # type: ignore

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height
    except Exception:
        pass
    if payload[:8] == _PNG_MAGIC and len(payload) >= 24:
        import struct

        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    jpeg = _jpeg_dimensions(payload)
    if jpeg is not None:
        return jpeg
    n = len(payload)
    return 16 + n % 64, 16 + (n // 64) % 64


def image_meta(docs: DataFrame) -> DataFrame:
    """Image-metadata kernel over any ``(doc_id long, payload binary)``
    DataFrame — the payload-level entry point a production caller uses
    with real image bytes (the decode tiers in :func:`_decode_image`
    handle Pillow-readable formats and raw PNG headers).

    The kernel receives Arrow-backed pandas batches (bytes objects),
    decodes, and emits a typed metadata frame. Partition-parallel, no
    driver round-trip.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    out = docs.mapInPandas(
        kernel, schema="doc_id long, n_bytes long, width int, height int, checksum string"
    )
    return out.withColumn("n_pixels", (F.col("width") * F.col("height")).cast("long"))


def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document image metadata extraction over a binary column
    (the corpus query: text bytes standing in for image payloads;
    :func:`image_meta` is the payload-level operator)."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return image_meta(docs)


ORACLE_MULTIMODAL_IMAGE_META = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(16 + octet_length(encode(text)) % 64 AS INTEGER)          AS width,
       CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER)  AS height,
       md5(text) AS checksum,
       CAST((16 + octet_length(encode(text)) % 64)
          * (16 + (octet_length(encode(text)) // 64) % 64) AS BIGINT) AS n_pixels
FROM documents
"""


def frame_sample(docs: DataFrame) -> DataFrame:
    """Frame-sampling kernel over any ``(doc_id long, payload binary)``
    DataFrame: ``_FRAME_LEN``-byte frames every ``_FRAME_STRIDE``
    bytes, one output row per frame — the explode-shaped template for
    real frame extraction (one input row → many output rows through
    ``mapInPandas``)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, idxs, sizes, offs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                i = 0
                while i * _FRAME_STRIDE < n:
                    off = i * _FRAME_STRIDE
                    frame = payload[off : off + _FRAME_LEN]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
                    offs.append(off)
                    i += 1
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes, "offset": offs}
            )

    frames = docs.mapInPandas(
        kernel, schema="doc_id long, frame_idx int, frame_bytes int, offset long"
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_bytes").alias("total_frame_bytes"),
        F.max("offset").alias("last_offset"),
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document frame-sampling summary over the corpus stand-in
    payloads (:func:`frame_sample` is the payload-level operator)."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return frame_sample(docs)


ORACLE_MULTIMODAL_FRAME_SAMPLE = f"""
WITH sized AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
),
-- DuckDB 1.0 can't laterally correlate generate_series, so cross-join
-- a frame-index domain derived from the LARGEST payload (same
-- derived-bound convention as the frame-dedup oracle) and filter.
idx AS (
  SELECT unnest(generate_series(
    0, (SELECT CAST(max(n) / {_FRAME_STRIDE} AS BIGINT) FROM sized))) AS i
),
frames AS (
  SELECT doc_id, i AS frame_idx,
         least({_FRAME_LEN}, n - i * {_FRAME_STRIDE}) AS frame_bytes,
         i * {_FRAME_STRIDE} AS "offset"
  FROM sized CROSS JOIN idx
  WHERE i * {_FRAME_STRIDE} < n
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(frame_bytes) AS BIGINT) AS total_frame_bytes,
       max("offset") AS last_offset
FROM frames GROUP BY doc_id
"""


QUERIES = {
    "multimodal_image_meta": multimodal_image_meta,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLE = {
    "multimodal_image_meta": ORACLE_MULTIMODAL_IMAGE_META,
    "multimodal_frame_sample": ORACLE_MULTIMODAL_FRAME_SAMPLE,
}


#: Synthetic audio framing: samples per analysis window.
_AUDIO_FRAME = 32


def _decode_audio(payload: bytes, sniff_containers: bool = True):
    """Unsigned-8-bit sample array from an audio payload.

    A RIFF/WAVE container takes the REAL decode path — stdlib
    ``wave`` parsing, no third-party codec needed — with 16-bit PCM
    rescaled to the unsigned-8-bit domain the feature math expects.
    Any other payload (the driver corpus ships text bytes) is
    interpreted as raw 8-bit PCM, which the SQL oracle reproduces
    via ``ascii()``.

    ``sniff_containers=False`` forces the raw-PCM interpretation: the
    RIFF/WAVE magic is pure ASCII, so a *text* payload that happens to
    start with ``RIFF....WAVE`` would otherwise take the WAV path and
    diverge from an ``ascii()``-based oracle. Callers that KNOW the
    payloads are raw samples (the corpus query) disable sniffing."""
    import numpy as np

    if sniff_containers and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:  # 8-bit WAV PCM is already unsigned
            return np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        if width == 2:  # 16-bit signed -> unsigned 8-bit
            s16 = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            return (s16 // 256) + 128
        raise NotImplementedError(f"unsupported WAV sample width: {width}")
    return np.frombuffer(payload, dtype=np.uint8).astype(np.int64)


def audio_features(docs: DataFrame, sniff_containers: bool = True) -> DataFrame:
    """Audio-feature kernel over any ``(doc_id long, payload binary)``
    DataFrame: decode to unsigned-8-bit samples (:func:`_decode_audio`
    — real stdlib WAV parsing for RIFF/WAVE payloads, raw 8-bit PCM
    interpretation otherwise), frame into ``_AUDIO_FRAME``-sample
    windows, and compute per-frame energy / peak / sample count with a
    vectorized numpy kernel (the spectrogram-pipeline shape; swap in a
    codec + FFT in production — the Spark plumbing is unchanged).

    ``sniff_containers=False`` treats every payload as raw 8-bit PCM
    (see :func:`_decode_audio`)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, idxs, ns, energies, peaks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = _decode_audio(payload, sniff_containers)
                for f in range(0, len(samples), _AUDIO_FRAME):
                    frame = samples[f : f + _AUDIO_FRAME]
                    ids.append(doc_id)
                    idxs.append(f // _AUDIO_FRAME)
                    ns.append(len(frame))
                    energies.append(int((frame * frame).sum()))
                    peaks.append(int(frame.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_samples": ns,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return docs.mapInPandas(
        kernel,
        schema="doc_id long, frame_idx int, n_samples int, energy long, peak int",
    )


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio features over the corpus stand-in payloads
    (ASCII text bytes == 8-bit PCM samples, exactly reproducible by
    the oracle's ``ascii()``; :func:`audio_features` is the
    payload-level operator). Container sniffing is OFF here: the
    corpus payloads are text, and a document that happened to start
    with ``RIFF....WAVE`` must not take the WAV decode path the
    ``ascii()`` oracle can't follow."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return audio_features(docs, sniff_containers=False)


# The samples are UTF-8 BYTES (Spark casts text→binary; one sample
# per byte), NOT codepoints: an ascii()-per-character oracle diverges
# on any non-ASCII document (multi-byte chars under-count samples and
# yield >255 codepoint "samples").  Walk the hex expansion of the
# UTF-8 encoding instead — byte i is hex pair substr(hx, 2i+1, 2),
# decoded with the shared instr-alphabet hex→int convention.
ORACLE_MULTIMODAL_AUDIO_FEATURES = f"""
WITH doc AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
idx AS (
  SELECT unnest(generate_series(0, (SELECT max(n) - 1 FROM doc))) AS i
),
samples AS (
  SELECT doc_id, i AS pos0,
         {_hex_to_int_sql("substr(hx, i * 2 + 1, 2)", 2)} AS byte
  FROM doc CROSS JOIN idx
  WHERE i < n
)
SELECT doc_id,
       CAST(pos0 // {_AUDIO_FRAME} AS INTEGER) AS frame_idx,
       CAST(count(*) AS INTEGER)               AS n_samples,
       CAST(sum(byte * byte) AS BIGINT)        AS energy,
       CAST(max(byte) AS INTEGER)              AS peak
FROM samples
GROUP BY doc_id, pos0 // {_AUDIO_FRAME}
"""


QUERIES["multimodal_audio_features"] = multimodal_audio_features
ORACLE["multimodal_audio_features"] = ORACLE_MULTIMODAL_AUDIO_FEATURES


# ---------------------------------------------------------------------------
# WebDataset-style shard manifest (training-data layout planning)
# ---------------------------------------------------------------------------

#: Target shard payload size in bytes (tiny for the test corpus; a
#: real pipeline uses ~100MB-1GB).
_SHARD_BYTES = 4096


def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan the WebDataset-style shard layout for a multimodal corpus:
    samples are laid out in doc_id order on a byte axis and a sample
    belongs to the shard where it starts (``floor(offset / target)``)
    — the manifest every large-scale training-data writer produces
    before cutting tar shards. Reports per shard: sample count, bytes,
    id range — the dataloader's index.

    Scale shape: the running byte offset is the same bucketed two-pass
    prefix sum as ``text_pack_sequences``/``sample_global_shuffle``
    (fixed 256-bucket totals → bucket offsets from a 256-row window →
    per-bucket partitioned cumsum) — no corpus-wide single-partition
    window; payload sizes are a map-side expression over the binary
    column."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("long").alias("nbytes"),
    )
    nb = 256
    n = sized.groupBy().agg((F.max("doc_id") + 1).alias("n_docs"))
    bucketed = sized.crossJoin(F.broadcast(n)).withColumn(
        "b",
        F.least(
            F.lit(nb - 1), F.floor(F.col("doc_id") * nb / F.col("n_docs"))
        ).cast("int"),
    )
    per_bucket = bucketed.groupBy("b").agg(F.sum("nbytes").alias("byte_sum"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "b", F.coalesce(F.sum("byte_sum").over(wo), F.lit(0)).alias("offset")
    )
    wb = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        bucketed.join(F.broadcast(offsets), "b")
        .withColumn("cum", F.col("offset") + F.sum("nbytes").over(wb))
        .withColumn(
            "shard_id",
            F.floor((F.col("cum") - F.col("nbytes")) / _SHARD_BYTES).cast("long"),
        )
    )
    return placed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("nbytes").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_MULTIMODAL_SHARD_MANIFEST = f"""
WITH sized AS (
  -- encode(), not CAST(text AS BLOB): the cast ERRORS on non-ASCII
  -- text in DuckDB, encode() is the UTF-8-byte conversion (matches
  -- Spark's cast(text as binary) on every corpus).
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
  FROM documents
),
placed AS (
  SELECT doc_id, nbytes,
         sum(nbytes) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM sized
)
SELECT CAST(floor((cum - nbytes) / {_SHARD_BYTES}) AS BIGINT) AS shard_id,
       count(*) AS n_samples,
       CAST(sum(nbytes) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM placed GROUP BY 1
"""


QUERIES["multimodal_shard_manifest"] = multimodal_shard_manifest
ORACLE["multimodal_shard_manifest"] = ORACLE_MULTIMODAL_SHARD_MANIFEST


# ---------------------------------------------------------------------------
# Frame-checksum near-duplicate detection
# ---------------------------------------------------------------------------

def frame_hashes(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, frame checksum) over any ``(doc_id long,
    payload binary)`` DataFrame — ``_FRAME_LEN``-byte frames every
    ``_FRAME_STRIDE`` bytes, hashed in the same Arrow-batched Python
    kernel lane as the other payload operators (real video frame
    hashing needs a codec, which lives Python-side).

    The checksum is md5 over the frame's UPPERCASE-HEX encoding, not
    its raw bytes: the oracle engine (DuckDB v1.0) can neither slice
    nor md5 a BLOB, but ``md5(substr(hex(blob), off*2+1, len*2))`` is
    byte-exact in both engines regardless of payload encoding — the
    earlier VARCHAR-substr oracle was only coincidentally right on
    ASCII corpora (ADVICE r5)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, hs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                i = 0
                while i * _FRAME_STRIDE < n:
                    off = i * _FRAME_STRIDE
                    ids.append(doc_id)
                    hs.append(
                        hashlib.md5(
                            payload[off : off + _FRAME_LEN].hex().upper().encode()
                        ).hexdigest()
                    )
                    i += 1
            yield pd.DataFrame({"doc_id": ids, "h": hs})

    return docs.mapInPandas(kernel, schema="doc_id long, h string").distinct()


def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate payload pairs by shared frame checksums — the
    video/asset analogue of shingle dedup: two payloads sharing any
    ``_FRAME_LEN``-byte frame at the sampling grid are reported with
    the shared-frame count and the overlap fraction of the smaller
    payload.

    Candidate generation is an inverted-index self-join on the frame
    hash (hash-equi, bucket-local — the same shape that keeps
    MinHash-LSH off all-pairs), so cost scales with frames per hash
    bucket, not corpus².  At 100 TB the frame hash is the partition
    key and only colliding buckets meet.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    # Optimization r18 (guide §5): the frame-hash relation fans out to
    # three consumers (sizes + both self-join sides) — without
    # materialization each re-ran the payload decode + hashing pass.
    # One lazy localCheckpoint = one hashing pass over the payloads.
    fh = frame_hashes(docs).localCheckpoint(eager=False)
    sizes = fh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    a = fh.alias("a")
    b = fh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_frames").alias("f1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_frames").alias("f2"))
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            "n_shared_frames",
            F.least("f1", "f2").alias("min_frames"),
            F.expr(
                "cast(floor(n_shared_frames / cast(least(f1, f2) as double)"
                " * 10000 + 0.5) as double) / 10000.0"
            ).alias("overlap_frac"),
        )
        .orderBy("d1", "d2")
    )


ORACLE_MULTIMODAL_FRAME_DEDUP = f"""
WITH doc AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
idx AS (
  SELECT unnest(generate_series(
    0, (SELECT CAST(max(n) / {_FRAME_STRIDE} AS BIGINT) FROM doc))) AS i
),
fh AS (
  SELECT DISTINCT doc_id,
         md5(substr(hx, i * {2 * _FRAME_STRIDE} + 1, {2 * _FRAME_LEN})) AS h
  FROM doc CROSS JOIN idx
  WHERE i * {_FRAME_STRIDE} < n
),
sizes AS (SELECT doc_id, count(*) AS n_frames FROM fh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared_frames
  FROM fh a JOIN fh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.d1, p.d2, p.n_shared_frames,
       least(s1.n_frames, s2.n_frames) AS min_frames,
       floor(p.n_shared_frames * 1.0 / least(s1.n_frames, s2.n_frames)
             * 10000 + 0.5) / 10000.0 AS overlap_frac
FROM pairs p
JOIN sizes s1 ON p.d1 = s1.doc_id
JOIN sizes s2 ON p.d2 = s2.doc_id
ORDER BY p.d1, p.d2
"""


QUERIES["multimodal_frame_dedup"] = multimodal_frame_dedup
ORACLE["multimodal_frame_dedup"] = ORACLE_MULTIMODAL_FRAME_DEDUP


# ---------------------------------------------------------------------------
# Scene splitting over frame-checksum sequences
# ---------------------------------------------------------------------------

def multimodal_scene_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene segmentation over each payload's ORDERED frame-checksum
    sequence: a new scene starts whenever the checksum changes between
    consecutive frames (the codec-free stand-in for a visual
    scene-change detector; with a real decoder the checksum column
    becomes a perceptual frame hash and nothing else changes).

    Per doc: frame count, scene count, and the longest scene's length
    in frames — the stats a video-curation pipeline uses to drop
    static clips (one long scene) and strobing ones (scene per frame).

    Shape: the Arrow-batched kernel emits (doc, frame_idx, checksum)
    rows; scenes are gaps-and-islands over a per-doc window (bounded
    by frames-per-doc, partitioned on doc — the natural key), then
    two hash aggregates.  Frame extraction is map-side; nothing is
    quadratic; checksum arithmetic is the hex-slicing formula the
    oracle reproduces byte-exactly.
    """
    import hashlib as _hashlib

    import pandas as pd

    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def kernel(batches):
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                i = 0
                while i * _FRAME_STRIDE < n:
                    off = i * _FRAME_STRIDE
                    ids.append(doc_id)
                    idxs.append(i)
                    hs.append(
                        _hashlib.md5(
                            payload[off : off + _FRAME_LEN].hex().upper().encode()
                        ).hexdigest()
                    )
                    i += 1
            yield pd.DataFrame({"doc_id": ids, "i": idxs, "h": hs})

    frames = docs.mapInPandas(kernel, schema="doc_id long, i long, h string")
    w = Window.partitionBy("doc_id").orderBy("i")
    flagged = frames.withColumn(
        "new_scene",
        F.when(
            F.lag("h").over(w).isNull() | (F.lag("h").over(w) != F.col("h")), 1
        ).otherwise(0),
    )
    scened = flagged.withColumn(
        "scene_idx",
        F.sum("new_scene").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_scene = scened.groupBy("doc_id", "scene_idx").agg(
        F.count(F.lit(1)).alias("scene_len")
    )
    return per_scene.groupBy("doc_id").agg(
        F.sum("scene_len").alias("n_frames"),
        F.max("scene_idx").cast("long").alias("n_scenes"),
        F.max("scene_len").alias("max_scene_len"),
    )


ORACLE_MULTIMODAL_SCENE_SPLIT = f"""
WITH doc AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
idx AS (
  SELECT unnest(generate_series(
    0, (SELECT CAST(max(n) / {_FRAME_STRIDE} AS BIGINT) FROM doc))) AS i
),
frames AS (
  SELECT doc_id, i,
         md5(substr(hx, i * {2 * _FRAME_STRIDE} + 1, {2 * _FRAME_LEN})) AS h
  FROM doc CROSS JOIN idx
  WHERE i * {_FRAME_STRIDE} < n
),
flagged AS (
  SELECT doc_id, i, h,
         CASE WHEN lag(h) OVER w IS NULL OR lag(h) OVER w <> h
              THEN 1 ELSE 0 END AS new_scene
  FROM frames
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
scened AS (
  SELECT doc_id,
         sum(new_scene) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene_idx
  FROM flagged
),
per_scene AS (
  SELECT doc_id, scene_idx, count(*) AS scene_len
  FROM scened GROUP BY doc_id, scene_idx
)
SELECT doc_id,
       CAST(sum(scene_len) AS BIGINT) AS n_frames,
       CAST(max(scene_idx) AS BIGINT) AS n_scenes,
       CAST(max(scene_len) AS BIGINT) AS max_scene_len
FROM per_scene GROUP BY doc_id
"""


QUERIES["multimodal_scene_split"] = multimodal_scene_split
ORACLE["multimodal_scene_split"] = ORACLE_MULTIMODAL_SCENE_SPLIT
