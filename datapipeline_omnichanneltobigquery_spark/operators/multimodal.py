"""Multimodal column plumbing: binary payloads + typed metadata, processed
through Arrow-batched Pandas UDFs (SURVEY.md §2.2 extension surface).

Design for 100 TB of images/audio/video:

* the payload is an opaque ``binary`` column riding next to typed metadata
  (modality, format, width/height/duration) — never exploded into rows;
* decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  stages: Arrow moves each partition into Python in columnar batches, the
  UDF works on a whole batch, and partition sizing (``maxPartitionBytes``,
  ``arrow.maxRecordsPerBatch``) bounds executor memory — no per-row pickling;
* PNG is handled with a REAL pure-stdlib codec path: :func:`encode_png` /
  :func:`encode_png_pixels` emit spec-valid bytes, :func:`decode_image`
  parses the IHDR (signature, chunk framing, CRC) — exercised end-to-end
  by the ``multimodal_png_decode`` driver query — and
  :func:`decode_png_pixels` performs the full pixel decode (IDAT inflate +
  all five scanline filters), which powers the real nearest-neighbor
  :func:`resize_image` / :func:`resize_images` stage.  Heavyweight codecs
  (Pillow/ffmpeg/torchaudio) are NOT in this container, so decode of
  non-PNG formats raises ``NotImplementedError``, and
  :func:`fake_decode_meta` remains as the md5-derived stand-in.

The ``attach_payload`` helper manufactures binary columns from text so the
pipeline has bytes to move in this environment; with real data you'd read
``binaryFile`` sources or parquet with BYTE_ARRAY payload columns instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAYLOAD_SCHEMA = (
    "doc_id bigint, modality string, fmt string, payload binary, n_bytes bigint"
)
META_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, width int, height int, ok boolean"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary payload column (utf-8 bytes of the
    text) with modality metadata — the test stand-in for real media bytes."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("modality"),
        F.lit("fake/utf8").alias("fmt"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, gray: int = 0) -> bytes:
    """Encode a real, spec-valid grayscale PNG (8-bit, color type 0) with
    stdlib zlib only — signature, IHDR/IDAT/IEND chunks, correct CRCs.
    This is the pure-Python codec path for manufacturing genuine image bytes
    in environments without Pillow; decode_image round-trips it."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([gray]) * width) * height  # filter byte 0 per row
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode kernel (header level): parses the PNG IHDR —
    signature check, chunk framing, CRC verification, big-endian dimensions —
    in pure Python.  Full-pixel decode of other formats still needs Pillow
    (deployment body: ``PIL.Image.open(io.BytesIO(payload)).size``)."""
    import struct
    import zlib

    if payload[:8] == PNG_MAGIC:
        (length,) = struct.unpack(">I", payload[8:12])
        tag, body = payload[12:16], payload[16 : 16 + length]
        (crc,) = struct.unpack(">I", payload[16 + length : 20 + length])
        if tag != b"IHDR" or zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError("corrupt PNG IHDR")
        width, height = struct.unpack(">II", body[:8])
        return width, height
    raise NotImplementedError("non-PNG codecs not available in this environment")


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive (width, height) from the
    payload's md5 — stable across engines/runs, exercises the full plumbing."""
    import hashlib

    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    return width, height


def extract_meta(payloads: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Arrow-batched: each partition arrives as pandas DataFrame batches; the
    kernel runs per batch (vectorizable), output schema is declared up front
    so Catalyst plans downstream ops without running Python.
    """
    kernel = decode_image if use_real_codec else fake_decode_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [kernel(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "ok": True,
                }
            )

    return payloads.mapInPandas(run, schema=META_SCHEMA)


def decode_png_pixels(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Full-pixel decode of an 8-bit grayscale PNG in pure stdlib: chunk
    walk, IDAT concatenation, zlib inflate, and scanline unfiltering (all
    five filter types per the PNG spec §9).  Returns (width, height, rows).
    Non-PNG or non-gray8 payloads raise — other formats still need a real
    codec library."""
    import struct
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise NotImplementedError("non-PNG codecs not available in this environment")
    pos, width = 8, None
    height, idat = None, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color = struct.unpack(">IIBB", body[:10])
            if bit_depth != 8 or color != 0:
                raise NotImplementedError("only 8-bit grayscale PNGs supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or height is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    if len(raw) != height * (width + 1):
        # fail diagnosably instead of an IndexError mid-unfilter
        raise ValueError(
            f"truncated IDAT: inflated to {len(raw)} bytes, "
            f"expected {height * (width + 1)} for {width}x{height}"
        )
    rows: list[bytes] = []
    prev = bytes(width)
    stride = width + 1
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        f, data = line[0], bytearray(line[1:])
        if f == 1:  # Sub
            for i in range(1, width):
                data[i] = (data[i] + data[i - 1]) & 0xFF
        elif f == 2:  # Up
            for i in range(width):
                data[i] = (data[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(width):
                left = data[i - 1] if i else 0
                data[i] = (data[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(width):
                a = data[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                data[i] = (data[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        prev = bytes(data)
        rows.append(prev)
    return width, height, rows


def encode_png_pixels(rows: list[bytes]) -> bytes:
    """Encode arbitrary 8-bit grayscale pixel rows as a spec-valid PNG
    (filter 0 per row) — the write half of :func:`decode_png_pixels`."""
    import struct
    import zlib

    height, width = len(rows), len(rows[0]) if rows else 0

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize kernel, pure stdlib: full PNG pixel decode →
    nearest-neighbor resample → re-encode.  Deterministic (integer index
    arithmetic, no rounding modes), so resized bytes are reproducible
    across runs and engines."""
    src_w, src_h, rows = decode_png_pixels(payload)
    out_rows = []
    for y in range(height):
        sy = min(src_h - 1, (y * src_h) // height)
        src = rows[sy]
        out_rows.append(bytes(src[min(src_w - 1, (x * src_w) // width)] for x in range(width)))
    return encode_png_pixels(out_rows)


def resize_images(payloads: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize over PNG payload rows: (doc_id, payload) →
    (doc_id, payload, width, height) with the payload replaced by the
    resized PNG bytes — Arrow binary columns in and out, bounded batch
    memory (output rows are width×height, independent of input size)."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [bytes(resize_image(p, width, height)) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return payloads.mapInPandas(run, schema=schema)


def byte_histogram(payloads: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over binary payloads: a 16-bin byte-value histogram
    per document as ``array<bigint>`` — the deterministic stand-in for an
    image/audio feature vector, with the real mapInPandas + numpy plumbing
    (vectorized ``np.bincount`` per payload, Arrow list column out)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // n_bins
        for pdf in batches:
            hists = [
                np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8) // width, minlength=n_bins
                )[:n_bins].tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "hist": hists})

    return payloads.mapInPandas(run, schema="doc_id bigint, hist array<bigint>")


def frame_sample(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over binary payloads: emit one row per sampled offset
    (for video this is the keyframe-stride pattern; here offsets into the
    payload).  Demonstrates the 1→N mapInPandas expansion with bounded
    output batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_off, out_b = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    out_id.append(doc_id)
                    out_off.append(off)
                    out_b.append(int(payload[off]))
            yield pd.DataFrame({"doc_id": out_id, "offset": out_off, "first_byte": out_b})

    return payloads.mapInPandas(run, schema="doc_id bigint, offset bigint, first_byte int")


def attach_png_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture REAL PNG payloads (via :func:`encode_png`) with dimensions
    derived deterministically from the md5 of the text — the genuine-bytes
    counterpart of :func:`attach_payload`.  mapInPandas/Arrow-batched like
    every other kernel here."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["__text"]:
                h = hashlib.md5(text.encode("utf-8")).digest()
                payloads.append(encode_png(1 + h[0] % 64, 1 + h[1] % 64, gray=h[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": "image",
                    "fmt": "image/png",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def attach_png_tile_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture 8×8 REAL PNG payloads whose 64 gray pixels tile the
    text's md5 digest (16 bytes × 4) — the deterministic NON-TRIVIAL
    image fixture for the aHash oracle: because pixel (x, y) is
    md5_byte[(8y + x) mod 16], the expected average-hash is pure md5
    arithmetic a SQL engine can recompute (the solid-gray
    :func:`attach_png_payload` fixture hashes every image to 0, which
    would make an aHash gate trivially green).  8×8 means the grid=8
    sampler reads every pixel exactly once — no resize ambiguity in the
    oracle."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["__text"]:
                tile = hashlib.md5(text.encode("utf-8")).digest() * 4
                payloads.append(
                    encode_png_pixels([tile[y * 8 : (y + 1) * 8] for y in range(8)])
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": "image",
                    "fmt": "image/png",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(run, schema=PAYLOAD_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality: real pure-stdlib WAV (RIFF/PCM) codec
# ---------------------------------------------------------------------------

WAV_MAGIC = b"RIFF"


def encode_wav(samples: bytes, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Encode 8-bit unsigned PCM samples as a spec-valid WAV (RIFF) file in
    pure stdlib — the audio counterpart of :func:`encode_png`."""
    import struct

    byte_rate = sample_rate * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels, 8)

    def chunk(tag: bytes, body: bytes) -> bytes:
        # RIFF chunks are word-aligned: an odd-length body is followed by a
        # zero pad byte that is EXCLUDED from the declared chunk length but
        # included in the enclosing RIFF size — strict readers misparse the
        # next chunk without it (8-bit PCM makes odd data lengths routine).
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    riff_body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", samples)
    return WAV_MAGIC + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav_meta(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a WAV payload's RIFF structure: validates the magic and chunk
    framing, returns (sample_rate, channels, n_samples, duration_s).
    Non-WAV payloads raise — mirroring :func:`decode_image`'s contract."""
    import struct

    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise NotImplementedError("non-WAV audio codecs not available in this environment")
    pos = 12
    rate = channels = bits = None
    n_data = 0
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            n_data = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or channels is None:
        raise ValueError("WAV missing fmt chunk")
    n_samples = n_data // (channels * (bits // 8))
    return rate, channels, n_samples, n_samples / rate


def attach_wav_payload(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 16000
) -> DataFrame:
    """Manufacture REAL WAV payloads: each document's utf-8 bytes become its
    8-bit PCM sample stream (deterministic, variable-duration audio)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(text.encode("utf-8"), sample_rate) for text in pdf["__text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": "audio",
                    "fmt": "audio/wav",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_audio_meta(payloads: DataFrame) -> DataFrame:
    """mapInPandas audio metadata extraction: parse each WAV payload's RIFF
    header → (doc_id, sample_rate, channels, n_samples, duration_s)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_wav_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [m[0] for m in metas],
                    "channels": [m[1] for m in metas],
                    "n_samples": [m[2] for m in metas],
                    "duration_s": [m[3] for m in metas],
                }
            )

    return payloads.mapInPandas(
        run,
        schema="doc_id bigint, sample_rate int, channels int, n_samples bigint, duration_s double",
    )


# ---------------------------------------------------------------------------
# Video modality: minimal frame container over real PNG frames
# ---------------------------------------------------------------------------

VID_MAGIC = b"SGV1"  # length-prefixed PNG frame container


def encode_video(frames: list[bytes]) -> bytes:
    """Pack PNG frame payloads into a minimal length-prefixed container —
    magic, frame count, then (u32 length, bytes) per frame.  A stand-in
    container whose FRAMES are spec-valid PNGs, so the decode side exercises
    real chunk parsing end-to-end (a real deployment swaps this for
    ffmpeg/pyav demuxing; the Spark-side plumbing is identical)."""
    import struct

    out = [VID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_video_frames(payload: bytes) -> list[bytes]:
    """Unpack the frame container; validates magic and length framing."""
    import struct

    if payload[:4] != VID_MAGIC:
        raise NotImplementedError("non-container video codecs not available here")
    (n,) = struct.unpack("<I", payload[4:8])
    frames, pos = [], 8
    for _ in range(n):
        (length,) = struct.unpack("<I", payload[pos : pos + 4])
        frames.append(payload[pos + 4 : pos + 4 + length])
        pos += 4 + length
    if pos != len(payload):
        raise ValueError("trailing bytes in video container")
    return frames


def attach_video_payload(
    df: DataFrame, id_col: str, text_col: str, max_frames: int = 5
) -> DataFrame:
    """Manufacture REAL video payloads: 1..max_frames PNG frames per doc
    (count and per-frame dimensions md5-derived from the text)."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["__text"]:
                h = hashlib.md5(text.encode("utf-8")).digest()
                n_frames = 1 + h[3] % max_frames
                frames = [
                    encode_png(1 + h[0] % 32, 1 + h[1] % 32, gray=(h[2] + i) & 0xFF)
                    for i in range(n_frames)
                ]
                payloads.append(encode_video(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": "video",
                    "fmt": "video/x-sgv1",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return src.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def sample_video_frames(payloads: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling over video payloads: demux the container, keep every
    ``every_n``-th frame, decode each kept frame's REAL PNG header — the
    1→N expansion stage of a video-pretraining pipeline.  Output one row
    per sampled frame: (doc_id, frame_idx, width, height, frame_bytes).
    Batch memory is bounded: each output row carries one frame, not the
    whole video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, nb = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video_frames(payload)
                for i in range(0, len(frames), every_n):
                    w, h = decode_image(frames[i])
                    ids.append(doc_id)
                    idxs.append(i)
                    ws.append(w)
                    hs.append(h)
                    nb.append(len(frames[i]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "width": ws, "height": hs,
                 "frame_bytes": nb}
            )

    return payloads.mapInPandas(
        run,
        schema="doc_id bigint, frame_idx int, width int, height int, frame_bytes bigint",
    )


def _wav_pcm(payload: bytes) -> tuple[int, int, bytes]:
    """(sample_rate, channels, raw 8-bit PCM bytes) of a WAV payload —
    the data-plane counterpart of :func:`decode_wav_meta`."""
    import struct

    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise NotImplementedError("non-WAV audio codecs not available in this environment")
    pos = 12
    rate = channels = bits = None
    data = b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # odd chunks carry a pad byte
    if rate is None:
        raise ValueError("WAV payload missing fmt chunk")
    if bits != 8:
        # mirror decode_wav_meta's strictness: silently treating 16-bit
        # samples as 8-bit frames would emit corrupted audio, not raise
        raise NotImplementedError(
            f"only 8-bit PCM WAV is decodable in this environment (got {bits}-bit)"
        )
    return rate, channels, data


def decimate_audio(payloads: DataFrame, factor: int) -> DataFrame:
    """Audio downsampling by integer decimation: keep every ``factor``-th
    PCM frame and re-encode at sample_rate/factor — (doc_id, payload) with
    spec-valid WAV output.  A mapInPandas stage like every codec here: the
    payload column never leaves the executor, one Arrow batch in, one out;
    at 100 TB the decimation is embarrassingly parallel and shuffle-free.
    (Nearest-sample decimation, not filtered resampling — the honest
    stdlib-only scope, mirroring the NN-resize choice for images.)"""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                rate, ch, data = _wav_pcm(bytes(p))
                frames = [data[i : i + ch] for i in range(0, len(data), ch)]
                kept = b"".join(frames[::factor])
                out.append(encode_wav(kept, max(1, rate // factor), ch))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return payloads.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, payload binary"
    )


def crop_image(payload: bytes, width: int, height: int) -> bytes:
    """Center-crop a gray8 PNG to (width, height), clamped to the source
    dims — the standard vision-preprocessing companion to
    :func:`resize_image`; same pure-stdlib decode/encode, deterministic
    integer offsets."""
    src_w, src_h, rows = decode_png_pixels(payload)
    w, h = min(width, src_w), min(height, src_h)
    x0, y0 = (src_w - w) // 2, (src_h - h) // 2
    return encode_png_pixels([rows[y0 + y][x0 : x0 + w] for y in range(h)])


def flip_image(payload: bytes) -> bytes:
    """Horizontal flip of a gray8 PNG — the cheapest augmentation; an
    involution (flip ∘ flip = identity), which the test pins."""
    _, _, rows = decode_png_pixels(payload)
    return encode_png_pixels([r[::-1] for r in rows])


_IMAGE_TRANSFORMS = {
    "crop": crop_image,
    "flip": lambda p, *_: flip_image(p),
    "resize": resize_image,
}


def transform_images(
    payloads: DataFrame, ops: list[tuple[str, int, int]]
) -> DataFrame:
    """Composable augmentation stage: apply a PIPELINE of named transforms
    (``[("crop", w, h), ("flip", 0, 0), ("resize", w, h)]``) to every
    payload row in one ``mapInPandas`` pass — ONE Python crossing for the
    whole pipeline, Arrow binary batches in and out, no per-op stage.
    Unknown op names raise at plan-build time, not inside an executor."""
    import pandas as pd

    for name, _, _ in ops:
        if name not in _IMAGE_TRANSFORMS:
            raise ValueError(f"unknown image transform {name!r}")

    def run(batches):
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                for name, a, b in ops:
                    p = _IMAGE_TRANSFORMS[name](bytes(p), a, b)
                out.append(bytes(p))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def audio_band_energy(payloads: DataFrame, n_frame: int = 256, n_bands: int = 8) -> DataFrame:
    """Spectral band-energy features per audio payload: split the 8-bit PCM
    stream into ``n_frame``-sample frames, DFT each (numpy rfft), average
    |X|² into ``n_bands`` equal frequency bands across frames, and emit one
    feature row — (doc_id, n_frames, band_energy: array<double>).  The
    fingerprint a speech/music/noise classifier or an audio-dedup stage
    consumes; the numpy FFT is the vectorized hot loop, crossed once per
    Arrow batch via mapInPandas (never per-row), channels averaged to mono
    first.  Frames are truncated to whole multiples of ``n_frame`` — a
    payload shorter than one frame yields zero frames and NULL-free zero
    bands.  Deterministic: fixed frame boundaries, fixed band edges, one
    summation order."""
    import numpy as np

    edges = [(b * (n_frame // 2 + 1)) // n_bands for b in range(n_bands + 1)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_out, bands_out = [], []
            for p in pdf["payload"]:
                rate, ch, data = _wav_pcm(bytes(p))
                x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
                if ch > 1:
                    x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
                n = len(x) // n_frame
                if n == 0:
                    n_out.append(0)
                    bands_out.append([0.0] * n_bands)
                    continue
                frames = x[: n * n_frame].reshape(n, n_frame)
                spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                mean_spec = spec.mean(axis=0)
                bands_out.append(
                    [float(mean_spec[edges[b] : edges[b + 1]].sum()) for b in range(n_bands)]
                )
                n_out.append(n)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_frames": n_out, "band_energy": bands_out}
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, n_frames long, band_energy array<double>"
    )


def video_scene_cuts(payloads: DataFrame, threshold: float = 24.0) -> DataFrame:
    """Scene-cut detection over the length-prefixed PNG-frame video
    container: mean absolute pixel difference between consecutive frames,
    flagged where it exceeds ``threshold`` — (doc_id, frame_idx,
    mean_abs_diff, is_cut) for every transition.  The shot-boundary
    primitive a video-dedup or highlight-extraction pipeline keys on.
    One mapInPandas crossing demuxes, decodes (stdlib PNG codec), and
    diffs per payload; frames of differing dimensions count as a hard cut
    (diff = 255).  1→N row expansion like :func:`sample_video_frames`."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, diffs, cuts = [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video_frames(bytes(p))
                prev = None
                for i, fr in enumerate(frames):
                    w, h, rows = decode_png_pixels(fr)
                    cur = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w)
                    if prev is not None:
                        if cur.shape != prev.shape:
                            d = 255.0
                        else:
                            d = float(
                                np.abs(
                                    cur.astype(np.int16) - prev.astype(np.int16)
                                ).mean()
                            )
                        ids.append(did)
                        idxs.append(i)
                        diffs.append(d)
                        cuts.append(d > threshold)
                    prev = cur
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "mean_abs_diff": diffs,
                    "is_cut": cuts,
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, frame_idx long, mean_abs_diff double, is_cut boolean"
    )


# ---------------------------------------------------------------------------
# Image perceptual hashing (average hash) + hamming near-dup pairs — the
# image-modality member of the dedup story: re-encoded/brightness-shifted
# copies of a picture have different BYTES (exact fingerprint dedup misses
# them) but near-identical perceptual hashes.
# ---------------------------------------------------------------------------


def image_ahash(payloads: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) per image: stdlib PNG pixel decode →
    nearest-neighbor sample to a ``grid``×``grid`` patch (the
    :func:`resize_image` integer index arithmetic, no resampling modes)
    → integer mean threshold (strictly-above = 1, so ties are
    deterministic) → one 64-bit fingerprint (grid=8).  All-integer, so
    hashes are bit-reproducible across runs and engines — the classic
    perceptual fingerprint (pHash family; aHash is its
    no-DCT-dependency member).

    (doc_id, payload) → (doc_id, ahash long, mean_px long).  One
    mapInPandas crossing; output rows are constant-size regardless of
    image dimensions, so executor memory is bounded by the batch's
    encoded payload bytes."""
    n_bits = grid * grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, means = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = decode_png_pixels(bytes(p))
                px = []
                for y in range(grid):
                    src = rows[min(h - 1, (y * h) // grid)]
                    px.extend(src[min(w - 1, (x * w) // grid)] for x in range(grid))
                mean = sum(px) // len(px)
                bits = 0
                for i, v in enumerate(px):
                    if v > mean:
                        bits |= 1 << i
                if bits >= 1 << 63:  # wrap to signed 64-bit for LongType
                    bits -= 1 << 64
                ids.append(did)
                hashes.append(bits)
                means.append(mean)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes, "mean_px": means})

    if n_bits > 64:
        raise ValueError(f"grid={grid} needs {n_bits} bits; max 64 (grid<=8)")
    return payloads.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, ahash long, mean_px long"
    )


def image_neardup_pairs(
    payloads: DataFrame, max_dist: int = 6, grid: int = 8
) -> DataFrame:
    """Image near-duplicate pairs at hamming distance ≤ ``max_dist``
    between average-hashes — EXACT recall by the SimHash pigeonhole
    (operators/dedup.py discipline): the 64-bit hash splits into
    ``max_dist + 1`` blocks, and any pair within the radius must agree
    on at least one whole block, so candidates come from equi-joining
    block values — never an all-pairs crossJoin — and verify with one
    ``bit_count(a XOR b)``.

    (doc_id, payload) → (id_a, id_b, hamming), id_a < id_b.  The hash
    table is one row per image (localCheckpointed: both self-join sides
    and the verify read it); candidate volume is bounded by block-bucket
    sizes exactly like SimHash banding."""
    h = image_ahash(payloads, grid).select("doc_id", "ahash").localCheckpoint()
    return hash_neardup_pairs(h, max_dist=max_dist)


def hash_neardup_pairs(h: DataFrame, max_dist: int = 6) -> DataFrame:
    """Pigeonhole hamming join over a (doc_id, ahash) table — the block
    key MUST be a pure function of the block's bits: block 0's shift is 0,
    which leaves the sign bit in place, and Spark's ``%`` follows the
    dividend sign, so a modulo key would split hashes that agree on block
    0 but differ in bit 63 into different buckets (silent recall loss).
    Mask with bitwiseAND instead."""
    import pyspark.sql.functions as F

    n_blocks = max_dist + 1
    width = 64 // n_blocks  # bits per block (last block takes the remainder)

    def block_val(b: int):
        shifted = F.shiftrightunsigned(F.col("ahash"), b * width)
        bits = width if b < n_blocks - 1 else 64 - b * width
        if bits >= 64:  # single-block degenerate case (max_dist=0)
            return shifted
        return shifted.bitwiseAND(F.lit((1 << bits) - 1))

    blocks = F.array(
        *[
            F.struct(F.lit(b).alias("blk"), block_val(b).alias("val"))
            for b in range(n_blocks)
        ]
    )
    keyed = h.select("doc_id", "ahash", F.explode(blocks).alias("b")).select(
        "doc_id", "ahash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("ahash").alias("ha"), "blk", "val"
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("ahash").alias("hb"), "blk", "val"
    )
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.expr("ha ^ hb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_dist)
    )
