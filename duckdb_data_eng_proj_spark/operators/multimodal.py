"""Multimodal columns: opaque binary payloads + Arrow-batched decode.

Design (north-star requirement, BASELINE.json): image/audio/video
content rides in the relational model as an opaque ``binary`` column
plus typed metadata columns. All heavy per-item work (decode, feature
extraction, resize, frame sampling) runs as ``mapInPandas`` over
Arrow batches — the Spark-side plumbing (schema, batch shape,
partition-preserving narrow execution) is real and tested here.

Codec status (round 3, video added round 15): UNCOMPRESSED formats
are decoded for real with pure stdlib — ``decode_image`` parses
24-bpp BMP (struct) and binary PPM, ``decode_audio`` parses RIFF/WAV
(wave module), ``decode_y4m`` parses YUV4MPEG2 video (text header +
raw planar 4:2:0 frames) — and the matching encoders let the pipeline
synthesize genuine fixture bytes, so the mm_decode_bmp /
mm_audio_wav / mm_frame_sample paths are end-to-end real: encode →
binary column → mapInPandas parse → features. COMPRESSED formats
(JPEG/PNG/MP3/H.264) still need external libraries this container
lacks; ``fake_decode_features`` remains the deterministic stand-in
for that path (mm_decode_stub), documented as such.

Scale notes: mapInPandas is narrow (no shuffle); batch size is
governed by spark.sql.execution.arrow.maxRecordsPerBatch — for
multi-MB payloads set it low (e.g. 64) so a batch fits in memory.
Binary payloads at 100 TB should live in parquet with a small
row-group size, or as object-store pointers with the decode UDF
fetching lazily.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


_BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def bmp_stride(width: int) -> int:
    """Bytes per 24-bpp BMP row, padded to a 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def encode_bmp(width: int, height: int, fill: int) -> bytes:
    """Minimal real 24-bpp bottom-up BMP writer (pure struct): every
    pixel's B/G/R bytes are ``fill``, row padding is zero."""
    stride = bmp_stride(width)
    image_size = stride * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", _BMP_HEADER_SIZE + image_size, 0, 0, _BMP_HEADER_SIZE,
        40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    row = bytes([fill]) * (3 * width) + b"\x00" * (stride - 3 * width)
    return header + row * height


def decode_image(payload: bytes) -> dict:
    """Real pure-stdlib image decode for UNCOMPRESSED formats: 24-bpp
    BMP (struct-parsed header + pixel scan, padding excluded) and
    binary PPM (P6). Compressed formats (JPEG/PNG/...) need external
    libraries this container lacks and raise ValueError — route those
    through fake_decode_features until a codec is installed."""
    if payload[:2] == b"BM":
        offset = struct.unpack_from("<I", payload, 10)[0]
        _, width, height, _, bpp, compression = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if bpp != 24 or compression != 0:
            raise ValueError("only uncompressed 24-bpp BMP is supported")
        h = abs(height)
        stride = bmp_stride(width)
        pix_sum = 0
        for y in range(h):
            start = offset + y * stride
            pix_sum += sum(payload[start : start + 3 * width])
        n = 3 * width * h
        return {"format": "bmp", "width": width, "height": h,
                "mean_pixel": pix_sum / n if n else 0.0}
    if payload[:2] == b"P6":
        # P6\n<width> <height>\n<maxval>\n<binary RGB>
        parts = payload.split(b"\n", 3)
        width, height = (int(x) for x in parts[1].split())
        raster = parts[3][: 3 * width * height]
        n = len(raster)
        return {"format": "ppm", "width": width, "height": height,
                "mean_pixel": sum(raster) / n if n else 0.0}
    raise ValueError("unsupported image format (uncompressed BMP/PPM only)")


def fake_decode_features(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for decode: md5 + pseudo dimensions
    derived from the digest (mirrors the oracle SQL exactly)."""
    digest = hashlib.md5(payload).hexdigest()
    width = int(digest[0:4], 16) % 1920 + 1
    height = int(digest[4:8], 16) % 1080 + 1
    return digest, width, height


def attach_payload(documents: DataFrame) -> DataFrame:
    """Build a media table from documents: utf-8 text bytes stand in
    for an image payload (binary column + typed metadata)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_md5": [f[0] for f in feats],
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def _write_wav16(samples, rate: int) -> bytes:
    """Shared 16-bit mono RIFF/WAV writer (stdlib wave) — the single
    place the container layout lives, so the constant-amplitude and
    varying-waveform fixtures can never diverge."""
    samples = list(samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def encode_wav(n_samples: int, amplitude: int, rate: int = 8000) -> bytes:
    """Real RIFF/WAV writer: 16-bit mono PCM, every sample
    ``amplitude`` — a genuine, parseable audio file whose content
    features are closed-form predictable."""
    return _write_wav16([amplitude] * n_samples, rate)


def decode_audio(payload: bytes) -> dict:
    """Real pure-stdlib WAV decode (wave module): header params plus a
    full PCM scan for the peak sample. Compressed audio (MP3/AAC/...)
    needs external libraries this container lacks; wave.Error
    propagates for non-RIFF payloads."""
    with wave.open(io.BytesIO(payload)) as w:
        nch = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if sampwidth == 2:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        peak = max(samples) if samples else 0
    else:  # 8-bit WAV is unsigned
        peak = max(frames) if frames else 0
    return {
        "n_channels": nch,
        "sample_rate": rate,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // rate if rate else 0,
        "peak_amp": peak,
    }


def encode_wav_wave(n_samples: int, seed: int, rate: int = 8000) -> bytes:
    """Real RIFF/WAV writer with a VARYING waveform: sample ``k`` is
    ``((seed + 97*k) % 65536) - 32768`` — a deterministic sawtooth-like
    sweep over the full int16 range, so DSP features (zero crossings,
    magnitude sums) are non-trivial yet exactly replayable by an
    integer SQL oracle. The constant-amplitude ``encode_wav`` remains
    the mm_audio_wav fixture."""
    return _write_wav16(
        (((seed + 97 * k) % 65536) - 32768 for k in range(n_samples)), rate
    )


def decode_wav_dsp(payload: bytes, decimate: int = 2) -> dict:
    """Real WAV decode + integer DSP: wave-parse the header, unpack the
    full 16-bit PCM stream, and compute exact-integer features — total
    magnitude (sum |s|), strict zero crossings (s[k]*s[k-1] < 0), and a
    TRUE ``decimate``:1 decimation resample (every ``decimate``-th
    sample kept) with the resampled stream's own magnitude sum. Only
    16-bit mono is supported — other layouts raise, like the chroma
    guard in ``decode_y4m``."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("DSP path supports 16-bit mono PCM only")
        rate = w.getframerate()
        n = w.getnframes()
        frames = w.readframes(n)
    if len(frames) != 2 * n:
        # header claims more frames than the data chunk holds — keep
        # the module-wide ValueError contract instead of struct.error
        raise ValueError("truncated PCM payload")
    s = struct.unpack(f"<{n}h", frames)
    rs = s[::decimate]
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // rate if rate else 0,
        "sum_abs": sum(abs(v) for v in s),
        "n_zero_cross": sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        ),
        "rs_n": len(rs),
        "rs_sum_abs": sum(abs(v) for v in rs),
    }


def resample_wav_linear(payload: bytes, dst_rate: int) -> dict:
    """Real WAV decode → EXACT-INTEGER linear resample to ``dst_rate``
    → re-encode → re-decode, returning features of the full chain.

    The interpolation runs in the UNSIGNED domain u = s + 32768 with
    the non-negative lerp form ``(u[i]·(D−r) + u[i+1]·r) // D`` where
    the source position of output j is ``j·N/D`` (N/D = src/dst rate
    reduced): every operand is a non-negative BIGINT, so floor and
    truncate agree and a SQL oracle replays each output sample
    bit-exactly (the signed form's ``(b−a)·r // D`` floor-divides a
    negative delta, which Spark DIV and DuckDB // round differently).
    Output sample count m = ((n−1)·D) // N + 1 — every j whose source
    position does not pass the last input sample; r > 0 implies
    i+1 ≤ n−1, so the lerp never reads past the stream. 16-bit mono
    only, like ``decode_wav_dsp``."""
    with wave.open(io.BytesIO(payload)) as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("resample path supports 16-bit mono PCM only")
        src_rate = w.getframerate()
        n = w.getnframes()
        frames = w.readframes(n)
    if len(frames) != 2 * n:
        raise ValueError("truncated PCM payload")
    if dst_rate < 1 or src_rate < 1 or n < 2:
        raise ValueError("need dst_rate >= 1 and at least 2 samples")
    s = struct.unpack(f"<{n}h", frames)
    u = [v + 32768 for v in s]
    g = math.gcd(src_rate, dst_rate)
    num, den = src_rate // g, dst_rate // g  # src step per output = num/den
    m = ((n - 1) * den) // num + 1
    out_u = []
    for j in range(m):
        p = j * num
        i, r = p // den, p % den
        a = u[i]
        b = u[i + 1] if r else a
        out_u.append((a * (den - r) + b * r) // den)
    payload2 = _write_wav16([v - 32768 for v in out_u], dst_rate)
    with wave.open(io.BytesIO(payload2)) as w2:
        rs_rate, rs_n = w2.getframerate(), w2.getnframes()
    return {
        "src_rate": src_rate,
        "dst_rate": rs_rate,
        "n_in": n,
        "n_out": rs_n,
        "sum_u_out": sum(out_u),
        "rs_bytes": len(payload2),
    }


def synthesize_wav_wave_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL varying-waveform RIFF/WAV payloads (doc_id-keyed
    length and waveform seed) into the binary media column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "audio/wav",
                    "payload": [
                        encode_wav_wave(int(i) % 400 + 16, (int(i) * 131) % 65536)
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


AUDIO_DSP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("n_zero_cross", LongType(), True),
        StructField("rs_n", LongType(), True),
        StructField("rs_sum_abs", LongType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def extract_audio_dsp(media: DataFrame) -> DataFrame:
    """REAL audio DSP per payload (wave-parse + full PCM unpack +
    exact-integer feature math incl. a true 2:1 decimation resample).
    Narrow mapInPandas stage, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_wav_dsp(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(
                        [f["sample_rate"] for f in feats], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [f["n_samples"] for f in feats], dtype="int64"
                    ),
                    "duration_ms": pd.Series(
                        [f["duration_ms"] for f in feats], dtype="int64"
                    ),
                    "sum_abs": pd.Series(
                        [f["sum_abs"] for f in feats], dtype="int64"
                    ),
                    "n_zero_cross": pd.Series(
                        [f["n_zero_cross"] for f in feats], dtype="int64"
                    ),
                    "rs_n": pd.Series([f["rs_n"] for f in feats], dtype="int64"),
                    "rs_sum_abs": pd.Series(
                        [f["rs_sum_abs"] for f in feats], dtype="int64"
                    ),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_DSP_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("src_rate", IntegerType(), True),
        StructField("dst_rate", IntegerType(), True),
        StructField("n_in", LongType(), True),
        StructField("n_out", LongType(), True),
        StructField("sum_u_out", LongType(), True),
        StructField("rs_bytes", LongType(), True),
    ]
)


def extract_audio_resample(media: DataFrame, dst_rate: int) -> DataFrame:
    """REAL linear PCM resample per payload (wave-parse → exact-integer
    lerp to ``dst_rate`` → re-encode → re-decode, resample_wav_linear).
    Narrow mapInPandas stage, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [resample_wav_linear(p, dst_rate) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
                    "src_rate": pd.Series(
                        [f["src_rate"] for f in feats], dtype="int32"
                    ),
                    "dst_rate": pd.Series(
                        [f["dst_rate"] for f in feats], dtype="int32"
                    ),
                    "n_in": pd.Series([f["n_in"] for f in feats], dtype="int64"),
                    "n_out": pd.Series(
                        [f["n_out"] for f in feats], dtype="int64"
                    ),
                    "sum_u_out": pd.Series(
                        [f["sum_u_out"] for f in feats], dtype="int64"
                    ),
                    "rs_bytes": pd.Series(
                        [f["rs_bytes"] for f in feats], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_RESAMPLE_SCHEMA)


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL 24-bpp BMP payloads (doc_id-keyed dimensions and
    fill byte) into the binary media column — the fixture generator for
    the end-to-end decode path. Narrow mapInPandas, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "image/bmp",
                    "payload": [
                        encode_bmp(int(i) % 31 + 1, int(i) % 17 + 1, int(i) % 251)
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def extract_bmp_features(media: DataFrame) -> DataFrame:
    """REAL decode: struct-parse each BMP payload (header fields + full
    pixel scan excluding row padding). The features are closed-form in
    doc_id, so a SQL oracle can verify that the encoder→decoder
    round-trip preserved them — the proof the codec actually ran."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("n_bytes", LongType(), True),
            StructField("mean_pixel", DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mean_pixel": pd.Series(
                        [f["mean_pixel"] for f in feats], dtype="float64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=schema)


WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("peak_amp", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL RIFF/WAV payloads (16-bit mono 8 kHz, doc_id-
    keyed length and amplitude) into the binary media column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "audio/wav",
                    "payload": [
                        encode_wav(int(i) % 400 + 16, (int(i) * 37) % 32767)
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def extract_wav_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode per payload (wave-module header parse + full PCM
    peak scan); features closed-form in doc_id for oracle checking."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(
                        [f["sample_rate"] for f in feats], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [f["n_samples"] for f in feats], dtype="int64"
                    ),
                    "duration_ms": pd.Series(
                        [f["duration_ms"] for f in feats], dtype="int64"
                    ),
                    "peak_amp": pd.Series(
                        [f["peak_amp"] for f in feats], dtype="int32"
                    ),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


def encode_y4m(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Minimal real YUV4MPEG2 (Y4M) writer — the standard UNCOMPRESSED
    video container (plain-text stream header, then per-frame
    ``FRAME\\n`` markers followed by raw planar YUV). 4:2:0 chroma
    (``C420``) requires even dimensions; frame ``k``'s Y plane is the
    constant luma ``(seed + 11*k) % 256`` (the constant-raster pattern
    ``encode_bmp`` established — makes the full-plane mean closed-form
    for the oracle), chroma planes are neutral 128."""
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (width, height)]
    chroma = b"\x80" * ((width // 2) * (height // 2) * 2)
    for k in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes([(seed + 11 * k) % 256]) * (width * height))
        out.append(chroma)
    return b"".join(out)


# 8-bit 4:2:0 chroma tags whose planes are 1 byte/sample — the only
# layouts the fixed-offset frame math below is valid for. EXACT match
# (r16, ADVICE r15): a startswith("420") guard also accepted the
# 10/12-bit variants (C420p10/C420p12, 2-byte samples), which usually
# fail the length check downstream but can silently mis-decode when
# lengths happen to align.
_Y4M_C420_8BIT = (b"420", b"420jpeg", b"420mpeg2", b"420paldv")


def decode_y4m(payload: bytes, every_n: int = 1) -> dict:
    """Real Y4M parse: read the stream header (W/H/C tokens), derive
    the fixed frame size, validate EVERY frame's ``FRAME`` marker and
    the total stream length, and full-scan the Y plane of every
    ``every_n``-th frame for its mean luma. Marker validation is O(1)
    per frame; plane scans run only on the sampled frames — fixed
    frame size gives random access by offset, which is exactly why
    frame sampling over an uncompressed container is cheap at scale.

    Accepted layouts: 8-bit 4:2:0 only (``_Y4M_C420_8BIT`` exact
    allowlist) and bare ``FRAME\\n`` markers — spec-legal frame-level
    parameters (``FRAME <params>\\n``) from external encoders are
    rejected closed rather than parsed, since variable-length markers
    would forfeit the fixed-offset random access this operator's scale
    story depends on (documented restriction, ADVICE r15).
    Inter-frame compressed codecs (H.264/VP9) need external decoders
    this container lacks — route those through the mm_decode_stub
    template."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    for tok in header[1:]:
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C" and tok[1:] not in _Y4M_C420_8BIT:
            raise ValueError(f"unsupported chroma subsampling {tok!r}")
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError("missing or non-positive W/H in stream header")
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    y_size = width * height
    frame_size = 6 + y_size + (width // 2) * (height // 2) * 2
    body = len(payload) - (nl + 1)
    if body % frame_size:
        raise ValueError("truncated frame payload")
    n_frames = body // frame_size
    means = {}
    for k in range(n_frames):
        off = nl + 1 + k * frame_size
        if payload[off : off + 6] != b"FRAME\n":
            raise ValueError(f"bad FRAME marker at frame {k}")
        if k % every_n == 0:
            y = payload[off + 6 : off + 6 + y_size]
            means[k] = sum(y) / y_size
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "frame_means": means,
    }


def synthesize_y4m_media(docs: DataFrame) -> DataFrame:
    """Synthesize REAL Y4M video payloads (doc_id-keyed even dimensions,
    1–90 frames, per-frame luma ramp) into the binary media column.
    Narrow mapInPandas, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "video/y4m",
                    "payload": [
                        encode_y4m(
                            2 * (int(i) % 8 + 1),
                            2 * (int(i) % 6 + 1),
                            int(i) % 90 + 1,
                            (int(i) * 7) % 256,
                        )
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


Y4M_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("frame_idx", LongType(), True),
        StructField("mean_y", DoubleType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def sample_y4m_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame sampling: parse each Y4M payload, emit one row per
    every ``every_n``-th frame with that frame's full-scan mean luma.
    One narrow Arrow stage after the synthesis stage — no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {c: [] for c in Y4M_FRAME_SCHEMA.fieldNames()}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_y4m(p, every_n=every_n)
                for k, mean in d["frame_means"].items():
                    rows["doc_id"].append(int(i))
                    rows["width"].append(d["width"])
                    rows["height"].append(d["height"])
                    rows["n_frames"].append(d["n_frames"])
                    rows["frame_idx"].append(k)
                    rows["mean_y"].append(mean)
                    rows["n_bytes"].append(len(p))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int64"),
                    "mean_y": pd.Series(rows["mean_y"], dtype="float64"),
                    "n_bytes": pd.Series(rows["n_bytes"], dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=Y4M_FRAME_SCHEMA)


def encode_bmp_pattern(width: int, height: int, seed: int) -> bytes:
    """Real 24-bpp BMP writer with a deterministic grayscale gradient:
    pixel (x, y) has byte value (seed*31 + x*97 + y*13) % 251 in all
    three channels, rows stored bottom-up per the BMP spec. Unlike
    ``encode_bmp``'s constant fill, the gradient gives perceptual
    hashes (``dhash_bmp``) real structure to bite on."""
    stride = bmp_stride(width)
    image_size = stride * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", _BMP_HEADER_SIZE + image_size, 0, 0, _BMP_HEADER_SIZE,
        40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            v = (seed * 31 + x * 97 + y * 13) % 251
            row += bytes((v, v, v))
        row += b"\x00" * (stride - 3 * width)
        rows.append(bytes(row))
    return header + b"".join(rows)


def resize_bmp_nearest(payload: bytes, dst_w: int, dst_h: int) -> bytes:
    """Pure-stdlib nearest-neighbor resize of a 24-bpp BMP: decode the
    source pixel grid (bottom-up rows, stride padding), sample src
    pixel (x·sw // dst_w, y·sh // dst_h) for each destination pixel,
    and re-encode a REAL BMP of the new dimensions. Integer-only
    sampling, so the resized raster is expressible closed-form in SQL
    for synthetic gradients (the mm_image_resize oracle)."""
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, sw, sh, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP is supported")
    sh = abs(sh)
    src_stride = bmp_stride(sw)

    def src_px(x: int, y: int) -> bytes:
        # bottom-up storage: image row y sits at file row (sh-1-y)
        start = offset + (sh - 1 - y) * src_stride + 3 * x
        return payload[start : start + 3]

    dst_stride = bmp_stride(dst_w)
    image_size = dst_stride * dst_h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", _BMP_HEADER_SIZE + image_size, 0, 0, _BMP_HEADER_SIZE,
        40, dst_w, dst_h, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    rows = []
    for y in range(dst_h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(dst_w):
            row += src_px((x * sw) // dst_w, (y * sh) // dst_h)
        row += b"\x00" * (dst_stride - 3 * dst_w)
        rows.append(bytes(row))
    return header + b"".join(rows)


def dhash_bmp(payload: bytes) -> int:
    """Difference hash (dHash) of a 24-bpp BMP: sample the first
    channel on a 9×8 grid (sx = i·w//9, sy = j·h//8), emit bit
    (j*8+i) = 1 when grid[j][i] > grid[j][i+1]. Integer-only, so the
    same definition is expressible closed-form in SQL for synthetic
    gradients."""
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP is supported")
    h = abs(height)
    stride = bmp_stride(width)

    def px(x: int, y: int) -> int:
        # bottom-up storage: image row y sits at file row (h-1-y)
        return payload[offset + (h - 1 - y) * stride + 3 * x]

    out = 0
    for j in range(8):
        sy = (j * h) // 8
        for i in range(8):
            a = px((i * width) // 9, sy)
            b = px(((i + 1) * width) // 9, sy)
            if a > b:
                out |= 1 << (j * 8 + i)
    # two's-complement signed 64-bit, so the hash fits BIGINT columns
    return out - (1 << 64) if out >= (1 << 63) else out
