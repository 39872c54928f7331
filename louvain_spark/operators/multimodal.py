"""Multimodal (image/audio/video) columns: binary payloads + typed
metadata, decoded and featurized in Arrow-batched pandas UDFs.

Media are opaque `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas — one batch in, per-row decode, one batch out, with
partitioning preserved (an upstream repartition(media_id) controls
parallelism).

Decoding is REAL for codecs parseable with numpy + the stdlib:

- image: binary PPM (P6) / PGM (P5) — full header parse + pixel matrix
- audio: WAV (PCM 16-bit) via the stdlib `wave` module
- video: a length-prefixed PPM frame container (`PPMV`, codec 'ppmv') —
  per-frame decode + timestamped frame sampling

Compressed codecs (jpeg/png/mp3/mp4) need libraries absent from this
container: `strict=True` raises NotImplementedError for them, the default
falls back to a deterministic content-derived fake so pipelines remain
testable end-to-end. Features are deterministic numpy stats (channel
mean/std + nearest-neighbor-resized luma grid for images; windowed RMS +
zero-crossing rate for audio), unit-normalized like the text featurizer.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, digest string, feature array<float>"

REAL_CODECS = {"ppm", "pgm", "wav", "ppmv"}


# ---------------------------------------------------------------------------
# real decoders (numpy + stdlib only)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → uint8 array (H, W, C). Full parser:
    magic, whitespace/comment-tolerant header, maxval ≤ 255."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {payload[:2]!r}")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * channels
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, channels)


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 1|3) → binary PGM/PPM bytes (the test-fixture writer)."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM → (int16 samples flattened across channels, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
        width = f.getsampwidth()
    if width != 2:
        raise ValueError(f"only 16-bit PCM WAV supported, got width={width}")
    return np.frombuffer(raw, dtype="<i2"), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_ppmv(payload: bytes) -> tuple[list[bytes], int]:
    """PPMV container → (list of PPM frame payloads, frame interval ms).

    Layout: b'PPMV' | uint32 n_frames | uint32 frame_ms |
    n_frames × (uint32 length | PPM bytes). A deliberately simple real
    container so frame-sampling decodes real pixels without ffmpeg."""
    if payload[:4] != b"PPMV":
        raise ValueError("not a PPMV payload")
    n_frames, frame_ms = struct.unpack_from("<II", payload, 4)
    frames, pos = [], 12
    for _ in range(n_frames):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames, frame_ms


def encode_ppmv(frames: list[np.ndarray], frame_ms: int = 40) -> bytes:
    parts = [b"PPMV", struct.pack("<II", len(frames), frame_ms)]
    for fr in frames:
        b = encode_ppm(fr)
        parts.append(struct.pack("<I", len(b)) + b)
    return b"".join(parts)


# ---------------------------------------------------------------------------
# deterministic featurization
# ---------------------------------------------------------------------------

def resize_nearest(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Real nearest-neighbor resize via index sampling (no PIL)."""
    h, w = arr.shape[:2]
    iy = np.minimum((np.arange(th) + 0.5) * h / th, h - 1).astype(np.int64)
    ix = np.minimum((np.arange(tw) + 0.5) * w / tw, w - 1).astype(np.int64)
    return arr[iy][:, ix]


def image_feature(arr: np.ndarray, grid: int = 3) -> np.ndarray:
    """Per-channel mean/std + grid×grid luma thumbnail, unit-normalized.
    Output dim = 6 + grid² (single-channel images replicate the channel)."""
    a = arr.astype(np.float64)
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    stats = np.concatenate([a.mean(axis=(0, 1)) / 255.0, a.std(axis=(0, 1)) / 255.0])
    luma = a.mean(axis=2)
    thumb = resize_nearest(luma, grid, grid).ravel() / 255.0
    v = np.concatenate([stats, thumb])
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def audio_feature(samples: np.ndarray, n_windows: int = 8) -> np.ndarray:
    """Windowed RMS envelope + global zero-crossing rate, unit-normalized.
    Output dim = n_windows + 1."""
    if len(samples) == 0:
        return np.zeros(n_windows + 1, dtype=np.float32)
    x = samples.astype(np.float64) / 32768.0
    splits = np.array_split(x, n_windows)
    rms = np.array([np.sqrt((s**2).mean()) if len(s) else 0.0 for s in splits])
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    v = np.concatenate([rms, [zcr]])
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    v = rng.rand(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def decode_feature(payload: bytes, codec: str, dim: int, strict: bool) -> np.ndarray:
    """Decode one payload by codec and featurize to exactly `dim` floats
    (truncate / zero-pad — a fixed contract so the Spark schema is stable
    regardless of codec)."""
    codec = (codec or "").lower()
    if codec in ("ppm", "pgm"):
        v = image_feature(decode_ppm(payload))
    elif codec == "wav":
        v = audio_feature(decode_wav(payload)[0])
    elif codec == "ppmv":
        frames, _ = decode_ppmv(payload)
        feats = [image_feature(decode_ppm(fr)) for fr in frames]
        v = np.mean(feats, axis=0).astype(np.float32) if feats else np.zeros(1, np.float32)
    elif strict:
        raise NotImplementedError(
            f"codec {codec!r} needs a decoder library not present in this "
            f"container (PIL/ffmpeg); real decoders exist for {sorted(REAL_CODECS)}"
        )
    else:
        return _fake_feature(payload, dim)
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, len(v))] = v[:dim]
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary payload per doc (test fixture:
    payload = utf-8 text bytes; metadata from content hashes)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64(text_col), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(512)) + 32).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.lit("raw").alias("codec"),
    )


def extract_features(
    media: DataFrame, dim: int = 16, strict: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over media batches: real decode for
    ppm/pgm/wav/ppmv payloads, fake/strict for unavailable codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            codecs = pdf["codec"] if "codec" in pdf else pd.Series([None] * len(pdf))
            kinds = pdf["kind"] if "kind" in pdf else pd.Series([None] * len(pdf))
            feats = [
                decode_feature(p, c, dim, strict)
                for p, c in zip(pdf["payload"], codecs)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    cols = [c for c in ("media_id", "kind", "payload", "codec") if c in media.columns]
    return media.select(*cols).mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    pure Catalyst explode over the duration metadata."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, dim: int = 16) -> DataFrame:
    """REAL frame sampling for ppmv video payloads: decode the frame at
    each sampled timestamp and featurize it.

    (media_id, frame_ts_ms, frame_idx, feature). One Arrow batch per task;
    each row decodes only the frames it samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_ts, out_idx, out_feat = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, frame_ms = decode_ppmv(payload)
                if not frames or frame_ms <= 0:
                    continue
                duration = len(frames) * frame_ms
                for ts in range(0, duration, every_ms):
                    idx = min(ts // frame_ms, len(frames) - 1)
                    v = image_feature(decode_ppm(frames[idx]))
                    feat = np.zeros(dim, dtype=np.float32)
                    feat[: min(dim, len(v))] = v[:dim]
                    out_id.append(mid)
                    out_ts.append(ts)
                    out_idx.append(idx)
                    out_feat.append(feat)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "feature": out_feat,
                }
            )

    return media.where(F.col("codec") == "ppmv").select("media_id", "payload").mapInPandas(
        batches, "media_id long, frame_ts_ms long, frame_idx long, feature array<float>"
    )
