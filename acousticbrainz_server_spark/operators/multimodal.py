"""Multimodal column operators for the training-data pipeline.

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` kernels.  Container formats with stdlib-
parseable layouts get REAL codecs — WAV/PCM16 (``decode_wav_pcm16``) and
netpbm PGM (``decode_pgm``) below, both oracle-gated end-to-end.  Formats
whose codec libraries (PIL, ffmpeg, torchaudio) are NOT in this container
stay STUBBED: ``decode_image``/``decode_audio`` raise NotImplementedError
stating the contract, and ``fake_decode_image``/``fake_decode_audio`` are
deterministic stand-ins (payload-hash-derived pixels/samples) so the Spark
plumbing — schemas, batch shapes, partition behavior — is real and tested.

Scale notes: binary payloads dominate row size, so kernels must never widen
rows before a shuffle — decode outputs are small typed features (dims, means,
frames), and any repartitioning happens BEFORE decode on (id, metadata) only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = "media_id long, width int, height int, mean_luma double, phash string"
AUDIO_FEATURES_SCHEMA = "media_id long, duration_s double, rms double, n_frames int"


def decode_image(payload: bytes, meta: dict) -> dict:
    raise NotImplementedError("image codec libraries are not installed in this environment")


def decode_audio(payload: bytes, meta: dict) -> dict:
    raise NotImplementedError("audio codec libraries are not installed in this environment")


def fake_decode_image(payload: bytes, meta: dict) -> dict:
    """Deterministic stand-in: luma/phash derived from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return {
        "width": meta.get("width") or 0,
        "height": meta.get("height") or 0,
        "mean_luma": d[0] / 255.0,
        "phash": d[:8].hex(),
    }


def fake_decode_audio(payload: bytes, meta: dict) -> dict:
    d = hashlib.sha256(payload or b"").digest()
    duration = float(meta.get("duration_s") or 0.0)
    return {"duration_s": duration, "rms": d[1] / 255.0, "n_frames": int(duration * 10) + 1}


def extract_image_features(media: DataFrame, decode=fake_decode_image) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                feats = decode(rec["payload"], rec["meta"] or {})
                rows.append({"media_id": rec["media_id"], **feats})
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload", "meta").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def extract_audio_features(media: DataFrame, decode=fake_decode_audio) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                feats = decode(rec["payload"], rec["meta"] or {})
                rows.append({"media_id": rec["media_id"], **feats})
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload", "meta").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sample plan: one row per sampled timestamp, WITHOUT decoding —
    pure column expressions (sequence over duration), the decode itself being
    a downstream mapInPandas over (media_id, frame_ts)."""
    n = F.greatest((F.col("meta.duration_s") / F.lit(every_s)).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("frame_ts", F.col("frame_idx") * F.lit(every_s))


# --------------------------------------------------------------------------------------
# REAL codec: WAV / PCM16 (stdlib struct — no external library needed)
# --------------------------------------------------------------------------------------


def encode_wav_pcm16(samples: list[int], sample_rate: int) -> bytes:
    """A real RIFF/WAVE encoder for mono PCM16 (stdlib only): 44-byte
    canonical header + little-endian int16 frames.  This (and its decoder)
    upgrade one modality from 'stubbed' to a genuine codec path: the query
    gate certifies header layout, byte order and sample round-trip."""
    import struct

    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    byte_rate = sample_rate * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav_pcm16(payload: bytes) -> tuple[int, list[int]]:
    """Parse a mono PCM16 RIFF/WAVE payload back to (sample_rate, samples),
    validating magic, fmt tag and bit depth — a real decode kernel."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (fmt_size, audio_fmt, n_channels, sample_rate, _br, _ba, bits) = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if fmt_size != 16 or audio_fmt != 1 or n_channels != 1 or bits != 16:
        raise ValueError("only canonical mono PCM16 supported")
    (data_len,) = struct.unpack("<I", payload[40:44])
    n = data_len // 2
    samples = list(struct.unpack(f"<{n}h", payload[44 : 44 + data_len]))
    return sample_rate, samples


def wav_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas kernel over (media_id, payload): REAL wav decode →
    (n_samples, sample_rate, rms, n_zero_cross).  Narrow typed features out;
    the binary never survives past this stage."""
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                rate, samples = decode_wav_pcm16(bytes(rec["payload"]))
                # vectorized feature math (sums on int64 stay exact)
                a = np.asarray(samples, dtype=np.int64)
                n = len(a)
                rms = math.sqrt(float((a * a).sum()) / n) if n else 0.0
                neg = a < 0
                zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "n_samples": n,
                        "sample_rate": rate,
                        "rms": rms,
                        "n_zero_cross": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, n_samples int, sample_rate int, rms double, n_zero_cross int"
    )


# --------------------------------------------------------------------------------------
# REAL codec: PGM / netpbm P5 grayscale (stdlib only) — the image twin of the
# WAV path: header parse, raster decode, typed features out.
# --------------------------------------------------------------------------------------


def encode_pgm(pixels: list[int], width: int, height: int) -> bytes:
    """Binary netpbm P5 grayscale: 'P5\\n<w> <h>\\n255\\n' + raster bytes."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    return f"P5\n{width} {height}\n255\n".encode("ascii") + bytes(pixels)


def decode_pgm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PGM back to (width, height, raster), validating the
    magic, maxval and raster length."""
    if payload[:3] != b"P5\n":
        raise ValueError("not a binary PGM payload")
    rest = payload[3:]
    nl = rest.index(b"\n")
    w, h = (int(x) for x in rest[:nl].split())
    rest = rest[nl + 1 :]
    nl = rest.index(b"\n")
    if rest[:nl] != b"255":
        raise ValueError("only maxval 255 supported")
    raster = rest[nl + 1 :]
    if len(raster) != w * h:
        raise ValueError("raster length != width*height")
    return w, h, raster


def pgm_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas kernel: REAL PGM decode → (width, height, mean_luma,
    ahash) where ahash is the 64-bit average-hash over the 8x8 block means —
    the classic perceptual near-dup key for image corpora."""

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                w, h, raster = decode_pgm(bytes(rec["payload"]))
                n = w * h
                img = np.frombuffer(raster, dtype=np.uint8).astype(np.int64).reshape(h, w)
                mean = float(img.sum()) / n if n else 0.0
                # 8x8 average hash, vectorized: exact integer block sums vs
                # the global mean (a/cnt > mean compares the same IEEE
                # ratios the per-pixel loop did), row-major bit order
                bw, bh = max(w // 8, 1), max(h // 8, 1)
                bits = 0
                for by in range(8):
                    ys = slice(by * bh, min((by + 1) * bh, h))
                    for bx in range(8):
                        block = img[ys, bx * bw : min((bx + 1) * bw, w)]
                        if block.size and float(block.sum()) / block.size > mean:
                            bits |= 1 << (by * 8 + bx)
                rows.append(
                    {
                        "media_id": rec["media_id"],
                        "width": w,
                        "height": h,
                        "mean_luma": mean,
                        "ahash": bits - (1 << 64) if bits >= (1 << 63) else bits,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, width int, height int, mean_luma double, ahash long"
    )
