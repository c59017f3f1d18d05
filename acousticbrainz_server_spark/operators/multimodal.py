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


def decode_wav_pcm16_header(payload: bytes) -> tuple[int, int]:
    """Parse and validate a mono PCM16 RIFF/WAVE header, returning
    (sample_rate, data_len_bytes) without touching the sample data — the
    batched kernel decodes all rasters in one numpy pass after this."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (fmt_size, audio_fmt, n_channels, sample_rate, _br, _ba, bits) = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if fmt_size != 16 or audio_fmt != 1 or n_channels != 1 or bits != 16:
        raise ValueError("only canonical mono PCM16 supported")
    (data_len,) = struct.unpack("<I", payload[40:44])
    return sample_rate, data_len


def decode_wav_pcm16(payload: bytes) -> tuple[int, list[int]]:
    """Parse a mono PCM16 RIFF/WAVE payload back to (sample_rate, samples),
    validating magic, fmt tag and bit depth — a real decode kernel."""
    import struct

    sample_rate, data_len = decode_wav_pcm16_header(payload)
    n = data_len // 2
    samples = list(struct.unpack(f"<{n}h", payload[44 : 44 + data_len]))
    return sample_rate, samples


def wav_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas kernel over (media_id, payload): REAL wav decode →
    (n_samples, sample_rate, rms, n_zero_cross).  Narrow typed features out;
    the binary never survives past this stage."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # header parse per record (variable-length payloads), then ALL
            # feature math over one concatenated sample array with
            # per-segment reductions — numpy dispatch is O(batch), not
            # O(records), which is what a real audio corpus needs
            mids: list[int] = []
            rates: list[int] = []
            lens: list[int] = []
            chunks: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                rate, data_len = decode_wav_pcm16_header(b)
                mids.append(int(mid))
                rates.append(rate)
                lens.append(data_len // 2)
                chunks.append(b[44 : 44 + data_len])
            a = np.frombuffer(b"".join(chunks), dtype="<i2").astype(np.int64)
            ns = np.asarray(lens, dtype=np.int64)
            offs = np.zeros(len(ns) + 1, dtype=np.int64)
            np.cumsum(ns, out=offs[1:])
            sq = np.zeros(a.size + 1, dtype=np.int64)
            np.cumsum(a * a, out=sq[1:])
            sumsq = sq[offs[1:]] - sq[offs[:-1]]
            rms = np.where(
                ns > 0, np.sqrt(sumsq.astype(np.float64) / np.maximum(ns, 1)), 0.0
            )
            # zero crossings: sign flips within each segment only — the
            # cumulative flip count differenced at segment edges never
            # counts a cross-record boundary
            neg = a < 0
            flips = np.zeros(a.size, dtype=np.int64)
            if a.size > 1:
                flips[1:] = neg[1:] != neg[:-1]
            cf = np.zeros(a.size + 1, dtype=np.int64)
            np.cumsum(flips, out=cf[1:])
            lo = np.minimum(offs[:-1] + 1, offs[1:])
            zc = cf[offs[1:]] - cf[lo]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "n_samples": ns,
                    "sample_rate": rates,
                    "rms": rms,
                    "n_zero_cross": zc,
                }
            )

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
    the classic perceptual near-dup key for image corpora.

    Whole-Arrow-batch feature math: headers parse per record (variable
    length), but rasters of like shape stack into ONE (B, h, w) int64 array
    and the 8x8 block sums come from a batched integral image (cumsum +
    4-corner differences), so per-image Python/numpy dispatch overhead is
    O(shapes), not O(images) — the form an image corpus needs.  Block/global
    means divide int64 sums as float64 exactly like the per-image loop did,
    so every ahash bit compares the same IEEE ratios.
    """

    import numpy as np

    _BIT_WEIGHTS = np.array(
        [[1 << (by * 8 + bx) for bx in range(8)] for by in range(8)], dtype=np.uint64
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            groups: dict[tuple[int, int], list[tuple[int, bytes]]] = {}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, raster = decode_pgm(bytes(payload))
                groups.setdefault((w, h), []).append((int(mid), raster))
            out_mid: list[int] = []
            out_w: list[int] = []
            out_h: list[int] = []
            out_mean: list[float] = []
            out_hash: list[int] = []
            for (w, h), members in groups.items():
                bsz = len(members)
                n = w * h
                imgs = (
                    np.frombuffer(b"".join(r for _, r in members), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(bsz, h, w)
                )
                means = (
                    imgs.sum(axis=(1, 2)).astype(np.float64) / n
                    if n
                    else np.zeros(bsz, dtype=np.float64)
                )
                # batched integral image: block sum = 4-corner difference
                ii = np.zeros((bsz, h + 1, w + 1), dtype=np.int64)
                ii[:, 1:, 1:] = imgs.cumsum(axis=1).cumsum(axis=2)
                bw, bh = max(w // 8, 1), max(h // 8, 1)
                y0 = np.minimum(np.arange(8) * bh, h)
                y1 = np.minimum((np.arange(8) + 1) * bh, h)
                x0 = np.minimum(np.arange(8) * bw, w)
                x1 = np.minimum((np.arange(8) + 1) * bw, w)
                bsum = (
                    ii[:, y1[:, None], x1[None, :]]
                    - ii[:, y0[:, None], x1[None, :]]
                    - ii[:, y1[:, None], x0[None, :]]
                    + ii[:, y0[:, None], x0[None, :]]
                )  # (B, 8, 8)
                sizes = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.int64)
                ratio = np.where(
                    sizes > 0,
                    bsum.astype(np.float64) / np.maximum(sizes, 1),
                    -np.inf,
                )
                bits = ratio > means[:, None, None]  # empty blocks stay 0
                hashes = (
                    (bits.astype(np.uint64) * _BIT_WEIGHTS)
                    .sum(axis=(1, 2), dtype=np.uint64)
                    .view(np.int64)  # two's-complement fold, same bits
                )
                out_mid.extend(m for m, _ in members)
                out_w.extend([w] * bsz)
                out_h.extend([h] * bsz)
                out_mean.extend(means.tolist())
                out_hash.extend(hashes.tolist())
            yield pd.DataFrame(
                {
                    "media_id": out_mid,
                    "width": out_w,
                    "height": out_h,
                    "mean_luma": out_mean,
                    "ahash": out_hash,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, width int, height int, mean_luma double, ahash long"
    )
