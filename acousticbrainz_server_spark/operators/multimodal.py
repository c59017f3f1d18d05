"""Multimodal column operators for the training-data pipeline.

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` kernels.  The actual codec libraries (PIL,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels are
STUBBED: ``decode_image``/``decode_audio`` raise NotImplementedError stating
the contract, and ``fake_decode_image``/``fake_decode_audio`` are
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
