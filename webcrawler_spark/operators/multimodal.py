"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schema, Arrow batching, partition-friendly
feature extraction); the actual codec work is isolated behind
``_decode_payload`` — the image/audio libraries are NOT in this container,
so decode runs a deterministic fallback (byte-level features) and raises
``NotImplementedError`` only for ``mode="codec"``. Swapping in PIL/ffmpeg
later changes ONE function, not the pipeline.

Assets table schema:
  asset_id:long, kind:string ('image'|'audio'|'video'), payload:binary,
  meta:map<string,string>
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),  # 16 bins
        T.StructField("content_hash", T.StringType()),
        T.StructField("frames_sampled", T.IntegerType()),
    ]
)


def _decode_payload(kind: str, payload: bytes, mode: str = "bytes") -> np.ndarray:
    """Codec boundary. mode='bytes' => deterministic byte-level view (always
    available); mode='codec' => real decode, NOT available in this container.
    """
    if mode == "codec":
        raise NotImplementedError(
            "real image/audio/video decoding requires PIL/soundfile/ffmpeg, "
            "not installed in this environment — plug the codec in here"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def _frame_sample(data: np.ndarray, kind: str, max_frames: int = 8) -> list[np.ndarray]:
    """Deterministic frame/window sampling: equally spaced fixed-size slices
    (the video-frame / audio-window analog at the byte level)."""
    if len(data) == 0:
        return []
    n = min(max_frames, max(1, len(data) // 256))
    starts = np.linspace(0, max(0, len(data) - 256), n).astype(np.int64)
    return [data[s : s + 256] for s in starts]


def extract_features(assets: DataFrame, mode: str = "bytes") -> DataFrame:
    """assets -> per-asset features via one Arrow pass (vectorized numpy)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {name: [] for name in
                    ("asset_id", "kind", "n_bytes", "byte_entropy",
                     "histogram", "content_hash", "frames_sampled")}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                data = _decode_payload(kind, bytes(payload or b""), mode)
                frames = _frame_sample(data, kind)
                hist = np.zeros(16, dtype=np.float64)
                if len(data):
                    counts = np.bincount(data >> 4, minlength=16).astype(np.float64)
                    hist = counts / counts.sum()
                    p = hist[hist > 0]
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                rows["asset_id"].append(int(aid))
                rows["kind"].append(kind)
                rows["n_bytes"].append(len(data))
                rows["byte_entropy"].append(round(entropy, 6))
                rows["histogram"].append(hist.round(6).tolist())
                rows["content_hash"].append(
                    hashlib.sha256(bytes(payload or b"")).hexdigest()
                )
                rows["frames_sampled"].append(len(frames))
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def synth_assets(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake assets derived from document text bytes (test/demo
    fixture: payload = utf-8 bytes, kind round-robins image/audio/video)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
