"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schema, Arrow batching, partition-friendly
feature extraction); the actual codec work is isolated behind
``_decode_payload``. ``mode="bytes"`` is the always-available byte-level
view; ``mode="codec"`` runs REAL pure-numpy decoders for the trivial
containers parseable without external libraries — binary PPM (P6) images,
PCM WAV (8/16-bit) audio, and concatenated-P6 "video" streams — and raises
``NotImplementedError`` for anything else (JPEG/MP3/MP4 need PIL/ffmpeg,
not in this container). Swapping in richer codecs changes ONE function,
not the pipeline; the codec branch itself is exercised under pytest on
synthesized PPM/WAV fixtures (tests/test_operators_extra.py).

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


import re

# comments ('#...' to end-of-line) may appear, repeatedly, at any header gap
_PPM_GAP = rb"(?:#[^\n]*\s+)*"
_PPM_HEADER = re.compile(
    rb"P6\s+" + _PPM_GAP + rb"(\d+)\s+" + _PPM_GAP + rb"(\d+)\s+" + _PPM_GAP + rb"(\d+)\s"
)


def _decode_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Binary PPM (P6): header 'P6 <w> <h> <maxval>' + w*h*3 raster bytes.
    Returns (flat uint8 pixels, end offset) so streams can be walked."""
    m = _PPM_HEADER.match(payload, offset)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise NotImplementedError("16-bit PPM rasters not supported")
    n = w * h * 3
    if len(payload) - m.end() < n:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(payload, np.uint8, count=n, offset=m.end()), m.end() + n


def _decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV (RIFF/WAVE, 8- or 16-bit): samples as a uint8 view (16-bit
    samples are shifted to their high byte so downstream byte-level features
    stay type-stable across modalities)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(payload):
            # mirror _decode_ppm's truncation check: a short data chunk must
            # fail loudly, not decode into plausible-but-wrong features
            raise ValueError("truncated RIFF chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only mono PCM 8/16-bit WAV (fmt={audio_format}, "
            f"channels={channels}, bits={bits})"
        )
    if bits == 8:
        return np.frombuffer(data, np.uint8)
    samples = np.frombuffer(data[: len(data) & ~1], "<i2").astype(np.int32)
    return ((samples + 32768) >> 8).astype(np.uint8)


def _decode_ppm_stream(payload: bytes) -> np.ndarray:
    """'Video' container: back-to-back P6 frames; decoded frames concatenate
    into one sample array (frame boundaries re-emerge via _frame_sample)."""
    frames, off = [], 0
    while off < len(payload):
        frame, off = _decode_ppm(payload, off)
        frames.append(frame)
    if not frames:
        raise ValueError("empty PPM stream")
    return np.concatenate(frames)


def _decode_payload(kind: str, payload: bytes, mode: str = "bytes") -> np.ndarray:
    """Codec boundary. mode='bytes' => deterministic byte-level view (always
    available); mode='codec' => real pure-numpy decode for PPM / PCM-WAV /
    concatenated-PPM payloads, NotImplementedError beyond those."""
    if mode == "codec":
        try:
            if kind == "image":
                return _decode_ppm(payload)[0]
            if kind == "audio":
                return _decode_wav(payload)
            if kind == "video":
                return _decode_ppm_stream(payload)
        except ValueError as exc:
            raise NotImplementedError(
                f"codec mode decodes PPM/PCM-WAV/PPM-stream only; this "
                f"{kind} payload needs a real codec (PIL/soundfile/ffmpeg, "
                f"not installed here): {exc}"
            ) from exc
        raise NotImplementedError(f"unknown asset kind {kind!r}")
    return np.frombuffer(payload, dtype=np.uint8)


def _frame_sample(data: np.ndarray, kind: str, max_frames: int = 8) -> list[np.ndarray]:
    """Deterministic frame/window sampling: equally spaced fixed-size slices
    (the video-frame / audio-window analog at the byte level)."""
    if len(data) == 0:
        return []
    n = min(max_frames, max(1, len(data) // 256))
    starts = np.linspace(0, max(0, len(data) - 256), n).astype(np.int64)
    return [data[s : s + 256] for s in starts]


def extract_features(
    assets: DataFrame, mode: str = "bytes", profile: bool = False
) -> DataFrame:
    """assets -> per-asset features via one Arrow pass (vectorized numpy).

    ``profile=True`` adds a ``profile`` column: the decoded sample array as
    a CENTERED integer vector (n*x_i - sum(x), exact int64 arithmetic — no
    float rounding to desynchronize engines), the content feature the
    near-dup path scores cosine over. Centering matters: raw byte vectors
    are all-positive with a dominant mean component, so their cosines
    crowd toward 1 regardless of content; the centered cosine is the
    Pearson correlation, ~0 for unrelated content. Sized for fixed-dim
    thumbnail-normalized assets (16x16 here); at 100 TB the profile column
    exists only on the thumbnail stage table, never on raw payloads."""
    import hashlib

    names = ["asset_id", "kind", "n_bytes", "byte_entropy",
             "histogram", "content_hash", "frames_sampled"]
    schema = FEATURE_SCHEMA
    if profile:
        names.append("profile")
        schema = T.StructType(
            FEATURE_SCHEMA.fields
            + [T.StructField("profile", T.ArrayType(T.LongType()))]
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {name: [] for name in names}
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
                if profile:
                    d64 = data.astype(np.int64)
                    rows["profile"].append(
                        (len(d64) * d64 - d64.sum()).tolist()
                    )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        gen, schema=schema
    )


def encode_ppm(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic binary-PPM fixture (valid P6, formula raster)."""
    raster = ((np.arange(w * h * 3, dtype=np.int64) * 31 + seed * 97) % 256)
    return f"P6\n{w} {h}\n255\n".encode() + raster.astype(np.uint8).tobytes()


def encode_wav(n_samples: int, seed: int = 0, rate: int = 8000) -> bytes:
    """Deterministic PCM-16 mono WAV fixture (valid RIFF, formula samples)."""
    s = ((np.arange(n_samples, dtype=np.int64) * (1234 + seed * 7)) % 65536
         - 32768).astype("<i2")
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def synth_codec_assets(spark, n: int) -> DataFrame:
    """Deterministic decodable assets: PPM images, PCM WAVs, and 3-frame PPM
    streams, round-robin by asset_id — the codec-mode counterpart of
    synth_assets (which yields opaque text bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            payload = encode_ppm(8 + i % 5, 6 + i % 4, seed=i)
        elif kind == "audio":
            payload = encode_wav(256 + 32 * (i % 7), seed=i)
        else:
            payload = b"".join(encode_ppm(6, 4, seed=i * 10 + f) for f in range(3))
        rows.append((i, kind, payload, {"seed": str(i)}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# ---- planted image near-dup corpus + detection -------------------------
#
# Deterministic "web image" corpus keyed by doc_id, with planted near-dups:
# every doc_id % IMG_COPY_MOD == 0 (and > 0) is a lightly perturbed copy of
# doc_id - 1's image (~1% of nibbles changed). Rasters are md5-derived so
# they are pseudo-random (no modular-arithmetic aliasing between seeds) AND
# closed-form reproducible in ANSI SQL (DuckDB md5() == hashlib.md5) — the
# oracle recomputes them brute-force from doc_ids alone.

IMG_W = IMG_H = 16
IMG_N = IMG_W * IMG_H * 3          # 768 raster bytes
IMG_MD5_BLOCKS = IMG_N // 32       # 24 md5 hexdigests of 32 chars
IMG_COPY_MOD = 7                   # doc_id % 7 == 0 => near-copy of doc_id-1
IMG_PERTURB_MOD = 97               # copies perturb nibbles where (i+d)%97==0


def _planted_nibbles(doc_id: int, prefix: str) -> np.ndarray:
    """768 nibble values (0..15) for a doc's asset; copies perturb ~8.
    ``prefix`` namespaces the md5 stream per modality ('img' / 'aud') so an
    image and an audio asset of the same doc never alias."""
    s = doc_id - 1 if (doc_id % IMG_COPY_MOD == 0 and doc_id > 0) else doc_id
    import hashlib

    hx = "".join(
        hashlib.md5(f"{prefix}:{s}:{k}".encode()).hexdigest()
        for k in range(IMG_MD5_BLOCKS)
    )
    v = np.frombuffer(hx.encode(), np.uint8).astype(np.int64)
    v = np.where(v >= ord("a"), v - ord("a") + 10, v - ord("0"))
    if doc_id % IMG_COPY_MOD == 0 and doc_id > 0:
        i = np.arange(IMG_N)
        mask = (i + doc_id) % IMG_PERTURB_MOD == 0
        v = np.where(mask, (v + 1 + doc_id % 11) % 16, v)
    return v


def _image_nibbles(doc_id: int) -> np.ndarray:
    return _planted_nibbles(doc_id, "img")


def _audio_nibbles(doc_id: int) -> np.ndarray:
    return _planted_nibbles(doc_id, "aud")


def _wav8_payload(samples: np.ndarray) -> bytes:
    """Valid mono 8-bit PCM RIFF/WAVE container around raw sample bytes."""
    data = samples.astype(np.uint8).tobytes()
    rate = 8000
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + rate.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    chunks = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
              + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def _synth_planted_assets(spark, ids: DataFrame, kind: str) -> DataFrame:
    """Shared fixture generator: planted-near-dup assets in a REAL container
    per modality (P6 PPM rasters / 8-bit PCM WAV samples), one Arrow pass."""
    ppm_header = f"P6\n{IMG_W} {IMG_H}\n255\n".encode()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "kind": [], "payload": [], "meta": []}
            for d in pdf["doc_id"]:
                d = int(d)
                if kind == "image":
                    payload = ppm_header + _image_nibbles(d).astype(np.uint8).tobytes()
                else:
                    payload = _wav8_payload(_audio_nibbles(d))
                rows["asset_id"].append(d)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append({"seed": str(d)})
            yield pd.DataFrame(rows)

    return ids.select(F.col("doc_id").cast("long")).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )


def synth_image_corpus(spark, ids: DataFrame) -> DataFrame:
    """ids(doc_id) -> planted-near-dup image assets: valid P6 PPM payloads
    whose 16x16 rasters are md5-derived nibble streams."""
    return _synth_planted_assets(spark, ids, "image")


def synth_audio_corpus(spark, ids: DataFrame) -> DataFrame:
    """ids(doc_id) -> planted-near-dup audio assets: valid mono 8-bit PCM
    WAVs whose 768 samples are md5-derived nibble streams ('aud' stream —
    disjoint from the image stream)."""
    return _synth_planted_assets(spark, ids, "audio")


def asset_dup_pairs(
    assets: DataFrame,
    kind: str,
    threshold: float = 0.9,
    n_tables: int = 48,
    n_bits: int = 12,
    seed: int = 42,
    max_bucket: int = 5000,
) -> DataFrame:
    """Content near-dup pairs (asset_id_a < asset_id_b, cosine) over the
    REAL codec branch of one modality: decode payloads (P6 rasters / PCM
    samples / PPM streams), take centered sample profiles, generate
    candidates with hyperplane-LSH (similarity.py — modality-agnostic; the
    only shuffle is by (table, sig) bucket key, no crossJoin), and
    exact-rescore with int64 dot products so both engines agree
    bit-for-bit. At the default threshold 0.9 a qualifying pair is missed
    by all 48 tables with p < ~3e-4 worst-case at the boundary and < 1e-9
    for the planted-copy regime (cosine >= ~0.97); rescoring makes
    precision exactly 1. The LSH path requires fixed-dim profiles
    (thumbnail/window-normalized assets)."""
    from webcrawler_spark.operators.similarity import lsh_candidate_pairs

    feats = (
        extract_features(assets.filter(F.col("kind") == kind),
                         mode="codec", profile=True)
        .select("asset_id", "profile")
        .persist()
    )
    cand = lsh_candidate_pairs(
        feats.withColumn("pd", F.col("profile").cast("array<double>")),
        n_tables=n_tables, n_bits=n_bits, seed=seed,
        id_col="asset_id", vec_col="pd", max_bucket=max_bucket,
    )
    # round 6: squared norms once per asset (not per candidate row — the
    # threshold filter is pushed into the join condition, so the cosine
    # expression evaluates twice per row; precomputed norms cut each
    # evaluation to one dot product). Identical int64 arithmetic.
    withn = feats.withColumn(
        "_nrm",
        F.aggregate(
            "profile", F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ),
    )
    a = withn.select(
        F.col("asset_id").alias("vec_id_a"),
        F.col("profile").alias("pa"),
        F.col("_nrm").alias("na"),
    )
    b = withn.select(
        F.col("asset_id").alias("vec_id_b"),
        F.col("profile").alias("pb"),
        F.col("_nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("pa", "pb", lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return (
        cand.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn("cosine", F.round(dot / (F.sqrt("na") * F.sqrt("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("vec_id_a").alias("asset_id_a"),
            F.col("vec_id_b").alias("asset_id_b"),
            "cosine",
        )
    )


def image_dup_pairs(assets: DataFrame, threshold: float = 0.9, **kw) -> DataFrame:
    """Image instantiation of asset_dup_pairs (P6 decode path)."""
    return asset_dup_pairs(assets, "image", threshold, **kw)


def audio_dup_pairs(assets: DataFrame, threshold: float = 0.9, **kw) -> DataFrame:
    """Audio instantiation of asset_dup_pairs (PCM-WAV decode path)."""
    return asset_dup_pairs(assets, "audio", threshold, **kw)


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
