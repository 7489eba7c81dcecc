"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker processes columnar batches, not
rows. Two formats decode for REAL with stdlib-only codecs
(`extensions/codecs.py`): non-interlaced 8-bit PNG and PCM-16 WAV —
bytes in, pixel/sample arrays out, real features (dimensions, mean
luma, duration, RMS). Other formats (JPEG, video containers) fall back
to byte-level features; swapping in PIL/pyav touches only `_decode`,
never the Spark plumbing.

Scale notes: media blobs dominate partition size, so the reader should
set ``spark.sql.files.maxPartitionBytes`` low enough that one batch of
decoded frames fits executor memory; `mapInPandas` streams batches so
peak memory is one Arrow batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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

from aws_imdb_data_pipeline_spark.extensions.codecs import (
    decode_png,
    decode_wav_pcm16,
    encode_png,
    encode_wav_pcm16,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_hash", LongType(), True),
        StructField("feature_dim", IntegerType(), True),
        # real decode outputs (null when the format isn't decodable)
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
    ]
)

_NULL_FEATURES = {
    "width": None,
    "height": None,
    "mean_luma": None,
    "n_samples": None,
    "sample_rate": None,
    "duration_ms": None,
    "rms": None,
}


def _decode(payload: bytes | None, kind: str, mime: str | None) -> dict:
    """Decode kernel: real PNG/WAV decode, byte-level fallback otherwise.

    Never raises on bad payloads — an undecodable blob yields only the
    byte-level features (at 100 TB some corruption is a statistical
    certainty; a poison payload must not kill the stage)."""
    out = {"payload_bytes": 0, "payload_hash": 0, "feature_dim": 0, **_NULL_FEATURES}
    if payload is None:
        return out
    data = bytes(payload)
    out.update(
        payload_bytes=len(data),
        # cheap deterministic content hash (FNV-1a 64)
        payload_hash=_fnv1a64(data),
        feature_dim={"image": 512, "audio": 128, "video": 768}.get(kind, 0),
    )
    try:
        if mime == "image/png":
            px = decode_png(data)
            h, w, _c = px.shape
            out.update(width=w, height=h, mean_luma=round(float(px.mean()), 4))
        elif mime == "audio/wav":
            arr, rate = decode_wav_pcm16(data)
            n = int(arr.shape[0])
            rms = float(np.sqrt(np.mean(arr[:, 0].astype(np.float64) ** 2))) if n else 0.0
            out.update(
                n_samples=n,
                sample_rate=rate,
                duration_ms=n * 1000 // rate,
                rms=round(rms, 4),
            )
    except Exception:  # noqa: BLE001 — poison payloads yield byte features
        pass
    return out


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-batch pandas function is the only Python in the plan; all
    filtering/joins around it stay JVM-side.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields[2:]]
        for pdf in it:
            mimes = pdf["mime"] if "mime" in pdf.columns else [None] * len(pdf)
            feats = [
                _decode(p, k, m)
                for p, k, m in zip(pdf["payload"], pdf["kind"], mimes)
            ]
            out = pd.DataFrame(feats, columns=cols)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: REAL PNG payloads for the
    image rows, REAL PCM WAV for the audio rows, opaque bytes (no
    stdlib codec exists) for the video rows."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        rng = np.random.default_rng(1000 + i)
        if kind == "image":
            w, h = 8 + (i % 5), 6 + (i % 4)
            payload = encode_png(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
            rows.append((i, kind, payload, "image/png", w, h, None))
        elif kind == "audio":
            n_samp = 100 + (i % 7) * 50
            samples = rng.integers(-2000, 2000, size=n_samp).astype(np.int16)
            payload = encode_wav_pcm16(samples, 8000)
            rows.append((i, kind, payload, "audio/wav", None, None, n_samp * 1000 // 8000))
        elif i % 6 == 5:
            # undecodable video payload — keeps the poison path honest
            payload = bytes((i * 7 + j) % 256 for j in range(32 + (i % 5) * 16))
            rows.append((i, kind, payload, "application/x-video", 64, 64, 1000))
        else:
            from aws_imdb_data_pipeline_spark.extensions.codecs import (
                encode_framepack,
            )

            n_frames = 2 + (i % 4)
            frames = [
                encode_png(
                    rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
                )
                for _ in range(n_frames)
            ]
            payload = encode_framepack(frames, 40)
            rows.append(
                (i, kind, payload, "video/x-framepack", 8, 6, n_frames * 40)
            )
    # 4 pickled slices, not defaultParallelism: every evaluation of a
    # parallelized local frame is one Python round-trip per slice, and
    # the corpus is re-read under several consumers per query. The
    # repartition(4, "media_id") below keeps the deterministic hash
    # placement downstream operators rely on.
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), MEDIA_SCHEMA
    ).repartition(4, "media_id")


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("orig_width", IntegerType(), True),
        StructField("orig_height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of PNG payloads, Arrow-batched.

    Full real round trip per row: decode PNG → index-map resize
    (codecs.resize_nearest; the (y*h)//out_h mapping the SQL oracle
    mirrors) → re-encode PNG → decode AGAIN for the reported
    mean_luma, so the output stats describe the actual emitted
    payload, not the intermediate array. Undecodable payloads yield a
    row with NULL dims/payload (poison-safe, same policy as _decode).
    """
    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_png,
        encode_png,
        resize_nearest,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid, "orig_width": None, "orig_height": None,
                    "width": None, "height": None, "mean_luma": None,
                    "payload": None,
                }
                try:
                    px = decode_png(bytes(payload))
                    small = resize_nearest(px, out_w, out_h)
                    blob = encode_png(small)
                    back = decode_png(blob)
                    row.update(
                        orig_width=px.shape[1], orig_height=px.shape[0],
                        width=back.shape[1], height=back.shape[0],
                        mean_luma=float(back.mean()), payload=blob,
                    )
                except Exception:  # noqa: BLE001 — poison payloads → NULL row
                    pass
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("hash_hi", LongType(), True),
        StructField("hash_lo", LongType(), True),
        StructField("n_set", IntegerType(), True),
    ]
)


def ahash_images(
    media: DataFrame, hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual average-hash (aHash) per PNG payload: decode →
    nearest-index resize to (hash_w, hash_h) — the SAME index map the
    resize operator and its SQL oracle pin — → gray = channel mean →
    bit b=(y*hash_w+x) set iff gray(y,x) > mean(gray). Emitted as two
    unsigned 32-bit halves in longs (``hash_hi`` = bits 32..63,
    ``hash_lo`` = bits 0..31) so an exact SQL oracle never fights
    64-bit sign overflow; recombine with ``shiftleft(hash_hi,32) |
    hash_lo`` for the banded hamming kernel
    (extensions.dedup.hamming_near_dup_pairs). The mean is an exact
    power-of-two division (Σ/64), so the threshold comparison is
    bit-deterministic across engines. Undecodable payloads yield NULL
    hash columns (the _decode poison policy)."""
    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_png,
        resize_nearest,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid, "hash_hi": None, "hash_lo": None,
                    "n_set": None,
                }
                try:
                    px = decode_png(bytes(payload))
                    small = resize_nearest(px, hash_w, hash_h)
                    gray = small.mean(axis=2)
                    bits = (gray > gray.mean()).reshape(-1)
                    lo = hi = 0
                    for b, on in enumerate(bits):
                        if on:
                            if b < 32:
                                lo |= 1 << b
                            else:
                                hi |= 1 << (b - 32)
                    row.update(
                        hash_hi=hi, hash_lo=lo, n_set=int(bits.sum())
                    )
                except Exception:  # noqa: BLE001 — poison payloads → NULL row
                    pass
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("fp", IntegerType(), True),
        StructField("n_set", IntegerType(), True),
    ]
)


def audio_fingerprint(media: DataFrame, n_frames: int = 16) -> DataFrame:
    """Energy-profile audio fingerprint per PCM-16 WAV payload: decode
    → split samples into ``n_frames`` contiguous frames (sample i →
    frame (i*n_frames)//n) → bit f set iff frame f's MEAN sample
    exceeds the global mean. The comparison is evaluated as the
    integer cross-product ``frame_sum * n > total_sum * frame_len`` —
    no float anywhere, so an exact SQL oracle can reproduce every bit.
    The audio sibling of the image aHash: a coarse loudness contour
    that survives re-encoding, keyed for exact/bucketed dedup.
    Undecodable payloads yield the NULL row."""
    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_wav_pcm16,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid, "n_samples": None, "fp": None,
                    "n_set": None,
                }
                try:
                    arr, _rate = decode_wav_pcm16(bytes(payload))
                    s = arr[:, 0].astype(np.int64)
                    n = len(s)
                    if n == 0:
                        row.update(n_samples=0, fp=0, n_set=0)
                    else:
                        idx = (np.arange(n) * n_frames) // n
                        total = int(s.sum())
                        fp = n_set = 0
                        for f in range(n_frames):
                            mask = idx == f
                            cnt = int(mask.sum())
                            if cnt and int(s[mask].sum()) * n > total * cnt:
                                fp |= 1 << f
                                n_set += 1
                        row.update(n_samples=n, fp=fp, n_set=n_set)
                except Exception:  # noqa: BLE001 — poison payloads → NULL
                    pass
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FP_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Sample every ``every_n``-th frame from FPK1 video payloads —
    the 1→N explode of the multimodal family (one input row yields a
    row per sampled frame; Arrow batches keep peak memory at one
    batch of decoded frames, not one video). Each sampled frame is
    REALLY parsed out of the container and PNG-decoded for its stats;
    undecodable containers contribute zero rows (poison-safe), which
    is the correct semantics for an explode."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    from aws_imdb_data_pipeline_spark.extensions.codecs import (
        decode_framepack,
        decode_png,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, interval_ms = decode_framepack(bytes(payload))
                except Exception:  # noqa: BLE001 — not a framepack → no rows
                    continue
                for idx in range(0, len(frames), every_n):
                    try:
                        px = decode_png(frames[idx])
                        w, h, luma = px.shape[1], px.shape[0], float(px.mean())
                    except Exception:  # noqa: BLE001 — poison frame
                        w = h = luma = None
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": idx,
                            "ts_ms": idx * interval_ms, "width": w,
                            "height": h, "mean_luma": luma,
                            "frame": frames[idx],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )
