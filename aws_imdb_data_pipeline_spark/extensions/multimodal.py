"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lake as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker processes columnar batches, not
rows. The media codec libraries are not available in this container,
so the decode kernels are STUBS (deterministic fakes) behind the real
Spark plumbing — schema, batching, partitioning are production-shaped.

Scale notes: media blobs dominate partition size, so the reader should
set ``spark.sql.files.maxPartitionBytes`` low enough that one batch of
decoded frames fits executor memory; `mapInPandas` streams batches so
peak memory is one Arrow batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> dict:
    """STUB decode kernel. Real implementation would dispatch to
    PIL/torchaudio/pyav; deterministic fake keeps tests meaningful."""
    if payload is None:
        return {"payload_bytes": 0, "payload_hash": 0, "feature_dim": 0}
    return {
        "payload_bytes": len(payload),
        # cheap deterministic content hash (FNV-1a 64)
        "payload_hash": _fnv1a64(payload),
        "feature_dim": {"image": 512, "audio": 128, "video": 768}.get(kind, 0),
    }


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
        for pdf in it:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no codec libs in env)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(32 + (i % 5) * 16))
        rows.append((i, kind, payload, f"application/x-{kind}", 64, 64, 1000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4, "media_id")
