"""Multimodal plumbing: binary payload columns through mapInPandas."""

from __future__ import annotations

from aws_imdb_data_pipeline_spark.extensions.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    synthetic_media,
)


def test_extract_features_schema_and_rows(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 30
    by_kind = {r.kind for r in rows}
    assert by_kind == {"image", "audio", "video"}
    dims = {r.kind: r.feature_dim for r in rows}
    assert dims == {"image": 512, "audio": 128, "video": 768}


def test_payload_hash_deterministic(spark):
    media = synthetic_media(spark, n=12)
    h1 = {r.media_id: r.payload_hash for r in extract_features(media).collect()}
    h2 = {r.media_id: r.payload_hash for r in extract_features(media).collect()}
    assert h1 == h2
    assert len(set(h1.values())) == 12  # distinct payloads → distinct hashes
