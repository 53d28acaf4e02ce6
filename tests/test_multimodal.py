import pytest

from medical_and_charity_document_extraction_system_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    deterministic_features,
    extract_media_features,
    FEATURE_DIM,
)

from .conftest import SF_SMALL


def test_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


def test_feature_plumbing_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    media = attach_fake_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.features)
        assert r.n_bytes > 0
        assert r.kind in ("image", "audio", "video")


def test_features_deterministic():
    a = deterministic_features(b"payload-123")
    b = deterministic_features(b"payload-123")
    c = deterministic_features(b"payload-124")
    assert a == b != c
