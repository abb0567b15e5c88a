import hashlib

import pytest

from harvester_spark.operators.multimodal import (decode_real,
                                                  extract_features,
                                                  make_media_table,
                                                  resize_images, sample_frames,
                                                  FEATURE_DIM)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_table(spark, n=32).cache()


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media).toPandas().sort_values("media_id")
    assert len(out) == 32
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # deterministic: re-run gives identical features
    out2 = extract_features(media).toPandas().sort_values("media_id")
    assert all((a == b).all() for a, b in
               zip(out["features"], out2["features"]))
    # sha matches payload
    raw = media.toPandas().sort_values("media_id")
    for sha, p in zip(out["payload_sha256"], raw["payload"]):
        assert sha == hashlib.sha256(bytes(p)).hexdigest()


def test_resize_plumbing(media):
    out = resize_images(media, 224, 224).toPandas()
    assert (out["width"] == 224).all() and (out["height"] == 224).all()
    assert set(out["mime"]) <= {"image/png", "image/jpeg"}


def test_sample_frames(media):
    out = sample_frames(media, every_ms=1000).toPandas()
    assert set(out["media_id"]) == set(
        media.filter("mime like 'video%'").toPandas()["media_id"])
    g = out.groupby("media_id")["frame_idx"].agg(["min", "count"])
    assert (g["min"] == 0).all()
    assert (out["ts_ms"] == out["frame_idx"] * 1000).all()


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"xx", "image/png")
