"""Multimodal plumbing tests: schema, batch shapes, fan-out, stub gating."""

import pytest

from autoscan_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, 30, seed=1).cache()
    df.count()
    return df


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    again = synthesize_media(spark, 30, seed=1)
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b
    img = media.filter("kind = 'image'").first()
    assert img["meta"]["width"] is not None and img["meta"]["format"] == "png"


def test_decode_stub_raises_without_decoder():
    try:
        import PIL  # noqa: F401

        pytest.skip("decoder present; stub not active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="decode requires"):
        decode_image(b"xx", {})


def test_extract_features_shape(spark, media):
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        vec = [float(x) for x in r["features"].split(",")]
        assert len(vec) == FEATURE_DIM
        assert r["n_bytes"] == 1024


def test_resize_images_only_images(spark, media):
    out = resize_images(media, out_w=8, out_h=8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    assert all(len(bytes(r["payload_out"])) == 64 for r in out)


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) >= n_videos  # ≥1 frame per video
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame idx
