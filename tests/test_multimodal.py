"""Multimodal plumbing tests (north star §2.11): schema, Arrow batch
shape, decode determinism, feature wiring into similarity search, frame
sampling row expansion, and the codec-stub failure mode."""

from __future__ import annotations

import pytest

from etl_airbnb_mex_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = make_fake_media(spark, 30)
    df.persist()
    yield df
    df.unpersist()


def test_media_schema(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_deterministic(media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(rows) == 30
    # payload sizes follow the construction: 64 + 16*(id%5) bytes
    assert rows[0]["n_bytes"] == 10 + 64           # magic + payload
    assert len(rows[0]["pixels"]) == 64
    assert len(rows[4]["pixels"]) == 64 + 16 * 4
    # determinism: re-decode equals first decode
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert rows[7]["pixels"] == again[7]["pixels"]


def test_features_feed_knn(media, spark):
    """Features are array<double> and plug straight into knn_cosine."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.operators.similarity import knn_cosine

    feats = extract_features(media, dim=8)
    row = feats.collect()[0]
    assert len(row["features"]) == 8
    emb = feats.select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = knn_cosine(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(top) == 5
    assert all(r["vec_id"] != 0 for r in top)


def test_resize_updates_meta(media):
    out = resize_images(media, 8, 6).collect()
    assert len(out) == 10                      # only image rows
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 6 for r in out)


def test_sample_frames_expands_rows(media):
    frames = sample_frames(media, every_n=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert len(by_media) == 10                 # video rows only
    for nos in by_media.values():
        assert nos == [0, 2, 4, 6]             # every 2nd of 8 frames


def test_codec_stub_raises_on_real_data(spark):
    """Foreign payloads hit the clearly-marked NotImplementedError —
    the documented stub boundary, not silent garbage."""
    df = spark.createDataFrame(
        [(99, "image", b"\x89PNG\r\n...", (1, 1, None, 1, "png"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)real media decoding"):
        decode_media(df).collect()
