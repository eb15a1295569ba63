"""Multimodal plumbing tests: binary columns, Arrow-batched feature
extraction (stubbed decode), frame-sample fan-out."""

import pytest
from pyspark.sql import functions as F

from goskema_spark.ops.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_feature_extract,
    frame_sample_plan,
    synth_media,
)

SF = "/root/testdata/sf0.001"


def test_media_schema_and_payload(spark):
    media = synth_media(spark, SF)
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert row["kind"] in ("image", "audio", "video")
    assert isinstance(bytes(row["payload"]), bytes) and len(row["payload"]) > 0
    assert row["meta"]["mime"].startswith("application/x-fake-")


def test_extract_features_deterministic(spark):
    media = synth_media(spark, SF)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert all(len(r["features"]) == FEATURE_DIM for r in rows.values())
    assert all(-1.0 <= v <= 1.0 for r in rows.values() for v in r["features"])
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[0]["sha"] == again[0]["sha"]
    assert rows[0]["features"] == again[0]["features"]
    # payload-identical rows get identical features (pure function)
    local = fake_feature_extract(b"hello")
    assert fake_feature_extract(b"hello") == local


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
    media = synth_media(spark, SF).limit(2)
    with pytest.raises(Exception):  # decoder errors surface from the executor
        extract_features(media, decoder=decode_image).collect()


def test_custom_decoder_injection(spark):
    media = synth_media(spark, SF).limit(5)
    feats = extract_features(media, decoder=lambda b: b[:4]).collect()
    assert all(r["n_bytes"] == 4 for r in feats)


def test_frame_sample_plan(spark):
    media = synth_media(spark, SF)
    plan = frame_sample_plan(media, every_ms=1000, max_frames=8)
    rows = plan.collect()
    assert rows and all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    per = plan.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in per)
    # only videos are sampled
    kinds = dict(media.select("media_id", "kind").collect())
    assert all(kinds[r["media_id"]] == "video" for r in rows)
