"""Multimodal plumbing tests: schema/batch shapes real, decode stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduputil_spark.operators.multimodal import (
    image_features,
    media_exact_dedup,
    repartition_for_fat_rows,
    sample_video_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n_assets=60).cache()


def test_image_features_shape(media):
    feats = image_features(media)
    rows = feats.collect()
    assert rows
    for r in rows:
        assert r["width"] >= 64 and r["height"] >= 64
        assert len(r["feature"]) == 16
    # deterministic: rerun identical
    again = {r["asset_id"]: r["feature"] for r in image_features(media).collect()}
    for r in rows:
        assert again[r["asset_id"]] == r["feature"]


def test_strict_mode_raises(media):
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        image_features(media, strict=True).collect()


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, n_frames=4)
    per = frames.groupBy("asset_id").count().collect()
    assert per
    for r in per:
        assert 1 <= r["count"] <= 4


def test_media_exact_dedup_finds_planted_dups(media):
    groups = media_exact_dedup(media)
    dup_groups = groups.filter(F.col("n_copies") > 1).collect()
    planted = media.filter(F.col("asset_id").endswith("_dup")).count()
    assert len(dup_groups) == planted
    for g in dup_groups:
        assert g["keeper_asset"] == sorted(g["asset_ids"])[0]


def test_repartition_by_payload_bytes(media):
    out = repartition_for_fat_rows(media, target_bytes_per_partition=10_000)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == media.count()
