"""Multimodal plumbing: distributed generation, Arrow batch shape,
deterministic features, frame-sampling plan (SURVEY §2.B north star)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_mllib_twitter_spark.operators import multimodal


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.synthetic_assets(spark, n=256).cache()


def test_assets_schema_and_determinism(spark, assets):
    assert assets.schema == multimodal.ASSET_SCHEMA
    assert assets.count() == 256
    # regenerating yields byte-identical payloads (seeded, id-derived)
    again = multimodal.synthetic_assets(spark, n=256)
    a = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    b = {r.asset_id: bytes(r.payload) for r in again.collect()}
    assert a == b
    # metadata consistent with payload
    bad = assets.filter(F.length("payload") != F.col("meta.n_bytes")).count()
    assert bad == 0


def test_generation_is_distributed(assets):
    """The generator must not funnel through one task: with spark.range's
    default parallelism the asset table spans multiple partitions."""
    assert assets.rdd.getNumPartitions() > 1


def test_extract_features_deterministic_and_normalized(assets):
    feats = multimodal.extract_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 256
    for r in rows.values():
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-9  # histogram sums to 1
    # pure function of payload: re-running matches
    again = {r.asset_id: r.features for r in multimodal.extract_features(assets).collect()}
    assert {k: v.features for k, v in rows.items()} == again


def test_real_decoder_is_clearly_stubbed(assets):
    with pytest.raises(multimodal.DecoderNotAvailable):
        multimodal.extract_features(assets, use_real_decoder=True)


def test_resize_updates_images_passes_through_rest(assets):
    out = multimodal.resize_assets(assets, 32, 32)
    assert out.schema == multimodal.ASSET_SCHEMA
    rows = {r.asset_id: r for r in out.collect()}
    orig = {r.asset_id: r for r in assets.collect()}
    assert rows.keys() == orig.keys()
    for aid, r in rows.items():
        if r.mime.startswith("image/"):
            assert r.meta.width == 32 and r.meta.height == 32
            assert len(r.payload) == r.meta.n_bytes == max(16, 32 * 32 // 64)
        else:  # non-image passes through byte-identical
            assert bytes(r.payload) == bytes(orig[aid].payload)
            assert r.meta == orig[aid].meta
    # deterministic: re-running produces identical payloads
    again = {r.asset_id: bytes(r.payload) for r in multimodal.resize_assets(assets, 32, 32).collect()}
    assert {k: bytes(v.payload) for k, v in rows.items()} == again
    with pytest.raises(multimodal.DecoderNotAvailable):
        multimodal.resize_assets(assets, 32, 32, use_real_decoder=True)


def test_frame_sample_plan_counts(assets):
    plan = multimodal.frame_sample_plan(assets, every_ms=1000)
    got = {
        (r.asset_id): r.n for r in plan.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r.asset_id: (r.meta.duration_ms // 1000) + 1
        for r in assets.collect()
        if r.mime.startswith(("video/", "audio/"))
    }
    assert got == want


def test_audio_features_are_spectral(spark, assets):
    """Audio assets must go through the FFT band path: L1-normalized 8-dim
    features (sum to 1), deterministic across runs, and distinct from the
    byte-histogram path the same payload would produce as an image."""
    from pyspark.sql import functions as F

    feats = multimodal.extract_features(assets)
    audio = feats.filter(F.col("mime").startswith("audio/")).collect()
    assert audio, "fixture generator must emit audio assets"
    for r in audio:
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-9
    again = {
        r.asset_id: r.features
        for r in multimodal.extract_features(assets)
        .filter(F.col("mime").startswith("audio/"))
        .collect()
    }
    assert {r.asset_id: r.features for r in audio} == again
