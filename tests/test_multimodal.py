"""Multimodal plumbing tests: Arrow batch shape, schema, cardinality
contracts — the decode itself is a deterministic stub (no media libs
in this container)."""

from __future__ import annotations

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    multimodal,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", bytes(range(64)), {"w": "8", "h": "8"}),
        (2, "audio", "audio/wav", b"\x01\x02" * 100, {"sr": "16000"}),
        (3, "video", "video/mp4", bytes(range(200)), {"fps": "30"}),
        (4, "image", "image/png", None, None),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark):
    df = _media(spark)
    out = multimodal.extract_features(df)
    assert out.schema == multimodal.FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].n_bytes == 64
    assert len(rows[1].feature) == 8
    assert rows[4].n_bytes == 0 and rows[4].sha_prefix is None
    # deterministic: same input → same features
    again = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert rows[1].feature == again[1].feature
    assert rows[1].sha_prefix == again[1].sha_prefix


def test_frame_sample_cardinality(spark):
    out = multimodal.frame_sample(_media(spark), every_n=10).collect()
    assert all(r.media_id == 3 for r in out)  # only the video row explodes
    assert len(out) == 8  # 200 bytes / 10 → 20 frames, capped at 8 by the stub
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == list(range(8))


def test_media_stats_jvm_only(spark):
    stats = {r.kind: r for r in multimodal.media_stats(_media(spark)).collect()}
    assert stats["image"].n_media == 2
    assert stats["audio"].total_bytes == 200
    assert stats["video"].max_bytes == 200


def test_resize_images_shape_and_meta(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        multimodal as mm,
    )

    rows = [
        (1, "image", "image/png", bytes(range(256)) * 3000, {"src": "cam1"}),
        (2, "video", "video/mp4", b"\x00" * 100, None),
        (3, "image", "image/jpeg", None, None),
    ]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.resize_images(df, width=8, height=8).collect()
    by_id = {r.media_id: r for r in out}
    assert set(by_id) == {1, 3}                      # only image rows
    assert len(by_id[1].payload) == 8 * 8 * 3        # stub budget applied
    assert by_id[1].meta["resized_w"] == "8"
    assert by_id[1].meta["src"] == "cam1"            # original meta preserved
    assert by_id[3].payload is None                  # null payload survives
