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


def _make_wav(freq_hz=440.0, sr=8000, seconds=0.5, channels=1):
    """Tiny real PCM wav built with the stdlib — a genuine RIFF file."""
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([int(20000 * math.sin(2 * math.pi * freq_hz * i / sr))] * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_ppm(w=6, h=4, comment=True):
    """Real binary P6 with a deterministic gradient raster (+ a header
    comment, the spec corner the parser must survive)."""
    header = b"P6\n" + (b"# test comment\n" if comment else b"") + b"%d %d\n255\n" % (w, h)
    raster = bytes((x * 40) % 256 for y in range(h) for x in range(w) for _ in range(3))
    return header + raster


def test_real_wav_decode_features(spark):
    """The WAV path is a REAL decode: duration and spectral shape come
    from the samples, not the container bytes."""
    wav = _make_wav(freq_hz=440.0, sr=8000, seconds=0.5)
    rows = [(1, "audio", "audio/wav", wav, None),
            (2, "audio", "audio/wav", b"\x01\x02" * 100, None)]  # junk → stub
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "wav"
    duration, rms, peak, zcr = out[1].feature[:4]
    assert abs(duration - 0.5) < 1e-6
    assert 0.3 < rms < 0.7          # sine RMS ≈ amplitude/√2 ≈ 0.43
    assert 0.55 < peak <= 0.62      # 20000/32768 ≈ 0.61
    # 440 Hz on 8 kHz: zero crossings ≈ 2·440/8000 ≈ 0.11 per sample
    assert 0.08 < zcr < 0.14
    # spectral energy concentrated in the low bands, not the top band
    bands = out[1].feature[4:]
    assert sum(bands[:3]) > 0.9 and bands[3] < 0.1
    assert out[2].decoder == "stub"  # junk payload honestly labeled


def test_real_netpbm_decode_and_resize(spark):
    """P6 decode reads actual pixels (dims + channel means) and resize
    is a real nearest-neighbor resample re-encoded as P6."""
    ppm = _make_ppm(w=6, h=4)
    rows = [(1, "image", "image/x-portable-pixmap", ppm, {"src": "t"}),
            (2, "image", "image/png", bytes(range(64)), None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "netpbm"
    h, w, mr, mg, mb = out[1].feature[:5]
    assert (h, w) == (4.0, 6.0)
    # gradient: channels identical, mean = mean((x*40)%256 for x in 0..5)
    expected = sum((x * 40) % 256 for x in range(6)) / 6.0
    assert abs(mr - expected) < 1e-4 and mr == mg == mb
    assert out[2].decoder == "stub"

    resized = {r.media_id: r for r in multimodal.resize_images(df, width=3, height=2).collect()}
    assert resized[1].meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized[1].payload))
    assert arr.shape == (2, 3, 3)
    # nearest-neighbor col indices for 6→3: [0, 2, 4] → values 0, 80, 160
    assert [int(v) for v in arr[0, :, 0]] == [0, 80, 160]
    assert resized[2].meta["resample"] == "stub"
    assert len(resized[2].payload) == min(64, 3 * 2 * 3)
