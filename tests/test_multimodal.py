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


# --- r6: real PNG decode (stdlib zlib + numpy) ------------------------------


def _encode_png(arr, ctype, filters=None, plte=None):
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, with the
    FORWARD version of each scanline filter — so decode_png's
    unfiltering is verified against independently-filtered rasters."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    h, w = arr.shape[:2]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    flat = arr.reshape(h, w * channels)
    bpp = channels
    raw = b""
    prev = np.zeros(w * channels, np.int32)
    for y in range(h):
        f = filters[y % len(filters)] if filters else 0
        line = flat[y].astype(np.int32)
        left = np.zeros_like(line)
        left[bpp:] = line[:-bpp]
        ul = np.zeros_like(prev)
        ul[bpp:] = prev[:-bpp]
        if f == 0:
            enc = line
        elif f == 1:
            enc = (line - left) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (line - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return out


def test_png_decode_pixel_exact_all_filters():
    """decode_png reconstructs the raster bit-for-bit under every
    scanline filter type (0-4) and mixed per-row filters."""
    import numpy as np

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        png = _encode_png(arr, ctype=2, filters=filters)
        dec = multimodal.decode_png(png)
        assert dec.shape == (11, 13, 3)
        assert (dec == arr).all(), f"filters={filters}"


def test_png_decode_color_types():
    """Gray(0), gray+alpha(4), RGBA(6) and palette(3) all decode to the
    exact source pixels (palette expands through PLTE)."""
    import numpy as np

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(5, 7, 1), dtype=np.uint8)
    assert (multimodal.decode_png(_encode_png(gray, 0, [1, 4]))[..., 0] == gray[..., 0]).all()

    ga = rng.integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
    assert (multimodal.decode_png(_encode_png(ga, 4, [2, 3])) == ga).all()

    rgba = rng.integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    assert (multimodal.decode_png(_encode_png(rgba, 6, [4])) == rgba).all()

    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 5, 1), dtype=np.uint8)
    dec = multimodal.decode_png(_encode_png(idx, 3, [0, 1], plte=plte))
    assert (dec == plte[idx[..., 0]]).all()


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import numpy as np
    import pytest

    arr = np.zeros((2, 2, 3), np.uint8)
    png = bytearray(_encode_png(arr, 2))
    # IHDR data starts at 8 (sig) + 8 (len+type); depth byte at offset 16+8
    depth_off = 8 + 8 + 8  # w(4) + h(4) before depth
    png16 = bytes(png[:depth_off]) + b"\x10" + bytes(png[depth_off + 1:])
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_png(png16)
    interlaced = bytes(png[:depth_off + 4]) + b"\x01" + bytes(png[depth_off + 5:])
    with pytest.raises(ValueError, match="interlaced"):
        multimodal.decode_png(interlaced)
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"\x89PNX" + b"\x00" * 16)


def test_real_png_decode_and_resize(spark):
    """End-to-end through the Arrow mapInPandas plumbing: PNG payloads
    get decoder='png' provenance with pixel-derived features; resize is
    a real nearest-neighbor over decoded PNG pixels re-encoded as P6;
    an unsupported (16-bit) PNG falls back to the stub honestly."""
    import numpy as np

    # horizontal gradient, identical channels: x -> (x*40) % 256
    w, h = 6, 4
    grad = np.tile((np.arange(w, dtype=np.uint8) * 40)[None, :, None], (h, 1, 3))
    png = _encode_png(grad, ctype=2, filters=[0, 1, 2, 3, 4])
    png16 = png[: 8 + 8 + 8] + b"\x10" + png[8 + 8 + 9:]
    rows = [
        (1, "image", "image/png", png, {"src": "t"}),
        (2, "image", "image/png", png16, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "png"
    hh, ww, mr, mg, mb = out[1].feature[:5]
    assert (hh, ww) == (4.0, 6.0)
    expected = sum((x * 40) % 256 for x in range(w)) / float(w)
    assert abs(mr - expected) < 1e-4 and mr == mg == mb
    assert out[2].decoder == "stub"  # 16-bit: honest fallback

    resized = {
        r.media_id: r
        for r in multimodal.resize_images(df, width=3, height=2).collect()
    }
    assert resized[1].meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized[1].payload))
    assert arr.shape == (2, 3, 3)
    # nearest-neighbor col indices for 6->3: [0, 2, 4] -> 0, 80, 160
    assert [int(v) for v in arr[0, :, 0]] == [0, 80, 160]
    assert resized[2].meta["resample"] == "stub"
