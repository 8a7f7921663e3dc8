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
    """r6: 16-bit and Adam7 are now SUPPORTED; what must still raise is
    genuinely out of spec or corrupt — sub-byte color, unknown color
    type / interlace method, truncated rasters, non-PNG bytes."""
    import numpy as np
    import pytest

    arr = np.zeros((2, 2, 3), np.uint8)
    png = bytearray(_encode_png(arr, 2))
    depth_off = 8 + 8 + 8  # sig + len/type + w(4) + h(4)
    # depth 4 on truecolor (only gray/palette may be sub-byte)
    png4 = bytes(png[:depth_off]) + b"\x04" + bytes(png[depth_off + 1 :])
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_png(png4)
    # unknown color type 5
    png5 = bytes(png[: depth_off + 1]) + b"\x05" + bytes(png[depth_off + 2 :])
    with pytest.raises(ValueError, match="color type"):
        multimodal.decode_png(png5)
    # unknown interlace method 2
    png_i2 = bytes(png[: depth_off + 4]) + b"\x02" + bytes(png[depth_off + 5 :])
    with pytest.raises(ValueError, match="interlace"):
        multimodal.decode_png(png_i2)
    # depth byte flipped to 16 without re-sizing the raster → truncated
    png16c = bytes(png[:depth_off]) + b"\x10" + bytes(png[depth_off + 1 :])
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_png(png16c)
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"\x89PNX" + b"\x00" * 16)


def test_real_png_decode_and_resize(spark):
    """End-to-end through the Arrow mapInPandas plumbing: PNG payloads
    get decoder='png' provenance with pixel-derived features; resize is
    a real nearest-neighbor over decoded PNG pixels re-encoded as P6;
    a corrupt PNG falls back to the stub honestly."""
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
    assert out[2].decoder == "stub"  # corrupt (depth-flipped) PNG: honest fallback

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


# --- baseline JPEG: independent minimal encoder as the test fixture ---------
# The encoder below implements the FORWARD path (RGB→YCbCr, optional 2×2
# chroma decimation, forward DCT, all-ones quantization, canonical
# Huffman with simple fixed-length-per-class tables, bit stuffing,
# restart markers) independently of decode_jpeg — encoder and decoder
# share no code, so a round-trip is a genuine cross-check. The zigzag
# order is re-derived from the diagonal-traversal definition rather
# than copied from the decoder's embedded spec constant.


def _jpeg_zz_order():
    out = []
    for s in range(15):
        if s % 2 == 0:
            rr = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:
            rr = range(max(0, s - 7), min(s, 7) + 1)
        for r in rr:
            out.append(r * 8 + (s - r))
    return out


def _jpeg_fixture_tables():
    # DC: all 12 size-category symbols at code length 4 (Kraft 12/16);
    # AC: all 162 run/size symbols plus the 14 progressive EOBn symbols
    # (r<<4 for r=1..14) at code length 8 (Kraft 176/256).
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = (
        [0x00, 0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        + [(r << 4) for r in range(1, 15)]
    )
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)
    return dc_bits, dc_vals, ac_bits, ac_vals


def _jpeg_fixture_codes(bits, vals):
    m, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            m[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return m


class _JpegBitWriter:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _jpeg_cat(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_jpeg(arr, subsample="444", dri=0, dqt16=False):
    """Minimal valid baseline JPEG encoder (test fixture; quantization
    all-ones for max fidelity — round-trip error is then bounded by
    DCT-coefficient rounding alone, a few counts per pixel)."""
    import struct

    import numpy as np

    zz = _jpeg_zz_order()
    k8 = np.arange(8).reshape(8, 1)
    n8 = np.arange(8).reshape(1, 8)
    D = np.cos((2 * n8 + 1) * k8 * np.pi / 16) * np.sqrt(2.0 / 8)
    D[0] /= np.sqrt(2.0)

    def pad_edge(p, mh, mw):
        h, w = p.shape
        return np.pad(
            p, ((0, -(-h // mh) * mh - h), (0, -(-w // mw) * mw - w)), mode="edge"
        )

    arr = np.asarray(arr)
    H, W = arr.shape[:2]
    gray = arr.ndim == 2
    if gray:
        planes, samp = [arr.astype(np.float64)], [(1, 1)]
    else:
        a = arr.astype(np.float64)
        R, G, B = a[..., 0], a[..., 1], a[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
        Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            ds = lambda p: p.reshape(  # noqa: E731
                p.shape[0] // 2, 2, p.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [pad_edge(Y, 16, 16)]
            planes += [ds(pad_edge(p, 16, 16)) for p in (Cb, Cr)]
        else:
            samp, planes = [(1, 1)] * 3, [Y, Cb, Cr]
    planes = [pad_edge(p, 8 * v, 8 * h) for p, (h, v) in zip(planes, samp)]
    mcux = planes[0].shape[1] // (8 * samp[0][0])
    mcuy = planes[0].shape[0] // (8 * samp[0][1])

    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_fixture_tables()
    dcc = _jpeg_fixture_codes(dc_bits, dc_vals)
    acc = _jpeg_fixture_codes(ac_bits, ac_vals)

    nc = 1 if gray else 3
    out = bytearray(b"\xff\xd8")
    if dqt16:  # pq=1: 16-bit big-endian entries
        ones = b"\x00\x01" * 64
        out += b"\xff\xdb" + struct.pack(">H", 2 + 129 * (1 if gray else 2))
        out += bytes([0x10]) + ones
        if not gray:
            out += bytes([0x11]) + ones
    else:
        ones = bytes([1] * 64)
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * (1 if gray else 2))
        out += bytes([0x00]) + ones
        if not gray:
            out += bytes([0x01]) + ones
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for ci in range(nc):
        out += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
        )

    def dht(tc, th):
        bits, vals = (dc_bits, dc_vals) if tc == 0 else (ac_bits, ac_vals)
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0) + dht(1, 0)
    if not gray:
        out += dht(0, 1) + dht(1, 1)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    def enc_block(bw, coef_nat, pred):
        czz = [int(coef_nat.flat[zz[k]]) for k in range(64)]
        diff = czz[0] - pred
        s = _jpeg_cat(diff)
        ln, c = dcc[s]
        bw.write(c, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        last = 0
        for k in range(63, 0, -1):
            if czz[k]:
                last = k
                break
        run = 0
        for k in range(1, last + 1):
            v = czz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, c = acc[0xF0]
                bw.write(c, ln)
                run -= 16
            s = _jpeg_cat(v)
            ln, c = acc[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            ln, c = acc[0x00]
            bw.write(c, ln)
        return czz[0]

    import numpy as np

    bw = _JpegBitWriter()
    pred = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            bw.flush()
            out += bw.buf
            bw = _JpegBitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            h, v = samp[ci]
            for by in range(v):
                for bx in range(h):
                    y0, x0 = (my * v + by) * 8, (mx * h + bx) * 8
                    blk = np.round(
                        D @ (planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ D.T
                    ).astype(np.int64)
                    pred[ci] = enc_block(bw, blk, pred[ci])
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def test_jpeg_roundtrip_gray_and_444():
    """With all-ones quantization the only loss is DCT-coefficient
    rounding: random rasters must round-trip within a few counts, and
    a DCT-sparse gradient exactly."""
    import numpy as np

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(g))
    assert dec.shape == (13, 21)
    assert int(np.max(np.abs(dec.astype(int) - g))) <= 3

    c = rng.integers(0, 256, size=(17, 11, 3), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(c))
    assert dec.shape == (17, 11, 3)
    assert int(np.max(np.abs(dec.astype(int) - c))) <= 3

    x = np.arange(24, dtype=np.float64)
    smooth = np.stack(
        [
            np.tile(x * 10 % 256, (16, 1)),
            np.tile((x * 5 + 30) % 256, (16, 1)),
            np.full((16, 24), 77.0),
        ],
        axis=2,
    ).astype(np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(smooth))
    assert int(np.max(np.abs(dec.astype(int) - smooth))) == 0


def test_jpeg_420_subsampling_and_odd_dims():
    """2×2-decimated chroma: constant-color images survive exactly
    (decimation of a constant is the constant); odd dimensions crop
    correctly from the padded MCU grid."""
    import numpy as np

    const = np.full((19, 27, 3), (120, 60, 200), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(const, subsample="420"))
    assert dec.shape == (19, 27, 3)
    assert int(np.max(np.abs(dec.astype(int) - const.astype(int)))) <= 1

    # luma channel must stay high-fidelity even on random 4:2:0 input
    rng = np.random.default_rng(5)
    c = rng.integers(0, 256, size=(18, 22, 3), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(c, subsample="420"))
    lum_in = 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
    lum_out = (
        0.299 * dec[..., 0].astype(float)
        + 0.587 * dec[..., 1]
        + 0.114 * dec[..., 2]
    )
    assert float(np.mean(np.abs(lum_in - lum_out))) < 6.0


def test_jpeg_restart_markers_and_16bit_dqt():
    import numpy as np

    rng = np.random.default_rng(7)
    c = rng.integers(0, 256, size=(17, 11, 3), dtype=np.uint8)
    for dri in (1, 2, 5):
        dec = multimodal.decode_jpeg(_encode_jpeg(c, dri=dri))
        assert int(np.max(np.abs(dec.astype(int) - c))) <= 3, f"dri={dri}"
    g = rng.integers(0, 256, size=(9, 10), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(g, dqt16=True))
    assert int(np.max(np.abs(dec.astype(int) - g))) <= 3


def test_jpeg_zrl_high_frequency():
    """A pure-checkerboard raster concentrates DCT energy at (7,7) —
    zigzag index 63 — forcing three ZRL (16-zero-run) codes per block
    through both encoder and decoder."""
    import numpy as np

    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    board = (128 + 90 * ((-1.0) ** (yy + xx))).astype(np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg(board))
    assert int(np.max(np.abs(dec.astype(int) - board))) <= 2


def test_jpeg_unsupported_variants_raise():
    import numpy as np
    import pytest

    arr = np.zeros((8, 8), np.uint8)
    jp = _encode_jpeg(arr)
    # flip SOF0 (FFC0) to SOF9 (FFC9): arithmetic coding — genuinely
    # unsupported (r6: progressive FFC2 now decodes)
    arith = jp.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="coding process"):
        multimodal.decode_jpeg(arith)
    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal.decode_jpeg(b"\x89PNG1234" + b"\x00" * 16)
    # truncated mid-entropy: bit reader must raise, not loop
    with pytest.raises(ValueError):
        multimodal.decode_jpeg(jp[: len(jp) - (len(jp) - jp.find(b"\xff\xda")) // 2])


def test_real_jpeg_decode_and_resize(spark):
    """End-to-end through the Arrow mapInPandas plumbing: JPEG payloads
    get decoder='jpeg' provenance with pixel-derived features; resize
    is a real nearest-neighbor over decoded pixels re-encoded as P6;
    an arithmetic-coded JPEG falls back to the stub honestly."""
    import numpy as np

    w, h = 16, 8
    grad = np.tile(
        (np.arange(w, dtype=np.float64) * 16 % 256).astype(np.uint8)[None, :, None],
        (h, 1, 3),
    )
    jp = _encode_jpeg(grad)
    arith = jp.replace(b"\xff\xc0", b"\xff\xc9", 1)
    rows = [
        (1, "image", "image/jpeg", jp, {"src": "t"}),
        (2, "image", "image/jpeg", arith, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "jpeg"
    hh, ww, mr, mg, mb = out[1].feature[:5]
    assert (hh, ww) == (float(h), float(w))
    expected = sum((x * 16) % 256 for x in range(w)) / float(w)
    # equal-channel gradient: decoded means match within DCT rounding
    assert abs(mr - expected) < 1.0 and abs(mr - mg) < 1.0 and abs(mg - mb) < 1.0
    assert out[2].decoder == "stub"  # arithmetic-coded: honest fallback

    resized = {
        r.media_id: r
        for r in multimodal.resize_images(df, width=4, height=2).collect()
    }
    assert resized[1].meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized[1].payload))
    assert arr.shape == (2, 4, 3)
    # nearest-neighbor col indices for 16->4: [0,4,8,12] -> 0,64,128,192
    vals = [int(v) for v in arr[0, :, 0]]
    assert all(abs(v - e) <= 2 for v, e in zip(vals, [0, 64, 128, 192]))
    assert resized[2].meta["resample"] == "stub"


# --- MP4: hand-built ISO BMFF fixture (independent of the parser) -----------


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _build_mp4(version=0, co64=False, timescale=1000, duration=2500):
    """Minimal valid MP4: ftyp + mdat (5 distinctive samples in 2
    chunks) + moov with a full vide track (tkhd dims, mdhd timescale,
    stsd codec, stsc runs, stsz sizes, stco/co64 offsets). Returns
    (payload, samples) where samples are the ground-truth bytes."""
    import struct

    samples = [b"A" * 3, b"B" * 4, b"C" * 5, b"D" * 6, b"E" * 7]
    ftyp = _mp4_box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    mdat_payload = b"".join(samples)
    chunk1_off = len(ftyp) + 8
    chunk2_off = chunk1_off + len(samples[0]) + len(samples[1])
    mdat = _mp4_box(b"mdat", mdat_payload)

    if version == 1:
        mvhd = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        ) + bytes(80)
        mdhd = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQIQ", 0, 0, 600, 1500
        ) + bytes(4)
        tkhd = bytes([1, 0, 0, 0]) + bytes(32) + bytes(
            8 + 2 + 2 + 2 + 2 + 36
        ) + struct.pack(">II", 320 << 16, 240 << 16)
    else:
        mvhd = bytes(4) + struct.pack(">IIII", 0, 0, timescale, duration) + bytes(
            80
        )
        mdhd = bytes(4) + struct.pack(">IIII", 0, 0, 600, 1500) + bytes(4)
        tkhd = bytes(4) + bytes(20) + bytes(8 + 2 + 2 + 2 + 2 + 36) + struct.pack(
            ">II", 320 << 16, 240 << 16
        )
    hdlr = bytes(4) + bytes(4) + b"vide" + bytes(12) + b"\x00"
    stsd = bytes(4) + struct.pack(">I", 1) + struct.pack(">I", 16) + b"avc1" + bytes(
        8
    )
    stts = bytes(4) + struct.pack(">III", 1, 5, 300)
    stsc = bytes(4) + struct.pack(">I", 2) + struct.pack(
        ">III", 1, 2, 1
    ) + struct.pack(">III", 2, 3, 1)
    stsz = bytes(4) + struct.pack(">II", 0, 5) + struct.pack(
        ">5I", *(len(s) for s in samples)
    )
    if co64:
        stco = _mp4_box(
            b"co64", bytes(4) + struct.pack(">IQQ", 2, chunk1_off, chunk2_off)
        )
    else:
        stco = _mp4_box(
            b"stco", bytes(4) + struct.pack(">III", 2, chunk1_off, chunk2_off)
        )
    stbl = _mp4_box(
        b"stbl",
        _mp4_box(b"stsd", stsd)
        + _mp4_box(b"stts", stts)
        + _mp4_box(b"stsc", stsc)
        + _mp4_box(b"stsz", stsz)
        + stco,
    )
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(
        b"mdia", _mp4_box(b"mdhd", mdhd) + _mp4_box(b"hdlr", hdlr) + minf
    )
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak)
    return ftyp + mdat + moov, samples


def test_mp4_parse_metadata():
    for version in (0, 1):
        payload, _ = _build_mp4(version=version)
        info = multimodal.parse_mp4(payload)
        assert info["brand"] == "isom"
        assert info["duration_s"] == 2.5  # 2500 / 1000
        assert info["n_tracks"] == 1
        trk = info["tracks"][0]
        assert trk["handler"] == "vide"
        assert trk["codec"] == "avc1"
        assert trk["timescale"] == 600 and trk["duration_s"] == 2.5
        assert (trk["width"], trk["height"]) == (320.0, 240.0)
        assert trk["n_samples"] == 5


def test_mp4_sample_table_resolution():
    """stsc chunk runs × stco offsets × stsz sizes → exact byte ranges:
    the extracted slices must equal the ground-truth sample bytes."""
    for co64 in (False, True):
        payload, samples = _build_mp4(co64=co64)
        table = multimodal.mp4_sample_table(payload, "vide")
        assert [sz for _off, sz in table] == [3, 4, 5, 6, 7]
        extracted = [payload[off : off + sz] for off, sz in table]
        assert extracted == samples
    import pytest

    with pytest.raises(ValueError, match="not an MP4"):
        multimodal.mp4_sample_table(b"\x00" * 32)
    payload, _ = _build_mp4()
    with pytest.raises(ValueError, match="no 'soun' track"):
        multimodal.mp4_sample_table(payload, "soun")


def test_mp4_features_and_dispatch(spark):
    payload, samples = _build_mp4()
    rows = [
        (1, "video", "video/mp4", payload, {"src": "cam"}),
        (2, "video", "video/mp4", b"\x00" * 64, None),  # not MP4 → stub
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "mp4"
    dur, ntrk, w, h, nsamp, ts, mean_sz, total = out[1].feature
    assert (dur, ntrk, w, h, nsamp, ts) == (2.5, 1.0, 320.0, 240.0, 5.0, 600.0)
    assert total == float(sum(len(s) for s in samples))
    assert abs(mean_sz - total / 5) < 1e-6
    assert out[2].decoder == "stub"


def test_frame_sample_real_mp4_demux(spark):
    """MP4 video rows explode into TRUE access-unit byte slices (every
    2nd sample of the resolved table); non-MP4 rows keep the stub with
    honest sampler provenance."""
    payload, samples = _build_mp4()
    rows = [
        (1, "video", "video/mp4", payload, None),
        (2, "video", "video/mp4", bytes(range(100)), None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.frame_sample(df, every_n=2).collect()
    mp4_frames = sorted(
        (r for r in out if r.media_id == 1), key=lambda r: r.frame_idx
    )
    assert [r.sampler for r in mp4_frames] == ["mp4"] * 3
    assert [bytes(r.frame_bytes) for r in mp4_frames] == [
        samples[0],
        samples[2],
        samples[4],
    ]
    stub_frames = [r for r in out if r.media_id == 2]
    assert stub_frames and all(r.sampler == "stub" for r in stub_frames)


# --- r6: full-spec PNG (16-bit, sub-byte depths, Adam7) ---------------------


def _encode_png_ext(arr, ctype, depth=8, interlace=0, plte=None):
    """Second independent PNG fixture: filter-0 rows only, but covering
    16-bit samples, sub-byte packing (MSB-first), and Adam7 pass
    serialization — the depth/interlace axes _encode_png leaves out."""
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

    adam7 = (
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    )
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = arr[..., None]

    def pack_rows(sub):
        hp, wp = sub.shape[:2]
        rows = []
        for y in range(hp):
            if depth == 16:
                rows.append(sub[y].astype(">u2").tobytes())
            elif depth == 8:
                rows.append(sub[y].astype(np.uint8).tobytes())
            else:
                vals = sub[y].reshape(-1).astype(np.uint8)
                bits = (
                    (vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1
                ).astype(np.uint8).reshape(-1)
                rows.append(np.packbits(bits).tobytes())
        return b"".join(b"\x00" + r for r in rows)

    if interlace:
        raster = b"".join(
            pack_rows(arr[y0::dy, x0::dx])
            for x0, y0, dx, dy in adam7
            if arr[y0::dy, x0::dx].shape[0] and arr[y0::dy, x0::dx].shape[1]
        )
    else:
        raster = pack_rows(arr)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")


def test_png_16bit_decode():
    import numpy as np

    rng = np.random.default_rng(13)
    g16 = rng.integers(0, 65536, size=(6, 5, 1), dtype=np.uint16)
    dec = multimodal.decode_png(_encode_png_ext(g16, 0, depth=16))
    assert dec.dtype == np.uint16 and (dec == g16).all()

    rgb16 = rng.integers(0, 65536, size=(4, 7, 3), dtype=np.uint16)
    dec = multimodal.decode_png(_encode_png_ext(rgb16, 2, depth=16))
    assert (dec == rgb16).all()
    # feature path normalizes to the high byte
    feats = multimodal.png_features(_encode_png_ext(rgb16, 2, depth=16))
    assert feats[0] == 4.0 and feats[1] == 7.0
    expect_r = float((rgb16[..., 0] >> 8).astype(np.uint8).mean())
    assert abs(feats[2] - expect_r) < 1e-4


def test_png_subbyte_depths():
    import numpy as np

    rng = np.random.default_rng(17)
    # 1-bit gray: 0/1 -> 0/255
    b1 = rng.integers(0, 2, size=(5, 11, 1), dtype=np.uint8)
    dec = multimodal.decode_png(_encode_png_ext(b1, 0, depth=1))
    assert (dec == b1 * 255).all()
    # 4-bit gray: v -> v*17
    b4 = rng.integers(0, 16, size=(3, 9, 1), dtype=np.uint8)
    dec = multimodal.decode_png(_encode_png_ext(b4, 0, depth=4))
    assert (dec == b4 * 17).all()
    # 2-bit palette indices expand through PLTE unscaled
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(4, 13, 1), dtype=np.uint8)
    dec = multimodal.decode_png(_encode_png_ext(idx, 3, depth=2, plte=plte))
    assert (dec == plte[idx[..., 0]]).all()


def test_png_adam7_interlaced():
    import numpy as np

    rng = np.random.default_rng(19)
    # dims chosen to make several passes partial/empty-edge
    for shape, ctype in (((10, 9, 3), 2), ((3, 3, 1), 0), ((8, 8, 4), 6)):
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = multimodal.decode_png(_encode_png_ext(arr, ctype, interlace=1))
        assert dec.shape == shape
        assert (dec == arr).all(), (shape, ctype)
    # interlaced + 16-bit together
    g16 = rng.integers(0, 65536, size=(5, 6, 1), dtype=np.uint16)
    dec = multimodal.decode_png(_encode_png_ext(g16, 0, depth=16, interlace=1))
    assert (dec == g16).all()
    # interlaced + 1-bit together (bit-packed partial passes)
    b1 = rng.integers(0, 2, size=(7, 5, 1), dtype=np.uint8)
    dec = multimodal.decode_png(_encode_png_ext(b1, 0, depth=1, interlace=1))
    assert (dec == b1 * 255).all()


# --- GIF: independent encoder fixture (real LZW compressor) -----------------


def _gif_lzw_encode(indices, min_code_size):
    """Real GIF LZW compressor (dict-based), written independently of
    the decoder. Width grows one step after the table fills the
    current width (giflib timing — the decoder's table lags one
    entry), which is the handshake every real GIF uses."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    s = b""
    for px in indices:
        c = bytes([int(px)])
        if s + c in table:
            s = s + c
            continue
        emit(table[s], width)
        if next_code < 4096:
            table[s + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = c
    if s:
        emit(table[s], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(
    frames, palette, sw, sh, bg=0, transparent=None, interlace=False
):
    """Minimal valid GIF89a: global color table, optional graphic
    control (transparency on the LAST frame), optional interlacing;
    ``frames`` is a list of (x0, y0, 2D index array)."""
    import numpy as np

    ncols = len(palette)
    ct_bits = max(1, (ncols - 1).bit_length())
    ct_size = 1 << ct_bits
    pal = np.zeros((ct_size, 3), np.uint8)
    pal[:ncols] = palette
    mcs = max(2, ct_bits)
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | (ct_bits - 1), bg, 0])
    out += pal.tobytes()
    for fi, (x0, y0, grid) in enumerate(frames):
        if transparent is not None and fi == len(frames) - 1:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        ih, iw = grid.shape
        out += bytes([0x2C])
        out += x0.to_bytes(2, "little") + y0.to_bytes(2, "little")
        out += iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        g = grid
        if interlace:
            rows = np.concatenate(
                [
                    np.arange(0, ih, 8),
                    np.arange(4, ih, 8),
                    np.arange(2, ih, 4),
                    np.arange(1, ih, 2),
                ]
            )
            g = grid[rows]
        lzw = _gif_lzw_encode(g.reshape(-1), mcs)
        out += bytes([mcs])
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def test_gif_decode_pixel_exact():
    """Round-trip against the independent LZW compressor: random index
    grids (8- and 128-color palettes — the latter forces several code
    -width bumps and thousands of table entries) decode bit-exact."""
    import numpy as np

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    grid = rng.integers(0, 8, size=(13, 17), dtype=np.uint8)
    dec = multimodal.decode_gif(_encode_gif([(0, 0, grid)], pal, 17, 13))
    assert dec.shape == (13, 17, 3)
    assert (dec == pal[grid]).all()

    pal2 = rng.integers(0, 256, size=(128, 3), dtype=np.uint8)
    grid2 = rng.integers(0, 128, size=(64, 64), dtype=np.uint8)
    dec2 = multimodal.decode_gif(_encode_gif([(0, 0, grid2)], pal2, 64, 64))
    assert (dec2 == pal2[grid2]).all()


def test_gif_interlace_frames_transparency():
    import numpy as np
    import pytest

    rng = np.random.default_rng(29)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    grid = rng.integers(0, 8, size=(13, 17), dtype=np.uint8)
    dec = multimodal.decode_gif(
        _encode_gif([(0, 0, grid)], pal, 17, 13, interlace=True)
    )
    assert (dec == pal[grid]).all()

    # two frames: frame 1 is a 3x3 patch at (2,2) with one transparent
    # pixel that must keep frame 0's color underneath
    g0 = np.zeros((6, 6), np.uint8)
    g1 = np.full((3, 3), 2, np.uint8)
    g1[1, 1] = 7
    gif = _encode_gif([(0, 0, g0), (2, 2, g1)], pal, 6, 6, transparent=7)
    f0 = multimodal.decode_gif(gif, frame=0)
    assert (f0 == pal[0]).all()
    f1 = multimodal.decode_gif(gif, frame=1)
    assert (f1[2, 2] == pal[2]).all()      # patch drawn
    assert (f1[3, 3] == pal[0]).all()      # transparent: underlying kept
    assert (f1[0, 0] == pal[0]).all()      # outside patch untouched

    with pytest.raises(ValueError, match="not a GIF"):
        multimodal.decode_gif(b"GIF90a" + b"\x00" * 32)


def test_real_gif_decode_and_resize(spark):
    """e2e through mapInPandas: decoder='gif' provenance with
    pixel-true features; resize decodes the palette image and
    re-encodes P6; junk with a GIF header falls back to the stub."""
    import numpy as np

    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    grid = np.zeros((4, 6), np.uint8)
    grid[:, 3:] = 1  # left half black, right half red
    gif = _encode_gif([(0, 0, grid)], pal, 6, 4)
    rows = [
        (1, "image", "image/gif", gif, None),
        (2, "image", "image/gif", b"GIF89a" + b"\x01" * 40, None),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "gif"
    h, w, mr, mg, mb = out[1].feature[:5]
    assert (h, w) == (4.0, 6.0)
    assert abs(mr - 127.5) < 1e-4 and mg == 0.0 and mb == 0.0
    assert out[2].decoder == "stub"

    resized = {
        r.media_id: r
        for r in multimodal.resize_images(df, width=2, height=2).collect()
    }
    assert resized[1].meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized[1].payload))
    assert arr.shape == (2, 2, 3)
    # cols 6->2 pick x=0 (black) and x=3 (red)
    assert [int(v) for v in arr[0, 0]] == [0, 0, 0]
    assert [int(v) for v in arr[0, 1]] == [255, 0, 0]


# --- progressive JPEG: independent encoder fixture (jcphuff semantics) ------


class _JpegEobState:
    """EOB-run + correction-bit bookkeeping, libjpeg jcphuff style:
    ``be`` holds bits of blocks already folded into the pending EOB run
    (they flush right after the EOBn symbol); ``br`` holds the CURRENT
    block's bits (they flush after the next emitted symbol, because the
    decoder reads them during that symbol's skip loop)."""

    def __init__(self, acc, bw):
        self.run = 0
        self.be = []
        self.br = []
        self.acc = acc
        self.bw = bw

    def flush_eob(self):
        if self.run > 0:
            r = self.run.bit_length() - 1
            ln, c = self.acc[(r << 4)]
            self.bw.write(c, ln)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []

    def flush_br(self):
        for b in self.br:
            self.bw.write(b, 1)
        self.br = []

    def fold_block(self):
        self.run += 1
        self.be.extend(self.br)
        self.br = []


def _encode_jpeg_progressive(arr, script=None, subsample="444"):
    """Progressive (SOF2) encoder with an arbitrary scan script
    [(comp_idxs, Ss, Se, Ah, Al), ...] — spectral selection AND
    successive approximation, independently implementing the libjpeg
    jcphuff bitstream (EOB runs, ZRL folding, BE/BR correction-bit
    buffers). All-ones quantization, so a fully-refined script must
    reproduce the baseline round-trip error exactly."""
    import struct

    import numpy as np

    def ceil_div(a, b):
        return -(-a // b)

    zz = _jpeg_zz_order()
    k8 = np.arange(8).reshape(8, 1)
    n8 = np.arange(8).reshape(1, 8)
    D = np.cos((2 * n8 + 1) * k8 * np.pi / 16) * np.sqrt(2.0 / 8)
    D[0] /= np.sqrt(2.0)

    arr = np.asarray(arr)
    H, W = arr.shape[:2]
    gray = arr.ndim == 2
    nc = 1 if gray else 3
    if script is None:
        if gray:
            script = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
            ]
        else:
            script = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([1], 1, 63, 0, 1),
                ([2], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0),
                ([2], 1, 63, 1, 0),
            ]
    if gray:
        planes, samp = [arr.astype(np.float64)], [(1, 1)]
    else:
        a = arr.astype(np.float64)
        R, G, B = a[..., 0], a[..., 1], a[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
        Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]

            def pad16(p):
                h, w = p.shape
                return np.pad(
                    p,
                    (
                        (0, ceil_div(h, 16) * 16 - h),
                        (0, ceil_div(w, 16) * 16 - w),
                    ),
                    mode="edge",
                )

            ds = lambda p: p.reshape(  # noqa: E731
                p.shape[0] // 2, 2, p.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            planes = [pad16(Y), ds(pad16(Cb)), ds(pad16(Cr))]
        else:
            samp, planes = [(1, 1)] * nc, [Y, Cb, Cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = ceil_div(W, 8 * hmax), ceil_div(H, 8 * vmax)
    coefz = []
    for p, (h, v) in zip(planes, samp):
        ph, pw = mcuy * v * 8, mcux * h * 8
        p = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        bh, bw2 = ph // 8, pw // 8
        cz = np.zeros((bh, bw2, 64), np.int64)
        for by in range(bh):
            for bx in range(bw2):
                blk = np.round(
                    D @ (p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ D.T
                ).astype(np.int64)
                cz[by, bx] = blk.flat[zz]
        coefz.append(cz)
    nat_blocks = [
        (ceil_div(ceil_div(H * v, vmax), 8), ceil_div(ceil_div(W * h, hmax), 8))
        for (h, v) in samp
    ]

    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_fixture_tables()
    dcc = _jpeg_fixture_codes(dc_bits, dc_vals)
    acc = _jpeg_fixture_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    ones = bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * (1 if gray else 2))
    out += bytes([0x00]) + ones
    if not gray:
        out += bytes([0x01]) + ones
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for ci in range(nc):
        out += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
        )

    def dht(tc, th):
        bits, vals = (dc_bits, dc_vals) if tc == 0 else (ac_bits, ac_vals)
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0) + dht(1, 0)
    if not gray:
        out += dht(0, 1) + dht(1, 1)

    for comp_idxs, ss, se, ah, al in script:
        ns = len(comp_idxs)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idxs:
            t = 0 if ci == 0 else 1
            out += bytes([ci + 1, (t << 4) | t])
        out += bytes([ss, se, (ah << 4) | al])
        bw = _JpegBitWriter()
        if ss == 0 and ah == 0:  # DC first (may be interleaved)
            pred = {ci: 0 for ci in comp_idxs}
            inter = len(comp_idxs) > 1
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci in comp_idxs:
                    h, v = samp[ci] if inter else (1, 1)
                    for by in range(v):
                        for bx in range(h):
                            dc = int(coefz[ci][my * v + by, mx * h + bx, 0])
                            t = dc >> al  # arithmetic, like the decoder's <<
                            diff = t - pred[ci]
                            pred[ci] = t
                            s = _jpeg_cat(diff)
                            ln, c = dcc[s]
                            bw.write(c, ln)
                            if s:
                                bw.write(
                                    diff if diff > 0 else diff + (1 << s) - 1, s
                                )
        elif ss == 0:  # DC refinement
            inter = len(comp_idxs) > 1
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci in comp_idxs:
                    h, v = samp[ci] if inter else (1, 1)
                    for by in range(v):
                        for bx in range(h):
                            dc = int(coefz[ci][my * v + by, mx * h + bx, 0])
                            bw.write((dc >> al) & 1, 1)
        elif ah == 0:  # AC first
            ci = comp_idxs[0]
            bh, bw_n = nat_blocks[ci]
            st = _JpegEobState(acc, bw)
            for by in range(bh):
                for bx in range(bw_n):
                    block = coefz[ci][by, bx]
                    r = 0
                    for k in range(ss, se + 1):
                        v = int(block[k])
                        t = (abs(v) >> al) * (1 if v >= 0 else -1)
                        if t == 0:
                            r += 1
                            continue
                        st.flush_eob()
                        while r > 15:
                            ln, c = acc[0xF0]
                            bw.write(c, ln)
                            r -= 16
                        s = _jpeg_cat(t)
                        ln, c = acc[(r << 4) | s]
                        bw.write(c, ln)
                        bw.write(t if t > 0 else t + (1 << s) - 1, s)
                        r = 0
                    if r > 0:
                        st.run += 1
                        if st.run == 0x7FFF:
                            st.flush_eob()
            st.flush_eob()
        else:  # AC refinement
            ci = comp_idxs[0]
            bh, bw_n = nat_blocks[ci]
            st = _JpegEobState(acc, bw)
            for by in range(bh):
                for bx in range(bw_n):
                    block = coefz[ci][by, bx]
                    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
                    eob_idx = 0
                    for i2, t in enumerate(absv):
                        if t == 1:
                            eob_idx = i2 + 1
                    r = 0
                    for i2, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i2 < eob_idx:
                            st.flush_eob()
                            ln, c = acc[0xF0]
                            bw.write(c, ln)
                            r -= 16
                            st.flush_br()
                        if t > 1:
                            st.br.append(t & 1)
                            continue
                        st.flush_eob()
                        ln, c = acc[(r << 4) | 1]
                        bw.write(c, ln)
                        bw.write(1 if int(block[ss + i2]) > 0 else 0, 1)
                        r = 0
                        st.flush_br()
                    if r > 0 or st.br:
                        st.fold_block()
                        if st.run == 0x7FFF:
                            st.flush_eob()
            st.flush_eob()
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_roundtrip():
    """Fully-refined progressive scripts (DC+AC successive
    approximation down to Al=0) must reproduce the baseline
    coefficients exactly — same DCT-rounding-only error bound."""
    import numpy as np

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg_progressive(g))
    assert dec.shape == (13, 21)
    assert int(np.max(np.abs(dec.astype(int) - g))) <= 3

    c = rng.integers(0, 256, size=(17, 11, 3), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg_progressive(c))
    assert int(np.max(np.abs(dec.astype(int) - c))) <= 3


def test_jpeg_progressive_scan_kinds():
    """Each progressive mechanism in isolation: spectral selection
    only, DC successive approximation, AC successive approximation at
    one and two refinement levels, split spectral bands."""
    import numpy as np

    rng = np.random.default_rng(37)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    scripts = {
        "spectral": [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        "dc_sa": [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 0)],
        "ac_sa1": [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0)],
        "ac_sa2": [
            ([0], 0, 0, 0, 0),
            ([0], 1, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 1, 63, 1, 0),
        ],
        "bands": [
            ([0], 0, 0, 0, 0),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 1, 63, 1, 0),
        ],
    }
    for name, script in scripts.items():
        dec = multimodal.decode_jpeg(_encode_jpeg_progressive(g, script=script))
        assert int(np.max(np.abs(dec.astype(int) - g))) <= 3, name


def test_jpeg_progressive_420_noninterleaved_grid(spark):
    """4:2:0 progressive: single-component AC scans iterate the
    component's NATURAL block grid (3 luma block-rows for H=20), not
    the MCU-padded grid (4) — the geometry real progressive files
    depend on. Plus dispatch provenance through mapInPandas."""
    import numpy as np

    const = np.full((20, 28, 3), (120, 60, 200), dtype=np.uint8)
    dec = multimodal.decode_jpeg(
        _encode_jpeg_progressive(const, subsample="420")
    )
    assert dec.shape == (20, 28, 3)
    assert int(np.max(np.abs(dec.astype(int) - const.astype(int)))) <= 1

    rng = np.random.default_rng(41)
    c = rng.integers(0, 256, size=(20, 28, 3), dtype=np.uint8)
    dec = multimodal.decode_jpeg(_encode_jpeg_progressive(c, subsample="420"))
    lum_in = 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
    lum_out = (
        0.299 * dec[..., 0].astype(float)
        + 0.587 * dec[..., 1]
        + 0.114 * dec[..., 2]
    )
    assert float(np.mean(np.abs(lum_in - lum_out))) < 2.0

    rows = [(1, "image", "image/jpeg", _encode_jpeg_progressive(c), None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "jpeg"
    assert out.feature[:2] == [20.0, 28.0]


# --- G.711 μ-law / A-law WAV -------------------------------------------------


def _linear_to_ulaw(x):
    """Independent forward μ-law compander (G.711 encoder side)."""
    BIAS, CLIP = 0x84, 32635
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x, CLIP) + BIAS
    exp = x.bit_length() - 8  # x in [2^(exp+7), 2^(exp+8))
    mant = (x >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def _linear_to_alaw(x):
    """Independent forward A-law compander — the classic Sun/CCITT
    segment-search encoder (13-bit domain, mask 0xD5 for positives)."""
    x13 = x >> 3  # arithmetic shift into the 13-bit domain
    if x13 >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        x13 = -x13 - 1
    bounds = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    for seg, b in enumerate(bounds):
        if x13 <= b:
            break
    else:
        return 0x7F ^ mask
    if seg < 2:
        aval = (seg << 4) | ((x13 >> 1) & 0xF)
    else:
        aval = (seg << 4) | ((x13 >> seg) & 0xF)
    return aval ^ mask


def _make_g711_wav(samples, tag, sr=8000, channels=1):
    """Hand-built RIFF container around G.711-companded bytes."""
    import struct

    enc = _linear_to_ulaw if tag == 7 else _linear_to_alaw
    body = bytes(enc(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", tag, channels, sr, sr * channels, channels, 8)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def test_g711_wav_decode():
    """μ-law and A-law WAVs decode through the manual RIFF walk to
    within companding quantization error of the original samples
    (stdlib wave refuses format tags 6/7, so this is a real codec)."""
    import math

    import numpy as np

    sr = 8000
    ref = [
        int(20000 * math.sin(2 * math.pi * 440 * i / sr)) for i in range(400)
    ]
    for tag in (7, 6):
        wav = _make_g711_wav(ref, tag)
        x, fr = multimodal.decode_wav(wav)
        assert fr == sr and len(x) == 400
        got = x * 32768.0
        # segment-quantized: error bounded by one mantissa step
        err = np.abs(got - np.array(ref, float))
        bound = np.maximum(64.0, np.abs(np.array(ref, float)) / 8.0)
        assert (err <= bound).all(), (tag, float(err.max()))
        # features flow through the same wav path with real duration
        feats = multimodal.wav_features(wav)
        assert abs(feats[0] - 400 / sr) < 1e-9
        assert 0.3 < feats[1] < 0.7  # sine RMS preserved through G.711

    # sign symmetry of the decode tables themselves
    ulut = multimodal._g711_ulaw_lut()
    assert int(ulut[0xFF]) == 0 and int(ulut[0x7F]) == -0  # ±zero codes
    assert (ulut[:128] == -ulut[128:]).all()
    alut = multimodal._g711_alaw_lut()
    assert (alut[alut > 0].max() == 32256) and (ulut.max() == 32124)


def test_g711_wav_dispatch(spark):
    import math

    sr = 8000
    ref = [int(15000 * math.sin(2 * math.pi * 300 * i / sr)) for i in range(200)]
    rows = [(1, "audio", "audio/basic", _make_g711_wav(ref, 7), None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "wav"
    assert abs(out.feature[0] - 200 / sr) < 1e-9


# --- BMP: independent encoder fixture ---------------------------------------


def _encode_bmp(arr, bpp=24, top_down=False, rle=False, palette=None):
    """Minimal valid BMP writer: BITMAPINFOHEADER, padded rows, BGR
    order, bottom-up by default; 8-bit paletted with optional RLE8
    (run + absolute + EOL encoding); 1/4-bit packed paletted."""
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    if bpp in (24, 32):
        rows = []
        for y in range(h):
            row = arr[y][:, ::-1] if bpp == 24 else np.concatenate(
                [arr[y][:, ::-1], np.full((w, 1), 255, np.uint8)], axis=1
            )
            raw = row.tobytes()
            rows.append(raw + b"\x00" * ((-len(raw)) % 4))
        n_colors = 0
        pal_bytes = b""
    else:
        n_colors = len(palette)
        pal_bytes = b"".join(
            bytes([int(b), int(g), int(r), 0]) for r, g, b in palette
        )
        if rle:
            assert bpp == 8
            body = bytearray()
            for y in range(h - 1, -1, -1):  # RLE streams are bottom-up
                xs = arr[y]
                x = 0
                while x < w:
                    run = 1
                    while x + run < w and xs[x + run] == xs[x] and run < 255:
                        run += 1
                    if run >= 2:
                        body += bytes([run, int(xs[x])])
                        x += run
                    else:  # absolute mode for a single pixel: use 1-run
                        body += bytes([1, int(xs[x])])
                        x += 1
                body += b"\x00\x00"  # EOL
            body += b"\x00\x01"  # EOB
            rows = None
            rle_body = bytes(body)
        if not rle:
            rows = []
            for y in range(h):
                if bpp == 8:
                    raw = arr[y].astype(np.uint8).tobytes()
                else:
                    vals = arr[y].astype(np.uint8)
                    bits = (
                        (vals[:, None] >> np.arange(bpp - 1, -1, -1)) & 1
                    ).astype(np.uint8).reshape(-1)
                    raw = np.packbits(bits).tobytes()
                rows.append(raw + b"\x00" * ((-len(raw)) % 4))
    if not rle:
        order = rows if top_down else rows[::-1]
        data = b"".join(order)
    else:
        data = rle_body  # RLE is always bottom-up per spec
    hdr_h = -h if top_down else h
    if rle:
        hdr_h = h  # bottom-up only
    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiihhIIiiII", 40, w, hdr_h, 1, bpp, 1 if rle else 0,
        len(data), 2835, 2835, n_colors, 0,
    )
    filehdr = struct.pack("<2sIHHI", b"BM", data_off + len(data), 0, 0, data_off)
    return filehdr + info + pal_bytes + data


def test_bmp_decode_variants():
    import numpy as np

    rng = np.random.default_rng(43)
    rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    # 24-bit bottom-up and top-down, 32-bit
    assert (multimodal.decode_bmp(_encode_bmp(rgb, 24)) == rgb).all()
    assert (
        multimodal.decode_bmp(_encode_bmp(rgb, 24, top_down=True)) == rgb
    ).all()
    assert (multimodal.decode_bmp(_encode_bmp(rgb, 32)) == rgb).all()

    # 8-bit paletted
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(6, 9), dtype=np.uint8)
    assert (
        multimodal.decode_bmp(_encode_bmp(idx, 8, palette=pal)) == pal[idx]
    ).all()

    # 4-bit and 1-bit packed
    pal4 = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx4 = rng.integers(0, 16, size=(5, 11), dtype=np.uint8)
    assert (
        multimodal.decode_bmp(_encode_bmp(idx4, 4, palette=pal4)) == pal4[idx4]
    ).all()
    pal1 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx1 = rng.integers(0, 2, size=(4, 19), dtype=np.uint8)
    assert (
        multimodal.decode_bmp(_encode_bmp(idx1, 1, palette=pal1)) == pal1[idx1]
    ).all()

    # RLE8: runs + EOL/EOB
    idx_rle = np.repeat(rng.integers(0, 17, size=(6, 3)), 3, axis=1).astype(
        np.uint8
    )
    assert (
        multimodal.decode_bmp(_encode_bmp(idx_rle, 8, palette=pal, rle=True))
        == pal[idx_rle]
    ).all()

    import pytest

    with pytest.raises(ValueError, match="not a BMP"):
        multimodal.decode_bmp(b"XX" + b"\x00" * 60)


def test_bmp_dispatch_and_resize(spark):
    import numpy as np

    grad = np.tile(
        (np.arange(8, dtype=np.uint8) * 32)[None, :, None], (4, 1, 3)
    )
    bmp = _encode_bmp(grad, 24)
    rows = [(1, "image", "image/bmp", bmp, None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "bmp"
    assert out.feature[:2] == [4.0, 8.0]
    resized = multimodal.resize_images(df, width=4, height=2).collect()[0]
    assert resized.meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized.payload))
    assert [int(v) for v in arr[0, :, 0]] == [0, 64, 128, 192]


# --- TIFF: independent encoder fixture --------------------------------------


def _tiff_lzw_encode(data):
    """TIFF-variant LZW compressor (MSB-first, Clear/EOI, EARLY
    CHANGE): the encoder bumps width when its next free code reaches
    2^width — one entry after the decoder's 2^width−1 trigger, which
    compensates the decoder's one-entry table lag (the same handshake
    shape as GIF, shifted one code earlier — hence 'early change')."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    s = b""
    for byte in data:
        c = bytes([byte])
        if s + c in table:
            s = s + c
            continue
        emit(table[s])
        if next_code < 4094:
            table[s + c] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        s = c
    if s:
        emit(table[s])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data):
    """Independent PackBits writer: literal runs + repeat runs."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and (j + 1 >= n or data[j] != data[j + 1])
            and j - i < 128
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _encode_tiff(
    arr,
    compression=1,
    predictor=1,
    byte_order="<",
    photometric=None,
    colormap=None,
    rows_per_strip=None,
    bits=8,
):
    """Minimal valid stripped TIFF writer (independent of the parser):
    header + pixel strips + one IFD with out-of-line arrays."""
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    rows_per_strip = rows_per_strip or h
    flat = arr if arr.ndim == 3 else arr[..., None]

    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = flat[y0 : y0 + rows_per_strip]
        if bits == 1:
            packed = b"".join(
                np.packbits(rows[y].reshape(-1)).tobytes()
                for y in range(rows.shape[0])
            )
            raw = packed
        elif predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = rows.astype(np.uint8).tobytes()
        if compression == 5:
            raw = _tiff_lzw_encode(raw)
        elif compression == 32773:
            raw = _packbits_encode(raw)
        strips.append(raw)

    bo = byte_order
    header_size = 8
    data = bytearray()
    strip_offsets = []
    for s in strips:
        strip_offsets.append(header_size + len(data))
        data += s
    if len(data) & 1:
        data += b"\x00"

    entries = []  # (tag, type, count, packed-or-(values, array))
    extra = bytearray()

    def entry(tag, typ, values):
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ] * len(values)
        if size <= 4:
            packed = struct.pack(bo + fmt * len(values), *values)
            packed += b"\x00" * (4 - size)
            entries.append((tag, typ, len(values), packed))
        else:
            entries.append((tag, typ, len(values), list(values)))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bits] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [photometric])
    entry(273, 4, strip_offsets)
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    if predictor != 1:
        entry(317, 3, [predictor])
    if colormap is not None:
        cm16 = [int(v) << 8 for v in np.asarray(colormap).T.reshape(-1)]
        entry(320, 3, cm16)
    entries.sort(key=lambda t: t[0])

    ifd_off = header_size + len(data)
    ifd_size = 2 + 12 * len(entries) + 4
    arrays_off = ifd_off + ifd_size
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if isinstance(val, bytes):
            ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
        else:
            fmt = {3: "H", 4: "I"}[typ]
            ifd += struct.pack(bo + "HHII", tag, typ, cnt, arrays_off + len(extra))
            extra += struct.pack(bo + fmt * cnt, *val)
    ifd += struct.pack(bo + "I", 0)  # next IFD

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    head = magic[:2] + struct.pack(bo + "HI", 42, ifd_off)
    return head + bytes(data) + ifd + bytes(extra)


def test_tiff_decode_variants():
    import numpy as np

    rng = np.random.default_rng(47)
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(6, 11), dtype=np.uint8)

    for bo in ("<", ">"):
        for comp in (1, 5, 32773):
            dec = multimodal.decode_tiff(
                _encode_tiff(rgb, compression=comp, byte_order=bo)
            )
            assert (dec == rgb).all(), (bo, comp)
            decg = multimodal.decode_tiff(
                _encode_tiff(gray, compression=comp, byte_order=bo)
            )
            assert (decg == gray).all(), (bo, comp)

    # LZW + horizontal-differencing predictor, multi-strip
    dec = multimodal.decode_tiff(
        _encode_tiff(rgb, compression=5, predictor=2, rows_per_strip=4)
    )
    assert (dec == rgb).all()

    # big LZW image: force several width bumps through the dictionary
    big = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    assert (
        multimodal.decode_tiff(_encode_tiff(big, compression=5)) == big
    ).all()

    # WhiteIsZero inverts; palette expands through the 16-bit colormap
    dec = multimodal.decode_tiff(_encode_tiff(gray, photometric=0))
    assert (dec == 255 - gray).all()
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(5, 8), dtype=np.uint8)
    dec = multimodal.decode_tiff(
        _encode_tiff(idx, photometric=3, colormap=pal)
    )
    assert (dec == pal[idx]).all()

    # 1-bit bilevel
    b1 = rng.integers(0, 2, size=(5, 13), dtype=np.uint8)
    dec = multimodal.decode_tiff(_encode_tiff(b1, bits=1))
    assert (dec == b1 * 255).all()

    import pytest

    with pytest.raises(ValueError, match="not a TIFF"):
        multimodal.decode_tiff(b"II\x00\x00" + b"\x00" * 32)


def test_tiff_dispatch_and_resize(spark):
    import numpy as np

    grad = np.tile(
        (np.arange(10, dtype=np.uint8) * 25)[None, :, None], (4, 1, 3)
    )
    tif = _encode_tiff(grad, compression=5, predictor=2)
    rows = [(1, "image", "image/tiff", tif, None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "tiff"
    assert out.feature[:2] == [4.0, 10.0]
    resized = multimodal.resize_images(df, width=5, height=2).collect()[0]
    assert resized.meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized.payload))
    assert [int(v) for v in arr[0, :, 0]] == [0, 50, 100, 150, 200]


# --- FLAC: independent test-side encoder (r8) ---------------------------
# Written from the FLAC format spec, structurally independent of the
# package decoder: table-driven CRCs (decoder is bitwise), numpy k-th
# difference for FIXED residuals (decoder applies explicit predictor
# coefficients), and a big-int bit accumulator (decoder walks a byte
# array). FLAC is lossless, so decode(encode(x)) == x bit-for-bit is a
# real validation for every subframe type / stereo mode / rice shape.


def _flac_crc_tables():
    t8, t16 = [], []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) & 0xFF) ^ (0x07 if c & 0x80 else 0)
        t8.append(c)
        c = i << 8
        for _ in range(8):
            c = ((c << 1) & 0xFFFF) ^ (0x8005 if c & 0x8000 else 0)
        t16.append(c)
    return t8, t16


_FLAC_T8, _FLAC_T16 = _flac_crc_tables()


def _flac_crc8(data):
    c = 0
    for b in data:
        c = _FLAC_T8[c ^ b]
    return c


def _flac_crc16(data):
    c = 0
    for b in data:
        c = _FLAC_T16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _FlacWriter:
    """MSB-first bit writer over a growing big-int accumulator."""

    def __init__(self):
        self.acc = 0
        self.n = 0

    def u(self, v, bits):
        assert 0 <= v < (1 << bits), (v, bits)
        self.acc = (self.acc << bits) | v
        self.n += bits

    def s(self, v, bits):
        self.u(v & ((1 << bits) - 1), bits)

    def unary(self, q):
        self.u(1, q + 1)  # q zeros then a 1

    def align(self):
        pad = (-self.n) % 8
        if pad:
            self.u(0, pad)

    def to_bytes(self):
        assert self.n % 8 == 0
        return self.acc.to_bytes(self.n // 8, "big")


def _flac_utf8(n):
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 1
    while n >= (1 << (5 * nbytes + 6 - nbytes)):
        nbytes += 1
    # leading byte: nbytes+1 ones, a zero, then the high payload bits
    total_cont = nbytes
    lead_bits = 6 - total_cont
    lead = ((0xFF << (7 - total_cont)) & 0xFF) | ((n >> (6 * total_cont)) & ((1 << lead_bits) - 1))
    out.append(lead)
    for k in range(total_cont - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * k)) & 0x3F))
    return bytes(out)


def _flac_zigzag(r):
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _flac_write_residual(w, resid, order, bs, porder=0, method=0, param=None, escape=False):
    plen = 4 if method == 0 else 5
    esc = (1 << plen) - 1
    w.u(method, 2)
    w.u(porder, 4)
    pos = 0
    for part in range(1 << porder):
        n = (bs >> porder) - (order if part == 0 else 0)
        chunk = resid[pos : pos + n]
        pos += n
        if escape:
            raw = max((abs(v).bit_length() + 1 for v in chunk), default=0)
            if all(v == 0 for v in chunk):
                raw = 0
            w.u(esc, plen)
            w.u(raw, 5)
            for v in chunk:
                if raw:
                    w.s(v, raw)
        else:
            if param is None:
                mx = max((_flac_zigzag(v) for v in chunk), default=0)
                p = max(0, mx.bit_length() - 3)
            else:
                p = param
            if p >= esc:
                p = esc - 1
            w.u(p, plen)
            for v in chunk:
                u = _flac_zigzag(v)
                w.unary(u >> p)
                if p:
                    w.u(u & ((1 << p) - 1), p)
    assert pos == len(resid)


def _flac_write_subframe(w, samples, bps, kind, wasted=0, porder=0, method=0,
                         escape=False, lpc_order=2, lpc_shift=5):
    import numpy as np

    if wasted:
        assert all(v % (1 << wasted) == 0 for v in samples)
        samples = [v >> wasted for v in samples]
    eff = bps - wasted
    bs = len(samples)
    w.u(0, 1)  # padding
    if kind == "const":
        w.u(0, 6)
    elif kind == "verbatim":
        w.u(1, 6)
    elif kind.startswith("fixed"):
        w.u(8 + int(kind[5]), 6)
    elif kind == "lpc":
        w.u(31 + lpc_order, 6)
    else:
        raise AssertionError(kind)
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)
    if kind == "const":
        assert len(set(samples)) == 1
        w.s(samples[0], eff)
        return
    if kind == "verbatim":
        for v in samples:
            w.s(v, eff)
        return
    if kind.startswith("fixed"):
        order = int(kind[5])
        for v in samples[:order]:
            w.s(v, eff)
        # independent residual formulation: FIXED order-k residual IS
        # the k-th finite difference of the signal
        arr = np.array(samples, dtype=object)
        for _ in range(order):
            arr = arr[1:] - arr[:-1]
        resid = [int(v) for v in arr]
        _flac_write_residual(w, resid, order, bs, porder, method, escape=escape)
        return
    # LPC: fixed simple coefficients, exact integer residuals
    order = lpc_order
    coefs = [(1 << lpc_shift) if j == 0 else (1 if j % 2 else -1) for j in range(order)]
    prec = max(max(abs(c).bit_length() + 1 for c in coefs), 2)
    assert prec <= 15
    for v in samples[:order]:
        w.s(v, eff)
    w.u(prec - 1, 4)
    w.s(lpc_shift, 5)
    for c in coefs:
        w.s(c, prec)
    resid = []
    for i in range(order, bs):
        pred = sum(coefs[j] * samples[i - 1 - j] for j in range(order)) >> lpc_shift
        resid.append(samples[i] - pred)
    _flac_write_residual(w, resid, order, bs, porder, method, escape=escape)


def _encode_flac(channels, sr=8000, bps=16, frames=None, **sub_kw):
    """channels: list of per-channel sample lists. frames: list of dicts
    {n, mode, kinds, bs_code, sr_code, ...} splitting the samples; None
    → one independent-channel frame of everything."""
    n_ch = len(channels)
    total = len(channels[0])
    if frames is None:
        frames = [{"n": total}]
    out = bytearray(b"fLaC")
    si = _FlacWriter()
    si.u(16, 16)
    si.u(65535, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(sr, 20)
    si.u(n_ch - 1, 3)
    si.u(bps - 1, 5)
    si.u(total, 36)
    meta = si.to_bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(meta).to_bytes(3, "big") + meta

    pos = 0
    for fno, fr in enumerate(frames):
        bs = fr["n"]
        mode = fr.get("mode", "indep")
        seg = [ch[pos : pos + bs] for ch in channels]
        pos += bs
        w = _FlacWriter()
        w.u(0x3FFE, 14)
        w.u(0, 1)
        w.u(0, 1)  # fixed blocking
        bs_code = fr.get("bs_code")
        if bs_code is None:
            bs_code = 7
        w.u(bs_code, 4)
        sr_code = fr.get("sr_code", 0)
        w.u(sr_code, 4)
        if mode == "indep":
            ch_code = n_ch - 1
        else:
            ch_code = {"ls": 8, "rs": 9, "ms": 10}[mode]
        w.u(ch_code, 4)
        w.u(fr.get("ss_code", 0), 3)
        w.u(0, 1)
        for b in _flac_utf8(fr.get("number", fno)):
            w.u(b, 8)
        if bs_code == 6:
            w.u(bs - 1, 8)
        elif bs_code == 7:
            w.u(bs - 1, 16)
        else:
            expect = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}.get(
                bs_code, 256 << (bs_code - 8) if bs_code >= 8 else None
            )
            assert expect == bs, (bs_code, bs)
        if sr_code == 12:
            w.u(sr // 1000, 8)
        elif sr_code == 13:
            w.u(sr, 16)
        elif sr_code == 14:
            w.u(sr // 10, 16)
        hdr = w.to_bytes()
        w.u(_flac_crc8(hdr), 8)

        kinds = fr.get("kinds", [sub_kw.get("kind", "fixed2")] * n_ch)
        kw = {k: v for k, v in sub_kw.items() if k != "kind"}
        if mode == "indep":
            for c in range(n_ch):
                _flac_write_subframe(w, seg[c], bps, kinds[c], **kw)
        else:
            assert n_ch == 2
            left, right = seg
            side = [a - b for a, b in zip(left, right)]
            if mode == "ls":
                _flac_write_subframe(w, left, bps, kinds[0], **kw)
                _flac_write_subframe(w, side, bps + 1, kinds[1], **kw)
            elif mode == "rs":
                _flac_write_subframe(w, side, bps + 1, kinds[0], **kw)
                _flac_write_subframe(w, right, bps, kinds[1], **kw)
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                _flac_write_subframe(w, mid, bps, kinds[0], **kw)
                _flac_write_subframe(w, side, bps + 1, kinds[1], **kw)
        w.align()
        body = w.to_bytes()
        w.u(_flac_crc16(body), 16)
        out += w.to_bytes()
    assert pos == total
    return bytes(out)


def _flac_test_signal(n, seed=7, amp=1000, channels=1):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = (
        amp * np.sin(np.arange(n) * 0.13)
        + rng.randint(-amp // 4, amp // 4, size=n)
    ).astype(np.int64)
    return [list(map(int, base + 17 * c)) for c in range(channels)]


def test_flac_roundtrip_subframe_types():
    import numpy as np

    n = 64
    sig = _flac_test_signal(n)[0]
    for kind in ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"]:
        payload = _encode_flac([sig], kind=kind)
        arr, sr, bps = multimodal.decode_flac(payload)
        assert sr == 8000 and bps == 16
        assert arr.shape == (n, 1)
        assert [int(v) for v in arr[:, 0]] == sig, kind
    # CONSTANT needs a constant block
    payload = _encode_flac([[-123] * n], kind="const")
    arr, _, _ = multimodal.decode_flac(payload)
    assert np.all(arr[:, 0] == -123)


def test_flac_roundtrip_stereo_modes():
    n = 96
    chans = _flac_test_signal(n, channels=2)
    for mode in ["indep", "ls", "rs", "ms"]:
        payload = _encode_flac(
            chans, frames=[{"n": 48, "mode": mode}, {"n": 48, "mode": mode}]
        )
        arr, _, _ = multimodal.decode_flac(payload)
        assert arr.shape == (n, 2), mode
        for c in range(2):
            assert [int(v) for v in arr[:, c]] == chans[c], mode


def test_flac_rice_shapes_and_wasted_bits():
    n = 128
    sig = _flac_test_signal(n, amp=4000)[0]
    # partition order 2, 5-bit rice method
    p = _encode_flac([sig], kind="fixed2", porder=2, method=1)
    arr, _, _ = multimodal.decode_flac(p)
    assert [int(v) for v in arr[:, 0]] == sig
    # raw-escape partitions, incl. the raw=0 all-zero case
    p = _encode_flac([sig], kind="fixed1", porder=1, escape=True)
    arr, _, _ = multimodal.decode_flac(p)
    assert [int(v) for v in arr[:, 0]] == sig
    zeros = [0] * n
    p = _encode_flac([zeros], kind="fixed1", escape=True)
    arr, _, _ = multimodal.decode_flac(p)
    assert all(int(v) == 0 for v in arr[:, 0])
    # wasted bits: samples share a factor of 2^3
    shifted = [v << 3 for v in sig]
    p = _encode_flac([shifted], bps=20, kind="verbatim", wasted=3)
    arr, _, bps = multimodal.decode_flac(p)
    assert bps == 20
    assert [int(v) for v in arr[:, 0]] == shifted
    # LPC higher order + wasted bits together
    p = _encode_flac([shifted], bps=20, kind="lpc", wasted=3, lpc_order=4)
    arr, _, _ = multimodal.decode_flac(p)
    assert [int(v) for v in arr[:, 0]] == shifted


def test_flac_header_variants_and_crc_rejection():
    import pytest

    # tabled block-size code (192 = code 1), sr codes 12/13/14, 8-bit
    # bps, multi-frame with a multi-byte utf8 frame number
    chans = _flac_test_signal(384, amp=100, channels=1)
    sig = chans[0]
    p = _encode_flac(
        [sig],
        bps=8,
        sr=32000,
        frames=[
            {"n": 192, "bs_code": 1, "sr_code": 12},
            {"n": 100, "bs_code": 6, "sr_code": 13, "number": 200},
            {"n": 92, "bs_code": 7, "sr_code": 14},
        ],
        kind="fixed3",
    )
    arr, sr, bps = multimodal.decode_flac(p)
    assert (sr, bps) == (32000, 8)
    assert [int(v) for v in arr[:, 0]] == sig
    # corrupt one byte in the last frame body → CRC-16 must reject
    bad = bytearray(p)
    bad[-20] ^= 0x10
    with pytest.raises(ValueError):
        multimodal.decode_flac(bytes(bad))
    # corrupt the frame header → CRC-8 must reject
    bad = bytearray(p)
    # find first frame sync after metadata (fLaC + 4-byte hdr + 34+16)
    start = 4 + 4 + 34 + 16
    bad[start + 3] ^= 0x04
    with pytest.raises(ValueError):
        multimodal.decode_flac(bytes(bad))


def test_flac_features_match_wav_and_dispatch(spark):
    """The same PCM samples through the FLAC path and the WAV path must
    yield the IDENTICAL 8-dim fingerprint (both feed _audio_features),
    and extract_features must route fLaC payloads to the real decoder."""
    import struct

    n = 2048
    sig = _flac_test_signal(n, amp=12000)[0]
    flac = _encode_flac([sig], sr=8000, bps=16, kind="fixed2")
    pcm = b"".join(struct.pack("<h", v) for v in sig)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    assert multimodal.sniff_format(flac) == "flac"
    assert multimodal.flac_features(flac) == multimodal.wav_features(wav)

    rows = [(1, "audio", "audio/flac", flac, None), (2, "audio", "audio/wav", wav, None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_features(df).collect()}
    assert out[1].decoder == "flac"
    assert out[2].decoder == "wav"
    assert list(out[1].feature) == list(out[2].feature)


def test_flac_roundtrip_property_fuzz():
    """Hypothesis sweep: arbitrary int16 signals through randomized
    encoder configurations (subframe type x partition order x rice
    method x stereo mode) must decode bit-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=64, max_size=64,
        ),
        kind=st.sampled_from(
            ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"]
        ),
        porder=st.sampled_from([0, 1, 2]),
        method=st.sampled_from([0, 1]),
        escape=st.booleans(),
        mode=st.sampled_from(["indep", "ls", "rs", "ms"]),
    )
    def run(data, kind, porder, method, escape, mode):
        chans = [data, data[::-1]]
        payload = _encode_flac(
            chans,
            frames=[{"n": 64, "mode": mode}],
            kind=kind, porder=porder, method=method, escape=escape,
        )
        arr, _, _ = multimodal.decode_flac(payload)
        assert [int(v) for v in arr[:, 0]] == chans[0]
        assert [int(v) for v in arr[:, 1]] == chans[1]

    run()


# --- AIFF: independent test-side encoder (r8) ---------------------------


def _f80_encode(v):
    """80-bit extended float via math.frexp — independent of the
    decoder's integer reconstruction."""
    import math
    import struct

    if v == 0:
        return b"\x00" * 10
    sign = 0x8000 if v < 0 else 0
    m, e = math.frexp(abs(v))  # v = m * 2^e, 0.5 <= m < 1
    return struct.pack(">HQ", sign | ((e - 1) + 16383), int(m * (1 << 64)))


def _encode_aiff(channels, sr=8000, bits=16):
    import struct

    n_ch = len(channels)
    nframes = len(channels[0])
    fmt = {8: "b", 16: "h", 32: "i"}[bits]
    frames = bytearray()
    for i in range(nframes):
        for c in range(n_ch):
            frames += struct.pack(">" + fmt, channels[c][i])
    comm = struct.pack(">hLh", n_ch, nframes, bits) + _f80_encode(float(sr))
    ssnd = struct.pack(">LL", 0, 0) + bytes(frames)
    chunks = b""
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"  # word alignment pad
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def test_aiff_roundtrip_and_f80():
    import numpy as np

    sig = [int(12000 * np.sin(i * 0.21)) for i in range(101)]  # odd length
    for sr in [8000, 44100, 22050]:
        p = _encode_aiff([sig], sr=sr, bits=16)
        x, fr = multimodal.decode_aiff(p)
        assert fr == sr
        assert np.allclose(x, np.array(sig) / 32768.0)
    # stereo averages; 8-bit SIGNED (unlike WAV); 32-bit
    l = [100, -100, 50]
    r = [-100, 100, -50]
    x, _ = multimodal.decode_aiff(_encode_aiff([l, r], bits=16))
    assert np.allclose(x, [0.0, 0.0, 0.0])
    x, _ = multimodal.decode_aiff(_encode_aiff([[-128, 0, 127]], bits=8))
    assert np.allclose(x, [-1.0, 0.0, 127 / 128])
    big = [2**30, -(2**30)]
    x, _ = multimodal.decode_aiff(_encode_aiff([big], bits=32))
    assert np.allclose(x, [0.5, -0.5])


def test_aiff_features_match_wav_and_dispatch(spark):
    """Identical PCM through AIFF and WAV must give the IDENTICAL
    fingerprint (shared _audio_features), and extract_features routes
    FORM/AIFF payloads to the real decoder."""
    import struct

    import numpy as np

    sig = [int(9000 * np.sin(i * 0.13)) for i in range(2048)]
    aiff = _encode_aiff([sig], sr=8000, bits=16)
    pcm = b"".join(struct.pack("<h", v) for v in sig)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    assert multimodal.sniff_format(aiff) == "aiff"
    assert multimodal.aiff_features(aiff) == multimodal.wav_features(wav)
    rows = [(1, "audio", "audio/aiff", aiff, None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "aiff"


def _encode_au(samples, enc, sr=8000, channels=1):
    """Independent AU encoder: 24-byte big-endian header + payload.
    enc 1/27 expect already-companded uint8 bytes; 2/3/5 linear ints."""
    import struct

    if enc in (1, 27, 2):
        body = bytes((v if enc != 2 else v & 0xFF) for v in samples)
    elif enc == 3:
        body = b"".join(struct.pack(">h", v) for v in samples)
    else:
        body = b"".join(struct.pack(">i", v) for v in samples)
    return struct.pack(">IIIII", 24, len(body), enc, sr, channels).join(
        [b".snd", body]
    )


def test_au_decode_variants():
    import numpy as np

    sig16 = [int(11000 * np.sin(i * 0.17)) for i in range(64)]
    x, fr = multimodal.decode_au(_encode_au(sig16, enc=3))
    assert fr == 8000
    assert np.allclose(x, np.array(sig16) / 32768.0)
    x, _ = multimodal.decode_au(_encode_au([-128, 0, 127], enc=2))
    assert np.allclose(x, [-1.0, 0.0, 127 / 128])
    x, _ = multimodal.decode_au(_encode_au([2**30, -(2**30)], enc=5))
    assert np.allclose(x, [0.5, -0.5])
    # mu-law AND A-law: companded with the INDEPENDENT test-side G.711
    # encoders, decoded through the shared LUTs
    lin = [0, 1000, -1000, 30000, -30000, 8]
    ul = [_linear_to_ulaw(v) for v in lin]
    x, _ = multimodal.decode_au(_encode_au(ul, enc=1))
    assert np.max(np.abs(x * 32768.0 - np.array(lin))) < 1000  # companding error bound
    al = [_linear_to_alaw(v) for v in lin]
    x, _ = multimodal.decode_au(_encode_au(al, enc=27))
    assert np.max(np.abs(x * 32768.0 - np.array(lin))) < 1000
    import pytest

    with pytest.raises(ValueError, match="not an AU"):
        multimodal.decode_au(b"RIFFxxxx" + b"\x00" * 32)


def test_au_dispatch_and_wav_parity(spark):
    """The same mu-law byte stream through AU and through a G.711 WAV
    container must produce the IDENTICAL fingerprint (same LUT, same
    _audio_features)."""
    import numpy as np

    lin = [int(9000 * np.sin(i * 0.11)) for i in range(512)]
    comp = [_linear_to_ulaw(v) for v in lin]
    au = _encode_au(comp, enc=1)
    wav = _make_g711_wav(lin, tag=7)  # compands internally → same bytes
    assert multimodal.sniff_format(au) == "au"
    assert multimodal.au_features(au) == multimodal.wav_features(wav)
    df = spark.createDataFrame(
        [(1, "audio", "audio/basic", au, None)], schema=multimodal.MEDIA_SCHEMA
    )
    assert multimodal.extract_features(df).collect()[0].decoder == "au"


# --- TGA: independent test-side encoder (r8) ----------------------------


def _tga_rle(pixels, ps):
    """Independent RLE packer: greedy runs (>=2 identical) else raw
    literals, both capped at 128."""
    out = bytearray()
    i = 0
    n = len(pixels) // ps
    px = [bytes(pixels[k * ps : (k + 1) * ps]) for k in range(n)]
    while i < n:
        j = i
        while j + 1 < n and px[j + 1] == px[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1
            out.append(0x80 | (j - i))
            out += px[i]
            i = j + 1
        else:
            k = i
            while (
                k + 1 < n and (k + 1 >= n - 1 or px[k + 1] != px[k + 2])
                and k - i < 127
            ):
                k += 1
            out.append(k - i)
            for t in range(i, k + 1):
                out += px[t]
            i = k + 1
    return bytes(out)


def _encode_tga(arr, itype=2, rle=False, top_down=False, palette=None):
    """arr: HxWx3 RGB (itype 2/10), HxW gray (3/11), or HxW indices
    with palette (1/9)."""
    import struct

    import numpy as np

    h, w = arr.shape[:2]
    if itype in (2, 10):
        body = arr[:, :, [2, 1, 0]].astype(np.uint8)  # RGB -> BGR
        ps, bpp = 3, 24
        flat = body if top_down else body[::-1]
        pix = flat.tobytes()
    elif itype in (3, 11):
        ps, bpp = 1, 8
        flat = arr if top_down else arr[::-1]
        pix = flat.astype(np.uint8).tobytes()
    else:
        ps, bpp = 1, 8
        flat = arr if top_down else arr[::-1]
        pix = flat.astype(np.uint8).tobytes()
    use_rle = itype in (9, 10, 11)
    data = _tga_rle(pix, ps) if use_rle else pix
    cmap_type = 1 if palette is not None else 0
    cmap_len = len(palette) if palette is not None else 0
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, cmap_type, itype, 0, cmap_len,
        24 if palette is not None else 0, 0, 0, w, h, bpp,
        0x20 if top_down else 0,
    )
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b, g, r]) for r, g, b in palette)
    return hdr + pal + data + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"


def test_tga_decode_variants():
    import numpy as np

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (7, 9, 3), np.uint8)
    for itype, rle in [(2, False), (10, True)]:
        for td in [False, True]:
            got = multimodal.decode_tga(_encode_tga(rgb, itype=itype, top_down=td))
            assert np.array_equal(got, rgb), (itype, td)
    # runs compress well and round-trip
    flat = np.tile(np.array([[10, 200, 30]], np.uint8), (6, 16, 1))
    assert np.array_equal(multimodal.decode_tga(_encode_tga(flat, itype=10)), flat)
    # gray
    g = rng.randint(0, 256, (5, 4), np.uint8)
    got = multimodal.decode_tga(_encode_tga(g, itype=11))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))
    # palette
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = rng.randint(0, 4, (6, 6), np.uint8)
    got = multimodal.decode_tga(_encode_tga(idx, itype=1, palette=pal))
    want = np.array(pal, np.uint8)[idx]
    assert np.array_equal(got, want)
    import pytest

    with pytest.raises(ValueError):
        multimodal.decode_tga(b"\x00" * 10)


def test_tga_dispatch_and_resize(spark):
    import numpy as np

    grad = np.tile(
        (np.arange(10, dtype=np.uint8) * 25)[None, :, None], (4, 1, 3)
    )
    tga = _encode_tga(grad, itype=10)
    assert multimodal.sniff_format(tga) == "tga"
    rows = [(1, "image", "image/x-tga", tga, None)]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.extract_features(df).collect()[0]
    assert out.decoder == "tga"
    assert out.feature[:2] == [4.0, 10.0]
    resized = multimodal.resize_images(df, width=5, height=2).collect()[0]
    assert resized.meta["resample"] == "nearest"
    arr = multimodal.decode_netpbm(bytes(resized.payload))
    assert [int(v) for v in arr[0, :, 0]] == [0, 50, 100, 150, 200]


def test_f80_nonnormal_edge_cases():
    """r8 ADVICE pins: denormal 80-bit floats (exp field 0) use exponent
    1-16383, whose values all underflow double to ±0.0 — NOT 2^-16383
    (which would be off by 2x before underflow anyway); Inf/NaN
    (exp field 0x7FFF) must be rejected, not read as a huge finite rate."""
    import struct

    import pytest

    # true zero and a denormal (both round to 0.0 in double)
    assert multimodal._f80_to_float(struct.pack(">HQ", 0, 0)) == 0.0
    assert multimodal._f80_to_float(struct.pack(">HQ", 0, 12345)) == 0.0
    assert multimodal._f80_to_float(struct.pack(">HQ", 0x8000, 7)) == 0.0
    # Inf (mant 0 w/ explicit leading bit set is the x87 form; any mant)
    for mant in (0, 1 << 63, 123):
        with pytest.raises(ValueError):
            multimodal._f80_to_float(struct.pack(">HQ", 0x7FFF, mant))
    # sanity: a normal value still decodes exactly
    enc = struct.pack(">HQ", 16383 + 15, 44100 << 48)
    assert multimodal._f80_to_float(enc) == 44100.0


def test_tga_palette_index_bounds_checked():
    """r8 ADVICE pin: palette indices below cmap_first must raise, not
    wrap through uint8 arithmetic into a silently-wrong color."""
    import numpy as np
    import pytest

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = np.zeros((3, 3), np.uint8)  # all index 0
    p = bytearray(_encode_tga(idx, itype=1, palette=pal))
    assert p[3] == 0 and p[4] == 0  # cmap_first field
    p[3] = 1  # first palette entry now maps index 1 -> index 0 is OOB
    with pytest.raises(ValueError):
        multimodal.decode_tga(bytes(p))
    # indices past cmap_len must also raise, not wrap
    q = bytearray(_encode_tga(idx + 200, itype=1, palette=pal))
    with pytest.raises(ValueError):
        multimodal.decode_tga(bytes(q))


def test_au_oversized_data_size_rejected():
    """r8 ADVICE pin: an AU header claiming more data than the payload
    holds must error, not silently truncate."""
    import struct

    import pytest

    p = bytearray(_encode_au([0, 1, 2, 3], enc=3))
    struct.pack_into(">I", p, 8, 10_000)  # size field >> actual body
    with pytest.raises(ValueError):
        multimodal.decode_au(bytes(p))
    # the 0xFFFFFFFF "unknown size" sentinel still means rest-of-payload
    struct.pack_into(">I", p, 8, 0xFFFFFFFF)
    x, _ = multimodal.decode_au(bytes(p))
    assert len(x) == 4
