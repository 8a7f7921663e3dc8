"""Codec throughput probe: measure the pure-python decoders' MB/s on
synthetic media so the multimodal mapInPandas path has real numbers
(SCALING.md). Reuses the test-suite's independent encoders to build
inputs.

Usage: python tools/codec_probe.py [side]   (default image side 256)
Prints one JSON line per codec: {"codec", "mb", "sec", "mb_s"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    multimodal as mm,
)


def timed(fn, payload, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(payload)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(7)
    out = []

    from test_multimodal import (  # noqa: E402
        _build_mp4,
        _encode_gif,
        _encode_jpeg,
        _encode_jpeg_progressive,
        _encode_png,
        _make_g711_wav,
        _make_wav,
    )

    # smooth-ish image (realistic for DCT codecs; random is worst-case)
    x = np.arange(side)
    img = (
        (np.add.outer(x, x) * 3 + rng.integers(0, 8, (side, side))) % 256
    ).astype(np.uint8)
    rgb = np.stack([img, np.roll(img, 7, 0), np.roll(img, 13, 1)], axis=2)

    png = _encode_png(rgb, ctype=2, filters=[0, 1, 2, 3, 4])
    out.append(("png", rgb.nbytes, timed(mm.decode_png, png)))

    jp = _encode_jpeg(rgb)
    out.append(("jpeg_baseline", rgb.nbytes, timed(mm.decode_jpeg, jp)))

    jpp = _encode_jpeg_progressive(rgb)
    out.append(("jpeg_progressive", rgb.nbytes, timed(mm.decode_jpeg, jpp)))

    pal = rng.integers(0, 256, (256, 3), np.uint8)
    gif = _encode_gif([(0, 0, img)], pal, side, side)
    out.append(("gif", img.nbytes * 3, timed(mm.decode_gif, gif)))

    ppm = b"P6\n%d %d\n255\n" % (side, side) + rgb.tobytes()
    out.append(("netpbm", rgb.nbytes, timed(mm.decode_netpbm, ppm)))

    from test_multimodal import _encode_bmp, _encode_tiff  # noqa: E402

    bmp = _encode_bmp(rgb, 24)
    out.append(("bmp", rgb.nbytes, timed(mm.decode_bmp, bmp)))

    tif = _encode_tiff(rgb, compression=5, predictor=2)
    out.append(("tiff_lzw", rgb.nbytes, timed(mm.decode_tiff, tif)))

    wav = _make_wav(seconds=4.0, sr=44100)
    out.append(("wav_pcm16", len(wav), timed(mm.decode_wav, wav)))

    import math

    ref = [
        int(20000 * math.sin(2 * math.pi * 440 * i / 8000))
        for i in range(64000)
    ]
    g711 = _make_g711_wav(ref, 7)
    out.append(("wav_g711_ulaw", len(g711), timed(mm.decode_wav, g711)))

    mp4, _samples = _build_mp4()
    out.append(("mp4_demux", len(mp4), timed(mm.parse_mp4, mp4)))

    from test_multimodal import (  # noqa: E402
        _encode_aiff,
        _encode_au,
        _encode_flac,
        _linear_to_ulaw,
    )

    out.append(("aiff_pcm16", len(ref) * 2, timed(mm.decode_aiff, _encode_aiff([ref]))))
    au = _encode_au([_linear_to_ulaw(v) for v in ref], enc=1)
    out.append(("au_ulaw", len(au), timed(mm.decode_au, au)))
    flac = _encode_flac(
        [ref[:16000]],
        frames=[{"n": 4000} for _ in range(4)],
        kind="fixed2",
    )
    out.append(("flac_fixed2", 16000 * 2, timed(mm.decode_flac, flac, repeats=1)))

    from test_multimodal import _encode_tga  # noqa: E402

    tga = _encode_tga(rgb, itype=10)
    out.append(("tga_rle", rgb.nbytes, timed(mm.decode_tga, tga)))

    for codec, nbytes, sec in out:
        mb = nbytes / 1e6
        print(
            json.dumps(
                {
                    "codec": codec,
                    "mb": round(mb, 3),
                    "sec": round(sec, 4),
                    "mb_s": round(mb / sec, 2) if sec else None,
                }
            )
        )


if __name__ == "__main__":
    main()
