"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode status (r6) — largely REAL, honestly labeled per row:

- **WAV audio** (stdlib ``wave`` + numpy): real decode → duration /
  RMS / peak / zero-crossing rate / 4 FFT band energies. PCM
  8/16/32-bit via the stdlib; G.711 μ-law/A-law (format tags 7/6,
  which the stdlib refuses) via a manual RIFF walk + expansion
  tables (r6).
- **netpbm images** (binary P6/P5, pure numpy): real decode → dims +
  per-channel means + luminance stats; ``resize_images`` does a real
  nearest-neighbor resample and re-encodes valid P6 payloads.
- **PNG images** (r6, stdlib zlib + numpy): real decode — chunk walk,
  IDAT inflate, all five scanline filters reconstructed, color types
  0/2/3/4/6 at 1/2/4/8/16-bit depths, Adam7 interlacing — feeding the
  same feature/resize paths as netpbm.
- **JPEG images** (r6, pure numpy + stdlib): real baseline AND
  progressive decode — marker walk, DQT/DHT/SOF0/SOF2/DRI/SOS,
  canonical Huffman entropy decode with restart-marker segmentation
  (progressive: spectral selection + successive approximation incl.
  AC refinement correction-bit discipline), dequantization, exact 8×8
  matrix IDCT, chroma upsampling, JFIF YCbCr→RGB. Arithmetic-coded
  and 12-bit variants raise (→ honest stub fallback).
- **GIF images** (r6, stdlib + numpy): real decode — variable-width
  LSB-first LZW, global/local color tables, interlaced row order,
  transparency compositing onto the logical screen, frame selection
  for animated files.
- **BMP images** (r6): real decode — 1/4/8/24/32-bit, palettes,
  RLE8, bottom-up and top-down rows, 4-byte padding.
- **TIFF images** (r6): real baseline decode — both byte orders,
  stripped images, none/PackBits/LZW compression (TIFF's MSB-first
  early-change LZW, distinct from GIF's), horizontal-differencing
  predictor, WhiteIsZero/RGB/palette photometrics, 1/8-bit samples.
- **MP4 video** (r6, stdlib struct): real ISO BMFF DEMUX — box walk,
  mvhd/tkhd/mdhd/hdlr/stsd metadata, and full stsz/stsc/stco/co64
  sample-table resolution, so ``frame_sample`` slices true per-sample
  byte ranges out of mdat. Codec decode of the extracted access units
  (H.264 etc.) stays stubbed — that genuinely needs pyav/ffmpeg.
- every other container (webp/...) still goes through the
  deterministic stub. The ``decoder`` output column records which path
  produced each row, so downstream consumers can filter on
  provenance. Swapping the stub for PIL/librosa is a one-function
  change; the distributed plan is already correct.

Scale notes:
- media blobs ride in parquet binary columns; ``maxPartitionBytes``
  keeps per-task memory bounded; ``repartition`` before heavy decode
  spreads hot partitions.
- ``mapInPandas`` streams Arrow record batches — the Python worker
  never materializes a whole partition, so 100 MB videos don't OOM
  a 2 GB executor python process (batch size via
  spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha_prefix", T.StringType(), True),
        # codec that produced the feature:
        # 'wav' | 'png' | 'jpeg' | 'netpbm' | 'stub'
        T.StructField("decoder", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decode: deterministic fake feature vector from the payload
    bytes. Replace with a real codec (PIL / torchvision / librosa /
    pyav) in an environment that has them — the surrounding
    ``mapInPandas`` plumbing is codec-agnostic."""
    if payload is None:
        return []
    # 8-dim byte-histogram-ish sketch: deterministic, cheap, testable
    acc = [0.0] * 8
    for i, b in enumerate(payload[:4096]):
        acc[i % 8] += b / 255.0
    return [round(v, 6) for v in acc]


# --- real codecs (stdlib + numpy only; no PIL/librosa needed) ---------------


def _g711_ulaw_lut():
    """256-entry μ-law → linear int16 decode table (G.711): complement,
    then ((mantissa·8 + 0x84) << exponent) − 0x84, sign in bit 7."""
    import numpy as np

    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    t -= 0x84
    return np.where(u & 0x80, -t, t)


def _g711_alaw_lut():
    """256-entry A-law → linear int16 decode table (G.711): XOR 0x55;
    exponent 0 → mantissa·16 + 8, else (mantissa·16 + 0x108) <<
    (exponent − 1). Bit 7 SET (after the XOR) means POSITIVE — the
    classic Sun/CCITT convention, opposite of μ-law."""
    import numpy as np

    a = np.arange(256, dtype=np.int32) ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    t = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(a & 0x80, t, -t)


def _decode_wav_g711(payload: bytes):
    """Manual RIFF walk for the compressed-WAV formats the stdlib
    ``wave`` module refuses: G.711 μ-law (format tag 7) and A-law
    (tag 6). Returns (mono float64 samples, frame_rate)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (sz,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, fr, _brate, _balign, bits = fmt
    if tag == 7:
        lut = _g711_ulaw_lut()
    elif tag == 6:
        lut = _g711_alaw_lut()
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if bits != 8:
        raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
    x = lut[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return x, fr


def decode_wav(payload: bytes):
    """REAL WAV decode: stdlib ``wave`` for PCM (8/16/32-bit), manual
    RIFF walk + G.711 expansion for μ-law/A-law (r6). Returns (mono
    float64 samples in [-1, 1], frame_rate). Raises on anything else —
    callers dispatch via :func:`sniff_format` first."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n, ch, sw, fr = (
                w.getnframes(),
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
            )
            raw = w.readframes(n)
    except wave.Error:
        return _decode_wav_g711(payload)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit wav is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, fr


def _f80_to_float(b: bytes) -> float:
    """80-bit IEEE 754 extended float → python float (the COMM chunk's
    sample-rate field — AIFF's one non-trivial encoding; fully
    algorithmic: 1 sign + 15 exponent (bias 16383) + 64 explicit-
    leading-bit mantissa)."""
    import struct

    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0x7FFF:
        raise ValueError("non-finite 80-bit float (Inf/NaN)")
    if exp == 0:
        # denormal: exponent field 0 encodes 2^(1-16383), not 2^(-16383);
        # values are below the double denormal range so this rounds to ±0.0
        return sign * mant * 2.0 ** (1 - 16383 - 63)
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(payload: bytes):
    """REAL AIFF decode, manual IFF chunk walk (no deprecated stdlib
    aifc): FORM/AIFF container, COMM (channels, frames, bits, 80-bit
    extended-float rate), SSND (offset/blocksize header + big-endian
    two's-complement PCM, 8/16/32-bit). Returns (mono float64 samples
    in [-1, 1], frame_rate). Validation: round-tripped against an
    independently written test-side encoder (tests/test_multimodal.py)
    — like FLAC, every constant here is algorithmic (IFF layout, the
    f80 encoding), no empirical table to misremember."""
    import struct

    import numpy as np

    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF payload")
    i = 12
    comm = None
    ssnd = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (sz,) = struct.unpack(">I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"COMM":
            ch, nframes, bits = struct.unpack(">hLh", body[:8])
            fr = _f80_to_float(body[8:18])
            comm = (ch, nframes, bits, int(round(fr)))
        elif cid == b"SSND":
            off, _blk = struct.unpack(">LL", body[:8])
            ssnd = body[8 + off :]
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    ch, nframes, bits, fr = comm
    if bits == 16:
        x = np.frombuffer(ssnd, dtype=">i2").astype(np.float64) / 32768.0
    elif bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        x = np.frombuffer(ssnd, dtype=np.int8).astype(np.float64) / 128.0
    elif bits == 32:
        x = np.frombuffer(ssnd, dtype=">i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported AIFF sample width {bits}")
    x = x[: nframes * ch]
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return x, fr


def decode_au(payload: bytes):
    """REAL AU / Sun audio decode (.snd): magic '.snd', big-endian
    header (data offset, size, encoding, rate, channels), then
    big-endian payload. Encodings: 1 = G.711 μ-law (shared LUT with
    the WAV path), 27 = G.711 A-law, 2/3/5 = 8/16/32-bit linear PCM.
    Returns (mono float64 samples in [-1, 1], frame_rate)."""
    import struct

    import numpy as np

    if payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    off, size, enc, fr, ch = struct.unpack(">IIIII", payload[4:24])
    end = len(payload) if size == 0xFFFFFFFF else off + size
    if end > len(payload):
        raise ValueError("AU data size exceeds payload")
    data = payload[off:end]
    if enc == 1:
        x = _g711_ulaw_lut()[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif enc == 27:
        x = _g711_alaw_lut()[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        x = np.frombuffer(data, dtype=">i2").astype(np.float64) / 32768.0
    elif enc == 5:
        x = np.frombuffer(data, dtype=">i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
    return x, fr


def au_features(payload: bytes) -> list[float]:
    """Same 8-dim audio fingerprint, from real AU-decoded samples."""
    x, fr = decode_au(payload)
    return _audio_features(x, fr)


def aiff_features(payload: bytes) -> list[float]:
    """Same 8-dim audio fingerprint as :func:`wav_features`, from real
    AIFF-decoded samples (single implementation: _audio_features)."""
    x, fr = decode_aiff(payload)
    return _audio_features(x, fr)


def wav_features(payload: bytes) -> list[float]:
    """8-dim real audio features: duration_s, rms, peak, zero-crossing
    rate, and 4 log-ish FFT band energies (band edges at 1/64, 1/16,
    1/4 of Nyquist) — the classic cheap audio fingerprint, computed
    from actually-decoded samples. Single implementation shared with
    the FLAC path: delegates to :func:`_audio_features`."""
    x, fr = decode_wav(payload)
    return _audio_features(x, fr)


class _FlacBits:
    """MSB-first bit reader (FLAC is big-endian bit-packed; unlike the
    JPEG reader there is no byte stuffing)."""

    def __init__(self, data: bytes, bytepos: int = 0):
        self.d = data
        self.p = bytepos * 8  # absolute bit position

    def u(self, n: int) -> int:
        v = 0
        p, d = self.p, self.d
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.p = p
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if n and (v >> (n - 1)) else v

    def unary(self) -> int:
        """Number of 0 bits before the terminating 1 (consumed)."""
        q = 0
        p, d = self.p, self.d
        while not (d[p >> 3] >> (7 - (p & 7))) & 1:
            q += 1
            p += 1
        self.p = p + 1
        return q

    def align(self) -> None:
        self.p = (self.p + 7) & ~7

    def bytepos(self) -> int:
        return self.p >> 3


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame headers."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — FLAC whole-frame checksum."""
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_FLAC_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _flac_utf8_number(br: "_FlacBits") -> int:
    """UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC utf8-coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC utf8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(br: "_FlacBits", bs: int, order: int) -> list[int]:
    method = br.u(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.u(4)
    if bs % (1 << porder):
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for part in range(1 << porder):
        n = (bs >> porder) - (order if part == 0 else 0)
        param = br.u(plen)
        if param == escape:
            raw = br.u(5)
            out.extend(br.s(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << param) | br.u(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _flac_subframe(br: "_FlacBits", bs: int, bps: int) -> list[int]:
    if br.u(1):
        raise ValueError("FLAC subframe padding bit set")
    t = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        out = [br.s(eff)] * bs
    elif t == 1:  # VERBATIM
        out = [br.s(eff) for _ in range(bs)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        out = [br.s(eff) for _ in range(order)]
        resid = _flac_residual(br, bs, order)
        coefs = _FLAC_FIXED_COEFS[order]
        for i, r in enumerate(resid):
            pred = sum(c * out[order + i - 1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC, order t-31
        order = t - 31
        out = [br.s(eff) for _ in range(order)]
        prec = br.u(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC qlp precision")
        shift = br.s(5)
        if shift < 0:
            raise ValueError("negative FLAC qlp shift")
        coefs = [br.s(prec) for _ in range(order)]
        resid = _flac_residual(br, bs, order)
        for i, r in enumerate(resid):
            pred = sum(
                c * out[order + i - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes):
    """REAL FLAC decode, pure python/numpy: metadata walk (STREAMINFO),
    frame sync + CRC-8-verified headers, subframe types CONSTANT /
    VERBATIM / FIXED(0-4) / LPC(1-32), 4- and 5-bit rice partitions
    with raw-escape, wasted bits, all four channel assignments
    (independent, left/side, right/side, mid/side), CRC-16-verified
    frames. Returns (int64 samples shaped (n, channels), sample_rate,
    bits_per_sample). Validation model: FLAC is LOSSLESS, so the test
    suite round-trips this decoder against an independently written
    encoder (tests/test_multimodal.py) — decode(encode(x)) must equal
    x bit-for-bit for every subframe type and stereo mode; unlike webp
    or arithmetic JPEG there is no empirical table to misremember (all
    constants here are algorithmic: CRC polynomials, fixed-predictor
    coefficients, the published sample-rate code table)."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    streaminfo = None
    while True:
        hdr = payload[i]
        last, typ = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(payload[i + 1 : i + 4], "big")
        i += 4
        if typ == 0:
            sb = _FlacBits(payload, i)
            sb.u(16); sb.u(16); sb.u(24); sb.u(24)
            sr = sb.u(20)
            ch = sb.u(3) + 1
            bps = sb.u(5) + 1
            total = sb.u(36)
            streaminfo = (sr, ch, bps, total)
        i += ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    sr, n_ch, bps, total = streaminfo

    chans: list[list[int]] = [[] for _ in range(n_ch)]
    while i + 2 < len(payload) and (len(chans[0]) < total or total == 0):
        frame_start = i
        br = _FlacBits(payload, i)
        if br.u(14) != 0x3FFE:
            raise ValueError("lost FLAC frame sync")
        if br.u(1):
            raise ValueError("FLAC reserved header bit set")
        br.u(1)  # blocking strategy
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_code = br.u(4)
        ss_code = br.u(3)
        if br.u(1):
            raise ValueError("FLAC reserved header bit set")
        _flac_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.u(8) + 1
        elif bs_code == 7:
            bs = br.u(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.u(8)
        elif sr_code in (13, 14):
            br.u(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        # (decoded sr comes from STREAMINFO; codes 1-11 are consistent
        # by construction: _FLAC_SR_TABLE kept for header validation)
        hdr_end = br.bytepos()
        if _crc8(payload[frame_start:hdr_end]) != br.u(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            subs = [_flac_subframe(br, bs, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("stereo decorrelation needs 2 channels")
            side0 = 1 if ch_code != 9 else 0  # which subframe is 'side'
            a = _flac_subframe(br, bs, bps + (1 if side0 == 0 else 0))
            b = _flac_subframe(br, bs, bps + (1 if side0 == 1 else 0))
            if ch_code == 8:  # left/side: right = left - side
                subs = [a, [x - s for x, s in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [[x + s for x, s in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if ss_code == 3 or ss_code == 7:
            raise ValueError("reserved FLAC sample size code")

        br.align()
        body_end = br.bytepos()
        if _crc16(payload[frame_start:body_end]) != br.u(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        i = br.bytepos()
        for c in range(n_ch):
            chans[c].extend(subs[c])

    n = min(len(c) for c in chans)
    if total:
        n = min(n, total)
    arr = np.array([c[:n] for c in chans], dtype=np.int64).T
    return arr, sr, bps


def _audio_features(x, fr: int) -> list[float]:
    """Shared 8-dim audio feature tail (see wav_features)."""
    import numpy as np

    if len(x) == 0:
        return [0.0] * 8
    duration = len(x) / float(fr)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    total = float(spec.sum()) or 1.0
    nb = len(spec)
    edges = [0, max(1, nb // 64), max(2, nb // 16), max(3, nb // 4), nb]
    bands = [float(spec[edges[i] : edges[i + 1]].sum()) / total for i in range(4)]
    return [round(v, 6) for v in [duration, rms, peak, zcr, *bands]]


def flac_features(payload: bytes) -> list[float]:
    """Same 8-dim audio fingerprint as :func:`wav_features`, computed
    from real FLAC-decoded samples (channel-averaged, normalized by
    2^(bps-1) like the PCM path)."""
    arr, sr, bps = decode_flac(payload)
    x = arr.astype("float64").mean(axis=1) / float(1 << (bps - 1))
    return _audio_features(x, sr)


def decode_netpbm(payload: bytes):
    """REAL binary netpbm decode (P6 RGB / P5 gray, maxval ≤ 255) with
    pure numpy: returns an (H, W, 3) or (H, W) uint8 array. Handles
    '#' comments and arbitrary whitespace in the header, per spec."""
    import numpy as np

    if not payload or payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    # tokenize header: magic, width, height, maxval (comments skipped)
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    depth = 3 if payload[:2] == b"P6" else 1
    need = w * h * depth
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return raster.reshape((h, w, 3)) if depth == 3 else raster.reshape((h, w))


def netpbm_features(payload: bytes) -> list[float]:
    """8-dim real image features from decoded pixels: height, width,
    mean R/G/B, luminance mean/std, and luminance p50 — all from the
    actual raster, not the container bytes (shared feature definition
    with :func:`png_features` via ``_pixel_features``)."""
    return _pixel_features(decode_netpbm(payload))


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Reconstruct ``h`` scanlines of ``stride`` bytes from ``raw``
    starting at ``off``. All five filter types per the PNG spec:
    None(0), Sub(1) and Up(2) vectorized (Sub is a per-byte-lane
    cumulative sum mod 256), Average(3) and Paeth(4) per-byte within
    the row (sequentially dependent on the running left neighbour).
    Returns (uint8 array of shape (h, stride), next offset)."""
    import numpy as np

    need = (stride + 1) * h
    if len(raw) - off < need:
        raise ValueError("truncated PNG raster")
    arr = np.frombuffer(raw, np.uint8, count=need, offset=off).reshape(
        h, stride + 1
    )
    ftypes, lines = arr[:, 0], arr[:, 1:]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        f, line = int(ftypes[y]), lines[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = (
                (
                    np.cumsum(
                        line.reshape(stride // bpp, bpp).astype(np.uint64),
                        axis=0,
                    )
                    & 0xFF
                )
                .astype(np.uint8)
                .reshape(stride)
                if stride % bpp == 0
                else _png_sub_seq(line, bpp)
            )
        elif f == 2:  # Up
            rec = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average (sequential in x by spec)
            rec = line.astype(np.uint16).copy()
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            rec = rec.astype(np.uint8)
        elif f == 4:  # Paeth (sequential in x by spec)
            rec = line.astype(np.int32).copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = rec.astype(np.uint16)
    return out, off + need


def _png_sub_seq(line, bpp: int):
    import numpy as np

    rec = line.astype(np.uint16).copy()
    for x in range(bpp, len(rec)):
        rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
    return rec.astype(np.uint8)


def _png_rows_to_pixels(rows, w: int, channels: int, depth: int):
    """Assemble unfiltered scanline bytes into a (h, w, channels)
    sample array: uint16 for depth 16, uint8 otherwise (sub-byte gray
    samples are left as raw 0..2^d-1 values; gray scaling and palette
    expansion happen in the caller)."""
    import numpy as np

    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, channels)
    if depth == 16:
        return (
            np.frombuffer(rows.tobytes(), ">u2")
            .reshape(h, w, channels)
            .astype(np.uint16)
        )
    # depth 1/2/4 — only single-channel color types (gray / palette)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(h, w, depth) * weights).sum(axis=2).astype(np.uint8)
    return vals[..., None]


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_PNG_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(payload: bytes):
    """REAL PNG decode with stdlib ``zlib`` + numpy only (no PIL):
    returns an (H, W, C) array, C per color type (1 gray, 2
    gray+alpha, 3 RGB/palette-expanded, 4 RGBA) — uint8 normally,
    uint16 for 16-bit-per-sample images (callers normalize).

    Full spec coverage (r6): bit depths 1/2/4/8/16 (sub-byte gray
    scaled to 8-bit, palette indices unpacked through PLTE), color
    types 0/2/3/4/6, and Adam7 interlacing (each of the seven passes
    unfiltered independently, pixels scattered into the output grid).
    Filter reconstruction lives in :func:`_png_unfilter`."""
    import struct
    import zlib

    import numpy as np

    if payload is None or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    i, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        i += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and ctype not in (0, 3)):
        raise ValueError(f"unsupported PNG bit depth {depth} for color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, channels * depth // 8)  # filter distance in bytes

    def stride_of(width: int) -> int:
        return (width * channels * depth + 7) // 8

    sample_dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, h, stride_of(w), bpp)
        px = _png_rows_to_pixels(rows, w, channels, depth)
    elif interlace == 1:  # Adam7
        px = np.zeros((h, w, channels), sample_dtype)
        off = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            rows, off = _png_unfilter(raw, off, hp, stride_of(wp), bpp)
            px[y0::dy, x0::dx] = _png_rows_to_pixels(rows, wp, channels, depth)
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype == 3:
        px = plte[px[..., 0]]
    elif depth < 8:  # sub-byte gray: scale 0..2^d-1 to full 0..255
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    return px


def _pixel_features(arr) -> list[float]:
    """Shared 8-dim image features from a decoded (H,W[,C]) raster:
    height, width, mean R/G/B, luminance mean/std/median. 16-bit
    rasters normalize to 8-bit (high byte) so features are comparable
    across depths."""
    import numpy as np

    if arr.dtype == np.uint16:
        arr = (arr >> 8).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    c = arr.shape[2]
    if c == 1:  # gray
        rgb = np.repeat(arr, 3, axis=2)
    elif c == 2:  # gray + alpha: color is channel 0
        rgb = np.repeat(arr[..., :1], 3, axis=2)
    else:  # RGB / RGBA: alpha ignored for color stats
        rgb = arr[..., :3]
    a = rgb.astype(np.float64)
    lum = 0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2]
    return [
        round(v, 6)
        for v in [
            float(arr.shape[0]),
            float(arr.shape[1]),
            float(a[..., 0].mean()),
            float(a[..., 1].mean()),
            float(a[..., 2].mean()),
            float(lum.mean()),
            float(lum.std()),
            float(np.median(lum)),
        ]
    ]


def png_features(payload: bytes) -> list[float]:
    """8-dim real image features from actually-decoded PNG pixels —
    identical feature definition to :func:`netpbm_features`."""
    return _pixel_features(decode_png(payload))


# --- GIF (LZW decode, stdlib + numpy) ---------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-variant LZW decode (variable code width, CLEAR/EOI codes,
    early code-width bump at table size 2^width). Returns the index
    stream as a list[int], capped at ``max_pixels``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: GIF packs codes LSB-first
    acc = nbits = pos = 0
    out: list[int] = []
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset_table()
    n = len(data)
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _gif_subblocks(payload: bytes, i: int):
    """Concatenate a GIF sub-block chain starting at ``i``; returns
    (bytes, index after the 0-terminator)."""
    parts = []
    while True:
        if i >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        ln = payload[i]
        i += 1
        if ln == 0:
            return b"".join(parts), i
        parts.append(payload[i : i + ln])
        i += ln


def decode_gif(payload: bytes, frame: int = 0):
    """REAL GIF decode (stdlib + numpy, no PIL): returns the
    ``frame``-th image as an (H, W, 3) uint8 RGB array.

    Implements the GIF89a/87a structure: logical screen descriptor,
    global/local color tables, the variable-width LSB-first LZW index
    stream (CLEAR/EOI handling, 4096-entry table cap), interlaced row
    ordering, and graphic-control transparency → background fill.
    Frames are composited naively onto the logical screen (disposal
    methods treated as 'draw over previous'), which is exact for the
    single-frame GIFs that dominate image corpora."""
    import numpy as np

    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    i = 13
    gct = None
    if flags & 0x80:
        sz = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, sz * 3, i).reshape(sz, 3)
        i += sz * 3
    if gct is not None and bg_index < len(gct):
        screen = np.tile(gct[bg_index], (sh, sw, 1)).astype(np.uint8)
    else:
        screen = np.zeros((sh, sw, 3), np.uint8)
    transparent: int | None = None
    seen = -1
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[i + 1]
            if label == 0xF9:  # graphic control
                blk, j = _gif_subblocks(payload, i + 2)
                transparent = blk[3] if (blk and blk[0] & 1) else None
                i = j
            else:
                _blk, i = _gif_subblocks(payload, i + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        x0 = int.from_bytes(payload[i + 1 : i + 3], "little")
        y0 = int.from_bytes(payload[i + 3 : i + 5], "little")
        iw = int.from_bytes(payload[i + 5 : i + 7], "little")
        ih = int.from_bytes(payload[i + 7 : i + 9], "little")
        iflags = payload[i + 9]
        i += 10
        ct = gct
        if iflags & 0x80:  # local color table
            sz = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload, np.uint8, sz * 3, i).reshape(sz, 3)
            i += sz * 3
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = payload[i]
        i += 1
        lzw, i = _gif_subblocks(payload, i)
        idx = np.array(
            _gif_lzw_decode(lzw, min_code, iw * ih), np.int32
        )
        if len(idx) < iw * ih:  # pad truncated streams with background
            idx = np.concatenate(
                [idx, np.zeros(iw * ih - len(idx), np.int32)]
            )
        grid = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced row order → sequential
            rows = np.concatenate(
                [
                    np.arange(0, ih, 8),
                    np.arange(4, ih, 8),
                    np.arange(2, ih, 4),
                    np.arange(1, ih, 2),
                ]
            )
            deinterlaced = np.empty_like(grid)
            deinterlaced[rows] = grid
            grid = deinterlaced
        rgb = ct[np.clip(grid, 0, len(ct) - 1)]
        region = screen[y0 : y0 + ih, x0 : x0 + iw]
        if transparent is not None:
            mask = (grid == transparent)[..., None]
            region[:] = np.where(mask, region, rgb)
        else:
            region[:] = rgb
        transparent = None
        seen += 1
        if seen == frame:
            return screen.copy()
    if seen >= 0:
        return screen  # requested frame past the end: last composite
    raise ValueError("GIF contains no image data")


def gif_features(payload: bytes) -> list[float]:
    """8-dim real image features from the actually-decoded first GIF
    frame — identical feature definition to :func:`netpbm_features`."""
    return _pixel_features(decode_gif(payload))


# --- BMP (Windows DIB, stdlib struct + numpy) -------------------------------


def decode_bmp(payload: bytes):
    """REAL BMP decode: BITMAPINFOHEADER (and the larger V4/V5 headers,
    which extend it compatibly), bottom-up or top-down rows, 4-byte row
    padding; 24/32-bit BGR(A), 8-bit paletted, 1/4-bit packed paletted,
    and RLE8 compression. Returns (H, W, 3) uint8 RGB (alpha of 32-bit
    images ignored, like the rest of the feature pipeline)."""
    import struct

    import numpy as np

    if payload is None or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h, _planes, bpp, comp, _isz, _xp, _yp, used, _imp = struct.unpack(
        "<iihhIIiiII", payload[18:54]
    )
    top_down = h < 0
    h = abs(h)
    if comp not in (0, 1) or (comp == 1 and bpp != 8):
        raise ValueError(f"unsupported BMP compression {comp} at {bpp}bpp")
    palette = None
    if bpp <= 8:
        n_colors = used if used else (1 << bpp)
        pal_off = 14 + hdr_size
        raw = np.frombuffer(payload, np.uint8, n_colors * 4, pal_off)
        palette = raw.reshape(-1, 4)[:, [2, 1, 0]]  # BGRA → RGB

    if comp == 1:  # RLE8
        grid = np.zeros((h, w), np.uint8)
        i, x, y = data_off, 0, 0
        while i + 1 < len(payload):
            a, b = payload[i], payload[i + 1]
            i += 2
            if a > 0:  # run
                grid[y, x : min(x + a, w)] = b
                x += a
            elif b == 0:  # end of line
                x, y = 0, y + 1
                if y >= h:
                    break
            elif b == 1:  # end of bitmap
                break
            elif b == 2:  # delta
                x += payload[i]
                y += payload[i + 1]
                i += 2
            else:  # absolute mode, word-aligned
                n = b
                px = np.frombuffer(payload, np.uint8, n, i)
                grid[y, x : min(x + n, w)] = px[: max(0, min(n, w - x))]
                x += n
                i += n + (n & 1)
        rgb = palette[grid]
        return rgb if top_down else rgb[::-1].copy()

    stride = ((w * bpp + 31) // 32) * 4
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(
        h, stride
    )
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    elif bpp == 8:
        px = palette[rows[:, :w]]
    elif bpp in (1, 4):
        bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
        weights = 1 << np.arange(bpp - 1, -1, -1)
        idx = (bits.reshape(h, w, bpp) * weights).sum(axis=2)
        px = palette[idx]
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    px = np.ascontiguousarray(px)
    return px if top_down else px[::-1].copy()


def bmp_features(payload: bytes) -> list[float]:
    """8-dim real image features from actually-decoded BMP pixels."""
    return _pixel_features(decode_bmp(payload))


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a BMP payload, re-encoded P6."""
    return _resize_array(decode_bmp(payload), width, height)


# --- TGA (Targa: raw + RLE, true-color/gray/palette) ------------------------


def decode_tga(payload: bytes):
    """REAL TGA decode: 18-byte header walk, image types 1/9 (palette),
    2/10 (BGR(A) true color), 3/11 (gray), RLE (types 9-11) with
    packet-header run/raw semantics, bottom-up or top-down origin (bit
    5 of the descriptor). Returns HxWx3 RGB uint8. Everything here is
    algorithmic — no entropy tables — so the test suite round-trips it
    against an independently written encoder."""
    import struct

    import numpy as np

    if len(payload) < 18:
        raise ValueError("not a TGA payload")
    (idlen, cmap_type, itype, cmap_first, cmap_len, cmap_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", payload[:18])
    if itype not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"unsupported TGA image type {itype}")
    i = 18 + idlen
    palette = None
    if cmap_type == 1:
        if cmap_bits not in (24, 32):
            raise ValueError(f"unsupported TGA palette depth {cmap_bits}")
        cb = cmap_bits // 8
        raw = np.frombuffer(
            payload[i : i + cmap_len * cb], np.uint8
        ).reshape(cmap_len, cb)
        palette = raw[:, [2, 1, 0]].copy()  # BGR(A) → RGB
        i += cmap_len * cb
    ps = bpp // 8
    if itype in (1, 9) and (palette is None or bpp != 8):
        raise ValueError("palette TGA needs a color map and 8-bit indices")
    if itype in (2, 10) and bpp not in (24, 32):
        raise ValueError(f"unsupported true-color TGA depth {bpp}")
    if itype in (3, 11) and bpp != 8:
        raise ValueError(f"unsupported gray TGA depth {bpp}")

    need = w * h * ps
    if itype >= 9:  # RLE
        out = bytearray()
        while len(out) < need:
            hdr = payload[i]
            i += 1
            n = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated n times
                out += payload[i : i + ps] * n
                i += ps
            else:  # raw packet: n literal pixels
                out += payload[i : i + n * ps]
                i += n * ps
        pix = bytes(out[:need])
    else:
        pix = payload[i : i + need]
    a = np.frombuffer(pix, np.uint8).reshape(h, w, ps)
    if itype in (3, 11):
        rgb = np.repeat(a, 3, axis=2)
    elif itype in (1, 9):
        # widen before subtracting: uint8 arithmetic wraps on indices
        # below cmap_first, and a wrapped index into a >256-entry palette
        # would resolve silently to the wrong color
        idx = a[:, :, 0].astype(np.int32) - cmap_first
        if idx.size and (idx.min() < 0 or idx.max() >= len(palette)):
            raise ValueError("TGA palette index out of range")
        rgb = palette[idx][:, :, :3]
    else:
        rgb = a[:, :, [2, 1, 0]]  # BGR(A) → RGB, drop alpha
    rgb = np.ascontiguousarray(rgb)
    return rgb if desc & 0x20 else rgb[::-1].copy()  # bit 5: top-down


def tga_features(payload: bytes) -> list[float]:
    """8-dim real image features from actually-decoded TGA pixels."""
    return _pixel_features(decode_tga(payload))


def resize_tga(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a TGA payload, re-encoded P6."""
    return _resize_array(decode_tga(payload), width, height)


# --- TIFF (baseline: strips, PackBits, LZW w/ early change) -----------------


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits: n∈[0,127] → n+1 literals; n∈[129,255] → repeat
    the next byte 257−n times; 128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, Clear=256/EOI=257,
    first free code 258, and the spec's EARLY CHANGE — code width
    bumps when the next free code equals 2^width − 1 (one code earlier
    than GIF's handshake), identically on both sides."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1  # keep the accumulator machine-sized
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change
        prev = entry
    return bytes(out)


def decode_tiff(payload: bytes):
    """REAL baseline TIFF decode (stdlib struct + numpy): both byte
    orders, first IFD, stripped images, compression none(1) /
    LZW(5, with the spec's early-change width handshake) /
    PackBits(32773), horizontal-differencing predictor(2), photometric
    WhiteIsZero/BlackIsZero/RGB/Palette (16-bit colormap scaled to
    8-bit), 1- and 8-bit samples, 1 or 3+ samples per pixel (extra
    samples beyond RGB ignored). Returns (H, W) gray or (H, W, 3)
    uint8 RGB."""
    import struct

    import numpy as np

    if payload is None or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    TYPE_FMT = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[off : off + 8])
        if typ not in TYPE_FMT:
            continue
        size = TYPE_SIZE[typ] * cnt
        if size <= 4:
            src = off + 8
        else:
            (src,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
        tags[tag] = list(
            struct.unpack(
                bo + TYPE_FMT[typ] * cnt, payload[src : src + size]
            )
        )

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8])[0]
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if bits not in (1, 8):
        raise ValueError(f"unsupported TIFF bits-per-sample {bits}")

    row_bytes = (w * spp * bits + 7) // 8
    chunks = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expect = row_bytes * nrows
        raw = payload[off : off + cnt]
        if comp == 5:
            raw = _tiff_lzw_decode(raw, expect)
        elif comp == 32773:
            raw = _packbits_decode(raw, expect)
        if len(raw) < expect:
            raise ValueError("truncated TIFF strip")
        chunks.append(raw[:expect])
    flat = np.frombuffer(b"".join(chunks), np.uint8)
    if bits == 1:
        rows = flat.reshape(h, row_bytes)
        px = np.unpackbits(rows, axis=1)[:, : w * spp].reshape(h, w, spp)
        px = (px * 255).astype(np.uint8)
    else:
        px = flat.reshape(h, w * spp)
        if predictor == 2:  # horizontal differencing: per-channel cumsum
            px = (
                np.cumsum(
                    px.reshape(h, w, spp).astype(np.uint64), axis=1
                )
                & 0xFF
            ).astype(np.uint8).reshape(h, w * spp)
        px = px.reshape(h, w, spp)
    if photo == 3:  # palette
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        ncol = len(cmap) // 3
        cm = (np.array(cmap, np.uint32).reshape(3, ncol).T >> 8).astype(
            np.uint8
        )
        return cm[px[..., 0]]
    if spp == 1:
        gray = px[..., 0]
        return (255 - gray) if photo == 0 else gray
    return np.ascontiguousarray(px[..., :3])


def tiff_features(payload: bytes) -> list[float]:
    """8-dim real image features from actually-decoded TIFF pixels."""
    return _pixel_features(decode_tiff(payload))


def resize_tiff(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a TIFF payload, re-encoded P6."""
    return _resize_array(decode_tiff(payload), width, height)


# --- baseline JPEG (ITU-T T.81 sequential DCT, Huffman) ---------------------

# zigzag index k → natural (row-major) index, per T.81 Figure 5. Embedded
# as the spec constant; the test suite re-derives it independently from
# the diagonal-traversal definition.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_huff_lut(bits, vals):
    """Canonical Huffman decode table per T.81 Annex C: {(length, code):
    symbol}. Codes of each length are consecutive integers; moving to
    the next length left-shifts the running code."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed by the restart-marker split)."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.d, self.i, self.acc, self.n = data, 0, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("JPEG entropy data exhausted")
            self.acc = self.d[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _jpeg_split_entropy(payload: bytes, start: int):
    """Split a scan's entropy data at restart markers, removing 0xFF00
    byte stuffing. Returns (segments, end_index) where end_index is the
    position of the marker that terminated the scan — so the caller can
    keep walking a multi-scan (progressive) stream. DC predictors, EOB
    runs and bit alignment reset at each segment boundary, per DRI
    semantics."""
    segs, cur, i = [], bytearray(), start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            if i + 1 >= n:
                break
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or any other marker ends the scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes):
    """REAL JPEG decode (pure numpy + stdlib, no PIL): returns an
    (H, W, 3) uint8 RGB array, or (H, W) for single-component
    grayscale JPEGs.

    Supported (r6): sequential DCT Huffman (SOF0/SOF1) AND progressive
    (SOF2) with both spectral selection and successive approximation —
    DC first/refinement scans, AC first scans with EOB runs, and AC
    refinement scans with correction bits (libjpeg jdphuff bitstream
    semantics, which is what every real encoder emits). 8-bit
    precision, 1- or 3-component frames, any h×v sampling whose
    factors divide the maxima, 8-/16-bit DQT entries, per-scan DHT
    redefinition, restart intervals. Arithmetic coding (SOF9+),
    hierarchical, and 12-bit raise ValueError — the mapInPandas
    dispatch falls back to the stub with honest provenance.

    Architecture: every scan (sequential = one full-band scan) decodes
    into per-component zigzag coefficient arrays; dequantization and
    the exact orthonormal matrix IDCT (f = Dᵀ F D) run once at the
    end, vectorized over all blocks."""
    import struct

    import numpy as np

    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (H, W, [(cid, h, v, tq), ...])
    restart_interval = 0
    scans: list[dict] = []
    i = 2
    n = len(payload)
    while i + 2 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker, per T.81 B.1.1.2
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if i + 4 > n:
            break
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        data = payload[i + 4 : i + 2 + ln]
        seg_end = i + 2 + ln
        if marker == 0xDB:  # DQT — possibly several tables per marker
            j = 0
            while j < len(data):
                pq, tq = data[j] >> 4, data[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(data, np.uint8, 64, j).astype(np.int32)
                    j += 64
                else:
                    tbl = np.frombuffer(data, ">u2", 64, j).astype(np.int32)
                    j += 128
                qt[tq] = tbl  # zigzag order, as stored
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            prec, hh, ww, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq_id = data[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (hh, ww, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding process")
        elif marker == 0xC4:  # DHT — possibly several tables per marker
            j = 0
            while j < len(data):
                tc, th = data[j] >> 4, data[j] & 15
                bits = list(data[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(data[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _jpeg_huff_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS — record the scan, skip its entropy
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            sel = []
            for c in range(ns):
                cs, tda = data[1 + 2 * c], data[2 + 2 * c]
                idx = next(
                    k for k, comp in enumerate(frame[2]) if comp[0] == cs
                )
                sel.append((idx, tda >> 4, tda & 15))
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            segs, seg_end = _jpeg_split_entropy(payload, seg_end)
            scans.append(
                {
                    "sel": sel,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 15,
                    "huff": dict(huff),  # tables in effect at this SOS
                    "dri": restart_interval,
                    "segs": segs,
                }
            )
        i = seg_end
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    hh, ww, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-ww // (8 * hmax))
    mcuy = -(-hh // (8 * vmax))
    # full (MCU-padded) block grid per component; zigzag-order coefs
    coefs = [
        np.zeros((mcuy * v, mcux * h, 64), np.int32)
        for (_cid, h, v, _tq) in comps
    ]
    # per-component natural block counts (non-interleaved scan extent):
    # ceil(ceil(dim·sampling/max_sampling) / 8)
    def _ceil_div(a: int, b: int) -> int:
        return -(-a // b)

    nat_blocks = [
        (
            _ceil_div(_ceil_div(hh * v, vmax), 8),
            _ceil_div(_ceil_div(ww * h, hmax), 8),
        )
        for (_cid, h, v, _tq) in comps
    ]
    for scan in scans:
        _jpeg_decode_scan(scan, comps, coefs, nat_blocks, mcux, mcuy)

    # orthonormal 8-point DCT matrix, exact float64
    k8 = np.arange(8).reshape(8, 1)
    n8 = np.arange(8).reshape(1, 8)
    D = np.cos((2 * n8 + 1) * k8 * np.pi / 16) * np.sqrt(2.0 / 8)
    D[0] /= np.sqrt(2.0)
    zz = list(_JPEG_ZIGZAG)

    out_planes = []
    for ci, (_cid, ch, cv, ctq) in enumerate(comps):
        if vmax % cv or hmax % ch:
            raise ValueError("non-integral JPEG sampling ratio")
        q = qt[ctq]
        cz = coefs[ci]
        bh, bw = cz.shape[:2]
        nat = np.zeros(cz.shape, np.float64)
        nat[..., zz] = cz * q  # nat[ZIGZAG[k]] = coef_zz[k] · q_zz[k]
        blocks = nat.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", D.T, blocks, D) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        out_planes.append(plane[:hh, :ww])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_decode_scan(scan, comps, coefs, nat_blocks, mcux, mcuy):
    """Decode ONE scan's entropy segments into the zigzag coefficient
    arrays. Handles all four progressive scan kinds (DC/AC ×
    first/refinement) plus sequential scans (ss=0, se=63, ah=0) through
    the same first-scan path. Restart segments reset DC predictors,
    the EOB run, and bit alignment."""
    sel = scan["sel"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    huff = scan["huff"]
    interleaved = len(sel) > 1
    if interleaved:
        units_total = mcux * mcuy
    else:
        bh, bw = nat_blocks[sel[0][0]]
        units_total = bh * bw
    per_seg = scan["dri"] if scan["dri"] else units_total
    unit = 0

    def first_block(rd, cf, ci, td, ta, pred, eobrun):
        k = ss
        if ss == 0:
            dc_lut = huff[(0, td)]
            t = rd.huff(dc_lut)
            diff = _jpeg_extend(rd.bits(t), t) if t else 0
            pred[ci] += diff
            cf[0] = pred[ci] << al
            k = 1
        if k > se:
            return
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        ac_lut = huff[(1, ta)]
        while k <= se:
            rs = rd.huff(ac_lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn
                    eobrun[0] = (1 << r) - 1 + (rd.bits(r) if r else 0)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            cf[k] = _jpeg_extend(rd.bits(s), s) << al
            k += 1

    def refine_block(rd, cf, ci, td, ta, pred, eobrun):
        if ss == 0:  # DC refinement: one bit per block
            if rd.bit():
                cf[0] |= 1 << al
            return
        # AC refinement — libjpeg jdphuff semantics
        p1, m1 = 1 << al, -1 << al
        ac_lut = huff[(1, ta)]
        k = ss
        if eobrun[0] == 0:
            while k <= se:
                rs = rd.huff(ac_lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        eobrun[0] = (1 << r) + (rd.bits(r) if r else 0)
                        break
                    val = 0  # ZRL: skip 16 zero-history coefficients
                else:
                    val = p1 if rd.bit() else m1
                while k <= se:
                    if cf[k]:
                        if rd.bit() and (cf[k] & p1) == 0:
                            cf[k] += p1 if cf[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    cf[k] = val
                k += 1
        if eobrun[0] > 0:
            # rest of this block: correction bits only
            while k <= se:
                if cf[k]:
                    if rd.bit() and (cf[k] & p1) == 0:
                        cf[k] += p1 if cf[k] >= 0 else m1
                k += 1
            eobrun[0] -= 1

    block_fn = refine_block if ah else first_block
    for seg in scan["segs"]:
        if unit >= units_total:
            break
        rd = _JpegBits(seg)
        pred = [0] * len(comps)
        eobrun = [0]
        for _ in range(min(per_seg, units_total - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci, td, ta in sel:
                    _cid, ch, cv, _ctq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            cf = coefs[ci][my * cv + by, mx * ch + bx]
                            block_fn(rd, cf, ci, td, ta, pred, eobrun)
            else:
                ci, td, ta = sel[0]
                _bh, bw = nat_blocks[ci]
                by, bx = divmod(unit, bw)
                cf = coefs[ci][by, bx]
                block_fn(rd, cf, ci, td, ta, pred, eobrun)
            unit += 1


def jpeg_features(payload: bytes) -> list[float]:
    """8-dim real image features from actually-decoded JPEG pixels —
    identical feature definition to :func:`netpbm_features`."""
    return _pixel_features(decode_jpeg(payload))


# --- MP4 / ISO BMFF demux (real box + sample-table parsing, stub decode) ----


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate (type, payload_start, box_end) over one box level, per
    ISO/IEC 14496-12: 32-bit size, size==1 → 64-bit largesize,
    size==0 → extends to the enclosing container's end."""
    import struct

    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, i + hdr, i + size
        i += size


def parse_mp4(payload: bytes) -> dict:
    """REAL ISO BMFF (MP4) metadata parse with stdlib struct only: walks
    ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl and returns

    ``{brand, timescale, duration_s, n_tracks, tracks: [{handler,
    codec, timescale, duration_s, width, height, n_samples}]}``.

    Handles version-0 and version-1 full boxes (32/64-bit times) and
    16.16 fixed-point track dimensions. This is demux-level truth — no
    codec decode — and raises on anything that is not an MP4."""
    import struct

    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    info: dict = {
        "brand": payload[8:12].decode("ascii", "replace"),
        "timescale": 0,
        "duration_s": 0.0,
        "n_tracks": 0,
        "tracks": [],
    }

    def full_box(d, s):
        ver = d[s]
        return ver

    def parse_track(s, e) -> dict:
        trk = {
            "handler": None,
            "codec": None,
            "timescale": 0,
            "duration_s": 0.0,
            "width": 0.0,
            "height": 0.0,
            "n_samples": 0,
        }
        for typ, ps, pe in _mp4_boxes(payload, s, e):
            if typ == b"tkhd":
                ver = full_box(payload, ps)
                off = ps + (4 + 32 if ver == 1 else 4 + 20)
                off += 8 + 2 + 2 + 2 + 2 + 36  # reserved..matrix
                w, h = struct.unpack(">II", payload[off : off + 8])
                trk["width"], trk["height"] = w / 65536.0, h / 65536.0
            elif typ == b"mdia":
                for t2, q2, e2 in _mp4_boxes(payload, ps, pe):
                    if t2 == b"mdhd":
                        ver = full_box(payload, q2)
                        if ver == 1:
                            ts, dur = struct.unpack(
                                ">IQ", payload[q2 + 20 : q2 + 32]
                            )
                        else:
                            ts, dur = struct.unpack(
                                ">II", payload[q2 + 12 : q2 + 20]
                            )
                        trk["timescale"] = ts
                        trk["duration_s"] = dur / ts if ts else 0.0
                    elif t2 == b"hdlr":
                        trk["handler"] = payload[q2 + 8 : q2 + 12].decode(
                            "ascii", "replace"
                        )
                    elif t2 == b"minf":
                        for t3, q3, e3 in _mp4_boxes(payload, q2, e2):
                            if t3 != b"stbl":
                                continue
                            for t4, q4, _e4 in _mp4_boxes(payload, q3, e3):
                                if t4 == b"stsd":
                                    trk["codec"] = payload[
                                        q4 + 12 : q4 + 16
                                    ].decode("ascii", "replace")
                                elif t4 == b"stsz":
                                    (trk["n_samples"],) = struct.unpack(
                                        ">I", payload[q4 + 8 : q4 + 12]
                                    )
        return trk

    for typ, ps, pe in _mp4_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        for t1, q1, e1 in _mp4_boxes(payload, ps, pe):
            if t1 == b"mvhd":
                ver = full_box(payload, q1)
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", payload[q1 + 20 : q1 + 32])
                else:
                    ts, dur = struct.unpack(">II", payload[q1 + 12 : q1 + 20])
                info["timescale"] = ts
                info["duration_s"] = dur / ts if ts else 0.0
            elif t1 == b"trak":
                info["tracks"].append(parse_track(q1, e1))
    info["n_tracks"] = len(info["tracks"])
    if info["timescale"] == 0 and not info["tracks"]:
        raise ValueError("MP4 missing moov")
    return info


def mp4_sample_table(payload: bytes, handler: str = "vide"):
    """REAL sample-table resolution for the first track with the given
    handler: expands stsc chunk runs against stco/co64 chunk offsets
    and stsz sizes into a [(byte_offset, byte_size), ...] list — the
    true per-sample (per-frame, for video) byte ranges inside mdat.
    This is what a frame sampler actually needs; codec decode of the
    extracted access units stays out of scope (no pyav here)."""
    import struct

    if payload is None or len(payload) < 16 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")

    def find(path, s, e):
        for typ, ps, pe in _mp4_boxes(payload, s, e):
            if typ == path[0]:
                if len(path) == 1:
                    yield ps, pe
                else:
                    yield from find(path[1:], ps, pe)

    for trak_s, trak_e in find([b"moov", b"trak"], 0, len(payload)):
        hd = next(find([b"mdia", b"hdlr"], trak_s, trak_e), None)
        if hd is None or payload[hd[0] + 8 : hd[0] + 12] != handler.encode():
            continue
        stbl = next(find([b"mdia", b"minf", b"stbl"], trak_s, trak_e), None)
        if stbl is None:
            continue
        boxes = {t: (s, e) for t, s, e in _mp4_boxes(payload, *stbl)}
        if b"stsz" not in boxes or b"stsc" not in boxes:
            raise ValueError("MP4 stbl missing stsz/stsc")
        s, _e = boxes[b"stsz"]
        fixed, count = struct.unpack(">II", payload[s + 4 : s + 12])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(
                struct.unpack(f">{count}I", payload[s + 12 : s + 12 + 4 * count])
            )
        if b"stco" in boxes:
            s, _e = boxes[b"stco"]
            (nch,) = struct.unpack(">I", payload[s + 4 : s + 8])
            chunks = list(
                struct.unpack(f">{nch}I", payload[s + 8 : s + 8 + 4 * nch])
            )
        elif b"co64" in boxes:
            s, _e = boxes[b"co64"]
            (nch,) = struct.unpack(">I", payload[s + 4 : s + 8])
            chunks = list(
                struct.unpack(f">{nch}Q", payload[s + 8 : s + 8 + 8 * nch])
            )
        else:
            raise ValueError("MP4 stbl missing stco/co64")
        s, _e = boxes[b"stsc"]
        (nsc,) = struct.unpack(">I", payload[s + 4 : s + 8])
        runs = [
            struct.unpack(">III", payload[s + 8 + 12 * i : s + 20 + 12 * i])
            for i in range(nsc)
        ]
        out, si = [], 0
        for ri, (first, per_chunk, _desc) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunks)
            for ci in range(first - 1, last):
                off = chunks[ci]
                for _ in range(per_chunk):
                    if si >= len(sizes):
                        return out
                    out.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        return out
    raise ValueError(f"MP4 has no '{handler}' track")


def mp4_features(payload: bytes) -> list[float]:
    """8-dim real video features from demuxed MP4 metadata: duration_s,
    n_tracks, width, height, video sample count, video timescale, mean
    video sample bytes, total sample bytes — all from actual box
    parsing, no codec decode."""
    info = parse_mp4(payload)
    vid = next((t for t in info["tracks"] if t["handler"] == "vide"), None)
    try:
        table = mp4_sample_table(payload, "vide")
    except ValueError:
        table = []
    total = float(sum(sz for _off, sz in table))
    return [
        round(v, 6)
        for v in [
            float(info["duration_s"]),
            float(info["n_tracks"]),
            float(vid["width"]) if vid else 0.0,
            float(vid["height"]) if vid else 0.0,
            float(vid["n_samples"]) if vid else 0.0,
            float(vid["timescale"]) if vid else 0.0,
            total / len(table) if table else 0.0,
            total,
        ]
    ]


def sniff_format(payload: bytes | None) -> str | None:
    """Magic-byte container sniff for the formats decodable here:
    'wav' (RIFF....WAVE), 'flac' (fLaC), 'aiff' (FORM....AIFF), 'au'
    (.snd), 'png' (\\x89PNG), 'jpeg' (FFD8FF), 'gif' (GIF87a/89a),
    'mp4' (ftyp), or 'netpbm' (binary P5/P6). None → stub."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
        return "aiff"
    if payload[:4] == b".snd":
        return "au"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if (
        payload[:2] == b"BM"
        and len(payload) >= 54
        and payload[6:10] == b"\x00\x00\x00\x00"  # reserved words
    ):
        return "bmp"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:2] in (b"P5", b"P6") and payload[2:3].isspace():
        return "netpbm"
    if payload[-18:] == b"TRUEVISION-XFILE.\x00":
        return "tga"  # TGA 2.0 footer (the format has no leading magic)
    return None


def _decode_dispatch(payload: bytes | None, kind: str) -> tuple[str, list[float]]:
    """(decoder_name, feature) — real codec when the container is one
    we can decode without external libs, deterministic stub otherwise.
    A corrupt payload that sniffs as a known format falls back to the
    stub rather than failing the batch (quarantine-style tolerance)."""
    fmt = sniff_format(payload)
    try:
        if fmt == "wav":
            return "wav", wav_features(payload)
        if fmt == "flac":
            return "flac", flac_features(payload)
        if fmt == "aiff":
            return "aiff", aiff_features(payload)
        if fmt == "au":
            return "au", au_features(payload)
        if fmt == "png":
            return "png", png_features(payload)
        if fmt == "jpeg":
            return "jpeg", jpeg_features(payload)
        if fmt == "mp4":
            return "mp4", mp4_features(payload)
        if fmt == "gif":
            return "gif", gif_features(payload)
        if fmt == "bmp":
            return "bmp", bmp_features(payload)
        if fmt == "tiff":
            return "tiff", tiff_features(payload)
        if fmt == "tga":
            return "tga", tga_features(payload)
        if fmt == "netpbm":
            return "netpbm", netpbm_features(payload)
    except Exception:
        pass
    return "stub", _decode_stub(payload, kind)


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    ``mapInPandas`` (not a scalar pandas_udf) because decode may change
    cardinality in real pipelines (frame sampling explodes a video row
    into N frame rows) — the iterator-of-DataFrames contract supports
    that; here it stays 1:1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [
                _decode_dispatch(None if p is None else bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "sha_prefix": pdf["payload"].map(
                        lambda p: None if p is None else hashlib.sha256(bytes(p)).hexdigest()[:16]
                    ),
                    "decoder": [d[0] for d in decoded],
                    "feature": [d[1] for d in decoded],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: 1 video row → N frame rows.

    MP4 payloads get REAL demux (r6): every ``every_n``-th entry of the
    video track's resolved sample table (stsz/stsc/stco via
    :func:`mp4_sample_table`) is sliced out of the container — true
    codec access units with their exact byte ranges, ``sampler='mp4'``.
    Non-MP4 payloads keep the deterministic fixed-stride stub (≤8 fake
    frames, ``sampler='stub'``). The explode cardinality change and the
    Arrow iterator contract are identical on both paths."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
            T.StructField("sampler", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "frame_idx", "frame_bytes", "sampler"]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = b"" if r["payload"] is None else bytes(r["payload"])
                table = None
                if sniff_format(payload) == "mp4":
                    try:
                        table = mp4_sample_table(payload, "vide")
                    except ValueError:
                        table = None
                if table:
                    step = max(every_n, 1)
                    for i, (off, sz) in enumerate(table[::step]):
                        rows.append(
                            {
                                "media_id": r["media_id"],
                                "frame_idx": i,
                                "frame_bytes": payload[off : off + sz],
                                "sampler": "mp4",
                            }
                        )
                    continue
                n_frames = max(1, len(payload) // max(every_n, 1))
                for i in range(min(n_frames, 8)):  # stub: ≤8 fake frames
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_bytes": payload[i * every_n : (i + 1) * every_n],
                            "sampler": "stub",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata stats over binary payloads (no Python): byte
    sizes per kind — the cheap pre-filter you run BEFORE any decode."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


def _resize_array(arr, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a decoded raster (pure numpy index
    selection — deterministic, no interpolation rounding), re-encoded
    as binary P6. Gray/alpha channels normalize to RGB first; 16-bit
    samples reduce to their high byte (maxval 255 P6)."""
    import numpy as np

    if arr.dtype == np.uint16:
        arr = (arr >> 8).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif arr.shape[2] == 2:  # gray+alpha
        arr = np.repeat(arr[..., :1], 3, axis=2)
    elif arr.shape[2] == 4:  # RGBA → RGB
        arr = arr[..., :3]
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    resized = np.ascontiguousarray(arr[rows][:, cols])
    return b"P6\n%d %d\n255\n" % (width, height) + resized.tobytes()


def resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a binary netpbm payload,
    re-encoded as P6. Gray P5 inputs are expanded to RGB."""
    return _resize_array(decode_netpbm(payload), width, height)


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a PNG payload (decoded via
    :func:`decode_png`), re-encoded as binary P6 — same output
    container as the netpbm path so downstream stages see one format."""
    return _resize_array(decode_png(payload), width, height)


def resize_jpeg(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a baseline JPEG payload
    (decoded via :func:`decode_jpeg`), re-encoded as binary P6."""
    return _resize_array(decode_jpeg(payload), width, height)


def resize_gif(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a GIF's first frame (decoded
    via :func:`decode_gif`), re-encoded as binary P6."""
    return _resize_array(decode_gif(payload), width, height)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize (1:1 row transform over image rows): output schema
    carries the resized payload plus the target dims in meta.

    netpbm, PNG and baseline JPEG payloads get a REAL nearest-neighbor
    resample (pure numpy) re-encoded as P6. Containers without a local
    codec keep the deterministic truncate-to-budget STUB (a
    ``width*height*3``-byte budget models the decoded RGB size).
    ``meta['resample']`` records which path ran — the same per-row
    provenance contract as extract_features' ``decoder`` column."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = width * height * 3
        for pdf in batches:
            metas = []
            payloads = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                resample = "stub"
                if p is None:
                    payload = None
                else:
                    b = bytes(p)
                    fmt = sniff_format(b)
                    if fmt in ("netpbm", "png", "jpeg", "gif", "bmp", "tiff", "tga"):
                        try:
                            fn = {
                                "netpbm": resize_netpbm,
                                "png": resize_png,
                                "jpeg": resize_jpeg,
                                "gif": resize_gif,
                                "bmp": resize_bmp,
                                "tiff": resize_tiff,
                                "tga": resize_tga,
                            }[fmt]
                            payload = fn(b, width, height)
                            resample = "nearest"
                        except Exception:
                            payload = b[:budget]
                    else:
                        payload = b[:budget]  # STUB resample
                payloads.append(payload)
                meta = dict(m) if m is not None else {}
                meta.update(
                    {
                        "resized_w": str(width),
                        "resized_h": str(height),
                        "resample": resample,
                    }
                )
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime_type": pdf["mime_type"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)
