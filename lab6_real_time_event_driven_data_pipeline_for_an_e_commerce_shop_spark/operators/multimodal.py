"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode status (r5) — partially REAL, honestly labeled per row:

- **WAV audio** (RIFF/PCM, stdlib ``wave`` + numpy): real decode →
  duration / RMS / peak / zero-crossing rate / 4 FFT band energies.
- **netpbm images** (binary P6/P5, pure numpy): real decode → dims +
  per-channel means + luminance stats; ``resize_images`` does a real
  nearest-neighbor resample and re-encodes valid P6 payloads.
- every other container (png/jpeg/mp4/...) still goes through the
  deterministic stub — those codecs need PIL/pyav, absent here. The
  ``decoder`` output column records which path produced each row, so
  downstream consumers can filter on provenance. Swapping the stub for
  PIL/librosa is a one-function change; the distributed plan is
  already correct.

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
        # which codec produced the feature: 'wav' | 'netpbm' | 'stub'
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


def decode_wav(payload: bytes):
    """REAL RIFF/PCM WAV decode via the stdlib ``wave`` module: returns
    (mono float64 samples in [-1, 1], frame_rate). Raises on anything
    that is not an uncompressed PCM wav — callers dispatch via
    :func:`sniff_format` first."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, sw, fr = (
            w.getnframes(),
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
        )
        raw = w.readframes(n)
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


def wav_features(payload: bytes) -> list[float]:
    """8-dim real audio features: duration_s, rms, peak, zero-crossing
    rate, and 4 log-ish FFT band energies (band edges at 1/64, 1/16,
    1/4 of Nyquist) — the classic cheap audio fingerprint, computed
    from actually-decoded samples."""
    import numpy as np

    x, fr = decode_wav(payload)
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
    actual raster, not the container bytes."""
    import numpy as np

    arr = decode_netpbm(payload)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    a = arr.astype(np.float64)
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


def sniff_format(payload: bytes | None) -> str | None:
    """Magic-byte container sniff for the formats decodable here:
    'wav' (RIFF....WAVE) or 'netpbm' (binary P5/P6). None → stub."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] in (b"P5", b"P6") and payload[2:3].isspace():
        return "netpbm"
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
    """Video frame-sampling SHAPE demo: 1 video row → N frame rows.
    Decode is stubbed (payload sliced as fake 'frames'); the explode
    cardinality change and output schema are the real contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = b"" if r["payload"] is None else bytes(r["payload"])
                n_frames = max(1, len(payload) // max(every_n, 1))
                for i in range(min(n_frames, 8)):  # stub: ≤8 fake frames
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_bytes": payload[i * every_n : (i + 1) * every_n],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata stats over binary payloads (no Python): byte
    sizes per kind — the cheap pre-filter you run BEFORE any decode."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
    )


def resize_netpbm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resample of a binary netpbm payload (pure
    numpy index selection — deterministic, no interpolation rounding),
    re-encoded as P6. Gray P5 inputs are expanded to RGB."""
    import numpy as np

    arr = decode_netpbm(payload)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    resized = arr[rows][:, cols]
    return b"P6\n%d %d\n255\n" % (width, height) + resized.tobytes()


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize (1:1 row transform over image rows): output schema
    carries the resized payload plus the target dims in meta.

    Binary netpbm payloads get a REAL nearest-neighbor resample
    (:func:`resize_netpbm`, pure numpy) re-encoded as P6. Other image
    containers (png/jpeg need PIL, absent here) keep the deterministic
    truncate-to-budget STUB (a ``width*height*3``-byte budget models
    the decoded RGB size). ``meta['resample']`` records which path ran
    — the same per-row provenance contract as extract_features'
    ``decoder`` column."""
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
                    if sniff_format(b) == "netpbm":
                        try:
                            payload = resize_netpbm(b, width, height)
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
