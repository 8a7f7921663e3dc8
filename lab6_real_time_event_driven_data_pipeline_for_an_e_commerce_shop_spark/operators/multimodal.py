"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (deterministic fake features, or
NotImplementedError for real codecs) — but everything Spark-side is
real and tested: the schema, the Arrow batch shape, partition sizing,
and the UDF signatures. Swapping ``_decode_stub`` for PIL/librosa is a
one-function change; the distributed plan is already correct.

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


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    ``mapInPandas`` (not a scalar pandas_udf) because decode may change
    cardinality in real pipelines (frame sampling explodes a video row
    into N frame rows) — the iterator-of-DataFrames contract supports
    that; here it stays 1:1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "sha_prefix": pdf["payload"].map(
                        lambda p: None if p is None else hashlib.sha256(bytes(p)).hexdigest()[:16]
                    ),
                    "feature": [
                        _decode_stub(None if p is None else bytes(p), k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
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


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize SHAPE demo (1:1 row transform over image rows):
    output schema carries the resized payload plus the target dims in
    meta. The pixel work is a clearly-marked STUB — a deterministic
    truncate-to-budget standing in for a real PIL/cv2 resample (a
    ``width*height*3``-byte budget models the decoded RGB size) — but
    the Arrow batch flow, the meta merge, and the schema contract are
    the real distributed plumbing a codec drop-in would inherit."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = width * height * 3
        for pdf in batches:
            metas = []
            payloads = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                payload = None if p is None else bytes(p)[:budget]  # STUB resample
                payloads.append(payload)
                meta = dict(m) if m is not None else {}
                meta.update({"resized_w": str(width), "resized_h": str(height)})
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
