"""Streaming sources beyond the file stream: the event-bus (Kafka) path.

The reference's event source is S3-notification → SQS (SURVEY.md §2.1
S13); file streams subsume that. For a true event bus this module wires
``spark.readStream.format("kafka")`` and parses the JSON payloads into
the events schema. The Kafka connector jar isn't in this container, so
the *connection* is config-only here — but the payload parser (the part
with actual logic) is a plain DataFrame transform, unit-tested on batch
data (Spark's unified batch/stream semantics make that test exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def kafka_raw_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Configured Kafka source (requires the spark-sql-kafka package on
    the classpath; raises at stream start otherwise). Returns the raw
    (key, value, topic, partition, offset, timestamp) frame."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def parse_event_payloads(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON event payloads → typed events frame. Malformed payloads keep
    a ``_corrupt_payload`` copy instead of vanishing (quarantine-able
    downstream, same contract as the CSV ingest gate)."""
    parsed = raw.select(
        F.col(value_col).cast("string").alias("_raw"),
    ).select(
        F.from_json("_raw", EVENT_PAYLOAD_SCHEMA).alias("e"),
        F.col("_raw"),
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.ts_us").alias("ts_us"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
        # from_json yields an all-null struct (not a null struct) for
        # malformed input — treat a missing required event_id as corrupt
        F.when(
            F.col("e").isNull() | F.col("e.event_id").isNull(), F.col("_raw")
        ).alias("_corrupt_payload"),
    )
