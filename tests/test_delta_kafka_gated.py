"""Environment-gated integration tests that light up automatically when
the missing infrastructure appears (r3 VERDICT #4/#6):

- Real Delta Lake MERGE (reference transform.py:331-339): runs when
  `delta-spark` is importable. Executed in a SUBPROCESS with its own
  SparkSession, because Delta's SQL extensions must be configured at
  session creation and the suite's shared session can't be rebuilt.
- Kafka event-bus e2e (SURVEY.md §2.6 ST2): runs when
  $SPARK_GRAFT_KAFKA_BOOTSTRAP names a reachable broker and the
  spark-sql-kafka connector is on the classpath.

Both skip cleanly otherwise, so the suite stays green in the sandbox
and the coverage appears the moment the environment provides the
dependency.
"""

from __future__ import annotations

import os
import subprocess
import sys
import uuid

import pytest

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.upsert import (
    delta_available,
)

_DELTA_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

builder = (
    SparkSession.builder.master("local[4]")
    .appName("delta-merge-e2e")
    .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
    .config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    .config("spark.ui.enabled", "false")
)
spark = configure_spark_with_delta_pip(builder).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import upsert

assert upsert.delta_available()
path = sys.argv[1]

base = spark.createDataFrame(
    [("o1", "p1", 10.0), ("o1", "p2", 20.0)], "order_id string, product_id string, v double"
)
upsert.merge(spark, path, base, keys=["order_id", "product_id"])
import os
assert os.path.isdir(os.path.join(path, "_delta_log")), "real Delta path not taken"

# matched update + new insert
delta2 = spark.createDataFrame(
    [("o1", "p2", 25.0), ("o2", "p1", 30.0)], "order_id string, product_id string, v double"
)
upsert.merge(spark, path, delta2, keys=["order_id", "product_id"])
got = {(r.order_id, r.product_id): r.v for r in spark.read.format("delta").load(path).collect()}
assert got == {("o1", "p1"): 10.0, ("o1", "p2"): 25.0, ("o2", "p1"): 30.0}, got

# idempotent re-run: byte-identical logical content
upsert.merge(spark, path, delta2, keys=["order_id", "product_id"])
again = {(r.order_id, r.product_id): r.v for r in spark.read.format("delta").load(path).collect()}
assert again == got
print("DELTA_E2E_OK")
"""


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_real_delta_merge_idempotent(tmp_path):
    """The real DeltaTable.merge branch of upsert.merge: create-on-first-
    merge, whenMatchedUpdateAll + whenNotMatchedInsertAll, idempotent
    re-run. Subprocess = clean JVM with Delta extensions configured."""
    r = subprocess.run(
        [sys.executable, "-c", _DELTA_SCRIPT, str(tmp_path / "delta_table")],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "DELTA_E2E_OK" in r.stdout


@pytest.mark.skipif(
    "SPARK_GRAFT_KAFKA_BOOTSTRAP" not in os.environ,
    reason="no Kafka broker configured ($SPARK_GRAFT_KAFKA_BOOTSTRAP)",
)
def test_kafka_event_bus_end_to_end(spark, tmp_path):
    """readStream(kafka) → parse_event_payloads → parquet sink, against
    a real broker: produce via Spark's batch Kafka sink, drain with
    AvailableNow, assert typed rows + corrupt-payload quarantine column.
    Mirrors the file-source pipeline contract on the event-bus path."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.sources import (
        kafka_raw_stream,
        parse_event_payloads,
    )

    bootstrap = os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"]
    topic = f"events_e2e_{uuid.uuid4().hex[:8]}"

    events = spark.createDataFrame(
        [
            (1, 1_700_000_000_000_000, 10, "click", 1.5, "{}"),
            (2, 1_700_000_000_500_000, 20, "purchase", 99.0, "{}"),
        ],
        "event_id long, ts_us long, user_id long, event_type string, value double, props string",
    )
    payloads = events.select(
        F.to_json(
            F.struct("event_id", "ts_us", "user_id", "event_type", "value", "props")
        ).alias("value")
    )
    corrupt = spark.createDataFrame([("not json at all",)], "value string")
    try:
        payloads.unionByName(corrupt).write.format("kafka").option(
            "kafka.bootstrap.servers", bootstrap
        ).option("topic", topic).save()
    except Exception as ex:  # connector jar missing despite broker env
        if "kafka" in str(ex).lower() and "source" in str(ex).lower():
            pytest.skip(f"spark-sql-kafka connector unavailable: {ex}")
        raise

    out = str(tmp_path / "events_out")
    q = (
        parse_event_payloads(kafka_raw_stream(spark, bootstrap, topic, "earliest"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    typed = {r.event_id: r.event_type for r in got.filter("_corrupt_payload IS NULL").collect()}
    assert typed == {1: "click", 2: "purchase"}
    assert got.filter("_corrupt_payload IS NOT NULL").count() == 1
