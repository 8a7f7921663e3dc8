"""Key-value serving sink adapter — the reference's DynamoDB writer
(transform.py:226-257, 374-402) as a ``foreachBatch`` seam.

The reference collects KPI rows on the driver and writes them through a
``batch_writer`` with 25 items per request and ≤3 retries with 2^n
backoff. This module keeps that exact operational contract but hangs it
off Structured Streaming's ``foreachBatch``: each micro-batch's rows
are partitioned into chunks of ``batch_size`` and handed to a pluggable
``put_batch`` callable (boto3's ``batch_write_item`` in production, an
in-memory fake in tests), wrapped in the engine's retry decorator.

Scale note: rows are fetched with ``toLocalIterator`` (one partition in
driver memory at a time) — the serving edge is the one sanctioned
collect point (SURVEY.md §7: "no driver-side collect in the data path
except at serving edges"), and gold tables are small (per-date keys);
for fat serving tables use ``foreachPartition`` so executors write
directly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..functions.retry import retry_on_failure

PutBatch = Callable[[list[dict]], None]


def write_kv_batches(
    df: DataFrame,
    put_batch: PutBatch,
    batch_size: int = 25,
    max_attempts: int = 3,
) -> int:
    """Write every row of ``df`` through ``put_batch`` in chunks of
    ``batch_size`` (reference: 25/request), each chunk retried with
    exponential backoff (reference: ≤3 attempts, 2^n delay). Returns
    rows written."""
    guarded = retry_on_failure(max_attempts=max_attempts, base_delay=1.0)(put_batch)
    buf: list[dict] = []
    n = 0
    for row in df.toLocalIterator():
        buf.append(row.asDict())
        if len(buf) >= batch_size:
            guarded(buf)
            n += len(buf)
            buf = []
    if buf:
        guarded(buf)
        n += len(buf)
    return n


def kv_sink(put_batch: PutBatch, batch_size: int = 25):
    """foreachBatch adapter: ``stream.writeStream.foreachBatch(
    kv_sink(my_writer))`` — the Lambda/DynamoDB leg of the reference
    collapsed into the streaming graph."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_kv_batches(batch_df, put_batch, batch_size)

    return _sink
