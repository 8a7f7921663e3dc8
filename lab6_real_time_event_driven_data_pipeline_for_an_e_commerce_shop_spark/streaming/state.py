"""Custom keyed stateful streaming operators (``applyInPandasWithState``).

The reference's manifest is a hand-rolled stateful accumulator
(glue_job.py:96-104: per-order pending sets mutated across events).
The pipeline replaces that with staging-table joins
(streaming/pipeline.py — completeness spans two keys, so a single
keyed state op can't express it), but the *capability* of arbitrary
keyed state is still part of the engine surface: this module hosts it.

``running_user_totals`` is the canonical form: per-key state that
survives micro-batches (and restarts, via the checkpoint), Arrow-batched
both ways, no timeout (unbounded retention — the same contract as the
reference manifest's indefinite wait).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_CENT = Decimal("0.01")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        # exact integer cents — same determinism contract as the batch
        # KPIs (functions.expressions.cents_sum)
        T.StructField("total_cents", T.LongType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Mirror the batch path's double→DECIMAL(_,2) cast bit-for-bit
        # (functions.expressions.cents_sum): Spark casts via the SHORTEST
        # decimal repr of the double (BigDecimal.valueOf ≡ Python repr),
        # then rounds HALF_UP. pandas .round() (half-to-even on the raw
        # binary value) diverges at half-cents like 0.125; even
        # floor(x*100+0.5) diverges for values like 1.005 whose binary
        # form sits just below the half.
        cents += sum(
            int(Decimal(repr(v)).quantize(_CENT, rounding=ROUND_HALF_UP).scaleb(2))
            for v in pdf["value"]
        )
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + exact value total, maintained as
    keyed state across micro-batches. Update output mode: one row per
    user per batch with the latest totals (MERGE downstream for a
    serving view)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
