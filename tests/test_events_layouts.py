"""events.ts physical-layout drift: the driver regenerated the testdata
between rounds and the column changed from int64 NANOS to timestamp[us]
(NTZ), which broke every events query in the r2 gate. `_events_us` must
produce the SAME epoch-microsecond integers for every layout the data
has shipped in — int64 nanos, timestamp[us] NTZ, timestamp[us] LTZ."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans.queries import (
    _events_us,
)

# one row with sub-millisecond precision + one pre-1970 instant
US = [1_704_067_200_123_456, -123_456_789]
ROWS = {
    "event_id": [1, 2],
    "user_id": [10, 20],
    "event_type": ["click", "error"],
    "value": [1.5, 2.5],
    "props": ["{}", "{}"],
}


def _write(tmp_path, name: str, ts_array: pa.Array) -> str:
    d = tmp_path / name
    d.mkdir()
    t = pa.table({**{k: pa.array(v) for k, v in ROWS.items()}, "ts": ts_array})
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "layout,ts_array",
    [
        ("int64_nanos", pa.array([u * 1000 for u in US], pa.timestamp("ns"))),
        ("timestamp_us_ntz", pa.array(US, pa.timestamp("us"))),
        ("timestamp_us_ltz", pa.array(US, pa.timestamp("us", tz="UTC"))),
    ],
)
def test_events_us_is_layout_invariant(spark, tmp_path, layout, ts_array):
    sf_dir = _write(tmp_path, layout, ts_array)
    got = {
        r["event_id"]: r["ts_us"]
        for r in _events_us(spark, sf_dir).select("event_id", "ts_us").collect()
    }
    assert got == {1: US[0], 2: US[1]}, layout
    # schema contract: bigint, never a timestamp that could re-introduce
    # session-timezone dependence downstream
    assert dict(_events_us(spark, sf_dir).dtypes)["ts_us"] == "bigint"
