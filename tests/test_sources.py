"""Source-layer tests: schema-enforced CSV with corrupt-row quarantine,
metadata-only schema reads, multi-file union scans, path classification
(SURVEY.md §2.1 S1-S5, §2.2 P7)."""

from __future__ import annotations

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import schemas
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources import batch
from pyspark.sql import functions as F

CSV_HEADER = "order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item"


def test_csv_schema_enforced_with_quarantine(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(
        CSV_HEADER + "\n"
        "o1,u1,delivered,2024-03-01T10:00:00,,,,2\n"
        "o2,u2,pending,NOT_A_TIMESTAMP,,,,xyz\n"   # corrupt row
    )
    df = batch.read_csv(spark, str(p), schemas.ORDERS_SCHEMA)
    clean, corrupt = batch.split_corrupt(df)
    assert clean.count() == 1
    assert clean.collect()[0].order_id == "o1"
    assert corrupt.count() == 1
    assert "NOT_A_TIMESTAMP" in corrupt.collect()[0]["_corrupt_record"]


def test_csv_tolerates_extra_columns(spark, tmp_path):
    """Reference glue_job.py:172-174: subset check — extra columns in the
    file are fine, expected ones must map."""
    p = tmp_path / "orders_extra.csv"
    p.write_text(
        CSV_HEADER + ",surprise_column\n"
        "o1,u1,delivered,2024-03-01T10:00:00,,,,2,hello\n"
    )
    df = batch.read_csv(spark, str(p), schemas.ORDERS_SCHEMA)
    clean, _ = batch.split_corrupt(df)
    assert clean.columns == [f.name for f in schemas.ORDERS_SCHEMA.fields]
    assert clean.count() == 1


def test_parquet_schema_metadata_only(spark, sf_dir):
    s = batch.parquet_schema(spark, f"{sf_dir}/orders.parquet")
    assert [f.name for f in s.fields][:2] == ["o_orderkey", "o_custkey"]


def test_multi_file_union_scan(spark, tmp_path):
    """S5 (reference transform.py:286-290): one scan over an explicit
    file list."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(5).write.parquet(a)
    spark.range(5, 9).write.parquet(b)
    df = batch.read_parquet(spark, [a, b])
    assert df.count() == 9


def test_classify_path():
    assert batch.classify_path("s3://bucket/orders/x.csv") == "orders"
    assert batch.classify_path("data/order_items/y.csv") == "order_items"
    assert batch.classify_path("products/z.csv") == "products"
    assert batch.classify_path("raw/other/z.csv") is None


def test_classify_path_col(spark):
    df = spark.createDataFrame(
        [("/in/orders/a.csv",), ("/in/order_items/b.csv",), ("/raw/x.csv",)], "path string"
    )
    got = [r[0] for r in df.select(batch.classify_path_col(F.col("path"))).collect()]
    assert got == ["orders", "order_items", None]


def test_key_manipulation():
    assert batch.to_parquet_key("in/orders/2024/file.csv") == "file.parquet"
    assert batch.to_parquet_key("x/no_ext") == "no_ext.parquet"
    assert batch.normalize_s3_scheme("s3://b/k.parquet") == "s3a://b/k.parquet"
    assert batch.normalize_s3_scheme("/local/path") == "/local/path"


def test_key_manipulation_col(spark):
    df = spark.createDataFrame([("in/orders/a.csv",), ("b.csv",)], "k string")
    got = [r[0] for r in df.select(batch.to_parquet_key_col(F.col("k"))).collect()]
    assert got == ["a.parquet", "b.parquet"]


def test_kafka_payload_parser(spark):
    """The Kafka JSON payload parser (connection is config-only in this
    container; the parser is the logic, tested on batch data)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.sources import (
        parse_event_payloads,
    )

    raw = spark.createDataFrame(
        [
            ('{"event_id": 1, "ts_us": 1704067200000000, "user_id": 8, '
             '"event_type": "click", "value": 6.55, "props": "{}"}',),
            ("NOT JSON",),
        ],
        "value string",
    )
    out = parse_event_payloads(raw).collect()
    good = next(r for r in out if r.event_id == 1)
    assert good.event_type == "click" and good._corrupt_payload is None
    bad = next(r for r in out if r.event_id is None)
    assert bad._corrupt_payload == "NOT JSON"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source (r4 breadth): write partitioned ORC, read it back
    schema-stable, and verify predicate pushdown reaches the ORC scan
    (same scan-pruning contract the parquet paths pin)."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources.batch import (
        read_orc,
        write_orc,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 2.5).alias("v"),
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by="part")
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert set(back.columns) == {"k", "part", "v"}
    filtered = back.filter(F.col("k") < 10)
    assert filtered.count() == 10
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "LessThan(k,10)" in plan


def test_zorder_write_clusters_both_dimensions(spark, tmp_path, sf_dir):
    """Z-order layout (r5, operators/layout.py): after write_zordered on
    (user_id, ts_us), parquet footer stats bound every file to a small
    hyper-rectangle — BOTH columns' mean per-file span shrinks well
    below 1.0, while a plain single-column sort leaves the other
    column's span at ~1.0. Footer-only verification (no data read)."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        layout,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans.queries import (
        _events_us,
    )

    ev = _events_us(spark, sf_dir).select("user_id", "ts_us", "event_type", "value")

    zpath = str(tmp_path / "events_z")
    layout.write_zordered(ev, zpath, ["user_id", "ts_us"], n_files=64)
    zspan = layout.file_span_profile(zpath, ["user_id", "ts_us"])

    spath = str(tmp_path / "events_sorted")
    (
        ev.repartitionByRange(64, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    sspan = layout.file_span_profile(spath, ["user_id", "ts_us"])

    # z-order clusters BOTH dims (64 range files = 6 top Morton bits =
    # 3 bits per dim, ~1/8 span each); the plain sort clusters only
    # user_id
    assert zspan["user_id"] < 0.35
    assert zspan["ts_us"] < 0.35
    assert sspan["user_id"] < 0.5          # sanity: sort did its one dim
    assert sspan["ts_us"] > 0.9            # ...and nothing for the other
    # pruning-relevant: z-order beats the sort on the unsorted dim by 2x+
    assert zspan["ts_us"] * 2 < sspan["ts_us"]

    # the write is lossless (same rows, any order)
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.agg(F.sum("user_id")).collect()[0][0] == ev.agg(F.sum("user_id")).collect()[0][0]


def test_file_span_profile_temporal_and_decimal_stats(spark, tmp_path):
    """r6 ADVICE fix: file_span_profile coerces non-float footer stats
    per physical type — timestamp/date/decimal columns (the domain
    zorder_key itself supports) profile correctly instead of raising,
    and string columns raise an explicit TypeError rather than being
    silently mis-ranked."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        layout,
    )

    df = spark.sql(
        """
        SELECT id,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) AS ts,
               date_add(date'2024-01-01', CAST(id AS INT)) AS d,
               CAST(id AS DECIMAL(10,2)) AS dec,
               CAST(id AS STRING) AS s
        FROM range(0, 1000)
        """
    )
    path = str(tmp_path / "temporal")
    # INT96 timestamps have no pyarrow-readable stats; write the modern
    # physical type (testdata is already timestamp[us])
    old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(8, "id")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if old_tt is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old_tt)
    span = layout.file_span_profile(path, ["ts", "d"])
    # range-partitioned on id => every correlated column clusters tightly
    for c in ("ts", "d"):
        assert 0.0 < span[c] < 0.3, (c, span[c])
    # string stats ARE readable but have no numeric span — explicit reject
    with _pytest.raises(TypeError, match="non-numeric"):
        layout.file_span_profile(path, ["s"])
    # this pyarrow can't extract DECIMAL stats at all — named error, not
    # a leaked Arrow internal (the _stat_to_float Decimal branch stands
    # ready for pyarrow versions that can)
    with _pytest.raises(TypeError, match="unreadable footer"):
        layout.file_span_profile(path, ["dec"])


def test_read_write_json_roundtrip(spark, tmp_path):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources import (
        batch,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "v"]
    )
    out = str(tmp_path / "j")
    batch.write_json(df, out)
    back = batch.read_json(spark, out, schema=df.schema)
    assert sorted((r.id, r.name, r.v) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]


def test_read_text_lines_and_wholefile(spark, tmp_path):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.sources import (
        batch,
    )

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo doc\n")
    lines = batch.read_text(spark, str(p)).collect()
    assert sorted(r.value for r in lines) == ["line one", "line two", "solo doc"]
    docs = batch.read_text(spark, str(p), whole_file=True).collect()
    assert len(docs) == 2
    assert sorted(r.value for r in docs) == ["line one\nline two\n", "solo doc\n"]


def test_money_columns_are_two_decimal_at_every_gate_sf():
    """r18 (VERDICT r17 #4 'what's wrong'): cents() is exact ONLY for
    values that are the nearest double to a 2-decimal rational — the
    documented contract. The driver regenerates testdata between
    rounds (the events.ts lesson), and a money column arriving with >2
    decimals would flip the hash gate with no error anywhere. Pin the
    contract against the data itself: every value of every
    cents()-consumed column, at every gate SF, must satisfy
    x == double(round(x*100)/100) (an EXACT predicate: FP division by
    100 is correctly rounded, so the right side is the nearest double
    to a 2-decimal rational), and must stay far below the 2^52/100
    magnitude bound the ±0.5 trick needs."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    money = {
        "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "part": ["p_retailprice"],
    }
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for table, cols in money.items():
            files = glob.glob(f"/root/testdata/{sf}/{table}.parquet") + glob.glob(
                f"/root/testdata/{sf}/{table}/*.parquet"
            )
            assert files, f"{sf}/{table} missing"
            for f in files:
                t = pq.read_table(f, columns=cols)
                for c in cols:
                    x = t[c].to_numpy(zero_copy_only=False).astype("float64")
                    x = x[~np.isnan(x)]
                    assert np.abs(x).max() < 2**52 / 100, (sf, table, c, "magnitude")
                    recon = np.round(x * 100.0) / 100.0
                    bad = np.flatnonzero(recon != x)
                    assert bad.size == 0, (
                        f"{sf}/{table}.{c}: {bad.size} values with >2 "
                        f"decimals, e.g. {x[bad[:3]].tolist()} — the "
                        "cents() fast path is no longer exact for this "
                        "column; switch it to exact_sum/decimal"
                    )
