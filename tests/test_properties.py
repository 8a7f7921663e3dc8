"""Property-based tests (hypothesis) — SURVEY.md §5.5 invariants:

- KPIs are invariant under input re-chunking (the reference's
  multi-file trigger semantics: how rows are split across files must
  not change results)
- rates bounded, revenue additivity across partitions
- merge upsert: last-writer-wins and key-uniqueness invariants
"""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import schemas
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    enrich,
    kpis,
)

BASE = dt.datetime(2024, 1, 1)

item_strategy = st.tuples(
    st.integers(0, 9),            # order idx
    st.integers(0, 4),            # product idx
    st.integers(0, 2),            # day offset
    st.floats(0.01, 100.0, allow_nan=False),  # price
    st.booleans(),                # returned?
)


def _build(spark, items):
    orders_rows = sorted({(f"o{o}", f"u{o % 3}", "delivered", BASE + dt.timedelta(days=d), None, None, None, 1)
                          for o, _, d, _, _ in items}, key=lambda r: r[0])
    item_rows = [
        (f"i{n}", f"o{o}", f"u{o % 3}", f"p{p}", "delivered", BASE + dt.timedelta(days=d),
         None, None, BASE if ret else None, float(round(price, 2)))
        for n, (o, p, d, price, ret) in enumerate(items)
    ]
    product_rows = [(f"p{p}", f"sku{p}", 1.0, f"cat{p % 2}", f"n{p}", "b", 2.0, "d")
                    for p in range(5)]
    orders = spark.createDataFrame(orders_rows, schema=schemas.ORDERS_SCHEMA)
    oi = spark.createDataFrame(item_rows, schema=schemas.ORDER_ITEMS_SCHEMA)
    products = spark.createDataFrame(product_rows, schema=schemas.PRODUCTS_SCHEMA)
    return orders, oi, products


def _kpis_snapshot(spark, items, n_chunks=1):
    orders, oi, products = _build(spark, items)
    if n_chunks > 1:
        oi = oi.repartition(n_chunks)  # re-chunk the fact input
    enriched = enrich.enrich_orders(orders, oi, products)
    daily = sorted(map(tuple, kpis.order_kpis_daily(enriched).collect()))
    cat = sorted(map(tuple, kpis.category_kpis(enriched).collect()))
    return daily, cat


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(item_strategy, min_size=1, max_size=25))
def test_kpis_invariant_under_rechunking(spark, items):
    """Same rows, different physical chunking → bit-identical KPIs
    (this is exactly why money sums are exact decimals)."""
    one = _kpis_snapshot(spark, items, n_chunks=1)
    many = _kpis_snapshot(spark, items, n_chunks=7)
    assert one == many


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(item_strategy, min_size=1, max_size=25))
def test_kpi_bounds(spark, items):
    orders, oi, products = _build(spark, items)
    enriched = enrich.enrich_orders(orders, oi, products)
    for r in kpis.order_kpis_daily(enriched).collect():
        assert r.total_orders >= 1
        assert r.total_revenue >= 0
        assert 0 <= r.return_rate <= r.total_items_sold / r.total_orders
        assert r.unique_customers <= r.total_orders
    for r in kpis.category_kpis(enriched).collect():
        assert 0.0 <= r.avg_return_rate <= 1.0
        assert r.daily_revenue >= 0


merge_batch = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.floats(0, 100, allow_nan=False)),
    min_size=1, max_size=8,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(merge_batch, min_size=1, max_size=4))
def test_merge_equals_dict_semantics(spark, tmp_path_factory, batches):
    """Sequential keyed merges must equal last-writer-wins dict
    semantics regardless of batch composition. Sources are made
    KEY-UNIQUE first (first row per key) — the r9 contract: merge()
    raises on duplicate-key sources instead of collapsing them, so the
    dict-equivalence property holds over exactly the inputs merge()
    accepts, and values can be checked EXACTLY (no arbitrary-winner
    slack)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        upsert,
    )

    target = str(tmp_path_factory.mktemp("merge_prop") / "t")
    expected = {}
    for batch in batches:
        seen = {}
        for o, p, v in batch:
            seen.setdefault((f"o{o}", f"p{p}"), float(round(v, 2)))
        rows = [(o, p, v) for (o, p), v in seen.items()]
        df = spark.createDataFrame(rows, "order_id string, product_id string, v double")
        upsert.merge(spark, target, df, ["order_id", "product_id"])
        expected.update(seen)
    got = {(r.order_id, r.product_id): r.v
           for r in spark.read.parquet(target).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(merge_batch)
def test_merge_duplicate_key_sources_raise_and_dedupe_converges(
    spark, tmp_path_factory, batch
):
    """The r9 uniqueness contract, property-pinned: ANY source carrying
    a duplicate key makes merge() raise (matched or not — a fresh
    target has no matches, the case real Delta would silently
    double-insert), and the explicit on_duplicate_source='dedupe'
    opt-in converges to a key-unique table over the same source."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        upsert,
    )

    rows = [(f"o{o}", f"p{p}", float(round(v, 2))) for o, p, v in batch]
    rows.append(rows[0])  # force at least one duplicate key
    df = spark.createDataFrame(rows, "order_id string, product_id string, v double")
    target = str(tmp_path_factory.mktemp("merge_dup") / "t")
    with _pytest.raises(ValueError, match="key-unique"):
        upsert.merge(spark, target, df, ["order_id", "product_id"])
    assert not os.path.exists(target)  # the raise preceded any write

    upsert.merge(
        spark, target, df, ["order_id", "product_id"],
        on_duplicate_source="dedupe",
    )
    got = [(r.order_id, r.product_id) for r in spark.read.parquet(target).collect()]
    assert sorted(got) == sorted({(o, p) for o, p, _ in rows})  # key-unique
    # dedupe is idempotent: replaying the same duplicate-key source
    # leaves the key set unchanged
    upsert.merge(
        spark, target, df, ["order_id", "product_id"],
        on_duplicate_source="dedupe",
    )
    assert sorted(
        (r.order_id, r.product_id) for r in spark.read.parquet(target).collect()
    ) == sorted(got)


join_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=0, max_size=20
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(join_rows, join_rows)
def test_asof_join_matches_naive(spark, left_rows, right_rows):
    """asof_join (window-carry) ≡ naive max-prior-row join, on random
    inputs including empty sides and duplicate timestamps."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.asof import (
        asof_join,
    )
    import pyspark.sql.functions as F

    left = spark.createDataFrame(left_rows or [(99, -1)], "k long, ts long")
    right = spark.createDataFrame(
        [(k, t, f"v{k}_{t}") for k, t in right_rows] or [(98, -1, "x")],
        "k long, ts long, v string",
    )
    got = {(r.k, r.ts): r.asof_ts
           for r in asof_join(left, right, "k", "ts", "ts").collect()}
    # naive: for each left row the max right ts <= left ts
    naive = {}
    for k, lt in (left_rows or [(99, -1)]):
        cands = [t for rk, t in right_rows if rk == k and t <= lt]
        naive[(k, lt)] = max(cands) if cands else None
    assert got == naive


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(join_rows, join_rows, st.integers(1, 200))
def test_interval_join_matches_naive(spark, left_rows, right_rows, gap):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        interval_join,
    )

    left = spark.createDataFrame(left_rows or [(99, -1)], "k long, lts long")
    right = spark.createDataFrame(right_rows or [(98, -1)], "k long, rts long")
    got = sorted((r.k, r.lts, r.rts) for r in
                 interval_join(left, right, "k", "lts", "rts", max_gap=gap).collect())
    naive = sorted(
        (k, lt, rt)
        for k, lt in (left_rows or [(99, -1)])
        for rk, rt in (right_rows or [(98, -1)])
        if rk == k and abs(lt - rt) <= gap
    )
    assert got == naive


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 10_000_00), min_size=1, max_size=60))
def test_round_integerization_equals_decimal_cast(spark, cents_list):
    """The round(x*100) fast path must produce the SAME integer minor
    units as the DECIMAL(18,2) cast route for every representable
    2-decimal value (the exactness contract behind _sdsum/q01/q16/
    q38/q39's integer money math)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(c / 100.0,) for c in cents_list], "v double")
    out = df.select(
        F.round(F.col("v") * 100).cast("long").alias("fast"),
        (F.col("v").cast("decimal(18,2)") * 100).cast("long").alias("exact"),
    ).collect()
    assert all(r.fast == r.exact for r in out)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 10_000_00), st.integers(0, 9), st.integers(0, 8)),
    min_size=1, max_size=40,
))
def test_integer_product_equals_decimal_product(spark, rows):
    """cents*(100-du) and cents*(100-du)*(100+tu) must equal the exact
    decimal products price*(1-d)*10^4 / price*(1-d)*(1+t)*10^6 row by
    row (the q01 sum_disc_price / sum_charge identity)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(c / 100.0, d / 100.0, t / 100.0) for c, d, t in rows],
        "price double, disc double, tax double",
    )
    pc = F.round(F.col("price") * 100).cast("long")
    du = F.lit(100) - F.round(F.col("disc") * 100).cast("long")
    tu = F.lit(100) + F.round(F.col("tax") * 100).cast("long")
    price_d = F.col("price").cast("decimal(12,2)")
    disc_d = F.lit(1) - F.col("disc").cast("decimal(4,2)")
    tax_d = F.lit(1) + F.col("tax").cast("decimal(4,2)")
    out = df.select(
        (pc * du).alias("fast4"),
        (price_d * disc_d * 10000).cast("long").alias("exact4"),
        (pc * du * tu).alias("fast6"),
        (price_d * disc_d * tax_d * 1000000).cast("long").alias("exact6"),
    ).collect()
    assert all(r.fast4 == r.exact4 and r.fast6 == r.exact6 for r in out)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-4.0, max_value=4.0, width=32,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=16,
))
def test_quantizer_identity_across_runtimes(spark, vals):
    """floor(x*2^20) must agree between the driver-side Python twin
    (quantize_floats — used for IVF probe selection), the Spark
    expression (quantize_vec), and the DuckDB SQL (quantize_vec_sql):
    q42's oracle match rests on this three-way identity."""
    import duckdb
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    py = similarity.quantize_floats(vals)

    df = spark.createDataFrame(
        [(vals,)], "embedding: array<float>"
    ).select(similarity.quantize_vec(F.col("embedding")).alias("q"))
    via_spark = df.collect()[0]["q"]

    con = duckdb.connect()
    via_duck = con.execute(
        f"SELECT {similarity.quantize_vec_sql('$1::FLOAT[]')} ", [vals]
    ).fetchone()[0]

    # float32 storage first (Spark holds float; Python list is double):
    # quantize the float32-rounded values for the python twin
    import struct
    as_f32 = [struct.unpack("f", struct.pack("f", v))[0] for v in vals]
    py_f32 = similarity.quantize_floats(as_f32)

    assert via_spark == py_f32
    assert list(via_duck) == py_f32
    # and the pure-double twin agrees whenever inputs are exact in f32
    if as_f32 == vals:
        assert py == py_f32


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=120),
    width=st.sampled_from([16, 64, 256]),
)
def test_cms_one_sided_and_merge_invariants(spark, vals, width):
    """CMS properties on arbitrary integer multisets (negatives
    included): estimates are NEVER below true counts for every distinct
    value, and splitting the multiset anywhere then merging the two
    sketches reproduces the single-pass cells exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        sketches,
    )

    truth = Counter(vals)
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    sk = sketches.cms_sketch(df, ["g"], "v", width=width)
    est = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(
            sk, df.distinct(), ["g"], "v", width=width
        ).collect()
    }
    assert all(est[v] >= c for v, c in truth.items())

    cut = len(vals) // 2
    a = spark.createDataFrame([("g", v) for v in vals[:cut]] or [("g", None)],
                              "g string, v long")
    b = spark.createDataFrame([("g", v) for v in vals[cut:]], "g string, v long")
    merged = sketches.cms_merge(
        sketches.cms_sketch(a, ["g"], "v", width=width),
        sketches.cms_sketch(b, ["g"], "v", width=width),
        ["g"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))


# --- r6: codec and curation properties (pure-python, no spark fixture) ------


@given(
    st.lists(st.integers(0, 255), min_size=0, max_size=400),
    st.integers(2, 8),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(indices, ct_bits):
    """GIF LZW: decode(encode(s)) == s for arbitrary index streams and
    code sizes — the encoder lives in the test suite, the decoder in
    the package, so this cross-checks both sides of the width-bump
    handshake for every table-growth trajectory hypothesis finds."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.multimodal import (
        _gif_lzw_decode,
    )

    from test_multimodal import _gif_lzw_encode

    mcs = max(2, ct_bits)
    indices = [i % (1 << mcs) for i in indices]
    enc = _gif_lzw_encode(indices, mcs)
    assert _gif_lzw_decode(enc, mcs, len(indices)) == indices


@given(st.integers(-32768, 32767))
@settings(max_examples=300, deadline=None)
def test_g711_companding_bounds_property(x):
    """decode(encode(x)) stays within one companding segment step of x
    for BOTH laws across the entire int16 domain."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.multimodal import (
        _g711_alaw_lut,
        _g711_ulaw_lut,
    )

    from test_multimodal import _linear_to_alaw, _linear_to_ulaw

    u = int(_g711_ulaw_lut()[_linear_to_ulaw(x)])
    assert abs(u - x) <= max(32, (abs(x) + 132) // 8)
    a = int(_g711_alaw_lut()[_linear_to_alaw(x)])
    assert abs(a - x) <= max(32, abs(x) // 8 + 16)


@given(
    st.lists(st.tuples(st.integers(0, 10**6), st.integers(1, 500)),
             min_size=1, max_size=120, unique_by=lambda t: t[0]),
    st.integers(32, 1024),
    st.integers(1, 8),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_sequences_offsets_property(spark, docs, budget, n_shards):
    """Packing invariants for arbitrary corpora: within every shard the
    exclusive cumulative sum reconstructs exactly from
    (pack_id, pack_offset), and offsets stay inside the budget."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    df = spark.createDataFrame(docs, ["doc_id", "n_tokens"])
    out = curation.pack_sequences(
        df, budget_tokens=budget, n_shards=n_shards
    ).collect()
    assert len(out) == len(docs)
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r.pack_offset < budget
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows = sorted(rows, key=lambda r: (r.pack_id, r.pack_offset))
        cum = 0
        for r in rows:
            assert r.pack_id * budget + r.pack_offset == cum
            cum += r.n_tokens


@given(
    st.sampled_from(
        [
            b"\x89PNG\r\n\x1a\n",
            b"\xff\xd8\xff\xe0",
            b"GIF89a",
            b"BM",
            b"II*\x00",
            b"MM\x00*",
            b"RIFF\x00\x00\x00\x00WAVE",
            b"\x00\x00\x00\x14ftypisom",
            b"P6\n",
        ]
    ),
    st.binary(min_size=0, max_size=300),
)
@settings(max_examples=120, deadline=None)
def test_decoders_fail_closed_on_fuzzed_payloads(magic, junk):
    """Every decoder must FAIL CLOSED on arbitrary bytes behind a valid
    magic: return a decoded array or raise — never hang or corrupt
    state. (The mapInPandas dispatch catches any exception and falls
    back to the stub, so 'raises quickly' is the contract that keeps a
    poisoned corpus from stalling executors.)"""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        multimodal as mm,
    )

    payload = magic + junk
    fmt = mm.sniff_format(payload)
    decoders = {
        "png": mm.decode_png,
        "jpeg": mm.decode_jpeg,
        "gif": mm.decode_gif,
        "bmp": mm.decode_bmp,
        "tiff": mm.decode_tiff,
        "wav": mm.decode_wav,
        "mp4": mm.parse_mp4,
        "netpbm": mm.decode_netpbm,
    }
    if fmt is None:
        return
    try:
        decoders[fmt](payload)
    except Exception:
        pass  # any exception is fine; dispatch quarantines it


_para = st.sampled_from(
    ["alpha one", "beta two", "gamma", "", "delta four five", "beta two "]
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_para, min_size=1, max_size=6),
                min_size=1, max_size=12))
def test_paragraph_dedup_equals_sequential_reference(spark, docs):
    """paragraph_dedup ≡ the sequential global-seen-set algorithm on
    arbitrary corpora from a small paragraph alphabet (heavy reuse,
    empty paragraphs, whitespace-distinct variants stay distinct —
    the dedup key is the RAW paragraph)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rows = [(i, "\n\n".join(ps)) for i, ps in enumerate(docs)]
    got = {
        r.doc_id: (r.text, r.n_paras, r.n_paras_dropped)
        for r in dedup.paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    seen: set = set()
    want = {}
    for i, text in rows:
        paras = text.split("\n\n")
        kept = [p for p in paras if p not in seen and not seen.add(p)]
        want[i] = ("\n\n".join(kept), len(paras), len(paras) - len(kept))
    assert got == want
