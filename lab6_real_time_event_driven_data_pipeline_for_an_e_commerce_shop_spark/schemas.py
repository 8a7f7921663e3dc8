"""Single source of truth for every schema the engine touches.

The reference duplicates its column lists in two modules
(reference glue_job.py:24-28 ≡ validate.py:31-35) — a drift hazard this
module eliminates. Types follow reference README.md:64-67; nullability
follows validate.py:43-47 + 218-222.

Two families:

1. **E-commerce data model** (orders / order_items / products) — the
   reference's own schema, used by the streaming pipeline and the
   e-commerce fixtures in unit tests.
2. **Testdata star schema** (/root/testdata, TESTDATA.md) — the
   TPC-H-ish tables the driver's correctness oracle runs on, plus the
   column mapping between the two worlds (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. E-commerce data model (reference README.md:64-67)
# ---------------------------------------------------------------------------

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("user_id", T.StringType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("created_at", T.TimestampType(), nullable=False),
        T.StructField("returned_at", T.TimestampType(), nullable=True),
        T.StructField("shipped_at", T.TimestampType(), nullable=True),
        T.StructField("delivered_at", T.TimestampType(), nullable=True),
        T.StructField("num_of_item", T.IntegerType(), nullable=True),
    ]
)

ORDER_ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("user_id", T.StringType(), nullable=False),
        T.StructField("product_id", T.StringType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("created_at", T.TimestampType(), nullable=False),
        T.StructField("shipped_at", T.TimestampType(), nullable=True),
        T.StructField("delivered_at", T.TimestampType(), nullable=True),
        T.StructField("returned_at", T.TimestampType(), nullable=True),
        T.StructField("sale_price", T.DoubleType(), nullable=True),
    ]
)

PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("sku", T.StringType(), nullable=False),
        T.StructField("cost", T.DoubleType(), nullable=True),
        T.StructField("category", T.StringType(), nullable=True),
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("brand", T.StringType(), nullable=False),
        T.StructField("retail_price", T.DoubleType(), nullable=True),
        T.StructField("department", T.StringType(), nullable=True),
    ]
)

ECOMMERCE_SCHEMAS: dict[str, T.StructType] = {
    "orders": ORDERS_SCHEMA,
    "order_items": ORDER_ITEMS_SCHEMA,
    "products": PRODUCTS_SCHEMA,
}

# Key / constraint metadata (reference validate.py:37-47, 226-243).
UNIQUE_KEYS: dict[str, list[str]] = {
    # NOTE the reference checks the order_items composite PK per-column
    # (validate.py:223-224) — a deliberate quirk we preserve (SURVEY.md §2.3 U2).
    "orders": ["order_id"],
    "order_items": ["order_id", "product_id"],
    "products": ["id"],
}

REQUIRED_COLUMNS: dict[str, list[str]] = {
    "orders": ["order_id", "user_id", "status", "created_at"],
    "order_items": ["id", "order_id", "user_id", "product_id", "status"],
    "products": ["id", "sku", "name", "brand"],
}

VALID_ORDER_STATUSES = [
    "pending",
    "processing",
    "shipped",
    "delivered",
    "cancelled",
    "returned",
]

NON_NEGATIVE_COLUMNS: dict[str, list[str]] = {
    "order_items": ["sale_price"],
    "products": ["cost", "retail_price"],
}

INTEGER_COLUMNS: dict[str, list[str]] = {"orders": ["num_of_item"]}

# Upsert key for the enriched Delta-style table (reference transform.py:335).
ENRICHED_MERGE_KEYS = ["order_id", "product_id"]
ENRICHED_PARTITION_COLUMN = "order_date"

# ---------------------------------------------------------------------------
# 2. Driver testdata star schema (TESTDATA.md) + mapping (FIXTURES.md §4)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# reference table -> (testdata table, column mapping reference->testdata)
TESTDATA_MAPPING = {
    "orders": ("orders", {"order_id": "o_orderkey", "user_id": "o_custkey",
                          "status": "o_orderstatus", "created_at": "o_orderdate"}),
    "order_items": ("lineitem", {"order_id": "l_orderkey", "product_id": "l_partkey",
                                 "sale_price": "l_extendedprice",
                                 # returned_at IS NOT NULL <=> l_returnflag = 'R'
                                 "returned_flag": "l_returnflag"}),
    "products": ("part", {"id": "p_partkey", "category": "p_type",
                          "retail_price": "p_retailprice", "brand": "p_brand",
                          "name": "p_name"}),
}
