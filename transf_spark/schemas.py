"""Pinned, explicit schemas for every input table (FIXTURES.md §1).

The reference's schema philosophy is *fixed and positional* — hard-coded
offsets, no inference (`/root/reference/transf_client.cpp:164-168`,
`/root/reference/transf_server.cpp:302-306`).  We mirror it the Spark way:
every ``spark.read`` gets an explicit ``StructType``; ``inferSchema`` is never
used.  Pinning also keeps the parquet scans stable under schema evolution and
lets Catalyst prune columns against a known shape.

``events.ts`` is stored as parquet TIMESTAMP(NANOS) or TIMESTAMP(MICROS)
depending on the fixture generation (the driver has shipped both); with
``spark.sql.legacy.parquet.nanosAsLong=true`` either surfaces as a raw int64
count (column ``ts`` below is LongType at scan). sources/tables.py detects
the unit from the parquet footer and normalizes to a microsecond
TIMESTAMP_NTZ matching the DuckDB oracle's read of the same file.
"""

from __future__ import annotations

from pyspark.sql import types as T

TABLE_NAMES = [
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

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

# At-scan schema (ts = raw int64 count via nanosAsLong — unit detected from
# the footer); canonical post-load shape replaces ts with TIMESTAMP_NTZ micros.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# Derived protocol-fixture schemas (FIXTURES.md §2) ------------------------

CHUNKS = T.StructType(
    [
        T.StructField("transfer_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("payload_len", T.IntegerType()),
    ]
)

HANDSHAKES = T.StructType(
    [
        T.StructField("transfer_id", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("filesize", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)
