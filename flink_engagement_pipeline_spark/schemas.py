"""Explicit StructType schemas for every input table.

The reference declares every schema with DDL and never infers
(reference sql/init.sql:2-21, src/ingest.py:9-32, src/process.py:122-160);
we keep that discipline: every read goes through these StructTypes.

Tables are the driver-provided fixtures (TESTDATA.md): a TPC-H-ish star
schema plus an ``events`` stream table standing in for the reference's
``engagement_events`` (reference sql/init.sql:12-21), ``customer``
standing in for the ``content`` dimension (reference sql/init.sql:2-9),
and ``documents`` / ``embeddings`` for the training-data operators.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# stream / engagement tables
# ---------------------------------------------------------------------------

# Stand-in for the reference fact stream `engagement_events`
# (reference sql/init.sql:12-21): event_id<->id, ts<->event_ts,
# user_id<->user_id, event_type<->event_type, value<->duration_ms,
# props<->raw_payload (opaque JSON string, reference src/datagen.py:59).
#
# The fixture parquet's `ts` unit has varied across driver rounds:
# TIMESTAMP(NANOS) (which Spark 4.x rejects both under an imposed
# TimestampType schema and under schema inference) and
# TIMESTAMP(MICROS). The read path (sources/tables.py) detects the
# unit from the parquet footer; for nanos files it reads `ts` as a raw
# nanosecond LongType (EVENTS_RAW, with
# spark.sql.legacy.parquet.nanosAsLong=true) and converts to
# TimestampType microseconds with integer division
# (timestamp_micros(ts DIV 1000) — float division loses 1 µs on ~12%
# of rows); micros files read directly as TimestampType.
# EVENTS below is the *logical* schema every query sees.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# Physical read schema for the events parquet (ts as raw ns since epoch).
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# TPC-H-ish star schema
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

# Dimension table for the enrichment lookup join (plays the role of the
# reference's `content` dim, reference sql/init.sql:2-9; 50 rows there,
# 150*sf rows here — always broadcastable).
CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# training-data pipeline tables
# ---------------------------------------------------------------------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
