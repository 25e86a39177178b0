"""Explicit schemas for every table the engine knows (schema-on-write).

The reference declares fixed schemas via CQL DDL before any insert
(``server.py:178-186``, ``server.py:296-304``) — no inference, no dynamic
columns. We mirror that: explicit ``StructType`` per table, enforced at
write time (SURVEY.md §1.3). CQL→Spark type mapping per SURVEY.md §1.2:
bigint→Long, text→String, uuid→String(36), timeuuid→(TimestampType ts +
String uuid) pair because Spark's ``uuid()`` is v4/random, not
time-ordered (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference-parity tables (server.py DDL) -------------------------------

# messages (server.py:178-186): PRIMARY KEY (channel_id, message_id)
# WITH CLUSTERING ORDER BY (message_id DESC). The timeuuid clustering
# column is modelled as (message_ts, message_id); ordering is defined on
# (message_ts DESC, message_id) which preserves newest-first semantics.
MESSAGES = StructType(
    [
        StructField("channel_id", LongType(), False),   # partition key
        StructField("message_ts", TimestampType(), False),  # time part of timeuuid
        StructField("message_id", StringType(), False),  # clustering key (uuid)
        StructField("author_id", StringType(), True),
        StructField("message", StringType(), True),
    ]
)

# users (server.py:296-304): PRIMARY KEY (username) — single-row partitions.
USERS = StructType(
    [
        StructField("username", StringType(), False),   # sole partition key
        StructField("user_id", StringType(), True),
        StructField("email", StringType(), True),
        StructField("password", StringType(), True),
    ]
)

# Key metadata the catalog tracks per table: (partition_key_cols,
# clustering_cols, clustering_desc). This is what Cassandra's DDL encodes
# and what our writer enforces physically.
TABLE_KEYS = {
    "messages": (["channel_id"], ["message_ts", "message_id"], True),
    "users": (["username"], [], False),
}

# --- Driver analytical tables (FIXTURES.md §2) ------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal extension (SURVEY/task north star): opaque binary payload +
# typed metadata. The decode path is a stubbed Pandas UDF (no image/audio
# libs in this container) but schema/partitioning/batching are real.
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
