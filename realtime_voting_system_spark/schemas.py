"""Explicit schemas — the engine never infers (SURVEY.md §1.2).

Two families:
- VOTING_*: the reference's star schema, from the Postgres DDL
  (reference/src/setup_database.py:65-106). ``dob`` stays STRING because the
  reference declares it VARCHAR(225) (setup_database.py:69 — a quirk we
  preserve at the schema level; ``to_date`` casting is a query-side choice).
- TESTDATA_*: the driver's TPC-H-ish tables under /root/testdata (TESTDATA.md,
  FIXTURES.md §B) that the driver-facing queries run on.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- voting star schema (reference/src/setup_database.py:65-106) -----------

CANDIDATE = _struct(
    ("candidate_id", StringType()),
    ("first_name", StringType()),
    ("last_name", StringType()),
    ("dob", StringType()),
    ("age", IntegerType()),
    ("gender", StringType()),
    ("party", StringType()),
    ("biography", StringType()),
    ("img_url", StringType()),
)

VOTER = _struct(
    ("voter_id", StringType()),
    ("first_name", StringType()),
    ("last_name", StringType()),
    ("dob", StringType()),
    ("age", IntegerType()),
    ("gender", StringType()),
    ("nationality", StringType()),
    ("registration_number", StringType()),
    ("address_street", StringType()),
    ("address_city", StringType()),
    ("address_state", StringType()),
    ("address_country", StringType()),
    ("address_postcode", StringType()),
    ("email", StringType()),
    ("phone", StringType()),
)

VOTE = _struct(
    ("vote_id", StringType()),
    ("voter_id", StringType()),
    ("candidate_id", StringType()),
    ("voted_at", TimestampType()),
    ("vote", IntegerType()),  # always 1: data_generator.py:196
)

# Kafka votes_topic envelope adds denormalized names (data_generator.py:188-197)
VOTE_EVENT = _struct(
    ("vote_id", StringType()),
    ("voter_id", StringType()),
    ("candidate_id", StringType()),
    ("voted_at", TimestampType()),
    ("vote", IntegerType()),
    ("voter_name", StringType()),
    ("candidate_name", StringType()),
    ("party", StringType()),
    ("address_state", StringType()),
)

VOTING_SCHEMAS = {"candidate": CANDIDATE, "voter": VOTER, "vote": VOTE}

# --- driver testdata (TESTDATA.md / FIXTURES.md §B) ------------------------

REGION = _struct(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _struct(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _struct(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _struct(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _struct(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _struct(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _struct(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _struct(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _struct(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _struct(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TESTDATA_SCHEMAS = {
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

# Tables small enough to always broadcast in joins at any scale factor: these
# are bounded dimensions (5 regions / 25 nations / brands...), the analog of
# the reference's 3-candidate dimension (data_generator.py:48) and the B-tree
# index strategy (setup_database.py:109-115 → broadcast instead of index).
BROADCAST_DIMS = {"region", "nation", "supplier"}
