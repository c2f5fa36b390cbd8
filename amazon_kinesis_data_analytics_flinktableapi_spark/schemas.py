"""Declared schemas (SURVEY.md §1).

The reference's schemas are POJO classes bound by Jackson reflection
(Order.java:4-9, ExchangeRate.java:5-9, Result.java:3-8).  Here every schema
is an explicit StructType — more robust than reflection, and at 100 TB scale
the declared minimal schema *is* the column-pruning contract: parsing JSON
with exactly these fields prunes everything else at the scan.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# -- reference input/output schemas (FIXTURES.md §1-3) ----------------------

#: Order.java:4-9 — {int id; Timestamp orderTime; int amount; String currency}
ORDER_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("orderTime", TimestampType()),
        StructField("amount", IntegerType()),
        StructField("currency", StringType()),
    ]
)

#: ExchangeRate.java:5-9 — {Timestamp exchangeRateTime; String currency; int rate}
EXCHANGE_RATE_SCHEMA = StructType(
    [
        StructField("exchangeRateTime", TimestampType()),
        StructField("currency", StringType()),
        StructField("rate", IntegerType()),
    ]
)

#: Result.java:3-8 — {int id; String orderTime; int originalAmount; int convertedAmount}
#: convertedAmount stays a 32-bit int (no silent widening): amount*rate is
#: exact int arithmetic per the generator domains (README.md:61-82).
RESULT_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("orderTime", StringType()),
        StructField("originalAmount", IntegerType()),
        StructField("convertedAmount", IntegerType()),
    ]
)

# -- driver TESTDATA schemas (TESTDATA.md) ----------------------------------

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# -- multimodal column convention (driver extension surface) ----------------

#: Opaque binary payload + typed metadata; the decode step is a Pandas UDF
#: over mapInPandas (operators.multimodal).  At scale the payload column is
#: stored/read separately from metadata so metadata-only queries never touch
#: the bytes (parquet column pruning does this for free).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

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
