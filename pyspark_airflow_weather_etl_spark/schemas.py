"""Explicit StructType contracts for every layer and fixture table.

The reference relies on full schema inference (`spark.read.json` with
no schema — /root/reference/spark_jobs/silver_openmeteo.py:24), which
is a full-data pass at 100 TB. Every scan in this engine declares its
schema up front (SURVEY.md §1.3).

Partition keys are canonically *int* end-to-end, fixing the
string-vs-int inconsistency between the reference's silver writer
(string lits — silver_openmeteo.py:54-56) and its JDBC loader
(int lits — load_gold_to_pg.py:26-28).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------
# Weather medallion layers (reference semantics)
# --------------------------------------------------------------------

#: Bronze: one Open-Meteo JSON document per day — a struct of four
#: parallel arrays (columnar-in-JSON hourly time-series). Shape per
#: /root/reference/spark_jobs/silver_openmeteo.py:26-32 and the API
#: call in dags/weather_daily_etl.py:27-30.
BRONZE_WEATHER = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("timezone", T.StringType()),
        T.StructField(
            "hourly",
            T.StructType(
                [
                    T.StructField("time", T.ArrayType(T.StringType())),
                    T.StructField("temperature_2m", T.ArrayType(T.DoubleType())),
                    T.StructField("relative_humidity_2m", T.ArrayType(T.DoubleType())),
                    T.StructField("precipitation", T.ArrayType(T.DoubleType())),
                ]
            ),
        ),
    ]
)

#: Silver: flat hourly fact (output contract of silver_openmeteo.py:38-56,
#: with int partition keys).
SILVER_WEATHER = T.StructType(
    [
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("tz", T.StringType()),
        T.StructField("temperature_c", T.DoubleType()),
        T.StructField("humidity_pct", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("m", T.IntegerType()),
        T.StructField("d", T.IntegerType()),
    ]
)

#: Gold: daily rollup (output contract of gold_openmeteo.py:20-28).
GOLD_WEATHER = T.StructType(
    [
        T.StructField("min_temp_c", T.DoubleType()),
        T.StructField("max_temp_c", T.DoubleType()),
        T.StructField("avg_temp_c", T.DoubleType()),
        T.StructField("precip_mm_sum", T.DoubleType()),
        T.StructField("avg_humidity_pct", T.DoubleType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("m", T.IntegerType()),
        T.StructField("d", T.IntegerType()),
    ]
)

# --------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/ — FIXTURES.md §B)
# --------------------------------------------------------------------

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
        T.StructField("o_orderdate", T.TimestampType()),
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
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

#: Raw-read schema for fixtures written as parquet TIMESTAMP(NANOS):
#: Spark reads nanos only as a long (``spark.sql.legacy.parquet.nanosAsLong``),
#: and sources.tables rebuilds a proper timestamp in the plan. Used ONLY
#: when the footer probe (sources.tables._events_ts_physical_type) says
#: the physical column is integral nanos.
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

#: Logical schema for events fixtures written as parquet timestamp[us]
#: (or any physical encoding Spark reads natively as TimestampType).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
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

#: Read-schemas per fixture table name (``events`` uses the raw
#: nanos-long contract; the loader normalizes it).
FIXTURES: dict[str, T.StructType] = {
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

# --------------------------------------------------------------------
# Multimodal asset contract (north-star: binary payload + typed
# metadata; FIXTURES have no binary column so tests synthesize it)
# --------------------------------------------------------------------

MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)
