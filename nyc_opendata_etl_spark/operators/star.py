"""Flagship star-schema pipeline over the benchmark tables.

Re-expresses the reference's end-to-end dataflow (scan → normalize →
distinct dim + hash surrogate key → broadcast left join stamping the key
onto the fact → project/aggregate; ``main.py:71-183``) against the
driver's TPC-H-ish tables.

Plan shape (verified via .explain): customer scan prunes to the
natural-key column, one hash-aggregate builds the dim, the fact side
streams through TWO broadcast hash joins (customer attach + dim stamp)
inside a single stage, then one shuffle for the final group-by. At 100 TB
only the fact scan is large; everything broadcast is KB-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.functions.datetime_fns import date_key
from nyc_opendata_etl_spark.functions.normalize import normalize_strings
from nyc_opendata_etl_spark.operators.dims import build_dim
from nyc_opendata_etl_spark.operators.keys import assign_keys
from nyc_opendata_etl_spark.sources.tables import load_table


def star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup by market-segment surrogate key and order year.

    Exercises, in one query: scan (S1), normalize (N1), distinct dim +
    md5 surrogate (A1+H1), broadcast left key-stamp join (J1), date key
    derivation (D2), group-by aggregation, decimal-exact money math.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread_input=True)

    dim_segment = build_dim(customer, ["c_mktsegment"], "segment_key")

    # no broadcast hint: customer scales with SF (it's a TPC-H-style
    # dimension that grows with the fact tables). Catalyst broadcasts it
    # from size stats while it's small; at 100 TB this correctly becomes
    # a shuffle join.
    fact = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == customer["c_custkey"],
        "left",
    ).drop("c_custkey")
    fact = normalize_strings(fact, ["c_mktsegment"])
    fact = assign_keys(fact, dim_segment, ["c_mktsegment"], "segment_key")

    return (
        fact.withColumn("date_key", date_key("o_orderdate"))
        .groupBy("segment_key", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("num_orders"),
            F.min("date_key").alias("first_date_key"),
            F.max("date_key").alias("last_date_key"),
        )
    )
