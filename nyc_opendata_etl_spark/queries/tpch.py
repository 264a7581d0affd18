"""TPC-H-shaped star queries completing the classic suite (q1/q3/q5/q18
live in queries/relational.py).

The driver's testdata is a trimmed TPC-H schema — no ``partsupp`` table
and no ``l_commitdate``/``l_receiptdate``/``l_shipmode``/``p_container``/
``c_phone`` columns — so queries whose predicates need those columns are
adapted to equivalent shapes over the available ones (noted per query).
Q2/Q9/Q11/Q16/Q20 need ``partsupp`` and are omitted entirely.

Plan-shape goals (verified in tests/test_plans.py):
- dimension sides (region/nation, brand-filtered part, HAVING-qualified
  key sets) broadcast; only fact⨝fact joins shuffle,
- every date/brand/segment filter reaches the parquet scan,
- correlated scalar subqueries (Q17) and EXISTS (Q4/Q21/Q22) lower to
  aggregates + semi/anti hash joins, never nested loops.

Money math follows the repo convention: DECIMAL(12,2) products, exact
decimal sums, one final round+DOUBLE cast aliased identically on both
engines (see queries/_sql.money_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.queries import register
from nyc_opendata_etl_spark.sources.tables import load_table

_REVENUE_DEC = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"
)


def _money(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _revenue() -> F.Column:
    return _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders with a late line.

    Adapted: the schema has no l_commitdate/l_receiptdate, so "line
    received later than committed" becomes "line shipped >60 days after
    the order date". The EXISTS lowers to a LEFT SEMI hash join on
    l_orderkey with the lateness predicate as a join residual — one
    shuffle, no correlated re-scan per order."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        orders.join(li, (F.col("o_orderkey") == li["l_orderkey"]) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filtered scan + global sum. All three
    predicates push into the parquet scan (min/max row-group skipping at
    scale); the aggregate is a partial+final pair with no wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_money("l_extendedprice") * _money("l_discount")), 2)
        .cast("double")
        .alias("revenue")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 {_REVENUE_DEC} AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey
            AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    nation⨝supplier and nation⨝customer are broadcast chains (nation is
    25 rows at any scale); the symmetric nation-pair disjunction is a
    post-join residual on two already-filtered tiny sides; only
    lineitem⨝orders shuffles."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                      / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 {_REVENUE_DEC} AS volume, n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1,
               nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND p_type = 'PROMO') all_nations
    GROUP BY o_year
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: a nation's share of regional PROMO-part revenue by year.
    8-way join where every non-fact side either broadcasts outright
    (region, nation) or broadcasts after a selective filter (PROMO part
    ≈ 1/6 of parts); the conditional share is one exact-decimal CASE sum
    divided by the total, both from the same aggregate — a single pass."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("volume")
    zero = F.lit(0).cast("decimal(12,2)")
    nation_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(zero)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _revenue().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double"), 6
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(round(sum({_REVENUE_DEC}), 2) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-line revenue in a quarter.
    (c_address/c_phone/c_comment don't exist in this schema and are
    dropped from the output.) The return-flag and quarter filters reach
    the scans; the limit plans as TakeOrderedAndProject, so only 20 rows
    per partition survive the final exchange. c_custkey tiebreak makes
    the LIMIT deterministic across engines."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q12_latency_priority",
    oracle="""
    SELECT delay_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (SELECT o_orderpriority,
                 CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                      THEN 'FAST'
                      WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY
                      THEN 'NORMAL'
                      ELSE 'SLOW' END AS delay_bucket
          FROM orders, lineitem
          WHERE o_orderkey = l_orderkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01') lines
    GROUP BY delay_bucket
    """,
)
def q_q12_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts per shipping class.
    Adapted: no l_shipmode column, so the grouping key is a derived
    ship-latency bucket (days from order to ship) instead of the ship
    mode — same join + CASE-sum pivot structure."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    bucket = (
        F.when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "FAST",
        )
        .when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "NORMAL",
        )
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("o_orderpriority", bucket.alias("delay_bucket"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey
           AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, including
    zero-order customers via the outer join. Adapted: the reference's
    o_comment NOT LIKE filter becomes an order-priority exclusion (no
    comment column). The two-level aggregate keeps the first group-by on
    the join key, so AQE can coalesce the second (tiny) exchange."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                            THEN {_REVENUE_DEC}
                                            ELSE CAST(0 AS DECIMAL(12,2)) END)
                               AS DOUBLE)
                      / CAST(sum({_REVENUE_DEC}) AS DOUBLE), 6) AS DOUBLE)
               AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.
    part joins broadcast (bounded dimension); numerator and denominator
    come from one aggregate pass as exact decimal sums, converted to
    DOUBLE only for the final ratio — multiplication before division
    mirrors the oracle's evaluation order for bit-equality."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(zero)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(_revenue()).cast("double"),
                6,
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum({_REVENUE_DEC}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    scalar-max subquery becomes a 1-row broadcast joined back against
    the same aggregated relation — the revenue "view" is computed once
    and reused on both sides (Spark reuses the exchange), never
    re-scanning lineitem. Exact decimal sums make the max/equality
    comparison engine-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
        )
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.
    (No p_container column; the brand filter alone scopes the parts.)
    The correlated per-part average lowers to one aggregate over the
    brand's lineitems joined back by partkey — a broadcast of the tiny
    per-part-threshold relation, not a re-scan per row. Quantities are
    small integers, so the double average is exact in both engines."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == part["p_partkey"], "left_semi"
    )
    thresholds = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    t = F.broadcast(thresholds).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(t, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("raw")
        )
        .select(F.round(F.col("raw"), 2).cast("double").alias("avg_yearly"))
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(round(sum({_REVENUE_DEC}), 2) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicate revenue.
    Adapted: no p_container/l_shipmode legs (columns absent). The OR of
    three conjunctions stays one equi-join on partkey with the
    disjunction as a residual — Catalyst additionally derives the
    implied p_brand IN (...) filter pushed to the part scan, so the
    broadcast side is three brands, not all parts."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    legs = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(legs)
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
        FROM lineitem JOIN orders
          ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey),
    windowed AS (
        SELECT l_orderkey, l_suppkey, supp_last,
               count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
               max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
        FROM per_supp),
    ranked AS (
        SELECT l_suppkey, supp_last, n_supp, order_last,
               sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS n_at_last
        FROM windowed)
    SELECT s_name, count(*) AS numwait
    FROM ranked JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp >= 2 AND supp_last = order_last AND n_at_last = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who uniquely held up multi-supplier
    orders. Adapted: no l_commitdate/l_receiptdate, so "failed to meet
    commit date while others did" becomes "uniquely last to ship on an
    'F' order with ≥2 suppliers" — the same EXISTS/NOT-EXISTS structure,
    lowered to one aggregate + windowed qualification instead of two
    correlated semi/anti joins (one shuffle fewer, same semantics)."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_supp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    windowed = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        F.count("*").over(w).alias("n_supp"),
        F.max("supp_last").over(w).alias("order_last"),
    )
    at_last = F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
    ranked = windowed.select(
        "l_suppkey",
        "supp_last",
        "n_supp",
        "order_last",
        F.sum(at_last).over(w).alias("n_at_last"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ranked.filter(
            (F.col("n_supp") >= 2)
            & (F.col("supp_last") == F.col("order_last"))
            & (F.col("n_at_last") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q22_global_sales",
    oracle="""
    SELECT cntrycode, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM (SELECT CAST(c_custkey % 7 AS BIGINT) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (
                    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                AS DOUBLE) / count(*)
                    FROM customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '1999-01-01')
         ) custsale
    GROUP BY cntrycode
    """,
)
def q_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: dormant above-average-balance customers by country
    code. Adapted: no c_phone column, so the country code is derived
    from the customer key (mod 7) instead of the phone prefix, and
    "never ordered" becomes "no order since 1999" (every customer has
    lifetime orders at this data density). The scalar above-average
    subquery broadcasts a 1-row threshold; the NOT EXISTS lowers to a
    LEFT ANTI hash join against date-filtered orders. The average routes
    through an exact decimal sum so the threshold double is
    bit-identical across engines."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == orders["o_custkey"], "left_anti")
        .select(
            (F.col("c_custkey") % 7).cast("long").alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )
