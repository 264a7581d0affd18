"""Bucketed-table co-located joins: the bucketed join must plan with no
shuffle exchange on either side; the unbucketed twin shuffles both.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from nyc_opendata_etl_spark.plans import inspect as pi
from nyc_opendata_etl_spark.sources.bucketed import read_table, write_bucketed
from nyc_opendata_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(
        load_table(spark, SF, "orders"), t_orders, "o_orderkey", num_buckets=4
    )
    write_bucketed(
        load_table(spark, SF, "lineitem"), t_lineitem, "l_orderkey", num_buckets=4
    )
    yield t_orders, t_lineitem
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    # the merge hint models both sides being fact-sized (too big to
    # broadcast) — the regime bucketing exists for; at sf0.001 the
    # planner would otherwise just broadcast the small side.
    t_orders, t_lineitem = bucketed_pair
    o = read_table(spark, t_orders).hint("merge")
    li = read_table(spark, t_lineitem)
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # both sides pre-hashed by the join key -> no exchange anywhere
    assert pi.uses_sort_merge_join(joined)
    assert pi.shuffle_count(joined) == 0
    assert joined.count() > 0

    # the unbucketed twin shuffles both sides
    o2 = load_table(spark, SF, "orders").hint("merge")
    li2 = load_table(spark, SF, "lineitem")
    plain = li2.join(o2, li2["l_orderkey"] == o2["o_orderkey"]).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    assert pi.shuffle_count(plain) >= 2


def test_bucketed_results_match_plain(spark, bucketed_pair):
    t_orders, t_lineitem = bucketed_pair
    bucketed = (
        read_table(spark, t_lineitem)
        .join(
            read_table(spark, t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
