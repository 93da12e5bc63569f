"""Bucketed co-located joins: the pre-shuffle that removes the shuffle.

The scale claim in maintenance.write_bucketed is load-bearing — a
fact⋈fact join on two tables bucketed by the join key with the same
bucket count must plan with ZERO shuffle exchanges, and with bucket-
sorted files the merge join needs no Sort either. These tests write
orders and lineitem bucketed by orderkey into a throwaway database and
assert both the plan shape and result equality against the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cve_manager_spark.maintenance import write_bucketed
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    db = "bucketed_test"
    loc = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, f"{db}.orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(li, f"{db}.lineitem_b", "l_orderkey", n_buckets=8)
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _join(spark, db):
    o = spark.table(f"{db}.orders_b")
    l = spark.table(f"{db}.lineitem_b")
    return o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed_db):
    """Same bucket count on both sides → the join consumes the on-disk
    hash distribution; no Exchange anywhere in the plan (the aggregate
    on the join key's functional sibling still exchanges — group on the
    bucket column itself to see a fully exchange-free plan, which is
    what the second assertion does)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(f"{bucketed_db}.orders_b")
        l = spark.table(f"{bucketed_db}.lineitem_b")
        j = o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).select(
            "o_orderkey", "l_quantity"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # bucket-sorted files: the SortMergeJoin reads pre-sorted buckets
        per_key = (
            o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        )
        plan2 = per_key._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_db):
    got = {r["o_orderpriority"]: (r["n_lines"], r["sum_qty"]) for r in _join(spark, bucketed_db).collect()}
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    want = {
        r["o_orderpriority"]: (r["n_lines"], r["sum_qty"])
        for r in orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .collect()
    }
    assert got == want
