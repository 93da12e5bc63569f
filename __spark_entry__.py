"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cve_manager_spark``; this file is the thin
driver-facing adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cve_manager_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's flagship question is "vulnerable products above a score
    since a date" (cve_manager.py:492): a view join + LIKE + OR-threshold +
    date bound. Transposed to the testdata star schema: lineitem ⋈ orders
    with a LIKE filter on priority, an OR score threshold, and a date bound
    — scan → filter → join → project, the spine of the engine.
    """
    from pyspark.sql import functions as F

    from cve_manager_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("o_orderpriority").like("%1-URGENT%")
            & ((F.col("l_extendedprice") >= 1000) | (F.col("o_totalprice") >= 10000))
            & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "l_linenumber", "o_orderdate", "o_totalprice", "l_extendedprice")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each hash-checkable query."""
    return registry.oracle_sql()
