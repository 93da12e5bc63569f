"""Local replica of the driver's DuckDB differential gate.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column-name set, and an
order-insensitive multiset of normalized values — the same contract as
CORRECTNESS_r{N}.json, so a query that passes here should pass the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb

from cve_manager_spark.sources.testdata import TABLES, table_path

__test__ = False  # not a pytest module


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _norm(v):
    """Normalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(row[i]) for i in order) for row in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    ms_spark = _multiset(spark_rows, spark_cols)
    ms_duck = _multiset(duck_rows, duck_cols)
    if ms_spark != ms_duck:
        only_spark = list((ms_spark - ms_duck).items())[:3]
        only_duck = list((ms_duck - ms_spark).items())[:3]
        problems.append(f"values differ; spark-only={only_spark} duck-only={only_duck}")
    return problems
