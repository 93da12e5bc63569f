"""Loader for the driver-generated testdata tables (TESTDATA.md).

Ten parquet tables per scale factor: the TPC-H-ish star schema
(region nation customer supplier part orders lineitem) plus ``events``
(stream-shaped), ``documents`` (text corpus), ``embeddings``
(array<float> vectors).

Scale notes: at 100 TB these would be partitioned/bucketed tables in a
catalog, not loose files — but the access pattern is identical:
``spark.read.parquet`` gives a vectorized columnar scan with predicate
pushdown and column pruning, and every query builder in ``plans/`` is
written against the DataFrame, never against a materialized collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cve_manager_spark.session import tune

TABLES = (
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
)

# Dimension tables small enough to broadcast at any realistic scale
# (region=5 rows, nation=25 rows; cwe in the CVE schema is ~1k rows).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Applies engine session confs first so
    timestamp semantics are deterministic (UTC) regardless of caller.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it as raw nanos
    (legacy.parquet.nanosAsLong) and convert with integer division — a
    double division would lose precision at 1.7e18 ns — truncating to
    microseconds exactly like DuckDB/Arrow do. Emitted as TIMESTAMP_NTZ
    under the UTC session so semantics don't depend on cluster timezone.
    """
    tune(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F

    for field, dtype in df.dtypes:
        if name == "events" and field == "ts" and dtype == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables present under ``sf_dir``.

    Routes through :func:`load_table` per table so views registered from
    this dict get the SAME events.ts NANOS→micros normalization as the
    DataFrame path — a raw read would expose bigint ts to spark.sql
    queries on NANOS-generation parquet and silently diverge from the
    DuckDB oracle (ADVICE r4)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql query surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
