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


# (path, mtime_ns, size) -> parquet schema. Resolving a bare
# ``spark.read.parquet(path)`` re-reads the footer and infers the schema on
# the DRIVER every call (~85-105 ms measured, optimization guide §5/§6);
# with a pinned schema the same call is ~12 ms. A metastore-backed engine
# resolves schemas from catalog metadata exactly once — this cache is that
# behaviour for the loose-file testdata layout. Keyed on the file's
# (mtime, size) so a rewritten fixture (tests regenerate tables under tmp
# dirs) never serves a stale schema; DATA is still listed and scanned
# fresh at every action — only the schema (metadata) is reused.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}

# (session target id, path, mtime_ns, size) -> built DataFrame. DataFrames
# are immutable plan handles — reusing one across queries is exactly what a
# catalog's resolved relation is; every action still lists and scans the
# files fresh. Keyed on the session so a stopped session's dead handle is
# never served to a new one, and on the file stat so a rewritten fixture
# rebuilds. This removes the remaining ~30 ms/call of DataFrameReader +
# withColumn py4j chatter from every query build.
_DF_CACHE: dict[tuple[str, str, int, int], DataFrame] = {}


def _pinned_schema(spark: SparkSession, path: str):
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return None  # directory-style or remote path: fall back per call
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        cached = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = cached
    return cached


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
    path = table_path(sf_dir, name)
    try:
        sess_key = spark._jsparkSession._target_id
        st = os.stat(path)
        df_key = (sess_key, path, st.st_mtime_ns, st.st_size)
    except Exception:
        df_key = None
    if df_key is not None:
        cached = _DF_CACHE.get(df_key)
        if cached is not None:
            return cached
    schema = _pinned_schema(spark, path)
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for field, dtype in df.dtypes:
        if name == "events" and field == "ts" and dtype == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
    if df_key is not None:
        _DF_CACHE[df_key] = df
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
