"""Catalog / DDL operators (SURVEY §2.9, cve_manager.py:95-168,362-384).

The reference manages a PostgreSQL database (CREATE/DROP DATABASE, CREATE
TABLE ×4 + VIEW, TRUNCATE-keep-cwe). Here the catalog is Spark's session
catalog over parquet-backed tables; the view is a real catalog view, so
``spark.sql`` queries hit it exactly like Postgres queries hit
``cvss_vs_cpes``.

At scale these would be external tables in a shared metastore partitioned
by year (published_date), which makes the yearly-refresh model an
idempotent partition overwrite instead of the reference's all-or-nothing
TRUNCATE + reload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cve_manager_spark import schemas

TABLES = {
    "cvss": schemas.CVSS,
    "cpe": schemas.CPE,
    "cve_problem": schemas.CVE_PROBLEM,
    "cwe": schemas.CWE,
}

# π/σ of the view, cve_manager.py:79-90.
VIEW_SQL = """
CREATE OR REPLACE VIEW {db}.cvss_vs_cpes AS
SELECT cvss.cve, cvss.base_score_3, cvss.base_severity_3, cvss.base_score,
       cvss.severity, cpe.cpe23uri, cvss.description, cvss.published_date
FROM {db}.cpe cpe JOIN {db}.cvss cvss ON cpe.cve = cvss.cve
WHERE cpe.vulnerable = 'True'
"""


def create_database(spark: SparkSession, name: str = "cve") -> None:
    """D1 (cve_manager.py:95-121); ownership is n/a in a session catalog."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_database(spark: SparkSession, name: str = "cve") -> None:
    """D2 (cve_manager.py:124-144)."""
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def create_tables(spark: SparkSession, db: str = "cve") -> None:
    """D3: the four relations as parquet tables + the join view
    (cve_manager.py:147-168 executing the :22-91 DDL)."""
    create_database(spark, db)
    for name, schema in TABLES.items():
        spark.catalog.createTable(f"{db}.{name}", schema=schema, source="parquet")
    spark.sql(VIEW_SQL.format(db=db))


def truncate_cve_tables(spark: SparkSession, db: str = "cve") -> None:
    """D4: clear cpe, cve_problem, cvss but KEEP cwe (cve_manager.py:376 —
    the CWE catalog changes on MITRE's cadence, not NVD's)."""
    for name in ("cpe", "cve_problem", "cvss"):
        spark.sql(f"TRUNCATE TABLE {db}.{name}")


def load_tables(
    spark: SparkSession, relations: dict[str, DataFrame], db: str = "cve", mode: str = "append"
) -> None:
    """Write flattened relations into the catalog tables (the engine's
    native equivalent of the COPY bulk load, cve_manager.py:321-360)."""
    for name, df in relations.items():
        df.write.mode(mode).insertInto(f"{db}.{name}")
