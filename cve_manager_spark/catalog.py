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


def create_tables(
    spark: SparkSession, db: str = "cve", partition_cvss_by_year: bool = False
) -> None:
    """D3: the four relations as parquet tables + the join view
    (cve_manager.py:147-168 executing the :22-91 DDL).

    ``partition_cvss_by_year`` lays cvss out partitioned by ``pub_year``
    (derived from published_date at load). At 100 TB this is the layout
    that makes (a) date-bounded queries prune to the scanned years and
    (b) the NVD yearly-refresh an idempotent single-partition overwrite
    (see ``overwrite_year``) instead of the reference's all-or-nothing
    TRUNCATE + full reload."""
    create_database(spark, db)
    for name, schema in TABLES.items():
        if partition_cvss_by_year and name == "cvss":
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
            )
            spark.sql(
                f"CREATE TABLE {db}.cvss ({cols}, pub_year INT) "
                "USING parquet PARTITIONED BY (pub_year)"
            )
        else:
            spark.catalog.createTable(f"{db}.{name}", schema=schema, source="parquet")
    spark.sql(VIEW_SQL.format(db=db))


def truncate_cve_tables(spark: SparkSession, db: str = "cve") -> None:
    """D4: clear cpe, cve_problem, cvss but KEEP cwe (cve_manager.py:376 —
    the CWE catalog changes on MITRE's cadence, not NVD's)."""
    for name in ("cpe", "cve_problem", "cvss"):
        spark.sql(f"TRUNCATE TABLE {db}.{name}")


def _with_pub_year(spark: SparkSession, df: DataFrame, db: str, name: str) -> DataFrame:
    """Append the derived pub_year partition column when the target table
    has it and the incoming relation doesn't (insertInto is positional, so
    the partition column must be present and last)."""
    from pyspark.sql import functions as F

    target_cols = spark.table(f"{db}.{name}").columns
    if "pub_year" in target_cols and "pub_year" not in df.columns:
        df = df.withColumn("pub_year", F.year("published_date"))
    return df


def load_tables(
    spark: SparkSession, relations: dict[str, DataFrame], db: str = "cve", mode: str = "append"
) -> None:
    """Write flattened relations into the catalog tables (the engine's
    native equivalent of the COPY bulk load, cve_manager.py:321-360)."""
    for name, df in relations.items():
        _with_pub_year(spark, df, db, name).write.mode(mode).insertInto(f"{db}.{name}")


def overwrite_year(
    spark: SparkSession, cvss: DataFrame, db: str = "cve"
) -> None:
    """Idempotent yearly refresh for a partitioned cvss table: replace
    exactly the partitions present in the incoming batch, touch nothing
    else (dynamic partition overwrite). Re-running a year's feed is a
    no-op-sized rewrite of that year — the scale-correct replacement for
    TRUNCATE + full reload (cve_manager.py:376)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        _with_pub_year(spark, cvss, db, "cvss").write.insertInto(
            f"{db}.cvss", overwrite=True
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
