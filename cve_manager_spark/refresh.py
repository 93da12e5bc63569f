"""The refresh pipeline: feeds → flatten → catalog, end to end.

The reference's refresh model is re-download + TRUNCATE + full reload
(cve_manager.py:362-384 + the -p/-idb path). ``run_refresh`` is the
library-level equivalent over the Spark catalog: one declarative pass
from feed files to the three queryable relations, preserving the
keep-``cwe`` truncate semantics.

``incremental=True`` replaces the all-or-nothing reload with file-level
incrementality: a ``refresh_log`` table records loaded feed files, new
calls anti-join against it and append only unseen files' rows. That is
the yearly-feed version of partition-level replacement — at 100 TB you
never reparse history to pick up one new feed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cve_manager_spark import catalog
from cve_manager_spark.operators.flatten import flatten_all
from cve_manager_spark.sources.nvd import read_feeds_json, read_feeds_zip

REFRESH_LOG = "refresh_log"


def run_refresh(
    spark: SparkSession,
    feed_glob: str,
    db: str = "cve",
    zipped: bool = False,
    incremental: bool = False,
) -> dict[str, int]:
    """Refresh the CVE relations from feed files.

    Full mode: (re)create tables, truncate the CVE relations (cwe kept),
    flatten everything, load. Incremental mode: only files absent from
    ``refresh_log`` are flattened and appended. Returns total row counts
    per relation after the refresh.
    """
    reader = read_feeds_zip if zipped else read_feeds_json
    feed = reader(spark, feed_glob)

    if not spark.catalog.databaseExists(db):
        catalog.create_tables(spark, db)

    log_table = f"{db}.{REFRESH_LOG}"
    if incremental:
        if spark.catalog.tableExists(log_table):
            loaded = spark.table(log_table)
            feed = feed.join(
                loaded, feed.source_file == loaded.source_file, "left_anti"
            )
    else:
        catalog.truncate_cve_tables(spark, db)
        if spark.catalog.tableExists(log_table):
            spark.sql(f"TRUNCATE TABLE {log_table}")

    new_files = feed.select("source_file").distinct()
    relations = flatten_all(feed)
    catalog.load_tables(spark, relations, db=db, mode="append")
    new_files.write.mode("append").format("parquet").saveAsTable(log_table)
    return {name: spark.table(f"{db}.{name}").count() for name in relations}
