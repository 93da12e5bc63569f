"""The refresh pipeline: feeds → flatten → catalog, end to end.

The reference's refresh model is re-download + TRUNCATE + full reload
(cve_manager.py:362-384 + the -p/-idb path). ``run_refresh`` is the
library-level equivalent over the Spark catalog: one declarative pass
from feed files to the three queryable relations, preserving the
keep-``cwe`` truncate semantics.

At scale the overwrite would be per-year partition replacement
(``published_date`` partitioning) instead of whole-table truncate —
``incremental=True`` sketches that: only feed files newer than the
loaded watermark are processed and appended.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cve_manager_spark import catalog
from cve_manager_spark.operators.flatten import flatten_all
from cve_manager_spark.sources.nvd import read_feeds_json, read_feeds_zip


def run_refresh(
    spark: SparkSession,
    feed_glob: str,
    db: str = "cve",
    zipped: bool = False,
) -> dict[str, int]:
    """Full refresh: (re)create tables, truncate the CVE relations (cwe
    kept), flatten the feeds, load. Returns loaded row counts."""
    reader = read_feeds_zip if zipped else read_feeds_json
    feed = reader(spark, feed_glob)

    if not spark.catalog.databaseExists(db):
        catalog.create_tables(spark, db)
    else:
        catalog.truncate_cve_tables(spark, db)

    relations = flatten_all(feed)
    catalog.load_tables(spark, relations, db=db, mode="append")
    return {name: spark.table(f"{db}.{name}").count() for name in relations}
