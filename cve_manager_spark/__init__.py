"""cve_manager_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference tool ``aatlasis/cve_manager``
(an NVD CVE ETL + PostgreSQL query CLI), re-expressed Spark-first.

The reference (/root/reference/cve_manager.py, 681 lines) downloads NVD JSON
feeds, flattens them to relational tables (cvss / cpe / cve_problem / cwe),
bulk-loads PostgreSQL, and answers five fixed query shapes. This package
keeps those semantics but executes them as Catalyst-optimized DataFrame
plans, and extends the engine with the aggregation / window / streaming /
dedup / similarity / text-analysis operators a large-scale data pipeline
needs (SURVEY.md §2.6–2.8).

Layout:
    session.py    SparkSession factory tuned for analytics (AQE, pruning)
    schemas.py    NVD JSON 1.1 + relational + testdata StructTypes
    catalog.py    database/table/view DDL over parquet (SURVEY §2.9)
    sources/      testdata loader, NVD zip/JSON source, CWE CSV source
    operators/    NVD flattener, dedup, similarity, text, multimodal
    functions/    tiny expression helpers (exact-decimal sums, py-bool, …)
    plans/        parity + extension query builders and the driver registry
    streaming/    Structured Streaming wrappers (windows, watermark, dedup)
"""

__version__ = "0.1.0"
