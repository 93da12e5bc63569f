"""MITRE CWE catalog CSV source (SURVEY §2.1 S7, cve_manager.py:580-610).

The reference reads the MITRE ``1000.csv`` with csv.reader, keeps
positional columns [0,1,4,5,11,14,16], and COPYs them into ``cwe``.
Spark-first: header-aware CSV read (multiline quoted fields on), then a
positional projection — the MITRE export's column *positions* are the
contract the reference relies on, so we preserve exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (position, target column) per cve_manager.py:599 and the cwe DDL :69-77.
POSITIONS = [0, 1, 4, 5, 11, 14, 16]
TARGET_COLS = [
    "cwe_id",
    "name",
    "description",
    "extended_description",
    "modes_of_introduction",
    "common_consequences",
    "potential_mitigations",
]


def read_cwe_csv(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    src = df.columns
    picked = [F.col(f"`{src[p]}`").alias(t) for p, t in zip(POSITIONS, TARGET_COLS)]
    out = df.select(*picked)
    return out.withColumn("cwe_id", F.col("cwe_id").cast("int"))
