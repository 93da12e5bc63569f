"""Property-style checks (SURVEY §5.2.4):

- explode conservation: exploded row count == sum of array sizes,
  over hypothesis-generated corpora;
- shingle count law: distinct n-gram count ≤ max(0, words - n + 1);
- exact-decimal aggregation is partitioning-invariant (the determinism
  property the whole oracle strategy rests on).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cve_manager_spark.operators.dedup import word_shingles
from cve_manager_spark.operators.text import words
from cve_manager_spark.functions.helpers import dec
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

# printable-ish text with whitespace variety
TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcdef \t\n")), min_size=0, max_size=60
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_explode_conserves_counts(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id: int, t: string")
    toks = df.select("id", words(F.col("t")).alias("w"))
    exploded = toks.select("id", F.explode("w")).count()
    summed = toks.agg(F.sum(F.size("w"))).first()[0] or 0
    assert exploded == summed


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_shingle_count_law(spark, texts):
    n = 3
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id: int, t: string")
    rows = df.select(
        F.size(words(F.col("t"))).alias("nw"),
        F.size(word_shingles(F.col("t"), n)).alias("ns"),
    ).collect()
    for r in rows:
        assert 0 <= r["ns"] <= max(0, r["nw"] - n + 1)


def test_decimal_sum_is_partitioning_invariant(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    vals = []
    for parts in (1, 7, 32):
        v = (
            li.repartition(parts)
            .agg(F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("s"))
            .first()["s"]
        )
        vals.append(v)
    assert vals[0] == vals[1] == vals[2]  # bitwise equal, any partitioning
