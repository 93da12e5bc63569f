"""Round-10e tranche: pipeline design-dial sweeps — the parameter
curves an engineer reads BEFORE committing a 100 TB pass to one
setting. Each spec evaluates several candidate settings in one (or a
few) scans, so choosing a knob costs a report query instead of N full
pipeline runs. Same family as minhash_band_stats (LSH banding curve)
and cms_width_sweep (sketch width curve); same integer-exact recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import fan_out
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 6,
):
    def deco(fn):
        SPECS.append(
            QuerySpec(
                name=name,
                build=fn,
                oracle=oracle,
                doc=doc or (fn.__doc__ or ""),
                tags=tags,
                priority=priority,
            )
        )
        return fn

    return deco


_TOKS = """
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
"""


def _shingle_profile_duck(n: int) -> str:
    return f"""(
  WITH toks AS ({_TOKS}), sh AS (
    SELECT doc_id,
           md5(unnest(list_transform(range(1, len(w) - {n - 2}),
             i -> array_to_string(w[i:i+{n - 1}], ' ')))) AS g
    FROM toks WHERE len(w) >= {n}
  ), gc AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY g
  )
  SELECT {n} AS n, CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(c) AS BIGINT) AS n_occurrences,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
           AS n_dup_occurrences,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1000000
              // SUM(c) AS BIGINT) AS dup_ppm
  FROM gc
)"""


@_register(
    "shingle_size_sweep",
    " UNION ALL ".join(_shingle_profile_duck(n) for n in (2, 3, 5)),
    doc="The n-gram-size dial for shingle dedup, measured: for n in "
    "{2, 3, 5}, the distinct-shingle count, total occurrences, and "
    "the occurrence mass sitting in repeated shingles (dup_ppm). "
    "Small n over-matches (high dup mass = false near-dup "
    "candidates), large n under-matches — this curve is how the "
    "production n (usually 5-13 words) gets picked for a corpus "
    "WITHOUT running the full pair join at each candidate n. "
    "Shingles travel as md5 digests; one digest-keyed count per n.",
)
def shingle_size_sweep(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))

    def prof(n: int) -> DataFrame:
        grams = F.transform(
            F.slice(F.col("w"), 1, F.size("w") - (n - 1)),
            lambda x, i: F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), i + F.lit(1), n))
            ),
        )
        sh = toks.where(F.size("w") >= n).select(F.explode(grams).alias("g"))
        gc = sh.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        dup = F.when(F.col("c") >= 2, F.col("c")).otherwise(0)
        return gc.groupBy().agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.sum(dup).cast("bigint").alias("n_dup_occurrences"),
            F.expr(
                "CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1000000 "
                "div sum(c) AS BIGINT)"
            ).alias("dup_ppm"),
        ).select(
            F.lit(n).cast("int").alias("n"),
            "n_distinct",
            "n_occurrences",
            "n_dup_occurrences",
            "dup_ppm",
        )

    return prof(2).unionByName(prof(3)).unionByName(prof(5))


def _quality_sweep_oracle() -> str:
    from cve_manager_spark.plans.round8 import (
        _QUALITY_EXPR_SQL,
        _QUALITY_SCORE_SQL,
    )

    return (
        "WITH f AS ("
        + _QUALITY_EXPR_SQL
        + "), s AS ("
        + _QUALITY_SCORE_SQL
        + """
), th AS (
  SELECT unnest([200000, 300000, 400000, 500000, 600000]) AS threshold
)
SELECT th.threshold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s.score >= th.threshold THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN s.score >= th.threshold THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS pass_ppm
FROM s CROSS JOIN th
GROUP BY th.threshold
"""
    )


@_register(
    "quality_threshold_sweep",
    _quality_sweep_oracle(),
    doc="The keep-threshold dial for the quality classifier, measured "
    "as a curve: doc pass counts and exact ppm at five candidate "
    "score thresholds, from one scoring pass (the 5-row threshold "
    "spine broadcasts into a conditional aggregate — never five "
    "scans). Read next to quality_score_deciles: the deciles say "
    "where the mass IS, this says what each proposed gate KEEPS.",
)
def quality_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import _quality_scored

    docs = fan_out(load_table(spark, sf, "documents"))
    s = _quality_scored(docs).select("doc_id", "score")
    th = spark.createDataFrame(
        [(t,) for t in (200000, 300000, 400000, 500000, 600000)],
        "threshold int",
    )
    j = s.crossJoin(F.broadcast(th))
    passed = F.when(F.col("score") >= F.col("threshold"), 1).otherwise(0)
    return j.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(passed).cast("bigint").alias("n_pass"),
        F.expr(
            "CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) "
            "* 1000000 div count(1) AS BIGINT)"
        ).alias("pass_ppm"),
    )
