"""Round-9d tranche: deterministic PCA and its applications.

``embedding_pca_power`` verifies :func:`operators.semantic.pca_power_top`
— a two-iteration integer power method for the top principal direction
of the embedding corpus — against a fully-unrolled DuckDB oracle (the
k-means-CTE discipline applied to an iterative linear-algebra kernel).
``pca_projection_by_label`` is the application face: per-label
projection statistics along that direction, the "all-but-the-top" /
common-direction diagnostic run before semantic dedup or retrieval
(a dominant shared direction inflates every cosine).

Determinism: quantized BIGINT vectors, centroid-style floor means,
exact in-row dot products, floor(y/1e6) rescales where the double
quotient is provably > 100 ulps from any integer boundary, and
driver-side renormalization as sign(w) * (|w| * 1e6 // max|w|) —
truncation toward zero, matching DuckDB's integer ``//`` (which
truncates: -7 // 2 = -3, unlike Python's flooring //).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 1,
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


# Shared oracle prefix: quantize, center, two unrolled power iterations.
# v0 = e_1 at scale 1 (iteration 1 needs no y rescale: y = x_.1 is small);
# from iteration 2 on y is floored by 1e6 to keep w inside BIGINT.
_PCA_CTE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
), t AS (
  SELECT vec_id, generate_subscripts(q, 1) AS pos, unnest(q) AS val FROM e
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e
), mu AS (
  SELECT pos,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / (SELECT n FROM nn)) AS BIGINT)
           AS m
  FROM t GROUP BY pos
), x AS (
  SELECT t.vec_id, t.pos, t.val - mu.m AS xv FROM t JOIN mu USING (pos)
), y1 AS (
  SELECT vec_id, xv AS yq FROM x WHERE pos = 1
), w1 AS (
  SELECT x.pos, CAST(SUM(x.xv * y1.yq) AS BIGINT) AS w
  FROM x JOIN y1 USING (vec_id) GROUP BY x.pos
), m1 AS (
  SELECT MAX(abs(w)) AS mw FROM w1
), v1 AS (
  SELECT pos,
         CAST(CAST(w AS HUGEINT) * 1000000 // (SELECT mw FROM m1) AS BIGINT)
           AS v
  FROM w1
), y2 AS (
  SELECT x.vec_id,
         CAST(FLOOR(CAST(SUM(x.xv * v1.v) AS DOUBLE) / 1000000) AS BIGINT)
           AS yq
  FROM x JOIN v1 USING (pos) GROUP BY x.vec_id
), w2 AS (
  SELECT x.pos, CAST(SUM(x.xv * y2.yq) AS BIGINT) AS w
  FROM x JOIN y2 USING (vec_id) GROUP BY x.pos
), m2 AS (
  SELECT MAX(abs(w)) AS mw FROM w2
), v2 AS (
  SELECT pos,
         CAST(CAST(w AS HUGEINT) * 1000000 // (SELECT mw FROM m2) AS BIGINT)
           AS v
  FROM w2
)
"""


@_register(
    "embedding_pca_power",
    _PCA_CTE
    + """
SELECT CAST(pos - 1 AS INTEGER) AS dim, v AS loading FROM v2
""",
    doc="Top principal direction of the embedding corpus by a "
    "two-iteration DETERMINISTIC integer power method "
    "(operators/semantic.pca_power_top) — the exactly-reproducible "
    "core of embedding whitening and 'all-but-the-top' common-"
    "direction removal. Every stage is integer or provably-exact "
    "double (quantize, floor-mean centering, in-row dot products, "
    "floor(y/1e6) rescale, Python-bigint // renormalize == DuckDB "
    "HUGEINT //); the oracle unrolls both iterations as chained CTEs "
    "exactly like the k-means oracle. Cluster cost per iteration: ONE "
    "pass with d map-side-combinable sums, d+1 scalars to the driver "
    "(the kmeans_quantized contract); no join, no shuffle beyond the "
    "global-aggregate exchange.",
)
def embedding_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import pca_power_top

    emb = load_table(spark, sf, "embeddings")
    return pca_power_top(emb, vec_col="embedding", id_col="vec_id", iters=2)


@_register(
    "pca_projection_by_label",
    _PCA_CTE
    + """
, proj AS (
  SELECT x.vec_id,
         CAST(FLOOR(CAST(SUM(x.xv * v2.v) AS DOUBLE) / 1000000) AS BIGINT)
           AS p
  FROM x JOIN v2 USING (pos) GROUP BY x.vec_id
)
SELECT e2.label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(proj.p) AS BIGINT) AS sum_proj,
       CAST(MIN(proj.p) AS BIGINT) AS min_proj,
       CAST(MAX(proj.p) AS BIGINT) AS max_proj
FROM proj JOIN embeddings e2 ON proj.vec_id = e2.vec_id
GROUP BY e2.label
""",
    doc="Projection of every embedding onto the corpus top principal "
    "direction, aggregated per label — the 'all-but-the-top' "
    "diagnostic: labels whose projection ranges barely overlap are "
    "separated by the COMMON direction (so removing it would hurt), "
    "while identical ranges mean the top PC is label-noise (frequency "
    "artifact) and should be projected out before cosine retrieval. "
    "Projections are the same exact-integer y pipeline as the power "
    "iteration (floor(dot/1e6)); one extra corpus pass + a label "
    "aggregate.",
)
def pca_projection_by_label(spark: SparkSession, sf: str) -> DataFrame:
    import math

    from cve_manager_spark.operators.semantic import (
        pca_power_top,
        quantize_vec,
    )

    emb = load_table(spark, sf, "embeddings")
    v_rows = pca_power_top(
        emb, vec_col="embedding", id_col="vec_id", iters=2
    ).collect()
    v = [0] * len(v_rows)
    for r in v_rows:
        v[r["dim"]] = r["loading"]

    q = emb.select(
        "vec_id", "label", quantize_vec(F.col("embedding")).alias("q")
    )
    sums = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("q", j + 1)).alias(f"s{j}")
            for j in range(len(v))
        ],
    ).head()
    n = sums["n"]
    mu = [math.floor(sums[f"s{j}"] / n) for j in range(len(v))]
    mu_lit = F.array(*[F.lit(int(m)).cast("long") for m in mu])
    v_lit = F.array(*[F.lit(int(vj)).cast("long") for vj in v])
    x = q.select(
        "vec_id",
        "label",
        F.zip_with("q", mu_lit, lambda a, b: a - b).alias("x"),
    )
    dot = F.aggregate(
        F.zip_with("x", v_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    p = F.floor(dot.cast("double") / F.lit(1000000.0)).cast("long")
    return x.select("label", p.alias("p")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("bigint").alias("sum_proj"),
        F.min("p").cast("bigint").alias("min_proj"),
        F.max("p").cast("bigint").alias("max_proj"),
    )
