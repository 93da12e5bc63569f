"""SemDeDup-style semantic dedup queries (cluster-then-compare).

Three stages of the pipeline, each oracle-paired (the float-free
quantization contract in operators/semantic.py is what makes a k-means
differential possible at all — every distance, argmin, centroid update
and cosine test is exact integer arithmetic both engines reproduce
bit-for-bit):

- ``embedding_kmeans``   — the deterministic Lloyd's assignment itself;
- ``semantic_dedup``     — near-dup pairs WITHIN clusters (the SemDeDup
                            prune: k small self-joins instead of one
                            all-pairs cosine join);
- ``semantic_dedup_keep`` — the keep/drop roll-up per cluster (greedy
                            keep-lowest-id, the usual SemDeDup policy).

The cosine threshold τ = 0.35 matches dedup_embedding's LSH pipeline so
the two near-dup paths are comparable; the test cos(a,b) ≥ τ is
cross-multiplied to 400·dot² ≥ 49·|a|²·|b|² (0.35² = 49/400 exactly)
over 128-bit integers — no sqrt, no division, no floats.

At 100 TB: the only data-sized shuffles are the k·d-row centroid update
per iteration and the cluster-keyed self-join whose per-cluster size is
controlled by choosing k ∝ corpus/target-cluster-size (SemDeDup uses
~11k clusters for LAION-scale); with k far below the partition count
the cluster key is deliberately low-cardinality, which AQE's skew-join
splitting handles (same hatch as operators/skew.py documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.operators.semantic import kmeans_quantized
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(name, oracle, doc="", tags=(), priority: int = 0):
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


# Shared oracle prefix: quantize → seed on the 8 lowest vec_ids → two
# unrolled Lloyd iterations. list_dot_product runs in double but every
# operand is an exact integer ≤ 2.6e14 ≪ 2^53, so the BIGINT cast is
# exact; floor(sum/count) matches Spark's update (see operators/semantic
# module docstring for the boundary argument).
_KMEANS_CTE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
), c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, q AS c
  FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT 8)
), d1 AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
            - 2 * list_dot_product(CAST(q AS DOUBLE[]), CAST(c AS DOUBLE[]))
            + list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS BIGINT)
           AS dist
  FROM e CROSS JOIN c0
), a1 AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1
), x1 AS (
  SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS val FROM a1
), u1 AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM x1 GROUP BY cid, pos
), c1 AS (
  SELECT c0.cid, COALESCE(nc.c, c0.c) AS c
  FROM c0 LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS c FROM u1 GROUP BY cid) nc
    ON c0.cid = nc.cid
), d2 AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
            - 2 * list_dot_product(CAST(q AS DOUBLE[]), CAST(c AS DOUBLE[]))
            + list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS BIGINT)
           AS dist
  FROM e CROSS JOIN c1
), b2 AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1
), x2 AS (
  SELECT cid, generate_subscripts(q, 1) AS pos, unnest(q) AS val FROM b2
), u2 AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM x2 GROUP BY cid, pos
), c2 AS (
  SELECT c1.cid, COALESCE(nc.c, c1.c) AS c
  FROM c1 LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS c FROM u2 GROUP BY cid) nc
    ON c1.cid = nc.cid
), d3 AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
            - 2 * list_dot_product(CAST(q AS DOUBLE[]), CAST(c AS DOUBLE[]))
            + list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS BIGINT)
           AS dist
  FROM e CROSS JOIN c2
), a2 AS (
  SELECT vec_id, q, cid, dist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d3) WHERE rn = 1
)
"""

_PAIRS_CTE = _KMEANS_CTE + """
, n AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS qq
  FROM a2
), pairs AS (
  SELECT a.cid AS cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_dot_product(CAST(a.q AS DOUBLE[]), CAST(b.q AS DOUBLE[]))
              AS BIGINT) AS dot_q,
         a.qq AS na, b.qq AS nb
  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
), dup AS (
  SELECT cluster, vec_a, vec_b, dot_q FROM pairs
  WHERE dot_q > 0
    AND CAST(dot_q AS HUGEINT) * dot_q * 400
        >= CAST(na AS HUGEINT) * nb * 49
)
"""


_KMEANS_ORACLE = _KMEANS_CTE + """
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, dist AS dist_q FROM a2
"""


@_register(
    "embedding_kmeans",
    _KMEANS_ORACLE,
    doc="Deterministic k-means over the corpus embeddings (k=8, 2 Lloyd "
    "iterations, quantized-integer metric — operators/semantic.py). "
    "The clustering that powers SemDeDup and IVF indexing, made "
    "oracle-pairable: seeds are the k lowest vec_ids, ties break to "
    "the lowest cluster, updates floor(sum/count), so DuckDB unrolls "
    "the same two iterations and matches every assignment exactly. "
    "Assignment is map-side (centroid literals), the update is one "
    "k·d-row hash aggregate, and the driver only ever sees k·d "
    "centroid scalars per iteration — the pyspark.ml KMeans contract, "
    "with the RNG and float drift removed.",
)
def embedding_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    out = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    return out.select("vec_id", "cluster", "dist_q")


_DEDUP_ORACLE = _PAIRS_CTE + """
SELECT cluster, vec_a, vec_b, dot_q FROM dup
"""


@_register(
    "semantic_dedup",
    _DEDUP_ORACLE,
    doc="SemDeDup near-duplicate pairs: cosine ≥ 0.35 tested ONLY within "
    "a k-means cluster — the cluster assignment replaces the O(n²) "
    "all-pairs cosine join with k self-joins whose size is controlled "
    "by k (SemDeDup, arXiv:2303.09540). The cosine test is exact: "
    "400·dot² ≥ 49·|a|²·|b|² over 128-bit ints (Spark DECIMAL(38,0), "
    "DuckDB HUGEINT), dot > 0 guards the square. Same τ as "
    "dedup_embedding's hyperplane-LSH path, so the two near-dup "
    "strategies are directly comparable on the same table. The "
    "self-join shuffles on the low-cardinality cluster key — the "
    "documented AQE-skew-split case.",
)
def semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    a = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    return _dup_pairs(a)


def _dup_pairs(a: DataFrame) -> DataFrame:
    left = a.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("qq").alias("na"),
    )
    right = a.select(
        F.col("cluster").alias("cluster_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("qq").alias("nb"),
    )
    p = left.join(
        right,
        (F.col("cluster") == F.col("cluster_b")) & (F.col("vec_a") < F.col("vec_b")),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.withColumn("dot_q", dot)
    d19 = F.col("dot_q").cast("decimal(19,0)")
    lhs = d19 * d19 * F.lit(400)
    rhs = F.col("na").cast("decimal(19,0)") * F.col("nb").cast("decimal(19,0)") * F.lit(49)
    return (
        p.where((F.col("dot_q") > 0) & (lhs >= rhs))
        .select("cluster", "vec_a", "vec_b", "dot_q")
    )


_KEEP_ORACLE = _PAIRS_CTE + """
, dropped AS (
  SELECT DISTINCT cluster, vec_b FROM dup
)
SELECT a2.cid AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(dropped.vec_b) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(dropped.vec_b) AS BIGINT) AS n_kept
FROM a2 LEFT JOIN dropped
  ON a2.cid = dropped.cluster AND a2.vec_id = dropped.vec_b
GROUP BY a2.cid
"""


@_register(
    "semantic_dedup_keep",
    _KEEP_ORACLE,
    doc="SemDeDup keep/drop roll-up: greedy keep-lowest-id — a vector is "
    "dropped iff some lower-id cluster-mate sits within the cosine "
    "threshold (i.e. it appears as vec_b in at least one dup pair). "
    "Per cluster: members, dropped, kept — the dedup-rate report that "
    "decides whether the threshold/k choice is pruning anything "
    "before the expensive corpus rewrite runs. One distinct-project "
    "of the pair relation and a left anti-style join back to the "
    "assignment.",
)
def semantic_dedup_keep(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    a = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    dropped = (
        _dup_pairs(a)
        .select(F.col("cluster").alias("dc"), F.col("vec_b").alias("db"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    j = a.select("cluster", "vec_id").join(
        dropped,
        (F.col("cluster") == F.col("dc")) & (F.col("vec_id") == F.col("db")),
        "left",
    )
    return j.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.count("is_dropped").alias("n_dropped"),
        (F.count(F.lit(1)) - F.count("is_dropped")).alias("n_kept"),
    )


def _pq_subspace_cte(j: int, w: int, k: int) -> str:
    """Unrolled 2-iteration quantized k-means for subspace ``j`` (slice
    q[j*w+1 : (j+1)*w]) — the per-subspace copy of the _KMEANS_CTE
    pattern, suffixed so m of them compose in one WITH clause. Emits
    ``asg_s{j}`` = (vec_id, cid), the final assignment."""
    lo, hi = j * w + 1, (j + 1) * w
    s = f"_s{j}"
    dist = (
        "CAST(list_dot_product(CAST(qs AS DOUBLE[]), CAST(qs AS DOUBLE[]))"
        " - 2 * list_dot_product(CAST(qs AS DOUBLE[]), CAST(c AS DOUBLE[]))"
        " + list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS BIGINT)"
    )
    return f"""e{s} AS (
  SELECT vec_id, q[{lo}:{hi}] AS qs FROM eq
), c0{s} AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, qs AS c
  FROM (SELECT vec_id, qs FROM e{s} ORDER BY vec_id LIMIT {k})
), d1{s} AS (
  SELECT vec_id, qs, cid, {dist} AS dist FROM e{s} CROSS JOIN c0{s}
), a1{s} AS (
  SELECT vec_id, qs, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1{s}) WHERE rn = 1
), x1{s} AS (
  SELECT cid, generate_subscripts(qs, 1) AS pos, unnest(qs) AS val FROM a1{s}
), u1{s} AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM x1{s} GROUP BY cid, pos
), c1{s} AS (
  SELECT c0{s}.cid, COALESCE(nc.c, c0{s}.c) AS c
  FROM c0{s} LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS c FROM u1{s} GROUP BY cid) nc
    ON c0{s}.cid = nc.cid
), d2{s} AS (
  SELECT vec_id, qs, cid, {dist} AS dist FROM e{s} CROSS JOIN c1{s}
), b2{s} AS (
  SELECT vec_id, qs, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2{s}) WHERE rn = 1
), x2{s} AS (
  SELECT cid, generate_subscripts(qs, 1) AS pos, unnest(qs) AS val FROM b2{s}
), u2{s} AS (
  SELECT cid, pos,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM x2{s} GROUP BY cid, pos
), c2{s} AS (
  SELECT c1{s}.cid, COALESCE(nc.c, c1{s}.c) AS c
  FROM c1{s} LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS c FROM u2{s} GROUP BY cid) nc
    ON c1{s}.cid = nc.cid
), d3{s} AS (
  SELECT vec_id, qs, cid, {dist} AS dist FROM e{s} CROSS JOIN c2{s}
), asg{s} AS (
  SELECT vec_id, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d3{s}) WHERE rn = 1
)"""


def _pq_codes_oracle(m: int = 4, w: int = 16, k: int = 8) -> str:
    """Machine-built oracle: m unrolled per-subspace k-means + the code
    array assembly. One WITH clause; each subspace replays the identical
    deterministic Lloyd's the Spark pq_train runs in shared passes."""
    parts = [
        """eq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
)"""
    ]
    parts += [_pq_subspace_cte(j, w, k) for j in range(m)]
    joins = " ".join(
        f"JOIN asg_s{j} ON asg_s0.vec_id = asg_s{j}.vec_id" for j in range(1, m)
    )
    # scalar code columns, NOT an array: the driver's canonicalizer sorts
    # result frames through pandas and cannot hash array cells
    # (CORRECTNESS_r06.json pq_codes: "unhashable type: numpy.ndarray")
    code = ", ".join(f"asg_s{j}.cid AS code_{j}" for j in range(m))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT asg_s0.vec_id AS vec_id, {code}"
        + f"\nFROM asg_s0 {joins}"
    )


@_register(
    "pq_codes",
    _pq_codes_oracle(),
    doc="Product-quantizer encode, hash-checked: m=4 subspace codebooks "
    "(k=8, two Lloyd iterations — every subspace trained in the SAME "
    "shared passes, operators/similarity.pq_train) and the per-vector "
    "code array assigned map-side. The oracle is MACHINE-BUILT: four "
    "unrolled copies of the quantized-k-means CTE, one per slice — "
    "possible only because of the integer quantization contract, and "
    "the hash-checked face of the rows-only ann_pq retrieval (same "
    "role embedding_kmeans plays for semantic_dedup). Codes surface as "
    "four scalar INT columns code_0..code_3 (not array<int>: the driver "
    "canonicalizer cannot hash array cells — r6 red row).",
)
def pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.similarity import pq_encode, pq_train

    emb = load_table(spark, sf, "embeddings")
    books = pq_train(emb, m=4, k=8, iters=2)
    return pq_encode(emb, books).select(
        "vec_id",
        *[
            F.element_at("pq_code", j + 1).cast("int").alias(f"code_{j}")
            for j in range(4)
        ],
    )


# ---------------------------------------------------------------------------
# deterministic PCA and its applications (folded from the round-9d
# tranche): embedding_pca_power verifies operators/semantic.
# pca_power_top — a two-iteration integer power method — against a
# fully-unrolled DuckDB oracle (the k-means-CTE discipline applied to
# an iterative linear-algebra kernel); pca_projection_by_label is the
# "all-but-the-top" common-direction diagnostic. Determinism:
# quantized BIGINT vectors, floor means, exact in-row dots,
# floor(y/1e6) rescales provably > 100 ulps from integer boundaries,
# driver renormalize as sign(w) * (|w| * 1e6 // max|w|) — truncation
# toward zero, matching DuckDB HUGEINT //.
# ---------------------------------------------------------------------------


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
    priority=1,
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
    priority=1,
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


# ---------------------------------------------------------------------------
# embedding drift monitor (round 10): PSI-style bucket histogram over the
# corpus top-PC projection, reference window vs current window.
# ---------------------------------------------------------------------------


def _drift_oracle() -> str:
    return _PCA_CTE + """
, proj AS (
  SELECT x.vec_id,
         CAST(FLOOR(CAST(SUM(x.xv * v2.v) AS DOUBLE) / 1000000) AS BIGINT)
           AS p
  FROM x JOIN v2 USING (pos) GROUP BY x.vec_id
), pr AS (
  SELECT CAST(vec_id % 2 AS INTEGER) AS win, p FROM proj
), st AS (
  SELECT MIN(p) AS pmin, MAX(p) AS pmax,
         SUM(CASE WHEN win = 0 THEN 1 ELSE 0 END) AS nrt,
         SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) AS nct
  FROM pr
), g AS (
  SELECT CAST((pr.p - st.pmin) * 16 // (st.pmax - st.pmin + 1) AS INTEGER)
           AS bucket,
         SUM(CASE WHEN pr.win = 0 THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN pr.win = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM pr, st GROUP BY 1
)
SELECT g.bucket,
       CAST(g.n_ref AS BIGINT) AS n_ref,
       CAST(g.n_cur AS BIGINT) AS n_cur,
       CAST(g.n_ref * 1000000 // st.nrt AS BIGINT) AS ppm_ref,
       CAST(g.n_cur * 1000000 // st.nct AS BIGINT) AS ppm_cur,
       CAST(g.n_cur * 1000000 // st.nct
            - g.n_ref * 1000000 // st.nrt AS BIGINT) AS delta_ppm
FROM g, st
"""


@_register(
    "embedding_drift_buckets",
    _drift_oracle(),
    doc="Embedding-distribution drift monitor: project every vector onto "
    "the corpus top principal direction (the exact-integer power-method "
    "pipeline of embedding_pca_power), histogram the projection into 16 "
    "equal-width buckets between the global min/max, and compare the "
    "REFERENCE window against the CURRENT window per bucket — counts "
    "plus ppm shares plus the signed per-bucket share delta, i.e. the "
    "exact-integer inputs of a PSI / total-variation drift score (the "
    "transcendental ln of PSI stays OUT of the engine, computed driver-"
    "side over these 16 rows; sum(|delta_ppm|)/2e6 IS the total "
    "variation distance). Windows here are the vec_id-parity A/A split "
    "— the null-drift calibration run every monitor needs; in "
    "production the windows are crawl snapshots and the reference "
    "histogram is a frozen artifact. Cluster cost: the PCA passes (one "
    "d-sum aggregate per iteration), one projection pass, a 1-row "
    "stats broadcast, and a 16-key partial-agg'd groupBy — no shuffle "
    "carries vector payloads, and the monitor's per-window state is 16 "
    "integers regardless of corpus size.",
    priority=7,
)
def embedding_drift_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import (
        drift_fit,
        drift_projection,
    )

    from cve_manager_spark.plans.artifacts import frozen

    emb = load_table(spark, sf, "embeddings")
    # frozen artifact: trained once per (sf, recipe) and shared with
    # drift_escape_report / repeat invocations (plans/artifacts.py) —
    # the monitor's contract is map-side apply, not per-query retrain
    mu, v = frozen(
        ("drift_fit", sf, "embeddings", 2),
        lambda: drift_fit(emb, vec_col="embedding", id_col="vec_id", iters=2),
    )
    pr = drift_projection(emb, mu, v).select(
        (F.col("vec_id") % 2).cast("int").alias("win"), "p"
    )
    stats = pr.agg(
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
        F.sum(F.when(F.col("win") == 0, 1).otherwise(0))
        .cast("long")
        .alias("nrt"),
        F.sum(F.when(F.col("win") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nct"),
    )
    g = (
        pr.crossJoin(F.broadcast(stats))
        .select(
            F.expr("CAST((p - pmin) * 16 div (pmax - pmin + 1) AS INT)")
            .alias("bucket"),
            "win",
            "nrt",
            "nct",
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("win") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(F.col("win") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cur"),
            F.max("nrt").alias("nrt"),
            F.max("nct").alias("nct"),
        )
    )
    return g.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.expr("CAST(n_ref * 1000000 div nrt AS BIGINT)").alias("ppm_ref"),
        F.expr("CAST(n_cur * 1000000 div nct AS BIGINT)").alias("ppm_cur"),
        F.expr(
            "CAST(n_cur * 1000000 div nct - n_ref * 1000000 div nrt AS BIGINT)"
        ).alias("delta_ppm"),
    )


def _frozen_keep_oracle() -> str:
    from cve_manager_spark.plans.round10 import _incr_semantic_cte

    return _incr_semantic_cte() + """
, allv AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS nq
  FROM a2
  UNION ALL
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS nq
  FROM ad
), dr AS (
  SELECT DISTINCT b.cid, b.vec_id
  FROM allv a JOIN allv b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                              CAST(b.q AS DOUBLE[])) AS BIGINT) > 0
    AND CAST(CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                   CAST(b.q AS DOUBLE[])) AS BIGINT)
             AS HUGEINT)
        * CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                CAST(b.q AS DOUBLE[])) AS BIGINT) * 400
        >= CAST(a.nq AS HUGEINT) * b.nq * 49
), mem AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members FROM allv GROUP BY cid
), drc AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dropped FROM dr GROUP BY cid
)
SELECT CAST(mem.cid AS INTEGER) AS cluster, mem.n_members,
       CAST(COALESCE(drc.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(mem.n_members - COALESCE(drc.n_dropped, 0) AS BIGINT) AS n_kept
FROM mem LEFT JOIN drc ON mem.cid = drc.cid
"""


@_register(
    "semantic_dedup_frozen_keep",
    _frozen_keep_oracle(),
    doc="The streaming SemDeDup gate's one-shot batch face, oracle-"
    "verified: greedy keep-lowest-id over the WHOLE corpus (base ∪ "
    "delta) under the FROZEN base-trained codebook — exactly the final "
    "seen-table the foreach_batch_semantic_dedup sink converges to "
    "over id-ordered micro-batches (tests/test_streaming.py proves the "
    "stream==batch equality; this spec hash-verifies the batch side "
    "against DuckDB, closing the loop driver-side). Per cell: members, "
    "dropped, kept. Unlike semantic_dedup_keep (codebook retrained on "
    "everything), the codebook here never sees the delta — the "
    "no-retrain nightly-ingest contract. Cell-keyed equi self-join "
    "(never all-pairs), exact-integer cosine in DECIMAL(38,0).",
    priority=7,
)
def semantic_dedup_frozen_keep(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import dup_dominated
    from cve_manager_spark.plans.round10 import _incr_assignments

    ab, ad, _ = _incr_assignments(spark, sf)
    cols = ["vec_id", "q", "qq", "cluster"]
    # persist the encoded corpus: it feeds BOTH sides of the pair join
    # plus the membership count, and re-encoding it per consumer would
    # triple the map-side HOF work (the text_tfidf tf.persist pattern —
    # bench trials clear the SQL cache, so min-of-k still prices the
    # full query). n_salt spreads the per-pair cosine arithmetic across
    # the shuffle width instead of AQE's byte-coalesced couple of cores.
    allv = ab.select(*cols).unionByName(ad.select(*cols)).persist()
    dropped = dup_dominated(allv, allv, n_salt=16).withColumn(
        "__d", F.lit(1)
    )
    j = allv.select("cluster", "vec_id").join(dropped, "vec_id", "left")
    return j.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.count("__d").alias("n_dropped"),
    ).select(
        "cluster",
        "n_members",
        "n_dropped",
        (F.col("n_members") - F.col("n_dropped")).alias("n_kept"),
    )


_DRIFT_ESCAPE_TAIL = """
, proj AS (
  SELECT x.vec_id,
         CAST(FLOOR(CAST(SUM(x.xv * v2.v) AS DOUBLE) / 1000000) AS BIGINT)
           AS p
  FROM x JOIN v2 USING (pos) GROUP BY x.vec_id
), pr AS (
  SELECT CAST(vec_id % 2 AS INTEGER) AS win, p FROM proj
), rb AS (
  SELECT MIN(p) AS pmin, MAX(p) AS pmax,
         CAST(COUNT(*) AS BIGINT) AS n_ref
  FROM pr WHERE win = 0
)
SELECT rb.n_ref,
       CAST(COUNT(*) AS BIGINT) AS n_cur,
       CAST(SUM(CASE WHEN pr.p < rb.pmin THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below,
       CAST(SUM(CASE WHEN pr.p > rb.pmax THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       CAST(SUM(CASE WHEN pr.p < rb.pmin THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS below_ppm,
       CAST(SUM(CASE WHEN pr.p > rb.pmax THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS above_ppm
FROM pr, rb WHERE pr.win = 1 GROUP BY rb.n_ref
"""


@_register(
    "drift_escape_report",
    _PCA_CTE + _DRIFT_ESCAPE_TAIL,
    doc="The drift monitor's ALERT face: how much of the CURRENT window "
    "escapes the reference window's projection range entirely — counts "
    "and exact ppm below pmin and above pmax of the reference (win-0) "
    "projections. The bucketed histogram (embedding_drift_buckets) "
    "sees shape changes INSIDE the range; escape mass is the "
    "out-of-range half — in the streaming twin these are exactly the "
    "rows the frozen-bound bucketizer clamps into edge buckets, so "
    "this report quantifies what the clamp absorbed. One projection "
    "pass, a 1-row reference-bounds broadcast, one conditional "
    "aggregate — per-window state is 4 integers.",
    priority=7,
)
def drift_escape_report(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import (
        drift_fit,
        drift_projection,
    )

    from cve_manager_spark.plans.artifacts import frozen

    emb = load_table(spark, sf, "embeddings")
    mu, v = frozen(
        ("drift_fit", sf, "embeddings", 2),
        lambda: drift_fit(emb, vec_col="embedding", id_col="vec_id", iters=2),
    )
    pr = drift_projection(emb, mu, v).select(
        (F.col("vec_id") % 2).cast("int").alias("win"), "p"
    )
    rb = pr.where(F.col("win") == 0).agg(
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
        F.count(F.lit(1)).alias("n_ref"),
    )
    cur = pr.where(F.col("win") == 1).crossJoin(F.broadcast(rb))
    below = F.when(F.col("p") < F.col("pmin"), 1).otherwise(0)
    above = F.when(F.col("p") > F.col("pmax"), 1).otherwise(0)
    return cur.groupBy("n_ref").agg(
        F.count(F.lit(1)).alias("n_cur"),
        F.sum(below).cast("bigint").alias("n_below"),
        F.sum(above).cast("bigint").alias("n_above"),
        F.expr(
            "CAST(sum(CASE WHEN p < pmin THEN 1 ELSE 0 END) * 1000000 "
            "div count(1) AS BIGINT)"
        ).alias("below_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN p > pmax THEN 1 ELSE 0 END) * 1000000 "
            "div count(1) AS BIGINT)"
        ).alias("above_ppm"),
    ).select("n_ref", "n_cur", "n_below", "n_above", "below_ppm", "above_ppm")


_PQ_BALANCE_ORACLE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
), t AS (
  SELECT vec_id, generate_subscripts(q, 1) - 1 AS dim, unnest(q) AS val
  FROM e
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e
), mu AS (
  SELECT dim,
         CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / (SELECT n FROM nn)) AS BIGINT)
           AS m
  FROM t GROUP BY dim
), en AS (
  SELECT t.dim,
         CAST(SUM(CAST((t.val - mu.m) AS HUGEINT) * (t.val - mu.m))
              AS DECIMAL(38,0)) AS energy
  FROM t JOIN mu USING (dim) GROUP BY t.dim
), asg AS (
  SELECT dim, energy,
         CAST(dim // 16 AS INTEGER) AS naive_sub,
         CAST((ROW_NUMBER() OVER (ORDER BY energy DESC, dim) - 1) % 4
              AS INTEGER) AS balanced_sub
  FROM en
), nv AS (
  SELECT naive_sub AS subspace,
         CAST(CAST(SUM(energy) AS DECIMAL(38,0)) AS DOUBLE) AS naive_energy
  FROM asg GROUP BY naive_sub
), bl AS (
  SELECT balanced_sub AS subspace,
         CAST(CAST(SUM(energy) AS DECIMAL(38,0)) AS DOUBLE)
           AS balanced_energy
  FROM asg GROUP BY balanced_sub
)
SELECT nv.subspace, nv.naive_energy, bl.balanced_energy
FROM nv JOIN bl ON nv.subspace = bl.subspace
"""


@_register(
    "pq_subspace_balance",
    _PQ_BALANCE_ORACLE,
    doc="OPQ-lite for the product quantizer, deterministic and audited: "
    "instead of a learned rotation (float-iterative, not oracle-"
    "pairable), balance the SUBSPACES by permuting dimensions — rank "
    "dims by exact centered energy sum((q - mu)^2) and deal them "
    "round-robin into the 4 subspaces, the standard cheap OPQ "
    "approximation (dimension permutation captures most of the "
    "rotation's benefit when dims are near-independent). Emits per "
    "subspace the energy under pq_codes' naive contiguous split vs "
    "the balanced split: a large naive spread means one sub-codebook "
    "is starved while another saturates — the signal to adopt the "
    "permutation (it composes freely with pq_train, which treats "
    "dims as opaque positions). Cluster cost: one posexplode pass "
    "with d-key partial aggregates (energy in DECIMAL(38,0) via "
    "HUGEINT-exact products), a d-row ranking window, two 4-key "
    "roll-ups — no vector-sized shuffle.",
    priority=7,
)
def pq_subspace_balance(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import quantize_vec

    emb = load_table(spark, sf, "embeddings")
    t = emb.select(
        F.posexplode(quantize_vec(F.col("embedding"))).alias("dim", "val")
    )
    mu = t.groupBy("dim").agg(
        F.floor(
            F.sum("val").cast("double") / F.count(F.lit(1))
        ).cast("long").alias("m"),
        F.sum(
            (F.col("val").cast("decimal(19,0)") * F.col("val")).cast(
                "decimal(38,0)"
            )
        ).alias("s2"),
        F.sum("val").alias("s1"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact centered energy via the moment identity:
    # sum((v-m)^2) = sum(v^2) - 2*m*sum(v) + n*m^2 — one pass, no re-scan
    energy = (
        F.col("s2")
        - (F.col("m").cast("decimal(19,0)") * F.col("s1") * F.lit(2)).cast(
            "decimal(38,0)"
        )
        + (F.col("m").cast("decimal(19,0)") * F.col("m") * F.col("n")).cast(
            "decimal(38,0)"
        )
    ).cast("decimal(38,0)")
    en = mu.select("dim", energy.alias("energy"))
    w = Window.orderBy(F.col("energy").desc(), "dim")  # d rows only
    asg = en.select(
        "dim",
        "energy",
        F.expr("CAST(dim div 16 AS INT)").alias("naive_sub"),
        ((F.row_number().over(w) - 1) % 4).cast("int").alias("balanced_sub"),
    )
    nv = asg.groupBy(F.col("naive_sub").alias("subspace")).agg(
        F.sum("energy").cast("decimal(38,0)").cast("double").alias("naive_energy")
    )
    bl = asg.groupBy(F.col("balanced_sub").alias("subspace")).agg(
        F.sum("energy")
        .cast("decimal(38,0)")
        .cast("double")
        .alias("balanced_energy")
    )
    return nv.join(bl, "subspace")
