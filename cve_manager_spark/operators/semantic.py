"""Semantic (embedding-space) clustering for SemDeDup-style dedup.

The operator the big text-dedup pipelines run AFTER lexical MinHash:
cluster the corpus's embeddings with k-means, then look for near-
duplicates only WITHIN a cluster — the cluster assignment replaces the
all-pairs cosine join with k tractable self-joins (SemDeDup,
arXiv:2303.09540; the reference engine has no embedding operators at
all — cve_manager.py stores plain relational rows — so this family is
part of the driver-mandated pipeline extension surface, not reference
parity).

Determinism contract (what makes this oracle-pairable when float
k-means never is): all arithmetic happens on integer-QUANTIZED
embeddings — ``q[i] = floor(x[i] * 1e6)`` as BIGINT — so distances,
argmins and centroid updates are exact integer math with no
accumulation-order drift, and DuckDB reproduces them bit-for-bit:

- init: the k lowest-``id`` vectors are the seed centroids (no RNG);
- assignment: argmin over squared L2 distance, ties to the lowest
  cluster id (``array_min`` over (dist, cid) structs — struct ordering
  IS the tie-break);
- update: per-dimension ``floor(sum/count)`` — the division happens in
  double but |sum| ≤ n·2e6 is exactly representable and the quotient is
  never within 1/count of an integer unless exact, so the floor is
  engine-identical;
- empty clusters keep their previous centroid.

Scale shape (100 TB): assignment is MAP-SIDE ONLY — centroids travel as
k·d literals (k ≤ ~1e3) or, past that, as a broadcast matrix into the
pandas GEMM kernel used by operators.similarity.ivf_index — and the
update is one hash aggregate producing k·d rows. Per iteration the
driver touches exactly k·d scalars (the new centroids — same contract
as pyspark.ml KMeans), never data rows. Lloyd's is 2 fixed iterations
here so the oracle can unroll it; production tuning raises ``iters``
without changing any shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import (
    long_array_lit,
    long_matrix_lit,
    values_relation,
)

QUANT_SCALE = 1_000_000


def quantize_vec(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """float array → exact BIGINT array: floor(x * scale)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def dot_self(q: Column) -> Column:
    """Exact <q, q> as BIGINT (|x| ≤ 2e6, d = 64 → fits long)."""
    return F.aggregate(
        q, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )


def dot_lit(q: Column, cvec: list[int]) -> Column:
    """Exact <q, c> against a driver-side centroid literal.

    ``F.lit(list)`` ships the centroid as ONE array literal node — the
    per-element ``F.array(*[F.lit(v) ...])`` form puts k·d literal nodes
    in the tree and the analysis/codegen time of that tree dominated the
    whole query at small scale (measured: ~40% of embedding_kmeans)."""
    arr = long_array_lit(cvec)
    return F.aggregate(
        F.zip_with(q, arr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_clusters(qdf: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Nearest-centroid assignment, map-side only.

    ``qdf`` carries (id, q, qq); returns it plus (cluster, dist_q).
    dist = qq − 2<q,c> + <c,c>; the per-row argmin is an in-row
    ``array_min`` over (dist, cid) structs so the tie-break (lowest cid)
    is part of the ordering, not a separate pass.

    The k centroids travel as ONE 2-D array literal walked by an indexed
    ``transform`` — the expression tree is O(1) in k, not O(k). The
    previous shape (k independent fold expressions, each embedding its
    own d-element literal) made analysis + whole-stage codegen scale with
    k·d and dominated semantic_dedup's wall time at small scale; it also
    caps how far k can grow before the generated method exceeds the JIT
    limit. Integer math is unchanged: same products, same fold order,
    same struct ordering for the tie-break.

    r14: the whole argmin is ONE parsed SQL expression. The
    Column-and-lambda form of the same tree cost ~0.2 s of py4j round
    trips per call on the driver (each higher-order lambda is several
    JVM calls), paid at every training iteration and once more for the
    final assignment; the parsed string is a single round trip and
    analyzes to the identical expression (guide §5: the driver should
    do almost no per-query work).
    """
    cents_sql = "array(" + ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in c) + ")" for c in cents
    ) + ")"
    cc_sql = "array(" + ",".join(
        f"{sum(int(v) * int(v) for v in c)}L" for c in cents
    ) + ")"
    best = F.expr(
        f"array_min(transform({cents_sql}, (c, i) -> "
        "struct(qq - 2 * aggregate(zip_with(q, c, (a, b) -> a * b), 0L, "
        f"(acc, x) -> acc + x) + element_at({cc_sql}, i + 1) AS dist, "
        "CAST(i AS INT) AS cid)))"
    )
    return qdf.withColumn("cluster", best["cid"]).withColumn("dist_q", best["dist"])


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic Lloyd's over quantized embeddings — fit half.

    Returns (q, centroids): ``q`` is the persisted quantized relation
    (id, q, qq) and ``centroids`` the final k×d integer codebook. Split
    out from :func:`kmeans_quantized` so consumers that need the
    CODEBOOK rather than the assignment (the product quantizer trains
    one per subspace) reuse the identical training loop.
    """
    from pyspark import StorageLevel

    from cve_manager_spark.functions.helpers import fan_out

    # fan_out: a small embeddings parquet scans as ONE partition, and the
    # per-row work here (k×d higher-order exprs per assignment) must not
    # run single-threaded; no-op at real scale where the input carries
    # enough partitions. r14: target is CAPPED at 8 — the assignment is
    # ~k·d integer ops per row (~1 µs), so splitting a small input
    # across every core buys scheduling overhead, not parallelism
    # (measured: the full fit 1.48 s at 32 partitions vs 1.02 s at 8,
    # identical centroids; the cap binds only when the input is small
    # enough for fan_out to act at all — a large input keeps its own
    # partitioning and the cap is moot).
    q = (
        fan_out(
            df.select(F.col(id_col), quantize_vec(F.col(vec_col)).alias("q")),
            target=8,
        )
        .withColumn("qq", dot_self(F.col("q")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # seed: the k lowest-id vectors (k·d scalars to the driver, no RNG)
    cents = [r["q"] for r in q.orderBy(id_col).limit(k).collect()]
    for _ in range(iters):
        a = assign_clusters(q, cents)
        # one shuffle per iteration: collect at (cluster, pos) grain —
        # k·d rows (≤ ~64k scalars at production k) — and assemble the
        # centroid arrays driver-side; a second groupBy to build arrays
        # in-engine adds a stage per iteration for no data reason
        upd = (
            a.select("cluster", F.posexplode("q").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("cv")
            )
            .collect()
        )
        new: dict[int, dict[int, int]] = {}
        for r in upd:
            new.setdefault(r["cluster"], {})[r["pos"]] = int(r["cv"])
        # an emptied cluster keeps its previous centroid
        cents = [
            [new[cid][p] for p in range(len(cents[cid]))] if cid in new else cents[cid]
            for cid in range(k)
        ]
    return q, cents


def kmeans_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic Lloyd's over quantized embeddings.

    Returns (id, q, qq, cluster, dist_q) — the final assignment with the
    quantized vectors still attached so downstream near-dup joins reuse
    them without a re-scan.
    """
    from pyspark import StorageLevel

    q, cents = kmeans_fit(df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    # Persist the FINAL assignment: every consumer of this operator feeds
    # it into a self-join (semantic_dedup reads it on both sides,
    # semantic_dedup_keep three times) and without a persist each branch
    # re-runs the assignment map. Lazy — a single-use consumer pays one
    # no-op cache fill, a self-join saves a full recompute per branch.
    return assign_clusters(q, cents).persist(StorageLevel.MEMORY_AND_DISK)


def pca_power_top(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
) -> DataFrame:
    """Top principal direction by DETERMINISTIC integer power iteration —
    the exactly-reproducible core of embedding whitening / the
    "all-but-the-top" common-direction removal step.

    Recipe (every stage integer or provably-exact double):

    - quantize: q = floor(x * 1e6) BIGINT (``quantize_vec``);
    - center:   mu_j = floor(sum(q_j) / n) with the sum exact in double
      (|sum| < 2^53) — the k-means centroid-update floor semantics;
    - v0 = e_0 at scale 1; each iteration computes y_i = <x_i, v>
      IN-ROW (zip_with/aggregate, no join, no shuffle beyond the one
      global-aggregate exchange of partials), rescales y by
      floor(y / 1e6) from the second iteration on (exact: |y|/1e6 <
      2^27 so the double quotient is > 1e2 ulps away from any integer
      boundary), folds w_j = sum_i x_ij * y_i as d map-side-combinable
      aggregate expressions, and renormalizes DRIVER-side with Python
      big-int division v_j = sign(w_j) * (|w_j| * 1e6 // max|w|) —
      truncation-toward-zero on both factors, which is what DuckDB's
      integer ``//`` does (measured: -7 // 2 = -3 there, unlike
      Python's flooring -4, so the sign is split out explicitly).

    Driver traffic per iteration is d+1 scalars (the kmeans_quantized
    contract); the per-iteration cluster work is ONE pass over the
    relation with d sum aggregates. Returns a (dim INT, loading BIGINT)
    relation, loadings scaled to max |loading| = 1e6.

    Magnitude budget (d = 64, |x| <= 2e6 centered): y <= 1.3e14 per row
    (exact in BIGINT: d in-row terms of <= 2e12). The w-fold is the one
    stage whose magnitude grows with n — per-row x_ij*y <= 2.6e14, so a
    BIGINT sum wraps silently (ANSI off) at n ~ 3.5e4 rows while DuckDB
    promotes to HUGEINT. The fold therefore carries each product as
    DECIMAL(38,0) (the token_gini_by_source pattern): exact through
    n ~ 1e23 rows, and the driver-side renormalization is Python big-int
    so downstream magnitude is unbounded-safe.
    """
    import math

    q = df.select(quantize_vec(F.col(vec_col)).alias("q"))
    first = q.head()
    if first is None:
        raise ValueError("pca_power_top: empty input")
    d = len(first["q"])

    sums = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("q", j + 1)).alias(f"s{j}") for j in range(d)],
    ).head()
    n = sums["n"]
    mu = [math.floor(sums[f"s{j}"] / n) for j in range(d)]

    mu_lit = long_array_lit(mu)
    x = q.select(F.zip_with("q", mu_lit, lambda a, b: a - b).alias("x"))

    v = _power_iterate(x, d, iters)

    spark = df.sparkSession
    return values_relation(
        spark, [(j, int(v[j])) for j in range(d)], "dim int, loading bigint"
    )


def _power_iterate(x: DataFrame, d: int, iters: int) -> list[int]:
    """The power-iteration core of :func:`pca_power_top`, shared with
    the deflation path: ``x`` carries one column ``x`` (array<long>,
    centered), returns the direction as d ints scaled to max 1e6."""
    v = [1 if j == 0 else 0 for j in range(d)]
    for it in range(iters):
        v_lit = long_array_lit(v)
        y = F.aggregate(
            F.zip_with("x", v_lit, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, e: acc + e,
        )
        if it > 0:
            y = F.floor(y.cast("double") / F.lit(1000000.0)).cast("long")
        xy = x.select("x", y.alias("yq"))
        row = xy.agg(
            *[
                # product fits BIGINT (<= 2.6e14); the SUM is what wraps at
                # n ~ 3.5e4 rows, so fold in DECIMAL(38,0) — exact, and
                # Spark's decimal sum is still map-side combinable
                F.sum(
                    (F.element_at("x", j + 1) * F.col("yq")).cast("decimal(38,0)")
                ).alias(f"w{j}")
                for j in range(d)
            ]
        ).head()
        w = [int(row[f"w{j}"]) for j in range(d)]
        m = max(abs(wj) for wj in w)
        if m == 0:
            break
        # truncation toward zero (DuckDB // semantics), NOT Python floor
        v = [
            (abs(wj) * 1_000_000 // m) * (1 if wj >= 0 else -1) for wj in w
        ]
    return v


def unit_scale(v: list[int]) -> list[int]:
    """Rescale a direction to L2 norm ≈ 1e6 (from pca_power_top's
    max-|loading| = 1e6 convention): u_j = trunc(v_j·1e6 / isqrt(<v,v>)).
    Deflation MUST use this scale — the projection-removal formula
    p·u/1e6 assumes <u,u> ≈ 1e12, and deflating with the max-scaled v
    under/over-subtracts along the found direction, which the next
    power iteration then re-amplifies straight back to PC1 (measured:
    cos(v1,"v2") → 0.999 by 6 iterations without this). Exact in both
    engines: <v,v> ≤ 64e12 so double sqrt is correctly rounded and
    floor(sqrt(vv)) == isqrt(vv) (an integer this size sits ≥ 3e-3
    away from any non-square's rounding boundary), and the truncating
    division sign-splits like DuckDB's ``//``."""
    import math

    vv = sum(vj * vj for vj in v)
    nrm = math.isqrt(vv)
    if nrm == 0:
        return list(v)
    return [
        (abs(vj) * 1_000_000 // nrm) * (1 if vj >= 0 else -1) for vj in v
    ]


def pca_deflate_expr(x_col: str, p_col: str, v: list[int]):
    """In-row deflation expression: subtract the projection onto ``v``
    (scale 1e6) from a centered row — r_j = (x_j·1e6 − p·v_j) div 1e6
    with truncation-toward-zero on the rescale (Java ``%`` keeps the
    dividend's sign, so (val − val%1e6)/1e6 is the exact truncating
    quotient DuckDB's ``//`` computes — the pca_residual_norms recipe).

    ONE parsed expression (r14): the Column-lambda form cost ~0.1 s of
    py4j driver time per call (guide §5); 1000000.0D is the DOUBLE
    literal F.lit(1000000.0) was (a bare 1000000.0 parses as DECIMAL)."""
    from cve_manager_spark.functions.helpers import long_array_sql

    val = f"(a * 1000000 - {p_col} * b)"
    return F.expr(
        f"zip_with({x_col}, {long_array_sql(v)}, (a, b) -> "
        f"CAST(CAST({val} - {val} % 1000000 AS DOUBLE) / 1000000.0D AS BIGINT))"
    )


def proj_expr(x_col: str, v: list[int]):
    """In-row projection p = floor(<x, v>/1e6) onto a direction literal
    (scale 1e6) — exact: |<x,v>|/1e6 < 2^27 so the double quotient sits
    far from any integer boundary (the drift_projection argument).
    One parsed expression (see pca_deflate_expr)."""
    from cve_manager_spark.functions.helpers import long_array_sql

    return F.expr(
        f"CAST(floor(CAST(aggregate(zip_with({x_col}, {long_array_sql(v)}, "
        "(a, b) -> a * b), CAST(0 AS BIGINT), (acc, e) -> acc + e) AS DOUBLE) "
        "/ 1000000.0D) AS BIGINT)"
    )


def pca_power_topr(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    r: int = 2,
    iters: int = 2,
) -> tuple[list[int], list[list[int]]]:
    """Top-r principal directions by DEFLATION (VERDICT r10 #8 — the
    full "all-but-the-top" shape, arXiv:1702.01417 removes top-r, not
    top-1): run the :func:`pca_power_top` integer power iteration,
    subtract each row's projection on the found direction in-row (the
    exact residual ``pca_residual_norms`` already computes), iterate on
    the residual for the next direction. Every stage stays in the
    exact-integer contract, so a DuckDB unroll reproduces all r
    directions bit-for-bit.

    Cost: r power iterations, each ``iters`` one-pass aggregates; the
    deflations are in-row expressions stacked on the scan (no joins, no
    shuffles beyond each aggregate's exchange), so pass k re-evaluates
    k stacked deflation expressions — O(r²·d) per-row arithmetic total,
    fine for the r ≤ 4 this models. Driver traffic: d+1 scalars per
    iteration (the kmeans_quantized contract).

    Returns ``(mu, [v1..vr])`` — the integer corpus mean and the
    directions, each scaled to max |loading| = 1e6."""
    import math

    q = df.select(quantize_vec(F.col(vec_col)).alias("q"))
    first = q.head()
    if first is None:
        raise ValueError("pca_power_topr: empty input")
    d = len(first["q"])
    sums = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("q", j + 1)).alias(f"s{j}") for j in range(d)],
    ).head()
    n = sums["n"]
    mu = [math.floor(sums[f"s{j}"] / n) for j in range(d)]
    mu_lit = long_array_lit(mu)
    x = q.select(F.zip_with("q", mu_lit, lambda a, b: a - b).alias("x"))

    vs: list[list[int]] = []
    for k in range(r):
        v = _power_iterate(x, d, iters)
        vs.append(v)
        if k < r - 1:
            u = unit_scale(v)  # deflation needs the L2-1e6 scale
            x = x.withColumn("__p", proj_expr("x", u)).select(
                pca_deflate_expr("x", "__p", u).alias("x")
            )
    return mu, vs


def encode_frozen(
    df: DataFrame,
    cents: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-side frozen-cell encode: quantize, self-dot, nearest FROZEN
    centroid — no shuffle, no retrain. This is the delta half of the
    incremental-index contract (encode(base ∪ delta) == encode(base) ∪
    encode(delta), see ``ivf_pq_upsert``): because the codebook is a
    literal, a new snapshot encodes with zero reads of the old corpus.
    Returns (id, q, qq, cluster)."""
    q = df.select(
        F.col(id_col), quantize_vec(F.col(vec_col)).alias("q")
    ).withColumn("qq", dot_self(F.col("q")))
    return assign_clusters(q, cents).drop("dist_q")


def dup_dominated(
    new_enc: DataFrame,
    other_enc: DataFrame,
    id_col: str = "vec_id",
    n_salt: int = 0,
) -> DataFrame:
    """IDs of ``new_enc`` rows semantically dominated by a LOWER-id row
    of ``other_enc`` in the same frozen cell — the SemDeDup greedy
    keep-lowest-id drop test, composable across snapshots because the
    policy is non-recursive (x drops iff ANY lower-id cell-mate sits
    within the threshold, whether or not that mate was itself dropped).

    Both inputs carry (id, q, qq, cluster) from :func:`encode_frozen`.
    The cosine test cos ≥ 0.35 is exact-integer cross-multiplication
    (400·dot² ≥ 49·|a|²·|b|², dot > 0) in DECIMAL(38,0) — no floats,
    so streaming and batch evaluations agree bit-for-bit. The join is
    cell-keyed equi (never all-pairs); per-cell size is controlled by
    k, and a hot cell is AQE skew-split like any other skewed key.
    Returns a distinct (id) relation.

    ``n_salt > 0`` splits every cell into ``n_salt`` deterministic
    sub-keys: the ``other`` side gets ONE salt (``pmod(id, n_salt)``),
    the ``new`` side is replicated across all of them, so each pair
    still meets exactly once. Two effects, both aimed at the per-pair
    dot product being this operator's real cost: hot cells split
    ``n_salt`` ways regardless of AQE's byte-based skew view (bytes
    under-price a pair join whose cost is per-ROW arithmetic), and the
    explicit ``repartition(shuffle.partitions, keys)`` pins the pair
    evaluation to the configured shuffle width — AQE's coalescer would
    otherwise fold a small-byte/large-CPU shuffle onto a couple of
    cores (measured 4.6 s → ~1 s at sf0.1 on the frozen-keep corpus).
    Replication multiplies the NEW side only — the batch/delta side,
    small by construction in every incremental caller."""
    left = new_enc.select(
        "cluster",
        F.col(id_col).alias("__id_n"),
        F.col("q").alias("__q_n"),
        F.col("qq").alias("__qq_n"),
    )
    right = other_enc.select(
        F.col("cluster").alias("__cl_o"),
        F.col(id_col).alias("__id_o"),
        F.col("q").alias("__q_o"),
        F.col("qq").alias("__qq_o"),
    )
    if n_salt > 0:
        npart = int(
            new_enc.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        left = left.withColumn(
            "__s", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        ).repartition(npart, "cluster", "__s")
        right = right.withColumn(
            "__s_o", F.pmod(F.col("__id_o"), F.lit(n_salt)).cast("int")
        ).repartition(npart, "__cl_o", "__s_o")
        p = left.join(
            right,
            (F.col("cluster") == F.col("__cl_o"))
            & (F.col("__s") == F.col("__s_o")),
        ).where(F.col("__id_o") < F.col("__id_n"))
    else:
        p = left.join(right, F.col("cluster") == F.col("__cl_o")).where(
            F.col("__id_o") < F.col("__id_n")
        )
    dot = F.aggregate(
        F.zip_with("__q_n", "__q_o", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.withColumn("__dot", dot)
    d19 = F.col("__dot").cast("decimal(19,0)")
    lhs = d19 * d19 * F.lit(400)
    rhs = (
        F.col("__qq_n").cast("decimal(19,0)")
        * F.col("__qq_o").cast("decimal(19,0)")
        * F.lit(49)
    )
    return (
        p.where((F.col("__dot") > 0) & (lhs >= rhs))
        .select(F.col("__id_n").alias(id_col))
        .distinct()
    )


def drift_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
    component: int = 0,
) -> tuple[list[int], list[int]]:
    """Fit the frozen drift-monitor artifact: (mu, v) — the integer
    corpus mean (k-means floor semantics) and a principal direction,
    both exact integers. ``component=0`` is the top direction
    (:func:`pca_power_top`); ``component=k`` monitors PC(k+1) via the
    :func:`pca_power_topr` deflation — a monitor on PC2 catches shifts
    the dominant common direction masks. Driver traffic is 2·d
    scalars; this is the periodic batch job that re-freezes the
    reference, not a streaming concern."""
    mu, vs = pca_power_topr(
        df, vec_col=vec_col, id_col=id_col, r=component + 1, iters=iters
    )
    return mu, vs[component]


def drift_projection(
    df: DataFrame,
    mu: list[int],
    v: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-side projection onto the frozen top-PC artifact: quantize,
    center by the mu literal, fold the dot with the v literal in-row,
    rescale by floor(·/1e6) — (id, p BIGINT), no join, no shuffle.
    Exact-integer throughout, so batch and stream evaluations agree
    bit-for-bit (the embedding_drift_buckets oracle recipe)."""
    mu_lit = long_array_lit(mu)
    v_lit = long_array_lit(v)
    q = df.select(F.col(id_col), quantize_vec(F.col(vec_col)).alias("q"))
    x = q.select(
        id_col, F.zip_with("q", mu_lit, lambda a, b: a - b).alias("x")
    )
    dot = F.aggregate(
        F.zip_with("x", v_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    p = F.floor(dot.cast("double") / F.lit(1000000.0)).cast("long")
    return x.select(id_col, p.alias("p"))
