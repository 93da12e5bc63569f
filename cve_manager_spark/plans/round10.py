"""Round-10 tranche: n-gram LM surprisal scoring (the quality dial the
r8 verdict queued next to the linear classifier), cross-snapshot
incremental semantic dedup (SemDeDup composed with the frozen-cell
delta-assignment shape from ivf_delta_assignments), the applied
"all-but-the-top" PCA residual face, quality-weighted importance
sampling, and distribution/calibration diagnostics (Zipf band slope,
trigram novelty, eval-overlap scoring, surprisal × quality/dup
interactions).

Determinism backbone — **integer log2 via binary length**: for y ≥ 1,
``floor(log2(y)) = length(bin(y)) - 1`` in BOTH engines (Spark ``bin``
and DuckDB ``bin`` emit the minimal binary string), so token surprisal
in whole bits, ``floor(log2(T / c)) = length(bin(T div c)) - 1``, is
pure integer arithmetic — no IEEE ``log`` anywhere, which is what makes
an LM-perplexity-proxy score hash-identical across engines and
partitionings. Everything else follows the repo recipes: ppm/milli
shares via ``div``, DECIMAL(38,0) folds where a BIGINT sum could wrap,
md5 hex-digit buckets for sampling, exact integer cosine thresholds by
cross-multiplication, and truncation-toward-zero division (Spark
``div`` == DuckDB ``//``) whenever a dividend can be negative.

100 TB shapes: surprisal is two token-keyed shuffles (instances ⋈ counts)
+ a doc-grain aggregate; the bigram LM adds one pair-keyed join; the
incremental SemDeDup joins ONLY delta×base within frozen cells (never
all-pairs, never a retrain); Zipf fits run on ≤40 log2 bands per source
(the histogram-not-sort discipline); importance sampling is a pure
narrow projection.
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
    priority: int = 2,
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


# ---------------------------------------------------------------------------
# unigram LM surprisal — the perplexity-proxy quality dial
# ---------------------------------------------------------------------------

# Shared CTE: per-doc mean unigram surprisal in millibits/token.
# Token surprisal = floor(log2(T / c)) whole bits where T = corpus token
# instances, c = the token's corpus count (T div c >= 1 always).
_SURP_CTE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), inst AS (
  SELECT doc_id, source, unnest(w) AS tok FROM toks
), wc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM inst GROUP BY tok
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM inst
), bits AS (
  SELECT i.doc_id, i.source,
         CAST(length(bin((SELECT t FROM tt) // wc.c)) - 1 AS BIGINT) AS b
  FROM inst i JOIN wc USING (tok)
), sc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS millibits
  FROM bits GROUP BY doc_id, source
)
"""


def _doc_surprisal(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tok, millibits) — per-doc mean unigram
    surprisal in millibits/token, exact integers end to end. Two
    token-keyed shuffles (count + instance join) and one doc-grain
    aggregate; the corpus-total rides a broadcast 1-row cross join."""
    from cve_manager_spark.operators.text import words

    toks = docs.select(
        "doc_id", "source", words(F.lower(F.col("text"))).alias("w")
    )
    inst = toks.select("doc_id", "source", F.explode("w").alias("tok"))
    wc = inst.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tt = inst.groupBy().agg(F.count(F.lit(1)).alias("t"))
    bits = (
        inst.join(wc, "tok")
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            "source",
            (F.length(F.bin(F.expr("t div c"))) - 1).cast("bigint").alias("b"),
        )
    )
    return bits.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.expr("CAST(sum(b) * 1000 div count(1) AS BIGINT)").alias("millibits"),
    )


@_register(
    "unigram_surprisal_bands",
    _SURP_CTE
    + """
SELECT source, CAST(millibits // 100 AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sc GROUP BY source, band
""",
    doc="Per-source histogram of per-doc mean unigram surprisal "
    "(0.1-bit bands of millibits/token) — the n-gram-LM perplexity-proxy "
    "quality profile next to the linear classifier: low-surprisal "
    "bands are repetitive/boilerplate-heavy sources, high bands are "
    "rare-token/noise-heavy ones. Surprisal is integer log2 via "
    "binary-string length (floor(log2(T div c)) = length(bin(..))-1), "
    "so the whole dial is exact integers: two token-keyed shuffles + "
    "one doc aggregate, the corpus total a broadcast scalar.",
)
def unigram_surprisal_bands(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    sc = _doc_surprisal(docs)
    return sc.select(
        "source", F.expr("CAST(millibits div 100 AS BIGINT)").alias("band")
    ).groupBy("source", "band").agg(F.count(F.lit(1)).alias("n_docs"))


_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
           i -> struct_pack(b1 := w[i], b2 := w[i+1]))) AS u
  FROM toks WHERE len(w) >= 2
), i2 AS (
  SELECT doc_id, u.b1 AS b1, u.b2 AS b2 FROM bg
), c2 AS (
  SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c FROM i2 GROUP BY b1, b2
), c1 AS (
  SELECT b1, CAST(SUM(c) AS BIGINT) AS cp FROM c2 GROUP BY b1
), bb AS (
  SELECT i2.doc_id,
         CAST(length(bin(c1.cp // c2.c)) - 1 AS BIGINT) AS b
  FROM i2 JOIN c2 USING (b1, b2) JOIN c1 USING (b1)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS ppl_millibits
FROM bb GROUP BY doc_id
"""


@_register(
    "bigram_surprisal_score",
    _BIGRAM_ORACLE,
    doc="Per-doc mean CONDITIONAL bigram surprisal in millibits/bigram — "
    "a true 2-gram LM perplexity proxy: surprisal of (w1,w2) is "
    "floor(log2(c(w1·) div c(w1,w2))) whole bits against the corpus "
    "bigram LM, integer-exact via binary length. The prefix count "
    "c(w1·) reaggregates from the bigram counts (never a second corpus "
    "pass); bigrams are built IN-ROW (indexed transform over the token "
    "array, no self-join), so the plan is one pair-keyed count + one "
    "instance join + a doc aggregate.",
)
def bigram_surprisal_score(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    pairs = F.transform(
        F.slice(F.col("w"), 1, F.size("w") - 1),
        lambda x, i: F.struct(
            x.alias("b1"),
            F.element_at(F.col("w"), i + F.lit(2)).alias("b2"),
        ),
    )
    i2 = (
        toks.where(F.size("w") >= 2)
        .select("doc_id", F.explode(pairs).alias("u"))
        .select("doc_id", F.col("u.b1").alias("b1"), F.col("u.b2").alias("b2"))
    )
    c2 = i2.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("b1").agg(F.sum("c").alias("cp"))
    bb = (
        i2.join(c2, ["b1", "b2"])
        .join(c1, "b1")
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("cp div c"))) - 1).cast("bigint").alias("b"),
        )
    )
    return bb.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("CAST(sum(b) * 1000 div count(1) AS BIGINT)").alias(
            "ppl_millibits"
        ),
    )


def _surprisal_quality_oracle() -> str:
    from cve_manager_spark.plans.corpus import (
        _QUALITY_EXPR_SQL,
        _QUALITY_SCORE_SQL,
    )

    return (
        _SURP_CTE
        + ", f AS ("
        + _QUALITY_EXPR_SQL
        + "), qs AS ("
        + _QUALITY_SCORE_SQL
        + """
), ql AS (
  SELECT doc_id,
         CASE WHEN score >= 600000 THEN 'high'
              WHEN score >= 300000 THEN 'mid'
              ELSE 'low' END AS label
  FROM qs
)
SELECT CAST(sc.millibits // 100 AS BIGINT) AS band, ql.label,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sc JOIN ql USING (doc_id)
GROUP BY band, ql.label
"""
    )


@_register(
    "surprisal_quality_matrix",
    _surprisal_quality_oracle(),
    doc="Co-occurrence of the LM surprisal band × the linear quality-"
    "classifier label — the calibration check run before wiring either "
    "dial into a filter: if 'high'-quality docs concentrate in the "
    "same surprisal bands as 'low', the two signals are independent "
    "and compose; if they collapse onto a diagonal, one is redundant. "
    "Both sides are exact integers; the join is doc-keyed.",
)
def surprisal_quality_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.corpus import _quality_scored

    docs = fan_out(load_table(spark, sf, "documents"))
    sc = _doc_surprisal(docs).select(
        "doc_id", F.expr("CAST(millibits div 100 AS BIGINT)").alias("band")
    )
    ql = _quality_scored(docs).select("doc_id", "label")
    return sc.join(ql, "doc_id").groupBy("band", "label").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@_register(
    "perplexity_filter_rate",
    _SURP_CTE
    + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN millibits <= 4030 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(SUM(CASE WHEN millibits <= 4030 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS pass_ppm
FROM sc GROUP BY source
""",
    doc="The filter face of the surprisal dial: per source, how many "
    "docs pass a mean-surprisal threshold (the 'drop the high-"
    "perplexity tail' cut a perplexity filter applies), as count + "
    "exact ppm. The 4030-millibit threshold sits at the test corpus's "
    "median so both branches carry real counts (a production cut is "
    "picked off the unigram_surprisal_bands histogram the same way). "
    "Reads the same integer surprisal pipeline; the threshold "
    "compares millibits, so no rounding ambiguity.",
)
def perplexity_filter_rate(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    sc = _doc_surprisal(docs)
    passed = F.when(F.col("millibits") <= 4030, 1).otherwise(0)
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(passed).cast("bigint").alias("n_pass"),
        F.expr(
            "CAST(sum(CASE WHEN millibits <= 4030 THEN 1 ELSE 0 END) "
            "* 1000000 div count(1) AS BIGINT)"
        ).alias("pass_ppm"),
    )


@_register(
    "surprisal_contamination_interaction",
    _SURP_CTE
    + """
, ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
           i -> array_to_string(w[i:i+2], ' '))) AS s
  FROM toks WHERE len(w) >= 3
), ev AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0
), ov AS (
  SELECT e.doc_id,
         MAX(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS hit
  FROM ex e LEFT JOIN ev ON e.s = ev.s
  WHERE e.doc_id % 97 <> 0
  GROUP BY e.doc_id
)
SELECT CAST(ov.hit AS INTEGER) AS is_contaminated,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sc.millibits) AS BIGINT) AS sum_millibits,
       CAST(SUM(sc.millibits) // COUNT(*) AS BIGINT) AS mean_millibits
FROM sc JOIN ov USING (doc_id)
GROUP BY is_contaminated
""",
    doc="Does eval-set contamination correlate with LM surprisal? Mean "
    "surprisal of training docs sharing at least one 3-gram shingle "
    "with the held-out set vs clean docs — contaminated text is "
    "usually templated/low-surprisal, which is why decontamination "
    "and perplexity filtering remove OVERLAPPING but not identical "
    "doc sets (running only one under-cleans). Composition face: the "
    "broadcast eval probe from eval_overlap_score joined doc-grain "
    "onto the surprisal relation, two exact-integer aggregates.",
)
def surprisal_contamination_interaction(
    spark: SparkSession, sf: str
) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    sc = _doc_surprisal(docs)
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    grams = F.transform(
        F.slice(F.col("w"), 1, F.size("w") - 2),
        lambda x, i: F.concat_ws(" ", F.slice(F.col("w"), i + F.lit(1), 3)),
    )
    ex = toks.where(F.size("w") >= 3).select(
        "doc_id", F.explode(grams).alias("s")
    )
    ev = (
        ex.where(F.col("doc_id") % 97 == 0)
        .select("s")
        .distinct()
        .withColumn("is_ev", F.lit(1))
    )
    ov = (
        ex.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "s", "left")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce("is_ev", F.lit(0))).alias("hit"))
    )
    # INT flag, not boolean: no green spec has ever emitted a boolean
    # column through the driver canonicalizer (the r6 array-cell lesson —
    # don't make a staged tranche the first to probe it)
    return (
        sc.join(ov, "doc_id")
        .groupBy(F.col("hit").cast("int").alias("is_contaminated"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("millibits").cast("bigint").alias("sum_millibits"),
            F.expr("CAST(sum(millibits) div count(1) AS BIGINT)").alias(
                "mean_millibits"
            ),
        )
    )


# ---------------------------------------------------------------------------
# cross-snapshot (incremental) semantic dedup — SemDeDup without retrain
# ---------------------------------------------------------------------------


def _incr_semantic_cte() -> str:
    """Rescoped k-means unroll (base = vec_id %% 5 <> 4, k=8) + delta
    assignment against the FROZEN final centroids — the
    _ivf_delta_oracle composition, kept with q available for pair
    cosines."""
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    cte = _KMEANS_CTE
    assert cte.count("FROM embeddings") == 1
    cte = cte.replace("FROM embeddings", "FROM embeddings WHERE vec_id % 5 <> 4")
    return cte + """
, ed AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id % 5 = 4
), dd AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
            - 2 * list_dot_product(CAST(q AS DOUBLE[]), CAST(c AS DOUBLE[]))
            + list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS BIGINT)
           AS dist
  FROM ed CROSS JOIN c2
), ad AS (
  SELECT vec_id, q, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dd) WHERE rn = 1
)
"""


def _incr_dup_oracle() -> str:
    return _incr_semantic_cte() + """
, bn AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS qq
  FROM a2
), dn AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS qq
  FROM ad
), pr AS (
  SELECT dn.vec_id AS vec_new, bn.vec_id AS vec_old,
         CAST(list_dot_product(CAST(dn.q AS DOUBLE[]), CAST(bn.q AS DOUBLE[]))
              AS BIGINT) AS dot_q,
         dn.qq AS na, bn.qq AS nb
  FROM dn JOIN bn ON dn.cid = bn.cid
), dup AS (
  SELECT vec_new, vec_old, dot_q FROM pr
  WHERE dot_q > 0
    AND CAST(dot_q AS HUGEINT) * dot_q * 400
        >= CAST(na AS HUGEINT) * nb * 49
), rk AS (
  SELECT vec_new, vec_old, dot_q,
         ROW_NUMBER() OVER (PARTITION BY vec_new
                            ORDER BY dot_q DESC, vec_old) AS rn,
         COUNT(*) OVER (PARTITION BY vec_new) AS n
  FROM dup
)
SELECT vec_new, CAST(n AS BIGINT) AS n_dup_base,
       vec_old AS best_old, dot_q AS best_dot
FROM rk WHERE rn = 1
"""


def _incr_assignments(spark: SparkSession, sf: str):
    """Shared Spark half: frozen-cell base + delta assignments, each as
    (vec_id, q, qq, cluster). Training sees ONLY the base snapshot; the
    delta pass is map-side against centroid literals (no join, no
    shuffle, no retrain) — encode(base ∪ delta) == encode(base) ∪
    encode(delta), the ivf_pq_upsert contract."""
    from cve_manager_spark.operators.semantic import (
        assign_clusters,
        dot_self,
        kmeans_fit,
        quantize_vec,
    )

    from cve_manager_spark.plans.artifacts import frozen

    emb = load_table(spark, sf, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 4)
    delta = emb.where(F.col("vec_id") % 5 == 4)
    # frozen base-trained codebook (the contract: the codebook never
    # sees the delta and is NOT retrained per query) — trained once per
    # (sf, recipe) and shared across the incremental-dedup spec family
    cents = frozen(
        ("incr_codebook", sf, "embeddings", 8, 2),
        lambda: kmeans_fit(
            base, vec_col="embedding", id_col="vec_id", k=8, iters=2
        )[1],
    )

    def prep(side: DataFrame) -> DataFrame:
        q = side.select(
            "vec_id", quantize_vec(F.col("embedding")).alias("q")
        ).withColumn("qq", dot_self(F.col("q")))
        return assign_clusters(q, cents)

    return prep(base), prep(delta), len(cents)


@_register(
    "semantic_dedup_incremental",
    _incr_dup_oracle(),
    doc="Cross-snapshot SemDeDup: which NEW-snapshot embeddings "
    "(vec_id %% 5 == 4) semantically duplicate the EXISTING corpus, "
    "WITHOUT retraining — k-means cells are fit on the base snapshot "
    "only (k=8, 2 Lloyd iterations), the delta assigns map-side "
    "against the frozen centroids (the ivf_pq_upsert delta-encode "
    "shape), and candidate pairs are delta x base WITHIN a cell only, "
    "kept at exact integer cosine >= 0.35 by cross-multiplication "
    "(dot^2*400 >= |a|^2|b|^2*49, dot > 0). Emits per new vec its "
    "base-duplicate count and the best (highest-dot, lowest-id) base "
    "match — the nightly-ingest dedup gate at 100 TB: one frozen-"
    "meta encode pass + one cell-bucketed join, never all-pairs, "
    "never a retrain.",
)
def semantic_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    ab, ad, _ = _incr_assignments(spark, sf)
    # deterministic cell-salt, same rationale as dup_dominated(n_salt=):
    # the delta side replicates (small by construction), the base side
    # takes pmod(id) — each pair meets once, hot cells split 16 ways,
    # and the explicit repartition pins the per-pair cosine arithmetic
    # to the shuffle width instead of AQE's byte-coalesced 1-2 tasks
    n_salt = 16
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    left = ad.select(
        F.col("cluster"),
        F.col("vec_id").alias("vec_new"),
        F.col("q").alias("qa"),
        F.col("qq").alias("na"),
    ).withColumn(
        "__s", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).repartition(npart, "cluster", "__s")
    right = ab.select(
        F.col("cluster").alias("cluster_b"),
        F.col("vec_id").alias("vec_old"),
        F.col("q").alias("qb"),
        F.col("qq").alias("nb"),
    ).withColumn(
        "__s_o", F.pmod(F.col("vec_old"), F.lit(n_salt)).cast("int")
    ).repartition(npart, "cluster_b", "__s_o")
    p = left.join(
        right,
        (F.col("cluster") == F.col("cluster_b"))
        & (F.col("__s") == F.col("__s_o")),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.withColumn("dot_q", dot)
    d19 = F.col("dot_q").cast("decimal(19,0)")
    lhs = d19 * d19 * F.lit(400)
    rhs = (
        F.col("na").cast("decimal(19,0)")
        * F.col("nb").cast("decimal(19,0)")
        * F.lit(49)
    )
    dup = p.where((F.col("dot_q") > 0) & (lhs >= rhs))
    best = F.max(F.struct(F.col("dot_q"), (-F.col("vec_old")).alias("neg")))
    return (
        dup.groupBy("vec_new")
        .agg(F.count(F.lit(1)).alias("n_dup_base"), best.alias("b"))
        .select(
            "vec_new",
            "n_dup_base",
            (-F.col("b.neg")).cast("bigint").alias("best_old"),
            F.col("b.dot_q").alias("best_dot"),
        )
    )


@_register(
    "semantic_cell_drift",
    _incr_semantic_cte() + """
SELECT CAST(c2.cid AS INTEGER) AS list_id,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_base,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_delta,
       CAST(CASE WHEN COALESCE(b.n, 0) + COALESCE(d.n, 0) = 0 THEN 0
            ELSE COALESCE(d.n, 0) * 1000000
                 // (COALESCE(b.n, 0) + COALESCE(d.n, 0)) END AS BIGINT)
         AS delta_ppm
FROM c2
LEFT JOIN (SELECT cid, COUNT(*) AS n FROM a2 GROUP BY cid) b ON c2.cid = b.cid
LEFT JOIN (SELECT cid, COUNT(*) AS n FROM ad GROUP BY cid) d ON c2.cid = d.cid
""",
    doc="Distribution-drift monitor for the frozen-cell incremental "
    "index: per cell, base-snapshot vs delta-snapshot member counts "
    "and the delta share in ppm. A cell whose delta_ppm is far above "
    "the global delta fraction is where the new data's geometry "
    "drifts from the training corpus — the retrain trigger the "
    "upsert-between-rebuilds trade relies on. Two cell-keyed "
    "aggregates over assignments already computed map-side; the "
    "k-row spine comes from the centroid list itself.",
)
def semantic_cell_drift(spark: SparkSession, sf: str) -> DataFrame:
    ab, ad, k = _incr_assignments(spark, sf)
    spine = spark.range(0, k).select(F.col("id").cast("int").alias("list_id"))
    nb = ab.groupBy(F.col("cluster").alias("list_id")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    nd = ad.groupBy(F.col("cluster").alias("list_id")).agg(
        F.count(F.lit(1)).alias("n_d")
    )
    j = (
        spine.join(nb, "list_id", "left")
        .join(nd, "list_id", "left")
        .select(
            "list_id",
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_base"),
            F.coalesce("n_d", F.lit(0)).cast("bigint").alias("n_delta"),
        )
    )
    return j.withColumn(
        "delta_ppm",
        F.expr(
            "CAST(CASE WHEN n_base + n_delta = 0 THEN 0 "
            "ELSE n_delta * 1000000 div (n_base + n_delta) END AS BIGINT)"
        ),
    )


# ---------------------------------------------------------------------------
# applied PCA: residual norms after removing the top direction
# ---------------------------------------------------------------------------


def _pca_residual_oracle() -> str:
    from cve_manager_spark.plans.semantic import _PCA_CTE

    return _PCA_CTE + """
, proj AS (
  SELECT x.vec_id,
         CAST(FLOOR(CAST(SUM(x.xv * v2.v) AS DOUBLE) / 1000000) AS BIGINT)
           AS p
  FROM x JOIN v2 USING (pos) GROUP BY x.vec_id
), rx AS (
  SELECT x.vec_id, x.xv,
         (x.xv * 1000000 - proj.p * v2.v) // 1000000 AS rd
  FROM x JOIN v2 USING (pos) JOIN proj USING (vec_id)
), pv AS (
  SELECT vec_id, CAST(SUM(xv * xv) AS BIGINT) AS x2,
         CAST(SUM(rd * rd) AS BIGINT) AS r2
  FROM rx GROUP BY vec_id
)
SELECT e2.label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(pv.x2) AS DECIMAL(38,0)) AS DOUBLE) AS sum_x2,
       CAST(CAST(SUM(pv.r2) AS DECIMAL(38,0)) AS DOUBLE) AS sum_r2
FROM pv JOIN embeddings e2 ON pv.vec_id = e2.vec_id
GROUP BY e2.label
"""


@_register(
    "pca_residual_norms",
    _pca_residual_oracle(),
    doc="'All-but-the-top' APPLIED: per label, the exact squared norm "
    "of each centered embedding before (sum_x2) and after (sum_r2) "
    "removing its projection on the corpus top principal direction — "
    "the variance-explained audit that decides whether common-"
    "direction removal is worth a corpus rewrite. Residuals stay "
    "integer: r_j = x_j*1e6 - p*v_j (|r| <= 1.3e14, BIGINT), scaled "
    "back by truncation-toward-zero division (Spark div == DuckDB //, "
    "both -7/2 -> -3), squared in-row (<= 1.1e18, BIGINT), folded "
    "cross-row as DECIMAL(38,0) (exact through ~1e21 rows), and "
    "emitted via one final double cast (the dec_sum convention — both "
    "engines correctly round the same exact decimal). One extra "
    "corpus pass over the power-iteration pipeline.",
)
def pca_residual_norms(spark: SparkSession, sf: str) -> DataFrame:
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

    q = emb.select("vec_id", "label", quantize_vec(F.col("embedding")).alias("q"))
    sums = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("q", j + 1)).alias(f"s{j}") for j in range(len(v))],
    ).head()
    n = sums["n"]
    mu = [math.floor(sums[f"s{j}"] / n) for j in range(len(v))]
    mu_lit = F.array(*[F.lit(int(m)).cast("long") for m in mu])
    v_lit = F.array(*[F.lit(int(vj)).cast("long") for vj in v])
    x = q.select(
        "vec_id", "label", F.zip_with("q", mu_lit, lambda a, b: a - b).alias("x")
    )
    dot = F.aggregate(
        F.zip_with("x", v_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    p = F.floor(dot.cast("double") / F.lit(1000000.0)).cast("long")
    xx = x.withColumn("p", p)
    x2 = F.aggregate(
        F.col("x"), F.lit(0).cast("long"), lambda acc, e: acc + e * e
    )

    def rd(a, b):
        # truncation-toward-zero div by 1e6: (val - val % 1e6) is an exact
        # multiple of 1e6 (Java % has the dividend's sign), so the double
        # quotient is exact and matches DuckDB's truncating //
        val = a * F.lit(1000000) - F.col("p") * b
        return (
            (val - val % F.lit(1000000)).cast("double") / F.lit(1000000.0)
        ).cast("long")

    r2 = F.aggregate(
        F.zip_with("x", v_lit, rd),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e * e,
    )
    per = xx.select("label", x2.alias("x2"), r2.alias("r2"))
    # DECIMAL(38,0) fold (exact through ~1e21 rows), one final double cast
    # out — the dec_sum emission convention shared with the money specs
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x2").cast("decimal(38,0)")).cast("double").alias("sum_x2"),
        F.sum(F.col("r2").cast("decimal(38,0)")).cast("double").alias("sum_r2"),
    )


# ---------------------------------------------------------------------------
# quality-weighted importance sampling
# ---------------------------------------------------------------------------


def _importance_oracle() -> str:
    from cve_manager_spark.plans.corpus import (
        _QUALITY_EXPR_SQL,
        _QUALITY_SCORE_SQL,
    )
    from cve_manager_spark.plans.corpus import _BUCKET_DUCK

    return (
        "WITH f AS ("
        + _QUALITY_EXPR_SQL
        + "), qs AS ("
        + _QUALITY_SCORE_SQL
        + f"""
), ql AS (
  SELECT doc_id, source,
         CASE WHEN score >= 600000 THEN 'high'
              WHEN score >= 300000 THEN 'mid'
              ELSE 'low' END AS label,
         ({_BUCKET_DUCK}) AS bucket
  FROM qs
), kp AS (
  SELECT *, CASE label WHEN 'high' THEN 256 WHEN 'mid' THEN 128
                       ELSE 32 END AS keep_256
  FROM ql
)
SELECT source, label, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN bucket < keep_256 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN bucket < keep_256 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS kept_ppm
FROM kp GROUP BY source, label
"""
    )


@_register(
    "quality_importance_sample",
    _importance_oracle(),
    doc="Deterministic quality-weighted importance sampling (the DoReMi/"
    "quality-resampling shape): per quality label a fixed keep rate "
    "(high keeps all 256/256 hash buckets, mid 128, low 32), applied "
    "by the shared md5 hex-digit bucket of doc_id — so the SAMPLE is "
    "a pure row predicate, reproducible across engines, reruns and "
    "partitionings, and composable with the split assigner (different "
    "digest positions). Emits per (source, label) total/kept/ppm. "
    "Zero shuffles beyond the final small aggregate.",
)
def quality_importance_sample(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.corpus import _quality_scored
    from cve_manager_spark.plans.corpus import _BUCKET_SPARK

    docs = fan_out(load_table(spark, sf, "documents"))
    s = _quality_scored(docs)
    kp = s.select(
        "source",
        "label",
        F.expr(_BUCKET_SPARK).alias("bucket"),
        F.when(F.col("label") == "high", 256)
        .when(F.col("label") == "mid", 128)
        .otherwise(32)
        .alias("keep_256"),
    )
    kept = F.when(F.col("bucket") < F.col("keep_256"), 1).otherwise(0)
    return kp.groupBy("source", "label").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.expr(
            "CAST(sum(CASE WHEN bucket < keep_256 THEN 1 ELSE 0 END) "
            "* 1000000 div count(1) AS BIGINT)"
        ).alias("kept_ppm"),
    )


# ---------------------------------------------------------------------------
# distribution diagnostics: Zipf band slope, trigram novelty
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), inst AS (
  SELECT source, unnest(w) AS tok FROM toks
), wc AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM inst GROUP BY source, tok
), bands AS (
  SELECT source, CAST(length(bin(c)) - 1 AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM wc GROUP BY source, x
), pts AS (
  SELECT source, x, CAST(length(bin(m)) - 1 AS BIGINT) AS y FROM bands
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY source
)
SELECT source, n AS n_bands,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
            ELSE (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) END
            AS BIGINT) AS slope_milli
FROM s
"""


@_register(
    "zipf_band_slope_by_source",
    _ZIPF_ORACLE,
    doc="Zipf power-law exponent per source, estimated WITHOUT a global "
    "rank sort: bucket the word-frequency table by floor(log2(count)) "
    "(binary length — exact integers), take y = floor(log2(#words in "
    "band)), and fit the OLS slope over the <= ~40 (x, y) band points "
    "in exact integer arithmetic, emitted as a trunc-div milli-slope. "
    "A natural corpus sits near slope -1; a flat or bimodal profile "
    "flags templated/synthetic text. The expensive step is ONE "
    "(source, word)-keyed count; the fit itself touches only band "
    "rows — the histogram-not-sort discipline (quality_score_deciles) "
    "applied to vocabulary statistics.",
)
def zipf_band_slope_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    inst = docs.select(
        "source", F.explode(words(F.lower(F.col("text")))).alias("tok")
    )
    wc = inst.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    bands = wc.select(
        "source", (F.length(F.bin("c")) - 1).cast("bigint").alias("x")
    ).groupBy("source", "x").agg(F.count(F.lit(1)).alias("m"))
    pts = bands.select(
        "source", "x", (F.length(F.bin("m")) - 1).cast("bigint").alias("y")
    )
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_bands"),
        F.expr(
            "CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0 "
            "ELSE (n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx) END "
            "AS BIGINT)"
        ).alias("slope_milli"),
    )


_TRIGRAM_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), tri AS (
  SELECT DISTINCT source,
         md5(unnest(list_transform(range(1, len(w) - 1),
           i -> array_to_string(w[i:i+2], ' ')))) AS g
  FROM toks WHERE len(w) >= 3
), gc AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ns FROM tri GROUP BY g
)
SELECT tri.source, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN gc.ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN gc.ns = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS unique_ppm
FROM tri JOIN gc USING (g)
GROUP BY tri.source
"""


@_register(
    "trigram_novelty_by_source",
    _TRIGRAM_NOVELTY_ORACLE,
    doc="Per source: how much of its distinct trigram vocabulary appears "
    "in NO other source — the uniqueness/contamination diagnostic "
    "(near-1 ppm = genuinely novel text, low ppm = the source restates "
    "the rest of the corpus and near-dup passes will collapse it). "
    "Trigrams travel as md5 digests so the shuffle key is fixed-width "
    "(16 bytes, never a long n-gram string); one digest-keyed "
    "source-count + one join back — the same two-aggregate shape as "
    "split_dup_leakage at trigram grain.",
)
def trigram_novelty_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("source", words(F.lower(F.col("text"))).alias("w"))
    grams = F.transform(
        F.slice(F.col("w"), 1, F.size("w") - 2),
        lambda x, i: F.concat_ws(" ", F.slice(F.col("w"), i + F.lit(1), 3)),
    )
    tri = (
        toks.where(F.size("w") >= 3)
        .select("source", F.explode(grams).alias("s"))
        .select("source", F.md5("s").alias("g"))
        .distinct()
    )
    gc = tri.groupBy("g").agg(F.count(F.lit(1)).alias("ns"))
    uniq = F.when(F.col("ns") == 1, 1).otherwise(0)
    return tri.join(gc, "g").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum(uniq).cast("bigint").alias("n_unique"),
        F.expr(
            "CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000 "
            "div count(1) AS BIGINT)"
        ).alias("unique_ppm"),
    )


# ---------------------------------------------------------------------------
# scored decontamination: per-doc eval-overlap ppm
# ---------------------------------------------------------------------------

_EVAL_OVERLAP_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
           i -> array_to_string(w[i:i+2], ' '))) AS s
  FROM toks WHERE len(w) >= 3
), ev AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0
)
SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS overlap_ppm
FROM ex e LEFT JOIN ev ON e.s = ev.s
WHERE e.doc_id % 97 <> 0
GROUP BY e.doc_id
"""


@_register(
    "eval_overlap_score",
    _EVAL_OVERLAP_ORACLE,
    doc="SCORED decontamination (the graded dial next to the binary "
    "decontaminate_ngram and span-grain decontaminate_spans): per "
    "training doc, the exact fraction (ppm) of its 3-gram positions "
    "whose shingle appears in the held-out set (doc_id %% 97 == 0) — "
    "pipelines drop docs above ~80% overlap but only REDACT spans "
    "below it, so the score, not just the flag, is the operational "
    "signal. Zero-hit docs are kept (LEFT join against the broadcast "
    "eval set); shingles are built in-row, so the plan is one "
    "broadcast probe + a doc-grain aggregate.",
)
def eval_overlap_score(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    grams = F.transform(
        F.slice(F.col("w"), 1, F.size("w") - 2),
        lambda x, i: F.concat_ws(" ", F.slice(F.col("w"), i + F.lit(1), 3)),
    )
    ex = toks.where(F.size("w") >= 3).select(
        "doc_id", F.explode(grams).alias("s")
    )
    ev = (
        ex.where(F.col("doc_id") % 97 == 0)
        .select("s")
        .distinct()
        .withColumn("is_ev", F.lit(1))
    )
    hit = F.coalesce(F.col("is_ev"), F.lit(0))
    return (
        ex.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).cast("bigint").alias("n_hits"),
            F.expr(
                "CAST(sum(coalesce(is_ev, 0)) * 1000000 div count(1) "
                "AS BIGINT)"
            ).alias("overlap_ppm"),
        )
    )
