"""Round-9 tranche: 12 oracle-paired specs staged for the next driver
verification window.

Themes this round: the incremental-index face of ANN maintenance
(``ivf_delta_assignments`` verifies the exact frozen-meta assignment
stage that :func:`operators.similarity.ivf_pq_upsert` applies),
boilerplate/template detection (the RefinedWeb-style line-dedup family
re-grounded on this corpus's word-shingle grain: per-source boilerplate
n-grams, shared-prefix template buckets and their cross-source flow
matrix), language-ID calibration (truth-vs-prediction confusion matrix
over the deterministic marker heuristic), dataloader packing
utilization, behavioral drift (integer CUSUM extremes, Benford
first-digit profile), one more in-row Gopher-style repetition rule
(max single-trigram repetition), and warehouse faces (nation balance
sheet, market-segment × value-band profile, doc-length mass bands).

Determinism recipes per plans/spec.py: integer ppm via BIGINT ``div``,
exact-DECIMAL money sums emitted as one final double cast, explicit
CASE band ladders (never float log2), python-precomputed constant
tables inlined as identical literals in BOTH engines (the Benford
reference ppm), and windows only over bounded aggregates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import dec_sum, fan_out
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    # round-9 tranche arrives while 49 round-8 specs still await their first
    # driver verdict; priority 1 queues these BEHIND every priority-0
    # unverified spec so the overflow is explicit (registry window guard)
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


# ---------------------------------------------------------------------------
# ANN incremental maintenance face
# ---------------------------------------------------------------------------


def _ivf_delta_oracle(n_lists: int) -> str:
    """Machine-parameterized delta-assignment oracle: train the coarse
    quantizer on the BASE corpus only (vec_id % 5 <> 4 — the
    _KMEANS_CTE re-scoped), then assign the held-out DELTA rows against
    the final centroids with the same integer distance and (dist, cid)
    tie-break — exactly what ivf_pq_upsert's encode stage does against
    a frozen sidecar meta."""
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    cte = _KMEANS_CTE.replace("LIMIT 8", f"LIMIT {n_lists}")
    assert cte.count("LIMIT 8") == 0
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
SELECT vec_id, CAST(cid AS INTEGER) AS list_id,
       CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
            AS BIGINT) AS vnorm2
FROM ad
"""


@_register(
    "ivf_delta_assignments",
    _ivf_delta_oracle(16),
    doc="Incremental-index maintenance face: the frozen-meta delta "
    "assignment that operators.similarity.ivf_pq_upsert applies when "
    "growing a persisted IVF×PQ index WITHOUT retraining — train the "
    "coarse quantizer on the base corpus (vec_id %% 5 <> 4, k=16, "
    "2 Lloyd iterations), then run ivf_pq_encode_delta over the "
    "held-out delta against those frozen centroids, emitted as "
    "(vec_id, list_id, vnorm2) and reproduced bit-for-bit by the "
    "re-scoped DuckDB kmeans unroll. The delta pass is map-side "
    "(centroid literals; no join, no shuffle, no retrain) — the 100 TB "
    "nightly-refresh shape where index growth costs one narrow encode "
    "pass plus a sliver-merge.",
)
def ivf_delta_assignments(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import kmeans_fit
    from cve_manager_spark.operators.similarity import ivf_pq_encode_delta

    from cve_manager_spark.plans.artifacts import frozen

    emb = load_table(spark, sf, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 4)
    delta = emb.where(F.col("vec_id") % 5 == 4)
    # frozen coarse quantizer (the spec's own contract: "WITHOUT
    # retraining") — trained once per (sf, recipe), plans/artifacts.py
    cents = frozen(
        ("ivf_coarse", sf, "embeddings", 16, 2),
        lambda: kmeans_fit(
            base, vec_col="embedding", id_col="vec_id", k=16, iters=2
        )[1],
    )
    # books=None: this face verifies the assignment math only, so skip PQ
    # codebook training outright instead of training books whose pq_code
    # output Catalyst would prune anyway (the training collects are eager
    # driver work Catalyst can't elide)
    out = ivf_pq_encode_delta(delta, cents, books=None)
    return out.select("vec_id", "list_id", "vnorm2")


# ---------------------------------------------------------------------------
# boilerplate / template detection
# ---------------------------------------------------------------------------

_BOILER_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> array_to_string(w[i:i+2], ' '))) AS s
  FROM toks WHERE len(w) >= 3
), per_doc_sh AS (
  SELECT doc_id, source, s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM sh GROUP BY doc_id, source, s
), src_docs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM toks WHERE len(w) >= 3 GROUP BY source
), spread AS (
  SELECT source, s, CAST(COUNT(*) AS BIGINT) AS df
  FROM per_doc_sh GROUP BY source, s
), boiler AS (
  SELECT sp.source, sp.s
  FROM spread sp JOIN src_docs sd ON sp.source = sd.source
  WHERE sp.df >= 2 AND sp.df * 10 >= sd.n_docs
)
SELECT p.doc_id, p.source,
       CAST(SUM(p.cnt) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN b.s IS NOT NULL THEN p.cnt ELSE 0 END) AS BIGINT)
         AS n_boiler_pos,
       CAST(SUM(CASE WHEN b.s IS NOT NULL THEN p.cnt ELSE 0 END) * 1000000
            // SUM(p.cnt) AS BIGINT) AS boiler_ppm
FROM per_doc_sh p
LEFT JOIN boiler b ON p.source = b.source AND p.s = b.s
GROUP BY p.doc_id, p.source
"""


@_register(
    "boilerplate_ngrams",
    _BOILER_ORACLE,
    doc="Boilerplate detection, the RefinedWeb line-dedup family on this "
    "corpus's shingle grain: a word 3-gram is BOILERPLATE within its "
    "source when it appears in >= 2 docs AND >= 10%% of the source's "
    "docs (integer df*10 >= n_docs — no float threshold), and each "
    "document reports its boilerplate POSITION mass (occurrences, with "
    "multiplicity) in ppm. Shuffles: one (source, shingle)-keyed "
    "aggregate for df, re-joined to the per-doc shingle counts on the "
    "same key (co-partitioned), plus a broadcast ~20-row per-source "
    "doc-count dim; at 100 TB the boilerplate set is the banded join "
    "key, never a pairwise comparison.",
)
def boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    toks = docs.select("doc_id", "source", w.alias("w")).where(F.size("w") >= 3)
    sh = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), i + 1, 3)
                ),
            )
        ).alias("s"),
    )
    per_doc = sh.groupBy("doc_id", "source", "s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    src_docs = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    spread = per_doc.groupBy("source", "s").agg(F.count(F.lit(1)).alias("df"))
    boiler = (
        spread.join(F.broadcast(src_docs), "source")
        .where((F.col("df") >= 2) & (F.col("df") * 10 >= F.col("n_docs")))
        .select(F.col("source").alias("bsource"), F.col("s").alias("bs"))
    )
    joined = per_doc.join(
        boiler,
        (F.col("source") == F.col("bsource")) & (F.col("s") == F.col("bs")),
        "left",
    ).select("doc_id", "source", "s", "cnt", "bs")
    return joined.groupBy("doc_id", "source").agg(
        F.sum("cnt").cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("bs").isNotNull(), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_boiler_pos"),
        F.expr(
            "sum(CASE WHEN bs IS NOT NULL THEN cnt ELSE 0 END) * 1000000"
            " div sum(cnt)"
        ).alias("boiler_ppm"),
    )


_PREFIX_CTE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), pfx AS (
  SELECT doc_id, source, array_to_string(w[1:1], ' ') AS prefix
  FROM toks WHERE len(w) >= 2
)
"""


@_register(
    "prefix_bucket_sizes",
    _PREFIX_CTE.replace("w[1:1]", "w[1:1]")  # 2-word prefix: see below
    .replace("array_to_string(w[1:1], ' ')", "array_to_string(w[1:2], ' ')")
    + """
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(doc_id) AS BIGINT) AS rep_doc
FROM pfx GROUP BY prefix HAVING COUNT(*) >= 2
""",
    doc="Template-candidate buckets: documents sharing an identical "
    "leading word 2-gram (2 for test-corpus density; production "
    "template detection uses 16+) grouped into buckets of >= 2 docs "
    "with their source spread and lowest-id representative — the "
    "scraped-template / mirror-page detector that runs BEFORE "
    "pairwise near-dup at 100 TB because its key is O(1) per doc and "
    "the bucket join is one exact-key aggregate, no banding needed.",
)
def prefix_bucket_sizes(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    pfx = docs.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice(w, 1, 2)).alias("prefix"),
        F.size(w).alias("nw"),
    ).where(F.col("nw") >= 2)
    return (
        pfx.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("rep_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


@_register(
    "prefix_source_flow",
    _PREFIX_CTE.replace("array_to_string(w[1:1], ' ')", "array_to_string(w[1:2], ' ')")
    + """
, per_src AS (
  SELECT prefix, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM pfx GROUP BY prefix, source
), flows AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
              ELSE a.n * b.n END AS n_pairs
  FROM per_src a JOIN per_src b
    ON a.prefix = b.prefix AND a.source <= b.source
  WHERE a.source < b.source OR (a.source = b.source AND a.n >= 2)
)
SELECT src_a, src_b, CAST(SUM(n_pairs) AS BIGINT) AS n_pairs
FROM flows GROUP BY src_a, src_b
""",
    doc="Cross-source duplication flow matrix over the template-prefix "
    "key: for every bucket of docs sharing a leading 2-gram, pair "
    "counts aggregate to an (src_a <= src_b) flow matrix — within-"
    "source pairs as C(n,2), cross-source as n_a*n_b — the 'which "
    "sources mirror each other' report. The pair counting is "
    "ARITHMETIC over per-(prefix, source) counts (one aggregate + one "
    "equi-self-join on the prefix key); no doc-level pair is ever "
    "materialized, so a viral bucket costs integers, not O(n^2) rows.",
)
def prefix_source_flow(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    pfx = docs.select(
        "source",
        F.concat_ws(" ", F.slice(w, 1, 2)).alias("prefix"),
        F.size(w).alias("nw"),
    ).where(F.col("nw") >= 2)
    per_src = pfx.groupBy("prefix", "source").agg(F.count(F.lit(1)).alias("n"))
    a = per_src.alias("a")
    b = per_src.alias("b")
    flows = (
        a.join(
            b,
            (F.col("a.prefix") == F.col("b.prefix"))
            & (F.col("a.source") <= F.col("b.source")),
        )
        .where(
            (F.col("a.source") < F.col("b.source"))
            | ((F.col("a.source") == F.col("b.source")) & (F.col("a.n") >= 2))
        )
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.when(
                F.col("a.source") == F.col("b.source"),
                # integer halving via shiftright, not /2-with-cast: the float
                # quotient is only exact while n*(n-1) < 2^53 (~9.4e7 docs per
                # prefix) — a viral bucket at scale would diverge from the
                # oracle's //. n*(n-1) >= 0 so the shift IS the exact div 2.
                F.shiftright((F.col("a.n") * (F.col("a.n") - 1)).cast("bigint"), 1),
            )
            .otherwise(F.col("a.n") * F.col("b.n"))
            .alias("n_pairs"),
        )
    )
    return flows.groupBy("src_a", "src_b").agg(
        F.sum("n_pairs").cast("bigint").alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# language-ID calibration
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from cve_manager_spark.plans.pipeline import _LANG_ORACLE

    return f"""
WITH pred AS ({_LANG_ORACLE})
SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) * 1000000 //
            SUM(COUNT(*)) OVER (PARTITION BY d.lang) AS BIGINT) AS row_ppm
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.pred_lang
"""


@_register(
    "langid_confusion",
    _langid_confusion_oracle(),
    doc="Language-ID calibration: confusion matrix of the stored truth "
    "label against the deterministic marker-word heuristic "
    "(operators.text.lang_id — argmax with en>de>fr>es tie-break, "
    "'und' on zero evidence), with each cell's ppm share of its truth "
    "row. The matrix quantifies exactly where the cheap heuristic is "
    "trustworthy (zh has no markers and must land in 'und'/confusions) "
    "— the audit you run before using heuristic lang-id as a 100 TB "
    "routing key. One narrow map pass + a <= 25-cell aggregate; the "
    "share window runs on the aggregate only.",
)
def langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators import text as T

    docs = fan_out(load_table(spark, sf, "documents"))
    pred = T.lang_id(docs)
    agg = pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return agg.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.expr(
            "n_docs * 1000000 div sum(n_docs) over (partition by lang)"
        ).alias("row_ppm"),
    )


# ---------------------------------------------------------------------------
# behavioral drift
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), tot AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(cnt) AS BIGINT) AS total
  FROM daily GROUP BY user_id
), cum AS (
  SELECT d.user_id, t.n_days, t.total,
         SUM(t.n_days * d.cnt) OVER (PARTITION BY d.user_id ORDER BY d.day
                                     ROWS UNBOUNDED PRECEDING)
           - ROW_NUMBER() OVER (PARTITION BY d.user_id ORDER BY d.day) * t.total
           AS cusum
  FROM daily d JOIN tot t ON d.user_id = t.user_id
)
SELECT user_id, MAX(n_days) AS n_days, MAX(total) AS total_events,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum,
       CAST(MIN(cusum) AS BIGINT) AS min_cusum
FROM cum GROUP BY user_id
"""


@_register(
    "events_cusum_extremes",
    _CUSUM_ORACLE,
    doc="Per-user activity drift via integer CUSUM: daily counts minus "
    "the user's lifetime mean, accumulated in day order, with the "
    "whole series scaled by n_days so the running sum is EXACT integer "
    "arithmetic (cusum_k = sum(n_days*cnt_d, d<=k) − k*total — no "
    "float mean anywhere). Large |max|/|min| extremes mark burst and "
    "dormancy regimes; a flat user pins both near 0. Shuffles: the "
    "(user, day) aggregate, a broadcast-sized per-user totals join, "
    "and a per-user day window — the same keys, so AQE coalesces to "
    "one exchange.",
)
def events_cusum_extremes(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    cum = (
        daily.join(tot, "user_id")
        .withColumn(
            "cusum",
            F.sum(F.col("n_days") * F.col("cnt")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.row_number().over(w) * F.col("total"),
        )
    )
    return cum.groupBy("user_id").agg(
        F.max("n_days").alias("n_days"),
        F.max("total").alias("total_events"),
        F.max("cusum").cast("bigint").alias("max_cusum"),
        F.min("cusum").cast("bigint").alias("min_cusum"),
    )


_BENFORD_PPM = {d: int(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@_register(
    "events_benford_first_digit",
    f"""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM events WHERE value > 0
), agg AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_events FROM v GROUP BY digit
)
SELECT digit, n_events,
       CAST(n_events * 1000000 // SUM(n_events) OVER () AS BIGINT) AS ppm,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm
FROM agg
""",
    doc="Benford first-significant-digit profile of event values — the "
    "classic synthetic-data / fraud smell test. The digit is extracted "
    "through INTEGER cents (round(value*100) → bigint → first char of "
    "the integer's decimal string), never through float log10, so both "
    "engines bucket identically; the Benford reference ppm is a "
    "python-precomputed constant table inlined as the SAME literal "
    "CASE in both engines. One narrow pass + a 9-row aggregate.",
)
def events_benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = ev.where(F.col("value") > 0).select(
        F.substring(
            F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    agg = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "digit",
        "n_events",
        F.expr("n_events * 1000000 div sum(n_events) over ()").alias("ppm"),
        F.expr(_BENFORD_CASE).cast("bigint").alias("benford_ppm"),
    )


# ---------------------------------------------------------------------------
# in-row repetition (Gopher family)
# ---------------------------------------------------------------------------


@_register(
    "max_trigram_repeat",
    """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - 1),
                        i -> array_to_string(w[i:i+2], ' ')) AS tri
  FROM toks WHERE len(w) >= 3
)
SELECT doc_id, CAST(len(tri) AS BIGINT) AS n_tri,
       CAST(list_max(list_transform(list_distinct(tri),
              d -> len(list_filter(tri, x -> x = d)))) AS BIGINT) AS max_rep,
       CAST(list_max(list_transform(list_distinct(tri),
              d -> len(list_filter(tri, x -> x = d)))) * 1000000
            // len(tri) AS BIGINT) AS rep_ppm
FROM sh
""",
    doc="Gopher-style repetition rule at trigram grain, computed "
    "entirely IN-ROW: the most-repeated word 3-gram's occurrence count "
    "per document, via array HOFs over the shingle list (distinct × "
    "filter-count, O(distinct·n) per doc, bounded by document length). "
    "Zero doc-grain shuffle — at 100 TB this is pure map-side compute "
    "like top_word_mass_bands/dup_bigram_mass, completing the "
    "unigram/bigram/trigram repetition ladder.",
)
def max_trigram_repeat(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
    tri = F.transform(
        F.sequence(F.lit(0), F.size(F.col("w")) - 3),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, 3)),
    )
    sh = (
        docs.select("doc_id", w.alias("w"))
        .where(F.size("w") >= 3)
        .select("doc_id", tri.alias("tri"))
    )
    max_rep = F.array_max(
        F.transform(
            F.array_distinct(F.col("tri")),
            lambda d: F.size(F.filter(F.col("tri"), lambda x: x == d)),
        )
    ).cast("bigint")
    return sh.select(
        "doc_id",
        F.size("tri").cast("bigint").alias("n_tri"),
        max_rep.alias("max_rep"),
        (max_rep * 1_000_000 / F.size("tri")).cast("bigint").alias("rep_ppm"),
    )


# ---------------------------------------------------------------------------
# dataloader packing utilization
# ---------------------------------------------------------------------------


def _packing_util_oracle() -> str:
    from cve_manager_spark.plans.corpus import _PACK_ORACLE

    return f"""
WITH packed AS ({_PACK_ORACLE})
SELECT shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens) * 1000000 // 2048 AS BIGINT) AS fill_ppm
FROM packed GROUP BY shard, seq_id
"""


@_register(
    "packing_utilization",
    _packing_util_oracle(),
    doc="Packing utilization audit over pack_sequences' output: per "
    "(shard, sequence) document count, token total, and fill ppm "
    "against the 2048-token budget (straddling docs land in the "
    "sequence where they started, so fills jitter around 10^6 — the "
    "report a dataloader owner reads to size the budget and spot "
    "pathological shards). Reuses the registered packing plan verbatim "
    "and adds one aggregate on the (shard, seq) key the window "
    "already partitioned by.",
)
def packing_utilization(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.corpus import pack_sequences

    packed = pack_sequences(spark, sf)
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr("sum(n_tokens) * 1000000 div 2048").alias("fill_ppm"),
    )


# ---------------------------------------------------------------------------
# warehouse faces
# ---------------------------------------------------------------------------

_NATION_BS_ORACLE = """
WITH s AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS supp_bal
  FROM supplier GROUP BY s_nationkey
), c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS cust_bal
  FROM customer GROUP BY c_nationkey
)
SELECT n.n_name,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.supp_bal, 0.0) AS supp_bal,
       COALESCE(c.cust_bal, 0.0) AS cust_bal
FROM nation n
LEFT JOIN s ON n.n_nationkey = s.nk
LEFT JOIN c ON n.n_nationkey = c.nk
"""


@_register(
    "nation_balance_sheet",
    _NATION_BS_ORACLE,
    doc="Per-nation balance sheet across BOTH sides of the trade graph: "
    "supplier headcount + exact-DECIMAL account-balance total joined "
    "against the customer-side twins, anchored on the 25-row nation "
    "dim (left joins, zero-filled) so nations missing a side still "
    "report. Two independent fact aggregates reduce each table to "
    "<= 25 rows BEFORE any join — the join inputs are dimension-sized "
    "regardless of fact scale.",
)
def nation_balance_sheet(spark: SparkSession, sf: str) -> DataFrame:
    sup = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    s = sup.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dec_sum(F.col("s_acctbal")).alias("supp_bal"),
    )
    c = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum(F.col("c_acctbal")).alias("cust_bal"),
    )
    return (
        nation.join(F.broadcast(s), nation.n_nationkey == s.nk, "left")
        .join(F.broadcast(c), nation.n_nationkey == c.nk, "left")
        .select(
            "n_name",
            F.coalesce("n_suppliers", F.lit(0)).cast("bigint").alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        )
    )


_SEGMENT_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment AS segment,
         LEAST(CAST(FLOOR(o.o_totalprice / 50000) AS BIGINT), 8) AS value_band,
         o.o_totalprice AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), agg AS (
  SELECT segment, value_band, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS band_value
  FROM j GROUP BY segment, value_band
)
SELECT segment, value_band, n_orders, band_value,
       CAST(n_orders * 1000000 //
            SUM(n_orders) OVER (PARTITION BY segment) AS BIGINT) AS seg_ppm
FROM agg
"""


@_register(
    "segment_value_profile",
    _SEGMENT_ORACLE,
    doc="Market-segment × order-value-band profile: the 50k-wide band "
    "ladder (capped at 8+, identical double divide before the floor in "
    "both engines) crossed with the customer segment via the "
    "orders→customer key join, with each band's ppm share within its "
    "segment. The fact-side join shuffles on o_custkey once; the share "
    "window runs on the <= 45-row aggregate. The segment dimension "
    "lives on the customer row — this is the canonical 'enrich facts "
    "with a customer attribute then profile' shape.",
)
def segment_value_profile(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.least(
            F.floor(F.col("o_totalprice") / 50000).cast("long"),
            F.lit(8).cast("long"),
        ).alias("value_band"),
        F.col("o_totalprice").alias("price"),
    )
    agg = j.groupBy("segment", "value_band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("price")).alias("band_value"),
    )
    return agg.select(
        "segment",
        "value_band",
        "n_orders",
        "band_value",
        F.expr(
            "n_orders * 1000000 div sum(n_orders) over (partition by segment)"
        ).alias("seg_ppm"),
    )


_LEN_BANDS = [(0, 16), (16, 32), (32, 64), (64, 128), (128, 256), (256, None)]


def _len_band_case(col: str) -> str:
    parts = []
    for lo, hi in _LEN_BANDS:
        cond = f"{col} >= {lo}" + (f" AND {col} < {hi}" if hi else "")
        parts.append(f"WHEN {cond} THEN {lo}")
    return "CASE " + " ".join(parts) + " END"


@_register(
    "doc_length_mass_bands",
    f"""
WITH d AS (
  SELECT CAST({_len_band_case("n_tok")} AS BIGINT) AS band_lo, n_tok
  FROM (SELECT len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '')) AS n_tok
        FROM documents)
), agg AS (
  SELECT band_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS token_mass
  FROM d GROUP BY band_lo
)
SELECT band_lo, n_docs, token_mass,
       CAST(SUM(token_mass) OVER (ORDER BY band_lo DESC
                                  ROWS UNBOUNDED PRECEDING) * 1000000
            // SUM(token_mass) OVER () AS BIGINT) AS cum_ppm_from_longest
FROM agg
""",
    doc="Document-length MASS concentration: an explicit power-of-two "
    "band ladder (CASE literals, never float log2 — the "
    "word_df_zipf_buckets discipline) over whitespace token counts, "
    "reporting each band's doc count, token mass, and the cumulative "
    "ppm of corpus tokens held by this band and all LONGER bands — "
    "'what share of training tokens comes from long documents', the "
    "at-scale substitute for an exact per-doc Pareto sort: the "
    "cumulative window runs over <= 6 band rows, row-grain data never "
    "passes a global sort.",
)
def doc_length_mass_bands(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    n_tok = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    )
    d = docs.select(n_tok.alias("n_tok")).select(
        F.expr(_len_band_case("n_tok")).cast("bigint").alias("band_lo"), "n_tok"
    )
    agg = d.groupBy("band_lo").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("token_mass"),
    )
    return agg.select(
        "band_lo",
        "n_docs",
        "token_mass",
        F.expr(
            "sum(token_mass) over (order by band_lo desc"
            " rows unbounded preceding) * 1000000"
            " div sum(token_mass) over ()"
        ).alias("cum_ppm_from_longest"),
    )
