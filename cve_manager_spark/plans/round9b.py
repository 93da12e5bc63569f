"""Round-9b tranche: 12 oracle-paired specs extending the pipeline
surface with NEW capability (not regression rotation).

Themes: semantic decontamination (test-split docs with train-split
embedding neighbors inside the deterministic k-means cells — the
embedding-grain sibling of the 13-gram span decontamination),
char-grain cross-doc window repetition (the character-window half of
the exact-substring dedup family, next to the word-shingle grain the
repo already verifies), temperature-based source mixing weights (the
tau=0.5 sampling-weight shape LLM training mixes actually use, made
exact with integer sqrt), MinHash estimator-error calibration (the
measured |estimate - exact| curve for every band candidate),
structural graph similarity (supplier-pair part-set Jaccard),
behavioral sequence modelling (second-order Markov transitions,
per-user event entropy), a point-in-time SCD2 lookup verified against
DuckDB's native ASOF JOIN, functional-dependency profiling, the
cume_dist analytic face, and a tokens-per-char quality band profile.

Determinism recipes per plans/spec.py: integer ppm via BIGINT ``div``,
the 6dp-rounded DECIMAL entropy sum (round6 precedent), md5 as the one
cross-engine digest (split buckets, MinHash family), FLOOR(SQRT(n))
exact for n < 2^40 (sqrt is correctly rounded, the nearest integer is
>= 2^-21 away while the ulp is ~2^-32), cume_dist = c/n as one IEEE
division of two exact integers, and explicit CASE/LEAST band ladders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    # queued with the round-9 tranche BEHIND the 49 round-8 specs still
    # awaiting their first driver verdict (registry window guard)
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
# Semantic decontamination (embedding-grain eval leakage)
# ---------------------------------------------------------------------------


def _semdecon_oracle() -> str:
    from cve_manager_spark.plans.corpus import _BUCKET_DUCK, _split_case
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    return _KMEANS_CTE + f"""
, nq AS (
  SELECT vec_id, q, cid,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS qq
  FROM a2
), sp AS (
  SELECT doc_id, source, {_split_case(_BUCKET_DUCK)} AS split FROM documents
), te AS (
  SELECT nq.vec_id, nq.q, nq.cid, nq.qq, sp.source
  FROM nq JOIN sp ON nq.vec_id = sp.doc_id WHERE sp.split = 'test'
), tr AS (
  SELECT nq.vec_id, nq.q, nq.cid, nq.qq
  FROM nq JOIN sp ON nq.vec_id = sp.doc_id WHERE sp.split = 'train'
), pr AS (
  SELECT te.vec_id,
         CAST(list_dot_product(CAST(te.q AS DOUBLE[]), CAST(tr.q AS DOUBLE[]))
              AS BIGINT) AS dot_q,
         te.qq AS na, tr.qq AS nb
  FROM te JOIN tr ON te.cid = tr.cid
), ag AS (
  SELECT vec_id,
         SUM(CASE WHEN dot_q > 0 AND CAST(dot_q AS HUGEINT) * dot_q * 400
                       >= CAST(na AS HUGEINT) * nb * 49 THEN 1 ELSE 0 END) AS nn,
         SUM(CASE WHEN dot_q > 0 AND CAST(dot_q AS HUGEINT) * dot_q * 25
                       >= CAST(na AS HUGEINT) * nb * 9 THEN 1 ELSE 0 END) AS ncl
  FROM pr GROUP BY vec_id
)
SELECT te.vec_id AS doc_id, te.source,
       CAST(COALESCE(ag.nn, 0) AS BIGINT) AS n_sem_neighbors,
       CAST(COALESCE(ag.ncl, 0) AS BIGINT) AS n_close
FROM te LEFT JOIN ag ON te.vec_id = ag.vec_id
"""


@_register(
    "semantic_decontamination",
    _semdecon_oracle(),
    doc="Embedding-grain eval decontamination: for every TEST-split "
    "document (md5 80/10/10 split, split_assign_3way recipe), count the "
    "TRAIN-split documents that are semantic neighbors — same "
    "deterministic k-means cell (k=8, 2 Lloyd iterations, quantized "
    "integer metric) with cosine >= 0.35, plus the tighter >= 0.6 "
    "count — the SemDeDup-style leakage audit run BEFORE trusting an "
    "eval score. Candidates are within-cell pairs only (never the "
    "corpus square); the threshold test is the exact integer "
    "cross-multiplication from semantic_dedup (dot^2 * 400 >= na*nb*49 "
    "in DECIMAL(38)); zero-neighbor test docs are kept via left join "
    "so the report is the full test manifest.",
)
def semantic_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import kmeans_quantized
    from cve_manager_spark.plans.corpus import _BUCKET_SPARK, _split_case

    emb = load_table(spark, sf, "embeddings")
    a = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    sp_d = load_table(spark, sf, "documents").select(
        F.col("doc_id"),
        F.col("source"),
        F.expr(_split_case(_BUCKET_SPARK)).alias("split"),
    )
    j = a.join(sp_d, a["vec_id"] == sp_d["doc_id"]).select(
        "vec_id", "q", "qq", "cluster", "source", "split"
    )
    te = j.where(F.col("split") == "test").select(
        "vec_id",
        F.col("q").alias("qa"),
        F.col("qq").alias("na"),
        "cluster",
        "source",
    )
    tr = j.where(F.col("split") == "train").select(
        F.col("cluster").alias("cluster_b"),
        F.col("q").alias("qb"),
        F.col("qq").alias("nb"),
    )
    p = te.join(tr, F.col("cluster") == F.col("cluster_b"))
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.withColumn("dot_q", dot)
    d19 = F.col("dot_q").cast("decimal(19,0)")
    na19 = F.col("na").cast("decimal(19,0)")
    nb19 = F.col("nb").cast("decimal(19,0)")
    neigh = (F.col("dot_q") > 0) & (d19 * d19 * F.lit(400) >= na19 * nb19 * F.lit(49))
    close = (F.col("dot_q") > 0) & (d19 * d19 * F.lit(25) >= na19 * nb19 * F.lit(9))
    ag = p.groupBy("vec_id").agg(
        F.sum(F.when(neigh, 1).otherwise(0)).alias("nn"),
        F.sum(F.when(close, 1).otherwise(0)).alias("ncl"),
    )
    return (
        te.select("vec_id", "source")
        .join(ag, "vec_id", "left")
        .select(
            F.col("vec_id").alias("doc_id"),
            "source",
            F.coalesce("nn", F.lit(0)).cast("bigint").alias("n_sem_neighbors"),
            F.coalesce("ncl", F.lit(0)).cast("bigint").alias("n_close"),
        )
    )


# ---------------------------------------------------------------------------
# Char-grain cross-doc window repetition (exact-substring dedup family)
# ---------------------------------------------------------------------------

_CHARWIN_CTE = """
WITH nt AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), w AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, length(t) - 30, 16),
                               p -> substr(t, p, 32))) AS win
  FROM nt WHERE length(t) >= 32
)
"""

_CHARWIN_SPARK = (
    "transform(sequence(1, length(t) - 31, 16), p -> substring(t, p, 32))"
)


def _charwin_df(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    nt = docs.select(
        "doc_id",
        "source",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("t"),
    )
    return nt.where(F.length("t") >= 32).select(
        "doc_id", "source", F.explode(F.expr(_CHARWIN_SPARK)).alias("win")
    )


@_register(
    "char_window_xdoc",
    _CHARWIN_CTE
    + """
, rep AS (
  SELECT win FROM (
    SELECT win, COUNT(DISTINCT doc_id) AS dd FROM w GROUP BY win
  ) WHERE dd >= 2
)
SELECT w.source,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN r.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rep,
       CAST(SUM(CASE WHEN r.win IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS rep_ppm
FROM w LEFT JOIN rep r ON w.win = r.win
GROUP BY w.source
""",
    doc="Char-grain cross-doc repetition mass — the character-window half "
    "of the exact-substring dedup family (word-shingle grain already "
    "verified): text normalized (lower, whitespace collapsed), cut into "
    "32-char windows at stride 16, a window is REPEATED when its exact "
    "string occurs in >= 2 distinct docs; per source report the ppm of "
    "window positions covered by repeated windows. The stride bounds "
    "blowup to ~len/16 windows per doc; the repeated set is one "
    "(window)-keyed aggregate re-joined on the same key — "
    "co-partitioned, no pairwise comparison anywhere (at 100 TB the "
    "window hash is the shuffle key exactly like the shingle recipes).",
)
def char_window_xdoc(spark: SparkSession, sf: str) -> DataFrame:
    w = _charwin_df(spark, sf)
    rep = (
        w.groupBy("win")
        .agg(F.count_distinct("doc_id").alias("dd"))
        .where(F.col("dd") >= 2)
        .select("win", F.lit(1).alias("__rep"))
    )
    return (
        w.join(rep, "win", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce("__rep", F.lit(0))).cast("bigint").alias("n_rep"),
            F.expr("sum(coalesce(__rep, 0)) * 1000000 div count(1)").alias(
                "rep_ppm"
            ),
        )
    )


@_register(
    "char_window_source_leakage",
    _CHARWIN_CTE
    + """
SELECT ns AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_window_values,
       CAST(SUM(n_occ) AS BIGINT) AS n_occurrences
FROM (
  SELECT win, CAST(COUNT(DISTINCT source) AS INTEGER) AS ns,
         CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM w GROUP BY win
) GROUP BY ns
""",
    doc="Cross-SOURCE char-window leakage profile: distinct 32-char "
    "windows bucketed by how many sources they appear in — n_sources=1 "
    "is source-local phrasing, the >= 2 tail is template/boilerplate "
    "text that crossed crawl boundaries (syndication, mirrors) and is "
    "exactly the text char-grain dedup recovers corpus-wide where "
    "per-source boilerplate rules cannot. Two chained hash aggregates "
    "on (win) then (n_sources); no joins.",
)
def char_window_source_leakage(spark: SparkSession, sf: str) -> DataFrame:
    w = _charwin_df(spark, sf)
    per = w.groupBy("win").agg(
        F.count_distinct("source").cast("int").alias("n_sources"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return per.groupBy("n_sources").agg(
        F.count(F.lit(1)).alias("n_window_values"),
        F.sum("n_occ").cast("bigint").alias("n_occurrences"),
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing weights (tau = 0.5, exact integer sqrt)
# ---------------------------------------------------------------------------


@_register(
    "mix_temperature",
    """
WITH d AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tok
  FROM documents
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tok_mass
  FROM d GROUP BY source
), q AS (
  SELECT source, n_docs, tok_mass,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS sq_docs,
         CAST(FLOOR(SQRT(CAST(tok_mass AS DOUBLE))) AS BIGINT) AS sq_tok
  FROM s
)
SELECT source, n_docs, tok_mass,
       CAST(sq_docs * 1000000 // SUM(sq_docs) OVER () AS BIGINT) AS w_doc_ppm,
       CAST(sq_tok * 1000000 // SUM(sq_tok) OVER () AS BIGINT) AS w_tok_ppm
FROM q
""",
    doc="Temperature-based source sampling weights, tau = 0.5: the "
    "p^tau renormalization LLM training mixes use to up-weight small "
    "sources (multilingual-sampling literature), computed EXACTLY — "
    "w_i = floor(sqrt(mass_i)) * 1e6 div sum_j floor(sqrt(mass_j)). "
    "floor(sqrt(n)) is deterministic across engines for n < 2^40 "
    "because IEEE sqrt is correctly rounded and the nearest integer "
    "boundary is >= 2^-21 away vs a ~2^-32 ulp; everything after is "
    "BIGINT arithmetic. Complements mix_budget (fixed-share budgeter): "
    "this derives the shares. One groupBy(source) aggregate + a 20-row "
    "broadcast total.",
)
def mix_temperature(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("n_tok"),
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tok_mass"),
    )
    q = s.select(
        "source",
        "n_docs",
        "tok_mass",
        F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("bigint").alias("sq_docs"),
        F.floor(F.sqrt(F.col("tok_mass").cast("double")))
        .cast("bigint")
        .alias("sq_tok"),
    )
    tot = q.agg(F.sum("sq_docs").alias("td"), F.sum("sq_tok").alias("tt"))
    return q.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tok_mass",
        F.expr("sq_docs * 1000000 div td").alias("w_doc_ppm"),
        F.expr("sq_tok * 1000000 div tt").alias("w_tok_ppm"),
    )


# ---------------------------------------------------------------------------
# Structural graph similarity: supplier-pair part-set Jaccard
# ---------------------------------------------------------------------------


@_register(
    "graph_neighbor_jaccard",
    """
WITH e AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), deg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY s
), pr AS (
  SELECT a.s AS s_a, b.s AS s_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
), j AS (
  SELECT pr.inter,
         CAST(pr.inter * 1000000 // (da.d + db.d - pr.inter) AS BIGINT)
           AS jac_ppm
  FROM pr JOIN deg da ON pr.s_a = da.s JOIN deg db ON pr.s_b = db.s
)
SELECT CAST(LEAST(9, jac_ppm // 100000) AS INTEGER) AS jac_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(inter) AS BIGINT) AS shared_parts,
       CAST(MAX(jac_ppm) AS BIGINT) AS max_jac_ppm
FROM j GROUP BY 1
""",
    doc="Structural similarity on the part-supplier bipartite graph: for "
    "every supplier pair sharing >= 1 part, the exact Jaccard of their "
    "part sets (inter * 1e6 div union, pure integers), histogrammed by "
    "decile — the neighborhood-overlap statistic behind co-sourcing / "
    "substitutability analysis and link prediction. Pairs are generated "
    "through the shared part (one self-equi-join on p, never supplier "
    "x supplier), so the blowup is bounded by per-part supplier fan-out "
    "— on skewed real graphs cap that fan-out df-style exactly like the "
    "shingle stop-lists; degrees ride in on two co-partitioned joins.",
)
def graph_neighbor_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    li = fan_out(load_table(spark, sf, "lineitem"))
    e = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = e.select("p", F.col("s").alias("s_a"))
    b = e.select(F.col("p").alias("pb"), F.col("s").alias("s_b"))
    pr = (
        a.join(b, (F.col("p") == F.col("pb")) & (F.col("s_a") < F.col("s_b")))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        pr.join(deg.select(F.col("s").alias("s_a"), F.col("d").alias("da")), "s_a")
        .join(deg.select(F.col("s").alias("s_b"), F.col("d").alias("db")), "s_b")
        .select(
            "inter", F.expr("inter * 1000000 div (da + db - inter)").alias("jac_ppm")
        )
    )
    return j.groupBy(
        F.expr("least(9, jac_ppm div 100000)").cast("int").alias("jac_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("inter").cast("bigint").alias("shared_parts"),
        F.max("jac_ppm").cast("bigint").alias("max_jac_ppm"),
    )


# ---------------------------------------------------------------------------
# Behavioral sequences: per-user entropy + second-order Markov
# ---------------------------------------------------------------------------


@_register(
    "user_event_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
), t AS (
  SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM c GROUP BY user_id
)
SELECT c.user_id, MAX(t.n) AS n_events, MAX(t.n_types) AS n_types,
       CAST(SUM(CAST(ROUND(
         -(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
""",
    doc="Per-user Shannon entropy of the event-type distribution — the "
    "behavioral-diversity feature separating single-purpose accounts "
    "(entropy ~0) from engaged users (~ln 5): each -p*ln(p) term "
    "rounded to 6dp and summed as exact DECIMAL (the "
    "unigram_entropy_by_lang recipe), so the sum is order-independent. "
    "Both aggregates and the totals join share the user_id key — one "
    "shuffle, zero extra exchanges.",
)
def user_event_entropy(spark: SparkSession, sf: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf, "events"))
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.groupBy("user_id").agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.max("n_types").alias("n_types"),
            F.sum(term).cast("double").alias("entropy"),
        )
    )


@_register(
    "events_markov_2step",
    """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS t1,
         LAG(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), c AS (
  SELECT t2, t1, event_type AS t0, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE t2 IS NOT NULL GROUP BY t2, t1, event_type
)
SELECT t2, t1, t0, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY t2, t1) AS BIGINT)
         AS cond_ppm
FROM c
""",
    doc="Second-order Markov transition model of user behavior: counts "
    "and conditional ppm of event_type given the two preceding events "
    "in the user's (ts, event_id)-ordered stream — the sequence-model "
    "upgrade of event_transitions (first-order) that exposes e.g. "
    "view->click->purchase vs click->view->purchase asymmetry. One "
    "user-partitioned window sort for both lags, one (t2,t1,t0) "
    "aggregate, and the conditional total is a window over the "
    "|types|^2-row result — nothing scales with the corpus but the "
    "first sort.",
)
def events_markov_2step(spark: SparkSession, sf: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
    )
    c = (
        s.where(F.col("t2").isNotNull())
        .groupBy("t2", "t1", F.col("event_type").alias("t0"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.withColumn(
        "cond_ppm",
        F.expr("n * 1000000 div sum(n) over (partition by t2, t1)").cast(
            "bigint"
        ),
    )


# ---------------------------------------------------------------------------
# cume_dist analytic face
# ---------------------------------------------------------------------------


@_register(
    "window_cume_dist",
    """
SELECT s.s_suppkey, n.n_name,
       cume_dist() OVER (PARTITION BY s.s_nationkey ORDER BY s.s_acctbal)
         AS cd,
       CAST(RANK() OVER (PARTITION BY s.s_nationkey ORDER BY s.s_acctbal)
            AS BIGINT) AS rnk
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
    doc="cume_dist analytic face — the last ranking-window function "
    "family member not yet verified (rank/dense_rank/ntile/"
    "percent_rank are green): each supplier's cumulative account-"
    "balance position within its nation, peers-inclusive. cume_dist = "
    "c/n is ONE IEEE division of two exact small integers, identical "
    "across engines — no rounding recipe needed; rank rides along as "
    "the tie witness. One nation-partitioned window sort over a "
    "broadcast-joined 25-row nation dim.",
)
def window_cume_dist(spark: SparkSession, sf: str) -> DataFrame:
    su = load_table(spark, sf, "supplier")
    na = load_table(spark, sf, "nation")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return (
        su.join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .select(
            "s_suppkey",
            "n_name",
            F.cume_dist().over(w).alias("cd"),
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# Functional-dependency profiling
# ---------------------------------------------------------------------------

_FD_ORACLE_TMPL = """
  SELECT '{name}' AS fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
              // COUNT(*) AS BIGINT) AS viol_ppm,
         CAST(MAX(nd) AS BIGINT) AS max_fanout
  FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd FROM {table} GROUP BY {lhs})
"""

_FD_CANDIDATES = [
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("part.p_type->p_brand", "part", "p_type", "p_brand"),
    ("documents.lang->source", "documents", "lang", "source"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
]


@_register(
    "fd_profile",
    " UNION ALL ".join(
        _FD_ORACLE_TMPL.format(name=n, table=t, lhs=l, rhs=r)
        for n, t, l, r in _FD_CANDIDATES
    ),
    doc="Functional-dependency discovery profile — the data-profiling "
    "primitive behind schema inference and key detection: for each "
    "candidate FD lhs->rhs, the number of lhs keys, how many keys "
    "VIOLATE the dependency (> 1 distinct rhs), the violation ppm and "
    "the worst fan-out. A dependency holds iff n_violating = 0; the "
    "ppm grades 'approximate FDs' (holds for 99% of keys) that exact "
    "checkers miss. Per candidate: one (lhs)-keyed distinct-count "
    "aggregate folded to a single row — candidates union to a "
    "4-row report, each independently parallel.",
)
def fd_profile(spark: SparkSession, sf: str) -> DataFrame:
    def prof(name: str, table: str, lhs: str, rhs: str) -> DataFrame:
        df = fan_out(load_table(spark, sf, table))
        g = df.groupBy(lhs).agg(F.count_distinct(rhs).alias("nd"))
        return g.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.expr(
                "sum(case when nd > 1 then 1 else 0 end) * 1000000 div count(1)"
            ).alias("viol_ppm"),
            F.max("nd").cast("bigint").alias("max_fanout"),
        ).select(
            F.lit(name).alias("fd"),
            "n_keys",
            "n_violating",
            "viol_ppm",
            "max_fanout",
        )

    out = None
    for n, t, l, r in _FD_CANDIDATES:
        part = prof(n, t, l, r)
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Tokens-per-char quality bands
# ---------------------------------------------------------------------------


@_register(
    "tokens_per_kchar_bands",
    """
WITH d AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tok,
         length(text) AS n_char
  FROM documents
), b AS (
  SELECT source, n_tok,
         CAST(LEAST(19, (n_tok * 1000 // n_char) // 20) AS INTEGER) AS band
  FROM d
)
SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tok_mass
FROM b GROUP BY source, band
""",
    doc="Token-density quality bands: tokens per kilochar (n_tok * 1000 "
    "div n_char, banded by 20) per source — the compression-ratio "
    "proxy CCNet-style filters use: very low density = code/tables/"
    "markup, very high = word-salad; prose clusters mid-band. Pure "
    "integer band ladder, one in-row expression + one (source, band) "
    "aggregate; band count is bounded (<= 20) so the result never "
    "scales with the corpus.",
)
def tokens_per_kchar_bands(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("n_tok"),
        F.length("text").alias("n_char"),
    )
    b = d.select(
        "source",
        "n_tok",
        F.expr("least(19, (n_tok * 1000 div n_char) div 20)")
        .cast("int")
        .alias("band"),
    )
    return b.groupBy("source", "band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tok_mass"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator-error calibration
# ---------------------------------------------------------------------------


def _minhash_err_oracle() -> str:
    from cve_manager_spark.plans import pipeline as _pl

    base = _pl._MINHASH_FP_ORACLE
    cut = base.index("), j AS (")
    cte = base[:cut] + ")"
    assert cte.rstrip().endswith(")") and "cand AS (" in cte
    return cte + """
, jm AS (
  SELECT len(list_intersect(sa.shingles, sb.shingles)) AS inter,
         len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles)) AS u,
         len(list_filter(range(0, 32), s -> sa.sigs[s+1] = sb.sigs[s+1])) AS m
  FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
)
SELECT CAST(LEAST(9, abs(m * 1000000 // 32 - inter * 1000000 // u) // 100000)
            AS INTEGER) AS err_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM jm GROUP BY 1
"""


@_register(
    "minhash_estimate_error",
    _minhash_err_oracle(),
    doc="MinHash estimator-error calibration: for EVERY band-collision "
    "candidate pair, |estimated - exact| Jaccard where the estimate is "
    "matching-signature-elements/32 — the measured accuracy of the "
    "estimator the banding thresholds implicitly trust (expected error "
    "~1/sqrt(32) ~ 0.18; mass above decile 3 means 32 hashes is too "
    "few for the dial setting). Both quantities are exact integers "
    "(ppm div), reusing the dedup_minhash_det pipeline "
    "(operators/dedup.minhash_det_pairs with_counts=True, which now "
    "also emits sig_matches).",
)
def minhash_estimate_error(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators import dedup as D

    pairs = D.minhash_det_pairs(
        load_table(spark, sf, "documents"),
        n=2,
        num_hashes=32,
        bands=16,
        with_counts=True,
    )
    err = F.expr(
        "abs(sig_matches * 1000000 div 32 - inter * 1000000 div union_sz)"
    )
    return pairs.groupBy(
        F.least(F.lit(9), (err / 100000).cast("bigint"))
        .cast("int")
        .alias("err_decile")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup (ASOF JOIN oracle)
# ---------------------------------------------------------------------------


@_register(
    "scd2_asof_lookup",
    """
WITH p0 AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC)
           AS rn
  FROM events WHERE event_type = 'purchase'
), p AS (
  SELECT user_id, ts,
         CAST(FLOOR(value * 1000) AS BIGINT) AS v_milli,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
           AS version
  FROM p0 WHERE rn = 1
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       p.version AS last_purchase_version,
       p.v_milli AS last_purchase_v_milli
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    doc="Point-in-time SCD2 lookup: every click event annotated with the "
    "purchase-history VERSION in effect at its timestamp (inclusive "
    "<=; NULL before the first purchase) — the effective-dated "
    "dimension probe every feature pipeline runs, here verified "
    "against DuckDB's native ASOF LEFT JOIN (a new oracle pattern: "
    "the engine's asof operator vs a reference implementation of asof "
    "semantics, not a SQL re-derivation). Spark side is "
    "operators/asof.asof_join — the union+window formulation, one "
    "user_id shuffle, no per-row probes; equal-ts purchase duplicates "
    "are deduplicated to max event_id first so both engines pick the "
    "same row.",
)
def scd2_asof_lookup(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    w_ts = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    p1 = pur.withColumn("rn", F.row_number().over(w_ts)).where(F.col("rn") == 1)
    wv = Window.partitionBy("user_id").orderBy("ts")
    p = p1.select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_milli"),
        F.row_number().over(wv).cast("bigint").alias("version"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks, p, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["version", "v_milli"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_version").alias("last_purchase_version"),
        F.col("asof_v_milli").alias("last_purchase_v_milli"),
    )
