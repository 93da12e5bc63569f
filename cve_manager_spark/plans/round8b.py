"""Round-8b tranche: 22 more oracle-paired specs so the next driver
window (50 slots) verifies new work end-to-end — composition faces over
the round-8 operators (quality scorer, span decontamination, image
phash, IVF/PQ) plus behavioral, warehouse and corpus-statistics
reporting.

Determinism recipes are the plans/spec.py contract: integer ppm/milli
shares via BIGINT ``div``, exact DECIMAL money sums emitted as one
final double cast, picked (never interpolated) order statistics with
unique tie-breaks, and machine-built oracles for the quantized
k-means / PQ families (reused from plans/semantic and plans/round8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import dec, dec_sum, fan_out
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 0,
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
# quality-classifier composition faces
# ---------------------------------------------------------------------------


def _quality_cte() -> str:
    from cve_manager_spark.plans.round8 import _QUALITY_EXPR_SQL, _QUALITY_SCORE_SQL

    return (
        "WITH f AS ("
        + _QUALITY_EXPR_SQL
        + "), s AS ("
        + _QUALITY_SCORE_SQL
        + """
), lab AS (
  SELECT doc_id, source, score,
         CASE WHEN score >= 600000 THEN 'high'
              WHEN score >= 300000 THEN 'mid'
              ELSE 'low' END AS label
  FROM s
)"""
    )


_QUALITY_SOURCE_ORACLE = _quality_cte() + """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN label = 'high' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST(SUM(CASE WHEN label = 'mid' THEN 1 ELSE 0 END) AS BIGINT) AS n_mid,
       CAST(SUM(CASE WHEN label = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score
FROM lab GROUP BY source
"""


@_register(
    "quality_by_source_profile",
    _QUALITY_SOURCE_ORACLE,
    doc="Per-source quality profile: label mix and integer mean score — "
    "the table that decides which crawl sources feed the high-quality "
    "mix and which get the aggressive filter. One source-keyed "
    "aggregate over the shuffle-free scorer projection; mean is an "
    "exact BIGINT sum divided once (integer div both engines).",
)
def quality_by_source_profile(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import _quality_scored

    docs = fan_out(load_table(spark, sf, "documents"))
    s = _quality_scored(docs)
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("label") == "high", 1).otherwise(0))
        .cast("bigint")
        .alias("n_high"),
        F.sum(F.when(F.col("label") == "mid", 1).otherwise(0))
        .cast("bigint")
        .alias("n_mid"),
        F.sum(F.when(F.col("label") == "low", 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
        F.expr("sum(score) div count(1)").alias("mean_score"),
    )


_QUALITY_LEN_ORACLE = _quality_cte() + """
, b AS (
  SELECT l.score, least(d.n_chars // 256, 7) AS len_band
  FROM lab l JOIN documents d ON l.doc_id = d.doc_id
)
SELECT len_band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(score) AS min_score,
       MAX(score) AS max_score,
       CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score
FROM b GROUP BY len_band
"""


@_register(
    "quality_length_calibration",
    _QUALITY_LEN_ORACLE,
    doc="Quality-score calibration against document length: 256-char "
    "bands (capped at band 7) with count and min/mean/max score — the "
    "audit that catches a scorer degenerating into a length detector "
    "(a known failure of integer linear quality models). Uses the "
    "table's n_chars column so both engines band identical integers.",
)
def quality_length_calibration(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import _quality_scored

    docs = fan_out(load_table(spark, sf, "documents"))
    s = _quality_scored(docs).select("doc_id", "score")
    d = load_table(spark, sf, "documents").select(
        "doc_id", F.least(F.expr("n_chars div 256"), F.lit(7).cast("bigint")).alias("len_band")
    )
    return (
        s.join(d, "doc_id")
        .groupBy("len_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.expr("sum(score) div count(1)").alias("mean_score"),
        )
    )


_DECONTAM_SUMMARY_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
           i -> struct_pack(pos := i, s := array_to_string(w[i:i+2], ' ')))) AS u
  FROM toks WHERE len(w) >= 3
), ex AS (
  SELECT doc_id, u.pos AS pos, u.s AS s FROM sh
), ev AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0
), hits AS (
  SELECT e.doc_id, e.pos FROM ex e JOIN ev ON e.s = ev.s
  WHERE e.doc_id % 97 <> 0
), g AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM hits
), per_doc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN prev IS NULL THEN 3
                       ELSE least(3, pos - prev) END) AS BIGINT) AS contam
  FROM g GROUP BY doc_id
), base AS (
  SELECT t.source, len(t.w) AS n_tokens,
         COALESCE(p.contam, 0) AS contam,
         CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
  WHERE t.doc_id % 97 <> 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(hit) AS BIGINT) AS n_docs_contam,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(contam) AS BIGINT) AS n_contam_tokens,
       CAST(SUM(contam) * 1000000 // greatest(SUM(n_tokens), 1) AS BIGINT)
         AS contam_ppm
FROM base GROUP BY source
"""


@_register(
    "decontam_source_summary",
    _DECONTAM_SUMMARY_ORACLE,
    doc="Per-source contamination rollup over the span-grain "
    "decontamination: affected docs, contaminated tokens and their ppm "
    "of the source's token volume — the report a pipeline owner reads "
    "to decide whether a source needs span-surgery or can be dropped "
    "wholesale. Reuses the decontaminate_spans per-doc relation "
    "LEFT-joined back onto all non-eval docs (zero-hit docs count in "
    "the denominator).",
)
def decontam_source_summary(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words
    from cve_manager_spark.plans.round8 import decontaminate_spans

    spans = decontaminate_spans(spark, sf).select("doc_id", "n_contam_tokens")
    docs = fan_out(load_table(spark, sf, "documents"))
    base = (
        docs.where(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            "source",
            F.size(words(F.lower(F.col("text")))).cast("bigint").alias("n_tokens"),
        )
        .join(spans, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce("n_contam_tokens", F.lit(0)).alias("contam"),
            F.when(F.col("n_contam_tokens").isNotNull(), 1).otherwise(0).alias("hit"),
        )
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("hit").cast("bigint").alias("n_docs_contam"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("contam").alias("n_contam_tokens"),
        F.expr("sum(contam) * 1000000 div greatest(sum(n_tokens), 1)").alias(
            "contam_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# image-phash composition faces
# ---------------------------------------------------------------------------


def _phash_cte() -> str:
    from cve_manager_spark.plans.round8 import _phash_oracle_cte

    return _phash_oracle_cte()


_PHASH_HIST_ORACLE_TAIL = """
, m AS (
  SELECT doc_id,
         unnest([struct_pack(j := 0, v := band0),
                 struct_pack(j := 1, v := band1),
                 struct_pack(j := 2, v := band2),
                 struct_pack(j := 3, v := band3)]) AS bk
  FROM ph
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM m a JOIN m b ON a.bk.j = b.bk.j AND a.bk.v = b.bk.v
  WHERE a.doc_id < b.doc_id
), hp AS (
  SELECT doc_id, band0, band1, band2, band3 FROM ph
), pairs AS (
  SELECT CAST(bit_count(xor(CAST(x.band0 AS BIGINT), CAST(y.band0 AS BIGINT)))
            + bit_count(xor(CAST(x.band1 AS BIGINT), CAST(y.band1 AS BIGINT)))
            + bit_count(xor(CAST(x.band2 AS BIGINT), CAST(y.band2 AS BIGINT)))
            + bit_count(xor(CAST(x.band3 AS BIGINT), CAST(y.band3 AS BIGINT)))
            AS INTEGER) AS hamming
  FROM cand c
  JOIN hp x ON c.id_a = x.doc_id
  JOIN hp y ON c.id_b = y.doc_id
)
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY hamming
"""


@_register(
    "phash_hamming_hist",
    None,  # assembled lazily below (needs round8 import); see _finalize
    doc="Hamming-distance histogram over ALL band-collision candidate "
    "pairs (no radius cut) — the calibration plot that justifies the "
    "dedup threshold: true dups cluster at 0, band-coincidence noise "
    "sits near the random-pair mean (~32 of 64 bits). Same banded "
    "equi-join as dedup_image_phash; the histogram is the audit face.",
)
def phash_hamming_hist(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import (
        _phash_band_candidates,
        _phash_df,
        _phash_hamming,
    )

    cand = _phash_band_candidates(_phash_df(spark, sf))
    return (
        cand.select(_phash_hamming().cast("int").alias("hamming"))
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_BIT_BALANCE_ORACLE_TAIL = """
, e AS (
  SELECT CAST(r.i AS INTEGER) AS pos, bits[r.i + 1] AS bit
  FROM b, range(0, 64) r(i)
)
SELECT pos,
       CAST(SUM(bit) AS BIGINT) AS n_ones,
       CAST(SUM(bit) * 1000000 // COUNT(*) AS BIGINT) AS ones_ppm
FROM e GROUP BY pos
"""


@_register(
    "image_phash_bit_balance",
    None,  # assembled lazily below
    doc="Per-bit-position 1-share of the corpus aHash — the uniformity "
    "audit for the banding scheme (a skewed bit position degrades a "
    "band's selectivity and blows up its candidate count). The Spark "
    "side re-derives each bit from the 16-bit band integers with "
    "shift-and-mask (no re-decode); 64-row output, integer ppm.",
)
def image_phash_bit_balance(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import _phash_df

    ph = _phash_df(spark, sf).select("band0", "band1", "band2", "band3")
    bits = ph.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(16 * j + t).alias("pos"),
                        F.shiftright(F.col(f"band{j}"), 15 - t)
                        .bitwiseAND(F.lit(1))
                        .alias("bit"),
                    )
                    for j in range(4)
                    for t in range(16)
                ]
            )
        ).alias("u")
    ).select(F.col("u.pos").alias("pos"), F.col("u.bit").alias("bit"))
    return bits.groupBy("pos").agg(
        F.sum("bit").cast("bigint").alias("n_ones"),
        F.expr("sum(bit) * 1000000 div count(1)").alias("ones_ppm"),
    )


_PHASH_CLUSTER_ORACLE_TAIL = """
, grp AS (
  SELECT phash_hex, CAST(COUNT(*) AS BIGINT) AS group_size
  FROM ph GROUP BY phash_hex HAVING COUNT(*) > 1
)
SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
FROM grp GROUP BY group_size
"""


@_register(
    "image_dup_cluster_sizes",
    None,  # assembled lazily below
    doc="Histogram of exact perceptual-duplicate group sizes — the "
    "image-side twin of dup_cluster_size_hist: how much of the image "
    "corpus is pairs vs deep boilerplate stacks (the size decides "
    "whether keep-one dedup or cluster sampling is the right policy).",
)
def image_dup_cluster_sizes(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import _phash_df

    ph = _phash_df(spark, sf)
    grp = (
        ph.groupBy("phash_hex")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    return grp.groupBy("group_size").agg(F.count(F.lit(1)).alias("n_groups"))


# ---------------------------------------------------------------------------
# behavioral analytics
# ---------------------------------------------------------------------------

_NEW_RETURNING_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), f AS (
  SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id
)
SELECT d.day,
       CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM d JOIN f ON d.user_id = f.user_id
GROUP BY d.day
"""


@_register(
    "events_daily_new_vs_returning",
    _NEW_RETURNING_ORACLE,
    doc="Daily split of active users into first-ever-seen vs returning — "
    "the growth-vs-retention decomposition every DAU chart hides. The "
    "(user, day) relation is distinct-reduced FIRST; first-seen day is "
    "a user-keyed MIN merged back on the user key (same exchange "
    "layout, no second shuffle family).",
)
def events_daily_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    f = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = d.join(f, "user_id")
    return j.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_returning"),
    )


_PEAK_HOUR_ORACLE = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hr,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), r AS (
  SELECT day, cnt,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY cnt, hr) AS rn,
         COUNT(*) OVER (PARTITION BY day) AS n
  FROM h
)
SELECT day,
       MAX(cnt) AS peak_cnt,
       MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN cnt END) AS median_cnt,
       CAST(MAX(cnt) * 1000000 //
            MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN cnt END) AS BIGINT)
         AS peak_to_median_ppm
FROM r GROUP BY day
"""


@_register(
    "events_peak_hour_ratio",
    _PEAK_HOUR_ORACLE,
    doc="Per-day peak-to-median hourly load: the capacity-planning "
    "number (how much burstier is the worst hour than a typical one). "
    "The median hourly count is PICKED at position floor((n-1)/2)+1 of "
    "the (count, hour) order over hours present that day — exact on "
    "both engines; ratio is integer ppm.",
)
def events_peak_hour_ratio(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    h = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("day").orderBy("cnt", "hr")
    wn = Window.partitionBy("day")
    r = h.select(
        "day",
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = F.max(F.when(F.col("rn") == F.expr("(n - 1) div 2 + 1"), F.col("cnt")))
    return r.groupBy("day").agg(
        F.max("cnt").alias("peak_cnt"),
        med.alias("median_cnt"),
        (F.max("cnt") * 1000000 / med).cast("bigint").alias("peak_to_median_ppm"),
    )


_SESSION_SWEEP_ORACLE = """
WITH o AS (
  SELECT user_id, epoch(ts) AS t,
         lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), gaps AS (
  SELECT user_id, t - prev AS gap FROM o WHERE prev IS NOT NULL
), u AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
), thr AS (
  SELECT unnest([1800, 3600, 7200]) AS threshold_s
)
SELECT CAST(thr.threshold_s AS BIGINT) AS threshold_s,
       CAST(u.n_users + (SELECT COUNT(*) FROM gaps WHERE gap > thr.threshold_s)
            AS BIGINT) AS n_sessions,
       u.n_users,
       CAST((u.n_users + (SELECT COUNT(*) FROM gaps
                          WHERE gap > thr.threshold_s)) * 1000
            // u.n_users AS BIGINT) AS sessions_per_user_milli
FROM thr, u
"""


@_register(
    "events_session_gap_sweep",
    _SESSION_SWEEP_ORACLE,
    doc="Sessionization threshold sweep (30/60/120 min) from ONE scan: "
    "total sessions at gap threshold t is n_users + #(inter-event gaps "
    "> t), so a single LAG window yields the gap relation and each "
    "threshold is a conditional count over it — the sweep a pipeline "
    "runs to pick its session gap without re-sessionizing per "
    "candidate. Ties broken (ts, event_id) in the LAG order.",
)
def events_session_gap_sweep(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (UTC session): NTZ→TIMESTAMP cast then exact
    # BIGINT micros — thresholds compare in micros so the sweep is pure
    # integer arithmetic (same verdicts as the oracle's epoch-seconds).
    t_us = F.expr("unix_micros(cast(ts as timestamp))")
    o = ev.select(
        "user_id",
        t_us.alias("t"),
        F.lag(t_us).over(w).alias("prev"),
    )
    gaps = o.where(F.col("prev").isNotNull()).select(
        (F.col("t") - F.col("prev")).alias("gap")
    )
    counts = gaps.select(
        *[
            F.sum(F.when(F.col("gap") > t * 1_000_000, 1).otherwise(0))
            .cast("bigint")
            .alias(f"b{t}")
            for t in (1800, 3600, 7200)
        ]
    )
    users = ev.select(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    base = counts.crossJoin(F.broadcast(users))
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("bigint").alias("threshold_s"),
                        (F.col(f"b{t}") + F.col("n_users")).alias("n_sessions"),
                        F.col("n_users").alias("n_users"),
                    )
                    for t in (1800, 3600, 7200)
                ]
            )
        ).alias("u")
    ).select("u.threshold_s", "u.n_sessions", "u.n_users")
    return rows.withColumn(
        "sessions_per_user_milli",
        F.expr("n_sessions * 1000 div n_users"),
    )


_CHURN_ORACLE = """
WITH mx AS (
  SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
), lastd AS (
  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day FROM events
  GROUP BY user_id
), b AS (
  SELECT date_diff('day', l.last_day, mx.max_day) AS inactive
  FROM lastd l, mx
)
SELECT CAST(CASE WHEN inactive <= 1 THEN 0
            WHEN inactive <= 7 THEN 1
            WHEN inactive <= 30 THEN 2
            ELSE 3 END AS INTEGER) AS churn_band,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM b GROUP BY 1
"""


@_register(
    "events_churn_bands",
    _CHURN_ORACLE,
    doc="Churn-risk snapshot: users banded by days since last activity "
    "relative to the corpus max day (active ≤1d, lapsing ≤7d, dormant "
    "≤30d, churned) — the re-engagement funnel input. The corpus max "
    "day is ONE broadcast scalar row; everything else is a user-keyed "
    "aggregate.",
)
def events_churn_bands(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    d = F.col("ts").cast("date")
    mx = ev.select(F.max(d).alias("max_day"))
    lastd = ev.groupBy("user_id").agg(F.max(d).alias("last_day"))
    b = lastd.crossJoin(F.broadcast(mx)).select(
        F.datediff("max_day", "last_day").alias("inactive")
    )
    band = (
        F.when(F.col("inactive") <= 1, 0)
        .when(F.col("inactive") <= 7, 1)
        .when(F.col("inactive") <= 30, 2)
        .otherwise(3)
    )
    return b.groupBy(band.cast("int").alias("churn_band")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# warehouse reporting
# ---------------------------------------------------------------------------

_SHIP_QUARTILE_ORACLE = """
WITH d AS (
  SELECT l.l_returnflag AS flag,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS delay,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), r AS (
  SELECT flag, delay,
         ROW_NUMBER() OVER (PARTITION BY flag
                            ORDER BY delay, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY flag) AS n
  FROM d
)
SELECT flag, CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN delay END) AS BIGINT)
         AS q1_days,
       CAST(MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN delay END) AS BIGINT)
         AS median_days,
       CAST(MAX(CASE WHEN rn = 3 * (n - 1) // 4 + 1 THEN delay END) AS BIGINT)
         AS q3_days
FROM r GROUP BY flag
"""


@_register(
    "ship_delay_quartiles",
    _SHIP_QUARTILE_ORACLE,
    doc="Order-to-ship delay quartiles per return flag: Q1/median/Q3 are "
    "VALUES picked at the exact rank positions of the (delay, orderkey, "
    "linenumber) total order — the part_type_price_iqr discipline on "
    "the fulfillment latency distribution (complements "
    "shipping_delay_stats' min/max/mean with the robust spread).",
)
def ship_delay_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_returnflag").alias("flag"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("flag").orderBy("delay", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("flag")
    r = d.select(
        "flag",
        "delay",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(pos_expr: str):
        return F.max(
            F.when(F.col("rn") == F.expr(pos_expr), F.col("delay"))
        ).cast("bigint")

    return r.groupBy("flag").agg(
        F.max("n").alias("n_lines"),
        pick("(n - 1) div 4 + 1").alias("q1_days"),
        pick("(n - 1) div 2 + 1").alias("median_days"),
        pick("3 * (n - 1) div 4 + 1").alias("q3_days"),
    )


_SLOW_FULFILL_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                    CAST(l.l_shipdate AS DATE)) > 90
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
       CAST(SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                    CAST(l.l_shipdate AS DATE)) > 90
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS slow_ppm
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@_register(
    "slow_fulfillment_share",
    _SLOW_FULFILL_ORACLE,
    doc="Share of lineitems shipped more than 90 days after the order, "
    "per priority class — the SLA breach report (urgent orders "
    "shipping slow is the anomaly to page on). One join, one "
    "aggregate, integer ppm.",
)
def slow_fulfillment_share(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    slow = F.when(
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        > 90,
        1,
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(slow).cast("bigint").alias("n_slow"),
            F.expr(
                "sum(CASE WHEN datediff(CAST(l_shipdate AS DATE),"
                " CAST(o_orderdate AS DATE)) > 90 THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            ).alias("slow_ppm"),
        )
    )


_RANK_SHIFT_ORACLE = """
WITH yr AS (
  SELECT MIN(EXTRACT(year FROM o_orderdate)) AS y0,
         MAX(EXTRACT(year FROM o_orderdate)) AS y1
  FROM orders
), rev AS (
  SELECT c.c_nationkey AS nk, EXTRACT(year FROM o.o_orderdate) AS yr,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
           AS units
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT r.nk, r.yr,
         ROW_NUMBER() OVER (PARTITION BY r.yr
                            ORDER BY r.units DESC, r.nk) AS rnk
  FROM rev r, yr WHERE r.yr = yr.y0 OR r.yr = yr.y1
)
SELECT n.n_name,
       CAST(a.rnk AS BIGINT) AS rank_first,
       CAST(b.rnk AS BIGINT) AS rank_last,
       CAST(a.rnk - b.rnk AS BIGINT) AS rank_gain
FROM ranked a
JOIN ranked b ON a.nk = b.nk AND a.yr <> b.yr AND a.yr < b.yr
JOIN nation n ON a.nk = n.n_nationkey
"""


@_register(
    "nation_yearly_rank_shift",
    _RANK_SHIFT_ORACLE,
    doc="Nation revenue-rank movement between the corpus's first and "
    "last order year: rank within each year (units DESC, nationkey "
    "tie-break over exact integer 1/10000-currency units) and the "
    "gain — the market-share momentum table. The two year scalars are "
    "one broadcast row; ranking windows are per-year (25 rows each).",
)
def nation_yearly_rank_shift(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    nation = load_table(spark, sf, "nation")
    yr = orders.select(
        F.min(F.year("o_orderdate")).alias("y0"),
        F.max(F.year("o_orderdate")).alias("y1"),
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg((F.sum(dec(F.col("o_totalprice"))) * 10000).cast("bigint").alias("units"))
    )
    sel = rev.crossJoin(F.broadcast(yr)).where(
        (F.col("yr") == F.col("y0")) | (F.col("yr") == F.col("y1"))
    )
    ranked = sel.select(
        "nk",
        "yr",
        F.row_number()
        .over(Window.partitionBy("yr").orderBy(F.col("units").desc(), "nk"))
        .alias("rnk"),
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    j = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk")) & (F.col("a.yr") < F.col("b.yr")),
    )
    return (
        j.join(F.broadcast(nation), F.col("a.nk") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.col("a.rnk").cast("bigint").alias("rank_first"),
            F.col("b.rnk").cast("bigint").alias("rank_last"),
            (F.col("a.rnk") - F.col("b.rnk")).cast("bigint").alias("rank_gain"),
        )
    )


_QTY_MODE_ORACLE = """
WITH q AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT flag, qty, cnt,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cnt DESC, qty) AS rn
  FROM q
)
SELECT flag, qty AS modal_qty, cnt AS n_at_mode
FROM r WHERE rn = 1
"""


@_register(
    "quantity_mode_by_flag",
    _QTY_MODE_ORACLE,
    doc="Modal order quantity per return flag (tie → lowest quantity): "
    "the argmax-per-key discipline on the quantity histogram — mode is "
    "the one central statistic SQL has no aggregate for, so it is a "
    "count aggregate + ROW_NUMBER pick, never a self-join.",
)
def quantity_mode_by_flag(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    q = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    r = q.select(
        "flag",
        "qty",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("flag").orderBy(F.col("cnt").desc(), "qty"))
        .alias("rn"),
    )
    return r.where(F.col("rn") == 1).select(
        "flag", F.col("qty").alias("modal_qty"), F.col("cnt").alias("n_at_mode")
    )


_PRICE_BAND_DISCOUNT_ORACLE = """
SELECT CAST(floor(p.p_retailprice) AS BIGINT) // 500 AS price_band,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_discount AS DECIMAL(18,4))) * 1000 / COUNT(*)
            AS DOUBLE) AS mean_discount_milli,
       CAST(floor(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


@_register(
    "price_band_discount_profile",
    _PRICE_BAND_DISCOUNT_ORACLE,
    doc="Discount behavior by part price band (500-currency bands): do "
    "expensive parts get discounted deeper? Discounts and revenue are "
    "summed as exact DECIMAL (the dec_sum contract); the mean discount "
    "is the exact decimal sum scaled by 1000 and divided once — the "
    "single IEEE division both engines perform identically. Revenue is "
    "emitted as exact integer cents (floored), not a double: a whole-"
    "band money sum needs 17 significant digits, where the two engines' "
    "decimal→double conversions can land on adjacent doubles.",
)
def price_band_discount_profile(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.groupBy(
        # floor() before the BIGINT cast: DuckDB's double→BIGINT cast
        # ROUNDS while Spark's truncates — floor makes both engines agree
        # on boundary prices (…999.6 stays in the lower band).
        F.expr("CAST(floor(p_retailprice) AS BIGINT) div 500").alias("price_band")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        # exact decimal numerator, ONE IEEE division (duck divides decimal
        # by count in double; dividing in Spark's decimal arithmetic would
        # truncate scale before the double cast and disagree in the tail)
        ((F.sum(dec(F.col("l_discount"))) * 1000).cast("double") / F.count(F.lit(1)))
        .alias("mean_discount_milli"),
        F.expr(
            "CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
            " * (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT)"
        ).alias("revenue_cents"),
    )


_SUPP_SIGN_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS negative_ppm,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@_register(
    "supplier_balance_health",
    _SUPP_SIGN_ORACLE,
    doc="Supplier account-balance health per nation: how many suppliers "
    "are in the red, their ppm share, and the exact DECIMAL net "
    "balance — the credit-risk rollup next to "
    "supplier_nation_balance_share's volume view. Broadcast 25-row "
    "dim join.",
)
def supplier_balance_health(spark: SparkSession, sf: str) -> DataFrame:
    sup = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.expr(
                "sum(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) * 1000000"
                " div count(1)"
            ).alias("negative_ppm"),
            dec_sum(F.col("s_acctbal")).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------

_SENTENCE_ORACLE = """
WITH s AS (
  SELECT source,
         length(regexp_replace(text, '[^.!?]', '', 'g')) AS n_marks,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_words
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_marks) AS BIGINT) AS n_marks,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_words) * 1000 // greatest(SUM(n_marks), 1) AS BIGINT)
         AS words_per_sentence_milli
FROM s GROUP BY source
"""


@_register(
    "doc_sentence_stats",
    _SENTENCE_ORACLE,
    doc="Sentence-length proxy per source: terminal punctuation marks "
    "(.!?) as sentence delimiters, words-per-sentence in exact integer "
    "milli — long run-on text and list-like boilerplate separate "
    "cleanly on this axis. Pure projection + one source-keyed "
    "aggregate.",
)
def doc_sentence_stats(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    s = docs.select(
        "source",
        F.length(F.regexp_replace(F.col("text"), r"[^.!?]", "")).alias("n_marks"),
        F.size(words(F.col("text"))).alias("n_words"),
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_marks").cast("bigint").alias("n_marks"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.expr("sum(n_words) * 1000 div greatest(sum(n_marks), 1)").alias(
            "words_per_sentence_milli"
        ),
    )


def _df_bucket_case(col: str) -> str:
    """Power-of-two doc-frequency bucket, identical SQL on both engines
    (no float log2 — its rounding at exact powers is engine-dependent)."""
    return (
        f"CASE WHEN {col} = 1 THEN 0"
        f" WHEN {col} < 4 THEN 1"
        f" WHEN {col} < 8 THEN 2"
        f" WHEN {col} < 16 THEN 3"
        f" WHEN {col} < 32 THEN 4"
        f" WHEN {col} < 64 THEN 5"
        f" WHEN {col} < 128 THEN 6"
        f" ELSE 7 END"
    )


_ZIPF_ORACLE = f"""
WITH dw AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
), df AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dw GROUP BY w
)
SELECT CAST({_df_bucket_case("df")} AS INTEGER) AS df_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(df) AS BIGINT) AS n_doc_pairs
FROM df GROUP BY 1
"""


@_register(
    "word_df_zipf_buckets",
    _ZIPF_ORACLE,
    doc="Vocabulary doc-frequency spectrum in power-of-two buckets — the "
    "Zipf audit (hapax mass vs head mass) that sizes stopword lists "
    "and min-df cuts. Bucketing is an explicit CASE ladder, NOT "
    "float log2 (whose rounding at exact powers differs per engine); "
    "the (doc, word) relation distinct-reduces before the word-keyed "
    "count.",
)
def word_df_zipf_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    dw = docs.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("w")
    ).distinct()
    df = dw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    return df.groupBy(
        F.expr(_df_bucket_case("df")).cast("int").alias("df_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("df").cast("bigint").alias("n_doc_pairs"),
    )


_TOKEN_BUDGET_ORACLE = """
WITH t AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), r AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source) AS rnk,
         SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         SUM(n_tokens) OVER () AS total
  FROM t
)
SELECT source, n_tokens, CAST(rnk AS BIGINT) AS rnk,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_tokens * 1000000 // total AS BIGINT) AS cum_share_ppm
FROM r
"""


@_register(
    "token_budget_by_source",
    _TOKEN_BUDGET_ORACLE,
    doc="Token budget ledger: sources ranked by whitespace-token volume "
    "with cumulative share — 'the top k sources hold X% of the corpus' "
    "is the first line of any mix plan. The global window runs on the "
    "per-source AGGREGATE (≤ #sources rows), never row-grain data.",
)
def token_budget_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    t = docs.groupBy("source").agg(
        F.sum(F.size(words(F.col("text")))).cast("bigint").alias("n_tokens")
    )
    wo = Window.orderBy(F.col("n_tokens").desc(), "source")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    r = t.select(
        "source",
        "n_tokens",
        F.row_number().over(wo).cast("bigint").alias("rnk"),
        F.sum("n_tokens").over(wc).cast("bigint").alias("cum_tokens"),
        F.sum("n_tokens").over(wt).alias("total"),
    )
    return r.select(
        "source",
        "n_tokens",
        "rnk",
        "cum_tokens",
        F.expr("cum_tokens * 1000000 div total").alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# ANN index-balance faces
# ---------------------------------------------------------------------------


def _ivf_balance_oracle() -> str:
    from cve_manager_spark.plans.round8 import _ivf_assign_oracle

    return f"""
SELECT list_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER () AS BIGINT)
         AS share_ppm
FROM ({_ivf_assign_oracle(16)}) t
GROUP BY list_id
"""


@_register(
    "ivf_list_balance",
    None,  # assembled lazily below
    doc="IVF cell-occupancy balance: vectors per coarse cell with ppm "
    "share — the index-health metric that predicts probe cost variance "
    "(one hot cell = one straggler partition at query time). Wraps "
    "the verified ivf_assignments face in a list-keyed count.",
)
def ivf_list_balance(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round8 import ivf_assignments

    asg = ivf_assignments(spark, sf)
    c = asg.groupBy("list_id").agg(F.count(F.lit(1)).alias("n_vecs"))
    wt = Window.partitionBy()
    return c.select(
        "list_id",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.expr("n_vecs * 1000000").cast("bigint").alias("_num"),
        F.sum("n_vecs").over(wt).alias("_tot"),
    ).select(
        "list_id",
        "n_vecs",
        F.expr("_num div _tot").alias("share_ppm"),
    )


def _pq_balance_oracle() -> str:
    from cve_manager_spark.plans.semantic import _pq_codes_oracle

    return f"""
SELECT CAST(u.j AS INTEGER) AS subspace, CAST(u.c AS INTEGER) AS code,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM ({_pq_codes_oracle()}) base,
     UNNEST([struct_pack(j := 0, c := base.code_0),
             struct_pack(j := 1, c := base.code_1),
             struct_pack(j := 2, c := base.code_2),
             struct_pack(j := 3, c := base.code_3)]) t(u)
GROUP BY 1, 2
"""


@_register(
    "pq_code_balance",
    None,  # assembled lazily below
    doc="Product-quantizer codebook utilization: vectors per (subspace, "
    "code) — dead or hot codes mean the codebook wastes bits and ADC "
    "distances lose resolution. Wraps the verified pq_codes face in "
    "an unpivot + count; 32-row output (4 subspaces × 8 codes).",
)
def pq_code_balance(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.semantic import pq_codes

    base = pq_codes(spark, sf)
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"code_{j}").alias("c")
                    )
                    for j in range(4)
                ]
            )
        ).alias("u")
    ).select(
        F.col("u.j").cast("int").alias("subspace"),
        F.col("u.c").cast("int").alias("code"),
    )
    return rows.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )


def _finalize() -> None:
    """Attach the oracles that need lazy imports (round8 / semantic CTE
    builders) — done once at module import, keeping SPECS declarative."""
    lazy = {
        "phash_hamming_hist": _phash_cte() + _PHASH_HIST_ORACLE_TAIL,
        "image_phash_bit_balance": _phash_cte() + _BIT_BALANCE_ORACLE_TAIL,
        "image_dup_cluster_sizes": _phash_cte() + _PHASH_CLUSTER_ORACLE_TAIL,
        "ivf_list_balance": _ivf_balance_oracle(),
        "pq_code_balance": _pq_balance_oracle(),
    }
    for i, spec in enumerate(SPECS):
        if spec.name in lazy:
            SPECS[i] = QuerySpec(
                name=spec.name,
                build=spec.build,
                oracle=lazy[spec.name],
                doc=spec.doc,
                tags=spec.tags,
                priority=spec.priority,
            )


_finalize()
