"""Round-7 tranche: 20 oracle-paired specs (queued behind the round-6
window while unverified; priorities collapsed to 0 in round 7) — lexical
diversity, dedup economics, behavioral moments, warehouse trend/mix
reporting, and embedding geometry.

Recurring determinism recipes (plans/spec.py contract):

- **Exact sufficient statistics**: correlations/variances come from
  integer-quantized inputs (cents / milli / micros) summed as exact
  DECIMAL, combined in ONE identical double expression at the end
  (the corr_regress precedent) — reproducible on any partitioning.
- **Per-term 6dp rounding before a decimal sum** wherever a per-row
  double (ratio-of-exact-ints) must be aggregated (the text_tfidf
  precedent): sums of raw doubles would be order-dependent.
- **isodow**: Spark ``weekday(ts) + 1`` == DuckDB ``isodow(ts)``
  (the events_dow_hour_heatmap pairing).
- Rank picks always order by a unique tie-break suffix.
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
# corpus linguistics II
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH cnt AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS word
  FROM documents
), c AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM cnt GROUP BY source, word
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * (SUM(c) - 1)), 9) AS simpson
FROM c GROUP BY source
"""


@_register(
    "text_simpson_diversity",
    _SIMPSON_ORACLE,
    doc="Simpson concentration index of the unigram distribution per "
    "source — the no-transcendental twin of unigram_entropy_by_lang: "
    "λ = Σ c(c−1) / (T(T−1)) is a ratio of exact integers (numerator "
    "summed in DECIMAL(38,0) — c² overflows bigint at corpus scale), "
    "so the only double is one identical final division, rounded 9dp. "
    "High λ = template/boilerplate-dominated source.",
)
def text_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    c = (
        docs.select("source", F.explode(words(F.lower(F.col("text")))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = F.sum("c")
    num = F.sum(F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)).cast("double")
    return c.groupBy("source").agg(
        t.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(num / (t.cast("double") * (t - F.lit(1))), 9).alias("simpson"),
    )


_SRC_LANG_ORACLE = """
WITH m AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
), st AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS src_total FROM m GROUP BY source
)
SELECT m.source, m.lang, m.n,
       CAST(m.n * 1000000 // st.src_total AS BIGINT) AS share_ppm
FROM m JOIN st ON m.source = st.source
"""


@_register(
    "source_lang_matrix",
    _SRC_LANG_ORACLE,
    doc="Source × language composition matrix with exact integer ppm "
    "row shares — the mixing table a corpus curator reads before "
    "setting per-source language filters. Two chained aggregates; the "
    "source totals join back as a broadcast.",
)
def source_lang_matrix(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    m = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    st = m.groupBy("source").agg(F.sum("n").alias("src_total"))
    return (
        m.join(F.broadcast(st), "source")
        .select(
            "source", "lang", "n",
            F.expr("n * 1000000 div src_total").alias("share_ppm"),
        )
    )


_PUNCT_ORACLE = """
SELECT source,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')))
            AS BIGINT) AS n_punct,
       CAST(SUM(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))) * 1000000
            // SUM(length(text)) AS BIGINT) AS punct_ppm
FROM documents GROUP BY source
"""


@_register(
    "text_punct_density",
    _PUNCT_ORACLE,
    doc="Punctuation/symbol density per source in exact integer ppm "
    "(everything outside [A-Za-z0-9 whitespace]) — flags markup dumps "
    "and code masquerading as prose; complements text_digit_density. "
    "One scan, JVM-side regex strip, tiny aggregate.",
)
def text_punct_density(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    punct = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", "")).cast("long")
    return (
        docs.select("source", F.length("text").cast("long").alias("c"), punct.alias("p"))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_chars"),
            F.sum("p").alias("n_punct"),
            F.expr("sum(p) * 1000000 div sum(c)").alias("punct_ppm"),
        )
    )


_LONGEST_ORACLE = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM r WHERE rk = 1
"""


@_register(
    "longest_doc_per_lang",
    _LONGEST_ORACLE,
    doc="Argmax per group with a deterministic tie-break: the longest "
    "document per language (ties to the smaller doc_id) — max_by's "
    "arbitrary-tie hazard avoided via the rank-1 window, the same "
    "contract as embedding_component_extremes.",
)
def longest_doc_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("lang", "doc_id", "n_chars")
    )


_WLEN_ORACLE = """
WITH w AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS word
  FROM documents
)
SELECT LEAST(CAST(length(word) AS BIGINT), 24) AS word_len,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
FROM w GROUP BY 1
"""


@_register(
    "word_len_hist",
    _WLEN_ORACLE,
    doc="Corpus-wide word-length histogram (capped at 24+) with per-band "
    "type counts — the tokenizer-design input (band mass decides "
    "character-coverage vs merge budget). Explode → one bounded-key "
    "aggregate with a distinct count.",
)
def word_len_hist(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    w = docs.select(F.explode(words(F.lower(F.col("text")))).alias("word"))
    band = F.least(F.length("word").cast("long"), F.lit(24).cast("long"))
    return w.groupBy(band.alias("word_len")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("word").alias("n_types"),
    )


_SAVINGS_ORACLE = """
WITH k AS (
  SELECT source, n_chars,
         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
              THEN 0 ELSE 1 END AS is_dup
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN is_dup = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS dup_chars,
       CAST(SUM(CASE WHEN is_dup = 1 THEN n_chars ELSE 0 END) * 1000000
            // SUM(n_chars) AS BIGINT) AS savings_ppm
FROM k GROUP BY source
"""


@_register(
    "dedup_savings_by_source",
    _SAVINGS_ORACLE,
    doc="Exact-dedup economics per source: how many documents and "
    "characters the min-id keep rule would drop — the report that "
    "prices a dedup pass before running it. The keeper id comes from a "
    "digest-grain AGGREGATE joined back on the 16-byte md5 (the text "
    "itself never keys an exchange, and both join sides share the "
    "digest partitioning) — the oracle's window form is semantically "
    "identical, but a window would buffer each duplicate CLUSTER in "
    "one task, and cluster sizes are exactly what this report exists "
    "to distrust. Savings are exact integer ppm.",
)
def dedup_savings_by_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").withColumn("__d", F.md5("text"))
    keep = docs.groupBy("__d").agg(F.min("doc_id").alias("__keep"))
    is_dup = F.when(F.col("doc_id") == F.col("__keep"), 0).otherwise(1)
    k = docs.join(keep, "__d").select("source", "n_chars", is_dup.alias("is_dup"))
    return k.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").alias("n_dup_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.col("is_dup") == 1, F.col("n_chars")).otherwise(0)).alias(
            "dup_chars"
        ),
        F.expr(
            "sum(case when is_dup = 1 then n_chars else 0 end) * 1000000"
            " div sum(n_chars)"
        ).alias("savings_ppm"),
    )


# ---------------------------------------------------------------------------
# behavioral analytics II
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY n DESC, dow, hr) AS rk
  FROM c
)
SELECT event_type, dow AS peak_dow, hr AS peak_hr, n AS peak_events
FROM r WHERE rk = 1
"""


@_register(
    "events_hour_of_week_peak",
    _PEAK_ORACLE,
    doc="Peak hour-of-week per event type (ties to the earliest "
    "(dow, hr) slot): the heatmap's argmax face — the rank window "
    "sorts the 168-bounded bucket relation, never raw events.",
)
def events_hour_of_week_peak(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    c = ev.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "dow", "hr")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("dow").alias("peak_dow"),
            F.col("hr").alias("peak_hr"),
            F.col("n").alias("peak_events"),
        )
    )


_AUTOCORR_ORACLE = """
WITH s AS (
  SELECT event_type,
         CAST(floor(value * 1000) AS BIGINT) AS v,
         LAG(CAST(floor(value * 1000) AS BIGINT)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS pv
  FROM events
), p AS (
  SELECT event_type, v, pv FROM s WHERE pv IS NOT NULL
), m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(v AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(pv AS DECIMAL(19,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(v AS DECIMAL(19,0)) * pv) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(v AS DECIMAL(19,0)) * v) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(pv AS DECIMAL(19,0)) * pv) AS DOUBLE) AS syy
  FROM p GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            * 1000000.0) AS BIGINT) AS autocorr_micro
FROM m
"""


@_register(
    "events_lag1_value_autocorr",
    _AUTOCORR_ORACLE,
    doc="Lag-1 autocorrelation of event values per type (time-ordered "
    "with the event_id tie-break): the memory/burstiness statistic. "
    "Values quantize to exact milli integers, the lag pairs feed the "
    "corr_regress sufficient-statistics recipe (five DECIMAL moment "
    "sums, one identical double combine, floored micro units) — "
    "reproducible on any partitioning; the window and aggregate share "
    "the event_type exchange.",
)
def events_lag1_value_autocorr(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select("event_type", "ts", "event_id", v.alias("v")).withColumn(
        "pv", F.lag("v").over(w)
    )
    p = s.where(F.col("pv").isNotNull()).select("event_type", "v", "pv")
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    m = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("v"))).cast("double").alias("sx"),
        F.sum(d(F.col("pv"))).cast("double").alias("sy"),
        F.sum(d(F.col("v")) * F.col("pv")).cast("double").alias("sxy"),
        F.sum(d(F.col("v")) * F.col("v")).cast("double").alias("sxx"),
        F.sum(d(F.col("pv")) * F.col("pv")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "event_type", "n",
        F.floor(corr * 1000000.0).cast("long").alias("autocorr_micro"),
    )


_CV_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
), p AS (
  SELECT user_id, CAST(gap AS BIGINT) AS gap FROM g WHERE gap IS NOT NULL
), m AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(gap AS DECIMAL(19,0)) * gap) AS DOUBLE) AS s2
  FROM p GROUP BY user_id HAVING COUNT(*) >= 3
)
SELECT user_id, n,
       CAST(floor(s1 / n) AS BIGINT) AS mean_gap_us,
       CAST(floor(sqrt((n * s2 - s1 * s1)) / s1 * 1000000.0) AS BIGINT)
         AS cv_micro
FROM m
"""


@_register(
    "user_inter_event_cv",
    _CV_ORACLE,
    doc="Coefficient of variation of inter-event gaps per user (≥3 gaps): "
    "CV ≈ 1 is Poisson-random arrival, CV >> 1 is bursty — the "
    "per-entity regularity screen. Gaps are exact integer "
    "microseconds; mean/σ come from two DECIMAL moment sums combined "
    "in one identical double expression (σ/μ computed as "
    "√(n·s2−s1²)/s1, avoiding a second divide), floored to micro "
    "units. Window and aggregate share the user_id exchange.",
)
def user_inter_event_cv(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select("user_id", (us - F.lag(us).over(w)).alias("gap"))
    p = g.where(F.col("gap").isNotNull())
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    m = (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d(F.col("gap"))).cast("double").alias("s1"),
            F.sum(d(F.col("gap")) * F.col("gap")).cast("double").alias("s2"),
        )
        .where(F.col("n") >= 3)
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return m.select(
        "user_id", "n",
        F.floor(s1 / n).cast("long").alias("mean_gap_us"),
        F.floor(F.sqrt(n * s2 - s1 * s1) / s1 * 1000000.0)
        .cast("long")
        .alias("cv_micro"),
    )


_TOPSHARE_ORACLE = """
WITH uv AS (
  SELECT CAST(ts AS DATE) AS day, user_id,
         CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), r AS (
  SELECT day, user_id, v,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY v DESC, user_id) AS rk,
         CAST(SUM(v) OVER (PARTITION BY day) AS BIGINT) AS day_total
  FROM uv
)
SELECT day, user_id AS top_user, v AS top_value_milli, day_total,
       CAST(v * 1000000 // day_total AS BIGINT) AS share_ppm
FROM r WHERE rk = 1 AND day_total > 0
"""


@_register(
    "events_daily_top_user_share",
    _TOPSHARE_ORACLE,
    doc="Whale detection: per day, the top user by exact milli-value and "
    "their integer-ppm share of the day's total. Rank and total "
    "windows both partition on day OVER the (day, user) pre-aggregate "
    "(bounded by actives, never raw events), reusing one exchange.",
)
def events_daily_top_user_share(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    uv = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).agg(F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("v"))
    w = Window.partitionBy("day")
    r = uv.select(
        "day", "user_id", "v",
        F.row_number().over(w.orderBy(F.col("v").desc(), "user_id")).alias("rk"),
        F.sum("v").over(w).alias("day_total"),
    )
    return (
        r.where((F.col("rk") == 1) & (F.col("day_total") > 0))
        .select(
            "day",
            F.col("user_id").alias("top_user"),
            F.col("v").alias("top_value_milli"),
            "day_total",
            F.expr("v * 1000000 div day_total").alias("share_ppm"),
        )
    )


_WEEKEND_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
         AS weekend_events,
       CAST(SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS weekend_ppm,
       CAST(SUM(CASE WHEN isodow(ts) >= 6
                 THEN CAST(floor(value * 1000) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS weekend_value_milli
FROM events GROUP BY event_type
"""


@_register(
    "events_weekend_share",
    _WEEKEND_ORACLE,
    doc="Weekend share of activity and value per event type (ISO dow ≥ 6), "
    "exact integer ppm and milli-value — the seasonality split feeding "
    "capacity planning. One conditional aggregate over the scan.",
)
def events_weekend_share(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    is_we = (F.weekday("ts") + 1) >= 6
    vmilli = F.floor(F.col("value") * 1000).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(is_we, 1).otherwise(0)).alias("weekend_events"),
        F.expr(
            "sum(case when weekday(ts) + 1 >= 6 then 1 else 0 end)"
            " * 1000000 div count(1)"
        ).alias("weekend_ppm"),
        F.sum(F.when(is_we, vmilli).otherwise(0)).alias("weekend_value_milli"),
    )


# ---------------------------------------------------------------------------
# warehouse reporting II
# ---------------------------------------------------------------------------

_BAND_MATRIX_ORACLE = """
SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT), 8) AS value_band,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS band_value
FROM orders GROUP BY 1, 2
"""


@_register(
    "order_value_band_matrix",
    _BAND_MATRIX_ORACLE,
    doc="Order-value band × priority mix (50k bands capped at 8+): both "
    "engines compute the identical double division before the floor, "
    "so banding is reproducible; values aggregate as exact DECIMAL. "
    "One scan, bounded-key aggregate.",
)
def order_value_band_matrix(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    band = F.least(
        F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(8).cast("long")
    )
    return orders.groupBy(
        band.alias("value_band"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("band_value"),
    )


_REPEAT_ORACLE = """
WITH c AS (
  SELECT c.c_mktsegment, o.o_custkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS repeat_ppm
FROM c GROUP BY c_mktsegment
"""


@_register(
    "customer_repeat_rate",
    _REPEAT_ORACLE,
    doc="Repeat-buyer rate per market segment in exact integer ppm: "
    "orders ⋈ broadcast customer, a per-customer count, then a "
    "segment rollup of the ≥2 flag — two chained aggregates whose "
    "second input is bounded by customers.",
)
def customer_repeat_rate(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    c = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_repeat"),
        F.expr(
            "sum(case when n >= 2 then 1 else 0 end) * 1000000 div count(1)"
        ).alias("repeat_ppm"),
    )


_PNAME_ORACLE = """
WITH w AS (
  SELECT unnest(string_split(p_name, ' ')) AS token FROM part
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY token HAVING COUNT(*) >= 5
"""


@_register(
    "part_name_token_freq",
    _PNAME_ORACLE,
    doc="Part-name vocabulary above support 5 — the dimension-text "
    "profile behind fuzzy-match blocking keys (fuzzy_pairs_levenshtein "
    "blocks on exactly these tokens). Explode + count, HAVING instead "
    "of a limit so no ordering is needed.",
)
def part_name_token_freq(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    w = part.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
    return (
        w.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 5)
    )


_PRESENCE_ORACLE = """
WITH s AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
), c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_nationkey
)
SELECT n.n_name,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.n_customers, 0) AS n_customers,
       CAST(CASE WHEN s.n_suppliers IS NOT NULL AND c.n_customers IS NOT NULL
            THEN 1 ELSE 0 END AS BIGINT) AS both_sides
FROM nation n
LEFT JOIN s ON n.n_nationkey = s.nk
LEFT JOIN c ON n.n_nationkey = c.nk
"""


@_register(
    "nation_actor_presence",
    _PRESENCE_ORACLE,
    doc="Marketplace-liquidity readout per nation: supplier and customer "
    "counts side by side with a both-sides flag, nations with neither "
    "kept at zero (LEFT joins off the dimension — an inner join would "
    "silently drop them). Aggregates run before the joins, so only "
    "nation-grain rows join.",
)
def nation_actor_presence(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    sup = load_table(spark, sf, "supplier")
    cust = load_table(spark, sf, "customer")
    s = sup.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("ns")
    )
    c = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    return (
        nation.join(F.broadcast(s), nation["n_nationkey"] == s["nk"], "left")
        .join(F.broadcast(c), nation["n_nationkey"] == c["nk"], "left")
        .select(
            "n_name",
            F.coalesce(F.col("ns"), F.lit(0)).alias("n_suppliers"),
            F.coalesce(F.col("nc"), F.lit(0)).alias("n_customers"),
            F.when(
                F.col("ns").isNotNull() & F.col("nc").isNotNull(), 1
            ).otherwise(0).cast("long").alias("both_sides"),
        )
    )


_QTREND_ORACLE = """
WITH q AS (
  SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
         o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT quarter, o_orderpriority, n_orders,
       n_orders - LAG(n_orders) OVER (PARTITION BY o_orderpriority
                                      ORDER BY quarter) AS qoq_delta
FROM q
"""


@_register(
    "orders_quarterly_priority_trend",
    _QTREND_ORACLE,
    doc="Quarterly order counts per priority with quarter-over-quarter "
    "integer deltas: lag over the quarter-grain aggregate (bounded "
    "rows), partitioned per priority; quarter truncation cast to DATE "
    "on both sides (the Spark date_trunc TZ hazard).",
)
def orders_quarterly_priority_trend(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    q = orders.groupBy(
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("quarter"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy("quarter")
    return q.select(
        "quarter", "o_orderpriority", "n_orders",
        (F.col("n_orders") - F.lag("n_orders").over(w)).alias("qoq_delta"),
    )


_TAXCORR_ORACLE = """
WITH v AS (
  SELECT l_linestatus,
         CAST(floor(l_discount * 10000) AS BIGINT) AS x,
         CAST(floor(l_tax * 10000) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DOUBLE) AS syy
  FROM v GROUP BY l_linestatus
)
SELECT l_linestatus, n,
       CAST(floor((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            * 1000000.0) AS BIGINT) AS corr_micro
FROM m
"""


@_register(
    "discount_tax_corr",
    _TAXCORR_ORACLE,
    doc="Pearson correlation between discount and tax per line status — "
    "the pricing-policy dependence check, same exact "
    "sufficient-statistics recipe as corr_regress (basis-point "
    "quantization, DECIMAL moment sums, one identical double combine, "
    "floored micro units).",
)
def discount_tax_corr(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    x = F.floor(F.col("l_discount") * 10000).cast("long")
    y = F.floor(F.col("l_tax") * 10000).cast("long")
    v = li.select("l_linestatus", x.alias("x"), y.alias("y"))
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    m = v.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).cast("double").alias("sx"),
        F.sum(d(F.col("y"))).cast("double").alias("sy"),
        F.sum(d(F.col("x")) * F.col("y")).cast("double").alias("sxy"),
        F.sum(d(F.col("x")) * F.col("x")).cast("double").alias("sxx"),
        F.sum(d(F.col("y")) * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "l_linestatus", "n",
        F.floor(corr * 1000000.0).cast("long").alias("corr_micro"),
    )


_BALBAND_ORACLE = """
WITH b AS (
  SELECT c_custkey,
         LEAST(GREATEST(CAST(floor(c_acctbal / 2000) AS BIGINT), -1), 5)
           AS bal_band
  FROM customer
), oc AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
)
SELECT b.bal_band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(COALESCE(oc.n, 0)) AS BIGINT) AS n_orders,
       CAST(SUM(COALESCE(oc.n, 0)) * 1000000 // COUNT(*) AS BIGINT)
         AS orders_per_customer_ppm
FROM b LEFT JOIN oc ON b.c_custkey = oc.o_custkey
GROUP BY b.bal_band
"""


@_register(
    "customer_balance_band_profile",
    _BALBAND_ORACLE,
    doc="Order intensity by account-balance band (2k bands clamped to "
    "[-1, 5]): customers with zero orders stay in their band via the "
    "LEFT join onto the per-customer order counts; the intensity is "
    "exact integer ppm (orders per customer × 1e6).",
)
def customer_balance_band_profile(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    band = F.least(
        F.greatest(F.floor(F.col("c_acctbal") / 2000).cast("long"), F.lit(-1)),
        F.lit(5).cast("long"),
    )
    b = cust.select("c_custkey", band.alias("bal_band"))
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return (
        b.join(oc, b["c_custkey"] == oc["o_custkey"], "left")
        .groupBy("bal_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("n_orders"),
            F.expr(
                "sum(coalesce(n, 0)) * 1000000 div count(1)"
            ).alias("orders_per_customer_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# embedding geometry II
# ---------------------------------------------------------------------------

_SIGN_ORACLE = """
SELECT CAST(i AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN embedding[CAST(i AS INT)] > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_positive,
       CAST(SUM(CASE WHEN embedding[CAST(i AS INT)] > 0 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS positive_ppm
FROM embeddings CROSS JOIN range(1, 65) t(i)
GROUP BY i
"""


@_register(
    "embedding_sign_balance",
    _SIGN_ORACLE,
    doc="Per-dimension sign balance in exact integer ppm: a dimension "
    "far from 50% positive is biased or dead — the cheap geometry "
    "screen before trusting hyperplane-style partitions of the space. "
    "Posexplode → bounded (64-key) aggregate; float32 sign tests are "
    "exact.",
)
def embedding_sign_balance(spark: SparkSession, sf: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf, "embeddings"))
    e = emb.select(F.posexplode("embedding").alias("dim0", "val")).select(
        (F.col("dim0") + 1).cast("long").alias("dim"), "val"
    )
    return e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("val") > 0, 1).otherwise(0)).alias("n_positive"),
        F.expr(
            "sum(case when val > 0 then 1 else 0 end) * 1000000 div count(1)"
        ).alias("positive_ppm"),
    )


_LABELDIST_ORACLE = """
WITH e AS (
  SELECT label, CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings CROSS JOIN range(1, 65) t(i)
), lbl AS (
  SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY label, dim
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b, a.n AS na, b.n AS nb,
         SUM((CAST(a.s AS DECIMAL(38,0)) * b.n - CAST(b.s AS DECIMAL(38,0)) * a.n)
             * (CAST(a.s AS DECIMAL(38,0)) * b.n - CAST(b.s AS DECIMAL(38,0)) * a.n))
           AS d2
  FROM lbl a JOIN lbl b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label, a.n, b.n
)
SELECT label_a, label_b,
       CAST(d2 AS DOUBLE)
         / (CAST(na * nb AS DOUBLE) * CAST(na * nb AS DOUBLE))
         AS centroid_dist2
FROM pairs
"""


@_register(
    "label_pair_centroid_dist",
    _LABELDIST_ORACLE,
    doc="Squared L2 distance between every pair of label centroids (in "
    "quantized units): the class-separability matrix behind "
    "SemDeDup-style cluster audits. Fully exact until ONE final "
    "division: the per-dim mean difference is cleared of its "
    "denominators — diff = s_a·n_b − s_b·n_a is an exact DECIMAL — "
    "its squares sum exactly, and dist² divides once by (n_a·n_b)² "
    "(itself exact in double). No rounding of doubles anywhere (the "
    "ROUND-on-double half-way gotcha this spec originally hit); the "
    "pair join is keyed on dim with label-bounded fan-out.",
)
def label_pair_centroid_dist(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import quantize_vec

    emb = fan_out(load_table(spark, sf, "embeddings"))
    e = emb.select(
        "label", F.posexplode(quantize_vec(F.col("embedding"))).alias("dim0", "qv")
    ).select("label", (F.col("dim0") + 1).cast("long").alias("dim"), "qv")
    lbl = e.groupBy("label", "dim").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = lbl.select(
        F.col("label").alias("label_a"), "dim",
        F.col("s").alias("sa"), F.col("n").alias("na"),
    )
    b = lbl.select(
        F.col("label").alias("label_b"), "dim",
        F.col("s").alias("sb"), F.col("n").alias("nb"),
    )
    diff = (
        F.col("sa").cast("decimal(38,0)") * F.col("nb")
        - F.col("sb").cast("decimal(38,0)") * F.col("na")
    )
    pairs = (
        a.join(b, ["dim"])
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b", "na", "nb")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    denom = (F.col("na") * F.col("nb")).cast("double")
    return pairs.select(
        "label_a", "label_b",
        (F.col("d2").cast("double") / (denom * denom)).alias("centroid_dist2"),
    )
