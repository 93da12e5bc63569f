"""Round-6 tranche: corpus linguistics, behavioral analytics, and
embedding diagnostics — 23 oracle-paired specs + 2 rows-only
(``ann_pq_rerank`` and ``bpe_fertility``).

Families:

1. **Corpus linguistics over ``documents``** — word-length profiles,
   digit density, unigram entropy, duplicate-cluster morphology,
   cross-source vocabulary overlap, prefix-collision detection: the
   descriptive layer a training-data curator reads before deciding
   filters.
2. **Behavioral analytics over ``events``** — value deciles, session
   durations, weekly cohort retention, type co-occurrence, DAU/WAU
   stickiness (windowed distinct users via the explode-offsets
   rewrite, the scale-safe alternative to a range self-join).
3. **Warehouse reporting over the TPC-H star** — top-k per group,
   long-tail histograms, discount-band economics, segment mix, brand
   morphology, nation shares, monthly momentum, returns.
4. **Embedding diagnostics over ``embeddings``** — norm z-score
   outliers, per-label centroid drift, per-dimension extremes; plus
   the rows-only `ann_pq_rerank` face of the PQ retrieve-then-rerank
   operator.

Determinism contract (plans/spec.py): exact DECIMAL money sums, integer
ppm ratios, per-term 6dp rounding before any decimal-summed transcendental
(the text_tfidf precedent), total orders before every LIMIT/rank. All
specs carried ``priority=8`` while queued; priorities were collapsed to 0
in round 7 once the backlog cleared (tier + stable module order now
drives the verification queue). 27 + 23 filled the round-6 driver window of 50 exactly.
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
# 1. corpus linguistics
# ---------------------------------------------------------------------------

_WORD_LEN_ORACLE = """
WITH t AS (
  SELECT source,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
  FROM documents
), p AS (
  SELECT source,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS sum_len,
         CAST(COALESCE(list_max(list_transform(w, x -> length(x))), 0) AS BIGINT) AS max_len
  FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(MAX(max_len) AS BIGINT) AS max_word_len,
       CAST(SUM(sum_len) AS DOUBLE) / SUM(n_words) AS avg_word_len
FROM p GROUP BY source
"""


@_register(
    "text_word_len_profile",
    _WORD_LEN_ORACLE,
    doc="Per-source word-length morphology: token counts, the longest "
    "token, and exact average word length (bigint length sums divided "
    "once). One narrow tokenize pass + one hash aggregate on source — "
    "the length profile that flags machine-generated or concatenated "
    "text before any model sees it.",
)
def text_word_len_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    from cve_manager_spark.operators.text import words

    lens = F.transform(words(F.col("text")), lambda x: F.length(x))
    p = docs.select(
        "source",
        F.size(lens).cast("long").alias("n_words"),
        F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_len"),
        F.coalesce(F.array_max(lens), F.lit(0)).cast("long").alias("max_len"),
    )
    return p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.max("max_len").alias("max_word_len"),
        (F.sum("sum_len").cast("double") / F.sum("n_words")).alias("avg_word_len"),
    )


_DIGIT_ORACLE = """
SELECT lang,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT)
         AS n_digits,
       CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) * 1000000
            // SUM(length(text)) AS BIGINT) AS digit_ppm
FROM documents GROUP BY lang
"""


@_register(
    "text_digit_density",
    _DIGIT_ORACLE,
    doc="Digit-character density per language in exact integer ppm — "
    "the cheap detector for tables/logs/serial dumps masquerading as "
    "prose. Single scan, one aggregate; the regex strip runs JVM-side.",
)
def text_digit_density(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("long")
    chars = F.length("text").cast("long")
    return (
        docs.select("lang", chars.alias("c"), digits.alias("d"))
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_chars"),
            F.sum("d").alias("n_digits"),
            F.expr("sum(d) * 1000000 div sum(c)").alias("digit_ppm"),
        )
    )


_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS word
  FROM documents
), cnt AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, word
), tot AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n_types
  FROM cnt GROUP BY lang
)
SELECT cnt.lang,
       CAST(MAX(tot.t) AS BIGINT) AS n_tokens,
       CAST(MAX(tot.n_types) AS BIGINT) AS n_types,
       CAST(SUM(CAST(ROUND(
         -(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
           * ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS entropy
FROM cnt JOIN tot ON cnt.lang = tot.lang
GROUP BY cnt.lang
"""


@_register(
    "unigram_entropy_by_lang",
    _ENTROPY_ORACLE,
    doc="Shannon entropy of the unigram distribution per language — the "
    "diversity statistic that separates natural prose from template "
    "spam. Each -p·ln(p) term is rounded to 6dp and summed as exact "
    "DECIMAL (the text_tfidf transcendental precedent), so the result "
    "is order-independent; token counts and the totals join carry "
    "exact integers. Two hash aggregates + one broadcast-able join on "
    "lang.",
)
def unigram_entropy_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    tok = docs.select(
        "lang", F.explode(words(F.lower(F.col("text")))).alias("word")
    )
    cnt = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        cnt.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.max("t").alias("n_tokens"),
            F.max("n_types").alias("n_types"),
            F.sum(term).cast("double").alias("entropy"),
        )
    )


_DUPLEN_ORACLE = """
WITH g AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS n_dups,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(MIN(doc_id) AS BIGINT) AS keep_id
  FROM documents GROUP BY text HAVING COUNT(*) >= 2
)
SELECT n_dups,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sum_chars) AS BIGINT) AS total_chars,
       CAST(MIN(keep_id) AS BIGINT) AS first_keep_id
FROM g GROUP BY n_dups
"""


@_register(
    "dup_cluster_length_stats",
    _DUPLEN_ORACLE,
    doc="Morphology of exact-duplicate clusters: for each cluster SIZE, "
    "how many clusters exist and how many characters they pin — the "
    "report that says whether dedup savings come from a few giant "
    "boilerplate clusters or a long tail of pairs. Two chained hash "
    "aggregates (text digest grain, then size grain), all integers — "
    "the length-weighted companion to dup_cluster_size_hist.",
)
def dup_cluster_length_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    g = (
        docs.groupBy("text")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_dups") >= 2)
    )
    return g.groupBy("n_dups").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sum_chars").alias("total_chars"),
        F.min("keep_id").alias("first_keep_id"),
    )


_VOCAB_OVERLAP_ORACLE = """
WITH d AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))
           AS word
  FROM documents
), sz AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS common
  FROM d a JOIN d b ON a.word = b.word AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, common,
       CAST(common * 1000000 // (sa.n + sb.n - common) AS BIGINT)
         AS jaccard_ppm
FROM pairs
JOIN sz sa ON sa.source = source_a
JOIN sz sb ON sb.source = source_b
"""


@_register(
    "source_vocab_overlap",
    _VOCAB_OVERLAP_ORACLE,
    doc="Pairwise vocabulary Jaccard between sources in exact integer "
    "ppm — the corpus-mixing diagnostic (two crawls sharing 90% of "
    "their vocabulary add less diversity than their row counts "
    "suggest). The (source, word) relation is distinct-deduped ONCE, "
    "then the pair join is word-bucketed exactly like the shingle "
    "dedup joins (never all-pairs over documents); vocabulary sizes "
    "join back as a broadcast.",
)
def source_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source", F.explode(words(F.lower(F.col("text")))).alias("word")
    ).distinct()
    sz = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("source").alias("source_a"), "word")
    b = d.select(F.col("source").alias("source_b"), "word")
    pairs = (
        a.join(b, ["word"])
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "common",
            F.expr("common * 1000000 div (na + nb - common)").alias("jaccard_ppm"),
        )
    )


_PREFIX_ORACLE = """
SELECT md5(substring(text, 1, 40)) AS prefix_md5,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts
FROM documents
GROUP BY md5(substring(text, 1, 40))
HAVING COUNT(*) >= 2
"""


@_register(
    "doc_prefix_collision",
    _PREFIX_ORACLE,
    doc="Shared-prefix detector: documents opening with the same 40 "
    "characters (boilerplate headers, templated intros) grouped by "
    "prefix digest, with how many distinct full texts hide behind each "
    "— prefix-equal but text-distinct groups are the near-dup seeds "
    "exact dedup misses. One aggregate on a 16-byte digest key (the "
    "prefix itself never shuffles).",
)
def doc_prefix_collision(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        docs.groupBy(F.md5(F.substring("text", 1, 40)).alias("prefix_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.countDistinct("text").alias("n_distinct_texts"),
        )
        .where(F.col("n_docs") >= 2)
    )


_CPW_ORACLE = """
WITH p AS (
  SELECT n_chars,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
              AS BIGINT) AS n_words
  FROM documents
)
SELECT LEAST(CAST(n_chars AS BIGINT) // n_words, 12) AS cpw_band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM p WHERE n_words > 0 GROUP BY 1
"""


@_register(
    "chars_per_word_hist",
    _CPW_ORACLE,
    doc="Histogram of documents by integer chars-per-word band (capped "
    "at 12+): the compactness profile that flags CJK-like scripts, "
    "URL dumps and minified blobs in one readout. Integer division "
    "keeps banding exact; one scan, one small aggregate.",
)
def chars_per_word_hist(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    p = docs.select(
        "n_chars", F.size(words(F.col("text"))).cast("long").alias("n_words")
    ).where(F.col("n_words") > 0)
    band = F.least(F.expr("n_chars div n_words").cast("long"), F.lit(12).cast("long"))
    return p.groupBy(band.alias("cpw_band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# 2. behavioral analytics
# ---------------------------------------------------------------------------

_DECILES_ORACLE = """
WITH d AS (
  SELECT event_type, value, event_id,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS decile
  FROM events
)
SELECT event_type, CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM d GROUP BY event_type, decile
"""


@_register(
    "event_value_deciles_by_type",
    _DECILES_ORACLE,
    doc="Per-type value deciles: ntile over a total order (value, "
    "event_id — the unique tie-break the determinism contract "
    "requires), then per-decile count/min/max and an exact DECIMAL "
    "sum. The window partitions by event_type and its exchange is "
    "reused by the following aggregate. Exact ntile sorts each type's "
    "full volume — at 100 TB swap in the rank-selection recipe "
    "(value-histogram aggregate + in-row quantile fold, the "
    "median_exact/winsorize_stats plan) or approx_percentile; this "
    "spec is the exact-semantics face.",
)
def event_value_deciles_by_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    d = ev.select(
        "event_type", "value", F.ntile(10).over(w).cast("long").alias("decile")
    )
    return d.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dec_sum(F.col("value")).alias("sum_value"),
    )


_SESS_HIST_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx,
         ts
  FROM g
), d AS (
  SELECT user_id, session_idx,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000 AS dur_min
  FROM s GROUP BY user_id, session_idx
)
SELECT LEAST(dur_min // 10, 12) AS dur_band,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MIN(dur_min) AS BIGINT) AS min_minutes,
       CAST(MAX(dur_min) AS BIGINT) AS max_minutes
FROM d GROUP BY 1
"""


@_register(
    "session_duration_hist",
    _SESS_HIST_ORACLE,
    doc="Session-duration histogram in 10-minute bands (capped at 2h+): "
    "gap-based sessionization (30-min silence, the sessionize_stats "
    "recipe) reduced to the distribution product managers actually "
    "read. Every stage partitions on user_id until the final tiny "
    "band aggregate; durations are exact integer microseconds "
    "floor-divided to minutes.",
)
def session_duration_hist(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | (us - prev > 1_800_000_000), 1).otherwise(0)
    s = ev.select(
        "user_id", "ts", "event_id", new_sess.alias("new_sess")
    ).withColumn(
        "session_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    d = s.groupBy("user_id", "session_idx").agg(
        F.expr(
            "(unix_micros(cast(max(ts) as timestamp))"
            " - unix_micros(cast(min(ts) as timestamp))) div 60000000"
        ).alias("dur_min")
    )
    band = F.least(F.expr("dur_min div 10"), F.lit(12).cast("long"))
    return d.groupBy(band.alias("dur_band")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.min("dur_min").alias("min_minutes"),
        F.max("dur_min").alias("max_minutes"),
    )


_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
), r AS (
  SELECT f.user_id, CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
         MAX(CASE WHEN e.ts >= f.first_ts + INTERVAL 7 DAY
                   AND e.ts < f.first_ts + INTERVAL 14 DAY
              THEN 1 ELSE 0 END) AS retained
  FROM f JOIN events e ON e.user_id = f.user_id
  GROUP BY f.user_id, CAST(date_trunc('week', f.first_ts) AS DATE)
)
SELECT cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(retained) AS BIGINT) AS n_retained,
       CAST(SUM(retained) * 1000000 // COUNT(*) AS BIGINT) AS retained_ppm
FROM r GROUP BY cohort_week
"""


@_register(
    "first_week_retention",
    _RETENTION_ORACLE,
    doc="Classic week-1 cohort retention: users grouped by the week of "
    "their first event; retained = any activity in days [7, 14). The "
    "first-touch relation joins back to events on user_id (both sides "
    "hash-partition on the key Spark already grouped by, so the "
    "exchange is reused); the ratio is exact integer ppm.",
)
def first_week_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    f = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = ev.join(f, "user_id")
    in_week2 = (
        (F.col("ts") >= F.col("first_ts") + F.expr("INTERVAL 7 DAY"))
        & (F.col("ts") < F.col("first_ts") + F.expr("INTERVAL 14 DAY"))
    )
    r = j.groupBy(
        "user_id", F.date_trunc("week", F.col("first_ts")).cast("date").alias("cohort_week")
    ).agg(F.max(F.when(in_week2, 1).otherwise(0)).alias("retained"))
    return r.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("retained").alias("n_retained"),
        F.expr("sum(retained) * 1000000 div count(1)").alias("retained_ppm"),
    )


_COOC_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


@_register(
    "events_type_cooccurrence",
    _COOC_ORACLE,
    doc="Event-type co-occurrence: how many users perform both types, "
    "for every unordered type pair — the adjacency matrix behind "
    "next-action models. The distinct (user, type) relation is tiny "
    "relative to events (bounded by users × type cardinality), and "
    "the self-join keys on user_id, reusing the distinct's exchange.",
)
def events_type_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    d = ev.select("user_id", "event_type").distinct()
    a = d.select("user_id", F.col("event_type").alias("type_a"))
    b = d.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, ["user_id"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_STICKINESS_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), expanded AS (
  SELECT du.day + CAST(o.i AS INTEGER) AS w_day, du.user_id
  FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS i) o
), wau AS (
  SELECT w_day AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM expanded GROUP BY w_day
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau ON dau.day = wau.day
"""


@_register(
    "dau_wau_stickiness",
    _STICKINESS_ORACLE,
    doc="DAU/WAU stickiness per day via the explode-offsets rewrite: "
    "each (day, user) activity row is replicated to the 7 trailing "
    "windows it belongs to, turning 'distinct users over a 7-day "
    "RANGE' — a window no engine can evaluate distinctly, and a range "
    "self-join that degenerates to a nested loop — into a plain "
    "hash-partitioned COUNT(DISTINCT) per day. Cost is a bounded 7× "
    "replication of the (day, user) relation, not of raw events; only "
    "days with activity are emitted (matching the oracle).",
)
def dau_wau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    expanded = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "user_id"
    ).select(F.date_add(F.col("day"), F.col("i")).alias("w_day"), "user_id")
    wau = expanded.groupBy(F.col("w_day").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "day").select(
        "day", "dau", "wau", F.expr("dau * 1000000 div wau").alias("stickiness_ppm")
    )


# ---------------------------------------------------------------------------
# 3. warehouse reporting
# ---------------------------------------------------------------------------

_TOP3_ORACLE = """
WITH rev AS (
  SELECT n.n_name, c.c_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey
), ranked AS (
  SELECT n_name, c_custkey, revenue,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey) AS rk
  FROM rev
)
SELECT n_name, CAST(rk AS BIGINT) AS rk, CAST(c_custkey AS BIGINT) AS c_custkey,
       revenue
FROM ranked WHERE rk <= 3
"""


@_register(
    "nation_top3_customers",
    _TOP3_ORACLE,
    doc="Top-3 customers by lifetime revenue per nation: star join with "
    "broadcast dims (customer, nation), exact DECIMAL revenue, then a "
    "rank window over (revenue DESC, custkey) — ties broken "
    "deterministically on the key, per the contract. The rank filter "
    "k=3 prunes before anything else reads the result.",
)
def nation_top3_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    rev = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(dec_sum(F.col("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), "c_custkey")
    return (
        rev.select(
            "n_name",
            F.row_number().over(w).cast("long").alias("rk"),
            "c_custkey",
            "revenue",
        ).where(F.col("rk") <= 3)
    )


_LPO_ORACLE = """
WITH c AS (
  SELECT o.o_orderkey, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines
  FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey
)
SELECT n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
FROM c GROUP BY n_lines
"""


@_register(
    "lines_per_order_hist",
    _LPO_ORACLE,
    doc="Order-width histogram (lineitems per order, INCLUDING zero-line "
    "orders via the left join — the rows an inner-join histogram "
    "silently drops): the fan-out statistic that sizes every "
    "order-grain shuffle. COUNT(l_orderkey) counts only matched "
    "lines, exactly as in the oracle.",
)
def lines_per_order_hist(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    c = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )
    return c.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("first_orderkey"),
    )


_DISCOUNT_ORACLE = """
SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS gross_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS net_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS discount_given
FROM lineitem GROUP BY 1
"""


@_register(
    "discount_band_revenue",
    _DISCOUNT_ORACLE,
    doc="Discount-band economics: gross/net revenue and discount spend "
    "per integer discount percent. The band key rounds the double "
    "discount to its stored percent (no floor-of-.9999 hazards); all "
    "money flows through exact DECIMAL products and sums, emitted as "
    "one final double each. Single scan, tiny aggregate.",
)
def discount_band_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    band = F.round(F.col("l_discount") * 100).cast("long")
    price = dec(F.col("l_extendedprice"))
    disc = dec(F.col("l_discount"))
    return li.groupBy(band.alias("discount_pct")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(price).cast("double").alias("gross_revenue"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("net_revenue"),
        F.sum(price * disc).cast("double").alias("discount_given"),
    )


_SEGMIX_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment, o.o_orderpriority
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS seg_total
  FROM j GROUP BY c_mktsegment
)
SELECT j.c_mktsegment, j.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) * 1000000 // MAX(seg.seg_total) AS BIGINT) AS share_ppm
FROM j JOIN seg ON j.c_mktsegment = seg.c_mktsegment
GROUP BY j.c_mktsegment, j.o_orderpriority
"""


@_register(
    "segment_priority_mix",
    _SEGMIX_ORACLE,
    doc="Order-priority mix per market segment with exact integer ppm "
    "shares: fact⋈broadcast-dim join, one aggregate at the "
    "(segment, priority) grain, segment totals joined back as a "
    "broadcast — the composition report that would read wrong under "
    "any floating-point share arithmetic.",
)
def segment_priority_mix(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    j = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", "o_orderpriority")
    seg = j.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("seg_total"))
    return (
        j.join(F.broadcast(seg), "c_mktsegment")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("count(1) * 1000000 div max(seg_total)").alias("share_ppm"),
        )
    )


_BRAND_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
       CAST(MAX(p_size) AS BIGINT) AS max_size,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
         / COUNT(*) AS avg_price
FROM part GROUP BY p_brand
"""


@_register(
    "part_brand_size_stats",
    _BRAND_ORACLE,
    doc="Catalog morphology per brand: part count, size diversity, and "
    "exact average retail price (DECIMAL sum divided once). Scan + "
    "one aggregate with a distinct-count — the dimension-table health "
    "check run before trusting any brand-grain rollup.",
)
def part_brand_size_stats(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.max("p_size").cast("long").alias("max_size"),
        (F.sum(dec(F.col("p_retailprice"))).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        ),
    )


_NATION_SHARE_ORACLE = """
WITH nb AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS bal
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
), tot AS (
  SELECT SUM(bal) AS total_bal FROM nb
)
SELECT n_name, n_suppliers,
       CAST(bal AS DOUBLE) AS balance,
       CAST(bal AS DOUBLE) / CAST(total_bal AS DOUBLE) AS share
FROM nb CROSS JOIN tot
"""


@_register(
    "supplier_nation_balance_share",
    _NATION_SHARE_ORACLE,
    doc="Supplier account-balance share per nation: exact DECIMAL "
    "balances per nation, the corpus total joined as a broadcast "
    "1-row relation (the stats-total crossJoin pattern — never a "
    "driver-side scalar), shares as one double division of two exact "
    "values.",
)
def supplier_nation_balance_share(spark: SparkSession, sf: str) -> DataFrame:
    sup = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    nb = (
        sup.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec(F.col("s_acctbal"))).alias("bal"),
        )
    )
    tot = nb.agg(F.sum("bal").alias("total_bal"))
    return nb.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_suppliers",
        F.col("bal").cast("double").alias("balance"),
        (F.col("bal").cast("double") / F.col("total_bal").cast("double")).alias(
            "share"
        ),
    )


_MOMENTUM_ORACLE = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec - LAG(rev_dec) OVER w AS DOUBLE) AS mom_delta,
       CAST(SUM(rev_dec) OVER (ORDER BY month
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 3 AS ma3
FROM m WINDOW w AS (ORDER BY month)
"""


@_register(
    "monthly_revenue_momentum",
    _MOMENTUM_ORACLE,
    doc="Monthly revenue with month-over-month delta and a trailing "
    "3-month moving average: the window math runs ON THE EXACT DECIMAL "
    "sums (lag-difference and 3-row sum stay exact; each emits one "
    "double) — running it on doubles would make every delta "
    "order-dependent. The single global window is over months "
    "(bounded rows), not orders.",
)
def monthly_revenue_momentum(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(dec(F.col("o_totalprice"))).alias("rev_dec"))
    w = Window.orderBy("month")
    ma_w = w.rowsBetween(-2, 0)
    return m.select(
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec") - F.lag("rev_dec").over(w)).cast("double").alias("mom_delta"),
        (F.sum("rev_dec").over(ma_w).cast("double") / F.lit(3)).alias("ma3"),
    )


_RETURNS_ORACLE = """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS returned_ppm,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         AS returned_value
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@_register(
    "returned_share_by_brand",
    _RETURNS_ORACLE,
    doc="Return-rate and value-at-return per brand: fact⋈broadcast-part "
    "join, conditional integer counts with exact ppm, conditional "
    "DECIMAL value sum — the quality report that decides recalls. "
    "One aggregate at brand grain.",
)
def returned_share_by_brand(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    ret_val = F.when(
        F.col("l_returnflag") == "R", dec(F.col("l_extendedprice"))
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(ret).alias("n_returned"),
            F.expr(
                "sum(case when l_returnflag = 'R' then 1 else 0 end)"
                " * 1000000 div count(1)"
            ).alias("returned_ppm"),
            F.sum(ret_val).cast("double").alias("returned_value"),
        )
    )


# ---------------------------------------------------------------------------
# 4. embedding diagnostics
# ---------------------------------------------------------------------------

_NORM_OUTLIER_ORACLE = """
WITH q AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
              * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
           AS BIGINT) AS norm2q
  FROM embeddings
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(norm2q) AS DOUBLE) AS s1,
         CAST(SUM(CAST(norm2q AS DECIMAL(38,0)) * norm2q) AS DOUBLE) AS s2
  FROM q
)
SELECT vec_id, norm2q,
       ROUND((norm2q - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS z
FROM q CROSS JOIN stats
WHERE abs((norm2q - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) >= 2
"""


@_register(
    "embedding_norm_zscore_outliers",
    _NORM_OUTLIER_ORACLE,
    doc="Vectors whose quantized squared L2 norm is ≥2σ from the corpus "
    "mean — the sanity gate that catches unnormalized or degenerate "
    "embeddings before any cosine math trusts them. Norms are exact "
    "BIGINTs (floor(x·1e6)² summed in-row), the corpus moments are "
    "exact (second moment accumulates in DECIMAL(38,0)), so mean/σ/z "
    "are bit-identical across engines and partitionings; z is rounded "
    "to 6dp for the hash. Stats ride as a broadcast 1-row relation.",
)
def embedding_norm_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import dot_self, quantize_vec

    emb = fan_out(load_table(spark, sf, "embeddings"))
    q = emb.select(
        "vec_id", dot_self(quantize_vec(F.col("embedding"))).alias("norm2q")
    )
    stats = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("norm2q").cast("double").alias("s1"),
        F.sum(F.col("norm2q").cast("decimal(38,0)") * F.col("norm2q"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("norm2q") - mean) / F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    return (
        q.crossJoin(F.broadcast(stats))
        .where(F.abs(z) >= 2)
        .select("vec_id", "norm2q", F.round(z, 6).alias("z"))
    )


_LABEL_CENTROID_ORACLE = """
WITH e AS (
  SELECT label, CAST(i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000)
              AS BIGINT) AS qv
  FROM embeddings CROSS JOIN range(1, 65) t(i)
), lbl AS (
  SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS s
  FROM e GROUP BY label, dim
), gsum AS (
  SELECT dim, CAST(SUM(s) AS BIGINT) AS g FROM lbl GROUP BY dim
), dots AS (
  SELECT label,
         CAST(SUM(CAST(s AS DECIMAL(38,0)) * g) AS DOUBLE) AS dot_lg,
         CAST(SUM(CAST(s AS DECIMAL(38,0)) * s) AS DOUBLE) AS dot_ll,
         CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DOUBLE) AS dot_gg
  FROM lbl JOIN gsum USING (dim) GROUP BY label
), n AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings GROUP BY label
)
SELECT dots.label, n.n_vecs,
       ROUND(dot_lg / (sqrt(dot_ll) * sqrt(dot_gg)), 6) AS centroid_cos
FROM dots JOIN n ON dots.label = n.label
"""


@_register(
    "label_centroid_cosine",
    _LABEL_CENTROID_ORACLE,
    doc="Cosine of each label's centroid direction against the global "
    "centroid — the class-drift diagnostic (a label pointing away "
    "from the corpus mean is either signal or contamination). "
    "Component sums are exact BIGINTs over quantized values "
    "(posexplode → (label, dim) grain, 64·|labels| rows), dot "
    "products accumulate in DECIMAL(38,0) (bigint·bigint at sf1 "
    "overflows long), and only the final cosine divides in double, "
    "rounded to 6dp. Un-normalized centroid SUMS share the direction "
    "of the mean, so the cosine is identical and no division by n "
    "ever happens.",
)
def label_centroid_cosine(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import quantize_vec

    emb = fan_out(load_table(spark, sf, "embeddings"))
    e = emb.select(
        "label", F.posexplode(quantize_vec(F.col("embedding"))).alias("dim0", "qv")
    ).select("label", (F.col("dim0") + 1).alias("dim"), "qv")
    lbl = e.groupBy("label", "dim").agg(F.sum("qv").alias("s"))
    glob = lbl.groupBy("dim").agg(F.sum("s").alias("g"))
    dots = (
        lbl.join(F.broadcast(glob), "dim")
        .groupBy("label")
        .agg(
            F.sum(F.col("s").cast("decimal(38,0)") * F.col("g"))
            .cast("double")
            .alias("dot_lg"),
            F.sum(F.col("s").cast("decimal(38,0)") * F.col("s"))
            .cast("double")
            .alias("dot_ll"),
            F.sum(F.col("g").cast("decimal(38,0)") * F.col("g"))
            .cast("double")
            .alias("dot_gg"),
        )
    )
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return dots.join(n, "label").select(
        "label",
        "n_vecs",
        F.round(
            F.col("dot_lg") / (F.sqrt(F.col("dot_ll")) * F.sqrt(F.col("dot_gg"))), 6
        ).alias("centroid_cos"),
    )


_EXTREMES_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS dim,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN range(1, 65) t(i)
), r AS (
  SELECT dim, vec_id, val,
         ROW_NUMBER() OVER (PARTITION BY dim ORDER BY val DESC, vec_id) AS rk
  FROM e
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(vec_id AS BIGINT) AS argmax_vec_id,
       val AS max_val
FROM r WHERE rk = 1
"""


@_register(
    "embedding_component_extremes",
    _EXTREMES_ORACLE,
    doc="Per-dimension maximum component and its argmax vector (ties "
    "broken on the smaller vec_id): the saturation probe that finds "
    "dimensions dominated by a single vector. Rank window partitions "
    "by dim (64 partitions of corpus-size rows — at scale, a "
    "max_by-style pre-aggregate per partition feeds the same answer); "
    "float32 values widen to float64 exactly, so cross-engine "
    "comparison is bitwise.",
)
def embedding_component_extremes(spark: SparkSession, sf: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf, "embeddings"))
    e = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim0", "val0")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.col("val0").cast("double").alias("val"),
    )
    w = Window.partitionBy("dim").orderBy(F.col("val").desc(), "vec_id")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("dim", F.col("vec_id").alias("argmax_vec_id"), F.col("val").alias("max_val"))
    )


@_register(
    "ann_pq_rerank",
    None,
    doc="PQ retrieve-then-rerank face (rows-only: codebook training is "
    "not SQL-expressible, but the pipeline is fully deterministic — "
    "integer Lloyd's codebooks, integer ADC, exact float64 re-rank "
    "with (score, id) tie-breaks): top-10 cosine neighbors of the "
    "vec_id=0 query via a 128-bit-per-vector code scan + C=50 exact "
    "re-rank. Recall vs exact audited in ANN_RECALL.json (0.97@128 "
    "bits at sf0.1); the C>=corpus == exact property is pinned in "
    "tests/test_ann_quality.py.",
)
def ann_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.similarity import pq_topk_rerank, pq_train

    emb = fan_out(load_table(spark, sf, "embeddings"))
    books = pq_train(emb, m=32, k=16)
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    corpus = emb.where(F.col("vec_id") != 0)
    return pq_topk_rerank(corpus, q, books, k=10, n_candidates=50)


@_register(
    "bpe_fertility",
    None,
    doc="Tokenizer-fertility report under a TRAINED BPE vocabulary "
    "(rows-only: merge training is iterative, not SQL-expressible; the "
    "apply rule is hand-verified and property-tested in "
    "tests/test_operators.py): train 12 merges on the corpus "
    "(operators/text.bpe_train — one corpus scan total), encode every "
    "document with them (bpe_apply — narrow Arrow map, per-batch word "
    "memo), and report per-language words, tokens, and exact integer "
    "tokens-per-word ppm. The fertility gap across languages is the "
    "classic under-trained-tokenizer diagnostic.",
)
def bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import bpe_apply, bpe_train

    docs = fan_out(load_table(spark, sf, "documents"))
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=12).orderBy("rank").collect()
    ]
    stats = bpe_apply(docs, merges)
    j = docs.select(F.col("doc_id").alias("id"), "lang").join(stats, "id")
    return j.groupBy("lang").agg(
        F.sum("n_words").alias("n_words"),
        F.sum("n_tokens").alias("n_tokens"),
        F.expr("sum(n_tokens) * 1000000 div sum(n_words)").alias("fertility_ppm"),
    )
