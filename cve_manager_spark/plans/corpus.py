"""Round-2 corpus/analytics queries: decontamination, sequence packing,
time-series gap fill, grouping sets, funnel/cohort analytics, vector
centroids and multi-query kNN.

These extend the training-data pipeline (SURVEY §2.8 / BASELINE.json
north_star) and the relational surface with the operations a pretraining
data platform runs daily: test-set decontamination before training,
token-budget sequence packing for the dataloader, zero-filled activity
resampling for monitoring, and funnel/retention analytics over the event
stream. Every spec is oracle-paired (DuckDB formula identical to the
Spark plan) and follows the determinism contract in plans/spec.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import dec, dec_sum, fan_out
from cve_manager_spark.operators import dedup as D
from cve_manager_spark.operators import similarity as S
from cve_manager_spark.operators import text as T
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = (), priority: int = 0):
    def deco(fn):
        SPECS.append(QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, priority=priority))
        return fn

    return deco


# ---------------------------------------------------------------------------
# training-data pipeline
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
    ELSE [] END) AS s
  FROM toks
), ex AS (SELECT doc_id, unnest(s) AS s FROM sh)
SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_hits
FROM ex c JOIN ex t ON c.s = t.s
WHERE c.doc_id % 97 <> 0 AND t.doc_id % 97 = 0
GROUP BY c.doc_id
"""


@_register(
    "decontaminate_ngram",
    _DECONTAM_ORACLE,
    doc="Test-set decontamination: corpus documents sharing any word n-gram "
    "with a held-out set (doc_id % 97 == 0 stands in for the eval set; "
    "n=3 here for test-corpus density — production uses 8-13). The "
    "held-out shingle set is orders of magnitude smaller than the corpus, "
    "so it broadcasts; the corpus side stays a narrow scan + explode and "
    "the only shuffle is the per-doc hit count — the shape that survives "
    "a 100 TB corpus against a fixed eval suite.",
)
def decontaminate_ngram(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    ex = docs.select(
        "doc_id", F.explode(D.word_shingles(F.col("text"), 3)).alias("s")
    )
    test = ex.where(F.col("doc_id") % 97 == 0).select("s").distinct()
    corpus = ex.where(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(test), "s")
        # per-doc shingles and the broadcast side are both distinct, so a
        # plain count equals COUNT(DISTINCT shared shingle)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


_PACK_ORACLE = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
         ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 8 AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id
FROM c
"""


@_register(
    "pack_sequences",
    _PACK_ORACLE,
    doc="Token-budget sequence packing: documents are hash-sharded (md5, "
    "same key as sample_hash), deterministically shuffled within the "
    "shard, and packed contiguously into 2048-token sequences via a "
    "running-total window (seq = floor(preceding_tokens / budget)) — the "
    "dataloader-side packing step of a pretraining pipeline. Packing is "
    "per-shard, so the window sort is hash-partitioned, never global; "
    "shard count is the parallelism dial at 100 TB.",
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    base = docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens"),
        (F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) % 8).alias(
            "shard"
        ),
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 2048).cast("bigint").alias("seq_id"),
    )


_CLUSTER_REP_ORACLE = """
WITH c AS (
  SELECT doc_id, n_chars,
         MIN(doc_id) OVER (PARTITION BY lang) AS component,
         COUNT(*) OVER (PARTITION BY lang) AS n_docs
  FROM documents
), r AS (
  SELECT component, n_docs, doc_id AS rep_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM c WHERE n_docs >= 2
)
SELECT component, rep_id, n_chars AS rep_n_chars, n_docs
FROM r WHERE rn = 1
"""


@_register(
    "dedup_cluster_rep",
    _CLUSTER_REP_ORACLE,
    doc="Canonical-document selection: connected components over near-dup "
    "edges (operators.graph — same chained edges as dedup_clusters, so "
    "components are exactly the ≥2-doc language groups and the oracle is "
    "closed-form), then keep the best document per cluster (max n_chars, "
    "min-id tie-break). This is the keep-rule half of near-dedup: cluster "
    "→ argmax, two windows partitioned on the component key.",
)
def dedup_cluster_rep(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.graph import connected_components

    docs = load_table(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        docs.select("doc_id", "lang")
        .withColumn("next_id", F.lead("doc_id").over(w))
        .where(F.col("next_id").isNotNull())
        .select(F.col("doc_id").alias("id_a"), F.col("next_id").alias("id_b"))
    )
    cc = connected_components(edges)
    j = cc.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    wc = Window.partitionBy("component")
    wr = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    return (
        j.withColumn("n_docs", F.count(F.lit(1)).over(wc))
        .withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") == 1)
        .select(
            "component",
            F.col("node").alias("rep_id"),
            F.col("n_chars").alias("rep_n_chars"),
            "n_docs",
        )
    )


_CENTROID_ORACLE = """
WITH e AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS micro
  FROM embeddings
)
SELECT label, CAST(pos AS INT) AS pos,
       CAST(SUM(micro) AS BIGINT) AS sum_micro, COUNT(*) AS n,
       CAST(SUM(micro) AS DOUBLE) / COUNT(*) / 1000000 AS centroid
FROM e GROUP BY label, pos
"""


@_register(
    "embedding_centroid",
    _CENTROID_ORACLE,
    doc="Per-label embedding centroid (class prototype / cluster center). "
    "Elements are floor-quantized to exact integer micro-units before the "
    "cross-row sum — floor has no rounding ties, so the aggregate is "
    "order-independent and bitwise identical across engines (the same "
    "reason dec_sum exists; decimal casts of floats CAN tie at the "
    "rounding digit). posexplode → one hash aggregate on (label, dim): "
    "partial aggregation makes the shuffle O(labels × dims), not O(rows).",
)
def embedding_centroid(spark: SparkSession, sf: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf, "embeddings"))
    e = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    micro = F.floor(F.col("val").cast("double") * 1000000).cast("long")
    return (
        e.groupBy("label", "pos")
        .agg(F.sum(micro).alias("sum_micro"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "pos",
            "sum_micro",
            "n",
            (F.col("sum_micro").cast("double") / F.col("n") / 1000000).alias(
                "centroid"
            ),
        )
    )


_KNN_JOIN_ORACLE = """
WITH d AS (
  SELECT q.vec_id AS q_id, e.vec_id,
         SUM(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE)) AS dot,
         SUM(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)) AS na,
         SUM(CAST(q.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INT)] AS DOUBLE)) AS nb
  FROM embeddings e JOIN embeddings q ON q.vec_id < 5 AND e.vec_id >= 5
  CROSS JOIN range(1, 65) t(i)
  GROUP BY q.vec_id, e.vec_id
)
SELECT q_id, vec_id, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cos_sim FROM (
  SELECT q_id, vec_id, dot, na, nb,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dot / (SQRT(na) * SQRT(nb)) DESC, vec_id) AS rn
  FROM d
) WHERE rn <= 3
"""


@_register(
    "knn_join_multi",
    _KNN_JOIN_ORACLE,
    doc="kNN JOIN: top-3 corpus neighbors for EACH of a batch of query "
    "vectors (vec_id < 5), not a single probe — the batched retrieval "
    "shape. The query batch broadcasts (it is the small side by "
    "construction); scores are a narrow map over the corpus and the only "
    "shuffle is the per-query ranking window. At 100 TB the same plan "
    "holds until the batch outgrows broadcast, where ann_lsh bucketing "
    "takes over.",
)
def knn_join_multi(spark: SparkSession, sf: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf, "embeddings"))
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    scores = corpus.crossJoin(F.broadcast(qs)).select(
        "q_id",
        "vec_id",
        S.cosine(S.as_double(F.col("embedding")), S.as_double(F.col("qvec"))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scores.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 3)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# event analytics
# ---------------------------------------------------------------------------

_FILL_GAPS_ORACLE = """
WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, d.day, COALESCE(a.n, 0) AS n
FROM days d CROSS JOIN types t
LEFT JOIN actual a ON a.event_type = t.event_type AND a.day = d.day
"""


@_register(
    "fill_gaps",
    _FILL_GAPS_ORACLE,
    doc="Time-series gap filling: daily event counts per type with missing "
    "(type, day) cells zero-filled — resampling onto a dense calendar "
    "grid so downstream charts/models see explicit zeros. The grid "
    "(days × types) is generated with sequence+explode and is tiny by "
    "construction, so it broadcasts against the aggregated counts; the "
    "only data-sized shuffle is the partial-aggregated daily count.",
)
def fill_gaps(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = b.select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = days.crossJoin(types)
    return grid.join(actual, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )


_FUNNEL_ORACLE = """
WITH u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS step_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS step_purchase
FROM u
"""


@_register(
    "events_funnel",
    _FUNNEL_ORACLE,
    doc="Ordered conversion funnel: users whose first view precedes their "
    "first click precedes their first purchase — the sequential-pattern "
    "aggregate of product analytics. One conditional-MIN aggregate per "
    "user (map-side partial) then a single global roll-up row; NULL "
    "comparison semantics drop users missing a step (3VL, identical in "
    "both engines).",
)
def events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("step_purchase"),
    )


_LAG_GAP_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id, COUNT(gap) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS total_gap_us,
       MAX(gap) AS max_gap_us
FROM g GROUP BY user_id
"""


@_register(
    "events_lag_gap",
    _LAG_GAP_ORACLE,
    doc="Inter-event gap statistics per user (lag diff over the user's "
    "event-time order, deterministic event_id tie-break): count/total/max "
    "gap in exact integer microseconds — the session-health signal behind "
    "gap-based sessionization thresholds. unix_micros under the UTC "
    "session matches DuckDB epoch_us exactly; all aggregates are integer.",
)
def events_lag_gap(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gap = us - F.lag(us).over(w)
    return (
        ev.select("user_id", gap.alias("gap"))
        .groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum("gap").alias("total_gap_us"),
            F.max("gap").alias("max_gap_us"),
        )
    )


@_register(
    "regexp_extract_numbers",
    "SELECT event_id, array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums "
    "FROM events",
    doc="regexp_extract_all surface: every digit run in the raw props "
    "payload, joined in match order — the scrape-structured-bits-out-of-"
    "logs primitive. Pure narrow map (JVM regex, no Python); both engines "
    "run the same RE2-safe pattern.",
)
def regexp_extract_numbers(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.select(
        "event_id",
        F.array_join(
            F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), F.lit(0)), ","
        ).alias("nums"),
    )


@_register(
    "agg_string_concat",
    "SELECT user_id, array_to_string(list_sort(array_agg(DISTINCT event_type)), ',') AS types, "
    "COUNT(*) AS n_events FROM events GROUP BY user_id",
    doc="Ordered string aggregation: the sorted distinct event types a user "
    "triggered, as one CSV cell (collect_set → array_sort → array_join — "
    "sorting makes the collected set deterministic). Distinct-type "
    "cardinality is tiny and bounded, so collect_set stays map-side "
    "cheap at any row count.",
)
def agg_string_concat(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# relational surface extensions
# ---------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@_register(
    "agg_grouping_sets",
    _GROUPING_SETS_ORACLE,
    doc="GROUPING SETS: two independent one-column aggregates plus the "
    "grand total in a single pass (the general form of rollup/cube — "
    "X4's third face). Spark expands sets over one shuffle with partial "
    "aggregation per set; exact-decimal sum keeps the double measure "
    "order-independent.",
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(F.col("o_totalprice")).alias("total"),
    )


@_register(
    "window_percent_rank",
    "SELECT o_orderkey, o_orderpriority, "
    "percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pr, "
    "cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cd "
    "FROM orders",
    doc="Distribution-rank windows: percent_rank and cume_dist within each "
    "order priority (X5's relative-standing face). The unique o_orderkey "
    "tie-break makes ranks total; both functions emit exact small-integer "
    "ratios, bitwise identical across engines, so no rounding is needed. "
    "Partitioned window — hash exchange, per-partition sort only.",
)
def window_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


_STOP5 = ("the", "a", "of", "and", "to")

_ARRAY_OPS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
  FROM documents
)
SELECT doc_id,
  COALESCE(array_to_string(list_sort(list_intersect(w, ['the','a','of','and','to'])), ','), '') AS stop_hits,
  CAST(len(list_filter(w, x -> NOT list_contains(['the','a','of','and','to'], x))) AS INT) AS n_content
FROM t
"""


@_register(
    "array_set_ops",
    _ARRAY_OPS_ORACLE,
    doc="Array set algebra (intersect/except over distinct token arrays vs "
    "a constant vocabulary): which stopwords a document uses and how many "
    "content tokens remain — the array-function face of the text "
    "pipeline. Sorting the intersection makes element order, and with it "
    "the CSV rendering, engine-independent; all codegen expressions, "
    "narrow map, no shuffle at all.",
)
def array_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    stop = F.array(*[F.lit(s) for s in _STOP5])
    w = F.array_distinct(T.words(F.lower(F.col("text"))))
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(w, stop)), ",").alias("stop_hits"),
        F.size(F.array_except(w, stop)).alias("n_content"),
    )


@_register(
    "posexplode_index",
    "WITH t AS (SELECT doc_id, "
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w "
    "FROM documents) "
    "SELECT doc_id, CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos, "
    "unnest(w) AS token FROM t",
    doc="Positional explode: tokens with their 0-based offsets (posexplode "
    "— E1 with provenance). Position-aware token rows are what windowed "
    "attention-span stats and span-labeling pipelines consume; same "
    "narrow fan-out cost as plain explode.",
)
def posexplode_index(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    return docs.select(
        "doc_id", F.posexplode(T.words(F.lower(F.col("text")))).alias("pos", "token")
    )


# ---------------------------------------------------------------------------
# pipeline design-dial sweeps (folded from the round-10e tranche): the
# parameter curves an engineer reads BEFORE committing a 100 TB pass
# to one setting — several candidate settings evaluated in one (or a
# few) scans, so choosing a knob costs a report query instead of N
# full pipeline runs. Same family as minhash_band_stats (LSH banding
# curve) and cms_width_sweep (sketch width curve).
# ---------------------------------------------------------------------------


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
    priority=6,
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
    priority=6,
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


_MODALITY_AGREEMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id AS id,
         list_distinct(CASE WHEN len(w) >= 2
           THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
           ELSE [] END) AS shingles
  FROM toks
), ne AS (
  SELECT id, shingles FROM sh WHERE len(shingles) > 0
), sig AS (
  SELECT id, shingles,
         list_transform(range(0, 32), s ->
           list_min(list_transform(shingles, x -> md5(CAST(s AS VARCHAR) || ':' || x)))) AS sigs
  FROM ne
), keys AS (
  SELECT id, b, sigs[b*2+1] || '|' || sigs[b*2+2] AS bkey
  FROM (SELECT id, sigs, unnest(range(0, 16)) AS b FROM sig)
), cand AS (
  SELECT DISTINCT a.id AS id_old, b.id AS id_new
  FROM keys a JOIN keys b ON a.b = b.b AND a.bkey = b.bkey AND a.id < b.id
), mh AS (
  SELECT DISTINCT c.id_new AS id
  FROM cand c JOIN ne sa ON sa.id = c.id_old JOIN ne sb ON sb.id = c.id_new
  WHERE len(list_intersect(sa.shingles, sb.shingles)) * 2
        >= len(sa.shingles) + len(sb.shingles)
          - len(list_intersect(sa.shingles, sb.shingles))
), dg AS (
  SELECT doc_id, md5(text) AS g FROM documents
), gm AS (
  SELECT g, MIN(doc_id) AS keep_id FROM dg GROUP BY g
), exd AS (
  SELECT dg.doc_id AS id FROM dg JOIN gm ON dg.g = gm.g
  WHERE dg.doc_id > gm.keep_id
)
SELECT exd.id IS NOT NULL AS exact_dup,
       mh.id IS NOT NULL AS minhash_dup,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d
LEFT JOIN exd ON d.doc_id = exd.id
LEFT JOIN mh ON d.doc_id = mh.id
GROUP BY 1, 2
"""


@_register(
    "dedup_modality_agreement",
    _MODALITY_AGREEMENT_ORACLE,
    doc="Calibration audit ACROSS dedup modalities: every document "
    "flagged by the exact gate (a lower-id doc with the same md5 "
    "digest) and by the MinHash gate (a lower-id verified J >= 0.5 "
    "band-mate, dedup_minhash_det's 16x2 pipeline), cross-tabbed as a "
    "2x2 matrix. The cells are the modality-design report: "
    "(true, false) is exact dups the LSH missed — in a calibrated "
    "setup only zero-shingle docs land there, since identical text "
    "yields identical signatures; (false, true) is the near-dup mass "
    "only MinHash sees — the value the fuzzier modality adds over "
    "hashing; and the diagonal sizes how much the gates overlap, "
    "which prices running one pipeline instead of two. Cost: the "
    "digest test is a 16-byte-digest groupBy + join-back (never a "
    "self-join of text), MinHash is the banded directional join, and "
    "the cross-tab is a 4-key aggregate.",
    priority=7,
)
def dedup_modality_agreement(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.dedup import (
        minhash_dominated,
        minhash_encode,
    )

    docs = load_table(spark, sf, "documents")
    dg = docs.select("doc_id", F.md5("text").alias("g"))
    gm = dg.groupBy("g").agg(F.min("doc_id").alias("keep_id"))
    exd = (
        dg.join(gm, "g")
        .where(F.col("doc_id") > F.col("keep_id"))
        .select(F.col("doc_id").alias("id"))
        .withColumn("__e", F.lit(1))
    )
    sh, keys = minhash_encode(docs)
    mh = minhash_dominated(keys, sh, keys, sh).withColumn("__m", F.lit(1))
    j = (
        docs.select(F.col("doc_id").alias("id"))
        .join(exd, "id", "left")
        .join(mh, "id", "left")
    )
    return j.groupBy(
        F.col("__e").isNotNull().alias("exact_dup"),
        F.col("__m").isNotNull().alias("minhash_dup"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
