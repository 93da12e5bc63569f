"""Round-9c tranche: 12 oracle-paired specs — distribution statistics,
eval metrics, and concentration analysis.

Themes: split drift measured properly (PSI over a fixed band spine,
exact KS statistic per source via integer cross-multiplication),
information-theoretic corpus structure (per-source KL vs the corpus
unigram LM, first-order Markov conditional entropy), inequality /
concentration (exact integer Gini over token mass and order values,
revenue HHI per nation in ppm), tokenizer-design inputs (character
coverage curve), survival analysis (discrete inter-arrival hazard),
finance faces (cohort LTV matrix with exact-decimal cumulative sums),
embedding-quality eval (leave-one-out 1-NN label accuracy inside the
deterministic k-means cells), and a tolerance-bounded as-of lookup
(the finance asof-with-max-staleness shape) verified against DuckDB's
native ASOF JOIN plus an interval guard.

Determinism recipes: 6dp-rounded DECIMAL log terms (entropy/KL/PSI —
the round6 precedent), exact integer cross-multiplication for CDF
comparison (KS: |cum_s*n_r - cum_r*n_s|), money as DECIMAL end-to-end
with FLOOR(x*100) cents for integer shares, integer div ppm
everywhere, and (dist, id) total orders for nearest-neighbor picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import dec, fan_out
from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    # queued with the round-9 tranches behind the round-8 driver window
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
# Split drift: PSI over a fixed band spine
# ---------------------------------------------------------------------------


def _split_sql(engine_bucket: str) -> str:
    from cve_manager_spark.plans.corpus import _split_case

    return _split_case(engine_bucket)


def _psi_oracle() -> str:
    from cve_manager_spark.plans.corpus import _BUCKET_DUCK

    return f"""
WITH d AS (
  SELECT {_split_sql(_BUCKET_DUCK)} AS split,
         LEAST(19, len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '')) // 25) AS band
  FROM documents
), spine AS (
  SELECT unnest(range(0, 20)) AS band
), c AS (
  SELECT s.band,
         CAST(COALESCE(SUM(CASE WHEN d.split = 'train' THEN 1 END), 0)
              AS BIGINT) AS n_train,
         CAST(COALESCE(SUM(CASE WHEN d.split = 'test' THEN 1 END), 0)
              AS BIGINT) AS n_test
  FROM spine s LEFT JOIN d ON d.band = s.band
  GROUP BY s.band
), t AS (
  SELECT CAST(SUM(n_train) AS BIGINT) AS tt, CAST(SUM(n_test) AS BIGINT) AS te
  FROM c
), p AS (
  SELECT band, n_train, n_test,
         (CAST(n_train + 1 AS DOUBLE) / CAST(tt + 20 AS DOUBLE)) AS pt,
         (CAST(n_test + 1 AS DOUBLE) / CAST(te + 20 AS DOUBLE)) AS pe
  FROM c CROSS JOIN t
), terms AS (
  SELECT band, n_train, n_test,
         CAST(ROUND((pt - pe) * ln(pt / pe), 6) AS DECIMAL(18,6)) AS term
  FROM p
)
SELECT band, n_train, n_test,
       CAST(term AS DOUBLE) AS psi_term,
       CAST(SUM(term) OVER () AS DOUBLE) AS psi_total
FROM terms
"""


@_register(
    "split_psi",
    _psi_oracle(),
    doc="Population Stability Index between the train and test splits "
    "over a FIXED 20-band doc-length spine (band = n_tok div 25, "
    "capped) — the ML-ops drift gauge: PSI < 0.1 stable, > 0.25 the "
    "split is not exchangeable and eval numbers are suspect. Laplace "
    "+1 smoothing keeps empty bands defined; each (pt-pe)*ln(pt/pe) "
    "term is rounded to 6dp and summed as exact DECIMAL (round6 "
    "entropy recipe) so the total is order-independent. The spine is "
    "generated, not observed — missing bands surface as zero rows "
    "instead of silently shrinking the sum. One scan + a 20-row "
    "broadcast join; nothing scales past the band count.",
)
def split_psi(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.corpus import _BUCKET_SPARK

    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        F.expr(_split_sql(_BUCKET_SPARK)).alias("split"),
        F.expr(
            "least(19, size(filter(split(text, '\\\\s+'), x -> x != '')) div 25)"
        ).alias("band"),
    )
    spine = spark.range(0, 20).select(F.col("id").cast("bigint").alias("band"))
    c = (
        spine.join(d, "band", "left")
        .groupBy("band")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("split") == "train", 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_train"),
            F.coalesce(F.sum(F.when(F.col("split") == "test", 1)), F.lit(0))
            .cast("bigint")
            .alias("n_test"),
        )
    )
    t = c.agg(F.sum("n_train").alias("tt"), F.sum("n_test").alias("te"))
    p = c.crossJoin(F.broadcast(t)).select(
        "band",
        "n_train",
        "n_test",
        ((F.col("n_train") + 1).cast("double") / (F.col("tt") + 20).cast("double")).alias("pt"),
        ((F.col("n_test") + 1).cast("double") / (F.col("te") + 20).cast("double")).alias("pe"),
    )
    term = F.round(
        (F.col("pt") - F.col("pe")) * F.log(F.col("pt") / F.col("pe")), 6
    ).cast("decimal(18,6)")
    terms = p.select("band", "n_train", "n_test", term.alias("term"))
    return terms.select(
        "band",
        "n_train",
        "n_test",
        F.col("term").cast("double").alias("psi_term"),
        F.sum("term").over(Window.partitionBy()).cast("double").alias("psi_total"),
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence vs the corpus unigram LM
# ---------------------------------------------------------------------------


@_register(
    "source_unigram_kl",
    """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS word
  FROM documents
), sw AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), st AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS ts,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM sw GROUP BY source
), cw AS (
  SELECT word, CAST(SUM(c) AS BIGINT) AS cc FROM sw GROUP BY word
), tt AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t FROM sw
)
SELECT sw.source, MAX(st.ts) AS n_tokens, MAX(st.n_types) AS n_types,
       CAST(SUM(CAST(ROUND(
         (CAST(sw.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
           * ln((CAST(sw.c AS DOUBLE) / CAST(st.ts AS DOUBLE))
                / (CAST(cw.cc AS DOUBLE) / CAST(tt.t AS DOUBLE))), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS kl
FROM sw
JOIN st ON sw.source = st.source
JOIN cw ON sw.word = cw.word
CROSS JOIN tt
GROUP BY sw.source
""",
    doc="KL divergence of each source's unigram distribution from the "
    "corpus LM — the domain-shift score data-mixing decisions read "
    "(a source with high KL is stylistically far from the blend; "
    "CCNet uses the same quantity as LM perplexity). Defined without "
    "smoothing because source vocabularies are subsets of the corpus "
    "vocabulary (p_corpus > 0 wherever p_source > 0). Each "
    "p*ln(p/q) term rounded to 6dp, summed as exact DECIMAL; counts "
    "join word-keyed (co-partitioned with the count aggregate), "
    "totals ride a 20-row broadcast + a 1-row cross join.",
)
def source_unigram_kl(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    tok = docs.select(
        "source", F.explode(words(F.lower(F.col("text")))).alias("word")
    )
    sw = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    st = sw.groupBy("source").agg(
        F.sum("c").alias("ts"), F.count(F.lit(1)).alias("n_types")
    )
    cw = sw.groupBy("word").agg(F.sum("c").alias("cc"))
    tt = sw.agg(F.sum("c").alias("t"))
    ps = F.col("c").cast("double") / F.col("ts").cast("double")
    pc = F.col("cc").cast("double") / F.col("t").cast("double")
    term = F.round(ps * F.log(ps / pc), 6).cast("decimal(18,6)")
    return (
        sw.join(F.broadcast(st), "source")
        .join(cw, "word")
        .crossJoin(F.broadcast(tt))
        .groupBy("source")
        .agg(
            F.max("ts").alias("n_tokens"),
            F.max("n_types").alias("n_types"),
            F.sum(term).cast("double").alias("kl"),
        )
    )


# ---------------------------------------------------------------------------
# Exact integer Gini: token mass per source, order values per segment
# ---------------------------------------------------------------------------

_GINI_DOC = (
    "Gini = sum_i (2i - n - 1) x_(i) / (n sum x) with x ascending; the "
    "numerator is exact BIGINT (rank coefficients sum identically over "
    "ties, so any stable tie order gives the same value) and the ppm is "
    "one integer division — no float anywhere."
)


@_register(
    "token_gini_by_source",
    """
WITH d AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tok
  FROM documents
), r AS (
  SELECT source, n_tok,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS i,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM d
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tok_mass,
       CAST(SUM((2 * i - n - 1) * n_tok) * 1000000
            // (MAX(n) * SUM(n_tok)) AS BIGINT) AS gini_ppm
FROM r GROUP BY source
""",
    doc="Token-mass inequality WITHIN each source: are a source's tokens "
    "spread evenly across its documents or concentrated in a few "
    "mega-docs (which dominate training batches and skew dedup "
    "savings)? " + _GINI_DOC + " One source-partitioned window sort "
    "then a per-source fold.",
)
def token_gini_by_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source",
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        ).alias("n_tok"),
    )
    w = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    wn = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_tok",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # the Gini numerator sum reaches ~n^2 * max(x) * 1e6 — BIGINT wraps
    # silently where DuckDB auto-promotes SUM to HUGEINT, so Spark carries
    # it as exact DECIMAL(38,0) (d19*d19 product pattern) and divides with
    # integral `div`
    return r.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tok_mass"),
        F.expr(
            "cast(sum(cast(2 * i - n - 1 as decimal(19,0))"
            "         * cast(n_tok as decimal(19,0))) * 1000000"
            " div cast(max(n) * sum(n_tok) as decimal(19,0)) as bigint)"
        ).alias("gini_ppm"),
    )


@_register(
    "order_value_gini_by_segment",
    """
WITH o AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(CAST(o.o_totalprice AS DECIMAL(18,4)) * 100) AS BIGINT)
           AS cents,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), r AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_orderkey)
           AS i,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM o
)
SELECT segment, CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM((2 * i - n - 1) * cents) * 1000000
            // (MAX(n) * SUM(cents)) AS BIGINT) AS gini_ppm
FROM r GROUP BY segment
""",
    doc="Spend inequality per market segment: the Gini of order values — "
    "whale-dominance per segment, the revenue-risk statistic next to "
    "orders_pareto's top-share. Money enters as DECIMAL and becomes "
    "exact integer cents via FLOOR(x*100) (explicit floor: Spark "
    "truncates decimal->bigint casts while DuckDB rounds, so the "
    "recipe forces the same floor on both). " + _GINI_DOC,
)
def order_value_gini_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    o = fan_out(load_table(spark, sf, "orders"))
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(dec(F.col("o_totalprice")) * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("segment")
    r = j.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # DECIMAL(38,0) numerator: see token_gini_by_source — BIGINT wraps at
    # sf0.01 already (~2.7e20) while DuckDB's SUM auto-promotes to HUGEINT
    return r.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr(
            "cast(sum(cast(2 * i - n - 1 as decimal(19,0))"
            "         * cast(cents as decimal(19,0))) * 1000000"
            " div cast(max(n) as decimal(19,0)) div sum(cast(cents as decimal(19,0)))"
            " as bigint)"
        ).alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# Character coverage curve (tokenizer design input)
# ---------------------------------------------------------------------------


@_register(
    "char_coverage_curve",
    """
WITH ch AS (
  SELECT unnest(list_transform(range(1, length(text) + 1),
                               i -> substr(text, i, 1))) AS c
  FROM documents
), cc AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM ch WHERE c <> ' ' GROUP BY c
), r AS (
  SELECT c, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, c) AS rnk FROM cc
), b AS (
  SELECT CASE WHEN rnk <= 10 THEN 1 WHEN rnk <= 20 THEN 11
              WHEN rnk <= 50 THEN 21 WHEN rnk <= 100 THEN 51
              ELSE 101 END AS rank_band, cnt
  FROM r
), g AS (
  SELECT rank_band, CAST(COUNT(*) AS BIGINT) AS n_chars,
         CAST(SUM(cnt) AS BIGINT) AS char_mass
  FROM b GROUP BY rank_band
)
SELECT rank_band, n_chars, char_mass,
       CAST(SUM(char_mass) OVER (ORDER BY rank_band
                                 ROWS UNBOUNDED PRECEDING) * 1000000
            // SUM(char_mass) OVER () AS BIGINT) AS cum_ppm
FROM g
""",
    doc="Character coverage curve — the SentencePiece character_coverage "
    "input: non-space characters ranked by frequency (count desc, char "
    "asc tie-break), banded by rank (top-10/20/50/100/rest) with "
    "cumulative corpus-mass ppm per band; where the curve crosses "
    "0.9995e6 sets the tokenizer's byte-fallback alphabet. The "
    "explode is one map-side-combinable char count (alphabet-bounded "
    "output), then windows over <= 5 rows.",
)
def char_coverage_curve(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    ch = docs.select(
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("c")
    ).where(F.col("c") != " ")
    cc = ch.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    r = cc.select(
        "cnt",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("cnt").desc(), F.col("c")))
        .alias("rnk"),
    )
    b = r.select(
        F.when(F.col("rnk") <= 10, 1)
        .when(F.col("rnk") <= 20, 11)
        .when(F.col("rnk") <= 50, 21)
        .when(F.col("rnk") <= 100, 51)
        .otherwise(101)
        .cast("int")
        .alias("rank_band"),
        "cnt",
    )
    g = b.groupBy("rank_band").agg(
        F.count(F.lit(1)).alias("n_chars"),
        F.sum("cnt").cast("bigint").alias("char_mass"),
    )
    return g.select(
        "rank_band",
        "n_chars",
        "char_mass",
        F.expr(
            "sum(char_mass) over (order by rank_band rows unbounded preceding)"
            " * 1000000 div sum(char_mass) over ()"
        ).alias("cum_ppm"),
    )


# ---------------------------------------------------------------------------
# Discrete inter-arrival hazard curve
# ---------------------------------------------------------------------------


@_register(
    "interarrival_hazard",
    """
WITH g AS (
  SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_s
  FROM events
), b AS (
  SELECT CASE WHEN gap_s < 60 THEN 0 WHEN gap_s < 300 THEN 60
              WHEN gap_s < 900 THEN 300 WHEN gap_s < 3600 THEN 900
              ELSE 3600 END AS band_lo
  FROM g WHERE gap_s IS NOT NULL
), c AS (
  SELECT band_lo, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY band_lo
)
SELECT band_lo, n,
       CAST(SUM(n) OVER (ORDER BY band_lo DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_at_risk,
       CAST(n * 1000000
            // SUM(n) OVER (ORDER BY band_lo DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS hazard_ppm
FROM c
""",
    doc="Discrete hazard curve of user inter-arrival times: for each gap "
    "band, P(return in this band | gap survived past its lower edge) "
    "in ppm — the survival-analysis read of interarrival data that a "
    "raw histogram hides (a hazard cliff at the 30-min band is where "
    "the session-gap threshold belongs; events_session_gap_sweep "
    "measures the consequence, this measures the cause). n_at_risk is "
    "a descending-band cumulative window; gaps from the one "
    "user-partitioned LAG pass (epoch_us recipe).",
)
def interarrival_hazard(spark: SparkSession, sf: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf, "events"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select((us - F.lag(us).over(w)).alias("gap_us")).where(
        F.col("gap_us").isNotNull()
    )
    g = g.select(F.expr("gap_us div 1000000").alias("gap_s"))
    b = g.select(
        F.when(F.col("gap_s") < 60, 0)
        .when(F.col("gap_s") < 300, 60)
        .when(F.col("gap_s") < 900, 300)
        .when(F.col("gap_s") < 3600, 900)
        .otherwise(3600)
        .cast("int")
        .alias("band_lo")
    )
    c = b.groupBy("band_lo").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "band_lo",
        "n",
        F.expr(
            "sum(n) over (order by band_lo desc rows unbounded preceding)"
        )
        .cast("bigint")
        .alias("n_at_risk"),
        F.expr(
            "n * 1000000 div sum(n) over (order by band_lo desc"
            " rows unbounded preceding)"
        )
        .cast("bigint")
        .alias("hazard_ppm"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV matrix (exact-decimal money)
# ---------------------------------------------------------------------------


@_register(
    "cohort_ltv_matrix",
    """
WITH f AS (
  SELECT o_custkey,
         MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
  FROM orders GROUP BY o_custkey
), o AS (
  SELECT o.o_custkey,
         CAST((f.m0 - 1) // 12 AS INTEGER) AS cohort_year,
         CAST((f.m0 - 1) % 12 + 1 AS INTEGER) AS cohort_month,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - f.m0
              AS INTEGER) AS age_months,
         CAST(o.o_totalprice AS DECIMAL(18,4)) AS v
  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
), g AS (
  SELECT cohort_year, cohort_month, age_months,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         SUM(v) AS rev
  FROM o GROUP BY 1, 2, 3
)
SELECT cohort_year, cohort_month, age_months, n_customers,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(SUM(rev) OVER (PARTITION BY cohort_year, cohort_month
                           ORDER BY age_months ROWS UNBOUNDED PRECEDING)
            AS DOUBLE) AS cum_revenue
FROM g
""",
    doc="Cohort lifetime-value matrix: customers grouped by first-order "
    "month, revenue by months-since-first-order with the cumulative "
    "LTV running sum — the standard finance triangle. Months compare "
    "as y*12+m integers (no date arithmetic ambiguity); money rides "
    "DECIMAL end-to-end (dec_sum discipline) and both the cell revenue "
    "and the cumulative window sum cast to double only at emission. "
    "One first-order aggregate joined back customer-keyed, one "
    "(cohort, age) aggregate, one bounded window.",
)
def cohort_ltv_matrix(spark: SparkSession, sf: str) -> DataFrame:
    o = fan_out(load_table(spark, sf, "orders"))
    m = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    f = o.groupBy("o_custkey").agg(F.min(m).alias("m0"))
    j = o.join(f, "o_custkey").select(
        "o_custkey",
        F.expr("(m0 - 1) div 12").cast("int").alias("cohort_year"),
        F.expr("(m0 - 1) % 12 + 1").cast("int").alias("cohort_month"),
        (m - F.col("m0")).cast("int").alias("age_months"),
        dec(F.col("o_totalprice")).alias("v"),
    )
    g = j.groupBy("cohort_year", "cohort_month", "age_months").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.sum("v").alias("rev"),
    )
    wc = (
        Window.partitionBy("cohort_year", "cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort_year",
        "cohort_month",
        "age_months",
        "n_customers",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(wc).cast("double").alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# Revenue concentration: HHI per nation
# ---------------------------------------------------------------------------


@_register(
    "supplier_hhi_by_nation",
    """
WITH r AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev
  FROM lineitem GROUP BY l_suppkey
), sc AS (
  SELECT s.s_nationkey, CAST(FLOOR(r.rev * 100) AS BIGINT) AS cents
  FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
), sh AS (
  SELECT s_nationkey, cents,
         CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY s_nationkey)
              AS BIGINT) AS share_ppm
  FROM sc
)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(sh.cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(sh.share_ppm * sh.share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM sh JOIN nation n ON sh.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    doc="Herfindahl-Hirschman revenue concentration per supplier nation: "
    "HHI = sum of squared revenue shares, in ppm (1e6/n = perfectly "
    "competitive, 1e6 = monopoly) — the antitrust-grade concentration "
    "statistic next to the top-k shares the repo already reports. "
    "Revenue is the exact-DECIMAL TPC-H expression folded per "
    "supplier, floored to integer cents (explicit FLOOR: engines "
    "disagree on decimal->int cast rounding), shares are integer ppm "
    "via one nation-partitioned window total, and HHI is a BIGINT "
    "square-sum. One lineitem aggregate + a broadcast supplier/nation "
    "dim join.",
)
def supplier_hhi_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    li = fan_out(load_table(spark, sf, "lineitem"))
    su = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    r = li.groupBy("l_suppkey").agg(
        F.sum(
            dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount")))
        ).alias("rev")
    )
    sc = r.join(F.broadcast(su), r["l_suppkey"] == su["s_suppkey"]).select(
        "s_nationkey", F.floor(F.col("rev") * 100).cast("bigint").alias("cents")
    )
    wn = Window.partitionBy("s_nationkey")
    sh = sc.select(
        "s_nationkey",
        "cents",
        F.expr(
            "cents * 1000000 div sum(cents) over (partition by s_nationkey)"
        )
        .cast("bigint")
        .alias("share_ppm"),
    )
    return (
        sh.join(F.broadcast(na), sh["s_nationkey"] == na["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.expr("sum(share_ppm * share_ppm) div 1000000")
            .cast("bigint")
            .alias("hhi_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Exact KS statistic per source (length distributions)
# ---------------------------------------------------------------------------


@_register(
    "length_ks_by_source",
    """
WITH d AS (
  SELECT source, length(text) AS v FROM documents
), sv AS (
  SELECT source, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2
), st AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS ns FROM sv GROUP BY source
), vv AS (
  SELECT DISTINCT v FROM d
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d
), cv AS (
  SELECT v, CAST(SUM(cnt) AS BIGINT) AS ccnt FROM sv GROUP BY v
), ccum AS (
  SELECT v, SUM(ccnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM cv
), spine AS (
  SELECT st.source, st.ns, vv.v FROM st CROSS JOIN vv
), scum AS (
  SELECT sp.source, sp.ns, sp.v,
         SUM(COALESCE(sv.cnt, 0)) OVER (PARTITION BY sp.source ORDER BY sp.v
                                        ROWS UNBOUNDED PRECEDING) AS cum_s
  FROM spine sp LEFT JOIN sv ON sp.source = sv.source AND sp.v = sv.v
), diff AS (
  SELECT s.source, s.ns, s.v,
         abs(s.cum_s * (t.nn - s.ns) - (c.cum_c - s.cum_s) * s.ns) AS dd
  FROM scum s JOIN ccum c ON s.v = c.v CROSS JOIN tot t
), mx AS (
  SELECT source, MAX(ns) AS ns, MAX(dd) AS mdd FROM diff GROUP BY source
)
SELECT mx.source, CAST(mx.ns AS BIGINT) AS n_docs,
       CAST(mx.mdd * 1000000 // (mx.ns * ((SELECT nn FROM tot) - mx.ns))
            AS BIGINT) AS ks_ppm,
       CAST(MIN(diff.v) AS BIGINT) AS ks_at_len
FROM mx JOIN diff ON mx.source = diff.source AND mx.mdd = diff.dd
GROUP BY mx.source, mx.ns, mx.mdd
""",
    doc="Exact two-sample Kolmogorov-Smirnov statistic per source vs the "
    "REST of the corpus over doc-length distributions: D = max_v "
    "|F_s(v) - F_rest(v)|, computed as the integer cross-"
    "multiplication |cum_s*n_r - cum_r*n_s| (never a float CDF), "
    "emitted in ppm of n_s*n_r with the argmax length (min on ties) — "
    "the drift detector for 'does this source even look like the "
    "blend'. The value spine is sources x distinct-lengths (bounded: "
    "lengths are data-bounded, sources ~20); cumulative sums are two "
    "window passes.",
)
def length_ks_by_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select("source", F.length("text").cast("bigint").alias("v"))
    sv = d.groupBy("source", "v").agg(F.count(F.lit(1)).alias("cnt"))
    st = sv.groupBy("source").agg(F.sum("cnt").alias("ns"))
    vv = d.select("v").distinct()
    tot = d.agg(F.count(F.lit(1)).alias("nn"))
    cv = sv.groupBy("v").agg(F.sum("cnt").alias("ccnt"))
    wv = Window.partitionBy().orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ccum = cv.select("v", F.sum("ccnt").over(wv).alias("cum_c"))
    spine = st.crossJoin(F.broadcast(vv))
    ws = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scum = (
        spine.join(sv, ["source", "v"], "left")
        .select(
            "source",
            "ns",
            "v",
            F.coalesce("cnt", F.lit(0)).alias("cnt0"),
        )
        .select(
            "source", "ns", "v", F.sum("cnt0").over(ws).alias("cum_s")
        )
    )
    diff = (
        scum.join(F.broadcast(ccum), "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "ns",
            "v",
            F.abs(
                F.col("cum_s") * (F.col("nn") - F.col("ns"))
                - (F.col("cum_c") - F.col("cum_s")) * F.col("ns")
            ).alias("dd"),
            "nn",
        )
    )
    mx = diff.groupBy("source").agg(
        F.max("ns").alias("ns"), F.max("dd").alias("mdd"), F.max("nn").alias("nn")
    )
    return (
        mx.join(
            diff.select(F.col("source").alias("src2"), "dd", "v"),
            (F.col("source") == F.col("src2")) & (F.col("mdd") == F.col("dd")),
        )
        .groupBy("source", "ns", "mdd", "nn")
        .agg(F.min("v").alias("ks_at_len"))
        .select(
            "source",
            F.col("ns").cast("bigint").alias("n_docs"),
            F.expr("mdd * 1000000 div (ns * (nn - ns))")
            .cast("bigint")
            .alias("ks_ppm"),
            F.col("ks_at_len").cast("bigint"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-quality eval: leave-one-out 1-NN label accuracy
# ---------------------------------------------------------------------------


def _knn_loo_oracle() -> str:
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    return _KMEANS_CTE + """
, lab AS (
  SELECT a2.vec_id, a2.q, a2.cid, e2.label
  FROM a2 JOIN embeddings e2 ON a2.vec_id = e2.vec_id
), qq AS (
  SELECT vec_id, q, cid, label,
         CAST(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[]))
              AS BIGINT) AS qq
  FROM lab
), pairs AS (
  SELECT a.vec_id, a.label AS la, b.label AS lb,
         a.qq - 2 * CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                          CAST(b.q AS DOUBLE[])) AS BIGINT)
              + b.qq AS dist,
         b.vec_id AS nb_id
  FROM qq a JOIN qq b ON a.cid = b.cid AND a.vec_id <> b.vec_id
), nn AS (
  SELECT vec_id, la, lb FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, nb_id) AS rn
    FROM pairs) WHERE rn = 1
)
SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS acc_ppm
FROM nn GROUP BY la
"""


@_register(
    "knn_loo_accuracy",
    _knn_loo_oracle(),
    doc="Leave-one-out 1-NN label accuracy inside the deterministic "
    "k-means cells — the standard embedding-quality eval (do nearest "
    "neighbors share labels?) made exactly reproducible: neighbors "
    "compete on the INTEGER quantized squared-euclidean (qq_a - 2 dot "
    "+ qq_b, the k-means metric) with (dist, vec_id) tie-break, so "
    "both engines pick the identical neighbor; accuracy in ppm per "
    "label. Candidates are within-cell only (the IVF/SemDeDup "
    "candidate shape — at 100 TB this IS the eval you can afford; "
    "cross-cell misses are the known recall trade measured by the ANN "
    "audits).",
)
def knn_loo_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import kmeans_quantized

    emb = load_table(spark, sf, "embeddings")
    a = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    lab = a.join(
        emb.select(F.col("vec_id").alias("vid2"), "label"),
        F.col("vec_id") == F.col("vid2"),
    ).select("vec_id", "q", "qq", "cluster", "label")
    left = lab.select(
        "vec_id",
        F.col("q").alias("qa"),
        F.col("qq").alias("na"),
        "cluster",
        F.col("label").alias("la"),
    )
    right = lab.select(
        F.col("vec_id").alias("nb_id"),
        F.col("q").alias("qb"),
        F.col("qq").alias("nb"),
        F.col("cluster").alias("cluster_b"),
        F.col("label").alias("lb"),
    )
    p = left.join(
        right,
        (F.col("cluster") == F.col("cluster_b"))
        & (F.col("vec_id") != F.col("nb_id")),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.select(
        "vec_id",
        "la",
        "lb",
        "nb_id",
        (F.col("na") - 2 * dot + F.col("nb")).alias("dist"),
    )
    wn = Window.partitionBy("vec_id").orderBy("dist", "nb_id")
    nn = p.withColumn("rn", F.row_number().over(wn)).where(F.col("rn") == 1)
    return nn.groupBy(F.col("la").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "sum(case when la = lb then 1 else 0 end) * 1000000 div count(1)"
        ).alias("acc_ppm"),
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of lookup
# ---------------------------------------------------------------------------


@_register(
    "scd2_asof_tolerance",
    """
WITH p0 AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC)
           AS rn
  FROM events WHERE event_type = 'purchase'
), p AS (
  SELECT user_id, ts,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
           AS version
  FROM p0 WHERE rn = 1
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), j AS (
  SELECT c.event_id, c.user_id, c.ts, p.version, p.ts AS pts
  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN pts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(pts) <= 604800000000
            THEN version END AS fresh_version
FROM j
""",
    doc="Tolerance-bounded point-in-time lookup: view events annotated "
    "with the purchase-history version in effect at their timestamp "
    "ONLY if it is at most 7 days stale — the max-staleness asof "
    "variant every feature store needs (a quote from last month is "
    "not a usable feature). operators/asof.asof_join carries the "
    "matched right timestamp out, and the staleness guard nulls the "
    "value past tolerance while KEEPING the row (left semantics); "
    "oracle = DuckDB native ASOF LEFT JOIN + an epoch_us interval "
    "guard. Same one-shuffle union+window plan as scd2_asof_lookup.",
)
def scd2_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.asof import asof_join

    ev = load_table(spark, sf, "events")
    pur = ev.where(F.col("event_type") == "purchase")
    w_ts = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    p1 = pur.withColumn("rn", F.row_number().over(w_ts)).where(F.col("rn") == 1)
    wv = Window.partitionBy("user_id").orderBy("ts")
    p = p1.select(
        "user_id",
        "ts",
        F.row_number().over(wv).cast("bigint").alias("version"),
        F.col("ts").alias("pts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        views, p, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["version", "pts"],
    )
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("asof_pts").cast("timestamp")
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("asof_pts").isNotNull() & (gap_us <= 604800000000),
            F.col("asof_version"),
        ).alias("fresh_version"),
    )


# ---------------------------------------------------------------------------
# First-order Markov conditional entropy
# ---------------------------------------------------------------------------


@_register(
    "markov_conditional_entropy",
    """
WITH s AS (
  SELECT event_type AS t0,
         LAG(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t1
  FROM events
), c AS (
  SELECT t1, t0, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s WHERE t1 IS NOT NULL GROUP BY t1, t0
), t AS (
  SELECT t1, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY t1
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total FROM t
)
SELECT c.t1, MAX(t.n) AS n_transitions,
       CAST(MAX(t.n) * 1000000 // MAX(g.total) AS BIGINT) AS share_ppm,
       CAST(SUM(CAST(ROUND(
         -(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS entropy
FROM c JOIN t ON c.t1 = t.t1 CROSS JOIN g
GROUP BY c.t1
""",
    doc="First-order Markov conditional entropy H(next | prev) per "
    "previous event type, with each state's stationary share in ppm — "
    "how predictable the next action is given the last one; the "
    "weighted sum is the chain's entropy rate, the sequence-"
    "compressibility number that complements events_markov_2step's "
    "raw transition table. 6dp-DECIMAL entropy recipe; one LAG pass, "
    "then aggregates over |types|^2 rows.",
)
def markov_conditional_entropy(spark: SparkSession, sf: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("t0"),
        F.lag("event_type", 1).over(w).alias("t1"),
    )
    c = (
        s.where(F.col("t1").isNotNull())
        .groupBy("t1", "t0")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = c.groupBy("t1").agg(F.sum("cnt").alias("n"))
    g = t.agg(F.sum("n").alias("total"))
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    return (
        c.join(F.broadcast(t), "t1")
        .crossJoin(F.broadcast(g))
        .groupBy("t1")
        .agg(
            F.max("n").alias("n_transitions"),
            F.expr("max(n) * 1000000 div max(total)")
            .cast("bigint")
            .alias("share_ppm"),
            F.sum(term).cast("double").alias("entropy"),
        )
    )
