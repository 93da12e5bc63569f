"""Round-8c tranche: 14 more oracle-paired specs, filling the driver's
50-slot verification window exactly (15 round8 + 21 round8b + 14 here).

The theme is the quality/repetition/split layer of a pretraining
pipeline that rounds 1-8b had not yet covered: Gopher-style repetition
rules (top-word mass, duplicate-bigram mass) computed IN-ROW with
array HOFs (per-document compute, embarrassingly parallel — no
doc-grain shuffle), a composite quality-flag report with pairwise flag
co-occurrence, a deterministic md5 train/val/test split with drift and
duplicate-leakage audits (the classic "test doc whose exact text also
sits in train" contamination check), a MinHash band false-positive
calibration (exact integer Jaccard deciles over ALL band candidates),
plus positional text profiles, embedding sign-octant occupancy,
behavioral Fano-factor bands, and two warehouse faces.

Determinism recipes per plans/spec.py: integer ppm/milli via BIGINT
``div``, exact-decimal Pearson moments with one final double op tree
(the round7 autocorr recipe), thresholds as documented integer
constants calibrated on the sf0.01 corpus, and md5 as the one digest
both engines share bit-for-bit.
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
# In-row Gopher repetition features — shared SQL fragments
# ---------------------------------------------------------------------------

# Per-document features computed entirely in-row (array HOFs over the
# token list): no (doc, word) shuffle anywhere — at 100 TB these are
# pure map-side compute. The top-word counter is O(distinct * n) per
# document, bounded by document length, never by corpus size.
_TOKS_CTE = """
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), f AS (
  SELECT doc_id, lang, source,
         len(w) AS n,
         len(list_distinct(w)) AS nd,
         list_max(list_transform(list_distinct(w),
                                 x -> len(list_filter(w, y -> y = x)))) AS topc,
         list_sum(list_transform(w, x -> len(x))) AS chars
  FROM toks WHERE len(w) > 0
)
"""


def _doc_features(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.split(F.lower(F.col("text")), r"\s+")
    w = F.filter(w, lambda x: x != F.lit(""))
    return (
        docs.select("doc_id", "lang", "source", w.alias("w"))
        .where(F.size("w") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.size("w").cast("bigint").alias("n"),
            F.size(F.array_distinct("w")).cast("bigint").alias("nd"),
            F.array_max(
                F.transform(
                    F.array_distinct("w"),
                    lambda x: F.size(F.filter(F.col("w"), lambda y: y == x)),
                )
            )
            .cast("bigint")
            .alias("topc"),
            F.aggregate(
                "w", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
            ).alias("chars"),
        )
    )


_TOPMASS_BAND_CASE = (
    "CASE WHEN ppm < 70000 THEN 0 WHEN ppm < 90000 THEN 1"
    " WHEN ppm < 110000 THEN 2 WHEN ppm < 150000 THEN 3"
    " WHEN ppm < 220000 THEN 4 ELSE 5 END"
)

_TOPMASS_ORACLE = _TOKS_CTE + f"""
, p AS (SELECT lang, topc * 1000000 // n AS ppm FROM f)
SELECT lang, CAST({_TOPMASS_BAND_CASE} AS INTEGER) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, 2
"""


@_register(
    "top_word_mass_bands",
    _TOPMASS_ORACLE,
    doc="Gopher-style repetition rule #1, banded: the mass of each "
    "document's single most frequent word (ppm of its tokens), "
    "histogrammed per language. The top-word count is an in-row array "
    "HOF (max over distinct tokens of their in-doc frequency) — "
    "O(distinct x n) per document, zero doc-grain shuffle; band "
    "thresholds are documented integer constants calibrated on the "
    "sf0.01 corpus (q1 79k / med 93k / q3 111k ppm).",
)
def top_word_mass_bands(spark: SparkSession, sf: str) -> DataFrame:
    f = _doc_features(spark, sf).select(
        "lang", F.expr("topc * 1000000 div n").alias("ppm")
    )
    return f.groupBy(
        "lang", F.expr(_TOPMASS_BAND_CASE).cast("int").alias("band")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


_BIGRAM_SQL_DUCK = (
    "CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),"
    " i -> array_to_string(w[i:i+1], ' ')) ELSE [] END"
)

_DUP_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), bg AS (
  SELECT source,
         CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
              i -> array_to_string(w[i:i+1], ' ')) ELSE [] END AS b
  FROM toks
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(b)) AS BIGINT) AS n_bigrams,
       CAST(SUM(len(b) - len(list_distinct(b))) * 1000000
            // GREATEST(SUM(len(b)), 1) AS BIGINT) AS dup_mass_ppm
FROM bg GROUP BY source
"""


@_register(
    "dup_bigram_mass_by_source",
    _DUP_BIGRAM_ORACLE,
    doc="Gopher-style repetition rule #2: duplicate-bigram mass — the "
    "fraction of adjacent-token bigram INSTANCES that are repeats of "
    "an earlier bigram in the same document — aggregated per source. "
    "Bigrams are built in-row (zip_with over two shifted slices) and "
    "deduplicated in-row (array_distinct); the only shuffle is the "
    "final source-keyed aggregate.",
)
def dup_bigram_mass_by_source(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    b = F.expr(
        "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
        " slice(w, 2, greatest(size(w) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b))"
    )
    d = docs.select("source", w.alias("w")).select("source", b.alias("b"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("b")).cast("bigint").alias("n_bigrams"),
        F.expr(
            "sum(size(b) - size(array_distinct(b))) * 1000000"
            " div greatest(sum(size(b)), 1)"
        ).alias("dup_mass_ppm"),
    )


# Flag thresholds: documented integer constants, calibrated so each
# rule fires on a real minority of this corpus (top-heavy > 150k ppm ~
# top decile; low TTR < 380 milli ~ bottom decile; word-length window
# [4000, 5000] milli straddles the 3708-5300 observed range; short =
# under 20 tokens against a 10-99 range).
_FLAGS_SQL = """
  SELECT source,
         CASE WHEN topc * 1000000 // n > 150000 THEN 1 ELSE 0 END AS top_heavy,
         CASE WHEN nd * 1000 // n < 380 THEN 1 ELSE 0 END AS low_ttr,
         CASE WHEN chars * 1000 // n < 4000 OR chars * 1000 // n > 5000
              THEN 1 ELSE 0 END AS wlen_out,
         CASE WHEN n < 20 THEN 1 ELSE 0 END AS short_doc
  FROM f
"""

_GOPHER_ORACLE = _TOKS_CTE + f""", fl AS ({_FLAGS_SQL})
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(top_heavy) AS BIGINT) AS n_top_heavy,
       CAST(SUM(low_ttr) AS BIGINT) AS n_low_ttr,
       CAST(SUM(wlen_out) AS BIGINT) AS n_wlen_out,
       CAST(SUM(short_doc) AS BIGINT) AS n_short,
       CAST(SUM(CASE WHEN top_heavy + low_ttr + wlen_out + short_doc = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM fl GROUP BY source
"""


def _doc_flags(spark: SparkSession, sf: str) -> DataFrame:
    f = _doc_features(spark, sf)
    return f.select(
        "doc_id",
        "source",
        F.expr(
            "CASE WHEN topc * 1000000 div n > 150000 THEN 1 ELSE 0 END"
        ).alias("top_heavy"),
        F.expr("CASE WHEN nd * 1000 div n < 380 THEN 1 ELSE 0 END").alias(
            "low_ttr"
        ),
        F.expr(
            "CASE WHEN chars * 1000 div n < 4000 OR chars * 1000 div n > 5000"
            " THEN 1 ELSE 0 END"
        ).alias("wlen_out"),
        F.expr("CASE WHEN n < 20 THEN 1 ELSE 0 END").alias("short_doc"),
    )


@_register(
    "gopher_quality_flags",
    _GOPHER_ORACLE,
    doc="Composite Gopher-style quality report per source: how many "
    "documents fail each of four deterministic integer rules "
    "(top-word mass > 15%, type-token ratio < 0.38, mean word length "
    "outside [4.0, 5.0] chars, under 20 tokens) and how many are "
    "clean. All four features are in-row array HOFs — one scan, one "
    "source-keyed aggregate.",
)
def gopher_quality_flags(spark: SparkSession, sf: str) -> DataFrame:
    fl = _doc_flags(spark, sf)
    return fl.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("top_heavy").cast("bigint").alias("n_top_heavy"),
        F.sum("low_ttr").cast("bigint").alias("n_low_ttr"),
        F.sum("wlen_out").cast("bigint").alias("n_wlen_out"),
        F.sum("short_doc").cast("bigint").alias("n_short"),
        F.sum(
            F.expr(
                "CASE WHEN top_heavy + low_ttr + wlen_out + short_doc = 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_clean"),
    )


_FLAG_NAMES = ("top_heavy", "low_ttr", "wlen_out", "short_doc")

_COOC_ORACLE = _TOKS_CTE + f""", fl AS ({_FLAGS_SQL})
SELECT * FROM (
""" + "\nUNION ALL\n".join(
    f"  SELECT '{a}' AS flag_a, '{b}' AS flag_b,"
    f" CAST(SUM({a} * {b}) AS BIGINT) AS n_docs FROM fl"
    for i, a in enumerate(_FLAG_NAMES)
    for b in _FLAG_NAMES[i:]
) + "\n)"


@_register(
    "quality_flag_cooccurrence",
    _COOC_ORACLE,
    doc="Pairwise co-occurrence matrix of the four Gopher quality flags "
    "(upper triangle incl. diagonal, 10 rows): which failure modes "
    "travel together decides whether rules are redundant or "
    "complementary before wiring them into a filter cascade. One "
    "scan; the 10 cells are conditional sums in a single global "
    "aggregate (map-side partials, a 1-row shuffle).",
)
def quality_flag_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    fl = _doc_flags(spark, sf)
    cells = [
        F.sum(F.col(a) * F.col(b)).cast("bigint").alias(f"c_{i}_{j}")
        for i, a in enumerate(_FLAG_NAMES)
        for j, b in enumerate(_FLAG_NAMES)
        if j >= i
    ]
    one = fl.agg(*cells)
    pairs = [
        F.struct(
            F.lit(a).alias("flag_a"),
            F.lit(b).alias("flag_b"),
            F.col(f"c_{i}_{j}").alias("n_docs"),
        )
        for i, a in enumerate(_FLAG_NAMES)
        for j, b in enumerate(_FLAG_NAMES)
        if j >= i
    ]
    return one.select(F.explode(F.array(*pairs)).alias("u")).select(
        "u.flag_a", "u.flag_b", "u.n_docs"
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split + audits
# ---------------------------------------------------------------------------

# Split bucket: the first two hex digits of md5(doc_id) as a uniform
# 0..255 value (each digit decoded by position in the hex alphabet —
# md5 is the one digest both engines share bit-for-bit; same family as
# sample_hash / pack_sequences). 80/10/10 => thresholds 204 / 230.
_BUCKET_DUCK = (
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    " * 16 + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))"
    " - 1"
)
_BUCKET_SPARK = (
    "(locate(substring(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef') - 1)"
    " * 16 + locate(substring(md5(cast(doc_id as string)), 2, 1), '0123456789abcdef')"
    " - 1"
)


def _split_case(bucket_sql: str) -> str:
    return (
        f"CASE WHEN ({bucket_sql}) < 204 THEN 'train'"
        f" WHEN ({bucket_sql}) < 230 THEN 'val' ELSE 'test' END"
    )


_SPLIT_ORACLE = f"""
WITH d AS (
  SELECT source, {_split_case(_BUCKET_DUCK)} AS split,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
), a AS (
  SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM d GROUP BY split, source
)
SELECT split, source, n_docs, n_tokens,
       CAST(n_tokens * 1000000 // SUM(n_tokens) OVER (PARTITION BY source)
            AS BIGINT) AS tok_share_ppm
FROM a
"""


@_register(
    "split_assign_3way",
    _SPLIT_ORACLE,
    doc="Deterministic 80/10/10 train/val/test assignment: a uniform "
    "0..255 bucket from the first two md5(doc_id) hex digits, "
    "thresholds 204/230 — reproducible across engines, runs, and "
    "cluster layouts (the property rand()-based splits lack), with "
    "per-(split, source) document and token budgets and each split's "
    "ppm share of its source's tokens. The share window runs on the "
    "<= 60-row aggregate, never row-grain data.",
)
def split_assign_3way(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source",
        F.expr(_split_case(_BUCKET_SPARK)).alias("split"),
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    a = d.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    return a.select(
        "split",
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            "n_tokens * 1000000 div sum(n_tokens) over (partition by source)"
        ).alias("tok_share_ppm"),
    )


_DRIFT_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_split_case(_BUCKET_DUCK)} AS split,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), wc AS (
  SELECT u.w AS w, d.split, CAST(COUNT(*) AS BIGINT) AS c
  FROM d, unnest(d.w) AS u(w) GROUP BY u.w, d.split
), tot AS (
  SELECT split, SUM(c) AS t FROM wc GROUP BY split
), byw AS (
  SELECT w,
         SUM(c) AS c_all,
         SUM(CASE WHEN split = 'train' THEN c ELSE 0 END) AS c_train,
         SUM(CASE WHEN split = 'test' THEN c ELSE 0 END) AS c_test
  FROM wc GROUP BY w
), top AS (
  SELECT w, c_train, c_test,
         ROW_NUMBER() OVER (ORDER BY c_all DESC, w) AS rnk
  FROM byw
)
SELECT w,
       CAST(c_train * 1000000 // (SELECT t FROM tot WHERE split = 'train')
            AS BIGINT) AS train_ppm,
       CAST(c_test * 1000000 // (SELECT t FROM tot WHERE split = 'test')
            AS BIGINT) AS test_ppm,
       CAST(ABS(c_train * 1000000 // (SELECT t FROM tot WHERE split = 'train')
            - c_test * 1000000 // (SELECT t FROM tot WHERE split = 'test'))
            AS BIGINT) AS drift_ppm
FROM top WHERE rnk <= 20
"""


@_register(
    "split_drift_topwords",
    _DRIFT_ORACLE,
    doc="Split drift audit: the 20 highest-mass corpus words with their "
    "token-mass ppm inside train vs test and the absolute drift — a "
    "hash split should show near-zero drift, a time- or source-"
    "correlated split shows it immediately. Word counts aggregate "
    "once; the split totals are two broadcast scalars; the top-20 is "
    "orderBy().limit() (TakeOrderedAndProject — per-partition 20-row "
    "heaps, never a single-partition vocabulary sort) with a (count "
    "desc, word) tie-break making it deterministic.",
)
def split_drift_topwords(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select(F.expr(_split_case(_BUCKET_SPARK)).alias("split"), w.alias("w"))
    wc = d.select("split", F.explode("w").alias("w")).groupBy("w", "split").agg(
        F.count(F.lit(1)).alias("c")
    )
    byw = wc.groupBy("w").agg(
        F.sum("c").alias("c_all"),
        F.sum(F.when(F.col("split") == "train", F.col("c")).otherwise(0)).alias(
            "c_train"
        ),
        F.sum(F.when(F.col("split") == "test", F.col("c")).otherwise(0)).alias(
            "c_test"
        ),
    )
    tot = wc.groupBy().agg(
        F.sum(F.when(F.col("split") == "train", F.col("c")).otherwise(0)).alias(
            "t_train"
        ),
        F.sum(F.when(F.col("split") == "test", F.col("c")).otherwise(0)).alias(
            "t_test"
        ),
    )
    # top-20 via orderBy().limit() — TakeOrderedAndProject: per-partition
    # top-k + driver merge of 20-row heaps. A row_number() Window without
    # PARTITION BY would funnel the ENTIRE vocabulary (1e8-1e9 unigrams at
    # 100 TB) through one task; the (c_all desc, w) tie-break makes the
    # limit deterministic, so both plans return the identical 20 rows.
    top = byw.orderBy(F.col("c_all").desc(), F.col("w")).limit(20)
    joined = top.crossJoin(F.broadcast(tot))
    return joined.select(
        "w",
        F.expr("c_train * 1000000 div t_train").alias("train_ppm"),
        F.expr("c_test * 1000000 div t_test").alias("test_ppm"),
        F.expr(
            "abs(c_train * 1000000 div t_train - c_test * 1000000 div t_test)"
        ).alias("drift_ppm"),
    )


_LEAK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, md5(text) AS dig, {_split_case(_BUCKET_DUCK)} AS split
  FROM documents
), g AS (
  SELECT dig, MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train
  FROM d GROUP BY dig
), t AS (
  SELECT d.source,
         CASE WHEN g.has_train = 1 THEN 1 ELSE 0 END AS leaked
  FROM d JOIN g ON d.dig = g.dig WHERE d.split = 'test'
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_test_docs,
       CAST(SUM(leaked) AS BIGINT) AS n_leaked,
       CAST(SUM(leaked) * 1000000 // COUNT(*) AS BIGINT) AS leak_ppm
FROM t GROUP BY source
"""


@_register(
    "split_dup_leakage",
    _LEAK_ORACLE,
    doc="Train->test duplicate leakage: test documents whose EXACT text "
    "(md5 digest) also appears in train — the contamination a naive "
    "doc-id hash split admits whenever duplicates exist, and the "
    "reason production splits run AFTER dedup. One digest-keyed "
    "aggregate marks train presence; the test side joins on digest "
    "only (no text comparison at shuffle time).",
)
def split_dup_leakage(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    d = docs.select(
        "source",
        F.md5(F.col("text")).alias("dig"),
        F.expr(_split_case(_BUCKET_SPARK)).alias("split"),
    )
    g = d.groupBy("dig").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "has_train"
        )
    )
    t = (
        d.where(F.col("split") == "test")
        .join(g, "dig")
        .select(
            "source",
            F.when(F.col("has_train") == 1, 1).otherwise(0).alias("leaked"),
        )
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.sum("leaked").cast("bigint").alias("n_leaked"),
        F.expr("sum(leaked) * 1000000 div count(1)").alias("leak_ppm"),
    )


# ---------------------------------------------------------------------------
# Positional / correlation text profiles
# ---------------------------------------------------------------------------

_POSITION_ORACLE = """
WITH toks AS (
  SELECT lang,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), x AS (
  SELECT lang, w, len(w) AS nw, unnest(range(0, len(w))) AS i
  FROM toks WHERE len(w) > 0
), e AS (
  SELECT lang, CAST(i * 3 // nw AS INTEGER) AS tercile, len(w[i + 1]) AS wl
  FROM x
)
SELECT lang, tercile,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wl) * 1000 // COUNT(*) AS BIGINT) AS mean_len_milli
FROM e GROUP BY lang, tercile
"""


@_register(
    "word_position_profile",
    _POSITION_ORACLE,
    doc="Positional homogeneity: mean word length (milli) by document "
    "tercile (leading / middle / trailing third of each document's "
    "token stream) per language — templated boilerplate shows up as a "
    "positional skew natural text lacks. The tercile is integer "
    "position arithmetic on posexplode output; one (lang, tercile) "
    "aggregate.",
)
def word_position_profile(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    w = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select("lang", w.alias("w")).where(F.size("w") > 0)
    e = d.select(
        "lang", F.size("w").alias("nw"), F.posexplode("w").alias("i", "word")
    ).select(
        "lang",
        F.expr("i * 3 div nw").cast("int").alias("tercile"),
        F.length("word").alias("wl"),
    )
    return e.groupBy("lang", "tercile").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr("sum(wl) * 1000 div count(1)").alias("mean_len_milli"),
    )


_TTR_CORR_ORACLE = _TOKS_CTE + """
, m AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(n AS DECIMAL(19,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(nd AS DECIMAL(19,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(n AS DECIMAL(19,0)) * nd) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(n AS DECIMAL(19,0)) * n) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(nd AS DECIMAL(19,0)) * nd) AS DOUBLE) AS syy
  FROM f GROUP BY lang
)
SELECT lang, n,
       CAST(floor((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            * 1000000.0) AS BIGINT) AS corr_micro
FROM m
"""


@_register(
    "doc_len_ttr_corr",
    _TTR_CORR_ORACLE,
    doc="Pearson correlation (micro) between document length and "
    "distinct-word count per language — the length-vs-vocabulary "
    "coupling that says whether a raw TTR threshold double-counts the "
    "length filter. Exact DECIMAL moments, one final double op tree "
    "(the round7 autocorr recipe), floor to integer micro.",
)
def doc_len_ttr_corr(spark: SparkSession, sf: str) -> DataFrame:
    f = _doc_features(spark, sf)
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    m = f.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("n"))).cast("double").alias("sx"),
        F.sum(d(F.col("nd"))).cast("double").alias("sy"),
        F.sum(d(F.col("n")) * F.col("nd")).cast("double").alias("sxy"),
        F.sum(d(F.col("n")) * F.col("n")).cast("double").alias("sxx"),
        F.sum(d(F.col("nd")) * F.col("nd")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "lang", "n", F.floor(corr * 1000000.0).cast("long").alias("corr_micro")
    )


# ---------------------------------------------------------------------------
# MinHash band calibration
# ---------------------------------------------------------------------------

# Candidate CTE mirrors plans/pipeline.py _MINHASH_DET_ORACLE (same
# md5 family, 32 hashes, 16 bands x 2 rows) up to the verify stage,
# then buckets by exact integer Jaccard decile instead of thresholding.
_MINHASH_FP_ORACLE = """
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
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM keys a JOIN keys b ON a.b = b.b AND a.bkey = b.bkey AND a.id < b.id
), j AS (
  SELECT len(list_intersect(sa.shingles, sb.shingles)) AS inter,
         len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles)) AS u
  FROM cand c JOIN ne sa ON sa.id = c.id_a JOIN ne sb ON sb.id = c.id_b
)
SELECT CAST(LEAST(9, inter * 10 // u) AS INTEGER) AS jacc_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1
"""


@_register(
    "minhash_band_fp_rate",
    _MINHASH_FP_ORACLE,
    doc="MinHash band calibration: ALL band-collision candidate pairs "
    "bucketed by exact integer Jaccard decile — the measured "
    "candidate-quality curve behind the 16x2 banding choice (mass in "
    "low deciles = wasted verify work, the S-curve knee should sit at "
    "the 0.5 threshold). Reuses the dedup_minhash_det pipeline "
    "(operators/dedup.minhash_det_pairs with_counts=True); deciles "
    "are integer div, no float Jaccard anywhere.",
)
def minhash_band_fp_rate(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators import dedup as D

    pairs = D.minhash_det_pairs(
        load_table(spark, sf, "documents"),
        n=2,
        num_hashes=32,
        bands=16,
        with_counts=True,
    )
    return pairs.groupBy(
        F.expr("least(9, inter * 10 div union_sz)").cast("int").alias(
            "jacc_decile"
        )
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# ---------------------------------------------------------------------------
# Embedding sign-octant occupancy
# ---------------------------------------------------------------------------

_OCTANT_ORACLE = """
WITH o AS (
  SELECT label,
         CAST(CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END AS INTEGER)
           AS octant
  FROM embeddings
), a AS (
  SELECT label, octant, CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM o GROUP BY label, octant
)
SELECT label, octant, n_vecs,
       CAST(n_vecs * 1000000 // SUM(n_vecs) OVER (PARTITION BY label)
            AS BIGINT) AS share_ppm
FROM a
"""


@_register(
    "embedding_octant_occupancy",
    _OCTANT_ORACLE,
    doc="Sign-octant occupancy of the first three embedding dimensions "
    "per label — the joint-sign coverage audit (complements the "
    "per-dimension embedding_sign_balance): a label collapsed into "
    "few octants signals anisotropy the per-dim marginals hide. Sign "
    "tests are exact float comparisons; the share window runs on the "
    "<= labels x 8 aggregate.",
)
def embedding_octant_occupancy(spark: SparkSession, sf: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf, "embeddings"))
    octant = (
        F.when(F.element_at("embedding", 1) >= 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) >= 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) >= 0, 1).otherwise(0)
    )
    a = emb.select("label", octant.cast("int").alias("octant")).groupBy(
        "label", "octant"
    ).agg(F.count(F.lit(1)).alias("n_vecs"))
    return a.select(
        "label",
        "octant",
        "n_vecs",
        F.expr(
            "n_vecs * 1000000 div sum(n_vecs) over (partition by label)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Behavioral Fano-factor bands
# ---------------------------------------------------------------------------

_FANO_BAND_CASE = (
    "CASE WHEN fano < 500 THEN 0 WHEN fano < 650 THEN 1 WHEN fano < 800 THEN 2"
    " WHEN fano < 950 THEN 3 WHEN fano < 1100 THEN 4 ELSE 5 END"
)

_FANO_ORACLE = f"""
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS dy, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, dy
), u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
  FROM d GROUP BY user_id
), fv AS (
  SELECT 1000 * (n * q - s * s) // (n * s) AS fano FROM u
)
SELECT CAST({_FANO_BAND_CASE} AS INTEGER) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM fv GROUP BY 1
"""


@_register(
    "events_fano_daily",
    _FANO_ORACLE,
    doc="Burstiness via the Fano factor of per-user daily event counts "
    "(population variance / mean, exact integer milli: 1000*(n*Sq - "
    "S^2) div (n*S)) — under 1000 means steadier than Poisson, over "
    "means bursty; banded user counts. Two stacked aggregates (user x "
    "day, then user), band thresholds calibrated on the sf0.01 "
    "distribution (med 713, q3 817 milli).",
)
def events_fano_daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf, "events"))
    d = ev.groupBy("user_id", F.to_date("ts").alias("dy")).agg(
        F.count(F.lit(1)).alias("c")
    )
    u = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    fv = u.select(F.expr("1000 * (n * q - s * s) div (n * s)").alias("fano"))
    return fv.groupBy(
        F.expr(_FANO_BAND_CASE).cast("int").alias("band")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Warehouse faces
# ---------------------------------------------------------------------------

_SEASONALITY_ORACLE = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS INTEGER) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT m, n_orders,
       CAST(n_orders * 12 * 1000000 // SUM(n_orders) OVER () AS BIGINT)
         AS index_ppm
FROM m
"""


@_register(
    "orders_monthly_seasonality",
    _SEASONALITY_ORACLE,
    doc="Month-of-year seasonality index: each calendar month's order "
    "count against the uniform expectation (12 * count / total, ppm — "
    "1000000 = exactly average). One month-keyed aggregate; the "
    "total is a window over the 12-row result.",
)
def orders_monthly_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    o = fan_out(load_table(spark, sf, "orders"))
    m = o.groupBy(F.month("o_orderdate").cast("int").alias("m")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return m.select(
        "m",
        "n_orders",
        F.expr("n_orders * 12 * 1000000 div sum(n_orders) over ()").alias(
            "index_ppm"
        ),
    )


_DEGREE_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), sp AS (
  SELECT 'suppliers_per_part' AS side, CAST(COUNT(*) AS BIGINT) AS degree
  FROM ps GROUP BY l_partkey
), pp AS (
  SELECT 'parts_per_supplier' AS side, CAST(COUNT(*) AS BIGINT) AS degree
  FROM ps GROUP BY l_suppkey
), uni AS (
  SELECT * FROM sp UNION ALL SELECT * FROM pp
)
SELECT side, degree, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM uni GROUP BY side, degree
"""


@_register(
    "part_supplier_degree_hist",
    _DEGREE_ORACLE,
    doc="Degree distribution of the part-supplier bipartite graph "
    "implied by lineitem (distinct (part, supplier) pairs): suppliers "
    "per part and parts per supplier histograms in one face — the "
    "fan-out profile that prices a part->supplier join and flags "
    "skewed hub keys. One distinct-pair reduction feeds both "
    "directions.",
)
def part_supplier_degree_hist(spark: SparkSession, sf: str) -> DataFrame:
    li = fan_out(load_table(spark, sf, "lineitem"))
    ps = li.select("l_partkey", "l_suppkey").distinct()
    sp = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).select(F.lit("suppliers_per_part").alias("side"), "degree")
    pp = ps.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).select(F.lit("parts_per_supplier").alias("side"), "degree")
    return sp.unionByName(pp).groupBy("side", "degree").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
