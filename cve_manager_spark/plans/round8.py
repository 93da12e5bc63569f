"""Round-8 tranche: new oracle-paired specs staged for the r8 driver
window (VERDICT r7 #2) — span-grain decontamination, a deterministic
quality classifier, perceptual image-hash dedup (the missing multimodal
dedup modality), the IVF coarse-quantizer hash face, and warehouse /
behavioral reporting.

Recurring determinism recipes (plans/spec.py contract):

- **Integer ppm shares**: ``x * 1000000 div total`` on BIGINTs (HUGEINT/
  DECIMAL(38,0) products where the numerator could overflow long).
- **Exact DECIMAL money sums** emitted as one final double cast
  (functions.helpers.dec_sum).
- **Exact order statistics**: quartiles/deciles picked by ROW_NUMBER /
  NTILE over a total order with a unique tie-break — both engines
  implement the same SQL-standard positioning, no interpolation.
- **Perceptual-hash bit math**: aHash bits are ``px*64 > sum(px)``
  (pure integers, no float mean); hashes surface as 16-char hex strings
  and 4×16-bit integer bands, so Hamming distance is a SUM of per-band
  ``bit_count(xor)`` — no signed-64-bit edge anywhere.
- The stub image decode is sha256-tiling (operators/multimodal.py), so
  the image oracles reproduce pixels with ``repeat(sha256(text), 2)``
  hex-pair arithmetic — the multimodal_thumbnail precedent.
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
# training-data pipeline: span-grain decontamination + quality classifier
# ---------------------------------------------------------------------------

_SPAN_ORACLE = """
WITH toks AS (
  SELECT doc_id,
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
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN prev IS NULL THEN 3
                     ELSE least(3, pos - prev) END) AS BIGINT)
         AS n_contam_tokens
FROM g GROUP BY doc_id
"""


@_register(
    "decontaminate_spans",
    _SPAN_ORACLE,
    doc="SPAN-grain test-set decontamination (the public-pipeline shape "
    "next to doc-grain decontaminate_ngram): every POSITION whose word "
    "n-gram appears in the held-out set (doc_id % 97 == 0; n=3 for "
    "test-corpus density, production 8-13) is a contaminated span, and "
    "the contaminated-TOKEN count is the union of the fixed-length "
    "span intervals — computed with one LAG window per doc (intervals "
    "are equal length, so each span adds min(n, pos - prev) new "
    "tokens), never an interval self-join. The eval shingle set "
    "broadcasts; the only shuffles are the hit join key and the "
    "per-doc window — the 100 TB shape of doc-grain decontamination "
    "with position fidelity added.",
)
def decontaminate_spans(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    sh = toks.where(F.size("w") >= 3).select(
        "doc_id",
        F.explode(
            F.filter(
                F.transform(
                    F.col("w"),
                    lambda x, i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice(F.col("w"), i + F.lit(1), 3)).alias(
                            "s"
                        ),
                    ),
                ),
                lambda st: st["pos"] <= F.size(F.col("w")) - 3,
            )
        ).alias("u"),
    ).select("doc_id", F.col("u.pos").alias("pos"), F.col("u.s").alias("s"))
    ev = sh.where(F.col("doc_id") % 97 == 0).select("s").distinct()
    hits = (
        sh.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "s")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    g = hits.withColumn("prev", F.lag("pos").over(w))
    contrib = F.when(F.col("prev").isNull(), F.lit(3)).otherwise(
        F.least(F.lit(3), F.col("pos") - F.col("prev"))
    )
    return g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(contrib).alias("n_contam_tokens"),
    )


# Deterministic integer-weight quality classifier: every feature is an
# exact integer rate (ppm / milli), the score one integer linear form.
_QUALITY_EXPR_SQL = """
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_words,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> list_contains(['the','a','an','of','and','to','in','is',
                                 'it','that'], x))) AS n_stop,
         length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_nospace
  FROM documents
"""

_QUALITY_SCORE_SQL = """
  SELECT doc_id, source,
         CASE WHEN n_words > 0 AND n_chars > 0 THEN
              2 * (n_stop * 1000000 // n_words)
            - 3 * (n_punct * 1000000 // n_chars)
            - 2 * (n_digit * 1000000 // n_chars)
            + 5000 * least(n_words, 64)
            - abs((n_nospace * 1000 // n_words) - 5000) * 100
         ELSE -1000000 END AS score
  FROM f
"""

_QUALITY_ORACLE = (
    "WITH f AS (" + _QUALITY_EXPR_SQL + "), s AS (" + _QUALITY_SCORE_SQL + """
)
SELECT doc_id, score,
       CASE WHEN score >= 600000 THEN 'high'
            WHEN score >= 300000 THEN 'mid'
            ELSE 'low' END AS label
FROM s
"""
)


def _quality_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, source, score, label) — shared by the scorer face, the
    decile profile and the dup×quality matrix."""
    from cve_manager_spark.operators.text import _is_stopword, words

    t = F.col("text")
    n_words = F.size(words(t))
    n_chars = F.length(t)
    n_stop = F.size(F.filter(words(F.lower(t)), _is_stopword))
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_nospace = F.length(F.regexp_replace(t, r"\s", ""))
    # materialize the integer features as columns, then one linear form
    f = docs.select(
        "doc_id",
        "source",
        n_words.cast("bigint").alias("n_words"),
        n_chars.cast("bigint").alias("n_chars"),
        n_stop.cast("bigint").alias("n_stop"),
        n_punct.cast("bigint").alias("n_punct"),
        n_digit.cast("bigint").alias("n_digit"),
        n_nospace.cast("bigint").alias("n_nospace"),
    )
    score = F.when(
        (F.col("n_words") > 0) & (F.col("n_chars") > 0),
        2 * F.expr("n_stop * 1000000 div n_words")
        - 3 * F.expr("n_punct * 1000000 div n_chars")
        - 2 * F.expr("n_digit * 1000000 div n_chars")
        + 5000 * F.least(F.col("n_words"), F.lit(64))
        - F.abs(F.expr("n_nospace * 1000 div n_words") - 5000) * 100,
    ).otherwise(F.lit(-1000000))
    s = f.select("doc_id", "source", score.cast("bigint").alias("score"))
    label = (
        F.when(F.col("score") >= 600000, "high")
        .when(F.col("score") >= 300000, "mid")
        .otherwise("low")
    )
    return s.withColumn("label", label)


@_register(
    "quality_classifier_score",
    _QUALITY_ORACLE,
    doc="Deterministic quality-classifier scorer (VERDICT r7 #2): an "
    "integer-weight linear model over exact token features — stopword "
    "ppm (fluency proxy, +), punctuation/digit ppm (boilerplate "
    "proxies, −), a capped length bonus, and a penalty for mean word "
    "length far from 5 chars — with fixed thresholds binning docs into "
    "high/mid/low. Every feature is an integer rate (ppm/milli via "
    "integer div), the score one integer linear form: bit-identical on "
    "any engine/partitioning, which is what makes a *classifier* "
    "auditable at 100 TB (the float-logit version never hashes). Pure "
    "narrow projection — no shuffle at all.",
)
def quality_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    return _quality_scored(docs).select("doc_id", "score", "label")


_QUALITY_DECILE_ORACLE = (
    "WITH f AS (" + _QUALITY_EXPR_SQL + "), s AS (" + _QUALITY_SCORE_SQL + """
), d AS (
  SELECT doc_id, score, NTILE(10) OVER (ORDER BY score, doc_id) AS decile
  FROM s
)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(score) AS min_score, MAX(score) AS max_score
FROM d GROUP BY decile
"""
)


@_register(
    "quality_score_deciles",
    _QUALITY_DECILE_ORACLE,
    doc="Decile profile of the quality score — the filtering dial a "
    "pipeline reads before choosing a keep threshold ('keep the top 7 "
    "deciles' = min_score of decile 4). The oracle states it as NTILE "
    "over (score, doc_id); the Spark plan computes the IDENTICAL "
    "output without ever globally sorting rows (a global NTILE window "
    "funnels every row through ONE task): the score HISTOGRAM "
    "(bounded by distinct scores) gets cumulative counts, the ten "
    "NTILE bucket boundaries are pure arithmetic on the total, and a "
    "broadcast range-intersection join of the 10-row decile relation "
    "with the histogram yields each decile's count and min/max score "
    "— the scalable form of an exact global order statistic.",
)
def quality_score_deciles(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    s = _quality_scored(docs)
    # score histogram + cumulative range [cum_lo, cum_hi] per score
    hist = s.groupBy("score").agg(F.count(F.lit(1)).alias("cnt"))
    wh = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    hist = hist.withColumn("cum_hi", F.sum("cnt").over(wh)).withColumn(
        "cum_lo", F.col("cum_hi") - F.col("cnt") + 1
    )
    total = hist.groupBy().agg(F.sum("cnt").alias("n"))
    # NTILE bucket math: q = n div 10, r = n mod 10; bucket d (1-based)
    # holds q+1 rows for d <= r else q, starting at (d-1)q + min(d-1, r) + 1
    dec10 = (
        total.select(
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.lit(10).cast("bigint"))
            ).alias("decile"),
            "n",
        )
        .withColumn("q", F.expr("n div 10"))
        .withColumn("r", F.expr("n % 10"))
        .withColumn(
            "lo", F.expr("(decile - 1) * q + least(decile - 1, r) + 1")
        )
        .withColumn(
            "hi",
            F.expr("lo + q + (CASE WHEN decile <= r THEN 1 ELSE 0 END) - 1"),
        )
        .where(F.col("hi") >= F.col("lo"))
        .select("decile", "lo", "hi")
    )
    j = hist.join(
        F.broadcast(dec10),
        (F.col("cum_lo") <= F.col("hi")) & (F.col("cum_hi") >= F.col("lo")),
    )
    overlap = F.least(F.col("cum_hi"), F.col("hi")) - F.greatest(
        F.col("cum_lo"), F.col("lo")
    ) + 1
    return j.groupBy("decile").agg(
        F.sum(overlap).alias("n_docs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


_DUP_QUALITY_ORACLE = (
    "WITH f AS (" + _QUALITY_EXPR_SQL + "), s AS (" + _QUALITY_SCORE_SQL + """
), lab AS (
  SELECT doc_id,
         CASE WHEN score >= 600000 THEN 'high'
              WHEN score >= 300000 THEN 'mid'
              ELSE 'low' END AS label
  FROM s
), dup AS (
  SELECT doc_id,
         CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY md5(text))
              THEN 1 ELSE 0 END AS is_dup,
         length(text) AS n_chars
  FROM documents
)
SELECT l.label, d.is_dup,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars
FROM lab l JOIN dup d ON l.doc_id = d.doc_id
GROUP BY l.label, d.is_dup
"""
)


@_register(
    "corpus_quality_dup_matrix",
    _DUP_QUALITY_ORACLE,
    doc="Joint dedup × quality audit: the 2×3 matrix of (exact-duplicate "
    "copy?, quality label) with doc and char volumes — the first table "
    "a pipeline owner reads to see WHERE the duplicate bytes live "
    "(duplicated boilerplate is overwhelmingly low-quality, so dedup "
    "and quality filtering overlap; this measures by how much). "
    "Duplicate copies flagged with the min-over-md5-digest window "
    "(dedup_savings_by_source recipe); the two sides join on doc_id.",
)
def corpus_quality_dup_matrix(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    lab = _quality_scored(docs).select("doc_id", "label")
    w = Window.partitionBy(F.md5(F.col("text")))
    dup = docs.select(
        "doc_id",
        F.when(F.col("doc_id") > F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("is_dup"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return (
        lab.join(dup, "doc_id")
        .groupBy("label", "is_dup")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# perceptual image hashing (multimodal dedup — the missing modality)
# ---------------------------------------------------------------------------


def _phash_oracle_cte() -> str:
    """Machine-built oracle for the aHash over the deterministic stub
    decode: pixels are the bytes of repeat(sha256(text), 2) (the stub
    tiles the 32-byte digest to the 8×8 target), extracted as hex-pair
    integers; bit i = px[i]·64 > Σpx (integer mean test); the hash
    surfaces as 16 hex chars + 4×16-bit band ints."""
    hv = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    # The demo payload is the 32-char text PREFIX (not the full text): the
    # sf0.01 driver corpus has zero exact full-text duplicates, while
    # prefix-32 has ~23 natural collision groups — so the prevalence/near-dup
    # faces verify on NONZERO rows at driver scale instead of 0==0.
    px = ", ".join(
        f"{hv.format(p=2 * i + 1)}*16 + {hv.format(p=2 * i + 2)}" for i in range(64)
    )
    nib = " || ".join(
        "substr('0123456789abcdef', "
        + " + ".join(f"bits[{4 * k + j + 1}]*{8 >> j}" for j in range(4))
        + " + 1, 1)"
        for k in range(16)
    )
    bands = ", ".join(
        "CAST("
        + " + ".join(f"bits[{16 * j + t + 1}]*{1 << (15 - t)}" for t in range(16))
        + f" AS INTEGER) AS band{j}"
        for j in range(4)
    )
    return f"""
WITH t AS (
  SELECT doc_id, repeat(sha256(substr(text, 1, 32)), 2) AS h FROM documents
), p AS (
  SELECT doc_id, [{px}] AS px FROM t
), s AS (
  SELECT doc_id, px, list_sum(px) AS tot FROM p
), b AS (
  SELECT doc_id,
         list_transform(px, x -> CASE WHEN x * 64 > tot THEN 1 ELSE 0 END)
           AS bits
  FROM s
), ph AS (
  SELECT doc_id, {nib} AS phash_hex, {bands} FROM b
)
"""


_PHASH_ORACLE = _phash_oracle_cte() + """
SELECT doc_id, phash_hex, band0, band1, band2, band3 FROM ph
"""


def _phash_df(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.multimodal import (
        attach_binary,
        decode_resize,
        phash_ahash,
    )

    docs = fan_out(load_table(spark, sf, "documents")).withColumn(
        "text", F.substring("text", 1, 32)
    )
    thumbs = decode_resize(attach_binary(docs), target=(8, 8))
    return phash_ahash(thumbs)


@_register(
    "image_phash",
    _PHASH_ORACLE,
    doc="Perceptual image hash (aHash) over the decode_resize thumbnail "
    "(VERDICT r7 #2 — multimodal dedup plumbing): 8×8 grayscale pixels "
    "→ 64 bits of 'pixel above image mean', folded MSB-first into a "
    "16-hex-char fingerprint plus 4×16-bit LSH bands. The mean test is "
    "pure integers (px·64 > Σpx — no float mean, no rounding edge), "
    "the kernel one numpy pass per Arrow batch, and the banding reuses "
    "the SimHash discipline so Hamming-banded candidate joins work "
    "unchanged. The stub decoder is sha256-tiling (media libs absent), "
    "which the oracle reproduces hex-pair-wise — swap real_decoder= "
    "for PIL and ONLY the pixel source changes.",
)
def image_phash(spark: SparkSession, sf: str) -> DataFrame:
    return _phash_df(spark, sf).select(
        "doc_id", "phash_hex", "band0", "band1", "band2", "band3"
    )


_PHASH_PREV_ORACLE = _phash_oracle_cte() + """
SELECT phash_hex, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_id
FROM ph GROUP BY phash_hex HAVING COUNT(*) > 1
"""


@_register(
    "image_phash_prevalence",
    _PHASH_PREV_ORACLE,
    doc="Exact perceptual-duplicate groups: images sharing an identical "
    "aHash, with the canonical keeper (min doc_id) — the image-side "
    "twin of dedup_exact's digest groupBy. One hash-keyed shuffle of "
    "16-byte fingerprints, never pixels.",
)
def image_phash_prevalence(spark: SparkSession, sf: str) -> DataFrame:
    ph = _phash_df(spark, sf)
    return (
        ph.groupBy("phash_hex")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


_PHASH_DEDUP_ORACLE = _phash_oracle_cte() + """
, m AS (
  SELECT doc_id, band0, band1, band2, band3,
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
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(CAST(x.band0 AS BIGINT), CAST(y.band0 AS BIGINT)))
          + bit_count(xor(CAST(x.band1 AS BIGINT), CAST(y.band1 AS BIGINT)))
          + bit_count(xor(CAST(x.band2 AS BIGINT), CAST(y.band2 AS BIGINT)))
          + bit_count(xor(CAST(x.band3 AS BIGINT), CAST(y.band3 AS BIGINT)))
          AS INTEGER) AS hamming
FROM cand c
JOIN hp x ON c.id_a = x.doc_id
JOIN hp y ON c.id_b = y.doc_id
WHERE bit_count(xor(CAST(x.band0 AS BIGINT), CAST(y.band0 AS BIGINT)))
    + bit_count(xor(CAST(x.band1 AS BIGINT), CAST(y.band1 AS BIGINT)))
    + bit_count(xor(CAST(x.band2 AS BIGINT), CAST(y.band2 AS BIGINT)))
    + bit_count(xor(CAST(x.band3 AS BIGINT), CAST(y.band3 AS BIGINT))) <= 6
"""


@_register(
    "dedup_image_phash",
    _PHASH_DEDUP_ORACLE,
    doc="Hamming-banded image near-dup pairs (VERDICT r7 #2 — composes "
    "the decode_resize Arrow kernel with the SimHash banding "
    "discipline, operators/dedup.py:768): candidates are pairs "
    "agreeing on ANY 16-bit band of the 64-bit aHash (an equi-join on "
    "(band#, key) — a true near-dup at Hamming ≤ 6 disagrees in ≤ 6 "
    "bits, which cannot hit all 4 bands unless ≥... pigeonhole: 6 "
    "bits into 4 bands leaves ≥1 band untouched, so banding recall "
    "is EXACT at this radius), verified by the exact Hamming distance "
    "as Σ per-band bit_count(xor) — no 64-bit signed arithmetic "
    "anywhere. On the sha256-stub pixels only identical payloads "
    "collide (random pairs sit at Hamming ≈ 32), which makes the "
    "result deterministic AND the operator shape production-real; the "
    "payload is the 32-char text prefix, whose natural collision "
    "groups give the face nonzero rows at every driver scale.",
)
def dedup_image_phash(spark: SparkSession, sf: str) -> DataFrame:
    cand = _phash_band_candidates(_phash_df(spark, sf))
    return (
        cand.withColumn("hamming", _phash_hamming().cast("int"))
        .where(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )


def _phash_band_candidates(ph: DataFrame) -> DataFrame:
    """Band-collision candidate pairs with BOTH sides' band ints carried
    in-row (the simhash_det_pairs discipline, operators/dedup.py:768):
    the fingerprint rides through the explode so the self-join yields
    (xa*, yb*) directly — the decode kernel runs once per join side,
    never re-executed by a join-back fetch."""
    m = ph.select(
        "doc_id",
        *[F.col(f"band{j}") for j in range(4)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"band{j}").alias("v")
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id",
        F.col("bk.j").alias("j"),
        F.col("bk.v").alias("v"),
        *[F.col(f"band{j}") for j in range(4)],
    )
    a = m.select(
        F.col("doc_id").alias("id_a"),
        "j",
        "v",
        *[F.col(f"band{j}").alias(f"xa{j}") for j in range(4)],
    )
    b = m.select(
        F.col("doc_id").alias("id_b"),
        "j",
        "v",
        *[F.col(f"band{j}").alias(f"yb{j}") for j in range(4)],
    )
    return (
        a.join(b, ["j", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .drop("j", "v")
        .distinct()
    )


def _phash_hamming():
    return sum(
        F.bit_count(
            F.col(f"xa{j}").cast("bigint").bitwiseXOR(F.col(f"yb{j}").cast("bigint"))
        )
        for j in range(4)
    )


# ---------------------------------------------------------------------------
# IVF coarse-quantizer hash face + composed ANN rows-only face
# ---------------------------------------------------------------------------


def _ivf_assign_oracle(n_lists: int) -> str:
    """The k-means CTE from plans/semantic.py with the seed LIMIT
    re-parameterized to n_lists — the SAME two unrolled Lloyd
    iterations, so the oracle verifies exactly the coarse quantizer
    ivf_pq_index trains (operators/semantic.kmeans_fit)."""
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    assert _KMEANS_CTE.count("LIMIT 8") == 1
    return _KMEANS_CTE.replace("LIMIT 8", f"LIMIT {n_lists}") + """
SELECT vec_id, CAST(cid AS INTEGER) AS list_id, dist AS dist_q FROM a2
"""


@_register(
    "ivf_assignments",
    _ivf_assign_oracle(16),
    doc="IVF coarse-quantizer list assignment, hash-checked (VERDICT r7 "
    "#2 — the pq_codes pattern applied to the IVF tier, turning the "
    "last rows-only ANN family into a verified one): the deterministic "
    "quantized Lloyd's (k=16 cells, 2 iterations — lowest-id seeds, "
    "integer distances, ties to the lowest cell) that ivf_pq_index "
    "uses as its coarse stage, emitted as (vec_id, list_id, dist_q) "
    "and reproduced bit-for-bit by the machine-parameterized DuckDB "
    "unroll. Assignment is map-side (centroid literals); the driver "
    "sees k·d scalars per iteration.",
)
def ivf_assignments(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import assign_clusters, kmeans_fit

    emb = load_table(spark, sf, "embeddings")
    q, cents = kmeans_fit(emb, vec_col="embedding", id_col="vec_id", k=16, iters=2)
    out = assign_clusters(q, cents)
    return out.select(
        "vec_id", F.col("cluster").cast("int").alias("list_id"), F.col("dist_q")
    )


@_register(
    "ann_ivf_pq",
    None,  # approximate retrieval: rows-only face; quality gated by
    # tests/test_ann_quality.py (exactness/determinism properties) and
    # ANN_RECALL.json (recall 0.91 @ 8.2% exact-scan-equivalent bytes)
    doc="Composed IVF×PQ retrieve-then-rerank top-k (VERDICT r6 #7 / r7 "
    "#1): probe the nearest coarse cells, ADC-rank codes only within "
    "them, exact-rerank the survivors. Registered as the flagship ANN "
    "search face; deterministic end-to-end (integer probe ranking, "
    "integer ADC, (score,id) tie-breaks) but not SQL-expressible as a "
    "fixed oracle economically — its exactness property (full probe + "
    "full candidates == cosine_topk, ids AND order) and recall "
    "frontier are pinned in test_ann_quality.py / ANN_RECALL.json.",
)
def ann_ivf_pq(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.similarity import ivf_pq_index, ivf_pq_topk

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") == 7).select(F.col("embedding").alias("qvec"))
    corpus = emb.where(F.col("vec_id") != 7)
    idx, cents, books = ivf_pq_index(corpus, n_lists=8, m=8, k_codes=16)
    return ivf_pq_topk(
        corpus, q, idx, cents, books, k=10, n_probe=4, n_candidates=50
    )


# ---------------------------------------------------------------------------
# corpus linguistics III / behavioral / warehouse reporting
# ---------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT source, unnest(CASE WHEN len(w) >= 3
    THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
    ELSE [] END) AS s
  FROM toks
), spread AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_sources FROM sh GROUP BY s
)
SELECT sh.source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       CAST(SUM(CASE WHEN spread.n_sources = 1 THEN 1 ELSE 0 END) * 1000000
         // COUNT(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN spread ON sh.s = spread.s
GROUP BY sh.source
"""


@_register(
    "source_ngram_novelty",
    _NOVELTY_ORACLE,
    doc="Per-source 3-gram novelty: the share of a source's distinct "
    "shingles appearing in NO other source — the data-mixing signal "
    "for whether a source adds new text or re-serves the common crawl "
    "(novelty ≈ 0 ⇒ candidate for down-weighting in mix_budget). "
    "(source, shingle) pairs are distinct-reduced FIRST, the spread "
    "count shuffles on the shingle key (the shingle-join discipline), "
    "and the final rollup is per source. Integer ppm.",
)
def source_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.dedup import word_shingles

    docs = fan_out(load_table(spark, sf, "documents"))
    sh = docs.select(
        "source", F.explode(word_shingles(F.col("text"), 3)).alias("s")
    ).distinct()
    spread = sh.groupBy("s").agg(F.count(F.lit(1)).alias("n_sources"))
    uniq = F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
    return (
        sh.join(spread, "s")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            uniq.alias("n_unique"),
            F.expr(
                "sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) * 1000000"
                " div count(1)"
            ).alias("novelty_ppm"),
        )
    )


_LIFESPAN_ORACLE = """
SELECT user_id,
       CAST(MIN(CAST(ts AS DATE)) AS DATE) AS first_day,
       CAST(MAX(CAST(ts AS DATE)) AS DATE) AS last_day,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
       CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
            + 1 AS BIGINT) AS span_days
FROM events GROUP BY user_id
"""


@_register(
    "events_user_lifespan",
    _LIFESPAN_ORACLE,
    doc="Per-user lifespan: first/last active day, distinct active days, "
    "calendar span — the cohort-health base table (active_days / "
    "span_days is the engagement density downstream dashboards read). "
    "One user-keyed aggregate; DATE cast on both engines (the "
    "retention-cohort TZ discipline).",
)
def events_user_lifespan(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    d = F.col("ts").cast("date")
    return ev.groupBy("user_id").agg(
        F.min(d).alias("first_day"),
        F.max(d).alias("last_day"),
        F.countDistinct(d).alias("active_days"),
        (F.datediff(F.max(d), F.min(d)) + 1).cast("bigint").alias("span_days"),
    )


_NATION_RATIO_ORACLE = """
WITH s AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
), c AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_nationkey
)
SELECT n.n_name, COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.n_customers, 0) AS n_customers,
       CASE WHEN COALESCE(s.n_suppliers, 0) > 0
            THEN COALESCE(c.n_customers, 0) * 1000000 // s.n_suppliers
            ELSE -1 END AS cust_per_supp_ppm
FROM nation n
LEFT JOIN s ON n.n_nationkey = s.nk
LEFT JOIN c ON n.n_nationkey = c.nk
"""


@_register(
    "nation_supplier_customer_ratio",
    _NATION_RATIO_ORACLE,
    doc="Supply/demand balance per nation: supplier and customer counts "
    "with their ratio (ppm; -1 sentinel for supplierless nations — "
    "LEFT joins keep zero-activity nations, the r7 discipline). Two "
    "pre-aggregates broadcast-join the 25-row dim.",
)
def nation_supplier_customer_ratio(spark: SparkSession, sf: str) -> DataFrame:
    nation = load_table(spark, sf, "nation")
    sup = (
        load_table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    j = (
        nation.join(sup, nation.n_nationkey == sup.nk, "left")
        .join(cust, nation.n_nationkey == cust.nk, "left")
        .select(
            "n_name",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )
    return j.withColumn(
        "cust_per_supp_ppm",
        F.when(
            F.col("n_suppliers") > 0,
            F.expr("n_customers * 1000000 div n_suppliers"),
        ).otherwise(F.lit(-1).cast("bigint")),
    )


_IQR_ORACLE = """
WITH r AS (
  SELECT p_type, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_type
                            ORDER BY p_retailprice, p_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY p_type) AS n
  FROM part
)
SELECT p_type, CAST(MAX(n) AS BIGINT) AS n_parts,
       MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN p_retailprice END) AS q1,
       MAX(CASE WHEN rn = 3 * (n - 1) // 4 + 1 THEN p_retailprice END) AS q3,
       MAX(CASE WHEN rn = 3 * (n - 1) // 4 + 1 THEN p_retailprice END)
     - MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN p_retailprice END) AS iqr
FROM r GROUP BY p_type
"""


@_register(
    "part_type_price_iqr",
    _IQR_ORACLE,
    doc="Exact interquartile price range per part type: Q1/Q3 are the "
    "VALUES at positions floor((n-1)/4)+1 and floor(3(n-1)/4)+1 of the "
    "(price, partkey) total order — picked, not interpolated, so two "
    "engines agree bitwise (the median_exact discipline, per-group). "
    "One partitioned window; the IQR subtraction of two exact doubles "
    "is deterministic.",
)
def part_type_price_iqr(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    w = Window.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    wn = Window.partitionBy("p_type")
    r = part.select(
        "p_type",
        "p_retailprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q1 = F.max(
        F.when(F.col("rn") == F.expr("(n - 1) div 4 + 1"), F.col("p_retailprice"))
    )
    q3 = F.max(
        F.when(
            F.col("rn") == F.expr("3 * (n - 1) div 4 + 1"), F.col("p_retailprice")
        )
    )
    return r.groupBy("p_type").agg(
        F.max("n").alias("n_parts"),
        q1.alias("q1"),
        q3.alias("q3"),
        (q3 - q1).alias("iqr"),
    )


_STATUS_PRIORITY_ORACLE = """
WITH m AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), t AS (
  SELECT o_orderstatus, CAST(SUM(n_orders) AS BIGINT) AS status_total FROM m
  GROUP BY o_orderstatus
)
SELECT m.o_orderstatus, m.o_orderpriority, m.n_orders, m.revenue,
       m.n_orders * 1000000 // t.status_total AS share_ppm
FROM m JOIN t ON m.o_orderstatus = t.o_orderstatus
"""


@_register(
    "orders_status_priority_matrix",
    _STATUS_PRIORITY_ORACLE,
    doc="Order status × priority mix: counts, exact-DECIMAL revenue and "
    "each priority's integer ppm share within its status — the "
    "backlog-composition report (are urgent orders piling up in 'O'?). "
    "Two chained aggregates on the same key prefix; the share join is "
    "a broadcast of |statuses| rows.",
)
def orders_status_priority_matrix(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    m = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice")).alias("revenue"),
    )
    t = m.groupBy("o_orderstatus").agg(F.sum("n_orders").alias("status_total"))
    return (
        m.join(F.broadcast(t), "o_orderstatus")
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            "revenue",
            F.expr("n_orders * 1000000 div status_total").alias("share_ppm"),
        )
    )


_TOP_DECILE_ORACLE = """
WITH spend AS (
  SELECT c.c_nationkey AS nk, c.c_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
           AS units
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_custkey
), d AS (
  SELECT nk, units,
         NTILE(10) OVER (PARTITION BY nk ORDER BY units DESC, c_custkey)
           AS decile
  FROM spend
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(units) AS DOUBLE) / 10000 AS total_spend,
       CAST(SUM(CASE WHEN decile = 1 THEN units ELSE 0 END) AS DOUBLE) / 10000
         AS top_decile_spend,
       CAST(SUM(CASE WHEN decile = 1 THEN units ELSE 0 END) * 1000000
            // SUM(units) AS BIGINT) AS concentration_ppm
FROM d JOIN nation n ON d.nk = n.n_nationkey
GROUP BY n.n_name
"""


@_register(
    "customer_top_decile_concentration",
    _TOP_DECILE_ORACLE,
    doc="Revenue concentration per nation: the ppm of order value "
    "contributed by the top spending decile of that nation's buyers — "
    "the whale-dependence metric. Per-customer spend is summed as "
    "exact DECIMAL and converted ONCE to integer 1/10000-currency "
    "units, so the decile cut (NTILE over units DESC with custkey "
    "tie-break), the ppm share (integer product div sum — BIGINT "
    "headroom to ~sf100; re-cast the product DECIMAL(38,0) past that, "
    "the label_pair_centroid_dist precedent) and the emitted doubles "
    "(exact integer / 10000, identical IEEE op both engines) are all "
    "engine-exact. Aggregate → window within nation → rollup; nothing "
    "wider than the customer key.",
)
def customer_top_decile_concentration(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "c_custkey")
        .agg(
            (F.sum(dec(F.col("o_totalprice"))) * 10000)
            .cast("bigint")
            .alias("units")
        )
    )
    d = spend.withColumn(
        "decile",
        F.ntile(10).over(
            Window.partitionBy("nk").orderBy(F.col("units").desc(), "c_custkey")
        ),
    )
    nation = load_table(spark, sf, "nation")
    top_units = F.sum(F.when(F.col("decile") == 1, F.col("units")).otherwise(0))
    return (
        d.join(F.broadcast(nation), d.nk == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_buyers"),
            (F.sum("units").cast("double") / 10000).alias("total_spend"),
            (top_units.cast("double") / 10000).alias("top_decile_spend"),
            F.expr(
                "sum(CASE WHEN decile = 1 THEN units ELSE 0 END) * 1000000"
                " div sum(units)"
            ).alias("concentration_ppm"),
        )
    )
