"""Round-10b tranche: the staged backlog for the round-11 verification
window — backoff LM scoring, token-segment boilerplate dedup,
incremental MinHash (completing the incremental story across exact /
semantic / MinHash modalities), incremental-view-maintenance proof,
integer HITS, hard-negative mining, PQ health diagnostics, dedup
survivorship attribution, and surprisal interaction faces.

Same determinism toolkit as round10: integer log2 via binary length,
md5 digests as fixed-width shuffle keys, exact integer cosine by
cross-multiplication, DECIMAL folds emitted through one final double
cast, trunc-division (Spark ``div`` == DuckDB ``//``), and
block-floating-point shift normalization where a multiply-then-divide
rescale would overflow BIGINT (``operators.graph.hits_int``).
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
    priority: int = 3,
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


_TOKS = """
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
"""


# ---------------------------------------------------------------------------
# backoff bigram LM + surprisal interactions
# ---------------------------------------------------------------------------

_BACKOFF_ORACLE = f"""
WITH toks AS ({_TOKS}), bg AS (
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
), inst AS (
  SELECT doc_id, unnest(w) AS tok FROM toks
), wc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM inst GROUP BY tok
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM inst
), bb AS (
  SELECT i2.doc_id,
         CASE WHEN c2.c >= 2
              THEN CAST(length(bin(c1.cp // c2.c)) - 1 AS BIGINT)
              ELSE CAST(length(bin((SELECT t FROM tt) // wc.c)) + 1 AS BIGINT)
         END AS b,
         CASE WHEN c2.c >= 2 THEN 0 ELSE 1 END AS backed
  FROM i2 JOIN c2 USING (b1, b2) JOIN c1 USING (b1)
       JOIN wc ON wc.tok = i2.b2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(backed) AS BIGINT) AS n_backoff,
       CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS ppl_millibits
FROM bb GROUP BY doc_id
"""


@_register(
    "bigram_backoff_surprisal",
    _BACKOFF_ORACLE,
    doc="Backoff bigram LM scoring — the production-shaped sibling of "
    "bigram_surprisal_score: a bigram seen >= 2 times scores its "
    "conditional surprisal floor(log2(c(w1.) div c(w1,w2))); a rare "
    "bigram (count 1 == only this occurrence) BACKS OFF to the "
    "unigram surprisal of w2 plus a fixed 2-bit penalty (the "
    "stupid-backoff shape with an integer penalty instead of a float "
    "alpha). Emits per doc the bigram count, how many backed off, and "
    "mean millibits — still pure integer log2 via binary length, so "
    "the interpolated score hash-verifies. Joins: bigram counts, "
    "prefix counts (reaggregated from bigram counts), unigram counts.",
)
def bigram_backoff_surprisal(spark: SparkSession, sf: str) -> DataFrame:
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
    inst = toks.select(F.explode("w").alias("tok"))
    wc = inst.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    tt = inst.groupBy().agg(F.count(F.lit(1)).alias("t"))
    joined = (
        i2.join(c2, ["b1", "b2"])
        .join(c1, "b1")
        .join(wc, F.col("b2") == F.col("tok"))
        .crossJoin(F.broadcast(tt))
    )
    bits = F.when(
        F.col("c") >= 2,
        (F.length(F.bin(F.expr("cp div c"))) - 1).cast("bigint"),
    ).otherwise((F.length(F.bin(F.expr("t div cu"))) + 1).cast("bigint"))
    backed = F.when(F.col("c") >= 2, 0).otherwise(1)
    bb = joined.select("doc_id", bits.alias("b"), backed.alias("backed"))
    return bb.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("backed").cast("bigint").alias("n_backoff"),
        F.expr("CAST(sum(b) * 1000 div count(1) AS BIGINT)").alias(
            "ppl_millibits"
        ),
    )


_STOPSPLIT_ORACLE = f"""
WITH toks AS ({_TOKS}), inst AS (
  SELECT source, unnest(w) AS tok FROM toks
), wc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM inst GROUP BY tok
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM inst
), bits AS (
  SELECT i.source,
         CASE WHEN list_contains(['the','a','an','of','and','to','in','is',
                                  'it','that'], i.tok) THEN 1 ELSE 0 END AS stop,
         CAST(length(bin((SELECT t FROM tt) // wc.c)) - 1 AS BIGINT) AS b
  FROM inst i JOIN wc USING (tok)
)
SELECT source,
       CAST(SUM(stop) AS BIGINT) AS n_stop_tok,
       CAST(CASE WHEN SUM(stop) = 0 THEN 0
            ELSE SUM(CASE WHEN stop = 1 THEN b ELSE 0 END) * 1000 // SUM(stop)
            END AS BIGINT) AS stop_millibits,
       CAST(SUM(1 - stop) AS BIGINT) AS n_content_tok,
       CAST(CASE WHEN SUM(1 - stop) = 0 THEN 0
            ELSE SUM(CASE WHEN stop = 0 THEN b ELSE 0 END) * 1000
                 // SUM(1 - stop) END AS BIGINT) AS content_millibits
FROM bits GROUP BY source
"""


@_register(
    "stopword_surprisal_split",
    _STOPSPLIT_ORACLE,
    doc="Two-channel LM diagnostic: per source, mean unigram surprisal "
    "computed separately over stopword and content tokens. A source "
    "whose CONTENT channel is low-surprisal is templated even if its "
    "stopword channel looks normal — the split localizes what a "
    "blended perplexity score averages away. Same integer-log2 "
    "pipeline; the channel flag is the shared 10-word stopword list.",
)
def stopword_surprisal_split(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import _is_stopword, words

    docs = fan_out(load_table(spark, sf, "documents"))
    inst = docs.select(
        "source", F.explode(words(F.lower(F.col("text")))).alias("tok")
    )
    wc = inst.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tt = inst.groupBy().agg(F.count(F.lit(1)).alias("t"))
    bits = (
        inst.join(wc, "tok")
        .crossJoin(F.broadcast(tt))
        .select(
            "source",
            F.when(_is_stopword(F.col("tok")), 1).otherwise(0).alias("stop"),
            (F.length(F.bin(F.expr("t div c"))) - 1).cast("bigint").alias("b"),
        )
    )
    return bits.groupBy("source").agg(
        F.sum("stop").cast("bigint").alias("n_stop_tok"),
        F.expr(
            "CAST(CASE WHEN sum(stop) = 0 THEN 0 ELSE "
            "sum(CASE WHEN stop = 1 THEN b ELSE 0 END) * 1000 div sum(stop) "
            "END AS BIGINT)"
        ).alias("stop_millibits"),
        F.sum(1 - F.col("stop")).cast("bigint").alias("n_content_tok"),
        F.expr(
            "CAST(CASE WHEN sum(1 - stop) = 0 THEN 0 ELSE "
            "sum(CASE WHEN stop = 0 THEN b ELSE 0 END) * 1000 "
            "div sum(1 - stop) END AS BIGINT)"
        ).alias("content_millibits"),
    )


_CORR_ORACLE = f"""
WITH toks AS ({_TOKS}), inst AS (
  SELECT doc_id, source, unnest(w) AS tok FROM toks
), wc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM inst GROUP BY tok
), tt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM inst
), bits AS (
  SELECT i.doc_id, i.source,
         CAST(length(bin((SELECT t FROM tt) // wc.c)) - 1 AS BIGINT) AS b
  FROM inst i JOIN wc USING (tok)
), d AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS y
  FROM bits GROUP BY doc_id, source
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
            AS DOUBLE) AS sxy,
       CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
            AS DOUBLE) AS sxx,
       CAST(CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
            AS DOUBLE) AS syy
FROM d GROUP BY source
"""


@_register(
    "corr_surprisal_length",
    _CORR_ORACLE,
    doc="Sufficient statistics for the per-source correlation between "
    "doc length (tokens) and mean surprisal (millibits/token): n, Sx, "
    "Sy exact BIGINT, and the second moments Sxy/Sxx/Syy folded as "
    "DECIMAL(38,0) (x^2 at 1e5-token docs times 1e12 docs wraps "
    "BIGINT) emitted via the one-final-double-cast convention. "
    "Downstream computes r = (nSxy-SxSy)/sqrt(...) — the sqrt stays "
    "out of the engine so the emitted relation is exact.",
)
def corr_surprisal_length(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.plans.round10 import _doc_surprisal

    docs = fan_out(load_table(spark, sf, "documents"))
    d = _doc_surprisal(docs).select(
        "source", F.col("n_tok").alias("x"), F.col("millibits").alias("y")
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dx * F.col("y")).cast("double").alias("sxy"),
        F.sum(dx * F.col("x")).cast("double").alias("sxx"),
        F.sum(dy * F.col("y")).cast("double").alias("syy"),
    )


# ---------------------------------------------------------------------------
# token-segment boilerplate dedup + survivorship attribution
# ---------------------------------------------------------------------------

_SEGMENTS = f"""
WITH toks AS ({_TOKS}), seg AS (
  SELECT doc_id, source,
         md5(unnest(list_transform(range(0, CAST(len(w) // 8 AS INTEGER)),
           i -> array_to_string(w[i*8+1:i*8+8], ' ')))) AS g
  FROM toks WHERE len(w) >= 8
), gc AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM seg GROUP BY g
)
"""


@_register(
    "segment_dedup_savings",
    _SEGMENTS
    + """
SELECT seg.source, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN gc.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_segments,
       CAST(SUM(CASE WHEN gc.n >= 2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dup_ppm
FROM seg JOIN gc USING (g)
GROUP BY seg.source
""",
    doc="Token-segment (paragraph-proxy) boilerplate savings: documents "
    "are cut into NON-overlapping 8-token segments (the line/paragraph "
    "dedup grain of public web pipelines, transposed to a corpus "
    "without newlines), and each source reports how many of its "
    "segment OCCURRENCES repeat anywhere in the corpus — the token "
    "mass a segment-grain dedup pass would reclaim. Segments travel "
    "as md5 digests (fixed-width shuffle key); one digest-keyed count "
    "+ one join back. Complements char_window_xdoc (overlapping "
    "char-grain windows, leakage framing) with the non-overlapping "
    "token grain and savings framing.",
)
def segment_dedup_savings(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select(
        "doc_id", "source", words(F.lower(F.col("text"))).alias("w")
    )
    segs = F.transform(
        F.sequence(F.lit(0), (F.size("w") / 8).cast("int") - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(F.col("w"), i * 8 + 1, 8))
        ),
    )
    seg = toks.where(F.size("w") >= 8).select(
        "doc_id", "source", F.explode(segs).alias("g")
    )
    gc = seg.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    dup = F.when(F.col("n") >= 2, 1).otherwise(0)
    return seg.join(gc, "g").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(dup).cast("bigint").alias("n_dup_segments"),
        F.expr(
            "CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1000000 "
            "div count(1) AS BIGINT)"
        ).alias("dup_ppm"),
    )


@_register(
    "boilerplate_segments_topk",
    _SEGMENTS
    + """
, occ AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM seg GROUP BY g
)
SELECT g, n_occurrences, n_docs FROM occ
ORDER BY n_occurrences DESC, g LIMIT 20
""",
    doc="The 20 most-repeated 8-token segments corpus-wide (by "
    "occurrence count, digest tie-break) — the candidate boilerplate "
    "list a pipeline reviews before turning segment dedup on. Top-20 "
    "via orderBy().limit() = TakeOrderedAndProject (the "
    "split_drift_topwords lesson: never a row_number window over the "
    "segment-vocabulary relation, which is corpus-sized at 100 TB).",
)
def boilerplate_segments_topk(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    toks = docs.select("doc_id", words(F.lower(F.col("text"))).alias("w"))
    segs = F.transform(
        F.sequence(F.lit(0), (F.size("w") / 8).cast("int") - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(F.col("w"), i * 8 + 1, 8))
        ),
    )
    seg = toks.where(F.size("w") >= 8).select(
        "doc_id", F.explode(segs).alias("g")
    )
    occ = seg.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return occ.orderBy(F.col("n_occurrences").desc(), "g").limit(20)


_SURVIVOR_ORACLE = f"""
WITH toks AS ({_TOKS}), pf AS (
  SELECT doc_id, source, md5(array_to_string(w[1:16], ' ')) AS g
  FROM toks WHERE len(w) >= 16
), keep AS (
  SELECT g, MIN(doc_id) AS keeper FROM pf GROUP BY g
), ks AS (
  SELECT keep.g, keep.keeper, pf.source AS keeper_source
  FROM keep JOIN pf ON pf.doc_id = keep.keeper
)
SELECT pf.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pf.doc_id <> ks.keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lost,
       CAST(SUM(CASE WHEN pf.doc_id <> ks.keeper
                      AND pf.source <> ks.keeper_source
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_cross_source
FROM pf JOIN ks USING (g)
GROUP BY pf.source
"""


@_register(
    "dedup_survivorship_bias",
    _SURVIVOR_ORACLE,
    doc="Survivorship attribution for prefix dedup: group docs by their "
    "16-token prefix digest, keep the lowest doc_id, and report per "
    "source how many docs are lost — and how many are lost TO A "
    "KEEPER FROM A DIFFERENT SOURCE. Cross-source loss is the dedup "
    "bias a mix designer must re-weight for: keep-first silently "
    "shifts token share toward whichever source tends to hold the "
    "lowest ids (usually the earliest-crawled). One digest aggregate "
    "+ one keeper join.",
)
def dedup_survivorship_bias(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.text import words

    docs = fan_out(load_table(spark, sf, "documents"))
    pf = (
        docs.select(
            "doc_id", "source", words(F.lower(F.col("text"))).alias("w")
        )
        .where(F.size("w") >= 16)
        .select(
            "doc_id",
            "source",
            F.md5(F.concat_ws(" ", F.slice("w", 1, 16))).alias("g"),
        )
    )
    keep = pf.groupBy("g").agg(F.min("doc_id").alias("keeper"))
    ks = keep.join(
        pf.select(F.col("doc_id").alias("keeper"),
                  F.col("source").alias("keeper_source")),
        "keeper",
    )
    j = pf.join(ks, "g")
    lost = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    cross = F.when(
        (F.col("doc_id") != F.col("keeper"))
        & (F.col("source") != F.col("keeper_source")),
        1,
    ).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(lost).cast("bigint").alias("n_lost"),
        F.sum(cross).cast("bigint").alias("n_lost_cross_source"),
    )


# ---------------------------------------------------------------------------
# incremental MinHash dedup — the third incremental modality
# ---------------------------------------------------------------------------

_MINHASH_INCR_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id AS id, doc_id % 5 = 4 AS is_new,
         list_distinct(CASE WHEN len(w) >= 2
           THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
           ELSE [] END) AS shingles
  FROM toks
), ne AS (
  SELECT id, is_new, shingles FROM sh WHERE len(shingles) > 0
), sig AS (
  SELECT id, is_new, shingles,
         list_transform(range(0, 32), s ->
           list_min(list_transform(shingles, x -> md5(CAST(s AS VARCHAR) || ':' || x)))) AS sigs
  FROM ne
), keys AS (
  SELECT id, is_new, b, sigs[b*2+1] || '|' || sigs[b*2+2] AS bkey
  FROM (SELECT id, is_new, sigs, unnest(range(0, 16)) AS b FROM sig)
), cand AS (
  SELECT DISTINCT nw.id AS id_new, old.id AS id_old
  FROM keys nw JOIN keys old ON nw.b = old.b AND nw.bkey = old.bkey
  WHERE nw.is_new AND NOT old.is_new
), j AS (
  SELECT c.id_new, c.id_old,
         len(list_intersect(sa.shingles, sb.shingles)) AS inter,
         len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles)) AS un
  FROM cand c JOIN ne sa ON sa.id = c.id_new JOIN ne sb ON sb.id = c.id_old
)
SELECT id_new, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN inter * 2 >= un THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dups
FROM j GROUP BY id_new
"""


@_register(
    "minhash_incremental_dups",
    _MINHASH_INCR_ORACLE,
    doc="Incremental MinHash near-dup gate — the third incremental "
    "modality next to dedup_incremental (exact digests) and "
    "semantic_dedup_incremental (embedding cells): NEW-snapshot docs "
    "(doc_id %% 5 == 4) probe the OLD corpus through the deterministic "
    "md5 minhash family (32 hashes, 16 bands x 2 rows — "
    "dedup_minhash_det's engine-reproducible pipeline), candidates = "
    "new x old band collisions only (directional equi-join, never "
    "old x old), verified by exact integer Jaccard >= 0.5 via "
    "cross-multiplication (inter*2 >= union — no float). Emits per "
    "new doc its old-side candidate and verified-dup counts. At scale "
    "old signatures are precomputed index state; the one tagged scan "
    "here mirrors dedup_incremental's shape.",
)
def minhash_incremental_dups(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.dedup import word_shingles

    docs = fan_out(load_table(spark, sf, "documents"))
    sh = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 5 == 4).alias("is_new"),
        word_shingles(F.col("text"), 2).alias("shingles"),
    ).where(F.size("shingles") > 0)
    num_hashes, bands, rpb = 32, 16, 2
    sig_aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"s{s}")
        for s in range(num_hashes)
    ]
    sigs = (
        sh.select("id", "is_new", F.explode("shingles").alias("sh"))
        .groupBy("id", "is_new")
        .agg(*sig_aggs)
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"s{b * rpb + r}") for r in range(rpb)]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    keys = sigs.select(
        "id", "is_new", F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", "is_new", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    new_k = keys.where(F.col("is_new")).select(
        F.col("id").alias("id_new"), "band", "key"
    )
    old_k = keys.where(~F.col("is_new")).select(
        F.col("id").alias("id_old"), "band", "key"
    )
    cand = (
        new_k.join(old_k, ["band", "key"]).select("id_new", "id_old").distinct()
    )
    pairs = cand.join(
        sh.select(F.col("id").alias("id_new"), F.col("shingles").alias("__sa")),
        "id_new",
    ).join(
        sh.select(F.col("id").alias("id_old"), F.col("shingles").alias("__sb")),
        "id_old",
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    un = F.size("__sa").cast("bigint") + F.size("__sb").cast("bigint") - inter
    j = pairs.select("id_new", inter.alias("inter"), un.alias("un"))
    dup = F.when(F.col("inter") * 2 >= F.col("un"), 1).otherwise(0)
    return j.groupBy("id_new").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(dup).cast("bigint").alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# incremental view maintenance proof
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY day, event_type
"""


@_register(
    "ivm_rollup_delta",
    _IVM_ORACLE,
    doc="Incremental view maintenance, proven: the (day, event_type) "
    "rollup is computed as BASE VIEW (event_id %% 7 <> 3) plus a DELTA "
    "increment (the held-out slice) applied by full-outer join-add — "
    "and the oracle is the FULL RECOMPUTE, so the driver hash "
    "certifies increment-apply == recompute. This works only because "
    "the measures are associative exact types (BIGINT count, "
    "DECIMAL(18,4) sum added BEFORE the final double cast — adding "
    "doubles would drift); it is the correctness core of every "
    "streaming rollup sink in streaming/sinks.py, stated as a "
    "hash-checked batch face. Delta cost is delta-sized, never "
    "view-sized.",
)
def ivm_rollup_delta(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.functions.helpers import dec

    ev = load_table(spark, sf, "events")

    def roll(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.to_date("ts").alias("day"), "event_type", "value"
            )
            .groupBy("day", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec(F.col("value"))).alias("dsum"),
            )
        )

    base = roll(ev.where(F.col("event_id") % 7 != 3))
    delta = roll(ev.where(F.col("event_id") % 7 == 3))
    b = base.select(
        "day", "event_type", F.col("n").alias("n_b"), F.col("dsum").alias("d_b")
    )
    d = delta.select(
        "day", "event_type", F.col("n").alias("n_d"), F.col("dsum").alias("d_d")
    )
    merged = b.join(d, ["day", "event_type"], "full_outer")
    zero = F.lit(0).cast("decimal(18,4)")
    return merged.select(
        "day",
        "event_type",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .cast("bigint")
        .alias("n"),
        (F.coalesce(F.col("d_b"), zero) + F.coalesce(F.col("d_d"), zero))
        .cast("double")
        .alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# integer HITS over the shipment graph
# ---------------------------------------------------------------------------


def _hits_oracle(iterations: int = 2) -> str:
    head = """
WITH e AS (
  SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000000 AS dst FROM lineitem
), n AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), h0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n
)"""
    parts = [head]
    prev_h = "h0"
    for i in range(1, iterations + 1):
        parts.append(f""", ar{i} AS (
  SELECT e.dst AS node, CAST(SUM(hub) AS BIGINT) AS raw
  FROM e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst
), arf{i} AS (
  SELECT n.node, COALESCE(ar{i}.raw, 0) AS raw FROM n LEFT JOIN ar{i} USING (node)
), ms_a{i} AS (
  SELECT GREATEST(length(bin(MAX(raw))) - 21, 0) AS s FROM arf{i}
), a{i} AS (
  SELECT node, CAST(raw >> (SELECT s FROM ms_a{i}) AS BIGINT) AS auth FROM arf{i}
), hr{i} AS (
  SELECT e.src AS node, CAST(SUM(auth) AS BIGINT) AS raw
  FROM e JOIN a{i} ON a{i}.node = e.dst GROUP BY e.src
), hrf{i} AS (
  SELECT n.node, COALESCE(hr{i}.raw, 0) AS raw FROM n LEFT JOIN hr{i} USING (node)
), ms_h{i} AS (
  SELECT GREATEST(length(bin(MAX(raw))) - 21, 0) AS s FROM hrf{i}
), h{i} AS (
  SELECT node, CAST(raw >> (SELECT s FROM ms_h{i}) AS BIGINT) AS hub FROM hrf{i}
)""")
        prev_h = f"h{i}"
    parts.append(f"""
SELECT h{iterations}.node, h{iterations}.hub, a{iterations}.auth
FROM h{iterations} JOIN a{iterations} ON h{iterations}.node = a{iterations}.node
""")
    return "".join(parts)


@_register(
    "hits_hubs_authorities",
    _hits_oracle(2),
    doc="Fixed-2-iteration HITS over the part->supplier shipment graph "
    "(operators/graph.hits_int) — the mutual-reinforcement face of "
    "link analysis next to pagerank_links' damped propagation: parts "
    "shipped by authoritative suppliers are good hubs and vice versa. "
    "Floating HITS L2-renormalizes (order-dependent, never "
    "hash-stable); here normalization is block-floating-point — shift "
    "right by max(bitlength(max)-21, 0), pure integer, shared "
    "bit-for-bit by both engines, overflow-free at any graph size "
    "where a multiply-then-divide rescale wraps at ~1e7 nodes. Two "
    "O(|E|) join+aggregate pairs per iteration; the max rides a "
    "broadcast scalar.",
)
def hits_hubs_authorities(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.graph import hits_int

    li = load_table(spark, sf, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1000000000).alias("dst"),
    )
    return hits_int(edges, iterations=2)


# ---------------------------------------------------------------------------
# hard-negative mining + PQ health diagnostics
# ---------------------------------------------------------------------------


def _hardneg_oracle() -> str:
    from cve_manager_spark.plans.semantic import _KMEANS_CTE

    return _KMEANS_CTE + """
, lab AS (
  SELECT a2.vec_id, a2.cid, a2.q, e2.label
  FROM a2 JOIN embeddings e2 ON a2.vec_id = e2.vec_id
), pr AS (
  SELECT x.vec_id, y.vec_id AS neg_id,
         CAST(list_dot_product(CAST(x.q AS DOUBLE[]), CAST(y.q AS DOUBLE[]))
              AS BIGINT) AS dot_q
  FROM lab x JOIN lab y
    ON x.cid = y.cid AND x.vec_id <> y.vec_id AND x.label <> y.label
), rk AS (
  SELECT vec_id, neg_id, dot_q,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dot_q DESC, neg_id) AS rn
  FROM pr
)
SELECT vec_id, neg_id, dot_q FROM rk WHERE rn = 1
"""


@_register(
    "hard_negative_mining",
    _hardneg_oracle(),
    doc="Hard-negative mining for contrastive training: per embedding, "
    "the HIGHEST-dot-product vector with a DIFFERENT label inside its "
    "k-means cell (k=8, the shared deterministic Lloyd's) — the "
    "near-but-wrong example a contrastive loss learns most from. "
    "Candidates are cell-bounded (the semantic_dedup discipline: "
    "never all-pairs), the argmax is an exact integer dot with "
    "(dot desc, id) tie-break, so the mined pairs hash-verify. Vecs "
    "whose cell holds no other label are absent (no negative to "
    "mine).",
)
def hard_negative_mining(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import kmeans_quantized

    emb = load_table(spark, sf, "embeddings")
    a = kmeans_quantized(emb, vec_col="embedding", id_col="vec_id", k=8, iters=2)
    lab = a.join(emb.select("vec_id", "label"), "vec_id")
    left = lab.select(
        "cluster",
        F.col("vec_id").alias("vid"),
        F.col("label").alias("la"),
        F.col("q").alias("qa"),
    )
    right = lab.select(
        F.col("cluster").alias("cluster_b"),
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("lb"),
        F.col("q").alias("qb"),
    )
    p = left.join(
        right,
        (F.col("cluster") == F.col("cluster_b"))
        & (F.col("vid") != F.col("neg_id"))
        & (F.col("la") != F.col("lb")),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p = p.select("vid", "neg_id", dot.alias("dot_q"))
    best = F.max(F.struct(F.col("dot_q"), (-F.col("neg_id")).alias("neg")))
    return (
        p.groupBy("vid")
        .agg(best.alias("b"))
        .select(
            F.col("vid").alias("vec_id"),
            (-F.col("b.neg")).cast("bigint").alias("neg_id"),
            F.col("b.dot_q").alias("dot_q"),
        )
    )


def _pq_recon_oracle(m: int = 4, w: int = 16, k: int = 8) -> str:
    from cve_manager_spark.plans.semantic import _pq_subspace_cte

    parts = [
        """eq AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
)"""
    ]
    parts += [_pq_subspace_cte(j, w, k) for j in range(m)]
    dist = (
        "CAST(list_dot_product(CAST(e.qs AS DOUBLE[]), CAST(e.qs AS DOUBLE[]))"
        " - 2 * list_dot_product(CAST(e.qs AS DOUBLE[]), CAST(c.c AS DOUBLE[]))"
        " + list_dot_product(CAST(c.c AS DOUBLE[]), CAST(c.c AS DOUBLE[])) AS BIGINT)"
    )
    errs = [
        f"""err{j} AS (
  SELECT {dist} AS d
  FROM asg_s{j} a JOIN e_s{j} e ON a.vec_id = e.vec_id
       JOIN c2_s{j} c ON a.cid = c.cid
)"""
        for j in range(m)
    ]
    unions = "\nUNION ALL\n".join(
        f"SELECT {j} AS subspace, CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST(CAST(SUM(d) AS DECIMAL(38,0)) AS DOUBLE) AS sum_sq_err"
        f" FROM err{j}"
        for j in range(m)
    )
    return "WITH " + ",\n".join(parts + errs) + "\n" + unions


@_register(
    "pq_reconstruction_error",
    _pq_recon_oracle(),
    doc="PQ reconstruction error per subspace: the exact integer squared "
    "distance between each sub-vector and its assigned codeword, "
    "summed (DECIMAL fold, double out). THE quantizer quality number "
    "— ADC distance error is bounded by reconstruction error, so this "
    "is what an index rebuild is judged on (paired with "
    "pq_code_balance's usage skew). Spark computes it in-row against "
    "the broadcast codebook literals (sum of (a-b)^2 == the "
    "|q|^2-2qc+|c|^2 the oracle recomputes); one narrow pass, one "
    "m-row aggregate.",
)
def pq_reconstruction_error(spark: SparkSession, sf: str) -> DataFrame:
    from cve_manager_spark.operators.semantic import quantize_vec
    from cve_manager_spark.operators.similarity import pq_encode, pq_train

    m, w = 4, 16
    emb = load_table(spark, sf, "embeddings")
    books = pq_train(emb, m=m, k=8, iters=2)
    enc = pq_encode(emb, books).withColumn(
        "__q", quantize_vec(F.col("embedding"))
    )
    cols = []
    for j in range(m):
        sub = F.slice("__q", j * w + 1, w)
        book_lit = F.lit([[int(v) for v in cw] for cw in books[j]]).cast(
            "array<array<bigint>>"
        )
        cw = F.element_at(book_lit, F.element_at("pq_code", j + 1) + 1)
        err = F.aggregate(
            F.zip_with(sub, cw, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, e: acc + e,
        )
        cols.append(err.alias(f"e{j}"))
    per = enc.select(*cols)
    rows = per.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("subspace"),
                        F.col(f"e{j}").alias("d"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("u")
    ).select("u.subspace", "u.d")
    return rows.groupBy("subspace").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d").cast("decimal(38,0)")).cast("double").alias(
            "sum_sq_err"
        ),
    )
