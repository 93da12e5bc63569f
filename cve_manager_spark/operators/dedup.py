"""Deduplication operators (SURVEY §2.8 N1/N2): exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Scale design:
- exact dedup is a hash aggregate on a content digest — one shuffle on
  the digest, map-side partial; the digest (sha256) is computed JVM-side.
- n-gram Jaccard is the exact pairwise path: explode shingles → self-join
  on shingle → count. The shingle join key bounds the pair space to
  documents sharing at least one shingle — still quadratic in the worst
  case, which is why the LSH paths exist.
- MinHash+LSH (`pyspark.ml.feature.MinHashLSH`) and SimHash bucket the
  corpus so candidate pairs are only generated within buckets: at 100 TB
  the band/bucket id is the shuffle key and the quadratic blow-up is
  confined to per-bucket groups (salt oversized buckets if skewed).

All built-in expressions; the only ML-lib dependency is MinHashLSH.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import fan_out
from cve_manager_spark.operators.text import words


def content_digest(text: Column) -> Column:
    """sha256 hex digest of exact content (JVM-side)."""
    return F.sha2(text, 256)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical content; keep the smallest id (deterministic keep
    rule — dropDuplicates picks an arbitrary row, which is not replayable
    on a cluster)."""
    return (
        df.groupBy(content_digest(F.col(text_col)).alias("content_sha"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document.

    Implemented as ONE codegen'd regex pass (zero-width lookahead captures
    each n-word window at word starts) over whitespace-normalized text.
    The equivalent higher-order-function form — transform(sequence(...),
    i -> array_join(slice(toks, i, n))) — is interpreted per element and
    measured ~20× slower; on a 100 TB corpus the shingle scan is the
    dominant narrow stage, so this matters. (DuckDB's RE2 lacks lookahead,
    so oracles express the same shingles via list_transform instead.)
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    if n == 1:
        return F.array_distinct(F.filter(F.split(norm, " "), lambda w: w != ""))
    pat = r"(?:^| )(?=((?:[^ ]+ ){%d}[^ ]+))" % (n - 1)
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), F.lit(1)))


def word_ngram_windows(text: Column, n: int) -> Column:
    """ALL word n-gram windows of a document, in document order — the
    non-distinct sibling of :func:`word_shingles` (same one-pass
    lookahead regex over whitespace-normalized text; array index i IS
    the 0-based word position of the window start, so ``posexplode``
    recovers positions for span arithmetic). The higher-order
    transform/slice/concat_ws form this replaces is interpreted per
    element and measured ~20× slower (the word_shingles lesson)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    if n == 1:
        return F.filter(F.split(norm, " "), lambda w: w != "")
    pat = r"(?:^| )(?=((?:[^ ]+ ){%d}[^ ]+))" % (n - 1)
    return F.regexp_extract_all(norm, F.lit(pat), F.lit(1))


def _hashed_shingle_relation(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_doc_freq_frac: float | None,
    persist_shingles: bool,
    flag_col: str | None = None,
) -> DataFrame:
    """(id, n_sh, shingle_h) relation shared by the pairwise set-similarity
    operators (`ngram_jaccard_pairs`, `containment_pairs`).

    Join on a 64-bit hash of the shingle, not the string: sorting/probing
    fixed-width longs measured ~2× faster than ~25-byte strings, and the
    64-bit collision probability over any realistic shingle population is
    negligible (~1e-19 per pair, deterministic when it happens).

    ``n_sh`` is the FULL per-document shingle count, frozen before the
    stop-shingle cap — capped runs lose common-count numerator only, so
    similarity can only shrink (recall dial, never false positives).
    """
    carry = [flag_col] if flag_col else []
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        *carry,
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    ex = sh.select(
        "id", *carry, "n_sh", F.explode("shingles").alias("shingle")
    ).select("id", *carry, "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    if persist_shingles:
        # ONE materialization, hash-partitioned + sorted on the join key:
        # every downstream pair join keys on shingle_h, so paying the
        # exchange ONCE here lets a sort-merge pair join read both
        # branches from the cache with zero further exchanges and zero
        # sorts (asserted in tests/test_plans_shape.py with broadcast
        # joins disabled — locally AQE broadcasts the small side instead,
        # which is also exchange-free on the big side). At cluster scale
        # this is "write the shingle index once, join against it".
        #
        # r14: the index is persisted UNCAPPED and the stop-shingle
        # filter below rides every read as a broadcast anti-join. The
        # previous shape materialized twice (a raw copy for the
        # doc-frequency statistics, then a second exchange + persist of
        # the capped copy); since the statistics aggregate keys on
        # shingle_h too, it reads this cache's layout exchange-free — one
        # barrier and one shuffle instead of two of each, with identical
        # capped content (the anti-join is map-side on both pair-join
        # branches).
        from pyspark import StorageLevel

        ex = (
            ex.repartition("shingle_h")
            .sortWithinPartitions("shingle_h")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Materialization barrier: without it the consumers race the cold
        # cache and each computes the scan anyway — and planning the
        # consumers AFTER the cache is final is what lets them see its
        # hashpartitioning (an unmaterialized AQE cache reports unknown
        # partitioning and the join would re-exchange it).
        ex.count()
    if max_doc_freq_frac is not None:
        # Stop-shingle filter as a broadcast ANTI-join: the STOP set
        # (df > frac·N) is small and bounded independent of corpus size —
        # at most (total shingle instances)/(frac·N) ≈ avg_sh/frac distinct
        # shingles — so instead of shuffling the full relation against the
        # huge KEEP set, broadcast the tiny complement and filter in place.
        # The df statistics are one aggregation over the persisted relation
        # (exchange-free on its cached layout); the corpus count joins as a
        # broadcast 1-row relation (no driver-side scalar).
        total = sh.agg(F.count(F.lit(1)).alias("__n_docs"))
        stop = (
            ex.groupBy("shingle_h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .crossJoin(F.broadcast(total))
            .where(F.col("__df") > F.col("__n_docs") * max_doc_freq_frac)
            .select("shingle_h")
        )
        ex = ex.join(F.broadcast(stop), "shingle_h", "left_anti")
    return ex


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    persist_shingles: bool = True,
    max_doc_freq_frac: float | None = None,
) -> DataFrame:
    """Asymmetric shingle containment: pairs with
    max(|A∩B|/|A|, |A∩B|/|B|) ≥ threshold.

    The detector for SUBSET duplication (a short doc embedded in a longer
    one), which symmetric Jaccard under-scores by construction. No
    size-ratio prune is possible: containment ≥ t only bounds the common
    count against the SMALLER side, so a tiny doc inside a huge one is a
    legitimate hit — asymmetry is the point.

    That makes ``max_doc_freq_frac`` the load-bearing skew guard at
    corpus scale (not an optional extra as in `ngram_jaccard_pairs`,
    which still has its size-ratio prune without it): one boilerplate
    shingle shared by k documents alone generates k(k-1)/2 join rows on
    a single shuffle key. The cap drops shingles whose doc-frequency
    exceeds frac·N before the join, bounding any bucket at (frac·N)².
    Denominators keep full shingle counts, so capped containment ≤ exact
    containment pairwise: output is a subset of the exact output.
    """
    ex = _hashed_shingle_relation(
        df, id_col, text_col, n, max_doc_freq_frac, persist_shingles
    )
    a = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle_h")
    b = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle_h")
    common = (
        a.join(b, (a.shingle_h == b.shingle_h) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = F.col("common").cast("double") / F.col("n_a")
    cb = F.col("common").cast("double") / F.col("n_b")
    return common.select(
        "id_a", "id_b", ca.alias("cont_a"), cb.alias("cont_b")
    ).where(F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    persist_shingles: bool = True,
    max_doc_freq_frac: float | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity ≥ threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) with integer counts, so the
    double division is bitwise deterministic.

    Scale guards (result-preserving):
    - size-ratio prune inside the join condition: jaccard ≥ t implies
      t·|B| ≤ |A| ≤ |B|/t, so pairs violating it are dropped before the
      aggregation — classic length filtering from the set-similarity-join
      literature;
    - the shingle is the join key, so pair generation is confined to
      per-shingle buckets; shingle order n controls bucket size (higher n
      → more selective buckets).

    Skew guard (NOT result-preserving — an explicit recall choice):
    ``max_doc_freq_frac`` drops stop shingles occurring in more than that
    fraction of documents before the join. A boilerplate shingle shared
    by k documents alone generates k(k-1)/2 candidate pairs on one
    shuffle key — the worst-case hot key this operator has at corpus
    scale. Dropping it caps the per-key blowup at (frac·N)². Pairs can
    only LOSE common-shingle counts (denominators keep the full shingle
    sets), so filtered output is a subset of the exact output: recall
    dial, never false positives. Default None = exact.
    """
    ex = _hashed_shingle_relation(
        df, id_col, text_col, n, max_doc_freq_frac, persist_shingles
    )
    a = ex.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle_h"
    )
    b = ex.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle_h"
    )
    common = (
        a.join(
            b,
            (a.shingle_h == b.shingle_h)
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("n_a") * threshold <= F.col("n_b"))
            & (F.col("n_b") * threshold <= F.col("n_a")),
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return common.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def incremental_near_dups(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    persist_shingles: bool = True,
    max_doc_freq_frac: float | None = None,
) -> DataFrame:
    """Cross-snapshot near-dup join: (id_new, id_old, jaccard ≥ threshold)
    pairs of a NEW ingest batch against an EXISTING corpus snapshot —
    the shape every recurring crawl runs (dedup the increment against
    what's already kept, never re-pair the snapshot against itself).

    Same hashed-shingle equi-join, size-ratio prune and stop-shingle cap
    as `ngram_jaccard_pairs`, but the two relations are built in ONE pass
    over the union tagged with a side flag, so the shingle scan, the
    doc-frequency statistics and the exchange layout are shared: the cap
    is computed over snapshot+batch together (a boilerplate shingle is
    hot regardless of which side it lands on) and both join inputs are
    partition-pruned slices of one shuffled relation. At snapshot scale
    the old side's shingle index is the thing a production pipeline
    would persist between ingests; `persist_shingles` is the local
    analogue of reading it back.
    """
    tagged = new_df.select(
        F.col(id_col), F.col(text_col), F.lit(True).alias("__is_new")
    ).unionByName(
        old_df.select(
            F.col(id_col), F.col(text_col), F.lit(False).alias("__is_new")
        )
    )
    return incremental_near_dups_tagged(
        tagged,
        id_col=id_col,
        text_col=text_col,
        flag_col="__is_new",
        n=n,
        threshold=threshold,
        persist_shingles=persist_shingles,
        max_doc_freq_frac=max_doc_freq_frac,
    )


def incremental_near_dups_tagged(
    tagged: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_col: str = "__is_new",
    n: int = 3,
    threshold: float = 0.5,
    persist_shingles: bool = True,
    max_doc_freq_frac: float | None = None,
) -> DataFrame:
    """Single-relation core of :func:`incremental_near_dups`: the side
    flag is a boolean COLUMN of one input. When new and old live in one
    table (a snapshot column, an ingest-date predicate), passing the
    flagged relation directly means ONE scan feeds both join sides —
    the two-DataFrame wrapper unions two scans of the same table, which
    Catalyst does not fuse."""
    ex = _hashed_shingle_relation(
        tagged, id_col, text_col, n, max_doc_freq_frac, persist_shingles,
        flag_col=flag_col,
    )
    if flag_col != "__is_new":
        ex = ex.withColumnRenamed(flag_col, "__is_new")
    # distinct key names per side: both branches derive from the same
    # persisted relation, and a bare a.shingle_h == b.shingle_h resolves
    # to one attribute (Spark warns "trivially true" and falls back to
    # self-join disambiguation — correct, but better to not rely on it)
    a = ex.where(F.col("__is_new")).select(
        F.col("id").alias("id_new"),
        F.col("n_sh").alias("n_a"),
        F.col("shingle_h").alias("sh_a"),
    )
    b = ex.where(~F.col("__is_new")).select(
        F.col("id").alias("id_old"),
        F.col("n_sh").alias("n_b"),
        F.col("shingle_h").alias("sh_b"),
    )
    common = (
        a.join(
            b,
            (F.col("sh_a") == F.col("sh_b"))
            & (F.col("n_a") * threshold <= F.col("n_b"))
            & (F.col("n_b") * threshold <= F.col("n_a")),
        )
        .groupBy("id_new", "id_old", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return common.select(
        "id_new", "id_old", jac.alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def _md5_sig_aggs(num_hashes: int, shingle_col: str = "sh") -> list[Column]:
    """min-of-digests MinHash signature aggregates as parsed expressions.

    The Column form (min(md5(concat(lit, col))) per hash) is ~5 py4j
    round trips per hash of pure driver time per query build (guide §5);
    one F.expr string per aggregate analyzes identically."""
    return [
        F.expr(f"min(md5(concat('{s}:', {shingle_col})))").alias(f"s{s}")
        for s in range(num_hashes)
    ]


def _band_key_explode(sigs: DataFrame, rows_per_band: int, bands: int) -> DataFrame:
    """(id, band, key) relation from a signature row — the banding step
    shared by the MinHash faces, as ONE parsed explode expression (the
    per-struct Column form was pure py4j driver chatter, guide §5).
    band is an INT literal and key the '|'-joined band rows, exactly as
    the previous Column form built them."""
    bands_sql = ",".join(
        "struct({b} AS band, concat_ws('|', {cols}) AS key)".format(
            b=b,
            cols=", ".join(
                f"s{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sigs.select(
        "id", F.expr(f"explode(array({bands_sql}))").alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def simhash64(text: Column, n: int = 2) -> Column:
    """64-bit SimHash over word n-gram shingles, fully JVM-side.

    Each shingle is hashed with xxhash64; bit i of the fingerprint is the
    sign of sum(±1) of that bit across shingle hashes. Near-duplicate
    documents differ in few bits (compare with bit_count(a ^ b)).
    """
    sh = word_shingles(text, n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # One mask per bit; bit 63 is the sign bit in two's complement.
    masks = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("bigint") for b in range(64)]
    )
    bits = F.transform(
        masks,
        lambda m: F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    signed = F.zip_with(
        bits, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(signed, F.lit(0).cast("bigint"), lambda acc, x: acc.bitwiseOR(x))


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, fp) SimHash fingerprints via the relational formulation:
    explode shingle hashes → 64 codegen'd conditional SUMs (one per bit)
    → recombine. Identical semantics to the ``simhash64`` expression but
    whole-stage-codegen instead of interpreted higher-order lambdas —
    measured ~30× faster, and the shape Spark scales (hash aggregate on
    the doc id, map-side partials)."""
    ex = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    ).select("id", F.xxhash64("sh").alias("h"))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    g = ex.groupBy("id").agg(*bit_sums)
    fp = F.lit(0).cast("bigint")
    for b in range(64):
        mask = (1 << b) if b < 63 else -(1 << 63)
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(mask).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return g.select("id", fp.alias("fp"))


def banded_self_pairs(
    keys: DataFrame,
    id_col: str = "id",
    band_cols: tuple[str, ...] = ("band", "key"),
    cap: int = 1024,
    salt: int = 16,
) -> DataFrame:
    """SKEW-SAFE candidate pairs from a banded-keys relation: distinct
    (id_a, id_b), id_a < id_b, for every pair colliding on at least one
    band key — identical output to the naive self equi-join, without
    its scale killer. A bucket of m ids contributes m²/2 pairs, and the
    plain join lands ALL of them on the one task that owns the bucket's
    key: one hot band key (boilerplate docs, tiny vocabularies,
    near-constant fingerprints) turns the whole stage into a single
    straggler — measured at sf1, where one bucket held the job for
    minutes while 31 cores idled. The m² work is inherent to the
    banding SEMANTICS (both engines compute it; the oracle mirrors it),
    so the fix is distribution, not avoidance:

    - bucket sizes come from one cheap aggregate over the keys
      relation; buckets ≤ ``cap`` pair through the plain equi-join
      (zero overhead for the common case);
    - oversized buckets route through a ``salt × salt`` grid: each id
      gets a deterministic cell coordinate crc32(id) % salt, the a-side
      replicates across grid COLUMNS and the b-side across grid ROWS,
      and the join key gains the (i, j) cell — every pair (x, y) meets
      in exactly the cell (s(x), s(y)), so each task owns at most
      (m/salt)² pairs instead of m². Replication cost is salt× the
      OVERSIZED rows only, never the relation.

    The closing distinct() collapses multi-band collisions exactly as
    the naive form did. Deterministic: the cell assignment is a pure
    function of the id, so results and the partitioning-invariance
    gate are unaffected.

    The keys relation is MATERIALIZED once on entry: it is referenced
    five times below (sizes, small a/b, big a/b), and without pinning,
    each reference replays the caller's whole signature pipeline —
    measured at sf1 as 5 recomputed md5×num_hashes SortAggregates
    dominating the query. The relation is tiny relative to the corpus
    (|docs| × bands short rows — exactly what a 100 TB deployment
    persists as its signature cache), so one eager materialization is
    the right trade at every scale."""
    keys = keys.localCheckpoint(eager=True)
    bc = list(band_cols)
    sizes = keys.groupBy(*bc).agg(F.count(F.lit(1)).alias("__m"))
    big = sizes.where(F.col("__m") > cap).select(*bc)
    small = keys.join(F.broadcast(big), bc, "left_anti")
    a = small.select(F.col(id_col).alias("id_a"), *bc)
    b = small.select(F.col(id_col).alias("id_b"), *bc)
    cand = (
        a.join(b, bc)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    kb = keys.join(F.broadcast(big), bc, "left_semi").withColumn(
        "__s",
        F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(salt)).cast(
            "int"
        ),
    )
    grid = F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    ab = kb.select(
        F.col(id_col).alias("id_a"), *bc, F.col("__s").alias("__i")
    ).withColumn("__j", grid)
    bb = kb.select(
        F.col(id_col).alias("id_b"), *bc, F.col("__s").alias("__j")
    ).withColumn("__i", grid)
    big_cand = (
        ab.join(bb, bc + ["__i", "__j"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return cand.unionByName(big_cand).distinct()


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs via banding: split the 64-bit fingerprint
    into 64/band_bits bands; a pair is a candidate iff it collides on at
    least one band (pigeonhole guarantees recall for small Hamming
    distance), then verify with exact bit_count.
    """
    # Three consumers (band keys + both verify join-backs) — persist so
    # the 64-bit-sum fingerprint aggregate runs once, not per branch.
    from pyspark import StorageLevel

    fp = simhash_fingerprints(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    fp.count()
    n_bands = 64 // band_bits
    bands = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # skew-safe pairing (hot band keys — near-constant fingerprints —
    # otherwise serialize the stage on one task); fps re-attached to the
    # distinct id pairs afterwards, which is cheaper than carrying them
    # through the salted grid
    cand = banded_self_pairs(
        bands.select("id", "band", "key"), id_col="id"
    )
    cand = cand.join(
        fp.select(F.col("id").alias("id_a"), F.col("fp").alias("fp_a")),
        "id_a",
    ).join(
        fp.select(F.col("id").alias("id_b"), F.col("fp").alias("fp_b")),
        "id_b",
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    jaccard_threshold: float = 0.5,
):
    """MinHash+LSH near-dup pairs via pyspark.ml (HashingTF → MinHashLSH
    approxSimilarityJoin). Returns (pairs_df, model). Nondeterministic
    across Spark versions (hash seeds) → rows-only check in the driver.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = fan_out(df).select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(feat)
    pairs = (
        model.approxSimilarityJoin(feat, feat, 1.0 - jaccard_threshold, distCol="jaccard_dist")
        .where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            (F.lit(1.0) - F.col("jaccard_dist")).alias("est_jaccard"),
        )
    )
    return pairs, model


def minhash_det_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    with_counts: bool = False,
) -> DataFrame:
    """Deterministic MinHash LSH near-dup pairs — the canonical
    shingle → minhash → band → bucket-join pipeline, built so EVERY stage
    is reproducible across engines (unlike pyspark.ml's MinHashLSH, whose
    hash seeds make it a rows-only check):

    - hash family: md5 (the one digest Spark and DuckDB share bit-for-bit)
      of ``"<seed>:<shingle>"``; the signature element is the
      lexicographic MIN of the hex digests — a valid min-hash (uniform
      permutation of the shingle universe per seed);
    - signatures: one codegen'd projection computing ``num_hashes`` md5s
      per shingle row, then a single hash aggregate of ``num_hashes``
      MINs keyed on the doc id (map-side partials — the same scalable
      shape as ``simhash_fingerprints``, no interpreted lambdas);
    - banding: ``bands`` keys of ``num_hashes/bands`` signature elements;
      candidates = pairs colliding on ≥1 band key (equi-join on
      (band, key), shuffle-parallel, no broadcast of the relation);
    - verify: exact Jaccard over the distinct shingle sets
      (array_intersect integer counts) ≥ threshold.

    Zero-shingle documents are excluded (no signature — and md5-of-empty
    band keys would spuriously collide all of them).

    Banding is the recall dial exactly as in dedup_minhash: with r =
    num_hashes/bands rows per band, P(candidate) = 1-(1-j^r)^bands
    (j=0.5, 16×2 → 0.99). Precision is exact — every candidate is
    verified. Candidates to verify are bounded by band collisions, not
    by the corpus square.
    """
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).where(F.size("shingles") > 0)

    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")

    ex = sh.select("id", F.explode("shingles").alias("sh"))
    sigs = ex.groupBy("id").agg(*_md5_sig_aggs(num_hashes))

    keys = _band_key_explode(sigs, rows_per_band, bands)
    # skew-safe pairing: one hot band key (short docs over a small
    # vocabulary share full signatures) must not serialize the stage
    cand = banded_self_pairs(keys, id_col="id")
    pairs = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("__sa")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("__sb")), "id_b")
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    union = F.size("__sa").cast("bigint") + F.size("__sb").cast("bigint") - inter
    if with_counts:
        # Audit face: ALL band-collision candidates with the exact
        # integer (intersection, union) counts plus the number of EQUAL
        # signature elements (the MinHash Jaccard estimator's numerator)
        # -- lets callers measure band false-positive rates AND the
        # estimator's error without a float anywhere.
        sig_arr = sigs.select(
            "id", F.array(*[F.col(f"s{s}") for s in range(num_hashes)]).alias("__sig")
        )
        pairs = pairs.join(
            sig_arr.select(F.col("id").alias("id_a"), F.col("__sig").alias("__ga")),
            "id_a",
        ).join(
            sig_arr.select(F.col("id").alias("id_b"), F.col("__sig").alias("__gb")),
            "id_b",
        )
        matches = F.size(
            F.filter(F.zip_with("__ga", "__gb", lambda x, y: x == y), lambda b: b)
        ).cast("bigint")
        return pairs.select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            union.alias("union_sz"),
            matches.alias("sig_matches"),
        )
    jac = inter.cast("double") / union
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Cheap deterministic MinHash family: one md5 per shingle + integer mixing
# ---------------------------------------------------------------------------

# Universal-hash modulus (Mersenne prime 2^31-1). Products A*x with
# A, x < 2^31 stay under 2^62 — inside BIGINT for Spark AND DuckDB
# (DuckDB raises on 64-bit overflow, so a 2^61-1 modulus would not be
# oracle-safe).
LCG_P = 2_147_483_647


def lcg_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (A, B) multiplier/offset pairs for the mixing family,
    derived from Knuth's multiplicative constant — deterministic,
    engine-independent, and embeddable as literals in oracle SQL."""
    out = []
    for s in range(num_hashes):
        a = ((2 * s + 1) * 2_654_435_761) % LCG_P or 1
        b = (s * 40_503 + 12_345) % LCG_P
        out.append((a, b))
    return out


def shingle_base31(shingle: Column, offset: int = 1) -> Column:
    """60-bit integer from 15 md5 hex chars starting at ``offset``
    (1-based), reduced mod P.

    ONE digest per shingle; every MinHash permutation then costs one
    multiply-add-mod on a base instead of its own md5. Spark's
    conv(hex,16,10) and DuckDB's CAST('0x'||hex AS BIGINT) agree
    bit-for-bit on 15-char inputs (both positive, < 2^60). The 32-char
    digest carries two non-overlapping 15-char windows (offsets 1 and
    16), i.e. two INDEPENDENT base values per digest."""
    return (
        F.conv(F.substring(F.md5(shingle), offset, 15), 16, 10).cast("long")
        % LCG_P
    )


def minhash_lcg_signatures(
    ex, id_col: str = "id", shingle_col: str = "sh", num_hashes: int = 32
):
    """Per-id MinHash signature via the mixed family: input is the
    exploded (id, shingle) relation, output one row per id with columns
    s0..s{n-1} (longs).

    Scale arithmetic vs the md5-per-seed family (minhash_det_pairs):
    the digest work drops num_hashes-fold (one md5 per shingle row),
    and the signature crossing the aggregate shuffle is num_hashes
    longs (256 B at 32) instead of num_hashes 32-char strings (>1 KB)
    — both the CPU bill and the exchange width shrink ~4×. Each min
    over (A*x+B) mod P is a valid min-hash under the universal family.

    Independence across band rows: linear mixes of ONE base are only
    pairwise independent as a family — with 2-row bands the two rows'
    argmins correlate and P(band collision) exceeds the intended j²,
    measured +15% spurious candidates on the testdata corpus. So even
    seeds hash the digest's FIRST 15 hex chars and odd seeds the SECOND
    15 (independent values from the same single md5): adjacent rows in
    a band draw from independent bases, restoring the banding curve
    (candidate count back at the md5-per-seed family's level)."""
    withb = ex.select(
        F.col(id_col),
        shingle_base31(F.col(shingle_col), 1).alias("__b31a"),
        shingle_base31(F.col(shingle_col), 16).alias("__b31b"),
    )
    # one parsed expression per aggregate: the Column form (lit*col+lit
    # % lit, ~8 py4j round trips per hash) cost ~0.6 s of driver time at
    # 32 hashes per query build (guide §5); F.expr is one round trip and
    # analyzes to the identical expression (int literals < 2^31 parse as
    # INT exactly like F.lit(int), promotion to BIGINT unchanged)
    aggs = [
        F.expr(
            f"min(({a} * {'__b31a' if s % 2 == 0 else '__b31b'} + {b}) % {LCG_P})"
        ).alias(f"s{s}")
        for s, (a, b) in enumerate(lcg_constants(num_hashes))
    ]
    return withb.groupBy(id_col).agg(*aggs)


def minhash_lcg_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH near-dup pairs on the mixed hash family — the
    at-scale variant of :func:`minhash_det_pairs`.

    Identical pipeline shape (shingle → signature → band → bucket-join →
    exact-Jaccard verify, so precision is exact by construction); only
    the signature stage differs: one md5 per shingle + ``num_hashes``
    integer mixes instead of ``num_hashes`` md5s (see
    :func:`minhash_lcg_signatures` for the 4× CPU / shuffle-width
    arithmetic and the two-base independence construction that keeps
    the banding curve honest — measured at sf0.1: 204k candidates vs
    the md5 family's 256k, with identical verified output).

    Measured trade on the LOCAL testdata corpus (5k template-heavy
    docs, sf0.1): signature and candidate stages are faster than
    minhash_det_pairs, but end-to-end the md5 family still wins
    (~3.1s vs ~5.7s) because the tiny corpus is verify-dominated and
    its verify join drew a less favorable physical plan. The family's
    advantage is the 100 TB regime, where the signature pass scans the
    FULL corpus (digest CPU × num_hashes is the bill) while candidates
    are capped by banding — there the 4× digest saving dominates.
    minhash_det_pairs remains the verified default; this is the
    scale-path variant.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")

    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    ex = sh.select("id", F.explode("shingles").alias("sh"))
    sigs = minhash_lcg_signatures(ex, num_hashes=num_hashes)

    keys = _band_key_explode(sigs, rows_per_band, bands)
    # skew-safe pairing: one hot band key must not serialize the stage
    cand = banded_self_pairs(keys, id_col="id")
    pairs = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("__sa")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("__sb")), "id_b")
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    union = F.size("__sa").cast("bigint") + F.size("__sb").cast("bigint") - inter
    jac = inter.cast("double") / union
    return (
        pairs.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_det_fingerprint(shingles: Column) -> Column:
    """Deterministic 64-bit SimHash as a '0'/'1' string, md5 bit family.

    Bit i sums (2·bit_i(md5(shingle)) − 1) over the shingle set and
    takes the sign, ties to 0. md5 is the hash both engines share
    bit-for-bit (same contract as minhash_det_pairs), which is what
    makes this SimHash — unlike the xxhash64 production variant —
    DuckDB-oracle-checkable.

    Computed in an Arrow-batched kernel: the first 8 digest bytes
    unpack big-endian (``np.unpackbits``) into EXACTLY the oracle's
    hex-digit bit order (bit i = bit 3−i%4 of hex digit i//4), and the
    per-document ±1 sums vectorize. The pure-expression form (a
    zip_with fold over 64 per-bit column ops) is semantically identical
    but interpreted per element — measured 10.2s vs ~1s at sf0.1 for
    the full pair query; signatures are the dominant narrow pass at
    corpus scale, so this is one of the few places the Pandas-UDF path
    beats codegen."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fp(arrs: pd.Series) -> pd.Series:
        out = []
        for sh in arrs:
            if sh is None or len(sh) == 0:
                out.append(None)
                continue
            digests = np.frombuffer(
                b"".join(hashlib.md5(s.encode("utf-8")).digest()[:8] for s in sh),
                dtype=np.uint8,
            )
            bits = np.unpackbits(digests).reshape(len(sh), 64).astype(np.int64)
            sums = (2 * bits - 1).sum(axis=0)
            out.append("".join("1" if x > 0 else "0" for x in sums))
        return pd.Series(out)

    return fp(shingles)


def simhash_det_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 10,
    bands: int = 4,
) -> DataFrame:
    """Deterministic SimHash near-dup pairs: banded LSH over the md5
    fingerprint (``bands`` × 64/bands bit blocks — Hamming ≤ k pairs
    must agree exactly on ≥1 block once k < bands by pigeonhole... for
    k ≥ bands the blocking is a recall dial, same trade as every LSH),
    then an exact Hamming verify on candidates. Identical pipeline
    shape to the xxhash64 `simhash_near_dups` — fingerprint scan,
    equi-join on (band, block), in-row distance — but every stage is
    engine-reproducible, so the driver hash-checks the whole pipeline.
    """
    width = 64 // bands
    sh = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), n).alias("shingles"),
        )
        .where(F.size("shingles") > 0)
    )
    # Persist the fingerprint relation: both sides of the band self-join
    # read it, and without a materialization barrier each branch evaluates
    # the Arrow fingerprint kernel over the whole corpus again (the plan
    # carried TWO ArrowEvalPython subtrees; profiled at sf0.1 the two UDF
    # stages were ~21 of the query's ~22 core-s). At corpus scale this is
    # "write the fingerprint index once, join against it" — the shingle
    # cache's argument applied to the signature pass.
    from pyspark import StorageLevel

    fp = sh.select(
        "id", simhash_det_fingerprint(F.col("shingles")).alias("f")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    fp.count()
    keys = fp.select(
        "id",
        "f",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
    ).withColumn("k", F.substr(F.col("f"), F.col("b") * width + 1, F.lit(width)))
    a = keys.select(
        F.col("id").alias("id_a"), F.col("f").alias("fa"), "b", "k"
    )
    bb = keys.select(
        F.col("id").alias("id_b"), F.col("f").alias("fb"), "b", "k"
    )
    cand = (
        a.join(bb, ["b", "k"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fa", "fb")
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.substr(F.col("fa"), i, F.lit(1))
            != F.substr(F.col("fb"), i, F.lit(1)),
        )
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def minhash_encode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """The encode half of the deterministic MinHash pipeline, split out
    for incremental/streaming composition: returns (sh, keys) — the
    doc → distinct-shingle relation and the (id, band, key) band-key
    relation, built with exactly ``minhash_det_pairs``' recipe (md5
    hash family, min-of-digests signature, ``bands`` concat keys).
    Encode is per-document (one doc-keyed aggregate of the exploded
    shingles), so encode(base ∪ delta) == encode(base) ∪ encode(delta)
    — the same contract frozen-cell encoding gives the semantic
    incremental path. Zero-shingle documents are excluded."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    sh = fan_out(df).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).where(F.size("shingles") > 0)
    ex = sh.select("id", F.explode("shingles").alias("sh"))
    sigs = ex.groupBy("id").agg(*_md5_sig_aggs(num_hashes))
    keys = _band_key_explode(sigs, rows_per_band, bands)
    return sh, keys


def minhash_dominated(
    new_keys: DataFrame,
    new_sh: DataFrame,
    other_keys: DataFrame,
    other_sh: DataFrame,
) -> DataFrame:
    """IDs of new docs that near-duplicate a LOWER-id doc of the other
    side: candidates = (band, key) collisions with ``id_other < id_new``
    (directional equi-join, never other × other), verified by exact
    integer Jaccard ≥ 0.5 via cross-multiplication (inter·2 ≥ union —
    no float). Non-recursive greedy keep-lowest-id, so the test is
    composable across snapshots/micro-batches like ``dup_dominated``.
    Inputs are (id, band, key) / (id, shingles) relations from
    :func:`minhash_encode`. Returns a distinct (id) relation."""
    cand = (
        new_keys.select(F.col("id").alias("id_new"), "band", "key")
        .join(
            other_keys.select(
                F.col("id").alias("id_old"),
                F.col("band").alias("__b"),
                F.col("key").alias("__k"),
            ),
            (F.col("band") == F.col("__b")) & (F.col("key") == F.col("__k")),
        )
        .where(F.col("id_old") < F.col("id_new"))
        .select("id_new", "id_old")
        .distinct()
    )
    pairs = cand.join(
        new_sh.select(F.col("id").alias("id_new"), F.col("shingles").alias("__sa")),
        "id_new",
    ).join(
        other_sh.select(
            F.col("id").alias("id_old"), F.col("shingles").alias("__sb")
        ),
        "id_old",
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    union = (
        F.size("__sa").cast("bigint") + F.size("__sb").cast("bigint") - inter
    )
    return (
        pairs.where(inter * 2 >= union).select(F.col("id_new").alias("id")).distinct()
    )
