"""Scale-hardening differentials (r2 VERDICT item #8): the guards that
only matter on adversarial data — a boilerplate hot shingle, a
worst-case-diameter graph, a hot join key — exercised on synthetic
inputs shaped like the failure, with results checked against the
unguarded/exact formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cve_manager_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from cve_manager_spark.operators.graph import connected_components
from cve_manager_spark.operators.skew import salted_join

BOILER = "terms of service apply to all content on this mirror"


def _boiler_corpus(spark, n_docs: int = 300):
    """Every doc opens with the same boilerplate sentence (hot shingles
    with df == n_docs) followed by a unique tail; docs 0 and 1 are
    near-duplicates of each other (shared tail, one word changed)."""
    rows = []
    for i in range(n_docs):
        if i in (0, 1):
            tail = " ".join(f"dup{j}" for j in range(30)) + f" end{i}"
        else:
            tail = " ".join(f"w{i}x{j}" for j in range(20))
        rows.append((i, f"{BOILER} {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stop_shingle_cap_bounds_hot_key_blowup(spark):
    """A shingle shared by all N docs alone generates N(N-1)/2 candidate
    pairs on ONE shuffle key. The frequency cap drops it; survivors are
    a subset of the exact result (recall dial, never false positives),
    and true near-duplicates — whose similarity lives in rare shingles —
    still surface."""
    docs = _boiler_corpus(spark)

    # exact run at a low threshold: the boilerplate alone pushes every
    # unrelated pair over it -> quadratic result set
    exact = ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact}
    assert len(exact_pairs) > 40000  # ~C(300,2): the blowup is real

    # capped run: hot shingles (df > 5% of docs) never reach the join
    capped = ngram_jaccard_pairs(
        docs, n=3, threshold=0.05, max_doc_freq_frac=0.05
    ).collect()
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert capped_pairs <= exact_pairs  # subset: no false positives
    assert len(capped_pairs) < 10  # blowup gone
    assert (0, 1) in capped_pairs  # the real near-dup survives

    # the survivor's jaccard can only shrink under the cap (common count
    # loses capped shingles; denominators keep full sizes)
    j_exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in exact}[(0, 1)]
    j_capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped}[(0, 1)]
    assert j_capped <= j_exact


def test_containment_cap_bounds_hot_key_blowup(spark):
    """Same adversarial corpus, containment flavor (VERDICT r4 #2): the
    registered shingle_containment plan has NO size-ratio prune (asymmetry
    is the point), so the frequency cap is its only skew guard — verify it
    kills the boilerplate blowup while the true near-dup pair survives,
    and that capped containment is a pairwise subset with scores that only
    shrink."""
    docs = _boiler_corpus(spark)

    exact = containment_pairs(docs, n=3, threshold=0.05).collect()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact}
    assert len(exact_pairs) > 40000  # boilerplate shingles: quadratic

    capped = containment_pairs(
        docs, n=3, threshold=0.05, max_doc_freq_frac=0.05
    ).collect()
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert capped_pairs <= exact_pairs
    assert len(capped_pairs) < 10
    assert (0, 1) in capped_pairs

    ex = {(r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"]) for r in exact}
    for pair, (ca, cb) in (
        ((r["id_a"], r["id_b"]), (r["cont_a"], r["cont_b"])) for r in capped
    ):
        assert ca <= ex[pair][0] and cb <= ex[pair][1]


def test_containment_dominates_jaccard_on_every_pair(spark):
    """Consistency property between the two set-similarity operators:
    for any pair, max-containment = common/min(|A|,|B|) ≥ common/|A∪B| =
    jaccard, so at the same threshold and cap the jaccard pair set must
    be a subset of the containment pair set, with containment ≥ jaccard
    on each shared pair."""
    docs = _boiler_corpus(spark, n_docs=60)
    cont = {
        (r["id_a"], r["id_b"]): max(r["cont_a"], r["cont_b"])
        for r in containment_pairs(docs, n=3, threshold=0.05).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    }
    assert set(jac) <= set(cont)
    assert all(cont[p] >= jac[p] - 1e-12 for p in jac)


def _ring_edges(spark, n: int, offset: int = 0):
    rows = [(offset + i, offset + (i + 1) % n) for i in range(n)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_connected_components_ring_converges_logarithmically(spark):
    """A ring is the worst diameter per edge count: naive min-label
    propagation needs ~n/2 rounds on a 256-ring. Pointer jumping must
    close it in O(log n) rounds — max_iter=8 would hard-fail a linear
    implementation (RuntimeError), and labels must equal the true
    component minimum for every node."""
    edges = _ring_edges(spark, 256).unionAll(_ring_edges(spark, 56, offset=1000))
    comp = connected_components(edges, max_iter=8)
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert len(got) == 256 + 56
    assert all(got[n] == 0 for n in range(256))
    assert all(got[n] == 1000 for n in range(1000, 1056))


def _skewed_tables(spark):
    """90% of fact rows share ONE key — the shape that stalls a single
    reducer at scale."""
    fact = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 97).alias("val"),
    )
    dim = spark.range(0, 20000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_rejects_small_side_preserving_types(spark):
    """Right/full outer would emit each unmatched small-side row once per
    salt bucket (it was replicated buckets-wide); the operator must refuse
    rather than silently multiply rows (ADVICE r4)."""
    import pytest

    fact, dim = _skewed_tables(spark)
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="salt bucket"):
            salted_join(
                fact, dim, fact["k"] == dim["k"], salt_cols=["row_id"], how=how
            )


def test_salted_join_matches_plain_join_on_hot_key(spark):
    fact, dim = _skewed_tables(spark)
    plain = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    )
    salted = (
        salted_join(fact, dim, fact["k"] == dim["k"], salt_cols=["row_id"], buckets=8)
        .groupBy(fact["k"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_shuffles_on_composite_key(spark):
    """With broadcast off (forcing the shuffle the salt exists for), the
    exchange must hash-partition on (key, salt) — the hot key's rows
    spread over `buckets` reducers."""
    fact, dim = _skewed_tables(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(
            fact, dim, fact["k"] == dim["k"], salt_cols=["row_id"], buckets=8
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "hashpartitioning(k" in plan and "__salt" in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_aqe_splits_skewed_sort_merge_join(spark):
    """The engine's other skew hatch: with AQE on (the session default),
    a hot key that breaches the skewed-partition threshold is split at
    runtime — the final adaptive plan marks the join skew=true. Salting
    (above) removes skew by construction; this proves the runtime path
    engages when salting wasn't applied. Thresholds are lowered so the
    test-sized hot key trips the same logic a multi-GB partition trips
    in production."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
        )
        dim = spark.range(0, 200000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("lbl")
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 200000  # drives THIS DataFrame's execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_cap_bounds_hot_key_blowup(spark):
    """Cross-snapshot flavor of the boilerplate blowup: every new-batch
    doc shares the hot opening shingles with every snapshot doc, so the
    uncapped new-vs-old join is |new|x|old| on one shuffle key. The
    shared doc-frequency cap (computed over snapshot+batch together)
    kills it; the one true cross-side near-dup pair survives, and no
    snapshot-vs-snapshot or batch-vs-batch pair is ever emitted."""
    from cve_manager_spark.operators.dedup import incremental_near_dups

    docs = _boiler_corpus(spark)
    new = docs.where(F.col("doc_id") % 2 == 1)  # doc 1: near-dup of doc 0
    old = docs.where(F.col("doc_id") % 2 == 0)

    exact = incremental_near_dups(new, old, n=3, threshold=0.05).collect()
    exact_pairs = {(r["id_new"], r["id_old"]) for r in exact}
    assert len(exact_pairs) > 20000  # ~150x150: the cross blowup is real

    capped = incremental_near_dups(
        new, old, n=3, threshold=0.05, max_doc_freq_frac=0.05
    ).collect()
    capped_pairs = {(r["id_new"], r["id_old"]) for r in capped}
    assert capped_pairs <= exact_pairs  # subset: recall dial only
    assert len(capped_pairs) < 10
    assert (1, 0) in capped_pairs  # the true cross-side near-dup survives
    # sides are respected: id_new odd, id_old even, always
    assert all(a % 2 == 1 and b % 2 == 0 for a, b in exact_pairs)


def test_incremental_pairs_equal_self_join_cross_slice(spark):
    """Consistency: incremental_near_dups(new, old) must emit exactly the
    full-corpus ngram_jaccard_pairs result restricted to cross-side
    pairs, with identical jaccard values — the increment path is an
    optimization (skip snapshot-vs-snapshot work), never a semantic
    change. Holds with and without the frequency cap because the cap's
    doc-frequency statistic is computed over both sides together."""
    from cve_manager_spark.operators.dedup import (
        incremental_near_dups,
        ngram_jaccard_pairs,
    )

    docs = _boiler_corpus(spark, n_docs=60)
    new = docs.where(F.col("doc_id") % 2 == 1)
    old = docs.where(F.col("doc_id") % 2 == 0)
    for cap in (None, 0.05):
        full = ngram_jaccard_pairs(
            docs, n=3, threshold=0.05, max_doc_freq_frac=cap
        ).collect()
        want = {
            (max(r["id_a"], r["id_b"]) if r["id_a"] % 2 == 0 else r["id_a"],
             min(r["id_a"], r["id_b"]) if r["id_a"] % 2 == 0 else r["id_b"]):
            round(r["jaccard"], 9)
            for r in full
            if r["id_a"] % 2 != r["id_b"] % 2
        }
        got = {
            (r["id_new"], r["id_old"]): round(r["jaccard"], 9)
            for r in incremental_near_dups(
                new, old, n=3, threshold=0.05, max_doc_freq_frac=cap
            ).collect()
        }
        assert got == want, f"cap={cap}"
