"""Operator-level unit tests: expression helpers vs exact Python
semantics, as-of join tie handling, ANN invariants, SimHash properties."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import is_digits, pybool_str, strip_charset_prefix
from cve_manager_spark.operators.asof import asof_join
from cve_manager_spark.operators.dedup import simhash64
from cve_manager_spark.operators.similarity import ann_topk, cosine_topk
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

LSTRIP_CASES = [
    "CWE-89", "NVD-CWE-noinfo", "CWE-", "89", "", "WECWE-12", "-CWE", "C", "xCWE-1",
    "CWECWE---89C", "noinfo",
]


def test_strip_charset_prefix_matches_python_lstrip(spark):
    df = spark.createDataFrame([(s,) for s in LSTRIP_CASES], "s: string")
    got = {r["s"]: r["out"] for r in df.select("s", strip_charset_prefix(F.col("s"), "CWE-").alias("out")).collect()}
    for s in LSTRIP_CASES:
        assert got[s] == s.lstrip("CWE-"), s


def test_is_digits_matches_python_isdigit_ascii(spark):
    cases = ["89", "0", "", "a1", "1a", "12 3", "-1", "007"]
    df = spark.createDataFrame([(s,) for s in cases], "s: string")
    got = {r["s"]: r["out"] for r in df.select("s", is_digits(F.col("s")).alias("out")).collect()}
    for s in cases:
        assert got[s] == s.isdigit(), s


def test_pybool_str_spelling(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "b: boolean")
    got = [r["out"] for r in df.select(pybool_str(F.col("b")).alias("out")).collect()]
    assert sorted(got, key=str) == ["False", None, "True"] or set(got) == {"True", "False", None}


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01 10:00:00"), lid=100),
            Row(k=1, ts=_ts("2024-01-01 12:00:00"), lid=101),
            Row(k=2, ts=_ts("2024-01-01 09:00:00"), lid=200),  # no right row before
            Row(k=3, ts=_ts("2024-01-01 10:00:00"), lid=300),  # exact-ts tie
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts("2024-01-01 09:30:00"), v=1),
            Row(k=1, ts=_ts("2024-01-01 11:00:00"), v=2),
            Row(k=2, ts=_ts("2024-01-01 09:30:00"), v=3),  # after left's 09:00
            Row(k=3, ts=_ts("2024-01-01 10:00:00"), v=4),  # equal ts → inclusive
        ]
    )
    out = {r["lid"]: r["asof_v"] for r in asof_join(left, right, on="k", value_cols=["v"], tie_break="v").collect()}
    assert out[100] == 1      # most recent at-or-before 10:00 is 09:30
    assert out[101] == 2      # 11:00 beats 09:30
    assert out[200] is None   # nothing at-or-before
    assert out[300] == 4      # equal-ts right row included (<= semantics)


def test_ann_contains_query_vector_and_is_sorted(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    rows = ann_topk(emb, q, dim=64, k=10, n_planes=6).collect()
    # the query vector shares its own bucket: must be rank 1 with cos ~ 1
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["cos_sim"] - 1.0) < 1e-9
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # every ANN hit is scored identically to the exact path (same expression)
    exact = {r["vec_id"]: r["cos_sim"] for r in cosine_topk(emb, q, k=500).collect()}
    for r in rows:
        assert abs(exact[r["vec_id"]] - r["cos_sim"]) < 1e-9


def test_simhash_properties(spark):
    # SimHash needs a non-trivial shingle population to be stable: use
    # ~100-word docs; near-dup differs in one word, far doc shares nothing.
    base = " ".join(f"word{i} token{i % 7} item{i % 13}" for i in range(35))
    near = base.replace("word17", "changed17")
    far = " ".join(f"alpha{i} beta{i % 5} gamma{i % 11}" for i in range(35))
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)],
        "doc_id: int, text: string",
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", simhash64(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]  # determinism / identity
    ham_near = bin(fps[1] ^ fps[3]).count("1")
    ham_far = bin(fps[1] ^ fps[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated
    assert ham_near <= 16


def test_connected_components_hand_graph(spark):
    from cve_manager_spark.operators.graph import connected_components

    # components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a: bigint, id_b: bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_keep_one_per_cluster(spark):
    from cve_manager_spark.operators.graph import dedup_keep_one_per_cluster

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id: bigint, text: string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a: bigint, id_b: bigint")
    kept = sorted(r["doc_id"] for r in dedup_keep_one_per_cluster(df, pairs).collect())
    # cluster {0,3,5} keeps 0; singletons 1,2,4 keep themselves
    assert kept == [0, 1, 2, 4]


def test_stop_shingle_cap_bounds_hot_key_and_keeps_subset(spark):
    """Skew guard: a boilerplate shingle shared by every document is the
    worst-case hot join key. The max_doc_freq_frac cap must (a) remove the
    quadratic candidate blowup, (b) only ever shrink the result set, and
    (c) leave genuinely-duplicate pairs (which share NON-stop shingles)
    intact."""
    from cve_manager_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved contact us for details"
    rows = []
    # 60 distinct docs sharing only the boilerplate sentence
    for i in range(60):
        rows.append((i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}"))
    # one true near-dup pair sharing plenty of non-stop shingles
    rows.append((100, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((101, "the quick brown fox jumps over the lazy dog today"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, n=3, threshold=0.3, max_doc_freq_frac=0.5
        ).collect()
    }
    assert capped <= exact
    # the boilerplate-only docs pair up in the exact run...
    assert any(a < 60 and b < 60 for a, b in exact)
    # ...but not once their only shared shingles are capped out
    assert not any(a < 60 and b < 60 for a, b in capped)
    # the true near-dup pair survives the cap
    assert (100, 101) in capped


def test_minhash_lcg_signatures_match_bruteforce(spark):
    """The mixed MinHash family (one md5 + 32 integer mixes) must equal a
    Python brute-force evaluation of the same definition: per seed s,
    min over shingles of (A_s * base31(sh) + B_s) mod P, where base31 is
    the first 15 md5 hex chars as an int mod P. Locks both the hash
    definition (any drift breaks the DuckDB oracle embedding the same
    constants) and the min-per-seed aggregation."""
    import hashlib

    from pyspark.sql import functions as F

    from cve_manager_spark.operators.dedup import (
        LCG_P,
        lcg_constants,
        minhash_lcg_signatures,
    )

    docs = [(1, ["a b", "b c"]), (2, ["b c", "x y", "q r"]), (3, ["zz yy"])]
    ex = spark.createDataFrame(
        [(i, s) for i, shs in docs for s in shs], "id long, sh string"
    )
    got = {
        r["id"]: [r[f"s{s}"] for s in range(8)]
        for r in minhash_lcg_signatures(ex, num_hashes=8).collect()
    }

    def base31(sh: str, off: int) -> int:
        # even seeds hash digest chars [0:15], odd seeds chars [15:30]
        return int(hashlib.md5(sh.encode()).hexdigest()[off : off + 15], 16) % LCG_P

    consts = lcg_constants(8)
    for i, shs in docs:
        want = [
            min((a * base31(sh, 0 if s % 2 == 0 else 15) + b) % LCG_P for sh in shs)
            for s, (a, b) in enumerate(consts)
        ]
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_minhash_lcg_pairs_precision_and_recall(spark):
    """The mixed-family LSH (minhash_lcg_pairs) must (a) emit only pairs
    whose TRUE shingle Jaccard clears the threshold — precision is exact
    because every candidate is verified — and (b) find planted near-dups
    whose Jaccard is far above the banding curve's recall knee, on the
    real documents table plus two planted templates."""
    from pyspark.sql import functions as F

    from cve_manager_spark.operators.dedup import (
        minhash_lcg_pairs,
        word_shingles,
    )
    from cve_manager_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    planted = spark.createDataFrame(
        [(900001, base + "lambda mu"), (900002, base + "lambda nu")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)

    got = minhash_lcg_pairs(corpus, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got.collect()}

    # (b) recall: the planted pair is ~0.9 Jaccard — banding recall
    # 1-(1-j^2)^16 > 0.9999 — it must be found
    assert (900001, 900002) in pairs

    # (a) precision: every emitted jaccard equals the true set Jaccard
    sh = {
        r["doc_id"]: set(r["s"])
        for r in corpus.select(
            "doc_id", word_shingles(F.col("text"), 2).alias("s")
        ).collect()
    }
    for (a, b), j in pairs.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        true_j = inter / union
        assert abs(true_j - j) < 1e-12 and true_j >= 0.5, (a, b, j, true_j)


def test_k_core_on_canonical_graphs(spark):
    """Peeling semantics pinned on graphs with known cores: a ring is its
    own 2-core, a clique survives k = n-1, and a path peels away entirely
    (endpoint-by-endpoint — the worst-case round count for peeling)."""
    from cve_manager_spark.operators.graph import k_core

    def edges(pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    ring = edges([(i, (i + 1) % 10) for i in range(10)])
    core = {(r["node"], r["degree"]) for r in k_core(ring, k=2).collect()}
    assert core == {(i, 2) for i in range(10)}
    assert k_core(ring, k=3).count() == 0

    clique = edges([(i, j) for i in range(6) for j in range(i + 1, 6)])
    assert k_core(clique, k=5).count() == 6
    assert k_core(clique, k=6).count() == 0

    path = edges([(i, i + 1) for i in range(9)])  # 10-node path
    assert k_core(path, k=2).count() == 0  # peels fully, end-in


def test_bpe_train_matches_hand_computed_merges(spark):
    """Sennrich-style BPE on a corpus small enough to merge by hand.
    Words: low x3, lower x1. Symbol init: chars + '</w>'.
    Pair counts round 1: (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1,
    (r,</w>)=1 -> tie (l,o)/(o,w) at 4 breaks lexicographically to (l,o).
    Round 2: (lo,w)=4 wins. Round 3: (low,</w>)=3 wins. Round 4:
    (low,e)=1 ties with (e,r),(r,</w>) -> lexicographic -> (e,r)."""
    from cve_manager_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low",)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=4).orderBy("rank").collect()
    ]
    assert got == [
        (0, "l", "o", "lo", 4),
        (1, "lo", "w", "low", 4),
        (2, "low", "</w>", "low</w>", 3),
        (3, "e", "r", "er", 1),
    ]


def test_bpe_train_is_deterministic_on_corpus(spark):
    from cve_manager_spark.operators.text import bpe_train
    from cve_manager_spark.sources.testdata import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    a = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    b = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    assert a == b and len(a) == 6


def test_bpe_apply_hand_computed_token_counts(spark):
    """bpe_apply with the hand-verified 'low/lower' merge table: after
    (l,o), (lo,w), (low,</w>), (e,r) the word 'low' encodes to ONE
    symbol [low</w>], 'lower' to [low, er, </w>] = 3. Zero merges give
    chars + word-count tokens."""
    from cve_manager_spark.operators.text import bpe_apply

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r")]
    got = {
        r["id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_apply(docs, merges).collect()
    }
    # doc 1: low(1) + low(1) + lower(3) = 5 tokens; doc 2: low(1)
    assert got == {1: (3, 5), 2: (1, 1)}

    none = {
        r["id"]: r["n_tokens"] for r in bpe_apply(docs, []).collect()
    }
    # zero merges: per word len(word)+1 symbols → doc1: 4+4+6=14, doc2: 4
    assert none == {1: 14, 2: 4}


def test_bpe_apply_of_trained_merges_never_grows_tokens(spark):
    """Round-trip property on real data: encoding with the trainer's own
    merges can only shrink the token count vs zero merges, and the
    encode is deterministic."""
    from cve_manager_spark.operators.text import bpe_apply, bpe_train
    from cve_manager_spark.sources.testdata import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
    ]
    assert merges
    base = {r["id"]: r["n_tokens"] for r in bpe_apply(docs, []).collect()}
    enc1 = {r["id"]: r["n_tokens"] for r in bpe_apply(docs, merges).collect()}
    enc2 = {r["id"]: r["n_tokens"] for r in bpe_apply(docs, merges).collect()}
    assert enc1 == enc2
    assert all(enc1[i] <= base[i] for i in base)
    assert sum(enc1.values()) < sum(base.values())  # merges actually fire


def test_byte_string_parses_jvm_size_suffixes():
    """ADVICE r6: '128m' must parse as 128 MiB, not 128 bytes — digit-
    stripping silently disabled fan_out's parallelism guard."""
    from cve_manager_spark.functions.helpers import _byte_string

    assert _byte_string("134217728") == 134217728
    assert _byte_string("128m") == 128 * 1024 * 1024
    assert _byte_string("128MB") == 128 * 1024 * 1024
    assert _byte_string("1g") == 1 << 30
    assert _byte_string("1 G") == 1 << 30
    assert _byte_string("512k") == 512 * 1024
    assert _byte_string("64b") == 64
    # unparseable → Spark's 128 MB default, never a tiny denominator
    assert _byte_string("weird") == 134217728
    assert _byte_string("") == 134217728
    assert _byte_string("m128") == 134217728


def test_fan_out_widens_with_human_readable_max_partition_bytes(spark, tmp_path):
    """With maxPartitionBytes set to '128m' (human-readable), a one-file
    scan must still be repartitioned up to the default parallelism —
    the regression ADVICE r6 flagged left it at 1 partition."""
    from cve_manager_spark.functions.helpers import fan_out

    p = str(tmp_path / "t.parquet")
    spark.range(1000).write.mode("overwrite").parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        df = spark.read.parquet(p)
        widened = fan_out(df)
        assert (
            widened.rdd.getNumPartitions()
            >= spark.sparkContext.defaultParallelism
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_minhash_det_with_counts_consistent_with_thresholded_pairs(spark):
    """`with_counts=True` must return EVERY band-collision candidate with
    exact integer (inter, union_sz) such that filtering by
    inter/union >= t reproduces the default thresholded output exactly
    (same pairs, same jaccard) — the contract minhash_band_fp_rate's
    decile bucketing rests on."""
    from cve_manager_spark.operators.dedup import minhash_det_pairs
    from cve_manager_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    counted = {
        (r["id_a"], r["id_b"]): (r["inter"], r["union_sz"])
        for r in minhash_det_pairs(docs, with_counts=True).collect()
    }
    assert counted, "no band candidates at sf0.001 — banding broke"
    thresholded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_det_pairs(docs, threshold=0.5).collect()
    }
    derived = {
        pair: inter / union
        for pair, (inter, union) in counted.items()
        if inter / union >= 0.5
    }
    assert derived == thresholded
    # candidates are a strict superset (band collisions below threshold
    # exist on this corpus); all unions positive, inter <= union
    assert set(counted) > set(thresholded)
    assert all(0 <= i <= u and u > 0 for i, u in counted.values())


def test_pca_power_top_converges_to_float_pca_direction(spark):
    """pca_power_top's integer power method must CONVERGE on the true
    top principal direction computed by numpy in float (sign-invariant
    cosine): monotone in the iteration count and >= 0.9 by 16
    iterations. The synthetic embeddings have a nearly flat spectrum
    (lambda_2/lambda_1 close to 1), so absolute alignment at 2
    iterations is inherently modest — the 2-iteration face is what the
    ORACLE verifies exactly; this test pins the semantics (it really
    is power iteration on the covariance) and the output contract: one
    row per dim, max |loading| exactly 1e6, deterministic across
    calls."""
    import numpy as np

    from cve_manager_spark.operators.semantic import pca_power_top
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    Xc = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    top = vt[0]

    def aligned(iters):
        rows = pca_power_top(emb, iters=iters).collect()
        assert len(rows) == 64
        v = np.zeros(64)
        for r in rows:
            v[r["dim"]] = r["loading"]
        assert int(np.abs(v).max()) == 1_000_000
        return abs(float(np.dot(v, top))) / float(np.linalg.norm(v))

    c2, c8, c16 = aligned(2), aligned(8), aligned(16)
    assert c8 >= c2 - 1e-6 and c16 >= c8 - 1e-6, (c2, c8, c16)
    assert c16 >= 0.9, f"not converging to the top PC: {c16:.4f}"
    # determinism: same call twice, identical loadings
    a = [tuple(r) for r in pca_power_top(emb, iters=2).collect()]
    b = [tuple(r) for r in pca_power_top(emb, iters=2).collect()]
    assert a == b


def test_pca_topr_deflation_and_drift_component(spark):
    """VERDICT r10 #8: top-r PCA by deflation. PC1 from pca_power_topr
    is bit-identical to pca_power_top; PC2 is a distinct direction at
    the same 1e6 scale, near-orthogonal to PC1 and with materially less
    captured variance; drift_fit(component=1) exposes it to the drift
    monitor and projections stay map-side computable."""
    from cve_manager_spark.operators.semantic import (
        drift_fit,
        drift_projection,
        pca_power_top,
        pca_power_topr,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    mu, vs = pca_power_topr(emb, r=2, iters=2)
    rows = pca_power_top(emb, iters=2).collect()
    want = [0] * len(rows)
    for r in rows:
        want[r["dim"]] = r["loading"]
    assert vs[0] == want  # deflation path reproduces the top direction
    v1, v2 = vs
    assert v1 != v2
    assert max(abs(x) for x in v2) == 1_000_000  # same loading scale
    # near-orthogonal: |cos(v1,v2)| well below the self-cosine of 1
    import math

    dot = sum(a * b for a, b in zip(v1, v2))
    cos = dot / (
        math.sqrt(sum(a * a for a in v1)) * math.sqrt(sum(b * b for b in v2))
    )
    assert abs(cos) < 0.2, f"PC2 not deflated away from PC1: cos={cos:.3f}"

    mu1, got_v2 = drift_fit(emb, component=1)
    assert mu1 == mu and got_v2 == v2
    # variance captured by PC2 projections is below PC1's (top direction
    # dominates by construction of the power method); compare on the
    # L2-1e6 scale — raw loadings have direction-dependent norms
    from cve_manager_spark.operators.semantic import unit_scale

    def var_of(v):
        p = drift_projection(emb, mu, unit_scale(v))
        return p.agg(
            F.sum((F.col("p") * F.col("p")).cast("decimal(38,0)")).alias("s")
        ).head()["s"]

    assert var_of(v2) < var_of(v1)
    assert drift_projection(emb, mu1, got_v2).count() == emb.count()


def test_banded_self_pairs_equals_naive_join_under_skew(spark):
    """The skew-safe candidate generator must emit EXACTLY the naive
    self-equi-join's pair set — on a relation with one hot bucket well
    past the cap (the salted-grid path), several small buckets (the
    plain path), and ids in both — and each pair exactly once."""
    from pyspark.sql import functions as F

    from cve_manager_spark.operators.dedup import banded_self_pairs

    hot = spark.range(0, 300).select(
        F.col("id"), F.lit(0).alias("band"), F.lit("HOT").alias("key")
    )
    cold = spark.range(200, 500).select(
        F.col("id"),
        F.lit(1).alias("band"),
        F.concat(F.lit("c"), (F.col("id") % 40).cast("string")).alias(
            "key"
        ),
    )
    keys = hot.unionByName(cold)

    a = keys.select(F.col("id").alias("id_a"), "band", "key")
    b = keys.select(F.col("id").alias("id_b"), "band", "key")
    naive = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    got = [
        (r["id_a"], r["id_b"])
        for r in banded_self_pairs(keys, id_col="id", cap=64, salt=4)
        .collect()
    ]
    assert len(got) == len(set(got))  # exactly once
    assert set(got) == naive
    # the hot bucket really exceeded the cap (salted path exercised)
    assert 300 > 64 and len(naive) >= 300 * 299 // 2


def test_values_relation_empty_rows(spark):
    """Zero-row spine: `VALUES` needs at least one tuple, so the empty
    case must fall back to a filtered dummy row (r14 regression — a BPE
    merge table trained on an empty-token corpus produced
    `SELECT * FROM VALUES  AS t(...)`, a parse error)."""
    from cve_manager_spark.functions.helpers import values_relation

    df = values_relation(spark, [], "rank INT, pair STRING, w DOUBLE")
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<rank:int,pair:string,w:double>"
    # non-empty path unchanged
    one = values_relation(spark, [(0, "a b", 1.5)], "rank INT, pair STRING, w DOUBLE")
    assert one.collect() == [(0, "a b", 1.5)]


def test_values_relation_non_finite_floats(spark):
    """r15 (VERDICT r14 #7): repr of nan/inf is not a SQL literal — the
    spine must render them as CAST('NaN'/'Infinity' AS DOUBLE), exactly
    like double_array_lit's guard."""
    import math

    from cve_manager_spark.functions.helpers import values_relation

    rows = [
        (0, float("nan")),
        (1, float("inf")),
        (2, float("-inf")),
        (3, 2.5),
        (4, None),
    ]
    got = values_relation(spark, rows, "k INT, v DOUBLE").orderBy("k").collect()
    assert math.isnan(got[0]["v"])
    assert got[1]["v"] == float("inf")
    assert got[2]["v"] == float("-inf")
    assert got[3]["v"] == 2.5
    assert got[4]["v"] is None


def test_checkpoint_rdd_ids_scoped_to_the_dataframe(spark):
    """r15 (ADVICE r14): cleanup bookkeeping reads the checkpointed
    DataFrame's OWN RDD id — a concurrent query's checkpoint must never
    appear in the captured set (the global-diff race), and a
    non-checkpoint plan yields the empty set."""
    from cve_manager_spark.functions.blocks import (
        checkpoint_rdd_ids,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    other = spark.range(10).localCheckpoint(eager=True)  # the "concurrent" pin
    mine_lazy = spark.range(5).localCheckpoint(eager=False)
    mine_eager = spark.range(7).localCheckpoint(eager=True)
    ids_lazy = checkpoint_rdd_ids(mine_lazy)
    ids_eager = checkpoint_rdd_ids(mine_eager)
    assert len(ids_lazy) == 1 and len(ids_eager) == 1
    assert ids_lazy != ids_eager
    assert checkpoint_rdd_ids(other) not in (ids_lazy, ids_eager)
    assert checkpoint_rdd_ids(spark.range(3)) == set()  # not a checkpoint
    # freeing mine leaves the concurrent pin intact and readable
    unpersist_rdd_ids(spark, ids_lazy | ids_eager)
    assert checkpoint_rdd_ids(other) <= persistent_rdd_ids(spark)
    assert other.count() == 10
    other.unpersist()


def test_iterative_graph_ops_free_superseded_checkpoint_blocks(spark):
    """r14 optimization contract: the iterative graph operators unpersist
    the checkpoint blocks of SUPERSEDED rounds (and edge relations that
    can no longer be read) as soon as the successor round materializes,
    instead of leaving them for ContextCleaner to find after a driver GC.
    Storage stays O(1) rounds — and the returned relation must still be
    fully readable (an unpersisted local checkpoint fails loudly, so a
    wrong id set here is a crash, not a slow leak)."""
    from cve_manager_spark.functions.blocks import (
        persistent_rdd_ids as _persistent_rdd_ids,
    )
    from cve_manager_spark.operators.graph import (
        bfs_hops,
        connected_components,
        k_core,
    )

    def run(fn):
        before = _persistent_rdd_ids(spark)
        out = fn()
        rows = out.collect()
        leftover = _persistent_rdd_ids(spark) - before
        assert out.count() == len(rows)  # re-read: live blocks intact
        return rows, leftover

    # 41-node chain + pair: converges via pointer jumping over >1 round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101)],
        "id_a: bigint, id_b: bigint",
    )
    rows, left = run(lambda: connected_components(edges))
    assert {r["component"] for r in rows} == {0, 100}
    # only the final labels checkpoint survives the call
    assert len(left) <= 1, left

    # path peels end-in over several rounds, ends empty
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    rows, left = run(lambda: k_core(path, k=2))
    assert rows == []
    assert len(left) <= 1, left

    # bfs: walk ends by frontier exhaustion (break path) — the edge
    # checkpoint and all superseded visited unions are freed
    seeds = spark.createDataFrame([(0,)], "node long")
    rows, left = run(lambda: bfs_hops(path, seeds, max_hops=20))
    assert {r["node"]: r["hop"] for r in rows} == {i: i for i in range(10)}
    assert len(left) <= 2, left
