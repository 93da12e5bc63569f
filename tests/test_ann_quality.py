"""ANN quality audit: the approximate paths (hyperplane LSH with
multi-probe, IVF with n_probe) measured against the exact cosine top-k
on the same corpus.

What is safe to pin: the LSH path is fully deterministic (planes from a
fixed seed, no ML), so its recall on fixed testdata is a constant —
asserted with margin. The IVF path depends on KMeans clustering, so
only partitioning-independent properties are asserted: probing every
list IS the exact search (recall 1.0), and probing fewer lists can
never beat probing all of them. Multi-probe/multi-list monotonicity
holds by construction (more probes only ADD candidates).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cve_manager_spark.operators import similarity as S
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_ORACLE

K = 10
QUERY_ID = 7


@pytest.fixture(scope="module")
def corpus_and_query(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)
    exact = {r["vec_id"] for r in S.cosine_topk(corpus, q, k=K).collect()}
    assert len(exact) == K
    return corpus, q, dim, exact


def _recall(ids, exact):
    return len(set(ids) & exact) / len(exact)


def test_lsh_multi_probe_recovers_recall(spark, corpus_and_query):
    corpus, q, dim, exact = corpus_and_query
    recalls = {}
    for mp in (0, 1, 2):
        got = [
            r["vec_id"]
            for r in S.ann_topk(corpus, q, dim=dim, k=K, multi_probe=mp).collect()
        ]
        recalls[mp] = _recall(got, exact)
    # probing adjacent buckets can only add candidates -> recall is monotone
    assert recalls[0] <= recalls[1] <= recalls[2]
    # deterministic planes + fixed data: measured 0.2 at mp=2 on sf0.001
    # (0.4 on sf0.01); assert with margin
    assert recalls[2] >= 0.15


def test_ivf_full_probe_is_exact_and_monotone(spark, corpus_and_query):
    corpus, q, _dim, exact = corpus_and_query
    r4 = _recall(
        [r["vec_id"] for r in S.ivf_topk(corpus, q, k=K, n_lists=16, n_probe=4).collect()],
        exact,
    )
    r16 = _recall(
        [r["vec_id"] for r in S.ivf_topk(corpus, q, k=K, n_lists=16, n_probe=16).collect()],
        exact,
    )
    # probing every list IS the exact search, whatever KMeans produced
    assert r16 == 1.0
    assert 0.0 <= r4 <= r16


def test_pq_recall_floor_and_determinism(spark):
    """PQ ADC quality gate: recall@10 vs exact L2 at m=16/k=16 clears a
    floor over several queries, doubling the code budget (m=32) does
    not hurt mean recall, and the whole train→encode→query pipeline is
    bit-deterministic across runs (integer codebooks and distances)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cve_manager_spark.operators.similarity import pq_topk, pq_train
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}

    def mean_recall(m):
        books = pq_train(emb, m=m, k=16)
        recs = []
        for qid in (0, 7, 123):
            q = emb.where(F.col("vec_id") == qid).select(
                F.col("embedding").alias("qvec")
            )
            got = {r["vec_id"] for r in pq_topk(emb, q, books, k=10).collect()}
            qv = vecs[qid]

            def cos(i):
                v = vecs[i]
                return float(v @ qv) / float(
                    np.linalg.norm(v) * np.linalg.norm(qv)
                )

            exact = set(sorted(vecs, key=cos, reverse=True)[:10])
            recs.append(len(got & exact) / 10)
        return sum(recs) / len(recs), books

    r16, books16 = mean_recall(16)
    assert r16 >= 0.4, r16  # measured 0.50 at seed data; floor with margin
    r32, _ = mean_recall(32)
    assert r32 >= r16 - 0.1  # more bits must not collapse recall

    # determinism: identical codebooks and identical top-k on retrain
    books16b = pq_train(emb, m=16, k=16)
    assert books16 == books16b
    q0 = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    a = [tuple(r) for r in pq_topk(emb, q0, books16, k=10).collect()]
    b = [tuple(r) for r in pq_topk(emb, q0, books16b, k=10).collect()]
    assert a == b


def test_pq_zero_vector_ranks_last_not_nan(spark):
    """A vector whose components all quantize to 0 has vnorm2 == 0; its
    adc_score must be an explicit -inf (ranks last, present in a full
    scan), not a NaN that Spark's ordering would put FIRST."""
    import math

    from cve_manager_spark.operators.similarity import pq_topk, pq_train
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").limit(20)
    dim = len(emb.select("embedding").first()[0])
    zero = emb.sparkSession.createDataFrame(
        [(99_999_999, [0.0] * dim)], "vec_id bigint, embedding array<double>"
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(zero)
    books = pq_train(corpus, m=8, k=8)
    q = emb.limit(1).select(F.col("embedding").alias("qvec"))
    rows = pq_topk(corpus, q, books, k=21).collect()
    assert len(rows) == 21
    by_id = {r["vec_id"]: r["adc_score"] for r in rows}
    z = by_id[99_999_999]
    assert z == float("-inf") and not math.isnan(z)
    assert rows[-1]["vec_id"] == 99_999_999  # degenerate vector ranks last


def test_pq_rerank_with_full_candidates_is_exact_and_floor_holds(spark):
    """pq_topk_rerank property: with n_candidates >= corpus the ADC stage
    prunes nothing and the exact re-rank must reproduce cosine_topk
    exactly (ids AND order). With a tight candidate budget (C=50) the
    re-ranked recall@10 must clear a floor well above plain ADC's."""
    from cve_manager_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
        pq_topk_rerank,
        pq_train,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    books = pq_train(emb, m=32, k=16)
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)

    exact = [r["vec_id"] for r in cosine_topk(corpus, q, k=K).collect()]
    full = [
        r["vec_id"]
        for r in pq_topk_rerank(corpus, q, books, k=K, n_candidates=n).collect()
    ]
    assert full == exact  # same ids, same order

    got = {
        r["vec_id"]
        for r in pq_topk_rerank(corpus, q, books, k=K, n_candidates=50).collect()
    }
    adc = {r["vec_id"] for r in pq_topk(corpus, q, books, k=K).collect()}
    r_rerank = len(got & set(exact)) / K
    r_adc = len(adc & set(exact)) / K
    # measured 1.0 vs 0.5 at this corpus/seed; assert with margin and
    # the dominance that makes re-ranking worth its candidate fetch
    assert r_rerank >= 0.7, (r_rerank, r_adc)
    assert r_rerank >= r_adc


def test_ivf_index_persists_and_probe_prunes_partitions(spark, tmp_path):
    """write_ivf_index → hive layout by list_id + centroid sidecar;
    querying through the persisted index must (a) return exactly the
    in-memory index's result and (b) plan the probe filter as PARTITION
    pruning — only the probed cells' files are listed/read."""
    from pathlib import Path

    from cve_manager_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)
    indexed, model = ivf_index(corpus, n_lists=8)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(indexed, model, path)
    assert len(list(Path(path).glob("list_id=*"))) >= 2
    assert (Path(path) / "_ivf_centroids.json").exists()

    mem = [
        tuple(r)
        for r in ivf_topk(
            corpus, q, k=K, n_lists=8, n_probe=2, index=(indexed, model)
        ).collect()
    ]
    disk_index = read_ivf_index(spark, path)
    disk = [
        tuple(r)
        for r in ivf_topk(
            corpus, q, k=K, n_lists=8, n_probe=2, index=disk_index
        ).collect()
    ]
    assert disk == mem

    # partition pruning: the probed candidate scan reads only files under
    # the probed list_id dirs
    import numpy as np

    qvec = np.asarray(q.first()[0], dtype=np.float64)
    order = np.argsort(
        [np.linalg.norm(np.asarray(c) - qvec) for c in disk_index[1]]
    )
    probes = [int(i) for i in order[:2]]
    cand = disk_index[0].where(F.col("list_id").isin(probes))
    files = {
        r["f"]
        for r in cand.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all(
        any(f"list_id={p}/" in f for p in probes) for f in files
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_ivf_pq_full_probe_full_candidates_is_exact_and_deterministic(spark):
    """ivf_pq_topk property (VERDICT r6 #7): with n_probe = n_lists the
    probe prunes nothing and with n_candidates >= corpus the ADC stage
    prunes nothing, so the exact re-rank must reproduce cosine_topk
    exactly (ids AND order). Building the index twice must give the
    bit-identical index (deterministic quantizers) and result."""
    from cve_manager_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_index,
        ivf_pq_topk,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)

    idx, cents, books = ivf_pq_index(corpus, n_lists=8, m=8, k_codes=16)
    idx2, cents2, books2 = ivf_pq_index(corpus, n_lists=8, m=8, k_codes=16)
    assert cents == cents2 and books == books2
    rows = sorted(tuple(r) for r in idx.collect())
    assert rows == sorted(tuple(r) for r in idx2.collect())

    exact = [tuple(r) for r in cosine_topk(corpus, q, k=K).collect()]
    full = [
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q, idx, cents, books, k=K, n_probe=8, n_candidates=n
        ).collect()
    ]
    assert full == exact  # same ids, same order, same scores


def test_ivf_pq_recall_floor_vs_exact(spark):
    """At a pruning operating point (half the cells probed, modest
    candidate budget) the composition must clear a recall floor vs the
    exact top-k — the cell-recall x candidate-recall factorization in
    the operator docstring actually delivering."""
    from cve_manager_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_index,
        ivf_pq_topk,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)
    idx, cents, books = ivf_pq_index(corpus, n_lists=8, m=16, k_codes=16)
    exact = {r["vec_id"] for r in cosine_topk(corpus, q, k=K).collect()}
    got = {
        r["vec_id"]
        for r in ivf_pq_topk(
            corpus, q, idx, cents, books, k=K, n_probe=4, n_candidates=100
        ).collect()
    }
    # measured 0.8 at this corpus/seed (sf0.01); assert with margin
    assert len(got & exact) / K >= 0.5


def test_ivf_pq_persisted_index_prunes_partitions(spark, tmp_path):
    """write_ivf_pq_index → hive layout by list_id + centroids/codebooks
    sidecar; querying through the persisted index must return exactly
    the in-memory index's result AND plan the ADC stage's probe filter
    as PARTITION pruning (only probed cells' code files listed/read) —
    the at-scale claim of the composition."""
    import numpy as np
    from pathlib import Path

    from cve_manager_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_topk,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.operators.semantic import QUANT_SCALE
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)
    idx, cents, books = ivf_pq_index(corpus, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_idx")
    write_ivf_pq_index(idx, cents, books, path)
    assert len(list(Path(path).glob("list_id=*"))) >= 2
    assert (Path(path) / "_ivf_pq_meta.json").exists()

    mem = [
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q, idx, cents, books, k=K, n_probe=2, n_candidates=50
        ).collect()
    ]
    didx, dcents, dbooks = read_ivf_pq_index(spark, path)
    disk = [
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q, didx, dcents, dbooks, k=K, n_probe=2, n_candidates=50
        ).collect()
    ]
    assert disk == mem

    qvec = np.asarray(q.first()[0], dtype=np.float64)
    qq = np.floor(qvec * QUANT_SCALE).astype(np.int64)
    C = np.asarray(dcents, dtype=np.int64)
    d2 = (-2 * (C @ qq) + (C * C).sum(axis=1)).tolist()
    probes = [cid for _, cid in sorted(zip(d2, range(len(dcents))))[:2]]
    cand = didx.where(F.col("list_id").isin(probes))
    files = {
        r["f"]
        for r in cand.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all(
        any(f"list_id={p}/" in f for p in probes) for f in files
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def _file_digests(root):
    import hashlib
    from pathlib import Path

    return {
        str(p.relative_to(root)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in Path(root).rglob("*.parquet")
    }


def test_ivf_pq_upsert_pure_insert_appends_only(spark, tmp_path):
    """Incremental index maintenance (ivf_pq_upsert): a pure-insert
    delta is encoded against the FROZEN sidecar meta and appended —
    every pre-existing file keeps its exact bytes (copy-on-write
    discipline), and the grown index is row-identical to re-encoding
    the full corpus under the same meta, so full-probe search through
    it is still the exact top-k."""
    from cve_manager_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_encode_delta,
        ivf_pq_index,
        ivf_pq_topk,
        ivf_pq_upsert,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 5 != 4)
    delta = emb.where(F.col("vec_id") % 5 == 4)
    n_delta = delta.count()
    assert n_delta > 0

    idx, cents, books = ivf_pq_index(base, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_idx")
    write_ivf_pq_index(idx, cents, books, path)
    before = _file_digests(path)

    stats = ivf_pq_upsert(spark, path, delta)
    assert stats["n_matched"] == 0
    assert stats["n_inserted"] == n_delta
    assert stats["files_touched"] == 0

    after = _file_digests(path)
    # pure insert: every pre-existing file is byte-identical, new files
    # only appear (appended into touched list_id= dirs)
    assert set(before) <= set(after)
    assert all(after[f] == h for f, h in before.items())

    didx, dcents, dbooks = read_ivf_pq_index(spark, path)
    assert dcents == cents and dbooks == books
    def rows(df):
        return {
            (r[0], r[1], tuple(r[2]), r[3])
            for r in df.select("vec_id", "list_id", "pq_code", "vnorm2").collect()
        }

    got = rows(didx)
    want = rows(ivf_pq_encode_delta(emb, cents, books))
    assert got == want

    # full probe + full candidates through the upserted index == exact
    q = emb.where(F.col("vec_id") == QUERY_ID).select(
        F.col("embedding").alias("qvec")
    )
    corpus = emb.where(F.col("vec_id") != QUERY_ID)
    qidx = didx.where(F.col("vec_id") != QUERY_ID)
    approx = [
        tuple(r)
        for r in ivf_pq_topk(
            corpus, q, qidx, dcents, dbooks, k=K,
            n_probe=8, n_candidates=100_000,
        ).collect()
    ]
    exact = [tuple(r) for r in cosine_topk(corpus, q, k=K).collect()]
    assert approx == exact


def test_ivf_pq_upsert_replaces_reembedded_id(spark, tmp_path):
    """A re-embedded id (same vec_id, new vector) is REPLACED through
    the COW merge: row count is unchanged, the id carries the new
    embedding's cell/code (moving across list_id partitions works),
    and only the files that held the old row were rewritten."""
    from cve_manager_spark.operators.similarity import (
        ivf_pq_encode_delta,
        ivf_pq_index,
        ivf_pq_upsert,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx, cents, books = ivf_pq_index(emb, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_idx")
    write_ivf_pq_index(idx, cents, books, path)
    n_before = spark.read.parquet(path).count()

    # re-embed id 3 with id 11's vector negated — deterministic, and far
    # from the original so the cell assignment is very likely to move
    victim = 3
    newvec = emb.where(F.col("vec_id") == 11).select(
        F.lit(victim).cast("long").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: -x).alias("embedding"),
    )
    stats = ivf_pq_upsert(spark, path, newvec)
    assert stats["n_matched"] == 1
    assert stats["n_inserted"] == 0
    assert stats["files_touched"] >= 1

    didx, dcents, dbooks = read_ivf_pq_index(spark, path)
    assert didx.count() == n_before
    got = didx.where(F.col("vec_id") == victim).select(
        "vec_id", "list_id", "pq_code", "vnorm2"
    ).collect()
    want = ivf_pq_encode_delta(newvec, cents, books).select(
        "vec_id", "list_id", "pq_code", "vnorm2"
    ).collect()
    key = lambda r: (r[0], r[1], tuple(r[2]), r[3])  # noqa: E731
    assert len(got) == 1 and [key(r) for r in got] == [key(r) for r in want]


def test_ivf_pq_upsert_commit_logged_snapshot_isolated(spark, tmp_path):
    """write_ivf_pq_index(committed=True) opts the index into the commit
    log: the upsert publishes an atomic manifest (version 1), the grown
    index read through the log is row-identical to a plain-path upsert,
    every v0 file keeps its exact bytes ON DISK (nothing unlinked —
    superseded files await vacuum), a reader pinned to v0 still sees the
    pre-upsert index after the commit, and a writer racing on the same
    parent version loses with CommitConflict."""
    import pytest

    from cve_manager_spark.commitlog import CommitConflict, TableLog
    from cve_manager_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_upsert,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 5 != 4)
    delta = emb.where(F.col("vec_id") % 5 == 4)
    n_base, n_delta = base.count(), delta.count()

    idx, cents, books = ivf_pq_index(base, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_logged")
    write_ivf_pq_index(idx, cents, books, path, committed=True)
    log = TableLog(path)
    v0, files0 = log.snapshot()
    assert v0 == 0 and files0
    before = _file_digests(path)

    stats = ivf_pq_upsert(spark, path, delta)
    assert stats["n_inserted"] == n_delta
    assert stats["version"] == 1

    # read path resolves through the manifest: grown index, exact rows
    didx, dcents, dbooks = read_ivf_pq_index(spark, path)
    assert dcents == cents and dbooks == books
    assert didx.count() == n_base + n_delta

    # immutability: every v0 file still on disk with identical bytes
    after = _file_digests(path)
    assert set(before) <= set(after)
    assert all(after[f] == h for f, h in before.items())

    # snapshot isolation: a v0-pinned read executes post-commit and
    # still sees only the base index
    assert log.read(spark, version=0).count() == n_base

    # conflict: a writer that pinned v0 cannot publish v1 again
    with pytest.raises(CommitConflict):
        log._publish(v0, list(files0), "merge")


def test_drift_retrain_rebuilds_exactly_once_and_recovers(spark, tmp_path):
    """The drift→retrain loop (VERDICT r11 #5): a committed index
    absorbs a geometry-shifted delta through upserts; the drift report
    (computed from the index's own CDF) flags the overloaded cells;
    drift_retrain commits EXACTLY ONE overwrite@tag rebuild — an
    immediate re-run is a no-op, a below-threshold cycle is a no-op —
    and the rebuilt index is bit-identical to training fresh on the
    current corpus (deterministic trainer), so recall recovers to the
    fresh-index level by construction."""
    from cve_manager_spark.operators.similarity import (
        ivf_pq_drift_report,
        ivf_pq_drift_retrain,
        ivf_pq_index,
        ivf_pq_upsert,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 3 != 2)
    idx, cents, books = ivf_pq_index(base, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_drift")
    write_ivf_pq_index(idx, cents, books, path, committed=True)

    # inject drift: a shifted clone of a third of the corpus — new ids,
    # vectors squeezed toward a constant direction, so they pile into
    # few cells of the frozen quantizer
    delta = emb.where(F.col("vec_id") % 3 == 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(0.05) + F.lit(0.9)
        ).alias("embedding"),
    )
    n_delta = delta.count()
    assert n_delta > 0
    ivf_pq_upsert(spark, path, delta)

    rep = ivf_pq_drift_report(spark, path)
    rows = rep.collect()
    assert sum(r["n_base"] for r in rows) == base.count()
    assert sum(r["n_delta"] for r in rows) == n_delta
    assert any(r["delta_ppm"] > 300_000 for r in rows)

    corpus = base.unionByName(delta)
    out = ivf_pq_drift_retrain(spark, path, corpus)
    assert out["rebuilt"] is True and out["n_drifted_cells"] >= 1
    from cve_manager_spark.commitlog import TableLog

    log = TableLog(path)
    assert (log.last_op() or "").startswith("overwrite@drift-rebuild+q")
    v_rebuild = log.latest_version()

    # exactly once: an immediate re-run commits nothing
    again = ivf_pq_drift_retrain(spark, path, corpus)
    assert again["rebuilt"] is False
    assert log.latest_version() == v_rebuild

    # the rebuilt index == training fresh on the current corpus
    fresh_idx, fresh_cents, fresh_books = ivf_pq_index(
        corpus, n_lists=8, m=8, k_codes=16
    )
    didx, dcents, dbooks = read_ivf_pq_index(spark, path)
    assert dcents == fresh_cents and dbooks == fresh_books

    def rows_of(df):
        return {
            (r[0], r[1], tuple(r[2]), r[3])
            for r in df.select(
                "vec_id", "list_id", "pq_code", "vnorm2"
            ).collect()
        }

    assert rows_of(didx) == rows_of(fresh_idx)

    # a calm cycle (small, in-distribution delta) stays below threshold
    calm = emb.where(F.col("vec_id") % 50 == 1).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    )
    ivf_pq_upsert(spark, path, calm)
    out3 = ivf_pq_drift_retrain(
        spark, path, corpus.unionByName(calm)
    )
    assert out3["rebuilt"] is False and out3["reason"] == "below threshold"

    # Quantizer versioned WITH the data (r12 ADVICE): time travel to
    # the pre-rebuild version pairs the OLD codes with the OLD
    # centroids/books — never the new quantizer against old codes
    oidx, ocents, obooks = read_ivf_pq_index(
        spark, path, version=v_rebuild - 1
    )
    assert ocents == cents and obooks == books
    assert oidx.count() == base.count() + n_delta

    # ...and the head read resolves through the commit's qid sidecar,
    # NOT the legacy base _ivf_pq_meta.json: corrupting the base meta
    # (the old crash-between-commit-and-swap window) changes nothing
    import json as _json
    from pathlib import Path as _Path

    base_meta = _Path(path) / "_ivf_pq_meta.json"
    base_meta.write_text(
        _json.dumps({"centroids": [[0] * 64], "books": [[[0] * 64]]})
    )
    hidx, hcents, hbooks = read_ivf_pq_index(spark, path)
    assert hcents == fresh_cents and hbooks == fresh_books


def test_rollback_restores_the_matching_quantizer(spark, tmp_path):
    """r13 ADVICE: a TableLog.rollback past a drift-retrain restores
    the PRE-REBUILD codes, so the quantizer must re-resolve at the
    restore target (rollback commits record ``rollback@to=<t>``) —
    never pair rolled-back codes with the rebuild's centroids. The
    drift report re-anchors at the restored build too, and a LATER
    rebuild on top of the rollback resolves its own fresh qid."""
    from cve_manager_spark.commitlog import TableLog
    from cve_manager_spark.operators.similarity import (
        ivf_pq_drift_report,
        ivf_pq_drift_retrain,
        ivf_pq_index,
        ivf_pq_upsert,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 3 != 2)
    idx, cents, books = ivf_pq_index(base, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "ivf_pq_rb")
    write_ivf_pq_index(idx, cents, books, path, committed=True)

    delta = emb.where(F.col("vec_id") % 3 == 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(0.05) + F.lit(0.9)
        ).alias("embedding"),
    )
    ivf_pq_upsert(spark, path, delta)
    corpus = base.unionByName(delta)
    assert ivf_pq_drift_retrain(spark, path, corpus)["rebuilt"] is True
    log = TableLog(path)
    v_rebuild = log.latest_version()
    _, rb_cents, rb_books = read_ivf_pq_index(spark, path)
    assert rb_cents != cents  # the rebuild really changed the quantizer

    # rollback past the rebuild: codes AND quantizer revert together
    log.rollback(to_version=v_rebuild - 1)
    ridx, rcents, rbooks = read_ivf_pq_index(spark, path)
    assert rcents == cents and rbooks == books
    want = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in log.read(spark, version=v_rebuild - 1)
        .select("vec_id", "list_id", "pq_code").collect()
    )
    got = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in ridx.select("vec_id", "list_id", "pq_code").collect()
    )
    assert got == want

    # the drift report re-anchors at the restored build (init), so the
    # delta that motivated the rolled-away rebuild is drift AGAIN
    rep = ivf_pq_drift_report(spark, path).collect()
    assert sum(r["n_base"] for r in rep) == base.count()
    assert any(r["delta_ppm"] > 300_000 for r in rep)

    # a later rebuild on top of the rollback pairs with ITS quantizer,
    # and time travel to the rollback version still gives the old one
    out = ivf_pq_drift_retrain(spark, path, corpus)
    assert out["rebuilt"] is True
    _, hcents, hbooks = read_ivf_pq_index(spark, path)
    assert hcents == rb_cents and hbooks == rb_books  # deterministic trainer
    _, ocents, obooks = read_ivf_pq_index(
        spark, path, version=v_rebuild + 1
    )
    assert ocents == cents and obooks == books
