"""End-to-end corpus pipeline (corpus_cli): filter → dedup →
decontaminate → shard → pack → partitioned write, with the invariants a
training-data consumer relies on asserted on the written output."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cve_manager_spark.corpus_cli import build_corpus, run_pipeline
from cve_manager_spark.operators import dedup as D
from cve_manager_spark.operators import text as T
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_ORACLE

BUDGET = 512


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus_out")
    eval_dir = str(tmp_path / "eval_docs")
    docs = load_table(spark, SF_ORACLE, "documents")
    docs.where(F.col("doc_id") % 97 == 0).write.parquet(eval_dir)

    manifest = run_pipeline(
        spark,
        f"{SF_ORACLE}/documents.parquet",
        out,
        eval_path=eval_dir,
        min_words=20,
        langs=("en", "de"),
        budget=BUDGET,
        shards=8,
    )
    assert os.path.exists(os.path.join(out, "_manifest.json"))
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest

    written = spark.read.parquet(out)
    kept = {r["doc_id"] for r in written.select("doc_id").collect()}
    assert kept and manifest["n_docs"] == len(kept)

    # --- filter invariants, recomputed independently on the source table
    meta = docs.select(
        "doc_id",
        "lang",
        "text",
        T.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens"),
    ).collect()
    by_id = {r["doc_id"]: r for r in meta}
    for d in kept:
        assert by_id[d]["lang"] in ("en", "de")
        assert by_id[d]["n_tokens"] >= 20

    # exact dedup: no two kept docs share text; dropped dups have a kept twin
    assert len({by_id[d]["text"] for d in kept}) == len(kept)

    # decontamination: no kept doc shares a 3-gram with the eval set
    eval_sh = (
        spark.read.parquet(eval_dir)
        .select(F.explode(D.word_shingles(F.col("text"), 3)).alias("s"))
        .distinct()
    )
    leak = (
        written.join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.explode(D.word_shingles(F.col("text"), 3)).alias("s"))
        .join(eval_sh, "s")
    )
    assert leak.count() == 0

    # packing: within each (shard, seq), the token total fits the budget
    # unless the sequence is a single over-budget document
    packs = (
        written.groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in packs:
        assert r["tot"] < BUDGET + max(
            by_id[d]["n_tokens"] for d in kept
        ), "sequence wildly over budget"
    # seq ids are dense from 0 within each shard
    for shard, seqs in [
        (s, sorted(r["seq_id"] for r in packs if r["shard"] == s))
        for s in {r["shard"] for r in packs}
    ]:
        assert seqs[0] == 0 and seqs == list(range(len(seqs)))


def test_pipeline_is_deterministic(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = build_corpus(docs, budget=BUDGET).orderBy("doc_id").collect()
    b = build_corpus(docs, budget=BUDGET).orderBy("doc_id").collect()
    assert a == b


def test_source_budget_mixture_quota(spark):
    """--source-budget applies the mix_budget rule after dedup: within each
    source, docs are taken in (md5(doc_id), doc_id) order while the
    running total STARTS under budget. Differential: recompute the
    expected kept set driver-side from the unbudgeted pipeline output."""
    import hashlib

    docs = load_table(spark, SF_ORACLE, "documents")
    unbudgeted = build_corpus(docs, min_words=20, langs=("en", "de"), budget=BUDGET)
    budgeted = build_corpus(
        docs, min_words=20, langs=("en", "de"), budget=BUDGET, source_budget=200
    )

    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    cand = [
        (src[r["doc_id"]], hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
         r["doc_id"], r["n_tokens"])
        for r in unbudgeted.select("doc_id", "n_tokens").collect()
    ]
    expected = set()
    by_source: dict[str, int] = {}
    for source, _h, doc_id, n_tokens in sorted(cand):
        start = by_source.get(source, 0)
        if start < 200:
            expected.add(doc_id)
        by_source[source] = start + n_tokens

    kept = {r["doc_id"] for r in budgeted.select("doc_id").collect()}
    assert kept == expected
    assert kept < {r["doc_id"] for r in unbudgeted.select("doc_id").collect()}
