"""Training-corpus build pipeline: one command from raw documents to a
packed, sharded, training-ready parquet layout.

Composes the engine's corpus operators in their production order —

    quality filter → language filter → exact dedup →
    test-set decontamination → [per-source mixture quota] →
    deterministic shard + shuffle → token-budget sequence packing →
    partitioned write

— all as ONE declarative DataFrame plan: Catalyst fuses the three
filters into the scan, the dedup window and the packing window are the
only shuffles, and the final write is partitioned by shard so a trainer
reads its shard without listing the others.

Usage (any SF of the testdata layout, or any parquet with the same
documents schema):

    python -m cve_manager_spark.corpus_cli \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/corpus_out \
        --eval-input /path/to/eval_docs.parquet \
        --min-words 20 --langs en,de --budget 2048 --shards 8

Every stage is deterministic (md5 shard keys, min-id keep rule, floor
packing), so two runs over the same input produce byte-identical
shard contents — the property training-data reproducibility needs.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cve_manager_spark.operators import dedup as D
from cve_manager_spark.operators import text as T


def build_corpus(
    docs: DataFrame,
    *,
    min_words: int = 20,
    langs: tuple[str, ...] = ("en", "de"),
    eval_docs: DataFrame | None = None,
    ngram: int = 3,
    budget: int = 2048,
    shards: int = 8,
    source_budget: int | None = None,
    prefix_dedup: int | None = None,
    chunk_size: int | None = None,
    chunk_stride: int | None = None,
) -> DataFrame:
    """The full corpus plan: returns one row per kept document with
    (doc_id, lang, n_tokens, shard, seq_id), packing-ready.

    eval_docs (optional) is the held-out set to decontaminate against:
    any document sharing a word ``ngram``-gram with it is dropped. The
    eval side broadcasts (it is small by construction); everything else
    is the corpus_clean / pack_sequences shape registered in the query
    registry, here fused into one plan.

    prefix_dedup (optional) adds the dedup_prefix tier: documents whose
    first N lowercased tokens match collapse to the min doc_id — only
    the 16-byte prefix digest crosses the shuffle. chunk_size /
    chunk_stride (optional) insert the chunk_documents stage: each kept
    document explodes into sliding-window chunks (narrow map + bounded
    explode, zero shuffles) and the packer then packs CHUNKS, adding a
    chunk_id column to the output.
    """
    n_tokens = T.token_count_ws(F.col("text")).cast("bigint")
    filtered = docs.withColumn("n_tokens", n_tokens).where(
        (F.col("n_tokens") >= min_words) & F.col("lang").isin(*langs)
    )

    # exact dedup: keep the minimum doc_id per content digest
    w_dup = Window.partitionBy(F.sha2(F.col("text"), 256))
    deduped = (
        filtered.withColumn("__keep", F.min("doc_id").over(w_dup))
        .where(F.col("doc_id") == F.col("__keep"))
        .drop("__keep")
    )

    if prefix_dedup:
        pfx = F.md5(
            F.array_join(
                F.slice(T.words(F.lower(F.col("text"))), 1, prefix_dedup), " "
            )
        )
        w_pfx = Window.partitionBy(pfx)
        deduped = (
            deduped.withColumn("__keep", F.min("doc_id").over(w_pfx))
            .where(F.col("doc_id") == F.col("__keep"))
            .drop("__keep")
        )

    if eval_docs is not None:
        eval_sh = (
            eval_docs.select(F.explode(D.word_shingles(F.col("text"), ngram)).alias("s"))
            .distinct()
        )
        doc_sh = deduped.select(
            "doc_id", F.explode(D.word_shingles(F.col("text"), ngram)).alias("s")
        )
        contaminated = doc_sh.join(F.broadcast(eval_sh), "s").select("doc_id").distinct()
        deduped = deduped.join(contaminated, "doc_id", "left_anti")

    if source_budget is not None:
        # mixture quota (the mix_budget query shape): each source
        # contributes docs in deterministic md5 order until its token
        # budget is reached — a doc is kept iff it STARTS under budget.
        w_mix = (
            Window.partitionBy("source")
            .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        deduped = deduped.withColumn("__cum", F.sum("n_tokens").over(w_mix)).where(
            F.col("__cum") - F.col("n_tokens") < source_budget
        ).drop("__cum")

    if chunk_size:
        stride = chunk_stride or max(1, chunk_size * 3 // 4)
        toks = deduped.select(
            "doc_id", "lang", T.words(F.lower(F.col("text"))).alias("w")
        ).withColumn("n", F.size("w"))
        n_chunks = F.when(F.col("n") <= chunk_size, F.lit(1)).otherwise(
            F.expr(f"(n - {chunk_size} + {stride - 1}) div {stride}") + 1
        )
        ex = toks.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        )
        chunk = F.slice(F.col("w"), F.col("chunk_id") * stride + 1, chunk_size)
        units = ex.select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            "lang",
            F.size(chunk).cast("bigint").alias("n_tokens"),
        )
        key_cols = ["doc_id", "chunk_id"]
        skey = F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("chunk_id"))
        )
    else:
        units = deduped.select("doc_id", "lang", "n_tokens")
        key_cols = ["doc_id"]
        skey = F.md5(F.col("doc_id").cast("string"))

    base = units.select(
        *key_cols,
        "lang",
        "n_tokens",
        (F.ascii(F.substring(skey, 1, 1)) % shards).alias("shard"),
        skey.alias("__skey"),
    )
    w_pack = (
        Window.partitionBy("shard")
        .orderBy("__skey", *key_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w_pack)
    return base.select(
        *key_cols,
        "lang",
        "n_tokens",
        "shard",
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("seq_id"),
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    *,
    eval_path: str | None = None,
    min_words: int = 20,
    langs: tuple[str, ...] = ("en", "de"),
    ngram: int = 3,
    budget: int = 2048,
    shards: int = 8,
    source_budget: int | None = None,
    prefix_dedup: int | None = None,
    chunk_size: int | None = None,
    chunk_stride: int | None = None,
) -> dict:
    """Execute the plan, write shard-partitioned parquet + a manifest.
    Returns the manifest dict (also written as _manifest.json)."""
    docs = spark.read.parquet(input_path)
    eval_docs = spark.read.parquet(eval_path) if eval_path else None
    out = build_corpus(
        docs,
        min_words=min_words,
        langs=langs,
        eval_docs=eval_docs,
        ngram=ngram,
        budget=budget,
        shards=shards,
        source_budget=source_budget,
        prefix_dedup=prefix_dedup,
        chunk_size=chunk_size,
        chunk_stride=chunk_stride,
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(output_dir)

    written = spark.read.parquet(output_dir)
    stats = written.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_units"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("shard").alias("n_shards"),
    ).first()
    manifest = {
        "input": input_path,
        "eval_input": eval_path,
        "n_docs": stats["n_docs"],
        "n_units": stats["n_units"],
        "n_tokens": stats["n_tokens"],
        "n_shards": stats["n_shards"],
        "min_words": min_words,
        "langs": list(langs),
        "ngram": ngram,
        "budget": budget,
        "shards": shards,
        "source_budget": source_budget,
        "prefix_dedup": prefix_dedup,
        "chunk_size": chunk_size,
        "chunk_stride": chunk_stride,
    }
    with open(os.path.join(output_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Build a packed training corpus.")
    p.add_argument("--input", required=True, help="Documents parquet path.")
    p.add_argument("--output", required=True, help="Output directory.")
    p.add_argument("--eval-input", default=None, help="Held-out docs parquet to decontaminate against.")
    p.add_argument("--min-words", type=int, default=20)
    p.add_argument("--langs", default="en,de", help="Comma-separated language allowlist.")
    p.add_argument("--ngram", type=int, default=3, help="Decontamination n-gram size.")
    p.add_argument("--budget", type=int, default=2048, help="Tokens per packed sequence.")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument(
        "--source-budget",
        type=int,
        default=None,
        help="Optional per-source token quota (mixture construction): each "
        "source contributes documents in deterministic md5 order until "
        "this many tokens.",
    )
    p.add_argument(
        "--dedup-prefix",
        type=int,
        default=None,
        help="Also collapse documents sharing their first N tokens "
        "(prefix-hash dedup tier).",
    )
    p.add_argument(
        "--chunk-size",
        type=int,
        default=None,
        help="Split kept documents into sliding-window chunks of this many "
        "tokens before packing.",
    )
    p.add_argument(
        "--chunk-stride",
        type=int,
        default=None,
        help="Chunk stride in tokens (default: 3/4 of --chunk-size).",
    )
    p.add_argument("-master", dest="master", default="local[*]")
    args = p.parse_args(argv)

    from cve_manager_spark.session import get_session

    spark = get_session("corpus-build", master=args.master)
    manifest = run_pipeline(
        spark,
        args.input,
        args.output,
        eval_path=args.eval_input,
        min_words=args.min_words,
        langs=tuple(s for s in args.langs.split(",") if s),
        ngram=args.ngram,
        budget=args.budget,
        shards=args.shards,
        source_budget=args.source_budget,
        prefix_dedup=args.dedup_prefix,
        chunk_size=args.chunk_size,
        chunk_stride=args.chunk_stride,
    )
    print(json.dumps(manifest, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
