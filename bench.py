"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Each query is forced to full materialization with the noop sink (count()
would let Catalyst prune the very work being measured). Spark logs go to
stderr; stdout carries exactly the JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one per engine area — scan/filter, joins, hash agg, window,
# sessionization, dedup, similarity, text. LSH/ML paths excluded (bench
# measures the deterministic engine surface).
HEADLINE = [
    "filter_conjunction",
    "join_inner_view",
    "join_star_detail",
    "agg_groupby",
    "agg_rollup",
    "window_rank",
    "window_running",
    "sort_topk",
    "window_tumbling",
    "window_session",
    "dedup_keyed",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "knn_cosine",
    "text_tokenize_count",
    "text_quality",
    "doc_fingerprint",
    # r2 breadth: north-star pipeline + ordered-join headliners
    "text_tfidf",
    "corpus_clean",
    "dedup_clusters",
    "cdc_upsert",
    "join_asof",
    "decontaminate_ngram",
    "pack_sequences",
    "embedding_centroid",
    # r2b: profiling / feature tranche
    "inverted_index",
    "bigram_lift",
    "anomaly_zscore",
    # r2c: chunking tranche
    "chunk_documents",
    "longest_streak",
    "weighted_median",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cve_manager_spark.plans.registry import queries
    from cve_manager_spark.session import get_session

    spark = get_session("cve_manager_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    # JVM/codegen warm-up on a trivial plan (not measured).
    q["limit_1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Best-of-2 per query: the host is shared, and a single timing can be
    # inflated several-fold by background load; min-of-two is the standard
    # noise damper and still charges all real engine work.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
