"""Regenerate PLANS.md: formatted physical plans for flagship queries,
with the scale-relevant features called out. Run from the repo root:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP = {
    "filter_conjunction": "all predicates pushed into the parquet scan; 4-column pruned read",
    "join_inner_view": "broadcast hash join, filter pushed below the join",
    "join_star_detail": "3-way star: every dimension broadcast, zero shuffle",
    "agg_groupby": "partial (map-side) + final hash aggregation; the leading round-robin exchange is the fan_out guard for single-row-group local files (absent at scale)",
    "window_rank": "single exchange on the window partition key",
    "sort_topk": "TakeOrderedAndProject: per-partition top-k, no global sort",
    "dedup_ngram_jaccard": "shingle-bucketed pair join with size-ratio pruning",
    "knn_cosine": "broadcast query vector; narrow projection + top-k",
    "window_tumbling": "time-bucketed aggregation (streaming twin shares the expression)",
    "dedup_embedding": "banded-LSH near-dup: GEMM signature pass, equi-join on (band, key), Arrow-batched exact verify — no nested-loop join",
    "window_ntile": "ntile hash-partitioned on o_orderpriority (no single-partition sort)",
    "events_retention": "distinct (hour,user) self-join on the user key; aggregate bounded by #hours",
    "stratified_sample": "broadcast rates dimension; md5 shard predicate evaluated in the scan stage",
    "decontaminate_ngram": "eval-set shingles broadcast; corpus narrow scan+explode; one per-doc count shuffle",
    "pack_sequences": "running-total window hash-partitioned on shard — no global sort",
    "embedding_centroid": "posexplode then partial+final hash agg: shuffle bounded by labels × dims",
    "knn_join_multi": "query batch broadcast; WindowGroupLimit pushes top-3 below the exchange",
    "fill_gaps": "calendar grid generated and broadcast; only the daily count touches data scale",
    "inverted_index": "per-doc distinct before explode; ObjectHashAggregate with map-side partials; head-capped postings",
    "bigram_lift": "vocab-sized unigram/total dims broadcast; only the bigram count shuffles",
    "anomaly_zscore": "one integer-moment pass; tiny per-type stats broadcast back — no second shuffle",
    "fuzzy_pairs_levenshtein": "blocked (brand, first-token) equi-join; length-bound prune ahead of the edit-distance DP",
    "corr_regress": "one-pass OLS: six exact decimal moment sums partial-agg'd; six numbers per group cross the shuffle",
    "heavy_hitters": "pre-aggregated to (type,user) rows; WindowGroupLimit prunes to candidates before the shuffle",
    "chunk_documents": "sliding-window chunking: narrow map + bounded explode, zero exchanges",
    "dedup_prefix": "prefix-hash dedup: only the 16-byte md5 digest crosses the single partial-agg'd shuffle",
    "max_concurrency": "+1/-1 sweep sharded into (type, hour-bucket) panes; pane deltas prefix-summed for the carry-in — no low-cardinality window over raw rows",
    "dq_checks": "five constraint checks; orders checks fused into one conditional-agg scan; orphan check is a LEFT ANTI join",
    "weighted_median": "per-(flag, qty) weight hash-agg + in-row histogram fold — zero Window/Sort nodes",
    "median_exact": "per-(flag, value) count hash-agg + in-row rank-select fold — zero Window/Sort nodes",
    "value_mad": "two rank-selection passes whose windows sort the aggregated histogram (bounded by the milli-grid), never raw events",
    "join_salted": "salted fact join: deterministic xxhash64 salt on the fact side, dim replicated buckets-wide; shuffle key is (orderkey, salt)",
    "winsorize_stats": "p05/p95 + clipped sum all from the (type, milli-value) histogram — one data-sized shuffle of triples",
    "sessionize_stats": "gap sessionization: every window and the session aggregate share one user-keyed exchange",
    "vocab_coverage": "rank window and coverage aggregate both over the vocabulary-sized count relation",
    "sql_tpch_q1": "raw ANSI SQL through spark.sql — Catalyst plans the same partial+final hash aggregate as the DataFrame twin",
    "triangle_count": "r5/r14: per-order pairs via double explode over the sorted part set (no self-join, no struct-array flatten); exploded adjacency joins adj once; degree-ordered intersect — wedges never materialized",
    "shingle_containment": "asymmetric containment via shingle-hash equi-join buckets; r5: df ≤ 10% stop-shingle cap ahead of the pair join (oracle-mirrored) — hot-bucket blowup bounded at (0.1N)²",
    "sql_tpch_q3": "3-way star + top-10: filtered customer broadcast, both date filters pushed, TakeOrderedAndProject (no global sort)",
    "sql_tpch_q5": "6-way join with non-key equality (c_nationkey=s_nationkey): region filter pruned through the broadcast chain before the fact join",
    "dedup_ngram_jaccard": "r6: stop-shingle cap (df \u2264 10%, oracle-mirrored) as a broadcast ANTI-join against the bounded stop set; shingle cache persisted hash-partitioned+sorted on shingle_h so the pair join reads it exchange-free",
    "dau_wau_stickiness": "windowed-distinct via explode-offsets: each (day,user) row replicated to its 7 trailing windows \u2014 a hash-partitioned COUNT(DISTINCT) replaces the range self-join nested loop",
    "source_vocab_overlap": "distinct (source,word) relation built once; pair join word-bucketed like the shingle joins; vocabulary sizes broadcast back",
    "nation_top3_customers": "star with broadcast dims + exact-decimal revenue; rank window partitioned by nation with (revenue DESC, custkey) total order",
    "embedding_norm_zscore_outliers": "exact integer norms in-row; corpus moments as ONE broadcast stats row (decimal second moment) \u2014 no second data-sized pass",
    "events_lag1_value_autocorr": "lag window and partial+final moment aggregates share ONE event_type exchange; corr from five decimal moment sums",
    "events_daily_top_user_share": "rank/total windows sort a day-keyed exchange over the (day,user) pre-aggregate \u2014 bounded by actives, never raw events",
    "dedup_savings_by_source": "keeper id via digest-grain aggregate joined back on md5 (streams; a window would buffer whole duplicate clusters)",
    "sql_tpch_q6": "joinless scan-filter-aggregate: all predicates pushed, 4 of 11 lineitem columns read",
    "sql_tpch_q18": "aggregate-then-join: HAVING on the grouped relation, tiny survivor set broadcast — the fact shuffles once, for its own aggregate",
    "minhash_band_stats": "LSH capacity planning without a join: signature pass + two stacked aggregates cost the banding scheme before any pair exists",
    "customer_rfm": "ntile windows over the customer-grain AGGREGATE (fact reduced first); custkey completes every order — no rank ties",
    "events_burst_minutes": "minute-grain pre-aggregation bounds the window input by time; RANGE frame over integer minutes handles sparse gaps; integer cross-multiplied threshold",
    "embedding_dim_stats": "posexplode + partial/final hash agg on a 64-key space; micro-unit quantization before the sum keeps it exact integer",
    "graph_degree_assortativity": "degree aggregates broadcast back onto the edge list; six exact decimal moments cross the last exchange",
    "sql_tpch_q7": "nation dim joined twice under different roles, both copies broadcast; filters prune customer AND supplier sides before the fact join",
    "sql_tpch_q22": "scalar-subquery average broadcast as a 1-row cross join; never-ordered check is a LEFT ANTI join (no null-trapped NOT IN)",
    "bm25_topk": "in-row tf/dl via list HOFs (no token explode); one broadcast stats row; TakeOrderedAndProject top-20",
    "orders_pareto": "all three windows share one priority-keyed exchange over the pre-aggregated spend relation",
    "dedup_cascade_funnel": "4 distinct-counts in ONE scan (Expand), stack unpivot on the single aggregate row",
    "stop_shingle_report": "map-side partial count on the shingle; broadcast doc total; TakeOrderedAndProject top-50",
    "sql_tpch_q2": "correlated MIN decorrelated: per-part MIN aggregate joined back on the part key (acctbal equality as residual); supplier chain broadcast; TakeOrderedAndProject",
    "sql_tpch_q9": "5-way fact-through-dims with LIKE-pruned part broadcast; profit legs split into exact decimal revenue + integer-cents cost",
    "sql_tpch_q13": "LEFT OUTER with the filter inside the join condition (zero-order customers preserved); two chained hash aggregates",
    "sql_tpch_q17": "correlated AVG decorrelated to a per-part (count,sum) aggregate broadcast back; cross-multiplied integer predicate as join residual",
    "sql_tpch_q21": "EXISTS and NOT EXISTS as LEFT SEMI + LEFT ANTI against one shared base relation; nation broadcast into the supplier probe",
    "embedding_kmeans": "map-side assignment against centroid literals (no join); update = one k·d-row hash aggregate; driver sees k·d scalars per iteration",
    "semantic_dedup": "SemDeDup: pair join is an equi-join on the k-means cluster id; cosine test as 128-bit integer residual — no all-pairs nested loop",
    "dedup_incremental": "one tagged shingle scan over snapshot+batch; shared df cap; new-vs-old equi-join only (snapshot never self-paired); digest-only exact-dup shuffle",
    "shingle_novelty": "first-seen MIN per shingle and the join-back share one shingle-keyed exchange layout; per-doc rollup in exact integer ppm",
    "rollup_cascade": "one fact scan; three chained partial+final aggregates — each exchange carries the previous level's cardinality, never raw events",
    "dedup_simhash_det": "in-row md5-bit fingerprint fold (no signature shuffle); banded 4x16-bit equi-join; in-row Hamming verify",
    "multimodal_audio_energy": "Arrow-batched mapInPandas windows before any wide op; output grain is (doc, frame), no shuffle until a consumer asks",
    "split_drift_topwords": "r9 re-plan: top-20 corpus words via TakeOrderedAndProject (per-partition 20-row heaps) — the row_number vocabulary Window is gone; split totals ride one broadcast row",
    "unigram_surprisal_bands": "LM surprisal dial: two token-keyed shuffles (count + instance join), corpus total as a broadcast 1-row cross join, integer log2 in-row via bin()-length",
    "semantic_dedup_incremental": "frozen-cell SemDeDup: both assignment passes map-side against centroid literals; candidates only delta x base through the cluster equi-join",
    "minhash_incremental_dups": "directional (band,key) equi-join of new signatures against old; signature pass is one hash aggregate of 32 MINs; exact integer Jaccard verify",
    "hits_hubs_authorities": "two O(|E|) join+aggregate pairs per iteration; block-floating-point normalize reads one broadcast max row; lineage checkpoint-truncated",
    "boilerplate_segments_topk": "segment digests built in-row (indexed transform, md5 shuffle key); top-20 via TakeOrderedAndProject, never a vocabulary window",
    "timetravel_snapshot_diff": "both sides are pinned-manifest file scans reduced to (key, digest) before the full outer sort-merge join — 16-byte digests cross the shuffle, never payloads",
    "timetravel_version_counts": "one metadata-pruned count per manifest (partial+final), stacked by a joinless union — k tiny rows for k versions",
    "embedding_drift_buckets": "map-side integer projection against frozen (mu, v) literals; ONE 1-row stats aggregate broadcast back (cross build-right); 16-key partial+final histogram",
    "semantic_dedup_frozen_keep": "frozen-codebook assignment map-side; keep-lowest-id drop test as a cell-keyed equi self-join; per-cell roll-up — never all-pairs, never a retrain",
    "hash_sample_quantile_error": "one TakeOrderedAndProject(256) digest pass + one broadcast conditional-aggregate pass — two table scans regardless of quantile count",
    "sample_size_quantile_sweep": "nested md5 sample: ONE TakeOrderedAndProject(1024) serves every k; all 9 (k,q) cells audit in one broadcast conditional-aggregate pass",
    "drift_escape_report": "reference bounds ride one 1-row broadcast back over the current-window projection; two scans, no shuffle join, no window",
    "dedup_modality_agreement": "digest groupBy + equi join-back vs banded directional MinHash join, cross-tabbed by a 4-key aggregate — no cartesian anywhere",
    "pca_topr_residual_norms": "top-1/2/3 deflation ladder entirely in-row over ONE scan: three stacked projection subtractions against frozen direction literals; one label-grain aggregate",
    "logbucket_quantile_error": "sketch side shuffles <=64 (type,bucket,count) triples per group (partial+final agg); exact side rides the domain-bounded value histogram; 5-row broadcast join-back",
    "t_closeness_audit": "one fact group-by; 5-row global distribution + 1-row total broadcast onto the dimension-bounded grid; EMD cumsum windows over groups x 5 rows, never facts",
    "timetravel_changes": "manifest-delta CDF: only files entering/leaving the manifest scan; keyed full-outer classify with rewritten-unchanged rows cancelled — cost rides changed data, never the table",
    "timetravel_partition_evolution": "r12: mixed-layout snapshot read — one scan per path-declared layout group (hive group recovers bucket from directories, flat group from data), unioned and projected to manifest schema order",
    "join_view_two_stream": "r12: drained two-stream IVM view — per-bucket-newest overlay composition; the streaming maintenance already paid the joins, the read is a pruned parquet scan",
    "epoch_shuffle_blocks": "r13: per-epoch md5 rank via PURE digest-prefix buckets (hashpartitioning(bkt), no sampled RangePartitioner — deterministic across actions/retries); per-bucket row_number + driver prefix offsets; block arithmetic all-integer",
    "graph_bfs_hops": "r12: level-synchronous BFS — per round, frontier-only hash join against checkpointed edges + anti-join visited; round count = hop bound, never diameter",
    "timetravel_pruned_scan": "r12: zone-map data skipping — manifest files pruned driver-side on commit-time [min,max] stats before any listing; kept files still carry the filter",
    "dedup_minhash_det": "r13: skew-safe banded pair join — buckets ≤ cap through the plain equi-join, oversized buckets through a salt×salt grid (each task owns ≤ (m/salt)² pairs, never m²); exact-Jaccard verify on distinct candidates",
    "sample_bottomk_stratified": "r13: per-stratum bottom-k-by-md5 — one window rank hash-partitioned on the stratum key, never a global sort; batch twin of the eighth sketch state",
    "catalog_txn_snapshot": "r13: consistent multi-table read through the catalog log — each table scans exactly its pinned manifest's files; the join sees one atomic (facts, dim) version pair",
    "timetravel_evolution_cdf": "r13: CDF across a partition-evolution boundary — flat from-side vs mixed-layout to-side aligned per path-declared layout group; keyed net diff, rewritten-unchanged rows cancel across layouts",
    "timetravel_dv_delete": "r14: merge-on-read read — broadcast LeftAnti of the position-delete relation (size manifest-known) over the pruned manifest scan; no data-side exchange, no sort-merge",
    "timetravel_dv_cdf": "r14: DV-aware CDF — position-set diff per common file, content read only for files the added entries name; keyed full-outer classifier is the sole sort-merge",
    "timetravel_dv_update": "r14: MOR UPDATE read — old images anti-joined away by position, new images unioned from fresh part files; one broadcast anti-join over the scan",
}


def main() -> None:
    from cve_manager_spark.plans.registry import collect
    from cve_manager_spark.session import get_session

    spark = get_session("dump-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = collect()
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — formatted physical plans for flagship queries",
        "",
        "Generated by `scripts/dump_plans.py` at sf0.01. These are the plans",
        "the engine is *designed* to produce; tests/test_plans_shape.py",
        "asserts the load-bearing properties so regressions fail CI.",
        "",
    ]
    for name, note in FLAGSHIP.items():
        df = specs[name].build(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out += [f"## {name}", "", f"*{note}*", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written:", len(FLAGSHIP), "plans")


if __name__ == "__main__":
    main()
