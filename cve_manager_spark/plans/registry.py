"""Driver registry: every implemented query name → (Spark builder, oracle SQL).

`__spark_entry__.py` re-exports this as ``queries()`` / ``oracle_sql()``.
Modules append their QuerySpecs at import time; collect() asserts name
uniqueness so a typo can't silently shadow a query.
"""

from __future__ import annotations

import glob
import json
import os

from cve_manager_spark.plans.spec import Builder, QuerySpec


# Every query family the registry must expose. A missing module is a hard
# error: silently dropping a family would shrink queries()/oracle_sql() with
# no signal and under-report coverage (numpy/pandas/pyspark.ml are baked into
# the runtime, so an ImportError here is always a real defect).
EXPECTED_QUERY_COUNT = 397

# Queries the round-1 driver gate hash-verified (CORRECTNESS_r01.json, all
# green). The driver samples a PREFIX of the registry, so ordering is a
# verification-priority queue: oracle-paired queries with no driver verdict
# yet come first, already-green ones rotate behind them, and rows-only specs
# (oracle=None — the driver can only count rows) go last. Append each
# round's newly green names so the next round's window promotes whatever is
# still unverified.
DRIVER_GREEN = frozenset({
    "agg_conditional",
    "agg_count",
    "agg_cube",
    "agg_distinct",
    "agg_groupby",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_salted",
    "agg_stats",
    "agg_string_concat",
    "anomaly_zscore",
    "argmax_per_key",
    "array_set_ops",
    "attribution_last_touch",
    "basket_pairs",
    "bigram_lift",
    "bm25_topk",
    "cast_date",
    "cast_to_string",
    "cdc_upsert",
    "chunk_documents",
    "corpus_clean",
    "corpus_profile",
    "corr_regress",
    "cosine_threshold",
    "cumulative_unique_users",
    "customer_order_recency",
    "customer_rfm",
    "decontaminate_ngram",
    "dedup_cascade_funnel",
    "dedup_cluster_rep",
    "dedup_clusters",
    "dedup_embedding",
    "dedup_exact",
    "dedup_keyed",
    "dedup_minhash_det",
    "dedup_ngram_jaccard",
    "dedup_normalized",
    "dedup_prefix",
    "doc_fingerprint",
    "doc_length_histogram",
    "dq_checks",
    "dq_freshness",
    "dq_quarantine",
    "dup_rate_by_source",
    "embedding_bucket_histogram",
    "embedding_centroid",
    "embedding_dim_stats",
    "embedding_norm_stats",
    "embedding_quantize",
    "error_rate_hourly",
    "event_transitions",
    "event_type_share",
    "events_burst_minutes",
    "events_debounce",
    "events_dow_hour_heatmap",
    "events_funnel",
    "events_interarrival_hist",
    "events_lag_gap",
    "events_retention",
    "events_top_user_per_type_day",
    "explode_conditional",
    "explode_nested",
    "explode_outer_nulls",
    "fill_gaps",
    "filter_conjunction",
    "filter_date_range",
    "filter_eq",
    "filter_eq_int",
    "filter_like",
    "filter_or_threshold",
    "fuzzy_pairs_levenshtein",
    "graph_degree_assortativity",
    "graph_degree_hist",
    "group_sample_topn",
    "grouped_median_pandas",
    "heavy_hitters",
    "histogram_fixed",
    "inverted_index",
    "iqr_outliers",
    "join_anti",
    "join_asof",
    "join_full_reconcile",
    "join_inner_view",
    "join_interval",
    "join_left_lookup",
    "join_null_safe",
    "join_range_pred",
    "join_salted",
    "join_semi",
    "join_star_detail",
    "json_extract",
    "json_schema_infer",
    "knn_cosine",
    "knn_cosine_pandas",
    "knn_join_multi",
    "knn_per_label",
    "label_collapse_rare",
    "lang_source_gini",
    "late_data_audit",
    "limit_1",
    "longest_streak",
    "max_concurrency",
    "median_exact",
    "minhash_band_stats",
    "mix_budget",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_thumbnail",
    "nation_trade_balance",
    "near_dup_source_matrix",
    "nearest_event",
    "null_fallback",
    "order_size_histogram",
    "orders_backlog_aging",
    "orders_monthly_yoy",
    "orders_pareto",
    "pack_sequences",
    "pagerank_links",
    "part_min_price_per_type",
    "part_price_spread",
    "part_type_share",
    "posexplode_index",
    "project_cols",
    "project_nested",
    "purchase_conversion_lag",
    "quantile_exact",
    "regexp_extract_numbers",
    "retention_cohort",
    "rolling_active_users",
    "sample_hash",
    "scd2_intervals",
    "sessionize_stats",
    "set_except",
    "set_ops",
    "shard_balance_audit",
    "shingle_containment",
    "shipping_delay_stats",
    "snapshot_diff",
    "sort_topk",
    "sql_tpch_q1",
    "sql_tpch_q10",
    "sql_tpch_q12lite",
    "sql_tpch_q14",
    "sql_tpch_q18",
    "sql_tpch_q19",
    "sql_tpch_q3",
    "sql_tpch_q4",
    "sql_tpch_q5",
    "sql_tpch_q6",
    "stop_shingle_report",
    "stopword_profile",
    "str_concat_fold",
    "str_isdigit",
    "str_replace",
    "str_strip_prefix",
    "stratified_sample",
    "supplier_balance_decile",
    "supplier_coverage",
    "table_profile",
    "text_char_class_profile",
    "text_hapax_rate",
    "text_lang_id",
    "text_ngram_freq",
    "text_pii_mask",
    "text_quality",
    "text_repetition_ratio",
    "text_tfidf",
    "text_tokenize_count",
    "text_top_terms",
    "text_ttr_by_source",
    "token_count",
    "token_len_histogram",
    "top_customer_by_priority",
    "top_ngram_per_lang",
    "triangle_count",
    "union_all",
    "unpivot_melt",
    "user_profile",
    "user_type_gini",
    "value_mad",
    "vocab_coverage",
    "vocab_growth_curve",
    "weekly_order_growth",
    "weighted_median",
    "window_first_last",
    "window_ntile",
    "window_percent_rank",
    "window_range_frame",
    "window_rank",
    "window_running",
    "window_session",
    "window_sliding",
    "window_tumbling",
    "winsorize_stats",
    "wma_trailing",
})


def driver_green() -> frozenset[str]:
    """DRIVER_GREEN plus every hash-green name found in the repo's
    CORRECTNESS_r*.json reports at call time.

    The static set is the committed provenance; reading the reports live
    removes the round-boundary failure mode where the driver re-verifies
    an already-green window because the fold-in script didn't run between
    rounds (this cost round 3 its entire verification budget). Repo root
    is resolved relative to this file; unreadable reports are skipped."""
    names = set(DRIVER_GREEN)
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if isinstance(r, dict) and r.get("hash_match") is True:
                names.add(name)
    return frozenset(names)


def _all_specs() -> list[QuerySpec]:
    from cve_manager_spark.plans import analytics as analytics_mod
    from cve_manager_spark.plans import corpus as corpus_mod
    from cve_manager_spark.plans import events as events_mod
    from cve_manager_spark.plans import features as features_mod
    from cve_manager_spark.plans import pipeline as pipeline_mod
    from cve_manager_spark.plans import relational
    from cve_manager_spark.plans import round6 as round6_mod
    from cve_manager_spark.plans import round7 as round7_mod
    from cve_manager_spark.plans import round8 as round8_mod
    from cve_manager_spark.plans import round8b as round8b_mod
    from cve_manager_spark.plans import round8c as round8c_mod
    from cve_manager_spark.plans import round9 as round9_mod
    from cve_manager_spark.plans import round9b as round9b_mod
    from cve_manager_spark.plans import round9c as round9c_mod
    from cve_manager_spark.plans import round9d as round9d_mod
    from cve_manager_spark.plans import round10 as round10_mod
    from cve_manager_spark.plans import round10b as round10b_mod
    from cve_manager_spark.plans import round10c as round10c_mod
    from cve_manager_spark.plans import semantic as semantic_mod

    in_module_order = (
        corpus_mod.SPECS
        + pipeline_mod.SPECS
        + events_mod.SPECS
        + relational.SPECS
        + features_mod.SPECS
        + analytics_mod.SPECS
        + semantic_mod.SPECS
        + round6_mod.SPECS
        + round7_mod.SPECS
        + round8_mod.SPECS
        + round8b_mod.SPECS
        + round8c_mod.SPECS
        + round9_mod.SPECS
        + round9b_mod.SPECS
        + round9c_mod.SPECS
        + round9d_mod.SPECS
        + round10_mod.SPECS
        + round10b_mod.SPECS
        + round10c_mod.SPECS
    )

    green = driver_green()

    def key(spec: QuerySpec) -> tuple[int, int]:
        if spec.oracle is None:
            tier = 2  # rows-only: a driver slot adds no hash verdict
        else:
            tier = 1 if spec.name in green else 0
        # priority queues later-added specs behind older ones still waiting
        # for their first driver verdict (spec.py QuerySpec.priority)
        return (tier, spec.priority)

    specs = sorted(in_module_order, key=key)  # stable: module order within key
    if len(specs) != EXPECTED_QUERY_COUNT:
        raise RuntimeError(
            f"registry expected {EXPECTED_QUERY_COUNT} queries, found {len(specs)} — "
            "a module silently lost specs (update EXPECTED_QUERY_COUNT only with "
            "an intentional registry change)"
        )
    return specs


def collect() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for spec in _all_specs():
        if spec.name in out:
            raise ValueError(f"duplicate query name: {spec.name}")
        out[spec.name] = spec
    return out


def queries() -> dict[str, Builder]:
    return {name: spec.build for name, spec in collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in collect().items() if spec.oracle is not None}
