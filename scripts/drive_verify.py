"""Driver-sim verification recipe, committed form.

Run OUTSIDE the repo cwd in a fresh process:

    cd /tmp && TZ=America/New_York python /root/repo/scripts/drive_verify.py

Plain SparkSession (no engine confs - proves load_table's tune() is
sufficient), entry() smoke check, then a cross-family sample of queries
collected and compared order-insensitively against their DuckDB oracles
over /root/testdata/sf0.01. Exits non-zero on any mismatch."""
import sys, os, math, datetime

sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.01"

from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").getOrCreate()

import __spark_entry__ as e

df = e.entry(spark)
n = df.count()
assert n >= 0, "entry produced negative rows?"
print(f"entry(): {n} rows, schema ok")

qs = e.queries()
orc = e.oracle_sql()
assert set(orc) <= set(qs), "oracle keys not subset of queries"
print(f"queries={len(qs)} oracles={len(orc)}")

import duckdb

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


# decimal-sum aggregate, window, timestamp filter, join, explode,
# plus representatives of the still-unverified features tranche
SAMPLE = [
    "agg_groupby",          # decimal-sum aggregate
    "window_rank",          # window
    "filter_date_range",    # timestamp filter
    "join_star_detail",     # join
    "explode_nested",       # explode
    "median_exact",         # unverified tranche
    "quantile_exact",
    "value_mad",
    "weighted_median",
    "max_concurrency",
    "triangle_count",
    "join_salted",
    "shingle_containment",
    "label_collapse_rare",
    "dq_quarantine",
    "winsorize_stats",
    "sessionize_stats",
    "user_profile",
    "dedup_normalized",
    "embedding_norm_stats",
    "weekly_order_growth",
    "iqr_outliers",
    "top_ngram_per_lang",
    "shard_balance_audit",
    "purchase_conversion_lag",
    "sql_tpch_q1",
    "events_dow_hour_heatmap",
    "dedup_ngram_jaccard",   # round-6: capped spec (df ≤ 10% mirrored in oracle)
    # round-5 session tranche representatives
    "dedup_incremental",
    "rollup_cascade",
    "dedup_simhash_det",
    "graph_kcore",
    "multimodal_audio_energy",
    "shingle_novelty",
    # round-6 tranche representatives
    "unigram_entropy_by_lang",
    "dau_wau_stickiness",
    "session_duration_hist",
    "nation_top3_customers",
    "monthly_revenue_momentum",
    "first_week_retention",
    "embedding_norm_zscore_outliers",
    "label_centroid_cosine",
    "source_vocab_overlap",
    "pq_codes",   # r7: codes reshaped to scalar INT cols (r6 driver red on array)
    # round-7 tranche representatives
    "text_simpson_diversity",
    "events_lag1_value_autocorr",
    "order_value_band_matrix",
    "discount_tax_corr",
    "label_pair_centroid_dist",
    "dedup_savings_by_source",
    # round-8 tranche (all 14 oracle-paired specs; ann_ivf_pq is rows-only)
    "decontaminate_spans",
    "quality_classifier_score",
    "quality_score_deciles",
    "corpus_quality_dup_matrix",
    "image_phash",
    "image_phash_prevalence",
    "dedup_image_phash",
    "ivf_assignments",
    "source_ngram_novelty",
    "events_user_lifespan",
    "nation_supplier_customer_ratio",
    "part_type_price_iqr",
    "orders_status_priority_matrix",
    "customer_top_decile_concentration",
    # round-9 tranche representatives (staged for the next driver window)
    "ivf_delta_assignments",
    "boilerplate_ngrams",
    "events_benford_first_digit",
    "semantic_decontamination",
    "char_window_xdoc",
    "mix_temperature",
    "minhash_estimate_error",
    "scd2_asof_lookup",
    "split_psi",
    "source_unigram_kl",
    "order_value_gini_by_segment",
    "length_ks_by_source",
    "knn_loo_accuracy",
    "cohort_ltv_matrix",
    "embedding_pca_power",
    "pca_projection_by_label",
    # round-10/10b/10c tranche representatives — every day-grain or
    # engine-division face gets a TZ-shifted fresh-process check here
    "unigram_surprisal_bands",
    "bigram_surprisal_score",
    "surprisal_contamination_interaction",
    "semantic_dedup_incremental",
    "pca_residual_norms",
    "quality_importance_sample",
    "zipf_band_slope_by_source",
    "bigram_backoff_surprisal",
    "minhash_incremental_dups",
    "ivm_rollup_delta",
    "hits_hubs_authorities",
    "hard_negative_mining",
    "pq_reconstruction_error",
    "countmin_estimate_error",
    "bloom_fp_audit",
    "seasonal_decompose_dow",
    "rolling_7d_median_events",
    "dau_jaccard_consecutive",
    # round-11 additions: quantile sketch + privacy trio closer
    "logbucket_quantile_error",
    "t_closeness_audit",
    "kmv_set_ops_error",
    "seasonal_naive_backtest",
    "join_cardinality_audit",
    "timetravel_changes",
]
fails = []
for name in SAMPLE:
    if name not in orc:
        print(f"{name}: no oracle (skipped)")
        continue
    sdf = qs[name](spark, SF)
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(norm(r[c]) for c in cols) for r in sdf.collect()
    )
    res = con.execute(orc[name]).fetchall()
    ocols = sorted(d[0] for d in con.description)
    idx = [list(d[0] for d in con.description).index(c) for c in ocols]
    orows = sorted(tuple(norm(r[i]) for i in idx) for r in res)
    ok_cols = cols == ocols
    ok_rows = srows == orows
    status = "OK" if (ok_cols and ok_rows) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name}: FAIL cols_match={ok_cols} rows {len(srows)} vs {len(orows)}")
        if not ok_cols:
            print("  spark cols:", cols, " oracle cols:", ocols)
        for a, b in list(zip(srows, orows))[:3]:
            if a != b:
                print("  spark:", a)
                print("  oracle:", b)
    else:
        print(f"{name}: OK ({len(srows)} rows)")

spark.stop()
if fails:
    print("FAILURES:", fails)
    sys.exit(1)
print("VERIFY PASS")
