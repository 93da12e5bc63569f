"""Sketch invariants: the properties that make sketches the cardinality
path at 100 TB are asserted, not assumed.

- MERGEABILITY: unioning per-shard HLL sketches must give the IDENTICAL
  estimate as sketching the whole input in one pass (register-wise max
  is associative/commutative/idempotent — at equal lgConfigK the union
  is lossless). This is what lets a pipeline keep per-partition/day
  sketches and answer any rollup without re-reading rows.
- ACCURACY: the estimate lands within the HLL error envelope of the
  exact distinct count (lgConfigK=12 → ~1.6% RSE; 5% is ≳3 sigma).
- SHARDING-INVARIANCE: the merged estimate does not depend on WHICH
  key the shards were cut on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cve_manager_spark.plans.registry import collect
from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_ORACLE

SPECS = collect()


def test_hll_merge_is_lossless_and_accurate(spark):
    row = SPECS["agg_hll_mergeable"].build(spark, SF_ORACLE).collect()[0]
    assert row["merge_lossless"] is True
    assert row["est_merged"] == row["est_direct"]
    exact = row["exact_users"]
    assert abs(row["est_merged"] - exact) <= 0.05 * exact, row


def test_hll_merge_invariant_to_shard_key(spark):
    ev = load_table(spark, SF_ORACLE, "events")

    def merged_est(shard_key):
        return (
            ev.groupBy(shard_key)
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
            .collect()[0]["e"]
        )

    by_type = merged_est("event_type")
    by_hour = merged_est(F.date_trunc("hour", "ts").alias("h"))
    by_mod = merged_est((F.col("event_id") % 7).alias("m"))
    assert by_type == by_hour == by_mod


def test_count_min_sketch_bounds_heavy_hitter_error(spark):
    """CMS companion: estimated frequency of the top event type is an
    overestimate bounded by eps·N (one-sided error — the property that
    makes CMS usable for heavy-hitter prefilters at scale)."""
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    eps, conf, seed = 0.01, 0.99, 42
    sk_bytes = ev.agg(
        F.count_min_sketch(
            "event_type", F.lit(eps), F.lit(conf), F.lit(seed)
        ).alias("sk")
    ).collect()[0]["sk"]
    assert sk_bytes is not None
    jvm_sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_bytes)
    )
    for k, n in exact.items():
        est = jvm_sk.estimateCount(k)
        assert n <= est <= n + eps * n_total, (k, n, est)


def test_logbucket_estimate_bounds_hold_everywhere(spark):
    """The log2-bucket quantile estimate is the bucket's UPPER bound,
    so est >= exact and est <= 2*exact + 1 (one bucket's width) for
    every group and every quantile — the guarantee the audit prices,
    asserted as a theorem over the data rather than spot-checked."""
    df = collect()["logbucket_quantile_error"].build(spark, SF_ORACLE)
    for r in df.collect():
        for p in ("p50", "p90", "p99"):
            exact, est = r[f"{p}_exact"], r[f"{p}_est"]
            assert est >= exact, (r["event_type"], p, exact, est)
            assert est <= 2 * exact + 1, (r["event_type"], p, exact, est)


def test_kmv_sketch_is_exact_below_k(spark, tmp_path):
    """KMV theorem: a sketch holding its whole set (k_eff < k)
    estimates EXACTLY, for the base sets AND their union AND the
    intersection — so small groups never pay sketch error. Proven by
    thinning the element universe below k=64 (2 users x <=30 days =
    <=60 possible user-days at ANY scale factor): every estimate
    column must equal its exact column."""
    ev = load_table(spark, SF_ORACLE, "events")
    thin_dir = str(tmp_path / "thin")
    ev.where(F.col("user_id") < 2).write.parquet(f"{thin_dir}/events.parquet")
    r = collect()["kmv_set_ops_error"].build(spark, thin_dir).head()
    assert r["est_a"] == r["n_a_exact"]
    assert r["est_b"] == r["n_b_exact"]
    assert r["est_union"] == r["n_union_exact"]
    assert r["est_inter"] == r["n_inter_exact"]
