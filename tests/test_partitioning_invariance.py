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
    # r12: distributed ranking — rank = range-partition + local
    # row_number + driver prefix offsets; the range partitioner's
    # SAMPLED boundaries move under different input splits, so this
    # asserts the rank is exact for ANY boundary placement
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
