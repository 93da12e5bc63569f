"""Driver registry: every implemented query name → (Spark builder, oracle SQL).

`__spark_entry__.py` re-exports this as ``queries()`` / ``oracle_sql()``.
Modules append their QuerySpecs at import time; collect() asserts name
uniqueness so a typo can't silently shadow a query.
"""

from __future__ import annotations

from cve_manager_spark.plans.spec import Builder, QuerySpec


# Every query family the registry must expose. A missing module is a hard
# error: silently dropping a family would shrink queries()/oracle_sql() with
# no signal and under-report coverage (numpy/pandas/pyspark.ml are baked into
# the runtime, so an ImportError here is always a real defect).
EXPECTED_QUERY_COUNT = 138

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
    "agg_pivot",
    "agg_rollup",
    "agg_salted",
    "agg_stats",
    "cast_date",
    "cast_to_string",
    "cdc_upsert",
    "dedup_keyed",
    "event_type_share",
    "explode_conditional",
    "explode_nested",
    "explode_outer_nulls",
    "filter_conjunction",
    "filter_date_range",
    "filter_eq",
    "filter_eq_int",
    "filter_like",
    "filter_or_threshold",
    "join_anti",
    "join_asof",
    "join_inner_view",
    "join_left_lookup",
    "join_range_pred",
    "join_semi",
    "join_star_detail",
    "limit_1",
    "null_fallback",
    "project_cols",
    "project_nested",
    "set_except",
    "set_ops",
    "sort_topk",
    "str_concat_fold",
    "str_isdigit",
    "str_replace",
    "str_strip_prefix",
    "union_all",
    "unpivot_melt",
    "window_ntile",
    "window_rank",
    "window_running",
    "window_session",
    "window_tumbling",
})


def _all_specs() -> list[QuerySpec]:
    from cve_manager_spark.plans import corpus as corpus_mod
    from cve_manager_spark.plans import events as events_mod
    from cve_manager_spark.plans import features as features_mod
    from cve_manager_spark.plans import pipeline as pipeline_mod
    from cve_manager_spark.plans import relational

    in_module_order = (
        corpus_mod.SPECS
        + pipeline_mod.SPECS
        + events_mod.SPECS
        + relational.SPECS
        + features_mod.SPECS
    )

    def key(spec: QuerySpec) -> tuple[int, int]:
        if spec.oracle is None:
            tier = 2  # rows-only: a driver slot adds no hash verdict
        else:
            tier = 1 if spec.name in DRIVER_GREEN else 0
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
