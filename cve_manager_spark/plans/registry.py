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
#
# Order matters: the driver's correctness gate samples a prefix of the
# registry, so the flagship pipeline (dedup/similarity/text/multimodal) and
# events families come FIRST; the relational micro-queries — all driver-green
# in round 1 — rotate to the back.
EXPECTED_QUERY_COUNT = 90


def _all_specs() -> list[QuerySpec]:
    from cve_manager_spark.plans import events as events_mod
    from cve_manager_spark.plans import pipeline as pipeline_mod
    from cve_manager_spark.plans import relational

    specs: list[QuerySpec] = []
    specs += pipeline_mod.SPECS
    specs += events_mod.SPECS
    specs += relational.SPECS
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
