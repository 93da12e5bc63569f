"""Driver registry: every implemented query name → (Spark builder, oracle SQL).

`__spark_entry__.py` re-exports this as ``queries()`` / ``oracle_sql()``.
Modules append their QuerySpecs at import time; collect() asserts name
uniqueness so a typo can't silently shadow a query.
"""

from __future__ import annotations

from cve_manager_spark.plans.spec import Builder, QuerySpec


def _all_specs() -> list[QuerySpec]:
    # Import lazily so a syntax error in one family surfaces as a normal
    # import error during tests, and module import order stays explicit.
    from cve_manager_spark.plans import relational

    specs: list[QuerySpec] = []
    specs += relational.SPECS
    try:
        from cve_manager_spark.plans import events as events_mod

        specs += events_mod.SPECS
    except ImportError:
        pass
    try:
        from cve_manager_spark.plans import pipeline as pipeline_mod

        specs += pipeline_mod.SPECS
    except ImportError:
        pass
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
