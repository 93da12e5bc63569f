"""Differential gate: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 check at a smaller scale factor so failures
surface locally before a round ends. Queries with oracle=None get a
rows-deterministic smoke check instead.
"""

from __future__ import annotations

import pytest

from cve_manager_spark.plans.registry import collect
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duckdb_conn

SPECS = collect()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_vs_oracle(spark, con, name):
    spec = SPECS[name]
    df = spec.build(spark, SF_ORACLE)
    if spec.oracle is None:
        # rows-only: must run and have a stable schema
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0
        return
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert q, "registry is empty"


def test_registry_complete_and_ordered():
    """Guards VERDICT r1 findings: (a) no silent family drop — the exact
    query count is asserted; (b) the driver's correctness gate samples a
    50-entry prefix of the registry, so the registry is a verification-
    priority queue: every oracle-paired query WITHOUT a green driver row
    yet must land inside that window, ahead of already-verified and
    rows-only specs."""
    from cve_manager_spark.plans import registry

    specs = registry._all_specs()
    assert len(specs) == registry.EXPECTED_QUERY_COUNT
    # The ordering folds in CORRECTNESS_r*.json at call time (driver_green()),
    # so the guard must use the same dynamic set — checking against the static
    # DRIVER_GREEN constant goes stale the moment the driver drops a new
    # report (VERDICT r4 finding #1).
    green = registry.driver_green()
    unverified = [
        s for s in specs if s.oracle is not None and s.name not in green
    ]
    # the window is all-unverified (no green or rows-only spec wastes a slot)
    head = specs[: min(50, len(unverified))]
    assert all(s.oracle is not None and s.name not in green for s in head)
    # when the backlog exceeds the window, only higher-priority (later-added)
    # specs may overflow it — every priority-0 unverified query is inside
    window = {s.name for s in specs[:50]}
    missing = [s.name for s in unverified if s.priority == 0 and s.name not in window]
    assert not missing, f"priority-0 unverified queries outside driver window: {missing}"


# spark dtype → acceptable DuckDB type names; the driver's gate records a
# schema comparison, so width mismatches (int vs BIGINT) are treated as
# failures here too.
_TYPE_MAP = {
    "bigint": {"BIGINT"}, "int": {"INTEGER"}, "smallint": {"SMALLINT"},
    "double": {"DOUBLE"}, "float": {"FLOAT"}, "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"}, "date": {"DATE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "array<int>": {"INTEGER[]"}, "array<bigint>": {"BIGINT[]"},
    "array<string>": {"VARCHAR[]"}, "array<double>": {"DOUBLE[]"},
}


@pytest.mark.parametrize("name", sorted(n for n in SPECS if SPECS[n].oracle))
def test_schema_types_align_with_oracle(spark, con, name):
    spec = SPECS[name]
    sdt = dict(spec.build(spark, SF_ORACLE).dtypes)
    rel = con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
    ddt = dict(zip(rel.columns, [str(t) for t in rel.types]))
    problems = [
        f"{col}: spark={st} duck={ddt.get(col)}"
        for col, st in sdt.items()
        if ddt.get(col) not in _TYPE_MAP.get(st, set())
    ]
    assert not problems, f"{name}: " + "; ".join(problems)
