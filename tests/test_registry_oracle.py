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
