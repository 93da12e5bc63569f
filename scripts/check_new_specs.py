"""Dev harness: run plans.analytics specs against the DuckDB oracle.

Usage: python scripts/check_new_specs.py [sf_dir] [name ...]
Not part of the committed gate — tests/test_registry_oracle.py covers
registered specs; this exists for fast iteration on a module before it
is wired into the registry.
"""

from __future__ import annotations

import sys
import time

from cve_manager_spark.plans import analytics
from cve_manager_spark.session import get_session
from tests.oracle import compare, duckdb_conn

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

spark = get_session("check-new-specs")
con = duckdb_conn(sf)

fails = 0
for spec in analytics.SPECS:
    if only and spec.name not in only:
        continue
    t0 = time.monotonic()
    try:
        df = spec.build(spark, sf)
        if spec.oracle is None:
            assert df.columns and df.count() >= 0
            problems = []
        else:
            problems = compare(df, con, spec.oracle)
    except Exception as exc:  # noqa: BLE001 — dev harness, report and move on
        problems = [f"EXC {type(exc).__name__}: {exc}"]
    dt = time.monotonic() - t0
    status = "ok" if not problems else "FAIL"
    print(f"{status:4} {spec.name:32} {dt:6.2f}s " + " | ".join(problems)[:500])
    fails += bool(problems)

print(f"\n{len([s for s in analytics.SPECS if not only or s.name in only]) - fails} ok, {fails} failed")
sys.exit(1 if fails else 0)
