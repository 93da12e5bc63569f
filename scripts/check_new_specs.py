"""Dev harness: run one plans module's specs against the DuckDB oracle.

Usage: python scripts/check_new_specs.py [--module=NAME] [sf_dir] [name ...]
(--module defaults to analytics). Not part of the committed gate —
tests/test_registry_oracle.py covers registered specs; this exists for
fast iteration on a module before/while it is wired into the registry.
"""

from __future__ import annotations

import importlib
import sys
import time

from cve_manager_spark.session import get_session
from tests.oracle import compare, duckdb_conn

args = sys.argv[1:]
mod_name = "analytics"
if args and args[0].startswith("--module="):
    mod_name = args.pop(0).split("=", 1)[1]
# load via the registry first: it imports the plan modules in an order
# that resolves their oracle-CTE cross-imports (importing e.g. round10
# directly first trips a circular import through round8 -> semantic)
importlib.import_module("cve_manager_spark.plans.registry").collect()
analytics = importlib.import_module(f"cve_manager_spark.plans.{mod_name}")

sf = args[0] if args else "/root/testdata/sf0.01"
only = set(args[1:])

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
