"""Config A/B harness (optimization guide §1): run a query subset with
extra session confs in a FRESH process and print one JSON line of
per-query min-of-k timings. Drive it twice per config in ABBA order from
the shell so JVM warm-up and host-load drift cancel instead of confounding
the comparison (the lesson of the first r14 A/B attempt).

    python scripts/ab_conf.py --k 3 --queries a,b,c [--conf k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    confs: dict[str, str] = {}
    queries_arg = None
    k = 3
    i = 0
    while i < len(argv):
        if argv[i] == "--conf":
            kk, vv = argv[i + 1].split("=", 1)
            confs[kk] = vv
            i += 2
        elif argv[i] == "--queries":
            queries_arg = argv[i + 1]
            i += 2
        elif argv[i] == "--k":
            k = int(argv[i + 1])
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    names = [q for q in (queries_arg or "").split(",") if q]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_MEM", "16g")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from cve_manager_spark.plans.registry import queries
    from cve_manager_spark.session import STATIC_CONF, tune

    b = (
        SparkSession.builder.appName("ab_conf")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", mem)
    )
    for kk, vv in STATIC_CONF.items():
        b = b.config(kk, vv)
    for kk, vv in confs.items():
        b = b.config(kk, vv)
    spark = tune(b.getOrCreate())
    # re-assert A/B confs in case tune() overlaps (static confs raise
    # CANNOT_MODIFY_STATIC_CONFIG here — the builder already applied them)
    for kk, vv in confs.items():
        try:
            spark.conf.set(kk, vv)
        except Exception:
            pass
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    q["limit_1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    trials: dict[str, list[float]] = {n: [] for n in names}
    s0 = steal()
    t_all = time.perf_counter()
    for _pass in range(k):
        for n in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials[n].append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_all
    # Janino compile-cache telemetry (guide §1: attribute before changing):
    # METRIC_COMPILATION_TIME is a histogram of per-compile milliseconds;
    # count × mean ≈ total generated-class compile wall. A 100-entry
    # generated-class cache (spark.sql.codegen.cache.maxEntries default)
    # thrashes across a many-query pass, so later passes recompile what
    # pass 1 already compiled — visible here as count >> distinct units.
    compile_ms = None
    try:
        cm = getattr(
            spark._jvm.org.apache.spark.metrics.source, "CodegenMetrics$"
        )
        hist = getattr(cm, "MODULE$").METRIC_COMPILATION_TIME()
        compile_ms = {
            "n_compiles": hist.getCount(),
            "total_ms": round(hist.getCount() * hist.getSnapshot().getMean(), 1),
        }
    except Exception:
        pass
    out = {
        "confs": confs,
        "k": k,
        "queries": {n: round(min(ts), 3) for n, ts in trials.items()},
        "trials": {n: [round(t, 3) for t in ts] for n, ts in trials.items()},
        "total_min": round(sum(min(ts) for ts in trials.values()), 3),
        "steal_core_s": round((steal() - s0) / 100.0, 1),
        "wall": round(wall, 1),
        "codegen": compile_ms,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
