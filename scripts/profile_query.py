"""Per-query stage-level profiler (optimization guide §1).

Runs one or more registry queries solo against $SPARK_GRAFT_SF_DIR with the
noop sink, min-of-k, and prints a per-stage breakdown pulled from the UI REST
API: stage wall, task time, shuffle read/write bytes, spill, task count.
This is the empirical loop of guide §1.1 in scriptable form — the "which
Exchange is the expensive one" question answered from the terminal.

    python scripts/profile_query.py triangle_count dedup_incremental [--k 3]
    python scripts/profile_query.py triangle_count --explain   # plan only
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = 3
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
        args.remove(str(k))
    explain_only = "--explain" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_MEM", "16g")

    from pyspark.sql import SparkSession

    from cve_manager_spark.plans.registry import queries
    from cve_manager_spark.session import tune

    from cve_manager_spark.session import STATIC_CONF

    builder = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", mem)
    )
    for kk, vv in STATIC_CONF.items():
        builder = builder.config(kk, vv)
    spark = tune(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    if explain_only:
        for name in args:
            df = q[name](spark, sf_dir)
            print(f"===== {name} =====")
            print(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        return

    # warm-up
    q["limit_1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def _stages() -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete&withSummaries=false",
            timeout=10,
        ) as r:
            return json.load(r)

    for name in args:
        trials = []
        best_stages = None
        for i in range(k):
            spark.catalog.clearCache()
            watermark = max((s["stageId"] for s in _stages()), default=-1)
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            trials.append(dt)
            if not trials or dt <= min(trials):
                best_stages = [s for s in _stages() if s["stageId"] > watermark]
        print(f"\n===== {name}: trials {[round(t, 3) for t in trials]} min={min(trials):.3f}s =====")
        best_stages.sort(key=lambda s: -(s.get("executorRunTime", 0)))
        tot_run = sum(s.get("executorRunTime", 0) for s in best_stages)
        print(f"{len(best_stages)} stages, total executorRunTime {tot_run/1000.0:.2f} core-s")
        for s in best_stages[:14]:
            first = (s.get("firstTaskLaunchedTime") or "")[11:23]
            print(
                f"  stage {s['stageId']:>5} tasks={s['numCompleteTasks']:>3} "
                f"run={s.get('executorRunTime',0)/1000.0:7.2f}cs "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}cs "
                f"sr={s.get('shuffleReadBytes',0)/1e6:8.2f}MB "
                f"sw={s.get('shuffleWriteBytes',0)/1e6:8.2f}MB "
                f"in={s.get('inputBytes',0)/1e6:8.2f}MB "
                f"gc={s.get('jvmGcTime',0)/1000.0:5.1f}cs "
                f"spill={s.get('diskBytesSpilled',0)/1e6:6.1f}MB "
                f"t0={first} "
                f"{(s.get('description') or s.get('name') or '')[:60]}"
            )


if __name__ == "__main__":
    main()
