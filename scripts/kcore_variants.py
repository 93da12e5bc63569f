"""Experiment harness: time k_core round shapes on the graph_kcore edge
relation (guide §1 — measure before changing).

    python scripts/kcore_variants.py --k 3 [--variants cur,stats1,...]

Prints one JSON line of min-of-k per variant plus a cross-check that every
variant returns the identical (node, degree) relation hash.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kcore_variant(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    peels_per_round: int = 1,
    anti_drop: bool = True,
):
    """One stats job per round: a single aggregate over the degree relation
    returns (n_nodes, n_keep); equality IS the fixpoint (no node dropped =>
    no edge dropped). The restrict uses broadcast ANTI joins on the DROP
    set (small, shrinking) instead of semi joins on the KEEP set (large).
    Checkpoints are lazy — the next round's stats job materializes them."""
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    r = 0
    while r < max_rounds:
        deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        n_nodes, n_keep = deg.agg(
            F.count(F.lit(1)), F.count_if(F.col("deg") >= k)
        ).first()
        rounds += 1
        if n_keep == n_nodes:
            return (
                deg.select(F.col("u").alias("node"), F.col("deg").alias("degree")),
                rounds,
            )
        nxt = cur
        for _p in range(peels_per_round):
            d = nxt.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
            if anti_drop:
                drop = d.where(F.col("deg") < k).select("u")
                nxt = nxt.join(F.broadcast(drop), "u", "left_anti").join(
                    F.broadcast(drop.withColumnRenamed("u", "v")), "v", "left_anti"
                )
            else:
                keep = d.where(F.col("deg") >= k).select("u")
                nxt = nxt.join(keep, "u", "left_semi").join(
                    keep.withColumnRenamed("u", "v"), "v", "left_semi"
                )
            r += 1
        cur = nxt.localCheckpoint(eager=False)
    raise RuntimeError("no convergence")


def main() -> None:
    k_trials = 3
    if "--k" in sys.argv:
        k_trials = int(sys.argv[sys.argv.index("--k") + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cve_manager_spark.operators.graph import k_core
    from cve_manager_spark.session import tune
    from cve_manager_spark.sources.testdata import load_table

    spark = tune(
        SparkSession.builder.appName("kcore_variants")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1000000000).alias("dst"),
    ).distinct()

    variants = {
        "cur": lambda: (k_core(edges, k=25), None),
        "stats1_anti": lambda: kcore_variant(edges, 25, peels_per_round=1),
        "stats2_anti": lambda: kcore_variant(edges, 25, peels_per_round=2),
        "stats3_anti": lambda: kcore_variant(edges, 25, peels_per_round=3),
        "stats1_semi": lambda: kcore_variant(edges, 25, anti_drop=False),
    }
    only = None
    if "--variants" in sys.argv:
        only = sys.argv[sys.argv.index("--variants") + 1].split(",")

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    # warm-up
    k_core(edges, k=25).write.format("noop").mode("overwrite").save()

    out = {}
    hashes = {}
    s0 = steal()
    for name, fn in variants.items():
        if only and name not in only:
            continue
        ts = []
        rr = None
        for _ in range(k_trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = fn()
            df, rr = res if isinstance(res, tuple) else (res, None)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        h = (
            df.select(
                F.md5(
                    F.concat_ws(
                        ",",
                        F.col("node").cast("string"),
                        F.col("degree").cast("string"),
                    )
                ).alias("h")
            )
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
            .first()[0]
        )
        hashes[name] = str(h)
        out[name] = {
            "min": round(min(ts), 3),
            "trials": [round(t, 3) for t in ts],
            "rounds": rr,
        }
    out["hash_agree"] = len(set(hashes.values())) == 1
    out["hashes"] = hashes
    out["steal_core_s"] = round((steal() - s0) / 100.0, 1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
