"""triangle_count kernel variants: measure-first harness (guide §1.2
step 2 — per-task work, after the r5/r14 passes fixed the job shape).

The query's executor time concentrates in two codegen kernels:

1. PAIR GENERATION — the per-order sorted part set k -> k(k-1)/2 pair
   rows. The current shape builds the FULL pair array per order row
   (nested transform -> struct(u, v) -> flatten) and then explodes:
   k²/2 two-field structs allocated and copied before a single pair is
   emitted. The `slice` variant explodes twice instead — posexplode the
   set, then explode slice(ps, i+2, k) — allocating only primitive
   tail arrays (k²/2 longs total, no structs, no flatten pass).

2. CLOSURE INTERSECT — |N+(x) ∩ N+(y)| per oriented edge. The current
   `size(array_intersect(na, nb))` builds a hash set AND the result
   array per row when only the count is needed. The `scan` variant
   counts with aggregate+array_contains (zero allocation, linear scan
   per element); the `filter` variant sizes a filtered array (one
   array allocation, no hash set).

Every variant runs the WHOLE query (same persists, noop sink, cleared
cache per trial) and its collected stats row is hash-compared against
the current shape. Usage:

    python scripts/tri_variants.py [--k 5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.session import STATIC_CONF, tune
from cve_manager_spark.sources.testdata import load_table


def pairs_cur(ps: DataFrame) -> DataFrame:
    return ps.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ps",
                    lambda x, i: F.transform(
                        F.slice("ps", i + F.lit(2), F.size("ps")),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("e")
    ).select("e.u", "e.v")


def pairs_slice(ps: DataFrame) -> DataFrame:
    t = ps.select(F.posexplode("ps").alias("i", "u"), "ps")
    return t.select(
        "u",
        F.explode(
            F.slice("ps", F.col("i") + F.lit(2), F.size("ps"))
        ).alias("v"),
    )


def closure_cur(ex: DataFrame, adj: DataFrame) -> DataFrame:
    return (
        ex.join(
            adj.select(F.col("src").alias("b"), F.col("nbrs").alias("nb")),
            F.col("dst") == F.col("b"),
        )
        .select(F.size(F.array_intersect(F.col("na"), F.col("nb"))).alias("t"))
        .agg(F.sum("t").alias("n_triangles"))
    )


def closure_scan(ex: DataFrame, adj: DataFrame) -> DataFrame:
    return (
        ex.join(
            adj.select(F.col("src").alias("b"), F.col("nbrs").alias("nb")),
            F.col("dst") == F.col("b"),
        )
        .select(
            F.expr(
                "aggregate(na, 0L, (acc, x) ->"
                " acc + IF(array_contains(nb, x), 1L, 0L))"
            ).alias("t")
        )
        .agg(F.sum("t").alias("n_triangles"))
    )


def closure_filter(ex: DataFrame, adj: DataFrame) -> DataFrame:
    return (
        ex.join(
            adj.select(F.col("src").alias("b"), F.col("nbrs").alias("nb")),
            F.col("dst") == F.col("b"),
        )
        .select(
            F.size(
                F.filter("na", lambda x: F.array_contains("nb", x))
            ).alias("t")
        )
        .agg(F.sum("t").alias("n_triangles"))
    )


def build(spark: SparkSession, sf: str, pairgen, closure) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    n_fan = spark.sparkContext.defaultParallelism
    ps = (
        li.select(F.col("l_orderkey").alias("o"), "l_partkey")
        .repartition(n_fan, "o")
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    e = pairgen(ps).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select("v"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ne = deg.agg(F.expr("sum(deg) div 2").alias("n_edges"))
    ed = (
        e.join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    f = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    adj = f.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ex = adj.select(F.col("nbrs").alias("na"), F.explode("nbrs").alias("dst"))
    tri = closure(ex, adj)
    return nn.crossJoin(ne).crossJoin(tri)


def main() -> None:
    k = 5
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_MEM", "16g")
    b = (
        SparkSession.builder.appName("tri_variants")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", mem)
    )
    for kk, vv in STATIC_CONF.items():
        b = b.config(kk, vv)
    spark = tune(b.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "cur": (pairs_cur, closure_cur),
        "slice_pairs": (pairs_slice, closure_cur),
        "scan_isect": (pairs_cur, closure_scan),
        "filter_isect": (pairs_cur, closure_filter),
        "slice_scan": (pairs_slice, closure_scan),
    }

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    rows: dict[str, tuple] = {}
    times: dict[str, list[float]] = {n: [] for n in variants}
    s0 = steal()
    for trial in range(k):
        for name, (pg, cl) in variants.items():
            spark.catalog.clearCache()
            df = build(spark, sf_dir, pg, cl)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            if trial == 0:
                rows[name] = tuple(df.first())
    s1 = steal()
    base = rows["cur"]
    for name in variants:
        ok = rows[name] == base
        print(
            f"{name:14s} min={min(times[name]):6.3f}s "
            f"trials={[round(t, 2) for t in times[name]]} "
            f"row={'MATCH' if ok else 'DIFFERS ' + str(rows[name])}"
        )
        if not ok:
            raise SystemExit(f"variant {name} output differs")
    print(f"steal_core_s={round((s1 - s0) / 100.0, 1)}")


if __name__ == "__main__":
    main()
