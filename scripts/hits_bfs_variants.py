"""Experiment harness: time hits_int / bfs_hops round-shape variants on the
real spec inputs (guide §1 — measure before changing).

    python scripts/hits_bfs_variants.py --k 5 [--op hits|bfs]

The candidate shape applies the round-shape lesson that paid in
connected_components / k_core / pagerank_int this round: checkpoint the
RAW per-step sums lazily BEFORE block-floating-point normalization (the
current hits_int checkpoints AFTER, so the O(|E|) join+aggregate subtree
feeds both the broadcast-max branch and the main branch, and every
half-iteration pays an eager serialize-all barrier), and make the BFS
visited-set checkpoint lazy (the next round's anti-join materializes it,
so each hop runs one frontier job instead of two).

Prints one JSON line of min-of-k per variant plus a cross-check that every
variant returns the identical output hash.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hits_variant(
    edges: DataFrame,
    iterations: int = 2,
    lazy: bool = True,
    ckpt_raw: bool = True,
) -> DataFrame:
    """hits_int with (a) per-step checkpoints placed on the RAW sums
    before normalization and (b) lazy checkpoints so the whole fixed
    point runs as one job after the edge checkpoint."""
    e = edges.select(F.col("src"), F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=not lazy)
    )

    def normalize(rel: DataFrame, col: str) -> DataFrame:
        mx = rel.groupBy().agg(F.max(col).alias("__mx"))
        return (
            rel.crossJoin(F.broadcast(mx))
            .withColumn(
                "__s",
                F.greatest(F.length(F.bin("__mx")) - F.lit(21), F.lit(0)).cast(
                    "int"
                ),
            )
            .select("node", F.expr(f"shiftright({col}, __s)").alias(col))
        )

    hub = nodes.withColumn("hub", F.lit(1_000_000).cast("long"))
    auth = None
    for _ in range(iterations):
        raw_a = (
            e.join(hub.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = nodes.join(raw_a, "node", "left").select(
            "node", F.coalesce("auth", F.lit(0)).cast("long").alias("auth")
        )
        if ckpt_raw:
            auth = auth.localCheckpoint(eager=not lazy)
            auth = normalize(auth, "auth")
        else:
            auth = normalize(auth, "auth").localCheckpoint(eager=not lazy)
        raw_h = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = nodes.join(raw_h, "node", "left").select(
            "node", F.coalesce("hub", F.lit(0)).cast("long").alias("hub")
        )
        if ckpt_raw:
            hub = hub.localCheckpoint(eager=not lazy)
            hub = normalize(hub, "hub")
        else:
            hub = normalize(hub, "hub").localCheckpoint(eager=not lazy)
    return hub.join(auth, "node").select("node", "hub", "auth")


def bfs_variant(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    lazy_visited: bool = True,
) -> DataFrame:
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e = e.unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    e = e.distinct().localCheckpoint(eager=True)
    visited = (
        seeds.select(F.col("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(
            eager=not lazy_visited
        )
        frontier = nxt
    return visited


def out_hash(df: DataFrame, cols: list[str]):
    return (
        df.select(
            F.md5(
                F.concat_ws(",", *[F.col(c).cast("string") for c in cols])
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )


def main() -> None:
    k = 3
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    op = "both"
    if "--op" in sys.argv:
        op = sys.argv[sys.argv.index("--op") + 1]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cve_manager_spark.operators.graph import bfs_hops, hits_int
    from cve_manager_spark.session import STATIC_CONF, tune
    from cve_manager_spark.sources.testdata import load_table

    b = (
        SparkSession.builder.appName("hits_bfs_variants")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "16g")
    )
    for kk, vv in STATIC_CONF.items():
        b = b.config(kk, vv)
    spark = tune(b.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1000000000).alias("dst"),
    )
    seeds = li.where(F.col("l_partkey") % 97 == 0).select(
        F.col("l_partkey").alias("node")
    )

    variants: dict[str, tuple] = {}
    if op in ("hits", "both"):
        variants.update(
            {
                "hits_cur": (lambda: hits_int(edges, iterations=2), ["node", "hub", "auth"]),
                "hits_rawckpt_lazy": (
                    lambda: hits_variant(edges, 2, lazy=True, ckpt_raw=True),
                    ["node", "hub", "auth"],
                ),
                "hits_rawckpt_eager": (
                    lambda: hits_variant(edges, 2, lazy=False, ckpt_raw=True),
                    ["node", "hub", "auth"],
                ),
                "hits_postckpt_lazy": (
                    lambda: hits_variant(edges, 2, lazy=True, ckpt_raw=False),
                    ["node", "hub", "auth"],
                ),
            }
        )
    if op in ("bfs", "both"):
        variants.update(
            {
                "bfs_cur": (lambda: bfs_hops(edges, seeds, max_hops=3), ["node", "hop"]),
                "bfs_lazy_visited": (
                    lambda: bfs_variant(edges, seeds, 3, lazy_visited=True),
                    ["node", "hop"],
                ),
            }
        )

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    # warm-up
    hits_int(edges, iterations=1).write.format("noop").mode("overwrite").save()

    out: dict = {}
    hashes: dict[str, dict[str, str]] = {"hits": {}, "bfs": {}}
    s0 = steal()
    for name, (fn, cols) in variants.items():
        ts = []
        df = None
        for _ in range(k):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        hashes[name.split("_")[0]][name] = str(out_hash(df, cols))
        out[name] = {"min": round(min(ts), 3), "trials": [round(t, 3) for t in ts]}
    out["hash_agree"] = all(
        len(set(h.values())) <= 1 for h in hashes.values()
    )
    out["hashes"] = hashes
    out["steal_core_s"] = round((steal() - s0) / 100.0, 1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
