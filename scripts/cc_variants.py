"""Experiment harness: time connected_components variants on the
dedup_clusters edge relation (guide §1 — measure before changing).

    python scripts/cc_variants.py --k 3 [--variants cur,selfedge,j5]

Prints one JSON line of min-of-k per variant plus a cross-check that every
variant returns the identical (node, component) mapping hash.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cc_variant(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    jumps_per_round: int = 3,
    self_edges: bool = True,
    inner_jumps: bool = True,
    check_every: int = 1,
) -> DataFrame:
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if self_edges:
        nodes = und.select("u").distinct()
        und = und.unionByName(nodes.select("u", F.col("u").alias("v")))
    und = und.localCheckpoint(eager=True)
    if self_edges:
        labels = und.select("u").distinct().select(
            F.col("u").alias("node"), F.col("u").alias("label")
        ).localCheckpoint(eager=True)
    else:
        labels = (
            und.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("label"))
        ).localCheckpoint(eager=True)

    def label_sum(df):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sum = label_sum(labels)
    rounds = 0
    for i in range(max_iter):
        rounds += 1
        if self_edges:
            cur = (
                und.join(labels, und.v == labels.node)
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .select(F.col("u").alias("node"), "label")
            )
        else:
            neighbor_min = (
                und.join(labels, und.v == labels.node)
                .groupBy("u")
                .agg(F.min("label").alias("nmin"))
            )
            cur = labels.join(neighbor_min, labels.node == neighbor_min.u, "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        for _j in range(jumps_per_round):
            parent = cur.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            if inner_jumps:
                cur = cur.join(parent, cur.label == parent.p_node).select(
                    "node", F.col("p_label").alias("label")
                )
            else:
                cur = cur.join(parent, cur.label == parent.p_node, "left").select(
                    "node",
                    F.least(F.col("label"), F.coalesce("p_label", F.col("label"))).alias("label"),
                )
        labels = cur.localCheckpoint(eager=True)
        if (i + 1) % check_every == 0:
            new_sum = label_sum(labels)
            if new_sum == prev_sum:
                return labels.select("node", F.col("label").alias("component")), rounds
            prev_sum = new_sum
    raise RuntimeError("no convergence")


def main() -> None:
    k = 3
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from cve_manager_spark.operators.graph import connected_components
    from cve_manager_spark.session import tune
    from cve_manager_spark.sources.testdata import load_table

    spark = tune(
        SparkSession.builder.appName("cc_variants")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        docs.select("doc_id", "lang")
        .withColumn("next_id", F.lead("doc_id").over(w))
        .where(F.col("next_id").isNotNull())
        .select(F.col("doc_id").alias("id_a"), F.col("next_id").alias("id_b"))
    )

    variants = {
        "cur": lambda: (connected_components(edges), None),
        "selfedge_j3": lambda: cc_variant(edges, jumps_per_round=3),
        "selfedge_j4": lambda: cc_variant(edges, jumps_per_round=4),
        "selfedge_j5": lambda: cc_variant(edges, jumps_per_round=5),
        "selfedge_j6": lambda: cc_variant(edges, jumps_per_round=6),
        "selfedge_j4_c2": lambda: cc_variant(edges, jumps_per_round=4, check_every=2),
    }
    only = None
    if "--variants" in sys.argv:
        only = sys.argv[sys.argv.index("--variants") + 1].split(",")

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    # warm-up
    connected_components(edges).write.format("noop").mode("overwrite").save()

    out = {}
    hashes = {}
    s0 = steal()
    for name, fn in variants.items():
        if only and name not in only:
            continue
        ts = []
        rr = None
        for _ in range(k):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = fn()
            df, rr = res if isinstance(res, tuple) else (res, None)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        h = (
            df.select(
                F.md5(F.concat_ws(",", F.col("node").cast("string"), F.col("component").cast("string")))
                .alias("h")
            )
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
            .first()[0]
        )
        hashes[name] = str(h)
        out[name] = {"min": round(min(ts), 3), "trials": [round(t, 3) for t in ts], "rounds": rr}
    out["hash_agree"] = len(set(hashes.values())) == 1
    out["hashes"] = hashes
    out["steal_core_s"] = round((steal() - s0) / 100.0, 1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
