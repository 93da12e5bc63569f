"""Measured evidence for the merge-on-read trade at scale: build a
committed table from the sf1 events (~8.6M rows), then delete the SAME
0.1%-ish row subset twice — once copy-on-write, once as position
deletes — and record wall time, bytes written, and files rewritten for
each, plus the DV read-tax and what compaction costs to reclaim it.

    cd /tmp && python /root/repo/scripts/mor_scaling.py

Writes one JSON line (and /root/repo/MOR_SCALING.json when run from a
writable checkout). The point the numbers make: COW delete cost scales
with the BYTES OF EVERY TOUCHED FILE (a scattered predicate touches
every file, so it approaches a full rewrite), MOR with the DELETED ROW
COUNT — the gap widens linearly with file size, which is exactly the
100 TB argument.
"""

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from scripts.gen_sf1 import generate  # noqa: E402

SF = str(generate())

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cve_manager_spark.commitlog import TableLog  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "12g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def build(dest: Path) -> TableLog:
    if dest.exists():
        shutil.rmtree(dest)
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .repartition(32, "event_id")
        .write.parquet(str(dest))
    )
    log = TableLog(str(dest))
    log.init()
    return log


def tree_bytes(root: Path) -> int:
    return sum(p.stat().st_size for p in root.rglob("*.parquet"))


# a scattered predicate: ~0.1% of rows, hash-spread so every file is
# touched — the COW worst case that is also the realistic erasure /
# correction shape (row-level, not partition-aligned)
PRED = "event_id % 1024 = 7"

out = {"sf_dir": SF, "predicate": PRED}

for mode in ("cow", "mor"):
    root = Path("/tmp/mor_scaling") / mode
    log = build(root)
    n0 = log.read(spark).count()
    b0 = tree_bytes(root)
    f0 = len(log.snapshot()[1])
    t0 = time.monotonic()
    if mode == "cow":
        res = log.delete_where(spark, PRED)
    else:
        res = log.delete_where_mor(spark, PRED)
    dt = time.monotonic() - t0
    b1 = tree_bytes(root)
    _, files1 = log.snapshot()
    rewritten = len(set(files1) - set(log.snapshot(0)[1]))
    t0 = time.monotonic()
    n1 = log.read(spark).count()
    read_s = time.monotonic() - t0
    out[mode] = {
        "rows_before": n0,
        "n_deleted": res["n_deleted"],
        "delete_sec": round(dt, 2),
        "bytes_written": b1 - b0,
        "data_files_rewritten": rewritten,
        "post_read_sec": round(read_s, 2),
        "rows_after": n1,
    }
    if mode == "mor":
        t0 = time.monotonic()
        log.compact(spark, target_rows_per_file=300_000)
        out[mode]["compact_sec"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        assert log.read(spark).count() == n1
        out[mode]["post_compact_read_sec"] = round(
            time.monotonic() - t0, 2
        )

assert out["cow"]["rows_after"] == out["mor"]["rows_after"]
assert out["cow"]["n_deleted"] == out["mor"]["n_deleted"]
out["bytes_ratio_cow_over_mor"] = round(
    out["cow"]["bytes_written"] / max(1, out["mor"]["bytes_written"]), 1
)

# -- keyed MERGE twins: COW merge_upsert vs MOR merge_upsert_mor ------
# Each side is the other's oracle: identical updates applied both
# ways must produce hash-identical content; the MOR side must do it
# without rewriting a single pre-existing data file.
cow_log = build(Path("/tmp/mor_scaling/merge_cow"))
mor_log = build(Path("/tmp/mor_scaling/merge_mor"))
upd = (
    spark.read.parquet(f"{SF}/events.parquet")
    .where("event_id % 97 = 3")
    .withColumn("value", F.col("value") + 1000)
)
n_upd = upd.count()
merge_out = {"n_updates": n_upd}
for name, log, fn in (
    ("cow", cow_log, lambda l, u: l.merge_upsert(spark, u, ["event_id"])),
    ("mor", mor_log, lambda l, u: l.merge_upsert_mor(
        spark, u, ["event_id"])),
):
    b0 = tree_bytes(log.root)
    files0 = set(log.snapshot()[1])
    t0 = time.monotonic()
    res = fn(log, upd)
    dt = time.monotonic() - t0
    merge_out[name] = {
        "merge_sec": round(dt, 2),
        "n_matched": res["n_matched"],
        "bytes_written": tree_bytes(log.root) - b0,
        "pre_files_rewritten": len(files0 - set(log.snapshot()[1])),
    }
digest = lambda log: (  # noqa: E731
    log.read(spark)
    .select(F.md5(F.concat_ws("|", *sorted(
        log.read(spark).columns))).alias("h"))
    .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)
               .cast("decimal(38,0)")).alias("s"))
    .first()["s"]
)
d_cow, d_mor = digest(cow_log), digest(mor_log)
merge_out["content_hash_match"] = bool(d_cow == d_mor)
assert merge_out["content_hash_match"], (d_cow, d_mor)
assert merge_out["mor"]["pre_files_rewritten"] == 0
out["merge_twins"] = merge_out
print(json.dumps(out))
try:
    Path("/root/repo/MOR_SCALING.json").write_text(
        json.dumps(out, indent=1)
    )
except OSError:
    pass
shutil.rmtree("/tmp/mor_scaling", ignore_errors=True)
