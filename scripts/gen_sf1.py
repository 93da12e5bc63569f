"""Deterministic local sf1 testdata generator (~10x the driver's sf0.1).

The driver's own generator is not in this repo, so sf1 is produced by
an independent deterministic generator (numpy PCG64 seed 42) that
mirrors the sf0.1 tables' SCHEMAS and statistical shape: same columns
and types, ~10x the row counts, the same bag-of-words document style
with planted exact/near duplicates, clustered embeddings, and the
TPC-H-ish star ratios. Differential validity does not depend on
matching the driver's bytes — both engines (Spark and DuckDB) read the
SAME parquet files, so hash-equality of their results is exactly the
same evidence the sf0.01 gate provides, at 10x the driver's largest
scale.

Output: /tmp/cve_spark_sf1/{table}.parquet. Idempotent — a complete
build (marker file) is reused. ~1 GiB on disk; regenerate at will.

Row counts are sf0.1 x 10 across the board (the driver's own sf ladder
scales every table linearly): documents 5k->50k, embeddings 2k->20k,
events 100k->1M, lineitem 600k->6M, orders 150k->1.5M, customer
15k->150k, part 20k->200k, supplier 1k->10k; region/nation fixed
(copied verbatim).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path("/tmp/cve_spark_sf1")
SRC = Path("/root/testdata/sf0.1")

COUNTS = {
    "documents": 50_000,
    "embeddings": 20_000,
    "events": 1_000_000,
    "lineitem": 6_000_000,
    "orders": 1_500_000,
    "customer": 150_000,
    "part": 200_000,
    "supplier": 10_000,
}

VOCAB = (
    "spark sql batch part line column order small big sort fast slow "
    "value scan hash group query agg table key filter stream merge "
    "join window customer vector the a"
).split()

LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def _docs(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["documents"]
    texts: list[str] = []
    for i in range(n):
        if i % 500 == 499 and texts:
            texts.append(texts[-1])  # planted EXACT duplicate
            continue
        if i % 250 == 249 and texts:
            w = texts[-1].split()  # planted NEAR duplicate: one word
            w[int(rng.integers(0, len(w)))] = VOCAB[
                int(rng.integers(0, len(VOCAB)))
            ]
            texts.append(" ".join(w))
            continue
        ln = int(rng.integers(10, 80))
        texts.append(
            " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), ln))
        )
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _embeddings(rng: np.random.Generator) -> pa.Table:
    n, d, k = COUNTS["embeddings"], 64, 10
    centers = rng.normal(0, 0.18, size=(k, d))
    labels = rng.integers(0, k, size=n)
    vecs = (
        centers[labels] + rng.normal(0, 0.07, size=(n, d))
    ).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def _events(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["events"]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    ts = base + (rng.random(n) * span.astype(np.int64)).astype(
        "timedelta64[us]"
    )
    types = rng.choice(
        ["view", "click", "purchase", "signup", "error"], size=n
    )
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(np.sort(ts), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 15_000, n), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.round(rng.random(n) * 100, 4), pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n)],
            pa.string(),
        ),
    })


def _lineitem(rng: np.random.Generator, writer_path: Path) -> None:
    n, chunk = COUNTS["lineitem"], 1_000_000
    n_orders = COUNTS["orders"]
    base = np.datetime64("1995-01-01", "us")
    writer = None
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        okey = rng.integers(0, n_orders, m)
        ship = base + (
            rng.integers(0, 2500, m) * np.timedelta64(1, "D")
        ).astype("timedelta64[us]")
        t = pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "l_partkey": pa.array(
                rng.integers(0, COUNTS["part"], m), pa.int64()
            ),
            "l_suppkey": pa.array(
                rng.integers(0, COUNTS["supplier"], m), pa.int64()
            ),
            "l_linenumber": pa.array(
                rng.integers(1, 8, m).astype(np.int32), pa.int32()
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, m).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.random(m) * 90_000 + 900, 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, m) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, m) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(
                rng.choice(["A", "N", "R"], m), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(["O", "F"], m), pa.string()
            ),
            "l_shipdate": pa.array(ship, pa.timestamp("us")),
        })
        if writer is None:
            writer = pq.ParquetWriter(str(writer_path), t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()


def _orders(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["orders"]
    base = np.datetime64("1995-01-01", "us")
    od = base + (
        rng.integers(0, 2400, n) * np.timedelta64(1, "D")
    ).astype("timedelta64[us]")
    return pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, COUNTS["customer"], n), pa.int64()
        ),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n), pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.random(n) * 400_000 + 900, 2), pa.float64()
        ),
        "o_orderdate": pa.array(od, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                 "5-LOW"], n
            ),
            pa.string(),
        ),
    })


def _customer(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["customer"]
    return pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n).astype(np.int32), pa.int32()
        ),
        "c_acctbal": pa.array(
            np.round(rng.random(n) * 11_000 - 1_000, 2), pa.float64()
        ),
        "c_mktsegment": pa.array(
            rng.choice(
                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                 "MACHINERY"], n
            )
        ),
    })


def _part(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["part"]
    return pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": pa.array(
            [" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), 3))
             for _ in range(n)]
        ),
        "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n)]),
        "p_type": pa.array(
            rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE",
                        "ECONOMY", "PROMO"], n)
        ),
        "p_size": pa.array(
            rng.integers(1, 51, n).astype(np.int32), pa.int32()
        ),
        "p_retailprice": pa.array(
            np.round(rng.random(n) * 2_000 + 900, 2), pa.float64()
        ),
    })


def _supplier(rng: np.random.Generator) -> pa.Table:
    n = COUNTS["supplier"]
    return pa.table({
        "s_suppkey": pa.array(range(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n).astype(np.int32), pa.int32()
        ),
        "s_acctbal": pa.array(
            np.round(rng.random(n) * 11_000 - 1_000, 2), pa.float64()
        ),
    })


def generate() -> Path:
    if (OUT / "_complete").exists():
        return OUT
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    rng = np.random.default_rng(42)
    pq.write_table(_docs(rng), str(OUT / "documents.parquet"))
    pq.write_table(_embeddings(rng), str(OUT / "embeddings.parquet"))
    pq.write_table(_events(rng), str(OUT / "events.parquet"))
    pq.write_table(_orders(rng), str(OUT / "orders.parquet"))
    pq.write_table(_customer(rng), str(OUT / "customer.parquet"))
    pq.write_table(_part(rng), str(OUT / "part.parquet"))
    pq.write_table(_supplier(rng), str(OUT / "supplier.parquet"))
    _lineitem(rng, OUT / "lineitem.parquet")
    # fixed dimension tables: copy the driver's own files verbatim
    for t in ("region", "nation"):
        shutil.copy(SRC / f"{t}.parquet", OUT / f"{t}.parquet")
    (OUT / "_complete").write_text("ok")
    return OUT


if __name__ == "__main__":
    p = generate()
    print(f"sf1 at {p}")
