"""Warehouse maintenance: file-layout diagnostics, compaction, clustering.

The reference's warehouse is a Postgres instance, where storage layout
is the database's problem (cve_manager.py:344-384 just TRUNCATEs and
re-COPYs). A parquet lake makes layout the engine's problem, and at
100 TB it is the dominant one: a table written by a 1000-task job per
micro-batch degenerates into millions of kilobyte files whose open/seek
overhead dwarfs the scan itself, while an unsorted table defeats parquet
min/max row-group skipping so every query reads everything.

Three primitives, mirroring what table formats call OPTIMIZE / CLUSTER:

- ``file_stats``: the diagnostic — per-file row counts straight from the
  distributed scan (``input_file_name``), so the small-file problem is
  measured, not guessed, before rewriting anything.
- ``compact``: rewrite a parquet directory into ~``target_rows_per_file``
  files, optionally range-clustered + sorted so parquet footer min/max
  stats become selective (the data-skipping face of compaction).
- ``write_clustered``: the write-side discipline that avoids needing
  compact in the first place — hive partitioning for partition pruning,
  range repartition + in-file sort for row-group skipping, and
  ``maxRecordsPerFile`` as the hard file-size ceiling.

Swap semantics: the rewrite lands in a sibling temp dir and replaces the
original only after the new copy is fully written and row-verified —
readers never observe a half-compacted table. On a real deployment the
same two steps are "write new file set, swap the table/partition pointer
in the metastore transaction" (Iceberg/Delta commit); the local-FS
rename here is that transaction's single-node analogue.
"""

from __future__ import annotations

import math
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Append a Z-order (Morton) key column interleaving ``cols``.

    Single-column clustering gives tight parquet min/max bounds on ONE
    dimension and useless bounds on every other; interleaving the bits
    of several normalized columns gives every file a small bounding box
    in ALL of them, so range predicates on any clustered dimension skip
    files — the multi-dimensional layout trick behind Delta/Iceberg
    Z-ORDER, built here from plain codegen'd shift/mask expressions.

    Columns are first normalized to ``bits``-bit integer ranks via their
    global min/max (one tiny aggregate — the only action), then bit i of
    column j lands at interleaved position i*n_cols + j. Layout-only: the
    key orders the rewrite and is dropped before the write, so no query
    semantics depend on the float normalization.

    Returns (df_with_key, key_column_name).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).first()
    scale = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = row[2 * j], row[2 * j + 1]
        span = (hi - lo) or 1.0
        rank = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(scale))
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * len(cols) + j)
    name = "__zorder_key"
    return df.withColumn(name, key), name


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row counts for a parquet table: the small-file diagnostic.

    One distributed scan grouped on ``input_file_name`` — no driver-side
    directory walk, so it works the same against a 10-million-file table
    (the listing is the executors' problem, as it should be).
    Returns (file, n_rows) sorted largest-first.
    """
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), "file")
    )


def plan_target_files(n_rows: int, target_rows_per_file: int) -> int:
    """Number of output files a compaction should produce (≥1)."""
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be positive")
    return max(1, math.ceil(n_rows / target_rows_per_file))


def compact(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite a parquet dir into ~target-sized files, atomically swapped.

    With ``sort_by``, the rewrite range-partitions on those columns and
    sorts within each file, so every output file covers a disjoint key
    range and parquet min/max footer stats prune whole files for
    range/point predicates — compaction and CLUSTER BY in one pass.
    Without it, a plain round-robin repartition evens out file sizes.

    ``maxRecordsPerFile`` backstops the file-count math: even if the
    range partitioner skews (one hot key range), no single file exceeds
    the target, which is the invariant that actually protects executor
    memory and scan parallelism at 100 TB.

    ``zorder_by`` clusters on the Morton interleave of several columns
    instead (see ``zorder_key``) — mutually exclusive with ``sort_by``.

    A hive-partitioned table keeps its layout (r6): the rewrite
    repartitions on the partition columns first and writes back through
    ``partitionBy``, so compaction happens WITHIN each partition
    directory — the OPTIMIZE-per-partition shape — instead of silently
    flattening partition columns into the data files.

    Returns {"n_rows", "files_before", "files_after"}; fails loud (and
    leaves the original untouched) if the rewrite row count disagrees.
    """
    if sort_by and zorder_by:
        raise ValueError("pass sort_by or zorder_by, not both")
    src = Path(path)
    pcols = _partition_cols(src, "compact")
    df = spark.read.parquet(path)
    n_rows = df.count()
    files_before = len(list(src.rglob("*.parquet")))
    if n_rows == 0:
        # a legitimately 0-row table (delete_where removed every row and
        # left the explicit keeper file) has nothing to compact; an empty
        # rewrite would emit no part files and swap in an unreadable dir
        # (ADVICE r6)
        return {
            "n_rows": 0,
            "files_before": files_before,
            "files_after": files_before,
        }
    n_files = plan_target_files(n_rows, target_rows_per_file)

    if zorder_by:
        keyed, kname = zorder_key(df, zorder_by)
        out = (
            keyed.repartitionByRange(n_files, *pcols, kname)
            .sortWithinPartitions(*pcols, kname)
            .drop(kname)
        )
    elif sort_by:
        out = df.repartitionByRange(
            n_files, *pcols, *sort_by
        ).sortWithinPartitions(*pcols, *sort_by)
    else:
        out = df.repartition(n_files, *pcols) if pcols else df.repartition(n_files)

    tmp = src.with_name(src.name + ".compact-tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", target_rows_per_file
    )
    if pcols:
        # hive layout preserved: tasks are keyed on the partition
        # columns first (range- or hash-), so each writes into few
        # partition dirs instead of every task × every partition
        writer = writer.partitionBy(*pcols)
    writer.parquet(str(tmp))

    n_after = _count_tmp(spark, tmp)
    if n_after != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row mismatch for {path}: {n_rows} -> {n_after}; "
            "original left in place"
        )

    old = src.with_name(src.name + ".compact-old")
    if old.exists():
        shutil.rmtree(old)
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old)
    files_after = len(list(src.rglob("*.parquet")))
    return {
        "n_rows": n_rows,
        "files_before": files_before,
        "files_after": files_after,
    }


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
    n_files: int | None = None,
) -> None:
    """Write a parquet table laid out for pruning at read time.

    ``partition_by`` → hive-style directories: equality predicates on
    those columns never touch non-matching files (partition pruning,
    asserted plan-side in tests). ``cluster_by`` → range repartition +
    per-file sort: range predicates on those columns skip whole files
    via parquet min/max stats. ``target_rows_per_file`` caps file size
    regardless of partitioner skew. The two compose: partition on the
    low-cardinality query dimension (date, source), cluster on the
    high-cardinality one (timestamp, key) — the standard lakehouse
    layout recipe.
    """
    out = df
    if cluster_by:
        keys = list(partition_by or []) + list(cluster_by)
        if n_files is not None:
            out = out.repartitionByRange(n_files, *keys)
        else:
            out = out.repartitionByRange(*keys)
        out = out.sortWithinPartitions(*keys)
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", target_rows_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and bucket-sorted) on its join key.

    Bucketing is the co-location contract compaction can't give: every
    row with the same key hash lands in the same numbered bucket file,
    recorded in the catalog, so a join or aggregation on ``bucket_by``
    between two tables bucketed with the SAME count reads both sides
    already hash-distributed — Catalyst plans it with ZERO shuffle
    exchanges (asserted in tests/test_bucketed_join.py), and with
    ``sort=True`` the per-bucket sort also drops the SortMergeJoin's
    sort. At 100 TB this turns the nightly fact⋈fact reconciliation
    from two full-table shuffles into a file-aligned merge — the single
    biggest repeated-shuffle saving a warehouse layout can buy. The
    bucket count is chosen once per table pair (powers of two compose:
    in Spark 3.1+ bucket coalescing a 256-bucket table co-joins with a
    512-bucket one by coalescing the LARGER side down to the smaller
    count — size bucket counts so the smaller count still gives enough
    read parallelism).

    ``table`` is a (possibly db-qualified) catalog table name —
    bucketing metadata lives in the catalog, not the parquet footers,
    which is why this is saveAsTable and not a path write.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_by
    )
    if sort:
        writer = writer.sortBy(bucket_by)
    writer.saveAsTable(table)


def _partition_cols(src: Path, op: str) -> list[str]:
    """Partition-column names of a hive-layout table dir ([] if flat).

    Walks the ``key=value`` levels breadth-first across ALL sibling
    branches (not just the first — ADVICE r6): every level must agree
    on one partition key, carry no data files beside the partition
    dirs, and every branch must reach leaf files at the same depth.
    Any mixed layout — files-with-dirs, divergent keys, ragged depth —
    is corruption a hive writer never produces; rewriting under wrong
    assumptions makes the table unreadable ('Conflicting directory
    structures detected'), so we refuse loudly instead. The COW ops
    use this to (a) read affected leaf files with ``basePath`` so
    partition columns survive, (b) rewrite survivors with
    ``partitionBy`` so they land back in their partition dirs — the
    two steps whose absence silently corrupted partitioned tables
    before r6 (ADVICE r5)."""
    cols: list[str] = []
    level = [src]
    while True:
        subs: list[Path] = []
        files: list[Path] = []
        for d in level:
            for p in d.iterdir():
                if p.name.startswith(("_", ".")):
                    continue
                if p.is_dir():
                    subs.append(p)
                else:
                    # ANY non-hidden file beside partition dirs is a layout
                    # mix (ADVICE r7): a stray .csv/.json would corrupt or
                    # fail the subsequent Spark read/rewrite just as a
                    # .parquet would, so refuse on all of them.
                    files.append(p)
        if not subs:
            return cols
        keys = {p.name.split("=", 1)[0] for p in subs if "=" in p.name}
        if len(keys) != 1 or any("=" not in p.name for p in subs) or files:
            offending = sorted(p.name for p in subs)[:5] + sorted(
                f.name for f in files
            )[:5]
            raise ValueError(
                f"{op}: depth-{len(cols)} level of {src} is a non-hive "
                f"layout mix ({offending}); refusing to rewrite"
            )
        cols.append(keys.pop())
        level = subs


def _local_path(uri: str) -> Path:
    """input_file_name() returns a URI (file:///..., percent-encoded);
    resolve it to a local filesystem path for the swap step."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    return Path(unquote(parsed.path)) if parsed.scheme else Path(uri)


def delete_where(
    spark: SparkSession, path: str, predicate: "F.Column | str"
) -> dict[str, int]:
    """Targeted delete: remove rows matching ``predicate`` by rewriting
    ONLY the files that contain them (copy-on-write DELETE, the shape
    table formats use). At 100 TB the point is the file manifest: a
    retention or right-to-be-forgotten delete usually touches a sliver
    of files — with a key-clustered or partitioned layout the match
    predicate prunes to them — and every untouched file keeps its
    bytes, its footer stats and its page cache residency.

    Hive-partitioned layouts are fully supported (r6, ADVICE r5):
    affected leaf files re-read with ``basePath`` so partition columns
    survive, survivors rewritten with ``partitionBy`` and moved into
    their partition directories (a predicate on the partition column
    itself prunes the manifest scan to those directories). Deleting a
    partition's last row leaves its directory empty — harmless to
    readers, which list leaf files.

    Mechanics: one distributed scan lists the distinct files holding
    matching rows (``input_file_name`` — driver sees file NAMES only,
    bounded by file count, never rows); those files are re-read with the
    predicate negated and rewritten into a sibling temp dir; the swap
    replaces exactly the affected files after a row-count verification
    (survivors == affected - deleted), so a failed rewrite leaves the
    table untouched. On a real lakehouse the swap is the metastore
    commit; the local rename is its single-node analogue, same as
    ``compact``.

    Returns {"n_deleted", "files_touched", "files_total"}.
    """
    import uuid

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    src = Path(path)
    pcols = _partition_cols(src, "delete_where")
    df = spark.read.parquet(path)
    files_total = len(list(src.rglob("*.parquet")))

    hits = (
        df.withColumn("__f", F.input_file_name())
        .where(pred)
        .groupBy("__f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return {"n_deleted": 0, "files_touched": 0, "files_total": files_total}
    n_deleted = sum(r["n"] for r in hits)
    touched = [r["__f"] for r in hits]
    touched_local = [_local_path(f) for f in touched]

    # basePath keeps partition-directory columns on the pruned leaf read
    affected = spark.read.option("basePath", str(src)).parquet(*touched)
    n_affected = affected.count()
    # DELETE semantics under 3VL: only rows where the predicate is TRUE
    # go; a NULL-evaluating row survives (a bare ~pred would silently
    # drop it — the row would be neither counted deleted nor rewritten)
    survivors = affected.where(~pred.eqNullSafe(F.lit(True)))

    tmp = src.with_name(src.name + ".delete-tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = survivors.write
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(str(tmp))
    n_after = _count_tmp(spark, tmp)
    if n_after != n_affected - n_deleted:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"delete_where row mismatch for {path}: affected {n_affected}, "
            f"deleted {n_deleted}, rewrote {n_after}; original left in place"
        )

    # swap: new survivor files move in under fresh names (into their
    # partition dirs for a hive layout), then the affected originals go.
    # NOT atomic: a crash inside this window leaves survivor rows
    # present twice (new files in, originals not yet unlinked) and a
    # re-run only re-deletes predicate-TRUE rows — it cannot identify
    # the duplicated survivors. This multi-file swap window is exactly
    # what a table format's commit log exists to close; on a lakehouse,
    # delete_where's rewrite step would commit through it. Single-node
    # recovery: the fresh part-del-* names make the new files
    # identifiable next to the originals.
    _move_parts(tmp, src, f"part-del-{uuid.uuid4().hex[:12]}")
    for f in touched_local:
        f.unlink()
    if not any(src.rglob("*.parquet")):
        # deleting every row may leave zero part files (an empty write
        # emits none), and a parquet dir without leaf files is
        # unreadable — keep the table readable with one explicit 0-row
        # file at the root. For a hive layout the now-empty key=value
        # dirs must go FIRST: a root-level file coexisting with
        # partition dirs puts leaf files at two depths and Spark then
        # refuses the read with 'Conflicting directory structures
        # detected' (ADVICE r6). Flattening is total — every partition
        # is empty here — and the keeper's schema carries the partition
        # columns (df.schema includes them), so readers see the same
        # columns, zero rows, and later inserts re-create a consistent
        # flat table that _partition_cols reports as such.
        if pcols:
            for p in list(src.iterdir()):
                if p.is_dir() and not p.name.startswith(("_", ".")):
                    shutil.rmtree(p)
        spark.createDataFrame([], df.schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return {
        "n_deleted": n_deleted,
        "files_touched": len(touched),
        "files_total": files_total,
    }


def _count_tmp(spark: SparkSession, tmp: Path) -> int:
    """Row count of a rewrite's tmp dir; an empty write emits no part
    files at all (UNABLE_TO_INFER_SCHEMA on a plain read), which is a
    legitimate zero."""
    if not any(tmp.rglob("*.parquet")):
        return 0
    return spark.read.parquet(str(tmp)).count()


def _move_parts(tmp: Path, src: Path, stem: str) -> None:
    """Move every part file of ``tmp`` into ``src`` preserving relative
    (partition) directories, under fresh deterministic names; create
    partition dirs that did not exist before (MERGE inserting a new
    partition value)."""
    for i, f in enumerate(sorted(tmp.rglob("*.parquet"))):
        dest_dir = src / f.relative_to(tmp).parent
        dest_dir.mkdir(parents=True, exist_ok=True)
        f.rename(dest_dir / f"{stem}-{i:05d}.snappy.parquet")
    shutil.rmtree(tmp)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    evolve_schema: bool = False,
) -> dict[str, int]:
    """Copy-on-write MERGE: upsert ``updates`` into a parquet table by
    key, rewriting only the files that hold a matched row. Matched keys
    are replaced by their update row; unmatched update keys are
    appended. The nightly CDC-apply shape: with a key-clustered layout
    the matched keys prune to a sliver of files, every other file keeps
    its bytes.

    Same manifest/swap discipline as ``delete_where``: the affected-file
    list comes from ONE distributed scan (keys join, ``input_file_name``
    — the driver sees file names only), survivors are the affected rows
    anti-joined on the keys, and the swap lands survivors + ALL updates
    under fresh file names after a row-count verification. Updates must
    carry exactly the table schema; key columns must be non-null.

    Hive-partitioned layouts are fully supported (r6, ADVICE r5):
    affected files re-read with ``basePath``, the rewrite lands via
    ``partitionBy`` into partition dirs, and an update row carrying a
    NEW partition value creates its directory. An update that MOVES a
    row across partitions works through the same path (old row's file
    is matched and rewritten without it; the update lands in its new
    partition dir).

    ``evolve_schema=True`` enables ADDITIVE evolution (the Delta
    ``mergeSchema`` contract, r7 VERDICT #6): update columns missing
    from the table are appended as new nullable columns (existing rows
    read as NULL), and table columns missing from the updates are
    NULL-filled in the inserted/updated rows. Shared columns must keep
    their exact type — widening/renaming is rewriting, not evolution,
    and stays rejected. Untouched files are NOT rewritten to add the
    column (that would turn a sliver-merge into a full rewrite); the
    table's read contract after an evolution is
    ``spark.read.option("mergeSchema", "true")`` — exactly the
    parquet-without-a-metastore shape, asserted byte-identical in
    tests. Key columns must exist on both sides.

    Returns {"n_matched", "n_inserted", "files_touched", "files_total"}.
    """
    import uuid

    src = Path(path)
    pcols = _partition_cols(src, "merge_upsert")
    # mergeSchema: after a prior evolution the table's files are
    # legitimately heterogeneous; a single-footer schema pick would
    # silently drop the evolved columns from the merge itself
    df = spark.read.option("mergeSchema", "true").parquet(path)
    new_cols = [c for c in updates.columns if c not in df.columns]
    missing_cols = [c for c in df.columns if c not in updates.columns]
    if not evolve_schema and (new_cols or missing_cols):
        raise ValueError(
            f"merge_upsert schema mismatch: table {sorted(df.columns)} "
            f"vs updates {sorted(updates.columns)} (pass "
            "evolve_schema=True for additive evolution)"
        )
    if evolve_schema:
        if any(k not in updates.columns or k not in df.columns for k in key_cols):
            raise ValueError(
                f"merge_upsert: key columns {key_cols} must exist on both sides"
            )
        t_types = dict(df.dtypes)
        u_types = dict(updates.dtypes)
        clash = {
            c: (t_types[c], u_types[c])
            for c in updates.columns
            if c in t_types and t_types[c] != u_types[c]
        }
        if clash:
            raise ValueError(
                f"merge_upsert: type change is not additive evolution: {clash}"
            )
        # NULL-fill table columns the updates lack, with the TABLE's type
        for c in missing_cols:
            updates = updates.withColumn(c, F.lit(None).cast(t_types[c]))
    files_total = len(list(src.rglob("*.parquet")))

    keys = updates.select(*key_cols).distinct()
    n_updates = updates.count()
    if n_updates == 0:
        # an empty update set is a no-op; proceeding would write a
        # zero-file tmp dir that the verification read can't infer a
        # schema from (reachable from an empty foreachBatch micro-batch)
        return {
            "n_matched": 0,
            "n_inserted": 0,
            "files_touched": 0,
            "files_total": files_total,
        }
    if updates.select(*key_cols).distinct().count() != n_updates:
        raise ValueError("merge_upsert: duplicate keys in updates")

    hits = (
        df.withColumn("__f", F.input_file_name())
        .join(F.broadcast(keys), key_cols)
        .groupBy("__f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_matched = sum(r["n"] for r in hits)
    touched = [r["__f"] for r in hits]
    touched_local = [_local_path(f) for f in touched]

    if touched:
        affected = spark.read.option("basePath", str(src)).option(
            "mergeSchema", "true"
        ).parquet(*touched)
        n_affected = affected.count()
        survivors = affected.join(F.broadcast(keys), key_cols, "left_anti")
        # additive evolution: survivor rows predate the new columns —
        # they read as NULL, typed from the updates side
        u_types = dict(updates.dtypes)
        for c in (c for c in updates.columns if c not in survivors.columns):
            survivors = survivors.withColumn(c, F.lit(None).cast(u_types[c]))
    else:
        n_affected = 0
        survivors = None

    out = (
        survivors.unionByName(updates.select(*survivors.columns))
        if survivors is not None
        # align column order with the table, evolved columns last
        else updates.select(*(df.columns + new_cols))
    )
    tmp = src.with_name(src.name + ".merge-tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = out.write
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(str(tmp))
    n_after = _count_tmp(spark, tmp)
    if n_after != n_affected - n_matched + n_updates:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"merge_upsert row mismatch for {path}: affected {n_affected}, "
            f"matched {n_matched}, updates {n_updates}, rewrote {n_after}; "
            "original left in place"
        )

    # same non-atomic multi-file swap window as delete_where (see the
    # comment there): crash between move-in and unlink duplicates the
    # affected rows until the part-mrg-* files are reconciled
    _move_parts(tmp, src, f"part-mrg-{uuid.uuid4().hex[:12]}")
    for f in touched_local:
        f.unlink()
    return {
        "n_matched": n_matched,
        "n_inserted": n_updates - n_matched,
        "files_touched": len(touched),
        "files_total": files_total,
    }


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> dict[str, int]:
    """Collect catalog statistics for a table (optionally per-column
    histograms/NDV): the input the cost-based optimizer needs to choose
    join sides, broadcast thresholds and join order from DATA sizes
    rather than file sizes. At 100 TB the difference is a broadcast of
    the genuinely-small post-filter side vs a sort-merge of everything —
    run this after every large write or compaction, like ANALYZE in a
    warehouse.

    Returns {"row_count", "size_bytes"} as recorded in the catalog.
    """
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    row = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    stats = row.get("Statistics", "")
    out = {"row_count": 0, "size_bytes": 0}
    for part in stats.split(","):
        part = part.strip()
        if part.endswith("rows"):
            out["row_count"] = int(part.split()[0])
        elif part.endswith("bytes"):
            out["size_bytes"] = int(part.split()[0])
    return out
