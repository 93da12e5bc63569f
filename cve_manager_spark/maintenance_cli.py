"""CLI for warehouse maintenance: inspect and compact parquet tables.

The operational face of ``maintenance.py`` — the command an operator (or
a scheduler) runs against a lake table between ingest batches:

    python -m cve_manager_spark.maintenance_cli stats --path /lake/events
    python -m cve_manager_spark.maintenance_cli compact --path /lake/events \
        --target-rows 1000000 --zorder-by user_id,event_id

``stats`` prints one JSON line: file count, row count, and the
smallest/largest/median file sizes in rows — the numbers that decide
whether a compaction is worth scheduling. ``compact`` rewrites (atomic
swap, row-verified; see maintenance.compact) and prints the before/after
manifest. Both emit exactly one JSON object on stdout so they compose
with schedulers and shell pipelines the way bench.py does.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Parquet table maintenance.")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("stats", help="Per-file row-count profile of a table.")
    ps.add_argument("--path", required=True)
    ps.add_argument("-master", dest="master", default="local[*]")

    pc = sub.add_parser("compact", help="Rewrite a table into target-sized files.")
    pc.add_argument("--path", required=True)
    pc.add_argument("--target-rows", type=int, required=True)
    pc.add_argument(
        "--sort-by", default=None, help="Comma-separated range-cluster columns."
    )
    pc.add_argument(
        "--zorder-by",
        default=None,
        help="Comma-separated columns for multi-dimensional Z-order clustering.",
    )
    pc.add_argument("-master", dest="master", default="local[*]")

    pd = sub.add_parser(
        "delete",
        help="Copy-on-write DELETE: rewrite only the files with matching rows.",
    )
    pd.add_argument("--path", required=True)
    pd.add_argument(
        "--where",
        required=True,
        help="SQL predicate; rows where it is TRUE are deleted "
        "(e.g. \"user_id = 42\" for an erasure request).",
    )
    pd.add_argument("-master", dest="master", default="local[*]")

    pm = sub.add_parser(
        "merge",
        help="Copy-on-write MERGE (CDC apply): upsert an updates parquet "
        "dir into a table by key, rewriting only matched files.",
    )
    pm.add_argument("--path", required=True, help="Target table directory.")
    pm.add_argument("--updates", required=True, help="Updates parquet directory.")
    pm.add_argument(
        "--keys", required=True, help="Comma-separated merge key columns."
    )
    pm.add_argument("-master", dest="master", default="local[*]")

    pa = sub.add_parser(
        "analyze",
        help="ANALYZE TABLE: collect row/size (and per-column) statistics "
        "for the cost-based optimizer.",
    )
    pa.add_argument("--table", required=True, help="Catalog table name.")
    pa.add_argument(
        "--columns", default=None, help="Comma-separated columns for NDV stats."
    )
    pa.add_argument("-master", dest="master", default="local[*]")

    pp = sub.add_parser(
        "set-partitioning",
        help="Partition evolution on a commit-logged table: metadata-only "
        "commit recording the new layout; new writes use it, readers "
        "compose mixed layouts, compaction migrates.",
    )
    pp.add_argument("--path", required=True, help="Commit-logged table dir.")
    pp.add_argument(
        "--by",
        required=True,
        help="Comma-separated partition columns; empty string = flat.",
    )
    pp.add_argument("-master", dest="master", default="local[*]")

    pt = sub.add_parser(
        "cdf",
        help="Change data feed of a commit-logged table between two "
        "versions (insert/delete rows, or keyed update pre/post pairs).",
    )
    pt.add_argument("--path", required=True)
    pt.add_argument("--from", dest="v_from", type=int, default=None)
    pt.add_argument("--to", dest="v_to", type=int, default=None)
    pt.add_argument(
        "--from-ts", dest="ts_from", type=float, default=None,
        help="Resolve the FROM side from a unix timestamp instead "
        "(AS OF TIMESTAMP; exclusive with --from).",
    )
    pt.add_argument(
        "--to-ts", dest="ts_to", type=float, default=None,
        help="Resolve the TO side from a unix timestamp.",
    )
    pt.add_argument(
        "--keys", default=None,
        help="Comma-separated key columns for Delta-style update pairs.",
    )
    pt.add_argument(
        "--out", default=None,
        help="Parquet dir to write the feed to (stdout JSON reports "
        "counts either way).",
    )
    pt.add_argument(
        "--where-col", default=None,
        help="Bound the feed to rows where this column is in "
        "[--lo, --hi] — entering/leaving files outside the range are "
        "zone-map pruned, never opened.",
    )
    pt.add_argument("--lo", default=None, help="Lower bound (inclusive).")
    pt.add_argument("--hi", default=None, help="Upper bound (inclusive).")
    pt.add_argument("-master", dest="master", default="local[*]")

    pl = sub.add_parser(
        "log-delete",
        help="Committed DELETE on a commit-logged table: copy-on-write "
        "by default; --mor writes merge-on-read position deletes "
        "instead (zero data files rewritten — the O(deleted-rows) "
        "path for small deletes on huge tables; compact materializes "
        "them later).",
    )
    pl.add_argument("--path", required=True, help="Commit-logged table dir.")
    pl.add_argument(
        "--where", required=True,
        help="SQL predicate; rows where it is TRUE are deleted.",
    )
    pl.add_argument(
        "--mor", action="store_true",
        help="Merge-on-read: record position deletes instead of "
        "rewriting the touched files.",
    )
    pl.add_argument("-master", dest="master", default="local[*]")

    pu = sub.add_parser(
        "log-update",
        help="Committed merge-on-read UPDATE ... SET on a commit-logged "
        "table: position deletes for the old images + appended new "
        "images, one atomic commit, zero files rewritten.",
    )
    pu.add_argument("--path", required=True, help="Commit-logged table dir.")
    pu.add_argument(
        "--where", required=True,
        help="SQL predicate selecting the rows to update.",
    )
    pu.add_argument(
        "--set", required=True, dest="set_exprs",
        help="Comma-separated col=SQL-expression assignments, e.g. "
        "\"score=score*2,flag=true\" (split on the FIRST '=' of each).",
    )
    pu.add_argument("-master", dest="master", default="local[*]")

    pv = sub.add_parser(
        "log-dv-status",
        help="Merge-on-read health report (metadata-only): deleted "
        "fraction, delete-file count, and whether to compact "
        "(materialize) or consolidate-deletes.",
    )
    pv.add_argument("--path", required=True, help="Commit-logged table dir.")
    pv.add_argument(
        "--apply", action="store_true",
        help="Act on the recommendations: consolidate and/or compact "
        "(compact target 1M rows/file unless --target-rows).",
    )
    pv.add_argument("--target-rows", type=int, default=1_000_000)
    pv.add_argument("-master", dest="master", default="local[*]")

    pk = sub.add_parser(
        "log-constraint",
        help="CHECK constraints on a commit-logged table: --add "
        "name=expr validates existing data then enforces on every "
        "future write; --drop name removes; no flags lists.",
    )
    pk.add_argument("--path", required=True, help="Commit-logged table dir.")
    pk.add_argument(
        "--add", default=None,
        help="name=SQL-expression (split on the first '='), e.g. "
        "\"score_pos=score >= 0\".",
    )
    pk.add_argument("--drop", default=None, help="Constraint name to drop.")
    pk.add_argument("-master", dest="master", default="local[*]")

    pr = sub.add_parser(
        "drift-retrain",
        help="Drift-triggered ANN index rebuild: read the committed "
        "IVF-PQ index's CDF-derived per-cell drift report and, over "
        "threshold, retrain + republish atomically.",
    )
    pr.add_argument("--path", required=True, help="Committed index dir.")
    pr.add_argument(
        "--corpus", required=True, help="Current corpus parquet dir "
        "(vec_id + embedding columns).",
    )
    pr.add_argument("--threshold-ppm", type=int, default=300_000)
    pr.add_argument("--min-cells", type=int, default=1)
    pr.add_argument("-master", dest="master", default="local[*]")

    pg = sub.add_parser(
        "catalog-status",
        help="Multi-table catalog: current version, per-table pins, "
        "per-table drift vs the tables' own heads, dangling intents.",
    )
    pg.add_argument("--catalog", required=True, help="Catalog log dir.")
    pg.add_argument("-master", dest="master", default="local[*]")

    pq = sub.add_parser(
        "catalog-reconcile",
        help="Repair multi-table-transaction crash debris: roll forward "
        "intents, roll back orphaned table commits, re-pin.",
    )
    pq.add_argument("--catalog", required=True)
    pq.add_argument(
        "--min-age", type=float, default=600.0,
        help="Orphaned table commits whose transaction's start marker "
        "is younger than this many seconds are SKIPPED (an in-flight "
        "writer, not crash debris). Pass 0 only when no writer can be "
        "in flight.",
    )
    pq.add_argument("-master", dest="master", default="local[*]")

    pa = sub.add_parser(
        "catalog-add-table",
        help="Register a commit-logged table in the catalog (a catalog "
        "commit pinning its current version; history and tags keep).",
    )
    pa.add_argument("--catalog", required=True)
    pa.add_argument("--table", required=True, help="Name in the catalog.")
    pa.add_argument("--path", required=True, help="Table log directory.")
    pa.add_argument("-master", dest="master", default="local[*]")

    pd = sub.add_parser(
        "catalog-drop-table",
        help="Unregister a table from the catalog head (older versions "
        "and tags that pin it stay readable; nothing is deleted).",
    )
    pd.add_argument("--catalog", required=True)
    pd.add_argument("--table", required=True)
    pd.add_argument("-master", dest="master", default="local[*]")

    pz = sub.add_parser(
        "catalog-sync",
        help="Adopt out-of-band commits on one table into the catalog "
        "(single-table pin advance).",
    )
    pz.add_argument("--catalog", required=True)
    pz.add_argument("--table", required=True)
    pz.add_argument("-master", dest="master", default="local[*]")

    py = sub.add_parser(
        "catalog-tag",
        help="Name the current (or a given) catalog snapshot; tags are "
        "immutable, survive catalog-vacuum, and resolve in reads.",
    )
    py.add_argument("--catalog", required=True)
    py.add_argument("--name", required=True)
    py.add_argument("--version", type=int, default=None)
    py.add_argument(
        "--delete", action="store_true", help="Delete the tag instead."
    )
    py.add_argument("-master", dest="master", default="local[*]")

    pb = sub.add_parser(
        "catalog-branch",
        help="Fork a writable branch of a catalog snapshot (zero-copy: "
        "hard-linked data files, forked manifests, fork point "
        "recorded for merge).",
    )
    pb.add_argument("--catalog", required=True)
    pb.add_argument(
        "--dest", default=None,
        help="Branch tree directory (one dir per table + catalog/). "
        "Omit with --list / --delete-branch.",
    )
    pb.add_argument("--version", type=int, default=None)
    pb.add_argument("--tag", default=None)
    pb.add_argument(
        "--list", action="store_true", dest="list_branches",
        help="List registered branches instead of forking.",
    )
    pb.add_argument(
        "--delete-branch", default=None, metavar="DEST",
        help="Delete a registered branch tree (hard links make this "
        "safe for main's data) and retire its registration.",
    )
    pb.add_argument("-master", dest="master", default="local[*]")

    pm = sub.add_parser(
        "catalog-merge",
        help="Merge a branch back into its upstream catalog: snapshot "
        "cherry-pick of every changed table as one atomic catalog "
        "commit; conflicts (a table moved on main since the fork) "
        "exit loudly with a rebase instruction.",
    )
    pm.add_argument("--catalog", required=True, help="The MAIN catalog.")
    pm.add_argument("--branch", required=True,
                    help="The branch's catalog dir (…/catalog).")
    pm.add_argument("-master", dest="master", default="local[*]")

    pv = sub.add_parser(
        "catalog-vacuum",
        help="Catalog-aware retention: drop old catalog versions, then "
        "vacuum each table keeping every version a surviving catalog "
        "snapshot still pins (the only safe table vacuum under a "
        "catalog).",
    )
    pv.add_argument("--catalog", required=True)
    pv.add_argument("--keep", type=int, default=2)
    pv.add_argument("--min-age", type=float, default=600.0)
    pv.add_argument("-master", dest="master", default="local[*]")

    args = p.parse_args(argv)

    from cve_manager_spark import maintenance
    from cve_manager_spark.session import get_session

    spark = get_session("maintenance", master=args.master)

    if args.cmd == "delete":
        out = dict(
            maintenance.delete_where(spark, args.path, args.where),
            path=args.path,
        )
    elif args.cmd == "merge":
        updates = spark.read.parquet(args.updates)
        out = dict(
            maintenance.merge_upsert(
                spark, args.path, updates,
                key_cols=[c for c in args.keys.split(",") if c],
            ),
            path=args.path,
        )
    elif args.cmd == "analyze":
        cols = [c for c in args.columns.split(",") if c] if args.columns else None
        out = dict(
            maintenance.analyze_table(spark, args.table, columns=cols),
            table=args.table,
        )
    elif args.cmd == "set-partitioning":
        from cve_manager_spark.commitlog import TableLog

        pcols = [c for c in args.by.split(",") if c]
        out = dict(
            TableLog(args.path).set_partitioning(spark, pcols),
            path=args.path,
        )
    elif args.cmd == "cdf":
        from pyspark.sql import functions as F

        from cve_manager_spark.commitlog import TableLog

        keys = [c for c in args.keys.split(",") if c] if args.keys else None

        def _bound(s):
            if s is None:
                return None
            for cast in (int, float):
                try:
                    return cast(s)
                except ValueError:
                    continue
            return s  # string bound (dates, ids) compares lexically

        where = (
            {args.where_col: (_bound(args.lo), _bound(args.hi))}
            if args.where_col
            else None
        )
        log = TableLog(args.path)
        v_from, v_to = args.v_from, args.v_to
        if args.ts_from is not None:
            if v_from is not None:
                raise SystemExit("cdf: pass --from or --from-ts, not both")
            v_from = log.version_at(args.ts_from)
        if args.ts_to is not None:
            if v_to is not None:
                raise SystemExit("cdf: pass --to or --to-ts, not both")
            v_to = log.version_at(args.ts_to)
        if v_from is None:
            raise SystemExit("cdf: --from or --from-ts is required")
        ch = log.changes(
            spark, v_from, v_to, key_cols=keys, where=where
        )
        if args.out:
            ch.write.mode("overwrite").parquet(args.out)
        by_type = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out = {
            "path": args.path,
            "v_from": v_from,
            "v_to": v_to,
            "changes_by_type": by_type,
            "written_to": args.out,
        }
    elif args.cmd == "log-delete":
        from cve_manager_spark.commitlog import TableLog

        log = TableLog(args.path)
        res = (
            log.delete_where_mor(spark, args.where)
            if args.mor
            else log.delete_where(spark, args.where)
        )
        out = dict(res, path=args.path, mode="mor" if args.mor else "cow")
    elif args.cmd == "log-update":
        from cve_manager_spark.commitlog import TableLog

        sets = {}
        for part in args.set_exprs.split(","):
            col, _, expr = part.partition("=")
            if not col.strip() or not expr:
                raise SystemExit(
                    f"--set: malformed assignment {part!r} "
                    "(want col=expression)"
                )
            sets[col.strip()] = expr
        res = TableLog(args.path).update_where_mor(
            spark, args.where, sets
        )
        out = dict(res, path=args.path)
    elif args.cmd == "log-dv-status":
        from cve_manager_spark.commitlog import TableLog

        log = TableLog(args.path)
        status = log.dv_status()
        actions = []
        if args.apply:
            if status["consolidate"]:
                actions.append(dict(
                    log.consolidate_deletes(spark), action="consolidate"
                ))
            if status["materialize"]:
                actions.append(dict(
                    log.compact(spark, args.target_rows),
                    action="compact",
                ))
        out = dict(status, path=args.path, applied=actions)
    elif args.cmd == "log-constraint":
        from cve_manager_spark.commitlog import TableLog

        log = TableLog(args.path)
        if args.add and args.drop:
            raise SystemExit("log-constraint: pass --add or --drop, not both")
        if args.add:
            cname, _, cexpr = args.add.partition("=")
            if not cname.strip() or not cexpr:
                raise SystemExit(
                    f"--add: malformed {args.add!r} (want name=expression)"
                )
            out = dict(log.set_constraint(spark, cname.strip(), cexpr),
                       path=args.path)
        elif args.drop:
            out = dict(log.drop_constraint(args.drop), path=args.path)
        else:
            out = {"path": args.path, "constraints": log.constraints_of()}
    elif args.cmd == "drift-retrain":
        from cve_manager_spark.operators.similarity import (
            ivf_pq_drift_retrain,
        )

        corpus = spark.read.parquet(args.corpus)
        out = dict(
            ivf_pq_drift_retrain(
                spark, args.path, corpus,
                threshold_ppm=args.threshold_ppm,
                min_cells=args.min_cells,
            ),
            path=args.path,
        )
    elif args.cmd == "catalog-status":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        v, pins = cat.snapshot()
        tables = {}
        for name, pin in pins.items():
            tlog = cat.table_log(name)
            head = tlog.latest_version()
            tables[name] = {
                "pinned_version": pin,
                "table_head": head,
                "out_of_band_commits": head - pin,
                # exact, metadata-only (write-time sidecar counts)
                "rows_at_pin": tlog.row_count(version=pin),
            }
        out = {
            "catalog": args.catalog,
            "catalog_version": v,
            "tables": tables,
            "tags": cat.tags(),
            "dangling_intents": sorted(
                p.name for p in cat.root.glob("intent-*.json")
            ),
        }
    elif args.cmd == "catalog-tag":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        if args.delete:
            cat.delete_tag(args.name)
            out = {"catalog": args.catalog, "deleted": args.name}
        else:
            out = {
                "catalog": args.catalog,
                "tag": args.name,
                "version": cat.tag(args.name, version=args.version),
            }
    elif args.cmd == "catalog-reconcile":
        from cve_manager_spark.catalogtx import CatalogLog

        out = dict(
            CatalogLog(args.catalog).reconcile(
                min_age_seconds=args.min_age
            ),
            catalog=args.catalog,
        )
    elif args.cmd == "catalog-add-table":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        out = {
            "catalog": args.catalog,
            "table": args.table,
            "catalog_version": cat.add_table(args.table, args.path),
        }
    elif args.cmd == "catalog-drop-table":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        out = {
            "catalog": args.catalog,
            "table": args.table,
            "catalog_version": cat.drop_table(args.table),
        }
    elif args.cmd == "catalog-sync":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        out = {
            "catalog": args.catalog,
            "table": args.table,
            "catalog_version": cat.sync_table(args.table),
        }
    elif args.cmd == "catalog-branch":
        from cve_manager_spark.catalogtx import CatalogLog

        cat = CatalogLog(args.catalog)
        if args.list_branches:
            out = {"catalog": args.catalog, "branches": cat.branches()}
        elif args.delete_branch:
            out = dict(cat.delete_branch(args.delete_branch),
                       catalog=args.catalog)
        else:
            if not args.dest:
                raise SystemExit(
                    "catalog-branch: --dest required (or --list / "
                    "--delete-branch)"
                )
            br = cat.branch(args.dest, version=args.version, tag=args.tag)
            out = {
                "catalog": args.catalog,
                "branch": str(br.root),
                "tables": sorted(br.snapshot()[1]),
            }
    elif args.cmd == "catalog-merge":
        from cve_manager_spark.catalogtx import CatalogLog

        out = dict(
            CatalogLog(args.catalog).merge_branch(
                CatalogLog(args.branch)
            ),
            catalog=args.catalog,
            branch=args.branch,
        )
    elif args.cmd == "catalog-vacuum":
        from cve_manager_spark.catalogtx import CatalogLog

        out = dict(
            CatalogLog(args.catalog).vacuum(
                keep_versions=args.keep, min_age_seconds=args.min_age
            ),
            catalog=args.catalog,
        )
    elif args.cmd == "stats":
        rows = maintenance.file_stats(spark, args.path).collect()
        counts = sorted(r.n_rows for r in rows)
        out = {
            "path": args.path,
            "n_files": len(counts),
            "n_rows": sum(counts),
            "min_file_rows": counts[0] if counts else 0,
            "median_file_rows": counts[len(counts) // 2] if counts else 0,
            "max_file_rows": counts[-1] if counts else 0,
        }
    else:
        split = lambda s: [c for c in s.split(",") if c] if s else None  # noqa: E731
        out = dict(
            maintenance.compact(
                spark,
                args.path,
                args.target_rows,
                sort_by=split(args.sort_by),
                zorder_by=split(args.zorder_by),
            ),
            path=args.path,
        )

    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
