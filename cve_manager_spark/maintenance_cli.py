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
