"""CLI parity layer (SURVEY §2.11, cve_manager.py:612-681).

Mirrors the reference's argparse surface and report formats onto the
Spark engine, minus its accidental bugs (§2.11): date-only queries work
without a dummy score, CPE queries don't exit(0) on passwordless auth,
and no SQL is ever string-concatenated.

Storage model: a parquet "warehouse" directory holding the four
relations (written by -p/-icwe, queried by -cve/-cwe/-sc/-dt/-cpe).
The Postgres flags are honored when a JDBC URL is supplied (-server),
but the engine is storage-agnostic.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame, SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CVEs Manager (PySpark engine).")
    p.add_argument("-p", "--parse", action="store_true", dest="process", help="Process downloaded CVEs.")
    p.add_argument("-d", "--download", action="store_true", dest="download", help="Download CVEs.")
    p.add_argument("-y", "--year", dest="year", default=None, help="Year to download (e.g. 2019)")
    p.add_argument("-csv", "--csv_files", action="store_true", dest="csv_file", help="Write reference-format CSV files.")
    p.add_argument("-icwe", "--import_cwe", dest="icwe", default=None, help="Import CWE catalog CSV.")
    p.add_argument("-idb", "--import_to_db", action="store_true", dest="idb", help="Import CVEs into the warehouse.")
    p.add_argument("-i", "--input", dest="input", default="nvd/", help="NVD feed directory (default: nvd/)")
    p.add_argument("-o", "--output", dest="results", default="results/", help="CSV output directory (default: results/)")
    p.add_argument("-w", "--warehouse", dest="warehouse", default="warehouse/", help="Parquet warehouse directory")
    # DB connection surface (cve_manager.py:622-627). The engine is
    # storage-agnostic: these route -idb/-icwe through the JDBC sink when a
    # jdbc: URL is supplied (via -jdbc, or -server/-host holding a jdbc: URL);
    # otherwise the parquet warehouse is the storage and they are inert.
    p.add_argument("-u", "--user", dest="user", default="postgres", help="The user to connect to the database.")
    p.add_argument("-ow", "--owner", dest="owner", default=None, help="The owner of the database (if different from the connected user).")
    p.add_argument("-host", "--host", dest="host", default=None, help="Database host for the query commands.")
    p.add_argument("-server", "--server", dest="server", default="localhost", help="The hostname or IP of the database server (or a full jdbc: URL).")
    p.add_argument("-db", "--database", dest="database", default="postgres", help="The name of the database.")
    p.add_argument("-jdbc", "--jdbc_url", dest="jdbc_url", default=None, help="Full JDBC URL; routes -idb/-icwe loads through the JDBC sink.")
    p.add_argument("-cd", "--create_database", action="store_true", dest="cd")
    p.add_argument("-dd", "--drop_database", action="store_true", dest="dd")
    p.add_argument("-ct", "--create_tables", action="store_true", dest="ct")
    p.add_argument("-tr", "--truncate_cves_tables", action="store_true", dest="tr")
    p.add_argument("-cve", "--cve_number", dest="cve", default=None)
    p.add_argument("-cpe", "--cpe", dest="cpe", default=None)
    p.add_argument("-cwe", "--cwe", dest="cwe", default=None)
    p.add_argument("-sc", "--score", dest="score", default=0.0, type=float)
    p.add_argument("-dt", "--date", dest="date", default=None)
    p.add_argument("-master", dest="master", default="local[*]")
    p.add_argument("-explain", action="store_true", dest="explain",
                   help="Print the physical plan instead of executing the query.")
    return p


def _warehouse_path(args, name: str) -> str:
    return os.path.join(args.warehouse, name)


def _jdbc_url(args) -> str | None:
    """JDBC routing: an explicit -jdbc URL wins; -server/-host holding a
    jdbc: URL also routes (the reference's server/host split maps onto
    load/query paths). A bare hostname stays in parquet-warehouse mode —
    never guess a DB out of the reference's localhost defaults."""
    for cand in (args.jdbc_url, args.server, args.host):
        if cand and cand.startswith("jdbc:"):
            return cand
    return None


def _store(df: "DataFrame", args, name: str) -> None:
    url = _jdbc_url(args)
    if url is not None:
        from cve_manager_spark.sources.sinks import write_jdbc

        write_jdbc(df, url, name, user=None if url.startswith("jdbc:derby") else args.user, mode="overwrite")
    else:
        df.write.mode("overwrite").parquet(_warehouse_path(args, name))


def _read(spark: SparkSession, args, name: str) -> DataFrame:
    return spark.read.parquet(_warehouse_path(args, name))


def cmd_process(spark: SparkSession, args) -> None:
    from cve_manager_spark.operators.flatten import flatten_all
    from cve_manager_spark.sources.nvd import read_feeds_json, read_feeds_zip
    from cve_manager_spark.sources.sinks import write_reference_csv

    zips = any(f.endswith(".zip") for f in os.listdir(args.input))
    glob = os.path.join(args.input, "*.zip" if zips else "*.json")
    feed = read_feeds_zip(spark, glob) if zips else read_feeds_json(spark, glob)
    # per-file header report (E3 parity, cve_manager.py:240-244)
    for r in (
        feed.select(
            "source_file", "CVE_data_timestamp", "CVE_data_version",
            "CVE_data_format", "CVE_data_numberOfCVEs", "CVE_data_type",
        )
        .orderBy("source_file")
        .collect()
    ):
        print("\nProcessing", os.path.basename(r["source_file"]))
        print("CVE_data_timestamp: " + str(r["CVE_data_timestamp"]))
        print("CVE_data_version: " + str(r["CVE_data_version"]))
        print("CVE_data_format: " + str(r["CVE_data_format"]))
        print("CVE_data_number of CVEs: " + str(r["CVE_data_numberOfCVEs"]))
        print("CVE_data_type: " + str(r["CVE_data_type"]))
    relations = flatten_all(feed)
    if args.csv_file:
        os.makedirs(args.results, exist_ok=True)
        names = {"cvss": "cve_cvss_scores", "cve_problem": "cve_related_problems", "cpe": "cve_cpes"}
        for rel, df in relations.items():
            write_reference_csv(df, os.path.join(args.results, names[rel] + ".csv"), names[rel])
    if args.idb:
        for rel, df in relations.items():
            _store(df, args, rel)


def cmd_import_cwe(spark: SparkSession, args) -> None:
    from cve_manager_spark.sources.cwe_csv import read_cwe_csv

    _store(read_cwe_csv(spark, args.icwe), args, "cwe")


def cmd_cve(spark: SparkSession, args) -> None:
    from cve_manager_spark.plans.cve_queries import cve_detail

    parts = cve_detail(
        _read(spark, args, "cvss"),
        _read(spark, args, "cve_problem"),
        _read(spark, args, "cpe"),
        _read(spark, args, "cwe"),
        args.cve,
    )
    row = parts["summary"].limit(1).collect()
    if not row:
        print("No CVE matched", args.cve)
        return
    r = row[0]
    print("CVE:\t\t\t", r["cve"])
    print("CVSSv3.x Attack vector: ", r["vector_string_3"])
    print("CVSSv3.x Base Score:\t", r["base_score_3"], r["base_severity_3"])
    print("CVSSv2.x Attack vector: ", r["vector_string"])
    print("CVSSv2.x Base Score:\t", r["base_score"], r["severity"])
    print("Description:")
    print(r["description"])
    print("\r\nPubished Date:\t\t", r["published_date"])
    print("Last Modified Date:\t", r["last_modified_date"])
    print("\r\nRelated Common Weakness Enumerations (CWE)")
    print("-------------------------------------------")
    for p in parts["problems"].collect():
        print(p["problem"], p["cwe_name"] if p["cwe_name"] else "")
    print("\r\nRelated Common Platform Enumerations (CPE)")
    print("-------------------------------------------")
    for c in parts["cpes"].collect():
        print(c["cpe23uri"])


def cmd_score_date(spark: SparkSession, args) -> None:
    from cve_manager_spark.plans.cve_queries import cves_by_score_date
    from cve_manager_spark.sources.sinks import export_results

    df = cves_by_score_date(_read(spark, args, "cvss"), args.score, args.date)
    if args.explain:
        df.explain("formatted")
        return
    header = "CVE \t\tCVSSv3.x Score CVSSv3.x Vector String \t\t\tCVSSv2 Score CVSSv2 Vector String"
    print(header + ("\t\t\t Published Date" if args.date else ""))
    for r in df.collect():
        print(r["cve"], r["base_score_3"], r["vector_string_3"], r["base_score"], r["vector_string"], r["published_date"])
    if args.csv_file:
        export_results(df, os.path.join(args.results, f"CVEs_score{args.score}_{args.date}.csv"))


def cmd_cpe(spark: SparkSession, args) -> None:
    from cve_manager_spark.plans.cve_queries import cves_by_cpe, cvss_vs_cpes
    from cve_manager_spark.sources.sinks import export_results

    view = cvss_vs_cpes(_read(spark, args, "cvss"), _read(spark, args, "cpe"))
    df = cves_by_cpe(view, args.cpe, args.score, args.date)
    if args.explain:
        df.explain("formatted")
        return
    print("CPE\t\t\t\t\t\t\tCVE\t\tCVSSv3.x CVSSv2\t Published Date")
    for r in df.collect():
        print(r["cpe23uri"], r["cve"], r["base_score_3"], "\t", r["base_score"], "\t", r["published_date"])
    if args.csv_file:
        export_results(df, os.path.join(args.results, f"{args.cpe}_{args.score}_{args.date}.csv"))


def cmd_cwe_detail(spark: SparkSession, args) -> None:
    from cve_manager_spark.plans.cve_queries import cwe_detail

    rows = cwe_detail(_read(spark, args, "cwe"), int(args.cwe)).limit(1).collect()
    if not rows:
        print("No CWE matched", args.cwe)
        return
    r = rows[0]
    print(f"CWE-{r['cwe_id']}")
    print("========")
    print(r["name"])
    for col, title in (
        ("description", None),
        ("extended_description", None),
        ("modes_of_introduction", "Modes of Introduction"),
        ("common_consequences", "Common Consequences"),
        ("potential_mitigations", "Potential Mitigations"),
    ):
        if r[col]:
            if title:
                print(f"\r\n{title}")
                print("-" * len(title))
            print(r[col])


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from cve_manager_spark.session import get_session

    spark = get_session("cve_manager_spark-cli", master=args.master)
    try:
        if args.download:
            from cve_manager_spark.sources.nvd import download_feeds

            download_feeds(args.input, args.year)
        if args.process:
            cmd_process(spark, args)
        if args.icwe:
            cmd_import_cwe(spark, args)
        if args.cpe:
            cmd_cpe(spark, args)
        elif args.cwe:
            cmd_cwe_detail(spark, args)
        elif args.cve or args.score > 0.0 or args.date:
            if args.cve:
                cmd_cve(spark, args)
            else:
                cmd_score_date(spark, args)
        elif not (args.download or args.process or args.icwe or args.cd or args.ct or args.dd or args.tr):
            print("Choose an option (check --help)")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
