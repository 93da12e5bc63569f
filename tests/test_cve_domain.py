"""End-to-end CVE-domain tests: fixture feed → flatten → parity queries,
CWE CSV ingest, catalog DDL, and the reference-format CSV sink."""

from __future__ import annotations

import os

import pytest

from cve_manager_spark.operators.flatten import flatten_all
from cve_manager_spark.plans.cve_queries import (
    cve_detail,
    cves_by_cpe,
    cves_by_score_date,
    cvss_vs_cpes,
    cwe_detail,
)
from cve_manager_spark.sources.cwe_csv import read_cwe_csv
from cve_manager_spark.sources.nvd import read_feeds_json
from cve_manager_spark.sources.sinks import write_reference_csv

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def relations(spark):
    feed = read_feeds_json(spark, os.path.join(FIXDIR, "nvd_feed_fixture.json"))
    rels = flatten_all(feed)
    rels["cwe"] = read_cwe_csv(spark, os.path.join(FIXDIR, "cwe_1000_fixture.csv"))
    return rels


def test_cwe_csv_positional_projection(relations):
    cwe = relations["cwe"]
    assert cwe.columns == [
        "cwe_id", "name", "description", "extended_description",
        "modes_of_introduction", "common_consequences", "potential_mitigations",
    ]
    rows = {r["cwe_id"]: r for r in cwe.collect()}
    assert set(rows) == {89, 79, 352}
    assert rows[89]["name"].startswith("Improper Neutralization of Special Elements")
    # multiline quoted field preserved (positional col 16)
    assert "vetted library" in rows[89]["potential_mitigations"]
    # empty optional fields come through as NULL-ish/empty (conditional
    # print sections, cve_manager.py:551-566)
    assert not rows[352]["common_consequences"]


def test_cve_detail_sections(relations):
    parts = cve_detail(
        relations["cvss"], relations["cve_problem"], relations["cpe"],
        relations["cwe"], "CVE-2021-0001",
    )
    s = parts["summary"].collect()
    assert len(s) == 1 and s[0]["base_score_3"] == 9.8
    probs = {(r["problem"], r["cwe_name"]) for r in parts["problems"].collect()}
    # numeric label joins to the catalog name; non-numeric label survives
    # with NULL name (left-join parity with :422-423)
    assert ("NVD-CWE-noinfo", None) in probs
    assert any(p == "CWE-89" and n and "SQL Injection" in n for p, n in probs)
    cpes = {r["cpe23uri"] for r in parts["cpes"].collect()}
    # vulnerable='True' only (:424): the 'False' entry is excluded
    assert cpes == {
        "cpe:2.3:a:v1:p1:1.0:*:*:*:*:*:*:*",
        "cpe:2.3:o:v2:os:2.0:*:*:*:*:*:*:*",
    }


def test_cves_by_score_date(relations):
    # score 8: V3-only and full rows match on the V3 arm; V2-only rows
    # (7.5) don't reach 8 → 3VL OR semantics (:434)
    hi = {r["cve"] for r in cves_by_score_date(relations["cvss"], 8.0).collect()}
    assert "CVE-2021-0002" not in hi and "CVE-2021-0003" in hi
    # score 7: V2-only row matches via the V2 arm
    mid = {r["cve"] for r in cves_by_score_date(relations["cvss"], 7.0).collect()}
    assert "CVE-2021-0002" in mid
    # date bound excludes nothing here (all published 2021-01-15), then a
    # later bound excludes everything
    assert cves_by_score_date(relations["cvss"], 7.0, "2021-01-15").count() == len(mid)
    assert cves_by_score_date(relations["cvss"], 7.0, "2021-06-01").count() == 0


def test_cves_by_cpe_over_view(relations):
    view = cvss_vs_cpes(relations["cvss"], relations["cpe"])
    assert view.columns == [
        "cve", "base_score_3", "base_severity_3", "base_score", "severity",
        "cpe23uri", "description", "published_date",
    ]
    got = cves_by_cpe(view, "v1:p1", 5.0).collect()
    # only the vulnerable=True v1:p1 entry (the 'False' one is filtered by
    # the view, :90)
    assert [r["cpe23uri"] for r in got] == ["cpe:2.3:a:v1:p1:1.0:*:*:*:*:*:*:*"]


def test_cwe_detail_point_lookup(relations):
    rows = cwe_detail(relations["cwe"], 79).collect()
    assert len(rows) == 1 and "Cross-site Scripting" in rows[0]["name"]


def test_reference_csv_sink(relations, tmp_path):
    out = tmp_path / "cve_cpes.csv"
    write_reference_csv(relations["cpe"], str(out), "cve_cpes")
    lines = out.read_text(encoding="utf8").splitlines()
    assert lines[0] == "CVE\tcpe23Uri\tVulnerable"
    assert len(lines) == 1 + relations["cpe"].count()
    assert any(line.endswith("\tFalse") for line in lines[1:])


def test_catalog_ddl_roundtrip(spark, relations, tmp_path):
    from cve_manager_spark import catalog

    db = "cve_test"
    catalog.drop_database(spark, db)
    catalog.create_tables(spark, db)
    try:
        catalog.load_tables(spark, {"cvss": relations["cvss"]}, db=db)
        assert spark.table(f"{db}.cvss").count() == 10
        # view exists and is queryable (empty: no cpe rows loaded)
        assert spark.table(f"{db}.cvss_vs_cpes").count() == 0
        catalog.load_tables(spark, {"cpe": relations["cpe"]}, db=db)
        assert spark.table(f"{db}.cvss_vs_cpes").count() == 4  # vulnerable=True rows
        # truncate clears cve tables but keeps cwe (D4 semantics)
        catalog.load_tables(spark, {"cwe": relations["cwe"]}, db=db)
        catalog.truncate_cve_tables(spark, db)
        assert spark.table(f"{db}.cvss").count() == 0
        assert spark.table(f"{db}.cwe").count() == 3
    finally:
        catalog.drop_database(spark, db)


def test_sql_surface_over_views(spark, relations):
    """The spark.sql surface works over registered views — the engine's
    equivalent of the reference's psql access path."""
    for name in ("cvss", "cpe", "cve_problem", "cwe"):
        relations[name].createOrReplaceTempView(name)
    got = spark.sql(
        """
        SELECT c.cve, c.base_score_3, p.cpe23uri
        FROM cvss c JOIN cpe p ON c.cve = p.cve
        WHERE p.vulnerable = 'True' AND c.base_score_3 >= 9
        ORDER BY c.cve, p.cpe23uri
        """
    ).collect()
    assert [(r["cve"], r["cpe23uri"]) for r in got] == [
        ("CVE-2021-0001", "cpe:2.3:a:v1:p1:1.0:*:*:*:*:*:*:*"),
        ("CVE-2021-0001", "cpe:2.3:o:v2:os:2.0:*:*:*:*:*:*:*"),
        ("CVE-2021-0008", "cpe:2.3:a:v3:p3:3.0:*:*:*:*:*:*:*"),
        ("CVE-2021-0009", "cpe:2.3:a:v4:child:1.0:*:*:*:*:*:*:*"),
    ]


def test_run_refresh_pipeline(spark):
    """Library-level refresh: feeds → flatten → catalog, truncate-keeps-cwe
    across two refreshes (the reference's -tr + -p -idb cycle)."""
    import os

    from cve_manager_spark import catalog, refresh

    db = "cve_refresh_test"
    catalog.drop_database(spark, db)
    try:
        counts = refresh.run_refresh(
            spark, os.path.join(FIXDIR, "nvd_feed_fixture.json"), db=db
        )
        assert counts == {"cvss": 10, "cve_problem": 13, "cpe": 5}
        # second refresh: truncate + reload, not append-duplication
        counts2 = refresh.run_refresh(
            spark, os.path.join(FIXDIR, "nvd_feed_fixture.json"), db=db
        )
        assert counts2 == counts
        # view queryable after refresh
        assert spark.table(f"{db}.cvss_vs_cpes").count() == 4
    finally:
        catalog.drop_database(spark, db)


def test_incremental_refresh(spark, tmp_path):
    """File-level incremental refresh: new feed files append; already
    loaded files are skipped (refresh_log anti-join)."""
    import json
    import shutil

    from cve_manager_spark import catalog, refresh

    db = "cve_incr_test"
    catalog.drop_database(spark, db)
    d = tmp_path / "feeds"
    d.mkdir()
    shutil.copy(os.path.join(FIXDIR, "nvd_feed_fixture.json"), d / "nvdcve-1.1-2021.json")
    try:
        c1 = refresh.run_refresh(spark, f"{d}/*.json", db=db, incremental=True)
        assert c1["cvss"] == 10
        # re-run with no new files: nothing appended
        c2 = refresh.run_refresh(spark, f"{d}/*.json", db=db, incremental=True)
        assert c2 == c1
        # add a second (distinct-ids) feed file: only its rows append
        feed = json.load(open(os.path.join(FIXDIR, "nvd_feed_fixture.json")))
        for item in feed["CVE_Items"]:
            item["cve"]["CVE_data_meta"]["ID"] = item["cve"]["CVE_data_meta"]["ID"].replace(
                "CVE-2021", "CVE-2022"
            )
        (d / "nvdcve-1.1-2022.json").write_text(json.dumps(feed))
        c3 = refresh.run_refresh(spark, f"{d}/*.json", db=db, incremental=True)
        assert c3["cvss"] == 20 and c3["cve_problem"] == 26
        # full refresh resets and reloads everything exactly once
        c4 = refresh.run_refresh(spark, f"{d}/*.json", db=db, incremental=False)
        assert c4["cvss"] == 20
    finally:
        catalog.drop_database(spark, db)


def test_flattener_runs_under_structured_streaming(spark, tmp_path):
    """The SAME flattener expressions run under readStream: feed files
    arriving in a directory incrementally flatten into relations."""
    import shutil

    from cve_manager_spark.operators.flatten import flatten_problems
    from cve_manager_spark.schemas import NVD_FEED
    from cve_manager_spark.sources.nvd import read_feeds_json

    d = tmp_path / "stream_feeds"
    d.mkdir()
    shutil.copy(os.path.join(FIXDIR, "nvd_feed_fixture.json"), d / "nvdcve-1.1-2021.json")
    stream = (
        spark.readStream.schema(NVD_FEED).option("multiLine", True).json(str(d))
    )
    out = flatten_problems(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_flat_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("t_flat_stream").collect()))
    want = sorted(
        map(tuple, flatten_problems(read_feeds_json(spark, str(d / "*.json"))).collect())
    )
    assert got == want and len(got) == 13


def test_partitioned_cvss_prunes_and_overwrites_by_year(spark, relations):
    """Year-partitioned warehouse layout: date-bounded scans prune to the
    matching pub_year partitions, and a yearly refresh replaces exactly
    that year's partition (idempotent, other years untouched)."""
    from pyspark.sql import functions as F

    from cve_manager_spark import catalog

    db = "cve_part_test"
    catalog.drop_database(spark, db)
    catalog.create_tables(spark, db, partition_cvss_by_year=True)
    try:
        cvss = relations["cvss"]
        # split the fixture across two years to get two partitions
        moved = cvss.withColumn(
            "published_date",
            F.when(
                F.col("cve").isin("CVE-2021-0001", "CVE-2021-0002"),
                F.add_months(F.col("published_date"), -12),
            ).otherwise(F.col("published_date")),
        )
        catalog.load_tables(spark, {"cvss": moved}, db=db)
        t = spark.table(f"{db}.cvss")
        assert t.count() == 10
        assert set(r.pub_year for r in t.select("pub_year").distinct().collect()) == {2020, 2021}

        pruned = t.where(F.col("pub_year") == 2020)
        plan = pruned._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan and "pub_year" in plan
        assert pruned.count() == 2

        # idempotent yearly refresh: re-feed 2021 only; 2020 rows untouched
        y2021 = moved.where(F.year("published_date") == 2021)
        catalog.overwrite_year(spark, y2021, db=db)
        catalog.overwrite_year(spark, y2021, db=db)  # re-run = no duplication
        t = spark.table(f"{db}.cvss")
        assert t.count() == 10
        assert t.where(F.col("pub_year") == 2020).count() == 2
        # the view still resolves over the partitioned table
        assert spark.table(f"{db}.cvss_vs_cpes").count() == 0  # no cpe loaded
    finally:
        catalog.drop_database(spark, db)
