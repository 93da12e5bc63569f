"""Golden-fixture tests for the NVD flattener (SURVEY §5.2.2).

The fixture (tests/fixtures/nvd_feed_fixture.json) covers every branch of
the reference's flattener (cve_manager.py:249-317): V3+V2 / V2-only /
V3-only / neither / missing userInteractionRequired (both arms),
multi-description concat, control characters, children-vs-direct CPE
nodes, entries without cpe23Uri, and multi-problemtype explosion.
Expectations are hand-derived from the reference's semantics.
"""

from __future__ import annotations

import datetime
import io
import os
import zipfile

import pytest

from cve_manager_spark.operators.flatten import flatten_cpe, flatten_cvss, flatten_problems
from cve_manager_spark.sources.nvd import feed_urls, read_feeds_json, read_feeds_zip

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "nvd_feed_fixture.json")


@pytest.fixture(scope="module")
def feed(spark):
    return read_feeds_json(spark, FIXTURE)


def rows_by_cve(df):
    return {r["cve"]: r for r in df.collect()}


def test_feed_header(feed):
    r = feed.select("CVE_data_numberOfCVEs", "CVE_data_timestamp").first()
    assert r[0] == "10"
    assert r[1] == "2021-02-21T08:00Z"


def test_cvss_row_count_and_branches(feed):
    cvss = rows_by_cve(flatten_cvss(feed))
    assert len(cvss) == 10  # every item emits exactly one cvss row

    full = cvss["CVE-2021-0001"]
    assert full["attack_complexity_3"] == "LOW"
    assert full["base_score_3"] == 9.8
    assert full["base_score"] == 7.5
    assert full["obtain_user_privileges"] is True
    assert full["user_interaction_required"] is False
    assert full["published_date"] == datetime.date(2021, 1, 15)
    assert full["last_modified_date"] == datetime.date(2021, 2, 1)

    # V2-only: all *_3 columns NULL (cve_manager.py:260-262)
    v2only = cvss["CVE-2021-0002"]
    assert v2only["base_score_3"] is None and v2only["vector_string_3"] is None
    assert v2only["base_score"] == 7.5 and v2only["severity"] == "HIGH"

    # V3-only: all V2 columns NULL (:273-274)
    v3only = cvss["CVE-2021-0003"]
    assert v3only["base_score_3"] == 9.8
    assert v3only["base_score"] is None and v3only["obtain_all_privileges"] is None

    # neither: every metric column NULL, description/dates kept (:264-266)
    none_row = cvss["CVE-2021-0004"]
    assert none_row["base_score_3"] is None and none_row["base_score"] is None
    assert none_row["description"] == "Base description of CVE-2021-0004."

    # V2 present minus userInteractionRequired (:269-270): UIR NULL, rest kept
    uir2 = cvss["CVE-2021-0005"]
    assert uir2["user_interaction_required"] is None
    assert uir2["obtain_user_privileges"] is True and uir2["base_score"] == 7.5

    # V3 + V2-minus-UIR (:275-276)
    uir3 = cvss["CVE-2021-0006"]
    assert uir3["base_score_3"] == 9.8
    assert uir3["user_interaction_required"] is None and uir3["base_score"] == 7.5


def test_description_concat_and_normalize(feed):
    cvss = rows_by_cve(flatten_cvss(feed))
    # multi-entry concat (:252-253)
    assert cvss["CVE-2021-0001"]["description"] == "First part. Segunda parte."
    # CR/LF/TAB → spaces (:254-256); backslashes untouched (escaping is a
    # COPY-format artifact, :339, not part of the relation)
    assert cvss["CVE-2021-0007"]["description"] == "Line1  Line2 Tabbed \\backslash\\ end."


def test_problems_double_explode(feed):
    probs = sorted((r["cve"], r["problem"]) for r in flatten_problems(feed).collect())
    expected_0010 = [
        ("CVE-2021-0010", "CWE-352"),
        ("CVE-2021-0010", "CWE-79"),
        ("CVE-2021-0010", "NVD-CWE-Other"),
    ]
    assert [p for p in probs if p[0] == "CVE-2021-0010"] == expected_0010
    assert ("CVE-2021-0001", "CWE-89") in probs
    assert ("CVE-2021-0001", "NVD-CWE-noinfo") in probs
    # 8 single-problem items + 2 labels (item 1) + 3 labels (item 10) = 13
    assert len(probs) == 13


def test_cpe_conditional_walk(feed):
    cpes = sorted(
        (r["cve"], r["cpe23uri"], r["vulnerable"]) for r in flatten_cpe(feed).collect()
    )
    # children path: both entries incl. vulnerable=False as 'False' (:289-298)
    assert ("CVE-2021-0001", "cpe:2.3:a:v1:p1:1.0:*:*:*:*:*:*:*", "True") in cpes
    assert ("CVE-2021-0001", "cpe:2.3:a:v1:p1:1.1:*:*:*:*:*:*:*", "False") in cpes
    # direct path on second node (:300-305)
    assert ("CVE-2021-0001", "cpe:2.3:o:v2:os:2.0:*:*:*:*:*:*:*", "True") in cpes
    # child without cpe_match contributes nothing; entry without cpe23Uri
    # dropped (:297); node with neither children nor cpe_match → nothing
    assert [c for c in cpes if c[0] == "CVE-2021-0008"] == [
        ("CVE-2021-0008", "cpe:2.3:a:v3:p3:3.0:*:*:*:*:*:*:*", "True")
    ]
    # children present → node's own cpe_match ignored; empty children → nothing
    assert [c for c in cpes if c[0] == "CVE-2021-0009"] == [
        ("CVE-2021-0009", "cpe:2.3:a:v4:child:1.0:*:*:*:*:*:*:*", "True")
    ]
    assert len(cpes) == 5


def test_zip_source_matches_json_source(spark, feed, tmp_path):
    zpath = tmp_path / "nvdcve-1.1-2021.json.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(FIXTURE, "nvdcve-1.1-2021.json")
    zdf = read_feeds_zip(spark, str(zpath))
    a = flatten_cvss(zdf).orderBy("cve").collect()
    b = flatten_cvss(feed).orderBy("cve").collect()
    assert a == b


def test_feed_urls_regex():
    html = (
        '<a href="feeds/json/cve/1.1/nvdcve-1.1-2021.json.zip">x</a>'
        '<a href="feeds/json/cve/1.1/nvdcve-1.1-2020.json.zip">y</a>'
        '<a href="feeds/json/cve/1.1/nvdcve-1.1-modified.json.zip">skip-no-digits-ok</a>'
        '<a href="feeds/json/cve/1.1/nvdcve-1.1-2021.json.zip">dup</a>'
    )
    urls = feed_urls(html)
    assert urls[0] == "nvdcve-1.1-2021.json.zip"
    assert len([u for u in urls if "2021" in u]) == 1


def test_pruned_feed_schemas_match_full(spark, feed):
    """Per-relation pruned read schemas produce identical outputs to the
    full schema (JSON parse-cost optimization, schemas.feed_schema_for)."""
    from cve_manager_spark.operators.flatten import flatten_cpe as fc
    from cve_manager_spark.operators.flatten import flatten_cvss as fv
    from cve_manager_spark.operators.flatten import flatten_problems as fp
    from cve_manager_spark.schemas import feed_schema_for

    for rel, flatten in (("cvss", fv), ("cve_problem", fp), ("cpe", fc)):
        schema = feed_schema_for(rel)
        pruned_feed = read_feeds_json(spark, FIXTURE, schema=schema)
        a = sorted(map(tuple, flatten(pruned_feed).collect()))
        b = sorted(map(tuple, flatten(feed).collect()))
        assert a == b, rel
    # the problems schema really is narrow
    s = str(feed_schema_for("cve_problem"))
    assert "impact" not in s and "configurations" not in s
