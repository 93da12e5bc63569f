"""Flattener at volume: a synthetic multi-year feed (thousands of items)
flattens correctly and in one pass — row counts verified against the
generator's arithmetic, executor-parallel across feed files.

(The reference holds the whole corpus in driver RAM — cve_manager.py:245;
this test is the anti-regression for that: nothing here collects the feed.)
"""

from __future__ import annotations

import json

import pytest

from cve_manager_spark.operators.flatten import flatten_all
from cve_manager_spark.sources.nvd import read_feeds_json

N_YEARS = 3
ITEMS_PER_YEAR = 1500


def _item(year: int, i: int) -> dict:
    cid = f"CVE-{year}-{i:04d}"
    has_v3 = i % 3 != 0
    has_v2 = i % 4 != 0
    item = {
        "cve": {
            "CVE_data_meta": {"ID": cid},
            "problemtype": {
                "problemtype_data": [
                    {"description": [{"lang": "en", "value": f"CWE-{(i % 40) + 1}"}]}
                ]
                * (1 + i % 2)
            },
            "description": {
                "description_data": [{"lang": "en", "value": f"Issue {i} of {year}. "}] * 2
            },
        },
        "configurations": {
            "nodes": [
                {
                    "operator": "OR",
                    "cpe_match": [
                        {"vulnerable": bool(j % 2), "cpe23Uri": f"cpe:2.3:a:v{i}:p{j}:*"}
                        for j in range(i % 4)
                    ],
                }
            ]
        },
        "publishedDate": f"{year}-01-{(i % 28) + 1:02d}T10:00Z",
        "lastModifiedDate": f"{year}-02-01T10:00Z",
        "impact": {},
    }
    if has_v3:
        item["impact"]["baseMetricV3"] = {
            "cvssV3": {"baseScore": float(i % 10), "baseSeverity": "HIGH",
                       "attackVector": "NETWORK", "attackComplexity": "LOW",
                       "privilegesRequired": "NONE", "userInteraction": "NONE",
                       "scope": "UNCHANGED", "confidentialityImpact": "HIGH",
                       "integrityImpact": "HIGH", "availabilityImpact": "HIGH",
                       "vectorString": "CVSS:3.1/..."},
            "exploitabilityScore": 3.9, "impactScore": 5.9,
        }
    if has_v2:
        item["impact"]["baseMetricV2"] = {
            "cvssV2": {"baseScore": float(i % 8), "accessVector": "NETWORK",
                       "accessComplexity": "LOW", "authentication": "NONE",
                       "confidentialityImpact": "PARTIAL", "integrityImpact": "PARTIAL",
                       "availabilityImpact": "PARTIAL", "vectorString": "AV:N/..."},
            "severity": "MEDIUM", "exploitabilityScore": 10.0, "impactScore": 6.4,
            "obtainAllPrivilege": False, "obtainOtherPrivilege": False,
            "obtainUserPrivilege": False, "userInteractionRequired": False,
        }
    return item


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nvd_scale")
    for y in range(2019, 2019 + N_YEARS):
        feed = {
            "CVE_data_type": "CVE", "CVE_data_format": "MITRE",
            "CVE_data_version": "4.0",
            "CVE_data_numberOfCVEs": str(ITEMS_PER_YEAR),
            "CVE_data_timestamp": f"{y}-12-31T23:59Z",
            "CVE_Items": [_item(y, i) for i in range(ITEMS_PER_YEAR)],
        }
        (d / f"nvdcve-1.1-{y}.json").write_text(json.dumps(feed))
    return str(d)


def test_flatten_scale_counts(spark, feed_dir):
    feed = read_feeds_json(spark, f"{feed_dir}/*.json")
    rels = flatten_all(feed)
    n = N_YEARS * ITEMS_PER_YEAR

    assert rels["cvss"].count() == n  # one row per item, all branches
    # problems: (1 + i%2) per item → 1.5 avg
    expected_problems = N_YEARS * sum(1 + i % 2 for i in range(ITEMS_PER_YEAR))
    assert rels["cve_problem"].count() == expected_problems
    # cpes: i%4 matches per item
    expected_cpes = N_YEARS * sum(i % 4 for i in range(ITEMS_PER_YEAR))
    assert rels["cpe"].count() == expected_cpes

    # multi-file read parallelizes: one partition per feed file minimum
    assert feed.rdd.getNumPartitions() >= N_YEARS

    # spot-check null semantics survived volume: V3-less items have null *_3
    v3less = rels["cvss"].where("base_score_3 IS NULL").count()
    assert v3less == N_YEARS * len([i for i in range(ITEMS_PER_YEAR) if i % 3 == 0])
