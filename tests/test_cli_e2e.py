"""CLI end-to-end over a ZIP feed: the reference's entry path 1
(download dir of .json.zip → -p -csv -idb → CSVs + warehouse) driven
through the real argparse surface in a separate process
(cve_manager.py:233-244,613-681).

The golden outputs are produced in-process from the plain-JSON source —
so the test simultaneously proves zip==json parity at the CLI layer and
byte-stable reference CSV output.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    feeds = root / "nvd"
    feeds.mkdir()
    with zipfile.ZipFile(feeds / "nvdcve-1.1-2021.json.zip", "w") as zf:
        zf.write(
            os.path.join(FIXDIR, "nvd_feed_fixture.json"), "nvdcve-1.1-2021.json"
        )
    results = root / "results"
    warehouse = root / "warehouse"
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [
            sys.executable, "-m", "cve_manager_spark.cli",
            "-p", "-csv", "-idb",
            "-i", str(feeds), "-o", str(results), "-w", str(warehouse),
            "-master", "local[4]",
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(root),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return root, proc


def test_zip_cli_prints_feed_header_report(cli_run):
    _, proc = cli_run
    # E3 per-file header report (cve_manager.py:240-244)
    assert "Processing nvdcve-1.1-2021.json.zip" in proc.stdout
    assert "CVE_data_number of CVEs: 10" in proc.stdout


def test_zip_cli_reference_csvs_match_json_source(cli_run, spark, tmp_path):
    root, _ = cli_run
    from cve_manager_spark.operators.flatten import flatten_all
    from cve_manager_spark.sources.nvd import read_feeds_json
    from cve_manager_spark.sources.sinks import write_reference_csv

    rels = flatten_all(
        read_feeds_json(spark, os.path.join(FIXDIR, "nvd_feed_fixture.json"))
    )
    names = {
        "cvss": "cve_cvss_scores",
        "cve_problem": "cve_related_problems",
        "cpe": "cve_cpes",
    }
    for rel, csv_name in names.items():
        golden = tmp_path / f"{csv_name}.csv"
        write_reference_csv(rels[rel], str(golden), csv_name)
        got = (root / "results" / f"{csv_name}.csv").read_bytes()
        want = golden.read_bytes()
        # row order within a distributed CSV is partition-dependent;
        # byte-compare the sorted line multisets (header must lead both)
        assert got.splitlines()[0] == want.splitlines()[0]
        assert sorted(got.splitlines()) == sorted(want.splitlines())


def test_zip_cli_warehouse_is_queryable(cli_run, spark):
    root, _ = cli_run
    cvss = spark.read.parquet(str(root / "warehouse" / "cvss"))
    assert cvss.count() == 10
    assert cvss.where(cvss.cve == "CVE-2021-0001").count() == 1
