"""Sink tests: JDBC round-trip (S6) against embedded Derby — the same
``df.write.format('jdbc')`` path used for Postgres, minus the server."""

from __future__ import annotations

import shutil

import pytest

from cve_manager_spark.sources.sinks import write_jdbc


def test_jdbc_write_roundtrip(spark, tmp_path):
    db = str(tmp_path / "derbydb")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(100).selectExpr(
        "id", "cast(id * 1.5 as double) as val", "concat('row', id) as name"
    )
    try:
        write_jdbc(df, url, "t_jdbc", mode="overwrite")
    except Exception as ex:  # pragma: no cover — driver-less environments
        if "derby" in str(ex).lower() or "No suitable driver" in str(ex):
            pytest.skip(f"embedded Derby unavailable: {ex}")
        raise
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "t_jdbc").load()
    )
    assert back.count() == 100
    assert sorted(back.columns) == ["id", "name", "val"]
    first = back.orderBy("id").first()
    assert (first["id"], first["val"], first["name"]) == (0, 0.0, "row0")


def test_cli_jdbc_routing(spark, tmp_path):
    """CLI DB-flag parity (cve_manager.py:618,622-627): -icwe with a jdbc:
    URL loads through the JDBC sink instead of the parquet warehouse."""
    import os

    from cve_manager_spark.cli import build_parser, cmd_import_cwe

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "cwe_1000_fixture.csv")
    db = str(tmp_path / "derbycli")
    url = f"jdbc:derby:{db};create=true"
    args = build_parser().parse_args(
        ["-icwe", fix, "-jdbc", url, "-w", str(tmp_path / "wh")]
    )
    try:
        cmd_import_cwe(spark, args)
    except Exception as ex:  # pragma: no cover — driver-less environments
        if "derby" in str(ex).lower() or "No suitable driver" in str(ex):
            pytest.skip(f"embedded Derby unavailable: {ex}")
        raise
    back = spark.read.format("jdbc").option("url", url).option("dbtable", "cwe").load()
    assert back.count() == 3
    assert "cwe_id" in back.columns
    assert not os.path.exists(str(tmp_path / "wh"))  # parquet path untouched


def test_cli_bare_hostname_stays_parquet():
    """The reference defaults -server to localhost; a bare hostname must NOT
    flip the engine into JDBC mode."""
    from cve_manager_spark.cli import _jdbc_url, build_parser

    args = build_parser().parse_args(["-p"])
    assert _jdbc_url(args) is None
    args = build_parser().parse_args(["-p", "-server", "jdbc:derby:memory:x"])
    assert _jdbc_url(args) == "jdbc:derby:memory:x"
