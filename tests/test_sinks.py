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
