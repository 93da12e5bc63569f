"""Source/sink format breadth: the engine's relations round-trip through
every columnar/text format Spark ships natively (ORC, JSON-lines, CSV)
with values intact — a user migrating from the reference can land data
in whichever format their warehouse already uses.

CSV cannot carry arrays (documented limitation — embeddings stay in
parquet/ORC); JSON-lines needs an explicit read schema to avoid type
widening on read.
"""

from __future__ import annotations

from cve_manager_spark.sources.testdata import load_table
from tests.conftest import SF_SMALL

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _rows(df, key="doc_id"):
    return sorted(tuple(r) for r in df.collect())


def test_register_views_normalizes_events_ts(spark):
    """The spark.sql view surface must see the SAME events.ts type as the
    DataFrame path: load_tables routes through load_table, so on a
    NANOS-generation parquet the view gets the micros conversion instead
    of raw bigint nanos (ADVICE r4 — silent oracle divergence)."""
    from cve_manager_spark.sources.testdata import load_table, register_views

    register_views(spark, SF_SMALL)
    view_ts = dict(spark.table("events").dtypes)["ts"]
    df_ts = dict(load_table(spark, SF_SMALL, "events").dtypes)["ts"]
    assert view_ts == df_ts
    assert view_ts in ("timestamp", "timestamp_ntz")


def test_orc_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).select(*docs.columns)
    assert _rows(back) == _rows(docs)


def test_orc_round_trip_embeddings_array(spark, tmp_path):
    """array<float> embedding columns survive ORC — the vector tables are
    not parquet-only."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    out = str(tmp_path / "emb_orc")
    emb.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).select(*emb.columns)
    assert back.schema == emb.schema
    assert _rows(back, "vec_id") == _rows(emb, "vec_id")


def test_jsonl_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(DOCS_SCHEMA).json(out).select(*docs.columns)
    assert _rows(back) == _rows(docs)


def test_csv_round_trip_documents(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema(DOCS_SCHEMA).option("header", True).csv(out)
        .select(*docs.columns)
    )
    assert _rows(back) == _rows(docs)
