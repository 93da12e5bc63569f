"""maintenance.py: compaction, clustering, and the layouts they produce.

Checks are structural, not just row-preserving: file counts land on the
planned target, clustered files cover disjoint key ranges (the property
parquet min/max skipping depends on), partition pruning shows up in the
physical plan of a read over the written layout, and a failed rewrite
leaves the original table untouched.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cve_manager_spark import maintenance
from tests.conftest import SF_SMALL


@pytest.fixture()
def shattered_docs(spark, tmp_path):
    """documents.parquet rewritten as many tiny files (the pathology)."""
    path = tmp_path / "docs_shattered"
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    df.repartition(40).write.parquet(str(path))
    return str(path)


def test_file_stats_counts_every_file_and_row(spark, shattered_docs):
    stats = maintenance.file_stats(spark, shattered_docs).collect()
    n_disk = len(list(Path(shattered_docs).glob("*.parquet")))
    assert len(stats) == n_disk == 40
    total = sum(r.n_rows for r in stats)
    assert total == spark.read.parquet(shattered_docs).count()


def test_plan_target_files():
    assert maintenance.plan_target_files(0, 100) == 1
    assert maintenance.plan_target_files(100, 100) == 1
    assert maintenance.plan_target_files(101, 100) == 2
    with pytest.raises(ValueError):
        maintenance.plan_target_files(10, 0)


def test_compact_reduces_files_and_preserves_rows(spark, shattered_docs):
    before = spark.read.parquet(shattered_docs)
    n = before.count()
    digest_before = (
        before.select(F.md5(F.concat_ws("\x1f", "doc_id", "text")).alias("d"))
        .agg(F.sum(F.conv(F.substring("d", 1, 8), 16, 10).cast("long")).alias("s"))
        .first()
        .s
    )
    result = maintenance.compact(spark, shattered_docs, target_rows_per_file=200)
    assert result["files_before"] == 40
    assert result["n_rows"] == n
    assert result["files_after"] == maintenance.plan_target_files(n, 200)
    after = spark.read.parquet(shattered_docs)
    assert after.count() == n
    digest_after = (
        after.select(F.md5(F.concat_ws("\x1f", "doc_id", "text")).alias("d"))
        .agg(F.sum(F.conv(F.substring("d", 1, 8), 16, 10).cast("long")).alias("s"))
        .first()
        .s
    )
    assert digest_after == digest_before
    # no temp/backup litter left behind
    parent = Path(shattered_docs).parent
    assert list(parent.glob("*.compact-*")) == []


def test_compact_with_sort_clusters_key_ranges(spark, shattered_docs):
    """Sorted compaction → files cover disjoint doc_id ranges (the
    precondition for parquet min/max file skipping on range predicates)."""
    maintenance.compact(
        spark, shattered_docs, target_rows_per_file=120, sort_by=["doc_id"]
    )
    per_file = (
        spark.read.parquet(shattered_docs)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 4
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, "file key ranges overlap — not clustered"


def test_write_clustered_partition_pruning_in_plan(spark, tmp_path):
    """Equality predicate on the partition column prunes to one hive dir."""
    path = str(tmp_path / "events_layout")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    maintenance.write_clustered(
        ev,
        path,
        partition_by=["event_type"],
        cluster_by=["ts"],
        target_rows_per_file=100_000,
    )
    n_types = ev.select("event_type").distinct().count()
    assert len(list(Path(path).glob("event_type=*"))) == n_types

    rd = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be in PartitionFilters, and file
    # listing must have pruned to a single partition directory's worth
    files = {
        r.f
        for r in rd.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all("event_type=click" in f for f in files)


def test_write_clustered_sorts_within_files(spark, tmp_path):
    path = str(tmp_path / "events_sorted")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    maintenance.write_clustered(
        ev, path, cluster_by=["user_id"], target_rows_per_file=2_000, n_files=8
    )
    # every file's rows are sorted on the cluster key → per-file min/max
    # are tight; verify disjointness across files like compact does
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


def test_compact_zorder_bounds_both_dimensions(spark, tmp_path):
    """Z-order clustering → every file has a small bounding box in BOTH
    interleaved dimensions, where single-column sort leaves the second
    dimension unbounded (~full span per file). This bounding-box property
    is exactly what parquet min/max skipping consumes."""
    path = tmp_path / "events_z"
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    ev.repartition(20).write.parquet(str(path))

    def mean_spans(p):
        rows = (
            spark.read.parquet(str(p))
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
                F.min("event_id").alias("elo"), F.max("event_id").alias("ehi"),
            )
            .collect()
        )
        glob_u = max(r.uhi for r in rows) - min(r.ulo for r in rows) or 1
        glob_e = max(r.ehi for r in rows) - min(r.elo for r in rows) or 1
        mu = sum((r.uhi - r.ulo) / glob_u for r in rows) / len(rows)
        me = sum((r.ehi - r.elo) / glob_e for r in rows) / len(rows)
        return mu, me

    # baseline: single-column sort on user_id → event_id unclustered
    sorted_path = tmp_path / "events_sorted_base"
    ev.write.parquet(str(sorted_path))
    maintenance.compact(spark, str(sorted_path), 64, sort_by=["user_id"])
    _, me_sorted = mean_spans(sorted_path)
    # second dimension is NOT z-clustered (file chunking within a range
    # partition still narrows it below 1.0, so the bound is loose)
    assert me_sorted > 0.4

    maintenance.compact(spark, str(path), 64, zorder_by=["user_id", "event_id"])
    mu_z, me_z = mean_spans(path)
    # 16 files / 2 dims -> ~4 ranges per dim, ~0.3 measured; 0.45 margin
    assert mu_z < 0.45 and me_z < 0.45, (mu_z, me_z)
    assert me_z < me_sorted


def test_compact_rejects_conflicting_cluster_specs(spark, tmp_path):
    path = tmp_path / "docs_conflict"
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").write.parquet(str(path))
    with pytest.raises(ValueError):
        maintenance.compact(
            spark, str(path), 100, sort_by=["doc_id"], zorder_by=["doc_id"]
        )


def test_maintenance_cli_stats_and_compact(spark, shattered_docs, capsys):
    """End-to-end CLI drive: stats sees the shattered layout, compact
    fixes it, stats confirms — one JSON line per invocation."""
    import json

    from cve_manager_spark import maintenance_cli

    assert maintenance_cli.main(["stats", "--path", shattered_docs]) == 0
    before = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert before["n_files"] == 40 and before["n_rows"] == 500

    assert (
        maintenance_cli.main(
            [
                "compact",
                "--path",
                shattered_docs,
                "--target-rows",
                "200",
                "--sort-by",
                "doc_id",
            ]
        )
        == 0
    )
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["files_after"] == 3 and result["n_rows"] == 500

    assert maintenance_cli.main(["stats", "--path", shattered_docs]) == 0
    after = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert after["n_files"] == 3 and after["n_rows"] == 500
    assert after["max_file_rows"] <= 200


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: a filter on a JOINED dimension — not on
    the fact itself — must reach the partitioned fact scan as a runtime
    partition filter, so at cluster scale the fact read is bounded by the
    dim predicate's selectivity, not the whole table. This is the layout
    dividend write_clustered's hive partitioning buys for star joins."""
    path = str(tmp_path / "events_dpp")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    maintenance.write_clustered(
        ev,
        path,
        partition_by=["event_type"],
        cluster_by=["ts"],
        target_rows_per_file=100_000,
    )
    dim = spark.createDataFrame(
        [("click", "growth"), ("view", "growth"), ("purchase", "revenue"),
         ("signup", "revenue"), ("error", "platform")],
        "event_type string, team string",
    )
    fact = spark.read.parquet(path)
    j = fact.join(dim.where(F.col("team") == "revenue"), "event_type")
    plan = j._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower()
    # Provenance check runs as a SEPARATE query: input_file_name() is
    # nondeterministic, so projecting it on the fact side blocks the DPP
    # rule itself (a filter can't be pushed through a nondeterministic
    # projection) — the exact trap a pipeline author needs to know about.
    withf = spark.read.parquet(path).withColumn("f", F.input_file_name())
    jf = withf.join(dim.where(F.col("team") == "revenue"), "event_type")
    files = {r.f for r in jf.select("f").distinct().collect()}
    assert files and all(f for f in files)
    assert all(("event_type=purchase" in f) or ("event_type=signup" in f) for f in files)
    # and the join result is still exactly the unpartitioned equivalent
    want = ev.join(dim.where(F.col("team") == "revenue"), "event_type").count()
    assert j.count() == want


def test_delete_where_rewrites_only_matching_files(spark, tmp_path):
    """Copy-on-write DELETE: rows for one user go, untouched files keep
    their exact bytes (same name, same content), and the total row
    count drops by exactly the matches."""
    import hashlib

    path = str(tmp_path / "events_cow")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # cluster by user so the victim's rows concentrate in few files
    maintenance.compact(
        spark, _copy_to(ev, path), target_rows_per_file=800, sort_by=["user_id"]
    )

    def digests():
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in Path(path).glob("*.parquet")
        }

    before = spark.read.parquet(path).count()
    victim = spark.read.parquet(path).agg(F.min("user_id")).collect()[0][0]
    n_victim = (
        spark.read.parquet(path).where(F.col("user_id") == victim).count()
    )
    d0 = digests()

    res = maintenance.delete_where(
        spark, path, F.col("user_id") == F.lit(victim)
    )
    assert res["n_deleted"] == n_victim
    assert 0 < res["files_touched"] < res["files_total"]

    after = spark.read.parquet(path)
    assert after.count() == before - n_victim
    assert after.where(F.col("user_id") == victim).count() == 0
    # every file NOT rewritten is byte-identical
    d1 = digests()
    untouched = set(d0) & set(d1)
    assert len(untouched) == res["files_total"] - res["files_touched"]
    assert all(d0[n] == d1[n] for n in untouched)


def test_delete_where_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "events_nomatch")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    _copy_to(ev, path)
    before = spark.read.parquet(path).count()
    res = maintenance.delete_where(spark, path, "user_id = -1")
    assert res == {"n_deleted": 0, "files_touched": 0,
                   "files_total": res["files_total"]}
    assert spark.read.parquet(path).count() == before


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """3VL: DELETE removes rows where the predicate is TRUE; a row where
    it evaluates NULL must survive the rewrite, not vanish."""
    path = str(tmp_path / "nulls_cow")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "id bigint, v double"
    )
    df.coalesce(1).write.parquet(path)
    res = maintenance.delete_where(spark, path, F.col("v") > 50)
    assert res["n_deleted"] == 1
    left = {r["id"] for r in spark.read.parquet(path).collect()}
    assert left == {1, 2}  # the NULL row survived


def _copy_to(df, path):
    df.write.parquet(path)
    return path


def test_maintenance_cli_delete(spark, tmp_path, capsys):
    """CLI erasure drive: delete --where removes exactly the matching
    rows and reports the touched-file manifest."""
    import json

    from cve_manager_spark import maintenance_cli

    path = str(tmp_path / "docs_cli_del")
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(
        5
    ).write.parquet(path)
    n = spark.read.parquet(path).count()
    n_en = spark.read.parquet(path).where("lang = 'en'").count()
    assert (
        maintenance_cli.main(["delete", "--path", path, "--where", "lang = 'en'"])
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_deleted"] == n_en
    left = spark.read.parquet(path)
    assert left.count() == n - n_en
    assert left.where("lang = 'en'").count() == 0


def test_merge_upsert_replaces_and_appends(spark, tmp_path):
    """Copy-on-write MERGE: matched keys replaced by their update row,
    new keys appended, untouched files byte-identical."""
    import hashlib

    path = str(tmp_path / "docs_merge")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    maintenance.compact(
        spark, _copy_to(docs, path), target_rows_per_file=100, sort_by=["doc_id"]
    )
    n = spark.read.parquet(path).count()

    def digests():
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in Path(path).glob("*.parquet")
        }

    d0 = digests()
    # two updates to existing low doc_ids (clustered into few files) and
    # one brand-new key
    upd = spark.createDataFrame(
        [(0, "UPDATED ZERO", "en", "manual", 12),
         (1, "UPDATED ONE", "en", "manual", 11),
         (10_000_000, "BRAND NEW", "en", "manual", 9)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    res = maintenance.merge_upsert(spark, path, upd, key_cols=["doc_id"])
    assert res["n_matched"] == 2 and res["n_inserted"] == 1
    assert 0 < res["files_touched"] < res["files_total"]

    after = spark.read.parquet(path)
    assert after.count() == n + 1
    got = {
        r["doc_id"]: r["text"]
        for r in after.where(F.col("doc_id").isin(0, 1, 10_000_000)).collect()
    }
    assert got == {0: "UPDATED ZERO", 1: "UPDATED ONE", 10_000_000: "BRAND NEW"}
    d1 = digests()
    untouched = set(d0) & set(d1)
    assert len(untouched) == res["files_total"] - res["files_touched"]
    assert all(d0[nm] == d1[nm] for nm in untouched)


def test_merge_upsert_insert_only_and_validation(spark, tmp_path):
    path = str(tmp_path / "docs_merge2")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    _copy_to(docs, path)
    n = spark.read.parquet(path).count()
    new_only = spark.createDataFrame(
        [(20_000_000, "N", "en", "manual", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    res = maintenance.merge_upsert(spark, path, new_only, key_cols=["doc_id"])
    assert res == {"n_matched": 0, "n_inserted": 1, "files_touched": 0,
                   "files_total": res["files_total"]}
    assert spark.read.parquet(path).count() == n + 1

    with pytest.raises(ValueError, match="duplicate keys"):
        maintenance.merge_upsert(
            spark, path, new_only.unionByName(new_only), key_cols=["doc_id"]
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        maintenance.merge_upsert(
            spark, path, new_only.drop("n_chars"), key_cols=["doc_id"]
        )


def test_merge_upsert_empty_updates_is_noop(spark, tmp_path):
    """An empty update set (the empty foreachBatch micro-batch case) must
    return a zero-count no-op, not die inferring a schema from a
    zero-file tmp write."""
    path = str(tmp_path / "docs_merge_empty")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    _copy_to(docs, path)
    n = spark.read.parquet(path).count()
    empty = spark.createDataFrame(
        [],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    res = maintenance.merge_upsert(spark, path, empty, key_cols=["doc_id"])
    assert res["n_matched"] == 0 and res["n_inserted"] == 0
    assert res["files_touched"] == 0
    assert spark.read.parquet(path).count() == n


def test_delete_where_on_partitioned_layout(spark, tmp_path):
    """Copy-on-write DELETE on a hive-partitioned table (r6, ADVICE r5):
    partition-column values survive the rewrite, survivor files land
    back inside their partition dirs (never at the root), and files in
    unaffected partitions stay byte-identical."""
    import hashlib

    path = tmp_path / "docs_part_del"
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.write.partitionBy("lang").parquet(str(path))
    before = spark.read.parquet(str(path))
    n = before.count()
    n_match = before.where("source = 'src1' AND n_chars >= 200").count()
    assert 0 < n_match < n

    def digests():
        return {
            str(p.relative_to(path)): hashlib.md5(p.read_bytes()).hexdigest()
            for p in path.rglob("*.parquet")
        }

    d0 = digests()
    res = maintenance.delete_where(
        spark, str(path), "source = 'src1' AND n_chars >= 200"
    )
    assert res["n_deleted"] == n_match
    assert 0 < res["files_touched"] <= res["files_total"]

    after = spark.read.parquet(str(path))
    assert after.count() == n - n_match
    assert after.where("source = 'src1' AND n_chars >= 200").count() == 0
    assert "lang" in after.columns  # partition column survived
    # per-partition-value counts match a logical delete on the original
    want = {
        r["lang"]: r["cnt"]
        for r in docs.where("NOT (source = 'src1' AND n_chars >= 200)")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = {
        r["lang"]: r["cnt"]
        for r in after.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want
    # no parquet files at the table root; all under lang=... dirs
    assert not list(path.glob("*.parquet"))
    d1 = digests()
    untouched = set(d0) & set(d1)
    assert all(d0[k] == d1[k] for k in untouched)
    assert len(untouched) == res["files_total"] - res["files_touched"]


def test_delete_where_partition_column_predicate_prunes_and_empties(
    spark, tmp_path
):
    """Deleting by the partition column itself: the manifest scan prunes
    to that partition's files, every row there goes, other partitions'
    files are untouched; the emptied partition is harmless to readers."""
    path = tmp_path / "docs_part_del2"
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.write.partitionBy("lang").parquet(str(path))
    n = spark.read.parquet(str(path)).count()
    n_en = docs.where("lang = 'en'").count()
    files_en = len(list((path).rglob("lang=en/*.parquet")))
    res = maintenance.delete_where(spark, str(path), "lang = 'en'")
    assert res["n_deleted"] == n_en
    assert res["files_touched"] == files_en  # pruned to the partition
    after = spark.read.parquet(str(path))
    assert after.count() == n - n_en
    assert after.where("lang = 'en'").count() == 0


def test_merge_upsert_on_partitioned_layout(spark, tmp_path):
    """Copy-on-write MERGE on a hive-partitioned table: matched rows
    replaced inside their partitions, an insert with a NEW partition
    value creates its directory, untouched partitions byte-identical."""
    import hashlib

    path = tmp_path / "docs_part_mrg"
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.write.partitionBy("lang").parquet(str(path))
    before = spark.read.parquet(str(path))
    n = before.count()
    victim = before.orderBy("doc_id").first()

    def digests():
        return {
            str(p.relative_to(path)): hashlib.md5(p.read_bytes()).hexdigest()
            for p in path.rglob("*.parquet")
        }

    d0 = digests()
    upd = spark.createDataFrame(
        [
            (victim["doc_id"], "UPDATED", victim["lang"], "manual", 7),
            (77_000_001, "NEW PARTITION ROW", "zz", "manual", 17),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    res = maintenance.merge_upsert(spark, str(path), upd, key_cols=["doc_id"])
    assert res["n_matched"] == 1 and res["n_inserted"] == 1
    after = spark.read.parquet(str(path))
    assert after.count() == n + 1
    got = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in after.where(
            F.col("doc_id").isin(int(victim["doc_id"]), 77_000_001)
        ).collect()
    }
    assert got[victim["doc_id"]] == ("UPDATED", victim["lang"])
    assert got[77_000_001] == ("NEW PARTITION ROW", "zz")
    assert (path / "lang=zz").is_dir()  # new partition dir created
    d1 = digests()
    untouched = set(d0) & set(d1)
    assert all(d0[k] == d1[k] for k in untouched)


def test_cow_ops_refuse_non_hive_subdirs(spark, tmp_path):
    """A subdirectory that is not a key=value partition dir is a layout
    we cannot reason about — refuse instead of rewriting blind."""
    path = tmp_path / "docs_weird"
    spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1).write.parquet(
        str(path)
    )
    (path / "not_a_partition").mkdir()
    with pytest.raises(ValueError, match="non-hive"):
        maintenance.delete_where(spark, str(path), "v > 0")


def test_delete_where_everything_keeps_table_readable(spark, tmp_path):
    """Deleting every row must leave a readable (0-row) table, even when
    the survivor write emits no part files."""
    path = str(tmp_path / "wipe_cow")
    spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"
    ).coalesce(1).write.parquet(path)
    res = maintenance.delete_where(spark, path, "v > 0")
    assert res["n_deleted"] == 2
    after = spark.read.parquet(path)
    assert after.count() == 0
    assert dict(after.dtypes) == {"id": "bigint", "v": "double"}


def test_analyze_table_feeds_cbo_stats(spark):
    """ANALYZE writes row/size stats into the catalog and the optimizer's
    estimated statistics for the table drop from the 'unknown = huge'
    default to the measured size."""
    spark.sql("CREATE DATABASE IF NOT EXISTS stats_test")
    try:
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        docs.write.mode("overwrite").saveAsTable("stats_test.docs")
        res = maintenance.analyze_table(
            spark, "stats_test.docs", columns=["doc_id", "lang"]
        )
        assert res["row_count"] == docs.count()
        assert res["size_bytes"] > 0
        # row counts propagate into plan estimates only under the
        # cost-based optimizer — enable it for the check
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            est = (
                spark.table("stats_test.docs")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert est.rowCount().isDefined()
            assert est.rowCount().get() == docs.count()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
        # column-level NDV recorded
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED stats_test.docs lang"
            ).collect()
        }
        assert int(desc["distinct_count"]) >= 1
    finally:
        spark.sql("DROP DATABASE IF EXISTS stats_test CASCADE")


def test_compact_preserves_partitioned_layout(spark, tmp_path):
    """Compacting a hive-partitioned table must compact WITHIN each
    partition directory — fewer files, same rows, layout and partition
    column intact (never flattened into the data files)."""
    path = tmp_path / "docs_part_compact"
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.repartition(10).write.partitionBy("lang").parquet(str(path))
    n = docs.count()
    dirs_before = sorted(p.name for p in path.glob("lang=*"))
    files_before = len(list(path.rglob("*.parquet")))

    res = maintenance.compact(spark, str(path), target_rows_per_file=2000)
    assert res["n_rows"] == n
    assert res["files_after"] < files_before
    assert sorted(p.name for p in path.glob("lang=*")) == dirs_before
    assert not list(path.glob("*.parquet"))  # nothing flattened to root
    after = spark.read.parquet(str(path))
    assert after.count() == n
    # partition column still comes from the directory structure
    got = {r["lang"] for r in after.select("lang").distinct().collect()}
    want = {d.split("=", 1)[1] for d in dirs_before}
    assert got == want


def test_merge_upsert_moves_row_across_partitions(spark, tmp_path):
    """An update that CHANGES a row's partition-column value: the old
    partition's file is rewritten without the row, the update lands in
    the new partition's directory, total count unchanged."""
    path = tmp_path / "docs_part_move"
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.write.partitionBy("lang").parquet(str(path))
    before = spark.read.parquet(str(path))
    n = before.count()
    victim = before.where(F.col("lang") == "en").orderBy("doc_id").first()
    upd = spark.createDataFrame(
        [(victim["doc_id"], victim["text"], "de", victim["source"],
          victim["n_chars"])],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    res = maintenance.merge_upsert(spark, str(path), upd, key_cols=["doc_id"])
    assert res["n_matched"] == 1 and res["n_inserted"] == 0
    after = spark.read.parquet(str(path))
    assert after.count() == n
    rows = after.where(F.col("doc_id") == victim["doc_id"]).collect()
    assert len(rows) == 1 and rows[0]["lang"] == "de"
    # the row's bytes physically live under lang=de now
    f = (
        after.where(F.col("doc_id") == victim["doc_id"])
        .select(F.input_file_name().alias("f")).first()["f"]
    )
    assert "lang=de/" in f


def test_maintenance_cli_merge_and_analyze(spark, tmp_path, capsys):
    """CLI CDC drive: merge --updates applies an upsert parquet dir by
    key; analyze records catalog stats. One JSON line each."""
    import json

    from cve_manager_spark import maintenance_cli

    path = str(tmp_path / "docs_cli_mrg")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.repartition(4).write.parquet(path)
    n = spark.read.parquet(path).count()
    upd_path = str(tmp_path / "updates")
    spark.createDataFrame(
        [(0, "CLI UPDATED", "en", "manual", 11),
         (90_000_001, "CLI NEW", "en", "manual", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(upd_path)

    assert maintenance_cli.main(
        ["merge", "--path", path, "--updates", upd_path, "--keys", "doc_id"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_matched"] == 1 and out["n_inserted"] == 1
    after = spark.read.parquet(path)
    assert after.count() == n + 1
    assert after.where("doc_id = 0").first()["text"] == "CLI UPDATED"

    spark.sql("CREATE DATABASE IF NOT EXISTS cli_stats")
    try:
        docs.limit(100).write.mode("overwrite").saveAsTable("cli_stats.d")
        assert maintenance_cli.main(
            ["analyze", "--table", "cli_stats.d", "--columns", "lang"]
        ) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["row_count"] == 100 and out["size_bytes"] > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS cli_stats CASCADE")


def test_delete_everything_on_partitioned_table_flattens_readably(spark, tmp_path):
    """ADVICE r6: wiping a hive-partitioned table used to leave the 0-row
    keeper at the root NEXT TO empty partition dirs; a later insert then
    produced leaf files at two depths and Spark failed the read with
    'Conflicting directory structures detected'. The fallback now removes
    the empty partition dirs, so the empty table is flat and a subsequent
    merge_upsert insert keeps it readable."""
    path = tmp_path / "wipe_part"
    spark.createDataFrame(
        [(1, "en", 1.0), (2, "de", 2.0)], "id long, lang string, v double"
    ).write.partitionBy("lang").parquet(str(path))
    res = maintenance.delete_where(spark, str(path), "v > 0")
    assert res["n_deleted"] == 2
    # no partition dirs remain beside the keeper file
    assert not [
        p for p in path.iterdir() if p.is_dir() and not p.name.startswith(("_", "."))
    ]
    after = spark.read.parquet(str(path))
    assert after.count() == 0
    assert set(after.columns) == {"id", "lang", "v"}
    # the repaired table accepts inserts and stays readable end-to-end
    updates = spark.createDataFrame(
        [(3, "fr", 3.0)], "id long, lang string, v double"
    )
    maintenance.merge_upsert(spark, str(path), updates, key_cols=["id"])
    again = spark.read.parquet(str(path))
    assert again.count() == 1
    assert again.collect()[0]["lang"] == "fr"


def test_partition_cols_refuses_files_beside_partition_dirs(spark, tmp_path):
    """ADVICE r6: a data file sitting at the same level as key=value dirs
    must be refused, not rewritten under wrong layout assumptions."""
    path = tmp_path / "mixed_depth"
    spark.createDataFrame(
        [(1, "en", 1.0)], "id long, lang string, v double"
    ).write.partitionBy("lang").parquet(str(path))
    # plant a root-level data file beside the lang=en dir
    spark.createDataFrame([(9, 9.0)], "id long, v double").coalesce(
        1
    ).write.mode("append").parquet(str(tmp_path / "flat_src"))
    leaf = next((tmp_path / "flat_src").glob("*.parquet"))
    leaf.rename(path / "stray.parquet")
    with pytest.raises(ValueError, match="non-hive"):
        maintenance.delete_where(spark, str(path), "v > 0")


def test_partition_cols_refuses_ragged_sibling_depths(spark, tmp_path):
    """ADVICE r6: sibling branches of different depths (one leaf at
    day=1/, another under day=2/hour=3/) pass the old first-branch-only
    walk; the BFS validation must refuse them."""
    path = tmp_path / "ragged"
    (path / "day=1").mkdir(parents=True)
    (path / "day=2" / "hour=3").mkdir(parents=True)
    spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(
        1
    ).write.parquet(str(tmp_path / "seed"))
    leaf = next((tmp_path / "seed").glob("*.parquet"))
    import shutil as _sh

    _sh.copy(leaf, path / "day=1" / "a.parquet")
    _sh.copy(leaf, path / "day=2" / "hour=3" / "b.parquet")
    with pytest.raises(ValueError, match="non-hive"):
        maintenance._partition_cols(path, "compact")


def test_compact_zero_row_table_is_noop(spark, tmp_path):
    """ADVICE r6: compacting the legitimately 0-row table delete_where
    leaves behind must complete as a no-op, not crash on schema
    inference over an empty rewrite."""
    path = str(tmp_path / "wipe_then_compact")
    spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(
        1
    ).write.parquet(path)
    maintenance.delete_where(spark, path, "v > 0")
    res = maintenance.compact(spark, path, target_rows_per_file=10)
    assert res["n_rows"] == 0
    assert res["files_before"] == res["files_after"]
    assert spark.read.parquet(path).count() == 0


def test_merge_upsert_additive_schema_evolution(spark, tmp_path):
    """evolve_schema=True (r7 VERDICT #6): updates carrying a NEW column
    evolve the table additively — matched/inserted rows get the value,
    pre-existing rows read as NULL under mergeSchema — while untouched
    files stay byte-identical (they are NOT rewritten to add the
    column); updates MISSING a table column get it NULL-filled. The
    default strict mode still rejects both, and a type change is
    rejected even with evolution on."""
    import hashlib

    import pytest as _pytest

    path = str(tmp_path / "docs_evolve")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    maintenance.compact(
        spark, _copy_to(docs, path), target_rows_per_file=100, sort_by=["doc_id"]
    )
    n = spark.read.parquet(path).count()

    def digests():
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in Path(path).glob("*.parquet")
        }

    d0 = digests()
    upd = spark.createDataFrame(
        [(0, "EVOLVED ZERO", "en", "manual", 12, 0.99),
         (20_000_000, "EVOLVED NEW", "en", "manual", 11, 0.42)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint, quality double",
    )
    # strict mode rejects the extra column
    with _pytest.raises(ValueError, match="schema mismatch"):
        maintenance.merge_upsert(spark, path, upd, key_cols=["doc_id"])

    res = maintenance.merge_upsert(
        spark, path, upd, key_cols=["doc_id"], evolve_schema=True
    )
    assert res["n_matched"] == 1 and res["n_inserted"] == 1

    after = spark.read.option("mergeSchema", "true").parquet(path)
    assert after.count() == n + 1
    assert "quality" in after.columns
    got = {
        r["doc_id"]: r["quality"]
        for r in after.where(F.col("doc_id").isin(0, 5, 20_000_000)).collect()
    }
    assert got[0] == 0.99 and got[20_000_000] == 0.42
    assert got[5] is None  # pre-evolution row: NULL, not rewritten
    d1 = digests()
    untouched = set(d0) & set(d1)
    assert len(untouched) == res["files_total"] - res["files_touched"]
    assert all(d0[nm] == d1[nm] for nm in untouched)

    # updates missing table columns: NULL-filled (and the previously
    # evolved column must survive a later merge's own table read)
    upd2 = spark.createDataFrame(
        [(1, "SPARSE ONE")], "doc_id bigint, text string"
    )
    res2 = maintenance.merge_upsert(
        spark, path, upd2, key_cols=["doc_id"], evolve_schema=True
    )
    assert res2["n_matched"] == 1
    after2 = spark.read.option("mergeSchema", "true").parquet(path)
    row = after2.where(F.col("doc_id") == 1).first()
    assert row["text"] == "SPARSE ONE" and row["lang"] is None
    # the doc_id=0 evolved value survived the second merge untouched
    assert after2.where(F.col("doc_id") == 0).first()["quality"] == 0.99

    # a type change is never evolution
    upd3 = spark.createDataFrame(
        [(2, 7)], "doc_id bigint, text bigint"
    )
    with _pytest.raises(ValueError, match="not additive evolution"):
        maintenance.merge_upsert(
            spark, path, upd3, key_cols=["doc_id"], evolve_schema=True
        )


def test_maintenance_cli_lake_commands_end_to_end(spark, tmp_path, capsys):
    """CLI drive of the commit-log surface: set-partitioning evolves a
    live table (metadata-only), cdf reports the change feed between two
    versions (and writes it to parquet), each as one JSON line."""
    import json

    from cve_manager_spark import maintenance_cli
    from cve_manager_spark.commitlog import TableLog

    path = str(tmp_path / "cli_lake")
    spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id % 4 AS INT) AS part", "id * 2 AS v"
    ).write.parquet(path)
    log = TableLog(path)
    log.init()

    assert (
        maintenance_cli.main(
            ["set-partitioning", "--path", path, "--by", "part"]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["layout"] == ["part"]
    assert log.layout_of() == ["part"]

    log.delete_where(spark, "k % 10 = 3")
    feed_dir = str(tmp_path / "cli_feed")
    assert (
        maintenance_cli.main(
            [
                "cdf", "--path", path, "--from", "0",
                "--keys", "k", "--out", feed_dir,
            ]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["changes_by_type"] == {"delete": 10}
    assert spark.read.parquet(feed_dir).count() == 10


def test_maintenance_cli_drift_retrain_end_to_end(spark, tmp_path, capsys):
    """CLI drive of the drift-retrain loop: a committed IVF-PQ index
    that absorbed a geometry-shifted delta is rebuilt by one CLI call
    (rebuilt=true JSON), and an immediate second call is a no-op."""
    import json

    from pyspark.sql import functions as F

    from cve_manager_spark import maintenance_cli
    from cve_manager_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_upsert,
        write_ivf_pq_index,
    )
    from cve_manager_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 3 != 2)
    idx, cents, books = ivf_pq_index(base, n_lists=8, m=8, k_codes=16)
    path = str(tmp_path / "cli_ivf_idx")
    write_ivf_pq_index(idx, cents, books, path, committed=True)
    drifted = emb.where(F.col("vec_id") % 3 == 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    ivf_pq_upsert(spark, path, drifted)
    corpus_dir = str(tmp_path / "cli_ivf_corpus")
    base.unionByName(drifted).write.parquet(corpus_dir)

    assert (
        maintenance_cli.main(
            ["drift-retrain", "--path", path, "--corpus", corpus_dir]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rebuilt"] is True and rep["n_drifted_cells"] >= 1

    assert (
        maintenance_cli.main(
            ["drift-retrain", "--path", path, "--corpus", corpus_dir]
        )
        == 0
    )
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rebuilt"] is False


def test_maintenance_cli_catalog_commands_end_to_end(spark, tmp_path, capsys):
    """CLI drive of the multi-table catalog: status reports pins and
    out-of-band drift, reconcile repairs crash debris (one JSON line),
    sync adopts a direct write."""
    import json

    from pyspark.sql import functions as F

    from cve_manager_spark import maintenance_cli
    from cve_manager_spark.catalogtx import CatalogLog
    from cve_manager_spark.commitlog import TableLog

    fpath, dpath = tmp_path / "cli_cat_f", tmp_path / "cli_cat_d"
    spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").write.parquet(
        str(fpath)
    )
    spark.range(0, 10).selectExpr(
        "id AS dk", "concat('s', id) AS seg"
    ).write.parquet(str(dpath))
    flog, dlog = TableLog(str(fpath)), TableLog(str(dpath))
    flog.init()
    dlog.init()
    cat = CatalogLog(str(tmp_path / "cli_cat_log"))
    cat.init({"facts": flog, "dim": dlog})

    # crash debris: a transaction table-commits then dies
    dead = cat.begin()
    dead.table("facts").delete_where(spark, "k % 2 = 0")

    assert maintenance_cli.main(
        ["catalog-status", "--catalog", str(cat.root)]
    ) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["tables"]["facts"]["out_of_band_commits"] == 1
    assert st["tables"]["dim"]["out_of_band_commits"] == 0

    # default --min-age protects a possibly-live writer: the debris is
    # young, so nothing is rolled back yet
    assert maintenance_cli.main(
        ["catalog-reconcile", "--catalog", str(cat.root)]
    ) == 0
    guarded = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert guarded["rolled_back"] == []
    assert guarded["skipped_live"] == [
        {"table": "facts", "txns": [dead.txn_id]}
    ]
    assert maintenance_cli.main(
        ["catalog-reconcile", "--catalog", str(cat.root), "--min-age", "0"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rep["rolled_back"]) == 1
    assert cat.read(spark, "facts").count() == 100  # debris rolled back

    # out-of-band direct write, adopted by catalog-sync
    dlog.append(
        spark,
        spark.range(10, 12).selectExpr("id AS dk", "concat('s', id) AS seg"),
    )
    assert cat.read(spark, "dim").count() == 10
    assert maintenance_cli.main(
        ["catalog-sync", "--catalog", str(cat.root), "--table", "dim"]
    ) == 0
    sy = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sy["table"] == "dim"
    assert cat.read(spark, "dim").count() == 12

    # tag via CLI, visible in status, resolvable in reads, deletable
    assert maintenance_cli.main(
        ["catalog-tag", "--catalog", str(cat.root), "--name", "rel-a"]
    ) == 0
    tg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert tg["tag"] == "rel-a"
    assert maintenance_cli.main(
        ["catalog-status", "--catalog", str(cat.root)]
    ) == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["tags"] == {"rel-a": tg["version"]}
    assert cat.read(spark, "dim", tag="rel-a").count() == 12
    assert maintenance_cli.main(
        ["catalog-tag", "--catalog", str(cat.root), "--name", "rel-a",
         "--delete"]
    ) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cat.tags() == {}

    # register a new table via CLI, then unregister it; old snapshots
    # keep reading it
    npath = tmp_path / "cli_cat_n"
    spark.range(0, 7).selectExpr("id AS nk").write.parquet(str(npath))
    TableLog(str(npath)).init()
    assert maintenance_cli.main(
        ["catalog-add-table", "--catalog", str(cat.root),
         "--table", "notes", "--path", str(npath)]
    ) == 0
    ad = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ad["table"] == "notes"
    assert cat.read(spark, "notes").count() == 7
    v_with = cat.latest_version()
    assert maintenance_cli.main(
        ["catalog-drop-table", "--catalog", str(cat.root),
         "--table", "notes"]
    ) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "notes" not in cat.snapshot()[1]
    assert cat.read(spark, "notes", version=v_with).count() == 7


def test_maintenance_cli_catalog_vacuum(spark, tmp_path, capsys):
    """CLI drive of catalog-aware retention: one JSON line with the
    dropped catalog manifests and per-table reclaim counts; surviving
    snapshot still reads."""
    import json

    from cve_manager_spark import maintenance_cli
    from cve_manager_spark.catalogtx import CatalogLog
    from cve_manager_spark.commitlog import TableLog

    fpath = tmp_path / "cliv_f"
    spark.range(0, 50).selectExpr("id AS k", "id AS v").write.parquet(
        str(fpath)
    )
    flog = TableLog(str(fpath))
    flog.init()
    cat = CatalogLog(str(tmp_path / "cliv_log"))
    cat.init({"facts": flog})
    for i in range(2):
        txn = cat.begin()
        txn.table("facts").delete_where(spark, f"k % 10 = {i}")
        cat.commit(txn)

    assert maintenance_cli.main(
        ["catalog-vacuum", "--catalog", str(cat.root), "--keep", "1",
         "--min-age", "0"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["dropped_catalog_manifests"] == 2
    assert cat.read(spark, "facts").count() == 40


def test_maintenance_cli_catalog_branch_merge(spark, tmp_path, capsys):
    """CLI drive of branch/merge: fork, diverge on the branch, merge
    back — one JSON line each."""
    import json

    from cve_manager_spark import maintenance_cli
    from cve_manager_spark.catalogtx import CatalogLog
    from cve_manager_spark.commitlog import TableLog

    fpath = tmp_path / "clibr_f"
    spark.range(0, 100).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.parquet(str(fpath))
    flog = TableLog(str(fpath))
    flog.init()
    cat = CatalogLog(str(tmp_path / "clibr_log"))
    cat.init({"facts": flog})

    dest = str(tmp_path / "clibr_branch")
    assert maintenance_cli.main(
        ["catalog-branch", "--catalog", str(cat.root), "--dest", dest]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["tables"] == ["facts"]
    br = CatalogLog(rep["branch"])
    txn = br.begin()
    txn.table("facts").delete_where(spark, "k >= 60")
    br.commit(txn)
    assert cat.read(spark, "facts").count() == 100  # main untouched

    assert maintenance_cli.main(
        ["catalog-merge", "--catalog", str(cat.root),
         "--branch", str(br.root)]
    ) == 0
    mrep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mrep["merged"] == ["facts"]
    assert cat.read(spark, "facts").count() == 60
