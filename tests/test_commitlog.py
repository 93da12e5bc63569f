"""commitlog.py: snapshot isolation + optimistic-concurrency commits.

The properties a transaction log exists for are tested directly:
two writers racing on the same parent version → exactly one wins, the
loser detects the conflict, cleans up its staged files, and a retry
against the fresh snapshot succeeds (never a mixed layout); a reader
pinned to an old version keeps seeing its snapshot across later commits;
untouched files keep their exact bytes across committed COW ops; orphans
from a crashed writer are invisible and vacuum reclaims them.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cve_manager_spark.commitlog import CommitConflict, TableLog


def _mk_table(spark, tmp_path, partitioned: bool = False) -> TableLog:
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    path = tmp_path / ("t_part" if partitioned else "t_flat")
    w = df.repartition(4, "k").write
    if partitioned:
        w = w.partitionBy("part")
    w.parquet(str(path))
    log = TableLog(str(path))
    log.init()
    return log


def _digests(root: Path) -> dict[str, str]:
    return {
        str(p.relative_to(root)): hashlib.sha256(p.read_bytes()).hexdigest()
        for p in root.rglob("*.parquet")
    }


def test_init_adopts_existing_files_and_refuses_twice(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    v, files = log.snapshot()
    assert v == 0
    assert len(files) == len(list(log.root.rglob("*.parquet")))
    assert log.read(spark).count() == 200
    with pytest.raises(ValueError, match="already exists"):
        log.init()


def test_committed_delete_matches_plain_semantics_and_is_versioned(
    spark, tmp_path
):
    log = _mk_table(spark, tmp_path)
    before = _digests(log.root)
    out = log.delete_where(spark, F.col("k") % 10 == 3)
    assert out["n_deleted"] == 20
    assert out["version"] == 1
    got = log.read(spark)
    assert got.count() == 180
    assert got.where(F.col("k") % 10 == 3).count() == 0
    # data files are immutable: every v0 file still on disk, bytes intact
    after = _digests(log.root)
    for rel, dig in before.items():
        assert after[rel] == dig, f"writer mutated committed file {rel}"
    # time travel: the pinned v0 read still sees all 200 rows
    assert log.read(spark, version=0).count() == 200


def test_concurrent_writers_one_loses_cleanly_and_retry_succeeds(
    spark, tmp_path
):
    """The race the protocol exists for: both writers pin v0; B commits
    v1 first; A's publish must fail with CommitConflict, leave the table
    exactly at B's v1 (no staged files referenced or left), and a retry
    of A against the fresh snapshot must apply BOTH effects."""
    log_a = _mk_table(spark, tmp_path)
    log_b = TableLog(str(log_a.root))

    # simulate interleaving: A pins v0 by grabbing the snapshot, B runs a
    # full committed op to v1, then A tries to publish against parent 0.
    v0, files0 = log_a.snapshot()
    out_b = log_b.delete_where(spark, F.col("k") < 50)
    assert out_b["version"] == 1

    staged = log_a._stage(
        log_a.read(spark, version=v0).where(F.col("k") < 150), "cmp", []
    )
    n_staged_before = len(staged)
    assert all((log_a.root / r).exists() for r in staged)
    with pytest.raises(CommitConflict):
        try:
            log_a._publish(v0, staged, "compact")
        except CommitConflict:
            log_a._abort(staged)
            raise
    # loser cleaned up: none of its staged files remain
    assert not any((log_a.root / r).exists() for r in staged)
    assert n_staged_before > 0
    # table is exactly B's commit
    v, _ = log_a.snapshot()
    assert v == 1
    assert log_a.read(spark).count() == 150

    # retry against the fresh snapshot: both effects now visible
    out_retry = log_a.compact(spark, target_rows_per_file=1000)
    assert out_retry["version"] == 2
    got = log_a.read(spark)
    assert got.count() == 150
    assert got.where(F.col("k") < 50).count() == 0


def test_snapshot_isolation_reader_pinned_across_commit(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    pinned = log.read(spark, version=0)  # lazy plan over v0's file list
    log.merge_upsert(
        spark,
        spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.lit(0).cast("int").alias("part"),
            F.lit(-1).cast("bigint").alias("v"),
        ),
        key_cols=["k"],
    )
    # the pinned plan executes AFTER the commit and still sees v0: the
    # superseded files are untouched on disk until vacuum
    assert pinned.where(F.col("v") < 0).count() == 0
    assert pinned.count() == 200
    assert log.read(spark).where(F.col("v") < 0).count() == 5


def test_merge_rewrites_only_matched_files(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    _, files0 = log.snapshot()
    upd = spark.createDataFrame(
        [(7, 3, 777), (1000, 0, 1)], "k bigint, part int, v bigint"
    )
    out = log.merge_upsert(spark, upd, key_cols=["k"])
    assert out["n_matched"] == 1 and out["n_inserted"] == 1
    _, files1 = log.snapshot()
    # untouched v0 files carried forward by reference into v1
    untouched = set(files0) & set(files1)
    assert len(untouched) == len(files0) - out["files_touched"]
    got = log.read(spark)
    assert got.count() == 201
    assert got.where("k = 7").head()["v"] == 777


def test_partitioned_table_keeps_hive_layout_through_committed_ops(
    spark, tmp_path
):
    log = _mk_table(spark, tmp_path, partitioned=True)
    log.delete_where(spark, "part = 2 AND k < 100")
    log.compact(spark, target_rows_per_file=1000)
    _, files = log.snapshot()
    # every live file sits under a part=N dir and reads carry the column
    assert all(f.startswith("part=") for f in files)
    got = log.read(spark)
    assert got.where("part = 2").count() == 25
    assert got.count() == 175
    assert set(got.columns) == {"k", "part", "v"}


def test_vacuum_reclaims_superseded_and_orphan_files(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    log.delete_where(spark, "k >= 100")
    # crashed writer: staged files exist but were never committed
    orphans = log._stage(log.read(spark).limit(3), "mrg", [])
    assert all((log.root / r).exists() for r in orphans)
    # orphans are invisible to readers even before vacuum
    assert log.read(spark).count() == 100

    # explicit 0 opts into aggressive reclaim (no writer can be in
    # flight here); the conservative default would spare these fresh files
    out = log.vacuum(keep_versions=1, min_age_seconds=0)
    assert out["dropped_manifests"] == 1
    assert out["dropped_files"] > 0
    # exactly the live manifest's files remain on disk
    _, live = log.snapshot()
    on_disk = {str(p.relative_to(log.root)) for p in log.root.rglob("*.parquet")}
    assert on_disk == set(live)
    assert log.read(spark).count() == 100
    # dropped version is gone
    with pytest.raises(ValueError, match="not in log"):
        log.snapshot(version=0)


def test_delete_to_empty_table_stays_readable(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    out = log.delete_where(spark, F.lit(True))
    assert out["n_deleted"] == 200
    got = log.read(spark)
    assert got.count() == 0
    assert set(got.columns) == {"k", "part", "v"}


def test_conflict_manifest_is_well_formed_json(spark, tmp_path):
    """The commit artifact itself: versions chain by parent and list
    only files that exist."""
    log = _mk_table(spark, tmp_path)
    log.delete_where(spark, "k = 0")
    for v in log.versions():
        with open(log.root / "_commits" / f"v{v:012d}.json") as f:
            m = json.load(f)
        assert m["version"] == v
        assert m["parent"] == v - 1
        for rel in m["files"]:
            assert (log.root / rel).exists()


def _race_attempt(root_str: str, i: int, q) -> None:
    """Module-level worker (spawn requires a picklable target): try to
    publish v1 of the shared table; report win or conflict."""
    from cve_manager_spark.commitlog import CommitConflict, TableLog

    log = TableLog(root_str)
    try:
        log._publish(0, [f"part-{i:05d}.parquet"], op=f"writer-{i}")
        q.put(("win", i))
    except CommitConflict:
        q.put(("conflict", i))


def test_publish_race_across_real_processes(tmp_path):
    """The commit primitive under REAL concurrency: N OS processes race
    to publish the same version of the same table; exactly one hard-link
    must win, every loser must observe CommitConflict, and the winning
    manifest must be one of the staged bodies intact (no torn/partial
    JSON). No Spark involved — this is the pure protocol."""
    import json
    import multiprocessing as mp

    from cve_manager_spark.commitlog import TableLog

    root = tmp_path / "race_table"
    (root / "_commits").mkdir(parents=True)
    TableLog(str(root))._publish(parent=-1, files=[], op="init")

    n = 8
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_race_attempt, args=(str(root), i, q))
        for i in range(n)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
    results = [q.get(timeout=10) for _ in range(n)]
    wins = [i for kind, i in results if kind == "win"]
    conflicts = [i for kind, i in results if kind == "conflict"]
    assert len(wins) == 1, f"expected exactly one winner, got {wins}"
    assert len(conflicts) == n - 1
    with open(root / "_commits" / "v000000000001.json") as f:
        m = json.load(f)
    assert m["op"] == f"writer-{wins[0]}"
    assert m["files"] == [f"part-{wins[0]:05d}.parquet"]
    # no stray tmp manifests left behind
    assert not list((root / "_commits").glob(".tmp-*"))


def test_vacuum_age_guard_spares_live_writers_staging(spark, tmp_path):
    """min_age_seconds protects an IN-FLIGHT writer: its freshly staged
    (unreferenced) files survive an age-guarded vacuum, while an old
    superseded file is still reclaimed — the retention-window trade a
    multi-writer deployment needs."""
    import os
    import time

    log = _mk_table(spark, tmp_path)
    _, files0 = log.snapshot()
    log.delete_where(spark, "k >= 100")  # supersedes v0 files
    # backdate the superseded originals so they read as old
    for rel in files0:
        old = time.time() - 3600
        os.utime(log.root / rel, (old, old))
    # a "live writer" stages fresh files right now
    staged = log._stage(log.read(spark).limit(3), "mrg", [])
    assert all((log.root / r).exists() for r in staged)

    out = log.vacuum(keep_versions=1, min_age_seconds=600)
    assert out["dropped_files"] > 0  # old superseded files reclaimed
    # the live writer's staging survived
    assert all((log.root / r).exists() for r in staged)
    # the DEFAULT is the guarded setting: a vacuum invoked with no
    # retention argument (routine maintenance) must also spare them
    out_default = log.vacuum(keep_versions=1)
    assert all((log.root / r).exists() for r in staged)
    assert out_default["dropped_files"] == 0
    # a later explicit-0 vacuum (writer done/crashed) reclaims them
    log.vacuum(keep_versions=1, min_age_seconds=0)
    assert not any((log.root / r).exists() for r in staged)
    assert log.read(spark).count() == 100


def test_relative_table_path_is_normalized(spark, tmp_path, monkeypatch):
    """TableLog('rel/dir') must behave like its absolute form:
    delete_where maps input_file_name()'s absolute file:// URIs back to
    manifest-relative paths via relative_to(self.root), which raises
    mid-operation if root stayed relative."""
    log_abs = _mk_table(spark, tmp_path)
    monkeypatch.chdir(tmp_path)
    log = TableLog("t_flat")
    assert log.root.is_absolute()
    out = log.delete_where(spark, "k < 20")
    assert out["n_deleted"] == 20
    assert log.read(spark).count() == 180


def test_merge_rejects_type_divergence(spark, tmp_path):
    """Same column names, different type: the guard must refuse instead
    of silently widening the table schema in the rewritten files."""
    log = _mk_table(spark, tmp_path)
    upd = spark.createDataFrame([(7, 3, 777)], "k int, part int, v bigint")
    with pytest.raises(ValueError, match="types diverge"):
        log.merge_upsert(spark, upd, key_cols=["k"])
    v, _ = log.snapshot()
    assert v == 0  # nothing committed


def test_merge_with_stale_expected_version_conflicts(spark, tmp_path):
    """The TOCTOU the streaming sink retry loop arbitrates: updates
    derived from a v0 read, another writer commits v1 in between. A
    merge pinned to expected_version=0 must surface CommitConflict (so
    the caller recomputes) instead of publishing winners computed from
    the stale snapshot on top of the interleaved commit."""
    log = _mk_table(spark, tmp_path)
    v0, _ = log.snapshot()
    upd = spark.createDataFrame(
        [(7, 3, 777)], "k bigint, part int, v bigint"
    )
    # interleaved writer commits v1
    other = TableLog(str(log.root))
    assert other.delete_where(spark, "k >= 150")["version"] == 1
    with pytest.raises(CommitConflict):
        log.merge_upsert(spark, upd, key_cols=["k"], expected_version=v0)
    # the interleaved delete was NOT clobbered and no merge leaked in
    got = log.read(spark)
    assert got.count() == 150
    assert got.where("k = 7").head()["v"] == 70
    # unpinned retry against the fresh snapshot applies both effects
    out = log.merge_upsert(spark, upd, key_cols=["k"])
    assert out["version"] == 2
    got = log.read(spark)
    assert got.count() == 150
    assert got.where("k = 7").head()["v"] == 777


def test_append_publishes_union_and_preserves_old_bytes(spark, tmp_path):
    log = _mk_table(spark, tmp_path, partitioned=True)
    before = _digests(log.root)
    rows = spark.range(1000, 1010).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    res = log.append(spark, rows)
    assert res == {"n_appended": 10, "version": 1}
    got = log.read(spark)
    assert got.count() == 210
    assert got.where(F.col("k") >= 1000).count() == 10
    after = _digests(log.root)
    for rel, d in before.items():  # blind append: nothing rewritten
        assert after[rel] == d
    # appending zero rows is a no-op, no new version
    assert log.append(spark, rows.limit(0)) == {"n_appended": 0, "version": 1}
    assert log.versions() == [0, 1]


def test_append_rejects_schema_and_type_divergence(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    with pytest.raises(ValueError, match="schema mismatch"):
        log.append(spark, spark.range(5).select(F.col("id").alias("k")))
    bad_types = spark.range(5).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("long").alias("part"),  # table has int
        (F.col("id") * 10).alias("v"),
    )
    with pytest.raises(ValueError, match="types diverge"):
        log.append(spark, bad_types)


def test_append_with_stale_expected_version_conflicts_and_aborts(
    spark, tmp_path
):
    log = _mk_table(spark, tmp_path)
    v0 = log.snapshot()[0]
    rows = spark.range(500, 505).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, rows)  # interleaved writer lands v1
    n_files_before = len(list(log.root.rglob("*.parquet")))
    with pytest.raises(CommitConflict):
        log.append(spark, rows, expected_version=v0)
    # the loser's staged files were aborted — no orphans
    assert len(list(log.root.rglob("*.parquet"))) == n_files_before


def test_blind_append_retries_past_interleaved_commit(
    spark, tmp_path, monkeypatch
):
    """An append that loses the publish race re-publishes its ALREADY
    staged files against the fresh parent — no restage, no data loss."""
    log = _mk_table(spark, tmp_path)
    rows = spark.range(500, 505).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    other = spark.range(900, 903).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    real_publish = TableLog._publish
    state = {"interleaved": False}

    def racing_publish(self, parent, files, op, schema=None):
        if op == "append" and not state["interleaved"]:
            state["interleaved"] = True
            # another writer lands between our snapshot and our publish
            fresh = TableLog(str(self.root))
            monkeypatch.undo()
            fresh.append(spark, other)
            monkeypatch.setattr(TableLog, "_publish", racing_publish)
        return real_publish(self, parent, files, op, schema=schema)

    monkeypatch.setattr(TableLog, "_publish", racing_publish)
    res = log.append(spark, rows)
    monkeypatch.undo()
    assert res["n_appended"] == 5
    got = log.read(spark)
    assert got.count() == 208  # 200 + 3 interleaved + 5 ours
    assert got.where((F.col("k") >= 500) & (F.col("k") < 505)).count() == 5
    assert got.where(F.col("k") >= 900).count() == 3


def test_blind_append_retry_keeps_interleaved_evolved_schema(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: when the commit that wins the race performed an
    additive schema evolution, the retried append must publish the
    UNION of schemas — re-publishing the pre-conflict schema would
    record the narrower shape and hide the concurrently added column
    from every later reader (read() applies the manifest schema)."""
    log = _mk_table(spark, tmp_path)
    rows = spark.range(500, 505).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    evolved = spark.range(900, 903).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
        F.lit("fr").alias("lang"),
    )
    real_publish = TableLog._publish
    state = {"interleaved": False}

    def racing_publish(self, parent, files, op, schema=None):
        if op == "append" and not state["interleaved"]:
            state["interleaved"] = True
            fresh = TableLog(str(self.root))
            monkeypatch.undo()
            fresh.append(spark, evolved, allow_evolution=True)
            monkeypatch.setattr(TableLog, "_publish", racing_publish)
        return real_publish(self, parent, files, op, schema=schema)

    monkeypatch.setattr(TableLog, "_publish", racing_publish)
    res = log.append(spark, rows)
    monkeypatch.undo()
    assert res["n_appended"] == 5

    got = log.read(spark)
    # the interleaved evolution's column survives the retried publish
    assert set(got.columns) == {"k", "part", "v", "lang"}
    assert got.where(F.col("lang") == "fr").count() == 3
    assert got.where((F.col("k") >= 500) & (F.col("k") < 505)).count() == 5
    assert got.count() == 208


def test_rollback_restores_old_snapshot_as_new_commit(spark, tmp_path):
    """RESTORE semantics: rolling back publishes a new version whose
    manifest copies the old one — zero data bytes rewritten, history
    moves forward, intermediate readers stay pinned."""
    log = _mk_table(spark, tmp_path)
    v0_files = set(log.snapshot()[0:2][1])
    log.delete_where(spark, "k % 2 = 0")  # v1
    assert log.read(spark).count() == 100
    res = log.rollback(0)
    assert res["version"] == 2
    v2, files2 = log.snapshot()
    assert v2 == 2 and set(files2) == v0_files  # manifest copy, no new parts
    assert log.read(spark).count() == 200
    # a reader pinned to the deleted-state version still sees it
    assert log.read(spark, version=1).count() == 100
    # rolling back to the current state is a no-op, no version burned
    assert log.rollback(2) == {"version": 2, "n_files": len(files2)}


def test_append_evolution_adds_column_nulls_old_rows_versions_schema(
    spark, tmp_path
):
    """Additive schema evolution: the widened schema is recorded in the
    new manifest (old files project NULL for the new column, zero
    rewrite), pinned readers keep the pre-evolution schema, and a
    rollback past the evolution restores the old schema too."""
    log = _mk_table(spark, tmp_path, partitioned=True)
    before = _digests(log.root)
    widened = spark.range(1000, 1010).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
        F.lit("fr").alias("lang"),
    )
    with pytest.raises(ValueError, match="allow_evolution"):
        log.append(spark, widened)
    res = log.append(spark, widened, allow_evolution=True)
    assert res == {"n_appended": 10, "version": 1}

    got = log.read(spark)
    assert set(got.columns) == {"k", "part", "v", "lang"}
    assert got.count() == 210
    assert got.where(F.col("lang").isNull()).count() == 200  # old files
    assert got.where(F.col("lang") == "fr").count() == 10
    after = _digests(log.root)
    for rel, d in before.items():  # no old file rewritten
        assert after[rel] == d

    # schema is versioned with the data: pinned v0 keeps the old shape
    assert set(log.read(spark, version=0).columns) == {"k", "part", "v"}

    # dropping a table column is still an error, evolution or not
    with pytest.raises(ValueError, match="schema mismatch"):
        log.append(
            spark,
            widened.drop("v"),
            allow_evolution=True,
        )

    # committed ops on the evolved table carry the evolved schema
    log.delete_where(spark, "k % 2 = 0 AND lang IS NULL")
    got2 = log.read(spark)
    assert set(got2.columns) == {"k", "part", "v", "lang"}
    assert got2.count() == 110

    # rollback past the evolution restores the OLD schema with the data
    log.rollback(0)
    got3 = log.read(spark)
    assert set(got3.columns) == {"k", "part", "v"}
    assert got3.count() == 200


def _append_race_attempt(root: str, i: int, q):
    from cve_manager_spark.commitlog import CommitConflict, TableLog

    log = TableLog(root)
    rel = f"part-app-{i:05d}.parquet"
    (log.root / rel).write_bytes(b"x")  # pre-staged data file
    retries = 0
    for _ in range(50):
        version, files = log.snapshot()
        try:
            log._publish(version, list(files) + [rel], f"append-{i}")
            q.put(("ok", i, retries))
            return
        except CommitConflict:
            retries += 1
    q.put(("fail", i, retries))


def test_blind_append_protocol_under_real_process_race(tmp_path):
    """The blind-append commutation argument under REAL concurrency:
    N OS processes each append one distinct pre-staged file using the
    snapshot -> publish -> retry-on-conflict loop (the protocol inside
    TableLog.append). Every append must eventually land, the final
    manifest must contain ALL N files (no lost update — the exact
    failure the retry-against-fresh-parent publish prevents), and the
    version chain must be a clean 1..N."""
    import multiprocessing as mp

    from cve_manager_spark.commitlog import TableLog

    root = tmp_path / "append_race_table"
    (root / "_commits").mkdir(parents=True)
    TableLog(str(root))._publish(parent=-1, files=[], op="init")

    n = 8
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_append_race_attempt, args=(str(root), i, q))
        for i in range(n)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    results = [q.get(timeout=10) for _ in range(n)]
    assert all(kind == "ok" for kind, _, _ in results), results

    log = TableLog(str(root))
    assert log.versions() == list(range(n + 1))
    _, files = log.snapshot()
    assert sorted(files) == sorted(
        f"part-app-{i:05d}.parquet" for i in range(n)
    )


def test_latest_pointer_gives_o1_reads_at_500_versions(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 #6: a long-lived table (≈500 committed versions) must
    not pay an all-versions directory listing on every read. snapshot()
    and read() resolve through the ``_latest`` pointer — zero log-dir
    listings on the hot path — the pointer survives lagging (probe
    forward) and deletion (fallback + self-heal), vacuum prunes old
    manifests, and pinned reads stay isolated: a retained old version
    still reads, a vacuumed one fails loudly."""
    import cve_manager_spark.commitlog as cl

    log = _mk_table(spark, tmp_path)
    # 500 metadata-only commits (the manifest protocol is the thing
    # under test; staging real part files 500x would test Spark I/O)
    _, files = log.snapshot()
    for _ in range(500):
        v, _ = log.snapshot()
        log._publish(v, files, "noop-meta")
    assert log.latest_version() == 500

    # hot path does ZERO log-dir listings once the pointer is warm
    real_glob = Path.glob
    calls = {"n": 0}

    def counting_glob(self, pattern, *a, **kw):
        if "_commits" in str(self):
            calls["n"] += 1
        return real_glob(self, pattern, *a, **kw)

    monkeypatch.setattr(Path, "glob", counting_glob)
    v, fs = log.snapshot()
    assert (v, sorted(fs)) == (500, sorted(files))
    assert log.last_op() == "noop-meta"
    got = log.read(spark)
    assert got.count() == 200
    assert calls["n"] == 0, f"hot path listed the log dir {calls['n']}x"
    monkeypatch.undo()

    # lagging pointer (crash between link and pointer write): probe
    # forward finds the real latest and self-heals the pointer
    cl._latest_hint_path(log.root).write_text("490")
    assert log.latest_version() == 500
    assert cl._read_latest_hint(log.root) == 500
    # missing pointer (pre-pointer table): fallback lists, then heals
    cl._latest_hint_path(log.root).unlink()
    assert log.latest_version() == 500
    assert cl._read_latest_hint(log.root) == 500

    # manifest retention: vacuum keeps the newest K manifests only
    res = log.vacuum(keep_versions=5, min_age_seconds=0)
    assert res["dropped_manifests"] == 496  # v0..v495 pruned
    assert log.versions() == [496, 497, 498, 499, 500]
    # pinned read of a RETAINED old version still isolated
    assert log.read(spark, version=496).count() == 200
    # a vacuumed version fails loudly, not silently-latest
    with pytest.raises(ValueError, match="not in log"):
        log.snapshot(version=3)


def test_changes_multiset_diff_reads_only_manifest_delta(spark, tmp_path):
    """CDF between versions: appends surface as inserts, committed
    deletes as deletes, a compaction (rewrite without row change)
    diffs to EMPTY — the shared-file cancellation that makes CDF cost
    proportional to changed data. v==v diffs to empty too."""
    log = _mk_table(spark, tmp_path)
    v0 = log.latest_version()

    extra = spark.range(200, 230).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, extra)
    v1 = log.latest_version()

    ch = log.changes(spark, v0, v1)
    rows = ch.collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert sum(r["_change_count"] for r in rows) == 30
    assert {r["k"] for r in rows} == set(range(200, 230))

    log.delete_where(spark, "k >= 220")
    v2 = log.latest_version()
    ch = log.changes(spark, v1, v2)
    rows = ch.collect()
    assert all(r["_change_type"] == "delete" for r in rows)
    assert {r["k"] for r in rows} == set(range(220, 230))

    # reversed range: the same rows classify as inserts
    back = log.changes(spark, v2, v1).collect()
    assert all(r["_change_type"] == "insert" for r in back)
    assert {r["k"] for r in back} == set(range(220, 230))

    log.compact(spark, target_rows_per_file=1000)
    v3 = log.latest_version()
    assert log.changes(spark, v2, v3).count() == 0  # rewrite, no change
    assert log.changes(spark, v2, v2).count() == 0


def test_changes_keyed_classifies_updates_as_pre_post_pairs(spark, tmp_path):
    """Keyed CDF: merge_upsert's matched keys emit update_preimage +
    update_postimage pairs carrying the old and new payloads, unmatched
    keys emit inserts — and rows merely rewritten alongside them (same
    file, unchanged payload) cancel instead of surfacing as churn."""
    log = _mk_table(spark, tmp_path)
    v0 = log.latest_version()

    updates = spark.range(0, 3).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        F.lit(99999).cast("long").alias("v"),
    ).unionByName(
        spark.range(500, 502).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("part"),
            (F.col("id") * 10).alias("v"),
        )
    )
    log.merge_upsert(spark, updates, ["k"])
    v1 = log.latest_version()

    ch = log.changes(spark, v0, v1, key_cols=["k"]).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], set()).add(r["k"])
    assert by_type["insert"] == {500, 501}
    assert by_type["update_preimage"] == {0, 1, 2}
    assert by_type["update_postimage"] == {0, 1, 2}
    assert "delete" not in by_type
    pre = {r["k"]: r["v"] for r in ch if r["_change_type"] == "update_preimage"}
    post = {r["k"]: r["v"] for r in ch if r["_change_type"] == "update_postimage"}
    assert pre == {0: 0, 1: 10, 2: 20}
    assert post == {0: 99999, 1: 99999, 2: 99999}
    # rewritten-unchanged neighbors in the merged files never surface
    assert all(r["k"] in {0, 1, 2, 500, 501} for r in ch)


def test_changes_aligns_an_additive_schema_evolution(spark, tmp_path):
    """CDF across an additive evolution: the new column reads NULL on
    the pre-evolution side, so evolved appends surface as plain inserts
    carrying the new column — never a schema error."""
    log = _mk_table(spark, tmp_path)
    base = spark.range(0, 5).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, base)  # first committed write records the schema
    v1 = log.latest_version()
    wide = spark.range(300, 305).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
        F.lit("tagged").alias("note"),
    )
    log.append(spark, wide, allow_evolution=True)
    v2 = log.latest_version()
    ch = log.changes(spark, v1, v2)
    rows = ch.collect()
    assert set(ch.columns) >= {"k", "part", "v", "note"}
    assert all(r["_change_type"] == "insert" for r in rows)
    assert {r["k"] for r in rows} == set(range(300, 305))
    assert all(r["note"] == "tagged" for r in rows)


def test_changes_keyed_update_to_null_emits_null_postimage(spark, tmp_path):
    """An update that sets a payload column to NULL must surface NULL in
    the update_postimage — a from-side fallback would resurrect the
    stale pre-value, and a downstream applier (apply_facts_changes)
    would then materialize the dead value into the join view."""
    log = _mk_table(spark, tmp_path)
    v0 = log.latest_version()
    upd = spark.createDataFrame(
        [(0, 0, None)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("part", T.IntegerType()),
                T.StructField("v", T.LongType()),
            ]
        ),
    )
    log.merge_upsert(spark, upd, ["k"])
    v1 = log.latest_version()
    ch = log.changes(spark, v0, v1, key_cols=["k"]).collect()
    pre = [r for r in ch if r["_change_type"] == "update_preimage"]
    post = [r for r in ch if r["_change_type"] == "update_postimage"]
    assert len(pre) == 1 and pre[0]["k"] == 0 and pre[0]["v"] == 0
    assert len(post) == 1 and post[0]["k"] == 0
    assert post[0]["v"] is None  # NOT the resurrected pre-value 0


def test_changes_keyed_all_null_row_is_visible(spark, tmp_path):
    """A row whose every column is NULL still surfaces as an insert and
    later a delete: presence in the full-outer join is decided by
    literal markers, not value-nullness, so an all-NULL row can never
    silently cancel against its own absence."""
    log = _mk_table(spark, tmp_path)
    v0 = log.latest_version()
    nullrow = spark.createDataFrame(
        [(None, None, None)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("part", T.IntegerType()),
                T.StructField("v", T.LongType()),
            ]
        ),
    )
    log.append(spark, nullrow)
    v1 = log.latest_version()
    ins = log.changes(spark, v0, v1, key_cols=["k"]).collect()
    assert len(ins) == 1
    assert ins[0]["_change_type"] == "insert"
    assert ins[0]["k"] is None and ins[0]["v"] is None

    log.delete_where(spark, "k IS NULL")
    v2 = log.latest_version()
    dels = log.changes(spark, v1, v2, key_cols=["k"]).collect()
    assert len(dels) == 1
    assert dels[0]["_change_type"] == "delete"
    assert dels[0]["k"] is None


def test_changes_reverse_diff_across_evolution(spark, tmp_path):
    """Reverse-direction CDF (v_from NEWER than v_to) across an additive
    evolution: the evolved column exists only on the from side, so the
    alignment template must span BOTH schemas — the evolved appends
    surface as deletes still carrying the new column's values."""
    log = _mk_table(spark, tmp_path)
    base = spark.range(0, 5).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, base)
    v1 = log.latest_version()
    wide = spark.range(300, 303).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
        F.lit("tagged").alias("note"),
    )
    log.append(spark, wide, allow_evolution=True)
    v2 = log.latest_version()
    back = log.changes(spark, v2, v1)
    rows = back.collect()
    assert set(back.columns) >= {"k", "part", "v", "note"}
    assert all(r["_change_type"] == "delete" for r in rows)
    assert {r["k"] for r in rows} == {300, 301, 302}
    assert all(r["note"] == "tagged" for r in rows)


def test_consume_changes_tails_the_log_with_at_least_once_ack(
    spark, tmp_path
):
    """Cursor-tailed CDF: each consume returns only the range since the
    last ACK; a crash before ack re-delivers the same range; latest-mode
    initialization consumes nothing until a new commit lands."""
    log = _mk_table(spark, tmp_path)
    cursor = str(tmp_path / "cdc" / "cursor.json")

    # latest-mode init: cursor snaps to head, nothing flows yet
    assert log.consume_changes(spark, cursor) is None
    assert log.consume_changes(spark, cursor) is None

    extra = spark.range(900, 910).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, extra)

    got = log.consume_changes(spark, cursor, key_cols=["k"])
    assert got is not None
    changes, ack = got
    rows = changes.collect()
    assert {r["k"] for r in rows} == set(range(900, 910))
    assert all(r["_change_type"] == "insert" for r in rows)

    # crash before ack: the same range re-delivers
    redo, ack2 = log.consume_changes(spark, cursor, key_cols=["k"])
    assert {r["k"] for r in redo.collect()} == set(range(900, 910))
    assert ack2() == log.latest_version()
    assert log.consume_changes(spark, cursor) is None  # drained

    # only the NEW range flows after more commits
    log.delete_where(spark, "k >= 905")
    changes, ack = log.consume_changes(spark, cursor, key_cols=["k"])
    rows = changes.collect()
    assert {(r["k"], r["_change_type"]) for r in rows} == {
        (k, "delete") for k in range(905, 910)
    }
    ack()
    assert log.consume_changes(spark, cursor) is None


def test_consume_changes_backfill_feeds_the_join_view(spark, tmp_path):
    """The full CDC bootstrap: seed the join view from the pinned v0
    SNAPSHOT expressed as inserts, then tail from v0 with a cursor —
    consume → apply → ack; the view then equals the batch recompute
    (exactly-once effect through the idempotent applier)."""
    from cve_manager_spark.sources.testdata import load_table
    from cve_manager_spark.streaming.sinks import (
        apply_facts_changes,
        read_join_view,
    )
    from tests.conftest import SF_SMALL

    fdir = str(tmp_path / "facts_log_bf")
    load_table(spark, SF_SMALL, "orders").write.parquet(fdir)
    log = TableLog(fdir)
    log.init()
    dim = load_table(spark, SF_SMALL, "customer")

    out = str(tmp_path / "jv_bf")
    cursor = str(tmp_path / "jv_bf_cursor.json")
    # bootstrap: the pinned v0 snapshot as synthetic inserts
    seed = log.read(spark, version=0).select(
        "*",
        F.lit("insert").alias("_change_type"),
        F.lit(1).cast("long").alias("_change_count"),
    )
    apply_facts_changes(
        spark, out, seed, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    )
    # tail from v0: only commits after the snapshot flow
    log.delete_where(spark, "o_orderkey % 3 = 0")
    changes, ack = log.consume_changes(
        spark, cursor, key_cols=["o_orderkey"], start_version=0
    )
    apply_facts_changes(
        spark, out, changes, dim, "o_orderkey", "o_custkey", "c_custkey",
        n_buckets=32,
    )
    ack()

    want_df = log.read(spark).join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    view = read_join_view(spark, out)
    cols = sorted(view.columns)

    def _rows(df):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert _rows(view) == _rows(want_df)
    assert log.consume_changes(spark, cursor) is None


def test_changes_roundtrip_reconstructs_the_target_snapshot(spark, tmp_path):
    """CDF theorem: v0 ⊎ inserts ∖ deletes == v2 as multisets — applying
    the multiset-mode change feed to the source snapshot reconstructs
    the target snapshot exactly, across a delete + a merge + an
    append."""
    from collections import Counter

    log = _mk_table(spark, tmp_path)
    v0 = log.latest_version()
    log.delete_where(spark, "k % 9 = 0")
    upd = (
        log.read(spark)
        .where(F.col("k") % 4 == 1)
        .withColumn("v", F.col("v") + 7)
    )
    log.merge_upsert(spark, upd, ["k"])
    extra = spark.range(600, 640).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, extra)
    v3 = log.latest_version()

    cols = ["k", "part", "v"]

    def multiset(df):
        return Counter(tuple(r) for r in df.select(*cols).collect())

    start = multiset(log.read(spark, version=v0))
    target = multiset(log.read(spark, version=v3))
    ch = log.changes(spark, v0, v3).collect()
    for r in ch:
        key = tuple(r[c] for c in cols)
        if r["_change_type"] == "insert":
            start[key] += r["_change_count"]
        else:
            start[key] -= r["_change_count"]
    assert +start == target  # unary + drops zero/negative entries


def test_partition_evolution_flat_to_hive(spark, tmp_path):
    """Iceberg-style partition evolution: set_partitioning is a
    metadata-only commit (zero data bytes move — asserted by digest),
    new writes land in the NEW layout, readers compose the mixed
    layouts per-file, pinned pre-evolution reads stay green, and COW
    ops keep working across the mix."""
    log = _mk_table(spark, tmp_path)  # flat layout
    v0 = log.latest_version()
    assert log.layout_of(v0) == []
    before = _digests(log.root)

    rep = log.set_partitioning(spark, ["part"])
    v1 = rep["version"]
    assert log.layout_of(v1) == ["part"]
    assert _digests(log.root) == before  # metadata-only: no byte moved
    _, files_v0 = log.snapshot(v0)
    _, files_v1 = log.snapshot(v1)
    assert files_v0 == files_v1

    extra = spark.range(200, 240).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") * 10).alias("v"),
    )
    log.append(spark, extra)
    v2 = log.latest_version()
    _, files_v2 = log.snapshot(v2)
    new_files = set(files_v2) - set(files_v1)
    assert new_files and all("part=" in f for f in new_files)
    # unmigrated originals: byte-identical, still at the flat layout
    after = _digests(log.root)
    for f, d in before.items():
        assert after[f] == d

    # mixed-layout read == full expected relation
    got = {
        (r["k"], r["part"], r["v"]) for r in log.read(spark).collect()
    }
    want = {(k, k % 4, k * 10) for k in range(240)}
    assert got == want
    # pinned pre-evolution read unchanged
    assert log.read(spark, version=v0).count() == 200

    # COW delete across the layout mix rewrites both kinds of file
    log.delete_where(spark, "k % 10 = 7")
    got = {r["k"] for r in log.read(spark).collect()}
    assert got == {k for k in range(240) if k % 10 != 7}

    # compaction migrates everything to the CURRENT layout...
    log.compact(spark, target_rows_per_file=1000)
    _, files_cmp = log.snapshot()
    assert files_cmp and all("part=" in f for f in files_cmp)
    # ...and, being a pure rewrite, diffs to an EMPTY change feed
    assert log.changes(spark, log.latest_version() - 1).count() == 0
    got = {r["k"] for r in log.read(spark).collect()}
    assert got == {k for k in range(240) if k % 10 != 7}


def test_partition_evolution_changes_keys_on_live_table(spark, tmp_path):
    """Changing partition KEYS (not just flat→hive) on a live table:
    files staged under ['part'] and files staged under ['region']
    coexist in one manifest and read back as one relation; merge
    rewrites spanning the mix stay correct; rollback across the
    evolution restores the old layout for subsequent writes."""
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") % 2).cast("int").alias("region"),
        (F.col("id") * 7).alias("v"),
    )
    path = tmp_path / "t_evolve_keys"
    df.repartition(2, "k").write.partitionBy("part").parquet(str(path))
    log = TableLog(str(path))
    log.init()
    assert log.layout_of() == ["part"]
    v0 = log.latest_version()

    log.set_partitioning(spark, ["region"])
    extra = spark.range(120, 160).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("part"),
        (F.col("id") % 2).cast("int").alias("region"),
        (F.col("id") * 7).alias("v"),
    )
    log.append(spark, extra)
    _, files = log.snapshot()
    assert any(f.startswith("part=") for f in files)
    assert any(f.startswith("region=") for f in files)

    got = {
        (r["k"], r["part"], r["region"], r["v"])
        for r in log.read(spark).collect()
    }
    assert got == {(k, k % 4, k % 2, k * 7) for k in range(160)}

    # a merge whose keys live in BOTH layouts rewrites across the mix
    upd = spark.createDataFrame(
        [(3, 3 % 4, 3 % 2, -1), (130, 130 % 4, 130 % 2, -1)],
        "k long, part int, region int, v long",
    )
    log.merge_upsert(spark, upd, ["k"])
    vals = {r["k"]: r["v"] for r in log.read(spark).collect()}
    assert vals[3] == -1 and vals[130] == -1 and len(vals) == 160

    # rollback across the evolution restores layout ['part']
    log.rollback(v0)
    assert log.layout_of() == ["part"]
    assert log.read(spark).count() == 120
    # ...so the next append stages back into part= dirs
    log.append(spark, extra)
    _, files = log.snapshot()
    fresh = [f for f in files if "-app-" in f]
    assert fresh and all(f.startswith("part=") for f in fresh)


def test_set_partitioning_rejects_unknown_column(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    with pytest.raises(ValueError, match="not in table columns"):
        log.set_partitioning(spark, ["nope"])


def test_read_pruned_skips_files_by_zone_maps(spark, tmp_path):
    """File-level data skipping: on a range-clustered committed table a
    range predicate reads only the files whose footer [min,max]
    intersects it — result identical to the full scan + filter, with
    most files never opened; hive-partitioned files prune on their
    path-encoded value; the footer cache is populated once."""
    from cve_manager_spark.commitlog import read_pruned

    path = tmp_path / "t_zonemap"
    (
        spark.range(0, 10_000)
        .selectExpr("id AS k", "id * 3 AS v")
        .orderBy("k")
        .repartitionByRange(10, "k")
        .sortWithinPartitions("k")
        .write.parquet(str(path))
    )
    log = TableLog(str(path))
    log.init()

    df, rep = read_pruned(log, spark, "k", lo=2_000, hi=2_999)
    assert rep["files_pruned"] > 0
    assert rep["files_read"] < rep["files_total"]
    want = sorted(
        tuple(r)
        for r in log.read(spark).where("k BETWEEN 2000 AND 2999").collect()
    )
    assert sorted(tuple(r) for r in df.collect()) == want
    assert (log.root / "_commits" / "_filestats.json").exists()

    # second call rides the cache (no new entries needed) and agrees
    df2, rep2 = read_pruned(log, spark, "k", lo=2_000, hi=2_999)
    assert rep2 == rep
    assert sorted(tuple(r) for r in df2.collect()) == want

    # open upper bound
    df3, rep3 = read_pruned(log, spark, "k", lo=9_500)
    assert rep3["files_pruned"] > 0
    assert df3.count() == 500

    # hive-partitioned table: pruning from path-encoded values alone
    hpath = tmp_path / "t_zonemap_hive"
    (
        spark.range(0, 1_000)
        .selectExpr("id AS k", "CAST(id % 4 AS INT) AS part", "id AS v")
        .write.partitionBy("part")
        .parquet(str(hpath))
    )
    hlog = TableLog(str(hpath))
    hlog.init()
    hdf, hrep = read_pruned(hlog, spark, "part", lo=2, hi=2)
    assert hrep["files_pruned"] > 0
    assert hdf.count() == 250
    assert {r["part"] for r in hdf.collect()} == {2}


def test_zone_maps_recorded_at_commit_time_zero_footer_reads(
    spark, tmp_path, monkeypatch
):
    """r13: stats are recorded AT COMMIT TIME by the writing job
    (``_stage``), so a predicate read over committed data consults the
    sidecar with ZERO post-hoc footer reads — the r12 gap was a
    driver-serial O(table-files) footer sweep on the first
    read_pruned. Sequence: backfill the init-adopted seed once, commit
    appends, then poison the footer reader — the read must succeed and
    still prune the out-of-range committed files."""
    from cve_manager_spark import commitlog as cl
    from cve_manager_spark.commitlog import read_pruned

    path = tmp_path / "t_writestats"
    (
        spark.range(0, 100)
        .selectExpr("id AS k", "id AS v")
        .coalesce(1)
        .write.parquet(str(path))
    )
    log = TableLog(str(path))
    log.init()
    # backfill the single init-adopted file (pre-existing data is the
    # only footer-path client left)
    read_pruned(log, spark, "k", lo=0, hi=0)

    for base in (10_000, 20_000, 30_000):
        rows = spark.range(base, base + 100).selectExpr(
            "id AS k", "id AS v"
        ).coalesce(1)
        log.append(spark, rows)

    def boom(path, columns):
        raise AssertionError(
            "footer read after commit-time stats were recorded"
        )

    monkeypatch.setattr(cl, "_footer_minmax", boom)
    df, rep = read_pruned(log, spark, "k", lo=20_000, hi=20_099)
    assert rep["files_total"] == 4
    assert rep["files_read"] == 1  # only the matching appended file
    assert rep["files_pruned"] == 3
    assert df.count() == 100


def test_zone_map_date_pruning_survives_process_restart(spark, tmp_path):
    """r13 (ADVICE low): the r12 cache serialized stats with
    ``default=str``, so date/timestamp/decimal min-max reloaded as
    strings, every typed comparison hit TypeError, and pruning
    silently degraded to a full scan on the table's second process.
    Stats now round-trip through tagged typed encoding: EVERY consult
    goes through the JSON round trip (even the first), a fresh
    ``_ZoneMaps`` decodes real ``datetime.date`` objects, and pruning
    holds across repeated (restart-equivalent) consults."""
    import datetime

    from cve_manager_spark.commitlog import _ZoneMaps, read_pruned

    path = tmp_path / "t_datestats"
    (
        spark.range(0, 10)
        .selectExpr(
            "id AS k", "DATE'2024-01-15' AS d", "id AS v"
        )
        .coalesce(1)
        .write.parquet(str(path))
    )
    log = TableLog(str(path))
    log.init()
    for month in (2, 3, 4):
        rows = spark.range(0, 10).selectExpr(
            "id + 100 AS k",
            f"DATE'2024-{month:02d}-15' AS d",
            "id AS v",
        ).coalesce(1)
        log.append(spark, rows)

    lo, hi = datetime.date(2024, 3, 1), datetime.date(2024, 3, 31)
    df, rep = read_pruned(log, spark, "d", lo=lo, hi=hi)
    assert rep["files_pruned"] == 3  # jan seed, feb, apr all skipped
    assert rep["files_read"] == 1
    assert df.count() == 10

    # restart-equivalent: a FRESH _ZoneMaps loads the JSON cache from
    # disk; values must decode to comparable date objects, and the
    # warm-cache consult must prune exactly as the first did
    _, files = log.snapshot()
    data_files = [f for f in files]
    stats = _ZoneMaps(log).stats_for(data_files, ["d"])
    mins = {s["d"]["min"] for s in stats.values() if s.get("d")}
    assert all(isinstance(m, datetime.date) for m in mins)
    df2, rep2 = read_pruned(log, spark, "d", lo=lo, hi=hi)
    assert rep2 == rep
    assert df2.count() == 10


def test_read_where_auto_consults_zone_maps(spark, tmp_path):
    """r13: ``TableLog.read(where={col: (lo, hi)})`` prunes
    automatically — the caller no longer needs the explicit
    ``read_pruned`` API to benefit from committed stats. The scan's
    input files shrink to the overlapping subset, and the bounds are
    still applied as a real filter (stat-less files kept, rows
    outside the bounds dropped)."""
    path = tmp_path / "t_readwhere"
    (
        spark.range(0, 100)
        .selectExpr("id AS k", "id AS v")
        .coalesce(1)
        .write.parquet(str(path))
    )
    log = TableLog(str(path))
    log.init()
    for base in (10_000, 20_000):
        rows = spark.range(base, base + 100).selectExpr(
            "id AS k", "id % 100 AS v"
        ).coalesce(1)
        log.append(spark, rows)

    full = log.read(spark)
    assert len(full.inputFiles()) == 3
    pruned = log.read(spark, where={"k": (10_000, 10_050)})
    assert len(pruned.inputFiles()) == 1
    want = sorted(
        tuple(r)
        for r in full.where("k BETWEEN 10000 AND 10050").collect()
    )
    assert sorted(tuple(r) for r in pruned.collect()) == want
    # open bound + a second column predicate compose
    both = log.read(spark, where={"k": (20_000, None), "v": (0, 10)})
    assert both.count() == 11
    assert len(both.inputFiles()) == 1


def test_read_pruned_all_files_pruned_keeps_table_shape(spark, tmp_path):
    """A predicate outside every file's range on a schemaless (v0,
    init-adopted) manifest: the scan falls back to ONE file so the
    empty result still carries the table's columns — never an error,
    never a full scan."""
    from cve_manager_spark.commitlog import read_pruned

    path = tmp_path / "t_zm_empty"
    (
        spark.range(0, 1000)
        .selectExpr("id AS k", "id AS v")
        .repartitionByRange(5, "k")
        .sortWithinPartitions("k")
        .write.parquet(str(path))
    )
    log = TableLog(str(path))
    log.init()
    df, rep = read_pruned(log, spark, "k", lo=10_000)
    assert rep["files_read"] == 1
    assert df.count() == 0
    assert set(df.columns) == {"k", "v"}


def test_changes_where_prunes_files_and_bounds_the_feed(spark, tmp_path):
    """VERDICT r13 next-round #3: ``changes(where=...)`` is the change
    feed OF THE BOUNDED SUBSET, and the bound prunes entering/leaving
    files through the commit-time zone maps — the bounded feed's scan
    must open strictly fewer files than the full feed's."""
    d = tmp_path / "cdfw"
    (
        spark.range(0, 1000)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(10, "k")
        .sortWithinPartitions("k")
        .write.parquet(str(d))
    )
    log = TableLog(str(d))
    log.init()
    log.append(
        spark,
        spark.range(2000, 2100)
        .selectExpr("id AS k", "CAST(0 AS BIGINT) AS v")
        .coalesce(1),
    )
    log.append(
        spark,
        spark.range(3000, 3100)
        .selectExpr("id AS k", "CAST(1 AS BIGINT) AS v")
        .coalesce(1),
    )
    log.delete_where(spark, "k < 100")

    full = log.changes(spark, 0, 3, key_cols=["k"])
    bounded = log.changes(
        spark, 0, 3, key_cols=["k"], where={"k": (3000, None)}
    )
    assert 0 < len(bounded.inputFiles()) < len(full.inputFiles())
    got = sorted(tuple(r) for r in bounded.collect())
    assert got == sorted(
        (k, 1, "insert", 1) for k in range(3000, 3100)
    )
    # identical to filtering the full feed when no update crosses the
    # bound; the multiset mode prunes too
    want = sorted(tuple(r) for r in full.where("k >= 3000").collect())
    assert got == want
    mid = log.changes(spark, 0, 3, where={"k": (2000, 2999)})
    assert mid.count() == 100
    assert len(mid.inputFiles()) < len(full.inputFiles())
    # an empty band is an empty feed, not an error
    assert log.changes(spark, 0, 3, where={"k": (10**9, None)}).count() == 0


def test_changes_where_update_crossing_the_bound(spark, tmp_path):
    """An update that MOVES a row across the bound surfaces as an
    insert (moved in) or delete (moved out) of the bounded subset —
    the subset behaves exactly like its own table."""
    d = tmp_path / "cdfx"
    spark.createDataFrame(
        [(1, 10), (2, 500), (3, 600)], "k int, v int"
    ).coalesce(1).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    # v1: k=1 moves INTO [100,∞), k=3 moves OUT, k=2 updates in-band
    log.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, 400), (2, 501), (3, 50)], "k int, v int"
        ),
        ["k"],
    )
    ch = log.changes(spark, 0, 1, key_cols=["k"], where={"v": (100, None)})
    got = sorted(tuple(r) for r in ch.collect())
    assert got == [
        (1, 400, "insert", 1),
        (2, 500, "update_preimage", 1),
        (2, 501, "update_postimage", 1),
        (3, 600, "delete", 1),
    ]


def test_maintenance_cli_cdf_where_bounds(spark, tmp_path, capsys):
    """CLI face of the bounded feed: --where-col/--lo/--hi flow into
    changes(where=) and the JSON report counts only in-band changes."""
    import json as _json

    from cve_manager_spark import maintenance_cli

    d = tmp_path / "clicdf"
    spark.range(0, 100).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    log.append(
        spark,
        spark.range(500, 520).selectExpr("id AS k", "id AS v").coalesce(1),
    )
    assert maintenance_cli.main(
        ["cdf", "--path", str(d), "--from", "0", "--to", "1",
         "--where-col", "k", "--lo", "500"]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["changes_by_type"] == {"insert": 20}


def test_consume_changes_where_bounded_subscriber(spark, tmp_path):
    """A cursor-tailing subscriber can bound its slice: where= flows
    into changes(), two subscribers tail different slices of the same
    log with independent cursors, and acks stay subset-independent."""
    d = tmp_path / "ccw"
    spark.range(0, 10).selectExpr("id AS k", "id AS v").coalesce(
        1
    ).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    c_lo = str(tmp_path / "cur_lo.json")
    c_hi = str(tmp_path / "cur_hi.json")
    assert log.consume_changes(spark, c_lo, start_version=0,
                               where={"k": (None, 99)}) is None
    assert log.consume_changes(spark, c_hi, start_version=0,
                               where={"k": (100, None)}) is None
    log.append(
        spark,
        spark.range(50, 53).selectExpr("id AS k", "id AS v").coalesce(1),
    )
    log.append(
        spark,
        spark.range(150, 154).selectExpr("id AS k", "id AS v").coalesce(1),
    )
    ch, ack = log.consume_changes(spark, c_lo, where={"k": (None, 99)})
    assert sorted(r["k"] for r in ch.collect()) == [50, 51, 52]
    assert ack() == log.latest_version()
    ch2, ack2 = log.consume_changes(spark, c_hi, where={"k": (100, None)})
    assert sorted(r["k"] for r in ch2.collect()) == [150, 151, 152, 153]
    ack2()
    assert log.consume_changes(spark, c_lo, where={"k": (None, 99)}) is None


def test_bloom_sidecars_prune_equality_lookups(spark, tmp_path):
    """Point-lookup data skipping: commit-time bloom sidecars prune
    files an equality bound provably misses — on a digest column
    where zone maps prune nothing — while pre-enablement files (no
    sidecar) are always kept, range bounds ignore blooms, and a probe
    for ANY present value never prunes its file (no false negatives,
    exhaustively checked)."""
    import hashlib

    from cve_manager_spark.commitlog import read_pruned

    d = tmp_path / "bloom"
    base = spark.range(0, 400).selectExpr(
        "id AS k", "md5(CAST(id AS STRING)) AS digest"
    )
    base.coalesce(1).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    log.enable_bloom("digest", bits=16384, k=5)
    for lo in (400, 600, 800):
        log.append(
            spark,
            spark.range(lo, lo + 200).selectExpr(
                "id AS k", "md5(CAST(id AS STRING)) AS digest"
            ).coalesce(2),
        )
    n_files = len(log.snapshot()[1])
    assert n_files == 7  # 1 pre-enable + 3 appends x 2

    # present value in one bloomed file: that file + the sidecar-less
    # base file are read, everything else pruned
    t = hashlib.md5(b"650").hexdigest()
    df, rep = read_pruned(log, spark, "digest", lo=t, hi=t)
    assert rep["files_pruned"] >= 4
    assert [r["k"] for r in df.collect()] == [650]

    # absent value: every bloomed file pruned, base kept (never drop
    # without proof), result empty through the real filter
    miss = hashlib.md5(b"absent").hexdigest()
    df2, rep2 = read_pruned(log, spark, "digest", lo=miss, hi=miss)
    assert rep2["files_read"] == 1 and df2.count() == 0

    # range bounds never consult blooms (membership can't serve a
    # range): the pruned read equals the full-scan filter exactly
    df3, rep3 = read_pruned(log, spark, "digest", lo="0", hi="2")
    want3 = log.read(spark).where(
        "digest >= '0' AND digest <= '2'"
    ).count()
    assert df3.count() == want3 > 0

    # NO FALSE NEGATIVES: every present value's file survives its probe
    rows = log.read(spark).select("k", "digest").collect()
    for r in rows:
        dfp, _ = read_pruned(log, spark, "digest", lo=r["digest"],
                             hi=r["digest"])
        assert r["k"] in [x["k"] for x in dfp.collect()], r

    # the bounded CDF path composes with blooms too (shared prune core)
    ch = log.changes(spark, 0, 3, where={"digest": (t, t)})
    assert len(ch.inputFiles()) <= 2
    assert [r["k"] for r in ch.collect()] == [650]


def test_bloom_ignores_unsafe_types_and_unconfigured_columns(
    spark, tmp_path
):
    """Blooms build only for string/integral columns (the types whose
    Spark string cast equals Python str() bit-exactly); doubles and
    unconfigured columns fall back to zone maps alone."""
    d = tmp_path / "bloom2"
    spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) / 7 AS x"
    ).coalesce(1).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    log.enable_bloom("x")  # double: silently no sidecars at write
    log.enable_bloom("k")
    log.append(
        spark,
        spark.range(100, 200).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) / 7 AS x"
        ).coalesce(1),
    )
    from cve_manager_spark.commitlog import _BloomIndex, read_pruned

    bl = _BloomIndex(log)
    _, files = log.snapshot()
    newest = [f for f in files if f.startswith("part-app-")]
    assert newest and all(
        not bl._sidecar(f, "x").exists() for f in newest
    )
    assert all(bl._sidecar(f, "k").exists() for f in newest)
    # an equality probe on the double column is correct via the filter
    df, _ = read_pruned(log, spark, "x", lo=150 / 7, hi=150 / 7)
    assert [r["k"] for r in df.collect()] == [150]


def test_row_count_metadata_only(spark, tmp_path):
    """Exact COUNT(*) from the write-time sidecar: matches the real
    count across appends, COW deletes, time travel, and init-adopted
    (backfilled) files — and never launches a scan (poisoned data
    files prove the counts come from metadata alone)."""
    d = tmp_path / "rc"
    spark.range(0, 500).selectExpr("id AS k").coalesce(2).write.parquet(
        str(d)
    )
    log = TableLog(str(d))
    log.init()
    assert log.row_count() == 500  # footer backfill for adopted files
    log.append(
        spark, spark.range(500, 650).selectExpr("id AS k").coalesce(1)
    )
    log.delete_where(spark, "k < 100")
    assert log.row_count() == 550
    assert log.row_count(version=0) == 500  # time travel counts too
    assert log.read(spark).count() == 550  # agrees with the real scan

    # metadata-only: truncate every data file — counts still answer
    for rel in log.snapshot()[1]:
        (d / rel).write_bytes(b"")
    assert log.row_count() == 550
    assert log.row_count(version=0) == 500


def test_zorder_multi_dimension_pruning_content_neutral(spark, tmp_path):
    """Z-order rewrite: content is multiset-identical (a committed COW
    compaction), and the write-time zone maps afterwards prune on
    EVERY curve dimension — including a 2-D box that opens a small
    fraction of the files — where the time-ordered original pruned
    only the insertion dimension."""
    from cve_manager_spark.commitlog import read_pruned

    d = tmp_path / "zo"
    df = spark.range(0, 20000).select(
        (F.col("id") % 199).alias("u"),
        ((F.col("id") * 7919) % 20000).alias("t"),
        F.col("id").alias("payload"),
    )
    df.coalesce(2).write.parquet(str(d))
    log = TableLog(str(d))
    log.init()
    before = sorted(tuple(r) for r in log.read(spark).collect())

    rep = log.zorder(spark, ["u", "t"], target_rows_per_file=2000)
    assert rep["n_rows"] == 20000 and rep["version"] == 1
    assert log.last_op() == "zorder"
    after = sorted(tuple(r) for r in log.read(spark).collect())
    assert after == before  # reclustering is content-neutral

    _, files = log.snapshot()
    _, ru = read_pruned(log, spark, "u", lo=10, hi=20)
    _, rt = read_pruned(log, spark, "t", lo=1000, hi=2500)
    assert ru["files_pruned"] > 0 and rt["files_pruned"] > 0
    box = log.read(spark, where={"u": (10, 20), "t": (1000, 2500)})
    assert 0 < len(box.inputFiles()) <= max(1, len(files) // 2)
    want = [r for r in before if 10 <= r[0] <= 20 and 1000 <= r[1] <= 2500]
    assert sorted(tuple(r) for r in box.collect()) == want

    # guard rails: non-numeric columns refuse; empty table is a no-op
    with pytest.raises(ValueError, match="no column"):
        TableLog(str(d)).zorder(spark, ["u", "missing"], 100)
    d2 = tmp_path / "zo_str"
    spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS s") \
        .coalesce(1).write.parquet(str(d2))
    slog = TableLog(str(d2))
    slog.init()
    with pytest.raises(ValueError, match="numeric"):
        slog.zorder(spark, ["s"], 100)


def test_clone_zero_copy_isolated_and_warm(spark, tmp_path):
    """Zero-copy clone: hard-linked snapshot, fully independent
    history (divergent writes on either side are invisible to the
    other), vacuum on one side never breaks the other (shared inodes
    survive until the last link drops), and the clone's zone
    maps/blooms are warm (pruning works with the SOURCE's sidecars
    copied, no footer re-reads needed)."""
    from cve_manager_spark.commitlog import read_pruned

    d = tmp_path / "src"
    (
        spark.range(0, 1000)
        .selectExpr("id AS k", "md5(CAST(id AS STRING)) AS digest")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.parquet(str(d))
    )
    log = TableLog(str(d))
    log.init()
    log.enable_bloom("digest", bits=16384)
    log.append(
        spark,
        spark.range(1000, 1200).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS digest"
        ).coalesce(1),
    )
    v1 = log.latest_version()

    clone = log.clone(str(tmp_path / "dev"), version=v1)
    assert clone.latest_version() == 0
    assert (clone.last_op() or "").startswith("clone@from-v1")
    want = sorted(tuple(r) for r in log.read(spark).collect())
    assert sorted(tuple(r) for r in clone.read(spark).collect()) == want

    # divergence is isolated both ways
    clone.delete_where(spark, "k < 500")
    log.append(
        spark, spark.range(2000, 2100).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS digest"
        ).coalesce(1),
    )
    assert clone.read(spark).count() == 700
    assert log.read(spark).count() == 1300

    # warm skipping on the clone: range prune via copied stats, point
    # prune via copied bloom sidecars
    import hashlib

    _, rep = read_pruned(clone, spark, "k", lo=600, hi=650)
    assert rep["files_pruned"] > 0
    t = hashlib.md5(b"1100").hexdigest()
    dfb, repb = read_pruned(clone, spark, "digest", lo=t, hi=t)
    assert repb["files_pruned"] > 0
    assert [r["k"] for r in dfb.collect()] == [1100]
    # ...and the clone keeps RECORDING blooms (config carried)
    clone.append(
        spark, spark.range(3000, 3050).selectExpr(
            "id AS k", "md5(CAST(id AS STRING)) AS digest"
        ).coalesce(1),
    )
    t3 = hashlib.md5(b"3025").hexdigest()
    df3, rep3 = read_pruned(clone, spark, "digest", lo=t3, hi=t3)
    assert [r["k"] for r in df3.collect()] == [3025]
    # pre-enablement base files (no sidecar) are rightly kept; the
    # other bloomed append is pruned
    assert rep3["files_pruned"] >= 1

    # vacuum the SOURCE aggressively: the clone's files survive (the
    # inode keeps the clone's link even when the source drops its own)
    log.vacuum(keep_versions=1, min_age_seconds=0)
    assert clone.read(spark).count() == 750
    # and vacuuming the clone leaves the source intact
    clone.vacuum(keep_versions=1, min_age_seconds=0)
    assert log.read(spark).count() == 1300

    # refuse to clone onto an existing table
    with pytest.raises(ValueError, match="already holds"):
        log.clone(str(tmp_path / "dev"))


def test_timestamp_time_travel_resolves_versions(spark, tmp_path):
    """AS OF TIMESTAMP: commit timestamps are recorded at publish and
    version_at does predecessor resolution — reads at midpoints see
    exactly the snapshot that was live then."""
    import time as _time

    log = _mk_table(spark, tmp_path)
    t0 = log.commit_ts_of(0)
    _time.sleep(0.05)
    log.delete_where(spark, F.col("k") < 50)  # v1
    t1 = log.commit_ts_of(1)
    _time.sleep(0.05)
    log.append(
        spark,
        spark.range(900, 910).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS part", "id * 10 AS v"
        ),
    )  # v2
    t2 = log.commit_ts_of(2)
    assert t0 < t1 < t2  # monotone by construction
    assert log.version_at((t0 + t1) / 2) == 0
    assert log.version_at((t1 + t2) / 2) == 1
    assert log.version_at(t2 + 100.0) == 2  # future -> head
    assert log.read(spark, timestamp=(t1 + t2) / 2).count() == 150
    assert log.read(spark, timestamp=t0).count() == 200
    with pytest.raises(ValueError, match="precedes the oldest"):
        log.version_at(t0 - 1.0)
    with pytest.raises(ValueError, match="not both"):
        log.read(spark, version=1, timestamp=t1)


def test_timestamp_travel_mtime_fallback_for_legacy_manifests(
    spark, tmp_path
):
    """A manifest written before timestamp recording (no ``ts`` key)
    resolves through the manifest file's mtime — the hard link is
    created at commit, so its mtime IS the commit time."""
    import json as _json

    log = _mk_table(spark, tmp_path)
    p = log.root / "_commits" / f"v{0:012d}.json"
    m = _json.loads(p.read_text())
    ts = m.pop("ts")
    p.write_text(_json.dumps(m))
    got = log.commit_ts_of(0)
    assert abs(got - ts) < 60.0  # mtime, same commit moment
    assert log.version_at(got) == 0


def test_check_constraints_enforced_at_commit(spark, tmp_path):
    """Delta-style CHECK constraints: validated on existing data when
    set (refused if violated), then enforced on every write's NEW rows
    — the whole commit refuses, nothing staged survives. SQL CHECK
    semantics: only FALSE violates; NULL passes."""
    import json as _json

    log = _mk_table(spark, tmp_path)
    # existing data violates -> refused, nothing committed
    with pytest.raises(ValueError, match="does not hold"):
        log.set_constraint(spark, "v_small", "v < 100")
    assert log.latest_version() == 0
    out = log.set_constraint(spark, "v_nonneg", "v >= 0")
    assert out["version"] == 1
    with pytest.raises(ValueError, match="already exists"):
        log.set_constraint(spark, "v_nonneg", "v >= 1")
    # violating append refused, no files staged
    bad = spark.createDataFrame(
        [(9000, 0, -5)], "k long, part int, v long"
    )
    n_files = len(list(log.root.rglob("*.parquet")))
    with pytest.raises(ValueError, match="violates CHECK"):
        log.append(spark, bad)
    assert len(list(log.root.rglob("*.parquet"))) == n_files
    assert log.latest_version() == 1
    # NULL passes (SQL CHECK three-valued logic)
    nul = spark.createDataFrame(
        [(9001, 0, None)], "k long, part int, v long"
    )
    log.append(spark, nul)
    assert log.read(spark).count() == 201
    # merge and MOR update enforce on their new images too
    with pytest.raises(ValueError, match="violates CHECK"):
        log.merge_upsert(
            spark,
            spark.createDataFrame([(0, 0, -1)], "k long, part int, v long"),
            ["k"],
        )
    with pytest.raises(ValueError, match="violates CHECK"):
        log.update_where_mor(spark, "k = 1", {"v": "-v - 1"})
    # the refused MOR update left no delete-file debris in the manifest
    with open(log.root / "_commits" / f"v{log.latest_version():012d}.json") as f:
        assert "dv" not in _json.load(f)
    # constraints are versioned: travel + rollback restore the old set
    assert log.constraints_of(0) == {}
    assert log.constraints_of() == {"v_nonneg": "v >= 0"}
    log.drop_constraint("v_nonneg")
    assert log.constraints_of() == {}
    log.append(spark, bad)  # now legal
    assert log.read(spark).count() == 202
    rb = log.rollback(1)
    assert log.constraints_of(rb["version"]) == {"v_nonneg": "v >= 0"}


def test_constraints_carry_through_clone(spark, tmp_path):
    log = _mk_table(spark, tmp_path)
    log.set_constraint(spark, "k_pos", "k >= 0")
    clone = log.clone(str(tmp_path / "ccons"))
    assert clone.constraints_of() == {"k_pos": "k >= 0"}
    with pytest.raises(ValueError, match="violates CHECK"):
        clone.append(spark, spark.createDataFrame(
            [(-1, 0, 0)], "k long, part int, v long"
        ))


def test_maintenance_cli_log_constraint(spark, tmp_path, capsys):
    import json as _json

    from cve_manager_spark import maintenance_cli

    log = _mk_table(spark, tmp_path)
    assert maintenance_cli.main(
        ["log-constraint", "--path", str(log.root),
         "--add", "v_big=v >= 0"]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["constraints"] == {"v_big": "v >= 0"}
    assert maintenance_cli.main(
        ["log-constraint", "--path", str(log.root)]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["constraints"] == {"v_big": "v >= 0"}
    assert maintenance_cli.main(
        ["log-constraint", "--path", str(log.root), "--drop", "v_big"]
    ) == 0
    capsys.readouterr()
    assert log.constraints_of() == {}


def test_blind_append_refuses_retry_past_constraint_change(
    spark, tmp_path
):
    """A blind append validated against the begin-pinned constraint
    set must NOT retry past an interleaved set-constraint — the rows
    could violate the new rule (Delta's MetadataChangedException
    case). Conflict instead; a re-run validates against the new set."""
    log = _mk_table(spark, tmp_path)
    rows = spark.createDataFrame(
        [(5000, 0, -1)], "k long, part int, v long"
    )
    # forge the race: another writer claims v1 with a constraint the
    # staged rows violate, exactly between this append's validation
    # and its publish attempt
    orig = log._publish
    fired = {"done": False}

    def racy(parent, files, op, **kw):
        if not fired["done"] and op == "append":
            fired["done"] = True
            TableLog(str(log.root)).set_constraint(
                spark, "v_pos", "v >= 0"
            )
        return orig(parent, files, op, **kw)

    log._publish = racy
    with pytest.raises(CommitConflict, match="constraints changed"):
        log.append(spark, rows, max_retries=3)
    log._publish = orig
    # nothing landed; the loser unlinked its staged files
    assert log.read(spark).where("v < 0").count() == 0
    assert log.latest_version() == 1
    # a compliant row appends fine through the same path
    log.append(spark, spark.createDataFrame(
        [(5001, 0, 1)], "k long, part int, v long"
    ))
    assert log.read(spark).count() == 201


def test_maintenance_cli_cdf_timestamp_bounds(spark, tmp_path, capsys):
    """CLI AS OF TIMESTAMP on the change feed: --from-ts resolves
    through version_at and the feed matches the version-addressed
    one."""
    import json as _json
    import time as _time

    from cve_manager_spark import maintenance_cli

    log = _mk_table(spark, tmp_path)
    t_mid = _time.time()
    _time.sleep(0.05)
    log.delete_where_mor(spark, F.col("k") < 40)
    assert maintenance_cli.main(
        ["cdf", "--path", str(log.root), "--from-ts", str(t_mid)]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["v_from"] == 0 and rep["changes_by_type"] == {"delete": 40}
    with pytest.raises(SystemExit, match="not both"):
        maintenance_cli.main(
            ["cdf", "--path", str(log.root), "--from", "0",
             "--from-ts", str(t_mid)]
        )


def test_to_view_exposes_snapshot_to_sql(spark, tmp_path):
    """spark.sql over a committed table through to_view: DV-applied,
    snapshot-pinned at creation (later commits invisible until
    re-registered), time-travel variants register too."""
    log = _mk_table(spark, tmp_path)
    log.delete_where_mor(spark, F.col("k") < 50)
    log.to_view(spark, "lake_t")
    got = spark.sql(
        "SELECT COUNT(*) AS n, MIN(k) AS mn FROM lake_t"
    ).first()
    assert (got["n"], got["mn"]) == (150, 50)
    # pinned: a later commit doesn't leak into the registered view
    log.delete_where_mor(spark, F.col("k") >= 150)
    assert spark.sql("SELECT COUNT(*) AS n FROM lake_t").first()["n"] == 150
    # time travel registers too
    log.to_view(spark, "lake_t0", version=0)
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM lake_t0"
    ).first()["n"] == 200
    spark.catalog.dropTempView("lake_t")
    spark.catalog.dropTempView("lake_t0")
