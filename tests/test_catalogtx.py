"""Multi-table transactions (catalogtx.py): the properties a catalog
log exists for, tested directly — atomic visibility of multi-table
commits, snapshot-consistent multi-table reads, first-committer-wins
for racing transactions with a clean retry, and deterministic crash
repair in both directions (roll-forward with an intent, roll-back
without one)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cve_manager_spark.catalogtx import CatalogConflict, CatalogLog
from cve_manager_spark.commitlog import CommitConflict, TableLog


def _mk_catalog(spark, tmp_path):
    facts = spark.range(0, 100).select(
        F.col("id").alias("f_id"),
        (F.col("id") % 10).alias("f_cust"),
        (F.col("id") * 2).alias("f_val"),
    )
    dim = spark.range(0, 10).select(
        F.col("id").alias("d_cust"),
        F.concat(F.lit("seg-"), F.col("id")).alias("d_seg"),
    )
    fpath, dpath = tmp_path / "cat_facts", tmp_path / "cat_dim"
    facts.coalesce(2).write.parquet(str(fpath))
    dim.coalesce(1).write.parquet(str(dpath))
    flog, dlog = TableLog(str(fpath)), TableLog(str(dpath))
    flog.init()
    dlog.init()
    cat = CatalogLog(str(tmp_path / "cat_log"))
    cat.init({"facts": flog, "dim": dlog})
    return cat, flog, dlog


def test_txn_moves_tables_atomically_and_snapshot_reads_hold(
    spark, tmp_path
):
    """A facts+dim pair committed in one transaction becomes visible
    all-at-once: mid-transaction (facts already table-committed),
    catalog readers still see BOTH tables at the old pins; after
    commit, both move; a read pinned at the old catalog version is
    untouched."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0, pins0 = cat.snapshot()
    before = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark).items()
    }

    txn = cat.begin()
    txn.table("facts").append(
        spark,
        spark.range(1000, 1010).select(
            F.col("id").alias("f_id"),
            (F.col("id") % 10).alias("f_cust"),
            F.lit(0).cast("bigint").alias("f_val"),
        ),
    )
    # facts table-committed, catalog NOT committed: catalog readers
    # still see the old facts (and the old dim)
    assert flog.latest_version() == pins0["facts"] + 1
    mid = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark).items()
    }
    assert mid == before

    txn.table("dim").merge_upsert(
        spark,
        spark.range(0, 10).select(
            F.col("id").alias("d_cust"), F.lit("moved").alias("d_seg")
        ),
        ["d_cust"],
    )
    v1 = cat.commit(txn)
    assert v1 == v0 + 1
    after = cat.read_all(spark)
    assert after["facts"].count() == 110
    assert after["dim"].where("d_seg = 'moved'").count() == 10
    # pinned multi-table read at the OLD catalog version: consistent
    old = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark, version=v0).items()
    }
    assert old == before
    # no intent debris after a clean commit
    assert not list(cat.root.glob("intent-*.json"))


def test_crash_between_table_publishes_leaves_readers_at_old_snapshot(
    spark, tmp_path
):
    """A transaction that died after committing ONE table (no intent
    written — the crash was mid-write): catalog readers never see the
    half-applied state, reconcile() rolls the table back to the pinned
    content and re-pins it, and the next transaction on that table
    proceeds (unwedged) and commits normally."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0, pins0 = cat.snapshot()
    want_facts = sorted(
        tuple(r) for r in cat.read(spark, "facts").collect()
    )

    dead = cat.begin()
    dead.table("facts").delete_where(spark, "f_id % 2 = 0")
    # crash here: no dim write, no commit(), no intent
    assert flog.latest_version() == pins0["facts"] + 1
    assert sorted(
        tuple(r) for r in cat.read(spark, "facts").collect()
    ) == want_facts  # reader at the old snapshot

    # at the default min-age the debris looks like a LIVE writer (its
    # start marker is seconds old) — reconcile must NOT roll it back
    guarded = cat.reconcile()
    assert guarded["rolled_back"] == []
    assert guarded["skipped_live"] == [
        {"table": "facts", "txns": [dead.txn_id]}
    ]
    rep = cat.reconcile(min_age_seconds=0)
    assert len(rep["rolled_back"]) == 1
    assert rep["rolled_back"][0]["table"] == "facts"
    assert rep["rolled_back"][0]["txns"] == [dead.txn_id]
    assert rep["rolled_forward"] == []
    # content restored, catalog re-pinned, reader unchanged
    assert sorted(
        tuple(r) for r in cat.read(spark, "facts").collect()
    ) == want_facts
    # idempotent: nothing left to repair, markers retired
    rep2 = cat.reconcile(min_age_seconds=0)
    assert rep2 == {
        "rolled_forward": [], "rolled_back": [], "cleared_intents": [],
        "superseded_intents": [], "unrepairable_intents": [],
        "skipped_live": [], "cleared_markers": [],
    }
    assert not list(cat.root.glob("start-*.json"))

    # unwedged: a fresh transaction on the same table commits fine
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id >= 90")
    cat.commit(txn)
    assert cat.read(spark, "facts").count() == 90


def test_crash_after_intent_rolls_forward(spark, tmp_path):
    """A transaction that died between writing its intent and
    publishing the catalog commit: every table commit it recorded
    exists, so reconcile() publishes the catalog commit it was about
    to write — the transaction COMPLETES rather than aborts."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0, pins0 = cat.snapshot()

    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 50")
    txn.table("dim").delete_where(spark, "d_cust < 5")
    # simulate commit() crashing right after the intent write
    intent = cat.root / f"intent-{txn.txn_id}.json"
    intent.write_text(json.dumps({
        "txn": txn.txn_id,
        "base_version": txn.base_version,
        "base_pins": txn.pins,
        "updates": txn.updates,
    }))
    assert cat.snapshot()[0] == v0  # nothing visible yet

    rep = cat.reconcile()
    assert rep["rolled_forward"] == [txn.txn_id]
    assert rep["rolled_back"] == []
    assert not intent.exists()
    after = cat.read_all(spark)
    assert after["facts"].count() == 50
    assert after["dim"].count() == 5

    # crash AFTER publish but before intent cleanup: reconcile just
    # clears the stale intent, no new catalog commit
    txn2 = cat.begin()
    txn2.table("dim").append(
        spark,
        spark.range(100, 103).select(
            F.col("id").alias("d_cust"), F.lit("late").alias("d_seg")
        ),
    )
    v_before = cat.commit(txn2)
    stale = cat.root / f"intent-{txn2.txn_id}.json"
    stale.write_text(json.dumps({
        "txn": txn2.txn_id,
        "base_version": txn2.base_version,
        "base_pins": txn2.pins,
        "updates": txn2.updates,
    }))
    rep3 = cat.reconcile()
    assert rep3["cleared_intents"] == [txn2.txn_id]
    assert cat.latest_version() == v_before
    assert not stale.exists()


def test_racing_committers_one_winner_clean_retry(spark, tmp_path):
    """Two transactions begun at the same catalog snapshot, both
    updating the SAME table: the first table commit wins; the loser
    gets CommitConflict before anything published (its staged files
    aborted by TableLog), and a clean re-begin sees the winner's state
    and commits on top."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)

    t1, t2 = cat.begin(), cat.begin()
    t1.table("dim").merge_upsert(
        spark,
        spark.range(0, 3).select(
            F.col("id").alias("d_cust"), F.lit("winner").alias("d_seg")
        ),
        ["d_cust"],
    )
    with pytest.raises(CommitConflict):
        t2.table("dim").merge_upsert(
            spark,
            spark.range(0, 3).select(
                F.col("id").alias("d_cust"), F.lit("loser").alias("d_seg")
            ),
            ["d_cust"],
        )
    cat.commit(t1)
    assert cat.read(spark, "dim").where("d_seg = 'winner'").count() == 3

    # clean retry: re-begin from the fresh snapshot
    t3 = cat.begin()
    t3.table("dim").merge_upsert(
        spark,
        spark.range(0, 3).select(
            F.col("id").alias("d_cust"), F.lit("retried").alias("d_seg")
        ),
        ["d_cust"],
    )
    cat.commit(t3)
    dim = cat.read(spark, "dim")
    assert dim.where("d_seg = 'retried'").count() == 3
    assert dim.where("d_seg = 'winner'").count() == 0


def test_disjoint_table_txns_rebase_and_both_commit(spark, tmp_path):
    """Transactions on DISJOINT tables race only on the catalog version
    number: the second commit rebases its pins onto the new head and
    publishes — both transactions' effects land."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    t1, t2 = cat.begin(), cat.begin()  # same base version
    t1.table("facts").delete_where(spark, "f_id >= 50")
    t2.table("dim").merge_upsert(
        spark,
        spark.range(0, 2).select(
            F.col("id").alias("d_cust"), F.lit("both").alias("d_seg")
        ),
        ["d_cust"],
    )
    v1 = cat.commit(t1)
    v2 = cat.commit(t2)  # rebases: t1 moved the catalog under it
    assert v2 == v1 + 1
    after = cat.read_all(spark)
    assert after["facts"].count() == 50
    assert after["dim"].where("d_seg = 'both'").count() == 2


def test_out_of_band_write_conflicts_then_sync_adopts(spark, tmp_path):
    """A direct (non-transactional) TableLog write is invisible to
    catalog readers, wedges the next transaction on that table at the
    table level, and sync_table() adopts it — after which transactions
    proceed."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    n0 = cat.read(spark, "dim").count()
    dlog.append(
        spark,
        spark.range(500, 505).select(
            F.col("id").alias("d_cust"), F.lit("oob").alias("d_seg")
        ),
    )
    assert cat.read(spark, "dim").count() == n0  # invisible

    txn = cat.begin()
    with pytest.raises(CommitConflict):
        txn.table("dim").append(
            spark,
            spark.range(600, 601).select(
                F.col("id").alias("d_cust"), F.lit("x").alias("d_seg")
            ),
        )
    cat.sync_table("dim")
    assert cat.read(spark, "dim").count() == n0 + 5

    txn2 = cat.begin()
    txn2.table("dim").append(
        spark,
        spark.range(600, 601).select(
            F.col("id").alias("d_cust"), F.lit("x").alias("d_seg")
        ),
    )
    cat.commit(txn2)
    assert cat.read(spark, "dim").count() == n0 + 6


def test_catalog_survives_whole_tree_move(spark, tmp_path):
    """Table paths are stored relative to the catalog's parent, so a
    catalog + its tables move/rename as one tree — the portability
    rule that lets scratch-built catalogs publish by atomic rename."""
    import shutil

    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id >= 50")
    cat.commit(txn)
    moved = tmp_path / "relocated"
    moved.mkdir()
    for p in ("cat_facts", "cat_dim", "cat_log"):
        shutil.move(str(tmp_path / p), str(moved / p))
    cat2 = CatalogLog(str(moved / "cat_log"))
    assert cat2.read(spark, "facts").count() == 50
    snap = cat2.read_all(spark)
    assert set(snap) == {"facts", "dim"}
    txn2 = cat2.begin()
    txn2.table("dim").delete_where(spark, "d_cust >= 5")
    cat2.commit(txn2)
    assert cat2.read(spark, "dim").count() == 5


def test_facts_dim_view_move_atomically(spark, tmp_path):
    """The motivating scenario for the catalog: a MATERIALIZED VIEW
    registered as a third table moves in the SAME transaction as the
    source writes it reflects — at every observable catalog version,
    view == facts ⋈ dim of that same version. Mid-transaction (facts
    and view table-committed, catalog not), readers still see the old
    CONSISTENT triple; a crashed source+view transaction is rolled
    back as a unit by reconcile()."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    join_cond = F.col("f_cust") == F.col("d_cust")

    def recompute(txn=None):
        src = txn if txn is not None else cat
        if txn is not None:
            f, d = txn.table("facts").read(spark), txn.table("dim").read(spark)
        else:
            snap = cat.read_all(spark)
            f, d = snap["facts"], snap["dim"]
        return f.join(d, join_cond)

    # register the view as a third catalog table (initial materialize)
    vpath = tmp_path / "cat_view"
    recompute().write.parquet(str(vpath))
    vlog = TableLog(str(vpath))
    vlog.init()
    cat2 = CatalogLog(str(tmp_path / "cat_log2"))
    cat2.init({"facts": flog, "dim": dlog, "view": vlog})

    def consistent(version=None):
        snap = cat2.read_all(spark, version=version)
        want = sorted(
            tuple(r)
            for r in snap["facts"].join(snap["dim"], join_cond).collect()
        )
        got = sorted(tuple(r) for r in snap["view"].collect())
        assert got == want

    consistent()
    v0 = cat2.latest_version()

    # one transaction: purge facts, rewrite dim, re-materialize view
    txn = cat2.begin()
    txn.table("facts").delete_where(spark, "f_id % 3 = 0")
    txn.table("dim").merge_upsert(
        spark,
        txn.table("dim").read(spark)
        .where("d_cust < 3")
        .withColumn("d_seg", F.lit("moved")),
        ["d_cust"],
    )
    fresh = txn.table("facts").read(spark).join(
        txn.table("dim").read(spark), join_cond
    )
    # MID-TXN: facts+dim table-committed, view about to be — catalog
    # readers still see the OLD consistent triple
    consistent()
    txn.table("view").overwrite(spark, fresh)
    consistent()  # still the old triple: catalog not committed
    cat2.commit(txn)
    consistent()  # the new triple, atomically
    assert cat2.read(spark, "view").where("d_seg = 'moved'").count() > 0
    consistent(version=v0)  # time travel: the old triple stays intact

    # crashed source+view transaction: rolled back AS A UNIT
    dead = cat2.begin()
    dead.table("facts").delete_where(spark, "f_id % 2 = 0")
    dead.table("view").overwrite(
        spark,
        dead.table("facts").read(spark).join(
            dead.table("dim").read(spark), join_cond
        ),
    )
    consistent()  # nothing leaked
    rep = cat2.reconcile(min_age_seconds=0)
    assert {r["table"] for r in rep["rolled_back"]} == {"facts", "view"}
    consistent()
    # and the next transaction proceeds cleanly on both tables
    txn3 = cat2.begin()
    txn3.table("facts").delete_where(spark, "f_id >= 90")
    txn3.table("view").overwrite(
        spark,
        txn3.table("facts").read(spark).join(
            txn3.table("dim").read(spark), join_cond
        ),
    )
    cat2.commit(txn3)
    consistent()


def test_catalog_vacuum_preserves_surviving_snapshot_pins(spark, tmp_path):
    """Catalog-aware retention: dropping old catalog versions vacuums
    each table down to the MINIMUM pin the surviving catalog snapshots
    still reference — every readable snapshot keeps every table
    version it pins (full multi-table reads still collect), dropped
    snapshots fail loudly, and the table versions BELOW the floor are
    actually reclaimed (a direct TableLog.vacuum keyed on the table's
    own head could not make that guarantee for pinned history)."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)

    for i in range(3):
        txn = cat.begin()
        txn.table("facts").delete_where(spark, f"f_id % 17 = {i}")
        txn.table("dim").merge_upsert(
            spark,
            spark.range(0, 2).select(
                F.col("id").alias("d_cust"),
                F.lit(f"gen{i}").alias("d_seg"),
            ),
            ["d_cust"],
        )
        cat.commit(txn)
    vs = cat.versions()
    assert len(vs) == 4  # init + 3 txns
    want = {
        v: {
            n: sorted(tuple(r) for r in df.collect())
            for n, df in cat.read_all(spark, version=v).items()
        }
        for v in vs[-2:]
    }
    f_floor = cat.snapshot(vs[-2])[1]["facts"]

    rep = cat.vacuum(keep_versions=2, min_age_seconds=0)
    assert rep["dropped_catalog_manifests"] == 2
    assert cat.versions() == vs[-2:]
    # surviving snapshots read back in full, bit-identical
    for v in vs[-2:]:
        got = {
            n: sorted(tuple(r) for r in df.collect())
            for n, df in cat.read_all(spark, version=v).items()
        }
        assert got == want[v]
    # dropped snapshot: loud failure
    with pytest.raises(ValueError):
        cat.read_all(spark, version=vs[0])
    # pre-floor table history actually reclaimed
    assert min(flog.versions()) == f_floor
    assert rep["tables"]["facts"]["dropped_manifests"] >= 1


def test_catalog_tags_name_snapshots_and_survive_vacuum(spark, tmp_path):
    """Tags: immutable named multi-table snapshots. A tagged release
    reads back bit-identical across later transactions AND across a
    vacuum that drops every untagged contemporary (the tag joins the
    keep set and its pins join the table-vacuum floors); creating an
    existing tag raises; delete + retag moves it."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)

    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id % 5 = 0")
    cat.commit(txn)
    cat.tag("release-1")
    want = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark, tag="release-1").items()
    }

    for i in (1, 2):
        t = cat.begin()
        t.table("facts").delete_where(spark, f"f_id % 5 = {i}")
        cat.commit(t)
    with pytest.raises(ValueError, match="immutable"):
        cat.tag("release-1")

    rep = cat.vacuum(keep_versions=1, min_age_seconds=0)
    assert rep["dropped_catalog_manifests"] >= 1
    got = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark, tag="release-1").items()
    }
    assert got == want  # the tagged release survives, bit-identical
    assert cat.tags() == {"release-1": 1}

    cat.delete_tag("release-1")
    v = cat.tag("release-1")  # retag at head
    assert v == cat.latest_version()
    with pytest.raises(ValueError, match="not found"):
        cat.read_all(spark, tag="nope")


def test_catalog_conflict_on_out_of_band_repin(spark, tmp_path):
    """commit() raises CatalogConflict when a pin for an updated table
    moved out-of-band between begin() and commit() — and reconcile()
    sweeps the conflicting transaction's table debris."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id = 0")
    # out-of-band: someone re-pins facts (sync to the txn's own table
    # commit is indistinguishable from any other repin at commit time)
    cat.sync_table("facts")
    with pytest.raises(CatalogConflict):
        cat.commit(txn)


def test_vacuum_refuses_while_intents_exist(spark, tmp_path):
    """catalog vacuum while an intent file exists could drop the
    catalog manifest that proves the intent's transaction committed,
    after which reconcile() can no longer classify it — so vacuum
    REFUSES loudly and points at reconcile()."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 10")
    cat.commit(txn)
    # forge the crash-after-publish state: intent survived the commit
    stale = cat.root / f"intent-{txn.txn_id}.json"
    stale.write_text(json.dumps({
        "txn": txn.txn_id, "base_version": txn.base_version,
        "base_pins": txn.pins, "updates": txn.updates,
    }))
    with pytest.raises(ValueError, match="reconcile"):
        cat.vacuum(keep_versions=1, min_age_seconds=0)
    # reconcile clears it (the txn's catalog commit exists), then
    # vacuum proceeds
    rep = cat.reconcile(min_age_seconds=0)
    assert rep["cleared_intents"] == [txn.txn_id]
    cat.vacuum(keep_versions=1, min_age_seconds=0)
    assert cat.read(spark, "facts").count() == 90


def test_stale_intent_outliving_vacuumed_catalog_commit(spark, tmp_path):
    """The r13 wedge, closed: a crash after publish leaves an intent
    whose txn HAS a catalog commit; if that manifest is later deleted
    (a pre-guard vacuum, or external cleanup), reconcile() can no
    longer prove the commit — but the head pins are at-or-past the
    intent's update versions, so it is discharged as SUPERSEDED
    instead of raising CatalogConflict out of the repair loop, and
    OTHER debris in the same call is still processed."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 10")
    v1 = cat.commit(txn)
    stale = cat.root / f"intent-{txn.txn_id}.json"
    stale.write_text(json.dumps({
        "txn": txn.txn_id, "base_version": txn.base_version,
        "base_pins": txn.pins, "updates": txn.updates,
    }))
    # another commit moves the head past v1, then v1's manifest is
    # destroyed — exactly what a count-window vacuum used to do
    txn2 = cat.begin()
    txn2.table("dim").delete_where(spark, "d_cust = 9")
    cat.commit(txn2)
    (cat.root / f"cat-v{v1:012d}.json").unlink()
    # plus an unrelated dead transaction's table debris
    dead = cat.begin()
    dead.table("dim").delete_where(spark, "d_cust < 5")
    want_dim = sorted(tuple(r) for r in cat.read(spark, "dim").collect())

    rep = cat.reconcile(min_age_seconds=0)
    assert rep["superseded_intents"] == [txn.txn_id]
    assert not stale.exists()
    assert len(rep["rolled_back"]) == 1  # the dead txn, same call
    assert rep["rolled_back"][0]["table"] == "dim"
    assert sorted(
        tuple(r) for r in cat.read(spark, "dim").collect()
    ) == want_dim
    # terminating + idempotent: a second call finds nothing
    rep2 = cat.reconcile(min_age_seconds=0)
    assert rep2["superseded_intents"] == []
    assert rep2["rolled_back"] == []
    assert rep2["unrepairable_intents"] == []


def test_unreplayable_intent_degrades_instead_of_wedging(spark, tmp_path):
    """An intent whose base pins no longer match and whose updates are
    NOT at head (an unreplayable forgery / corrupted repair state):
    reconcile() must not raise out of the loop — it clears the intent,
    reports it unrepairable, and stays idempotent."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    bogus = cat.root / "intent-deadbeefdeadbeef.json"
    bogus.write_text(json.dumps({
        "txn": "deadbeefdeadbeef", "base_version": 0,
        "base_pins": {"facts": 5, "dim": 0},
        "updates": {"facts": 7},
    }))
    rep = cat.reconcile(min_age_seconds=0)
    assert [r["txn"] for r in rep["unrepairable_intents"]] == [
        "deadbeefdeadbeef"
    ]
    assert not bogus.exists()
    rep2 = cat.reconcile(min_age_seconds=0)
    assert rep2["unrepairable_intents"] == []
    # the catalog still works
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id = 0")
    cat.commit(txn)
    assert cat.read(spark, "facts").count() == 99


def test_reconcile_never_rolls_back_live_txn_and_commit_succeeds(
    spark, tmp_path
):
    """The maintenance-cadence race from r13 ADVICE: reconcile()
    running while a transaction is mid-flight must not roll back its
    committed table versions — begin()'s start marker plus the
    min-age guard protect it, and its commit() then succeeds."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id % 2 = 0")
    rep = cat.reconcile()  # default min-age: the txn looks live
    assert rep["rolled_back"] == []
    assert rep["skipped_live"] == [{"table": "facts", "txns": [txn.txn_id]}]
    v = cat.commit(txn)  # the live writer is unharmed
    assert v == 1
    assert cat.read(spark, "facts").count() == 50
    assert not list(cat.root.glob("start-*.json"))


def test_catalog_vacuum_floor_is_a_version_not_a_count(spark, tmp_path):
    """r13 ADVICE (medium): the per-table retention floor must reach
    TableLog.vacuum as a VERSION NUMBER — a count window shifts when a
    commit lands between the floor computation and the table vacuum,
    dropping the floor-pinned manifest. Direct unit on the new
    TableLog.vacuum(keep_from_version=...) contract: extra commits
    landing after the floor was computed cannot evict it."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 10")
    cat.commit(txn)
    floor = cat.snapshot()[1]["facts"]  # the pin a snapshot still needs
    # a commit lands AFTER the floor computation (the race window)
    flog.append(
        spark,
        spark.range(500, 510).select(
            F.col("id").alias("f_id"), (F.col("id") % 10).alias("f_cust"),
            F.lit(0).cast("bigint").alias("f_val"),
        ),
    )
    rep = flog.vacuum(
        keep_versions=1, keep_from_version=floor, min_age_seconds=0
    )
    assert floor in flog.versions()  # the pinned manifest survived
    assert flog.latest_version() in flog.versions()
    # and the catalog-pinned content is still bit-readable
    assert cat.read(spark, "facts").count() == 90


def test_add_table_participates_in_next_transaction(spark, tmp_path):
    """VERDICT r13 'What's missing #1': the table set is a catalog
    COMMIT, not schema frozen at init. An added table (a) is invisible
    to snapshots before its add_table version, (b) participates in the
    very next transaction atomically, and (c) a crash between
    TableLog.init and the catalog commit leaves the catalog clean —
    re-running add_table finishes the registration."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0 = cat.latest_version()
    notes = spark.range(0, 20).select(
        F.col("id").alias("n_id"), (F.col("id") % 4).alias("n_kind")
    )
    npath = tmp_path / "cat_notes"
    notes.coalesce(1).write.parquet(str(npath))
    nlog = TableLog(str(npath))
    nlog.init()
    # crash between TableLog.init and add_table: catalog is clean
    assert "notes" not in cat.snapshot()[1]
    v1 = cat.add_table("notes", nlog)
    assert v1 == v0 + 1
    assert cat.snapshot()[1]["notes"] == 0
    # the pre-add snapshot excludes it; the post-add one includes it
    assert "notes" not in cat.read_all(spark, version=v0)
    assert cat.read(spark, "notes").count() == 20
    with pytest.raises(ValueError, match="already registered"):
        cat.add_table("notes", nlog)

    # the added table moves atomically with an old table in one txn
    txn = cat.begin()
    txn.table("notes").delete_where(spark, "n_kind = 0")
    txn.table("facts").delete_where(spark, "f_id < 10")
    mid = cat.read_all(spark)  # not committed: both at old pins
    assert mid["notes"].count() == 20 and mid["facts"].count() == 100
    cat.commit(txn)
    after = cat.read_all(spark)
    assert after["notes"].count() == 15 and after["facts"].count() == 90


def test_drop_table_stays_readable_through_tag_and_vacuum(
    spark, tmp_path
):
    """A dropped table disappears from head reads and new transactions
    but stays readable through any older catalog version or tag — and
    catalog vacuum keeps the table versions those surviving snapshots
    pin, dropped or not."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    want_dim = sorted(tuple(r) for r in cat.read(spark, "dim").collect())
    cat.tag("with-dim")
    # move dim past the tag, then drop it
    txn = cat.begin()
    txn.table("dim").delete_where(spark, "d_cust >= 5")
    cat.commit(txn)
    vdrop = cat.drop_table("dim")
    assert "dim" not in cat.snapshot()[1]
    with pytest.raises(KeyError):
        cat.read(spark, "dim")
    with pytest.raises(KeyError):
        cat.begin().table("dim")
    # several more commits age the pre-drop manifests out of keep=1
    for lo in (90, 80):
        t2 = cat.begin()
        t2.table("facts").delete_where(spark, f"f_id >= {lo}")
        cat.commit(t2)
    rep = cat.vacuum(keep_versions=1, min_age_seconds=0)
    assert "dim" in rep["tables"]  # the tag's floor still guards it
    got = sorted(
        tuple(r)
        for r in cat.read(spark, "dim", tag="with-dim").collect()
    )
    assert got == want_dim  # bit-identical through the tag
    assert "dim" not in cat.read_all(spark)
    assert "dim" in cat.read_all(spark, tag="with-dim")
    # re-registration picks the table back up at its current version
    tag_pins = cat._read_manifest(cat._tag_version("with-dim"))["pins"]
    cat.add_table("dim", str(cat._resolve(tag_pins["dim"]["path"])))
    assert cat.read(spark, "dim").count() == 5  # head content, not tag


def test_drop_table_conflicts_inflight_txn_on_that_table(
    spark, tmp_path
):
    """A transaction that updated a table which was dropped before its
    commit() gets a loud CatalogConflict (the pin it serialized
    against no longer exists), never a silent re-registration."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("dim").delete_where(spark, "d_cust = 0")
    cat.drop_table("dim")
    with pytest.raises(CatalogConflict, match="dropped"):
        cat.commit(txn)
    # the doomed txn's table debris is attributable and reconcilable:
    # the table is out of the catalog, so reconcile has nothing to do
    rep = cat.reconcile(min_age_seconds=0)
    assert rep["rolled_back"] == []


def test_catalog_changes_consistent_feeds_and_table_set_diff(
    spark, tmp_path
):
    """CatalogLog.changes diffs every table between two CATALOG
    snapshots: a committed transaction's effects appear in both
    tables' feeds at once, crash debris rolled back by reconcile
    cancels to an empty feed, and add/drop surface as all-insert /
    all-delete feeds of the pinned content."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0 = cat.latest_version()

    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id % 10 = 0")
    txn.table("dim").merge_upsert(
        spark,
        spark.createDataFrame([(0, "zero")], "d_cust long, d_seg string"),
        ["d_cust"],
    )
    cat.commit(txn)
    # crashed txn debris, repaired: must NOT appear in any feed
    dead = cat.begin()
    dead.table("facts").delete_where(spark, "f_id % 2 = 1")
    cat.reconcile(min_age_seconds=0)

    feeds = cat.changes(
        spark, v0, key_cols={"facts": ["f_id"], "dim": ["d_cust"]}
    )
    facts = sorted(tuple(r) for r in feeds["facts"].collect())
    assert facts == sorted(
        (k, k % 10, k * 2, "delete", 1) for k in range(0, 100, 10)
    )
    dim = sorted(tuple(r) for r in feeds["dim"].collect())
    assert dim == [
        (0, "seg-0", "update_preimage", 1),
        (0, "zero", "update_postimage", 1),
    ]

    # added table: all-insert feed; dropped table: all-delete feed
    npath = tmp_path / "chg_notes"
    spark.range(0, 4).selectExpr("id AS n_id").coalesce(1).write.parquet(
        str(npath)
    )
    nlog = TableLog(str(npath))
    nlog.init()
    v_before = cat.latest_version()
    cat.add_table("notes", nlog)
    cat.drop_table("dim")
    feeds2 = cat.changes(spark, v_before)
    notes = sorted(tuple(r) for r in feeds2["notes"].collect())
    assert notes == [(i, "insert", 1) for i in range(4)]
    gone = feeds2["dim"]
    assert gone.where("_change_type <> 'delete'").count() == 0
    assert gone.count() == 10  # keyless feed groups distinct rows
    assert feeds2["facts"].count() == 0  # untouched table: empty feed


def test_catalog_consume_changes_one_ack_moves_all_tables(
    spark, tmp_path
):
    """The consumer-side face of multi-table atomicity: a catalog
    cursor delivers every table's delta from the same atomic span,
    one ack advances all positions at once, and a crash before the
    ack re-delivers the whole span (at-least-once)."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    cur = str(tmp_path / "cat_cursor.json")
    v0 = cat.latest_version()
    assert cat.consume_changes(spark, cur, start_version=v0) is None

    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id >= 95")
    txn.table("dim").delete_where(spark, "d_cust = 9")
    cat.commit(txn)

    got = cat.consume_changes(
        spark, cur, key_cols={"facts": ["f_id"], "dim": ["d_cust"]}
    )
    assert got is not None
    feeds, ack = got
    assert sorted(r["f_id"] for r in feeds["facts"].collect()) == [
        95, 96, 97, 98, 99
    ]
    assert [r["d_cust"] for r in feeds["dim"].collect()] == [9]
    assert all(
        r["_change_type"] == "delete" for r in feeds["facts"].collect()
    )
    # crash before ack: the span re-delivers identically
    feeds2, ack2 = cat.consume_changes(
        spark, cur, key_cols={"facts": ["f_id"], "dim": ["d_cust"]}
    )
    assert feeds2["facts"].count() == 5
    assert ack2() == cat.latest_version()
    assert cat.consume_changes(spark, cur) is None


def test_branch_isolated_writes_and_snapshot_cherry_pick_merge(
    spark, tmp_path
):
    """The round-14 design note, implemented: a branch is a zero-copy
    fork (hard-linked data, forked manifests) with every invariant
    holding per-branch; writes on either side are invisible to the
    other; merge cherry-picks the branch's changed-table snapshots
    into main as ONE atomic catalog commit."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feature"))
    assert br.snapshot()[1] == {"facts": 0, "dim": 0}
    before_main = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark).items()
    }

    # branch txn: facts purge — main sees nothing
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id % 7 = 0")
    br.commit(btxn)
    assert {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in cat.read_all(spark).items()
    } == before_main
    assert br.read(spark, "facts").count() == 85

    # main moves a DIFFERENT table concurrently: no conflict at merge
    mtxn = cat.begin()
    mtxn.table("dim").merge_upsert(
        spark,
        spark.createDataFrame([(3, "mainside")], "d_cust long, d_seg string"),
        ["d_cust"],
    )
    cat.commit(mtxn)

    rep = cat.merge_branch(br)
    assert rep["merged"] == ["facts"]
    after = cat.read_all(spark)
    assert after["facts"].count() == 85  # branch change landed
    assert after["dim"].where("d_seg = 'mainside'").count() == 1
    got = sorted(tuple(r) for r in after["facts"].collect())
    want = sorted(t for t in before_main["facts"] if t[0] % 7 != 0)
    assert got == want
    # the branch itself is unaffected by the merge and still readable
    assert br.read(spark, "facts").count() == 85
    # no debris: intents and markers all retired
    assert not list(cat.root.glob("intent-*.json"))
    assert not list(cat.root.glob("start-*.json"))


def test_branch_merge_conflict_first_committer_wins(spark, tmp_path):
    """A changed table whose main pin moved since the fork refuses to
    merge (rebase, never content-merge) — and the refused merge
    leaves main clean after reconcile."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat2"))
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id % 2 = 0")
    br.commit(btxn)
    # main ALSO moves facts
    mtxn = cat.begin()
    mtxn.table("facts").delete_where(spark, "f_id = 1")
    cat.commit(mtxn)
    with pytest.raises(CatalogConflict, match="rebase"):
        cat.merge_branch(br)
    # main unchanged by the refused merge; repair finds nothing or
    # rolls back any staged adopt debris
    cat.reconcile(min_age_seconds=0)
    assert cat.read(spark, "facts").count() == 99
    # rebase: re-branch from current main and re-apply, then merge
    br2 = cat.branch(str(tmp_path / "feat2-rebased"))
    b2 = br2.begin()
    b2.table("facts").delete_where(spark, "f_id % 2 = 0")
    br2.commit(b2)
    rep = cat.merge_branch(br2)
    assert rep["merged"] == ["facts"]
    # 100 - {f_id=1 on main} - {50 evens on the rebased branch} = 49
    assert cat.read(spark, "facts").count() == 49


def test_branch_vacuum_independence_and_scope_guards(spark, tmp_path):
    """Either side's vacuum never breaks the other (hard links);
    merging a no-change branch is a no-op; and a diverged branch —
    content moved on main since the fork — refuses with the rebase
    conflict even when it also carries a table add (first-committer
    holds across the whole merge)."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat3"))

    # no-change merge: no-op
    assert cat.merge_branch(br)["merged"] == []

    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id >= 50")
    br.commit(btxn)

    # main vacuums aggressively: branch still reads its fork snapshot
    for i in range(2):
        t = cat.begin()
        t.table("facts").delete_where(spark, f"f_id = {i}")
        cat.commit(t)
    cat.vacuum(keep_versions=1, min_age_seconds=0)
    assert br.read(spark, "facts").count() == 50
    # branch vacuums: main unharmed
    br.vacuum(keep_versions=1, min_age_seconds=0)
    assert cat.read(spark, "facts").count() == 98

    # the branch also adds a table, but main moved facts since the
    # fork: the whole merge refuses (rebase), the add included —
    # never a half-merged catalog
    npath = tmp_path / "br_notes"
    spark.range(3).selectExpr("id AS n").coalesce(1).write.parquet(
        str(npath)
    )
    nlog = TableLog(str(npath))
    nlog.init()
    br.add_table("notes", nlog)
    with pytest.raises(CatalogConflict, match="rebase"):
        cat.merge_branch(br)
    assert "notes" not in cat.snapshot()[1]


def test_branch_merge_crash_repairs_through_reconcile(spark, tmp_path):
    """A merge that crashes between its table adopts and the catalog
    commit is ordinary transaction debris: main readers stay at the
    old snapshot, reconcile rolls the tagged adopts back, and the
    merge succeeds when re-run."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat4"))
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id % 5 = 0")
    br.commit(btxn)

    # forge the crash: perform the merge's table half by hand (link +
    # tagged adopt), then 'die' before the catalog commit
    txn = cat.begin()
    t = txn.table("facts")
    blog = br.table_log("facts")
    bver = br.snapshot()[1]["facts"]
    _, bfiles = blog.snapshot(bver)
    import json as _json
    import os as _os
    import shutil as _shutil

    with open(blog.root / "_commits" / f"v{bver:012d}.json") as f:
        bman = _json.load(f)
    for rel in bfiles:
        dst = t.log.root / rel
        if not dst.exists():
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                _os.link(blog.root / rel, dst)
            except OSError:
                _shutil.copy2(blog.root / rel, dst)
    t.adopt(bfiles, schema=bman.get("schema"), layout=bman.get("layout"))
    # crash: no commit(). main readers see the old snapshot
    assert cat.read(spark, "facts").count() == 100
    rep = cat.reconcile(min_age_seconds=0)
    assert len(rep["rolled_back"]) == 1
    assert cat.read(spark, "facts").count() == 100
    # re-run the real merge: lands cleanly
    rep2 = cat.merge_branch(br)
    assert rep2["merged"] == ["facts"]
    assert cat.read(spark, "facts").count() == 80


def test_txn_mor_delete_moves_atomically(spark, tmp_path):
    """A merge-on-read delete inside a transaction: the delete is
    invisible until the catalog commit (table version moved but pin
    did not), atomic with the other table's write afterwards."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    res = txn.table("facts").delete_where_mor(spark, "f_id < 20")
    assert res["n_deleted"] == 20
    txn.table("dim").delete_where(spark, "d_cust = 9")
    # pre-commit: catalog readers still at the old snapshot
    assert cat.read(spark, "facts").count() == 100
    assert cat.read(spark, "dim").count() == 10
    cat.commit(txn)
    assert cat.read(spark, "facts").count() == 80
    assert cat.read(spark, "dim").count() == 9
    # data files of facts untouched by the MOR half
    m0 = flog.snapshot(0)[1]
    assert flog.snapshot()[1] == m0


def test_txn_mor_crash_debris_rolls_back(spark, tmp_path):
    """A crashed transaction's MOR-delete commit is ordinary tagged
    debris: reconcile rolls it back (rollback carries the dv block,
    restoring the PRE-delete content) and the table reads full."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("facts").delete_where_mor(spark, "f_id % 2 = 0")
    # crash before commit(): table version moved, catalog pin did not
    assert flog.read(spark).count() == 50  # direct table read sees it
    assert cat.read(spark, "facts").count() == 100  # catalog does not
    rep = cat.reconcile(min_age_seconds=0)
    assert len(rep["rolled_back"]) == 1
    assert cat.read(spark, "facts").count() == 100
    assert flog.read(spark).count() == 100


def test_branch_mor_delete_merges_into_main(spark, tmp_path):
    """Branch isolation and merge carry deletion vectors: a MOR delete
    on the branch stays invisible on main until merge_branch, then
    main sees exactly the branch's DV-applied content — without the
    merge copying or rewriting a single data file's bytes."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-dv"))
    btxn = br.begin()
    res = btxn.table("facts").delete_where_mor(spark, "f_id % 4 = 0")
    assert res["n_deleted"] == 25
    br.commit(btxn)
    assert br.read(spark, "facts").count() == 75
    assert cat.read(spark, "facts").count() == 100  # main untouched
    rep = cat.merge_branch(br)
    assert rep["merged"] == ["facts"]
    got = cat.read(spark, "facts")
    assert got.count() == 75
    assert got.where("f_id % 4 = 0").count() == 0
    # the merged manifest carries the dv block (metadata-only merge)
    v, pins = cat.snapshot()
    assert sum(flog._dv_of(pins["facts"]).get("counts", {}).values()) == 25


def test_branch_merge_unmoved_check_sees_mor_content(spark, tmp_path):
    """The first-committer-wins content check must treat a MOR delete
    on main as MOVED content (same file set, different dv) — merging
    a stale branch over it would silently undelete main's rows."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-dv2"))
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id = 7")
    br.commit(btxn)
    # main MOR-deletes AFTER the fork: file set unchanged, content not
    mtxn = cat.begin()
    mtxn.table("facts").delete_where_mor(spark, "f_id < 10")
    cat.commit(mtxn)
    with pytest.raises(CatalogConflict, match="rebase"):
        cat.merge_branch(br)
    assert cat.read(spark, "facts").count() == 90


def test_catalog_timestamp_travel_is_mutually_consistent(spark, tmp_path):
    """Catalog AS OF TIMESTAMP: resolving the CATALOG at a wall-clock
    instant yields the atomic pin set that was live then — both
    tables together, never a half-applied transaction."""
    import time as _time

    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    v0 = cat.latest_version()
    _time.sleep(0.05)
    t_mid = _time.time()
    _time.sleep(0.05)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 10")
    txn.table("dim").delete_where(spark, "d_cust = 0")
    cat.commit(txn)
    assert cat.version_at(t_mid) == v0
    cv = cat.version_at(_time.time())
    assert cv == cat.latest_version()
    _, pins_then = cat.snapshot(version=cat.version_at(t_mid))
    assert flog.read(spark, version=pins_then["facts"]).count() == 100
    assert dlog.read(spark, version=pins_then["dim"]).count() == 10
    with pytest.raises(ValueError, match="precedes"):
        cat.version_at(0.0)


def _new_table(spark, tmp_path, name, n=20):
    df = spark.range(0, n).selectExpr("id AS x", "id * 3 AS y")
    p = tmp_path / name
    df.coalesce(1).write.parquet(str(p))
    log = TableLog(str(p))
    log.init()
    return log


def test_txn_add_table_is_atomic_with_writes(spark, tmp_path):
    """A table registered inside a transaction appears in the SAME
    atomic catalog commit as the other tables' writes — a reader can
    never see the new table without the writes it arrived with."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    nlog = _new_table(spark, tmp_path, "metrics")
    txn = cat.begin()
    txn.add_table("metrics", nlog)
    # write through the txn to BOTH the new and an old table
    txn.table("metrics").delete_where(spark, "x >= 15")
    txn.table("facts").delete_where(spark, "f_id < 5")
    # pre-commit: head knows nothing
    assert "metrics" not in cat.snapshot()[1]
    assert cat.read(spark, "facts").count() == 100
    cat.commit(txn)
    v, pins = cat.snapshot()
    assert pins["metrics"] == 1  # the txn's delete landed on the pin
    assert cat.read(spark, "metrics").count() == 15
    assert cat.read(spark, "facts").count() == 95
    # older snapshots never see it
    assert "metrics" not in cat.snapshot(version=v - 1)[1]


def test_txn_drop_table_first_committer_wins(spark, tmp_path):
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.drop_table("dim")
    # concurrent writer moves dim before the drop commits
    other = cat.begin()
    other.table("dim").delete_where(spark, "d_cust = 1")
    cat.commit(other)
    with pytest.raises(CatalogConflict, match="moved"):
        cat.commit(txn)
    assert "dim" in cat.snapshot()[1]  # drop lost, work kept
    # a clean drop commits atomically with other writes
    txn2 = cat.begin()
    txn2.drop_table("dim")
    txn2.table("facts").delete_where(spark, "f_id = 0")
    cat.commit(txn2)
    v, pins = cat.snapshot()
    assert "dim" not in pins
    assert cat.read(spark, "facts").count() == 99
    # history keeps the dropped table readable
    assert cat.read(spark, "dim", version=v - 1).count() == 9


def test_txn_drop_guards(spark, tmp_path):
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    txn = cat.begin()
    txn.table("dim").delete_where(spark, "d_cust = 2")
    with pytest.raises(ValueError, match="writes in this transaction"):
        txn.drop_table("dim")
    nlog = _new_table(spark, tmp_path, "tmp_t")
    txn.add_table("tmp_t", nlog)
    with pytest.raises(ValueError, match="added by this transaction"):
        txn.drop_table("tmp_t")
    cat.commit(txn)


def test_merge_branch_with_added_table(spark, tmp_path):
    """A table created on the branch merges: cloned beside the main
    catalog, pinned in the same atomic commit as the branch's content
    changes."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-add"))
    nlog = _new_table(spark, tmp_path / "feat-add", "scores", n=30)
    br.add_table("scores", nlog)
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id % 10 = 0")
    btxn.table("scores").delete_where(spark, "x = 29")
    br.commit(btxn)
    rep = cat.merge_branch(br)
    assert rep["merged"] == ["facts"] and rep["added"] == ["scores"]
    _, pins = cat.snapshot()
    assert "scores" in pins
    assert cat.read(spark, "scores").count() == 29
    assert cat.read(spark, "facts").count() == 90
    # the clone is independent of the branch tree
    assert (tmp_path / "scores" / "_commits").exists() or (
        cat.root.parent / "scores" / "_commits"
    ).exists()


def test_merge_branch_added_name_collision_conflicts(spark, tmp_path):
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-add2"))
    nlog = _new_table(spark, tmp_path / "feat-add2", "scores2", n=10)
    br.add_table("scores2", nlog)
    # main registers the SAME name after the fork
    mlog = _new_table(spark, tmp_path, "scores2_main", n=5)
    cat.add_table("scores2", mlog)
    with pytest.raises(CatalogConflict, match="registered the same name"):
        cat.merge_branch(br)
    assert cat.read(spark, "scores2").count() == 5  # main's wins


def test_merge_branch_with_dropped_table(spark, tmp_path):
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-drop"))
    br.drop_table("dim")
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id < 50")
    br.commit(btxn)
    rep = cat.merge_branch(br)
    assert rep["merged"] == ["facts"] and rep["dropped"] == ["dim"]
    v, pins = cat.snapshot()
    assert "dim" not in pins
    assert cat.read(spark, "facts").count() == 50
    # pre-merge snapshot still reads dim
    assert cat.read(spark, "dim", version=v - 1).count() == 10


def test_merge_branch_drop_vs_main_move_conflicts(spark, tmp_path):
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-drop2"))
    br.drop_table("dim")
    # main keeps writing dim after the fork
    mtxn = cat.begin()
    mtxn.table("dim").delete_where(spark, "d_cust = 3")
    cat.commit(mtxn)
    with pytest.raises(CatalogConflict, match="moved on main"):
        cat.merge_branch(br)
    assert "dim" in cat.snapshot()[1]


def test_merge_crash_with_added_table_reruns_cleanly(spark, tmp_path):
    """A merge that crashed after cloning the branch-created table but
    before the catalog commit leaves main clean (the clone is
    referenced by nothing); the re-run REUSES the staged clone iff
    its content matches the branch head."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-crash"))
    nlog = _new_table(spark, tmp_path / "feat-crash", "ext", n=12)
    br.add_table("ext", nlog)
    # forge the crash: clone staged by hand, no catalog commit
    blog = br.table_log("ext")
    blog.clone(str(cat.root.parent / "ext"))
    assert "ext" not in cat.snapshot()[1]
    cat.reconcile(min_age_seconds=0)  # nothing to repair, nothing broken
    assert "ext" not in cat.snapshot()[1]
    rep = cat.merge_branch(br)
    assert rep["added"] == ["ext"]
    assert cat.read(spark, "ext").count() == 12


def test_reconcile_rolls_forward_intent_with_adds_and_drops(
    spark, tmp_path
):
    """An intent recording adds+drops that crashed between intent
    write and catalog publish rolls FORWARD through reconcile —
    the table set moves exactly as the transaction intended."""
    import json as _json

    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    nlog = _new_table(spark, tmp_path, "fwd_t", n=7)
    txn = cat.begin()
    txn.add_table("fwd_t", nlog)
    txn.drop_table("dim")
    # forge the crash: write the intent exactly as commit() would,
    # then 'die' before _commit_pins
    cat._intent_path(txn.txn_id).write_text(_json.dumps({
        "txn": txn.txn_id,
        "base_version": txn.base_version,
        "base_pins": txn.pins,
        "updates": txn.updates,
        "adds": txn.adds,
        "drops": txn.drops,
    }))
    rep = cat.reconcile(min_age_seconds=0)
    assert txn.txn_id in rep["rolled_forward"]
    _, pins = cat.snapshot()
    assert "fwd_t" in pins and "dim" not in pins
    assert cat.read(spark, "fwd_t").count() == 7
    # idempotent: a second reconcile finds nothing
    rep2 = cat.reconcile(min_age_seconds=0)
    assert not rep2["rolled_forward"]


def test_branch_merge_carries_constraints(spark, tmp_path):
    """A constraint set on the branch merges with its content; a
    post-merge violating write on main refuses."""
    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    br = cat.branch(str(tmp_path / "feat-cons"))
    br.table_log("facts").set_constraint(spark, "val_pos", "f_val >= 0")
    br.sync_table("facts")  # adopt the out-of-band metadata commit
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id = 99")
    br.commit(btxn)
    cat.merge_branch(br)
    mlog = cat.table_log("facts")
    assert mlog.constraints_of() == {"val_pos": "f_val >= 0"}
    with pytest.raises(ValueError, match="violates CHECK"):
        mlog.append(spark, spark.createDataFrame(
            [(500, 0, -2)], "f_id long, f_cust long, f_val long"
        ))


def test_branch_registry_list_and_safe_delete(spark, tmp_path, capsys):
    """branches() discovers forks; delete_branch removes a branch tree
    without touching main's bytes (hard links), refuses paths that are
    not registered branches, and the registration retires."""
    import json as _json

    from cve_manager_spark import maintenance_cli

    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    before = sorted(
        tuple(r) for r in cat.read(spark, "facts").collect()
    )
    br = cat.branch(str(tmp_path / "feat-reg"))
    btxn = br.begin()
    btxn.table("facts").delete_where(spark, "f_id < 90")
    br.commit(btxn)
    bl = cat.branches()
    assert len(bl) == 1 and bl[0]["alive"] and bl[0]["head"] == 1
    assert bl[0]["dest"].endswith("feat-reg")
    with pytest.raises(ValueError, match="not a registered branch"):
        cat.delete_branch(str(tmp_path / "cat_facts"))  # a TABLE dir
    rep = cat.delete_branch(str(tmp_path / "feat-reg"))
    assert rep["existed"]
    assert not (tmp_path / "feat-reg").exists()
    assert cat.branches() == []
    # main's data survived the branch deletion bit-for-bit
    assert sorted(
        tuple(r) for r in cat.read(spark, "facts").collect()
    ) == before
    # CLI round trip
    assert maintenance_cli.main(
        ["catalog-branch", "--catalog", str(cat.root),
         "--dest", str(tmp_path / "feat-reg2")]
    ) == 0
    capsys.readouterr()
    assert maintenance_cli.main(
        ["catalog-branch", "--catalog", str(cat.root), "--list"]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rep["branches"]) == 1
    assert maintenance_cli.main(
        ["catalog-branch", "--catalog", str(cat.root),
         "--delete-branch", str(tmp_path / "feat-reg2")]
    ) == 0


def test_read_all_as_of_timestamp(spark, tmp_path):
    """read_all(timestamp=) returns the whole pipeline's mutually
    consistent table set as of one instant — including the table SET
    (a later add is absent from the earlier instant)."""
    import time as _time

    cat, flog, dlog = _mk_catalog(spark, tmp_path)
    _time.sleep(0.05)
    t_mid = _time.time()
    _time.sleep(0.05)
    txn = cat.begin()
    txn.table("facts").delete_where(spark, "f_id < 30")
    txn.add_table("late_t", _new_table(spark, tmp_path, "late_t", n=4))
    cat.commit(txn)
    then = cat.read_all(spark, timestamp=t_mid)
    assert set(then) == {"facts", "dim"}
    assert then["facts"].count() == 100
    now = cat.read_all(spark, timestamp=_time.time())
    assert set(now) == {"facts", "dim", "late_t"}
    assert now["facts"].count() == 70
    with pytest.raises(ValueError, match="one of"):
        cat.read_all(spark, version=0, timestamp=t_mid)
