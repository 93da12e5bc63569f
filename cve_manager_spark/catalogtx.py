"""catalogtx.py: multi-table transactions over commit-logged tables.

A Nessie-style CATALOG LOG closes the one structural gap single-table
commit logs (ours, Delta's, Iceberg's) all share: a facts+dim+view
triple cannot move atomically. The catalog is itself an append-only
log of tiny JSON manifests, each atomically pinning ONE version per
registered table — readers resolve every table through the catalog
snapshot, so a group of table commits becomes visible all-at-once when
(and only when) the catalog commit that pins them publishes.

Reference parity note: the reference tool (cve_manager.py:362-384)
refreshes multiple Postgres tables under client-side sequencing with
no cross-table atomicity; this module is the engine-native upgrade the
same workload needs once tables are commit-logged.

Protocol (two-phase, crash-safe, no locks):

1. ``begin()`` reads the catalog head and its pins. Every transactional
   table write goes through :class:`TxnTable`, which (a) READS at the
   catalog-pinned version and (b) COMMITS with
   ``expected_version=<pin>`` and ``tag=txn-<id>`` — strict
   serialization at the table level, so two transactions racing on the
   SAME table resolve first-committer-wins (the loser's table commit
   raises :class:`~cve_manager_spark.commitlog.CommitConflict` before
   anything published; its staged files are aborted by TableLog).
2. ``commit()`` writes an INTENT file (txn id + exact table→version
   updates), then publishes catalog version k+1 via the same
   hard-link-exclusive trick TableLog uses, then removes the intent.
   Transactions touching DISJOINT tables race only on the catalog
   version number: the loser rebases its pins onto the new head and
   retries the one-JSON-write publish; overlapping pins raise
   :class:`CatalogConflict`.
3. A CRASH anywhere leaves readers at the old catalog snapshot —
   table versions committed by the dead transaction exist in their
   table logs but no catalog commit pins them, so no catalog reader
   ever sees them. :func:`CatalogLog.reconcile` repairs the log
   deterministically: a dangling txn WITH an intent file rolls
   FORWARD (the intent records the complete update set — publish it);
   dangling tagged table versions WITHOUT an intent roll BACK (a
   content-restoring ``TableLog.rollback`` to the pinned content,
   re-pinned by a ``reconcile`` catalog commit so the table is
   unwedged for the next transaction).

Scale: catalog manifests are O(#tables) JSON bytes — publish cost is
independent of data size, and the catalog serializes only the commit
POINT, never the staging work (table COW rewrites run fully parallel
before the one hard-link). This is the same metadata/data split as the
table log itself, one level up.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.commitlog import CommitConflict, TableLog


class CatalogConflict(Exception):
    """Another transaction moved a table this transaction updated."""


def _cat_manifest(root: Path, version: int) -> Path:
    return root / f"cat-v{version:012d}.json"


class CatalogTxn:
    """Handle for one in-flight multi-table transaction."""

    def __init__(self, catalog: "CatalogLog", base_version: int,
                 pins: dict[str, int]):
        self.catalog = catalog
        self.base_version = base_version
        self.pins = dict(pins)  # table -> version this txn reads/bases on
        self.updates: dict[str, int] = {}  # table -> new committed version
        # table-set changes riding the SAME atomic catalog commit:
        # adds = {name: {"path": rel, "version": v}} pins to create,
        # drops = names whose pin the commit removes (first-committer
        # checked against the base pin at publish)
        self.adds: dict[str, dict] = {}
        self.drops: list[str] = []
        self.txn_id = uuid.uuid4().hex[:16]

    def table(self, name: str) -> "TxnTable":
        if name not in self.pins:
            raise KeyError(
                f"table {name!r} not registered in catalog "
                f"{self.catalog.root}"
            )
        return TxnTable(self, name)

    def add_table(self, name: str, table: "str | TableLog") -> None:
        """Register ``table`` under ``name`` AS PART OF this
        transaction: the pin appears in the same atomic catalog commit
        as every other table the txn moves — a reader can never see
        the new table without the writes it arrived with (the
        backfill-then-register pattern, and the primitive branch merge
        uses for tables created on the branch). The table must already
        be commit-logged; conflicts (name registered concurrently)
        surface at commit."""
        if name in self.pins or name in self.adds:
            raise ValueError(
                f"table {name!r} already in this transaction's catalog "
                "view"
            )
        log = table if isinstance(table, TableLog) else TableLog(str(table))
        tv = log.latest_version()
        if tv is None:
            raise ValueError(
                f"table {name!r} at {log.root} is not commit-logged "
                "(run TableLog.init())"
            )
        self.adds[name] = {
            "path": os.path.relpath(log.root, self.catalog.root.parent),
            "version": tv,
        }
        self.pins[name] = tv  # txn-local view; commit publishes it

    def drop_table(self, name: str) -> None:
        """Remove ``name``'s pin AS PART OF this transaction — atomic
        with the rest of the commit, first-committer-wins against the
        base pin (a concurrent writer moving the table makes the drop
        conflict instead of silently discarding its work). Older
        catalog snapshots and tags keep the table readable, exactly as
        :meth:`CatalogLog.drop_table`."""
        if name in self.adds:
            raise ValueError(
                f"table {name!r} was added by this transaction; "
                "dropping it again is contradictory"
            )
        if name not in self.pins:
            raise KeyError(
                f"table {name!r} not registered in catalog "
                f"{self.catalog.root}"
            )
        if name in self.updates:
            raise ValueError(
                f"table {name!r} has writes in this transaction; "
                "dropping it would discard them"
            )
        if name not in self.drops:
            self.drops.append(name)


class TxnTable:
    """Pinned write surface for one table inside a transaction: reads
    see the catalog-pinned version (plus this txn's own writes), and
    every commit is strictly serialized against that pin and tagged
    with the txn id — the tie that lets :func:`CatalogLog.reconcile`
    attribute dangling versions after a crash."""

    def __init__(self, txn: CatalogTxn, name: str):
        self.txn = txn
        self.name = name
        if name in txn.adds:
            # txn-added table: not in the head manifest yet — resolve
            # through the add's recorded path
            self.log = TableLog(str(
                txn.catalog._resolve(txn.adds[name]["path"])
            ))
        else:
            self.log = txn.catalog.table_log(name)

    def _pin(self) -> int:
        # later ops in the same txn chain on the txn's own writes
        return self.txn.updates.get(self.name, self.txn.pins[self.name])

    def _record(self, res: dict) -> dict:
        self.txn.updates[self.name] = res["version"]
        return res

    def read(self, spark: SparkSession) -> DataFrame:
        return self.log.read(spark, version=self._pin())

    def append(self, spark: SparkSession, rows: DataFrame, **kw) -> dict:
        return self._record(self.log.append(
            spark, rows, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}", **kw,
        ))

    def merge_upsert(self, spark: SparkSession, updates: DataFrame,
                     key_cols: list[str]) -> dict:
        return self._record(self.log.merge_upsert(
            spark, updates, key_cols, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        ))

    def delete_where(self, spark: SparkSession, predicate) -> dict:
        res = self.log.delete_where(
            spark, predicate, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        )
        # a no-match delete commits nothing; only record real commits
        if res["files_touched"] > 0:
            self._record(res)
        return res

    def delete_where_mor(self, spark: SparkSession, predicate) -> dict:
        """Merge-on-read delete inside the transaction: position
        deletes, zero data files rewritten (see
        :meth:`TableLog.delete_where_mor`) — same strict serialization
        and txn stamping as the COW form."""
        res = self.log.delete_where_mor(
            spark, predicate, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        )
        if res["n_deleted"] > 0:
            self._record(res)
        return res

    def update_where_mor(self, spark: SparkSession, predicate,
                         set_exprs: dict) -> dict:
        """Merge-on-read UPDATE inside the transaction (see
        :meth:`TableLog.update_where_mor`)."""
        res = self.log.update_where_mor(
            spark, predicate, set_exprs, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        )
        if res["n_updated"] > 0:
            self._record(res)
        return res

    def merge_upsert_mor(self, spark: SparkSession, updates: DataFrame,
                         key_cols: list[str]) -> dict:
        """Merge-on-read keyed MERGE inside the transaction (see
        :meth:`TableLog.merge_upsert_mor`)."""
        return self._record(self.log.merge_upsert_mor(
            spark, updates, key_cols, expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        ))

    def overwrite(self, spark: SparkSession, rows: DataFrame) -> dict:
        return self._record(self.log.overwrite(
            spark, rows, tag=f"txn-{self.txn.txn_id}",
            expected_version=self._pin(),
        ))

    def adopt(self, rel_files: list[str], schema: "str | None" = None,
              layout: "list[str] | None" = None,
              dv: "dict | None" = None,
              constraints: "dict | None" = None) -> dict:
        """Adopt already-present files as this transaction's snapshot
        of the table (the branch-merge primitive — see
        :meth:`TableLog.adopt_files`). ``dv`` carries the adopted
        snapshot's deletion-vector block, so a branch's merge-on-read
        deletes merge with the same fidelity as its data files;
        ``constraints`` likewise carries its CHECK-constraint set."""
        return self._record(self.log.adopt_files(
            rel_files, schema=schema, layout=layout, dv=dv,
            constraints=constraints,
            expected_version=self._pin(),
            tag=f"txn-{self.txn.txn_id}",
        ))


class CatalogLog:
    """The catalog: an append-only log of atomic multi-table pins."""

    def __init__(self, path: str):
        self.root = Path(path)

    # -- log primitives --------------------------------------------------

    def versions(self) -> list[int]:
        if not self.root.exists():
            return []
        out = []
        for p in self.root.iterdir():
            n = p.name
            if n.startswith("cat-v") and n.endswith(".json"):
                out.append(int(n[len("cat-v"):-len(".json")]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_manifest(self, version: int) -> dict:
        with open(_cat_manifest(self.root, version)) as f:
            return json.load(f)

    def _publish(self, parent: int, pins: dict[str, dict], op: str,
                 txn_id: str | None = None,
                 extra: dict | None = None) -> int:
        """Atomically publish catalog version ``parent+1`` (hard-link
        exclusive, exactly the TableLog commit primitive)."""
        version = parent + 1
        target = _cat_manifest(self.root, version)
        tmp = self.root / f".tmp-{uuid.uuid4().hex}.json"
        body = {"version": version, "parent": parent, "op": op,
                "ts": time.time(),  # AS OF TIMESTAMP resolution
                "pins": pins}
        if extra:
            body.update(extra)
        if txn_id is not None:
            body["txn"] = txn_id
        tmp.write_text(json.dumps(body, indent=1))
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"catalog version {version} of {self.root} was committed "
                "by another writer"
            ) from None
        finally:
            tmp.unlink(missing_ok=True)
        return version

    # -- lifecycle ---------------------------------------------------------

    def init(self, tables: dict[str, "str | TableLog"]) -> int:
        """Catalog version 0: pin every registered table at its current
        version. Each table must already be commit-logged."""
        if self.versions():
            raise ValueError(f"catalog already exists under {self.root}")
        self.root.mkdir(parents=True, exist_ok=True)
        pins: dict[str, dict] = {}
        for name, t in tables.items():
            log = t if isinstance(t, TableLog) else TableLog(str(t))
            v = log.latest_version()
            if v is None:
                raise ValueError(
                    f"table {name!r} at {log.root} is not commit-logged "
                    "(run TableLog.init())"
                )
            # paths are stored RELATIVE to the catalog's parent dir, so
            # a catalog + its tables move/rename as one tree (the same
            # portability rule Delta/Iceberg follow with table-relative
            # file paths); tables outside the tree fall back to their
            # ..-relative form, which survives a whole-tree move too
            pins[name] = {
                "path": os.path.relpath(log.root, self.root.parent),
                "version": v,
            }
        return self._publish(-1, pins, "init")

    def _resolve(self, path: str) -> Path:
        p = Path(path)
        return p if p.is_absolute() else (self.root.parent / p)

    def table_log(self, name: str) -> TableLog:
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no catalog under {self.root}")
        pins = self._read_manifest(head)["pins"]
        if name not in pins:
            raise KeyError(f"table {name!r} not in catalog {self.root}")
        return TableLog(str(self._resolve(pins[name]["path"])))

    def commit_ts_of(self, version: int) -> float:
        """Wall-clock commit time of a catalog version (manifest
        ``ts``; pre-recording manifests fall back to file mtime — the
        hard link is created at commit time)."""
        t = self._read_manifest(version).get("ts")
        if t is not None:
            return float(t)
        return _cat_manifest(self.root, version).stat().st_mtime

    def version_at(self, ts: float) -> int:
        """The newest CATALOG version committed at or before wall-clock
        ``ts`` — multi-table ``AS OF TIMESTAMP``: resolving the catalog
        (not each table separately) yields a MUTUALLY CONSISTENT pin
        set, because one catalog commit moved all its tables together.
        Manifests predating timestamp recording fall back to file
        mtime (the hard link is created at commit time). Raises when
        ``ts`` precedes the oldest retained catalog commit."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"no catalog under {self.root}")
        best = None
        for v in vs:
            if self.commit_ts_of(v) <= ts:
                best = v
            else:
                break
        if best is None:
            raise ValueError(
                f"timestamp {ts} precedes the oldest retained catalog "
                f"commit of {self.root} (v{vs[0]})"
            )
        return best

    def snapshot(
        self, version: int | None = None, tag: str | None = None
    ) -> tuple[int, dict]:
        """(catalog version, {table: pinned table version}). ``tag``
        resolves a named snapshot (mutually exclusive with
        ``version``)."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self._tag_version(tag)
        v = self.latest_version() if version is None else version
        if v is None or not _cat_manifest(self.root, v).exists():
            raise ValueError(
                f"catalog version {version} not found under {self.root}"
            )
        pins = self._read_manifest(v)["pins"]
        return v, {n: p["version"] for n, p in pins.items()}

    # -- tags: immutable named snapshots -----------------------------

    def _tag_path(self, name: str) -> Path:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad tag name {name!r}")
        return self.root / f"tag-{name}.json"

    def _tag_version(self, name: str) -> int:
        p = self._tag_path(name)
        if not p.exists():
            raise ValueError(
                f"tag {name!r} not found under {self.root}"
            )
        return int(json.loads(p.read_text())["version"])

    def tag(self, name: str, version: int | None = None) -> int:
        """Name a catalog snapshot (git-tag semantics: IMMUTABLE —
        creating an existing name raises; delete then re-create to
        move one). A tagged snapshot survives :meth:`vacuum`
        regardless of age, so 'the eval-set release we trained
        against' stays readable forever. One tiny JSON file,
        hard-link-exclusive like every commit here."""
        v, _ = self.snapshot(version)
        target = self._tag_path(name)
        tmp = self.root / f".tag-tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps({"tag": name, "version": v}))
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise ValueError(
                f"tag {name!r} already exists (tags are immutable; "
                "delete_tag first to move it)"
            ) from None
        finally:
            tmp.unlink(missing_ok=True)
        return v

    def tags(self) -> dict[str, int]:
        return {
            p.name[len("tag-"):-len(".json")]: int(
                json.loads(p.read_text())["version"]
            )
            for p in sorted(self.root.glob("tag-*.json"))
        }

    def delete_tag(self, name: str) -> None:
        self._tag_path(name).unlink(missing_ok=True)

    def read(self, spark: SparkSession, name: str,
             version: int | None = None,
             tag: str | None = None,
             timestamp: float | None = None) -> DataFrame:
        """Read one table through the catalog snapshot — table versions
        committed but not yet catalog-pinned are invisible. Both path
        AND version resolve from the snapshot's OWN manifest, so a
        table dropped from the head catalog stays readable through any
        older version or tag that still pins it. ``timestamp``
        resolves through :meth:`version_at` (mutually exclusive with
        ``version``/``tag``)."""
        if timestamp is not None:
            if version is not None or tag is not None:
                raise ValueError(
                    "read: pass one of version / tag / timestamp"
                )
            version = self.version_at(timestamp)
        v, _ = self.snapshot(version, tag=tag)
        pins = self._read_manifest(v)["pins"]
        if name not in pins:
            raise KeyError(
                f"table {name!r} not in catalog {self.root} at v{v}"
            )
        log = TableLog(str(self._resolve(pins[name]["path"])))
        return log.read(spark, version=pins[name]["version"])

    def read_all(self, spark: SparkSession,
                 version: int | None = None,
                 tag: str | None = None,
                 timestamp: float | None = None) -> dict[str, DataFrame]:
        """A CONSISTENT multi-table snapshot: every table at the pins of
        one catalog version — the read face of atomicity. The table
        SET is part of the snapshot too: a version before an
        ``add_table`` excludes the newcomer, one before a
        ``drop_table`` still includes the dropped table. ``timestamp``
        resolves through :meth:`version_at` (exclusive with
        ``version``/``tag``) — the whole-pipeline AS OF."""
        if timestamp is not None:
            if version is not None or tag is not None:
                raise ValueError(
                    "read_all: pass one of version / tag / timestamp"
                )
            version = self.version_at(timestamp)
        v, _ = self.snapshot(version, tag=tag)
        pins = self._read_manifest(v)["pins"]
        return {
            n: TableLog(str(self._resolve(p["path"]))).read(
                spark, version=p["version"]
            )
            for n, p in pins.items()
        }

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
        key_cols: "dict[str, list[str]] | None" = None,
        where: "dict[str, dict[str, tuple]] | None" = None,
    ) -> dict[str, DataFrame]:
        """Per-table change feeds between two CATALOG versions — the
        row-level face of multi-table atomicity: because both
        endpoints are catalog snapshots, the per-table feeds are
        MUTUALLY CONSISTENT (each table diffs between the pins one
        atomic commit published, so a facts feed can never show a
        transaction's effect whose dim feed doesn't). Options are
        per-table maps: ``key_cols={"facts": ["id"]}`` gives that
        table Delta-style update pairs, ``where={"facts": {"ts":
        (lo, hi)}}`` bounds that table's feed with zone-map pruning
        (see :meth:`TableLog.changes`).

        The TABLE SET diffs too: a table added between the versions
        surfaces as an all-insert feed of its to-side pinned content,
        a dropped table as an all-delete feed of its from-side
        content — so a consumer replaying catalog history sees
        registration and removal as data, not as KeyErrors.

        Scale: each feed inherits the manifest-delta property (only
        files entering/leaving between the pins are read), and a
        reconcile rollback restores pinned content, so crash debris
        cancels to an EMPTY feed here — leaked debris is a visible
        row."""
        vf, _ = self.snapshot(v_from)
        vt, _ = self.snapshot(v_to)
        pins_f = self._read_manifest(vf)["pins"]
        pins_t = self._read_manifest(vt)["pins"]
        out: dict[str, DataFrame] = {}
        for name in sorted(set(pins_f) | set(pins_t)):
            kc = (key_cols or {}).get(name)
            wh = (where or {}).get(name)
            in_f, in_t = name in pins_f, name in pins_t
            entry = pins_t.get(name, pins_f.get(name))
            log = TableLog(str(self._resolve(entry["path"])))
            if in_f and in_t:
                out[name] = log.changes(
                    spark, pins_f[name]["version"],
                    pins_t[name]["version"], key_cols=kc, where=wh,
                )
                continue
            # added (insert feed of the to-pin) or dropped (delete
            # feed of the from-pin): the snapshot content, change-typed
            df = log.read(
                spark,
                version=(pins_t[name]["version"] if in_t
                         else pins_f[name]["version"]),
                where=wh,
            )
            ctype = F.lit("insert" if in_t else "delete")
            if kc is None:
                out[name] = (
                    df.groupBy(*df.columns)
                    .agg(F.count(F.lit(1)).cast("long")
                         .alias("_change_count"))
                    .withColumn("_change_type", ctype)
                    .select(*df.columns, "_change_type", "_change_count")
                )
            else:
                out[name] = df.select(
                    *df.columns,
                    ctype.alias("_change_type"),
                    F.lit(1).cast("long").alias("_change_count"),
                )
        return out

    def consume_changes(
        self,
        spark: SparkSession,
        cursor_path: str,
        key_cols: "dict[str, list[str]] | None" = None,
        where: "dict[str, dict[str, tuple]] | None" = None,
        start_version: int | None = None,
        max_versions: int | None = None,
    ):
        """Tail the CATALOG incrementally: ``(feeds, ack)`` where
        ``feeds`` is :meth:`changes` between the cursor's last
        consumed catalog version and the (possibly capped) head, or
        None when already caught up. The cursor pins CATALOG versions,
        so one ack moves every table's position at once and a
        downstream multi-table applier (a join-view materializer
        consuming facts+dim deltas) can never apply one table's delta
        without the other's from the same atomic commit — the
        consumer-side face of multi-table atomicity. Same contract as
        ``TableLog.consume_changes``: apply-then-ack (at-least-once,
        idempotent appliers make it exactly-once in effect), atomic
        one-JSON cursor, ``start_version`` for backfill vs None for
        Kafka-style latest, ``max_versions`` for bounded spans."""
        import tempfile

        cur = Path(cursor_path)
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no catalog under {self.root}")
        cur.parent.mkdir(parents=True, exist_ok=True)

        def _write_cursor(v: int) -> None:
            fd, tmp = tempfile.mkstemp(
                dir=str(cur.parent), prefix=cur.name, suffix=".tmp"
            )
            with os.fdopen(fd, "w") as f:
                json.dump({"version": v}, f)
            os.replace(tmp, str(cur))

        if cur.exists():
            last = int(json.loads(cur.read_text())["version"])
        elif start_version is not None:
            last = int(start_version)
            # persist the pin before any changes are returned: a crash
            # can only re-deliver, never skip (the TableLog rule)
            _write_cursor(last)
        else:
            _write_cursor(head)
            return None
        if last >= head:
            return None
        if max_versions is not None:
            if max_versions < 1:
                raise ValueError("max_versions must be >= 1")
            upcoming = [v for v in self.versions() if v > last]
            head = upcoming[:max_versions][-1]
        feeds = self.changes(
            spark, last, head, key_cols=key_cols, where=where
        )

        def ack() -> int:
            _write_cursor(head)
            return head

        return feeds, ack

    # -- transactions ------------------------------------------------------

    def begin(self) -> CatalogTxn:
        v, pins = self.snapshot()
        txn = CatalogTxn(self, v, pins)
        # a START MARKER distinguishes a LIVE transaction's tagged
        # table commits from a dead one's crash debris: a live txn has
        # no intent file until commit(), so without the marker a
        # maintenance-cadence reconcile() would roll back an in-flight
        # writer's already-committed table versions and doom its
        # commit() to CatalogConflict. reconcile() skips debris whose
        # marker is younger than its min_age_seconds and treats an
        # OLD marker as a death certificate.
        self._start_path(txn.txn_id).write_text(json.dumps({
            "txn": txn.txn_id, "started": time.time(),
        }))
        return txn

    def _intent_path(self, txn_id: str) -> Path:
        return self.root / f"intent-{txn_id}.json"

    def _start_path(self, txn_id: str) -> Path:
        return self.root / f"start-{txn_id}.json"

    def _start_age(self, txn_id: str) -> float | None:
        """Seconds since the txn's start marker was written, or None
        if no marker exists (a pre-marker-era or hand-cleaned txn)."""
        p = self._start_path(txn_id)
        if not p.exists():
            return None
        try:
            return time.time() - float(
                json.loads(p.read_text())["started"]
            )
        except (ValueError, KeyError, json.JSONDecodeError):
            return time.time() - p.stat().st_mtime

    def commit(self, txn: CatalogTxn, max_retries: int = 5) -> int:
        """Publish the transaction: one atomic catalog commit pinning
        every updated table's new version (and carrying every other
        table's head pin forward). Writes the roll-forward INTENT
        first, so a crash between intent and publish is repaired by
        :meth:`reconcile` in the forward direction — the table commits
        already exist and are exactly what the intent records.

        :class:`CatalogConflict` here means a pin for one of this
        transaction's tables was moved OUT-OF-BAND (``sync_table`` /
        ``reconcile``) while it ran — racing transactions never get
        this far, they lose at the table-level ``expected_version``
        before anything publishes. The conflicting transaction's table
        versions become debris for :meth:`reconcile` to roll back."""
        if not (txn.updates or txn.adds or txn.drops):
            # nothing written: a no-op txn — retire its start marker
            self._start_path(txn.txn_id).unlink(missing_ok=True)
            return txn.base_version
        intent = self._intent_path(txn.txn_id)
        intent.write_text(json.dumps({
            "txn": txn.txn_id,
            "base_version": txn.base_version,
            "base_pins": txn.pins,
            "updates": txn.updates,
            "adds": txn.adds,
            "drops": txn.drops,
        }))
        try:
            v = self._commit_pins(txn.txn_id, txn.pins, txn.updates,
                                  max_retries, adds=txn.adds,
                                  drops=txn.drops)
        finally:
            # an intent must outlive only a CRASH (reconcile rolls it
            # forward); success and a clean conflict abort both
            # invalidate it — and either outcome retires the start
            # marker (a conflict's debris is attributable immediately)
            intent.unlink(missing_ok=True)
            self._start_path(txn.txn_id).unlink(missing_ok=True)
        return v

    def _commit_pins(self, txn_id: str, base_pins: dict[str, int],
                     updates: dict[str, int], max_retries: int = 5,
                     adds: dict[str, dict] | None = None,
                     drops: list[str] | None = None) -> int:
        adds, drops = adds or {}, drops or []

        def _already_committed() -> int | None:
            # idempotent publish: if THIS txn's catalog commit already
            # exists (a concurrent reconcile() rolled the intent
            # forward between our intent write and publish), the
            # commit succeeded — report it rather than raising a
            # false conflict
            for v in self.versions():
                if self._read_manifest(v).get("txn") == txn_id:
                    return v
            return None

        def _conflict(msg: str) -> int:
            done = _already_committed()
            if done is not None:
                return done
            raise CatalogConflict(msg)

        for _ in range(max_retries):
            head = self.latest_version()
            m = self._read_manifest(head)
            pins = {n: dict(p) for n, p in m["pins"].items()}
            for name in updates:
                if name in adds:
                    # pin created by THIS txn's add: no head pin to
                    # check against (the table-level expected_version
                    # chain already serialized the writes)
                    continue
                if name not in pins:
                    return _conflict(
                        f"table {name!r} was dropped from the catalog "
                        "since this transaction began"
                    )
                if pins[name]["version"] != base_pins[name]:
                    return _conflict(
                        f"table {name!r} moved from pinned version "
                        f"{base_pins[name]} to {pins[name]['version']} "
                        "since this transaction began"
                    )
            for name in adds:
                if name in pins:
                    return _conflict(
                        f"table {name!r} was registered concurrently; "
                        "the transaction's add conflicts"
                    )
            for name in drops:
                if name not in pins:
                    return _conflict(
                        f"table {name!r} is already gone from the "
                        "catalog; the transaction's drop conflicts"
                    )
                if pins[name]["version"] != base_pins.get(name):
                    return _conflict(
                        f"table {name!r} moved since this transaction "
                        "began; dropping it would discard that work"
                    )
            for name, spec in adds.items():
                pins[name] = dict(spec)
            for name, nv in updates.items():
                # after adds: a txn that wrote to its own added table
                # moves the fresh pin to the written version
                pins[name]["version"] = nv
            for name in drops:
                del pins[name]
            try:
                return self._publish(head, pins, "txn", txn_id=txn_id)
            except CommitConflict:
                continue  # disjoint-table race: rebase onto new head
        raise CommitConflict(
            f"catalog {self.root}: gave up after {max_retries} rebases"
        )

    def add_table(self, name: str, table: "str | TableLog") -> int:
        """Register a NEW table as a catalog commit — the table set is
        data, not schema frozen at :meth:`init`: tomorrow's
        ``embeddings_v2`` joins the catalog without rebuilding it or
        losing history/tags. The table must already be commit-logged
        (its content exists before the catalog pin, so a crash between
        ``TableLog.init`` and this commit leaves the catalog CLEAN —
        re-run ``add_table`` to finish). The added table participates
        in the very next transaction: ``begin()`` snapshots head pins,
        which now include it, and in-flight transactions that began
        earlier are unaffected (their pins are frozen; the publish
        rebase carries the new pin forward)."""
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no catalog under {self.root}")
        log = table if isinstance(table, TableLog) else TableLog(str(table))
        tv = log.latest_version()
        if tv is None:
            raise ValueError(
                f"table {name!r} at {log.root} is not commit-logged "
                "(run TableLog.init())"
            )
        m = self._read_manifest(head)
        pins = {n: dict(p) for n, p in m["pins"].items()}
        if name in pins:
            raise ValueError(
                f"table {name!r} already registered in catalog "
                f"{self.root} (use sync_table to advance its pin)"
            )
        pins[name] = {
            "path": os.path.relpath(log.root, self.root.parent),
            "version": tv,
        }
        return self._publish(head, pins, "add_table")

    def drop_table(self, name: str) -> int:
        """Unregister a table as a catalog commit: the HEAD manifest
        stops pinning it, so new transactions and head reads no longer
        see it — but every OLDER catalog version (and every tag) that
        pins it stays readable, because reads resolve the table's path
        and version from the snapshot's own manifest, and
        :meth:`vacuum` keeps the floor pin of every surviving
        manifest, dropped tables included. Nothing is deleted: the
        table's directory and log survive (re-``add_table`` to
        re-register); a table no surviving catalog manifest mentions
        simply stops being vacuumed through the catalog."""
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no catalog under {self.root}")
        m = self._read_manifest(head)
        pins = {n: dict(p) for n, p in m["pins"].items()}
        if name not in pins:
            raise KeyError(f"table {name!r} not in catalog {self.root}")
        del pins[name]
        return self._publish(head, pins, "drop_table")

    def sync_table(self, name: str) -> int:
        """Adopt out-of-band (non-transactional) commits on one table:
        a single-table catalog commit moving its pin to the table's
        current latest. The escape hatch for mixing direct TableLog
        writers with catalog readers."""
        head = self.latest_version()
        m = self._read_manifest(head)
        pins = {n: dict(p) for n, p in m["pins"].items()}
        if name not in pins:
            raise KeyError(f"table {name!r} not in catalog {self.root}")
        pins[name]["version"] = TableLog(
            str(self._resolve(pins[name]["path"]))
        ).latest_version()
        return self._publish(head, pins, "sync")

    # -- branches: writable divergent histories -----------------------

    def branch(self, dest: str, version: int | None = None,
               tag: str | None = None) -> "CatalogLog":
        """Fork a WRITABLE BRANCH of one catalog snapshot — the model
        the round-14 design note chose (forked manifests, shared data
        files): every pinned table is zero-copy CLONED (hard-linked
        immutable data files, fresh linear history) into a
        self-contained tree under ``dest`` (one dir per table plus
        ``catalog/``), and a new catalog is initialized over the
        clones with the fork point recorded (``upstream`` = the source
        pins). Every existing invariant — strict ``expected_version``
        serialization, intent/start-marker repair, tags, vacuum
        floors, zone-map/bloom sidecars — holds on the branch
        verbatim, because the branch IS an ordinary catalog over
        ordinary tables; there is no cross-branch write contention at
        all, and either side's vacuum only unlinks its own directory
        entries (the shared inode survives until the last link drops —
        hard links make the design note's cross-branch liveness union
        automatic). Fork cost: O(#manifests + #files) metadata ops,
        zero data bytes."""
        v, _ = self.snapshot(version, tag=tag)
        pins = self._read_manifest(v)["pins"]
        tree = Path(dest)
        if tree.exists() and any(tree.iterdir()):
            raise ValueError(f"branch destination {tree} is not empty")
        tree.mkdir(parents=True, exist_ok=True)
        new_pins: dict[str, dict] = {}
        for name, p in pins.items():
            src = TableLog(str(self._resolve(p["path"])))
            src.clone(str(tree / name), version=p["version"])
            new_pins[name] = {"path": name, "version": 0}
        br = CatalogLog(str(tree / "catalog"))
        br.root.mkdir(parents=True, exist_ok=True)
        upstream = {
            "catalog_version": v,
            "pins": {n: p["version"] for n, p in pins.items()},
        }
        br._publish(-1, new_pins, "branch", extra={"upstream": upstream})
        # the fork point also lives in an IMMUTABLE sidecar: the v0
        # manifest ages out of the branch's own vacuum retention, but
        # merge needs the upstream pins for as long as the branch
        # exists (the tag-file discipline — survives vacuum by not
        # being a manifest)
        (br.root / "upstream.json").write_text(json.dumps(upstream))
        # register the fork in MAIN's dir for discoverability
        # (branches(), CLI listing, delete_branch) — pure metadata, a
        # branch whose registration file is lost still merges fine
        reg = self.root / f"branch-{uuid.uuid4().hex[:12]}.json"
        reg.write_text(json.dumps({
            "dest": os.path.relpath(tree, self.root.parent),
            "forked_at_catalog_version": v,
            "ts": time.time(),
        }))
        return br

    def branches(self) -> list[dict]:
        """Registered branches of this catalog: dest path (resolved),
        fork point, whether the branch tree still exists, and its
        current head if readable. O(#branches) JSON reads."""
        out = []
        for p in sorted(self.root.glob("branch-*.json")):
            body = json.loads(p.read_text())
            dest = self._resolve(body["dest"])
            alive = (dest / "catalog").is_dir()
            head = None
            if alive:
                try:
                    head = CatalogLog(str(dest / "catalog")).latest_version()
                except Exception:
                    alive = False
            out.append({
                "dest": str(dest),
                "forked_at_catalog_version":
                    body["forked_at_catalog_version"],
                "alive": alive,
                "head": head,
                "registration": p.name,
            })
        return out

    def delete_branch(self, dest: str) -> dict:
        """Delete a branch TREE and retire its registration. Safe by
        construction: branch data files are hard links, so removing
        the branch's directory entries never touches main's bytes (the
        shared inodes survive until main's own links drop). Refuses a
        path that is not a registered branch of THIS catalog — this
        method never becomes a generic rm -rf."""
        target = Path(dest).resolve()
        reg_hit = None
        for p in self.root.glob("branch-*.json"):
            body = json.loads(p.read_text())
            if self._resolve(body["dest"]).resolve() == target:
                reg_hit = p
                break
        if reg_hit is None:
            raise ValueError(
                f"{dest} is not a registered branch of {self.root}"
            )
        existed = target.exists()
        if existed:
            up = target / "catalog" / "upstream.json"
            if not up.exists():
                raise ValueError(
                    f"{target} does not look like a branch tree (no "
                    "catalog/upstream.json); refusing to delete"
                )
            shutil.rmtree(target)
        reg_hit.unlink()
        return {"deleted": str(target), "existed": existed}

    def merge_branch(self, branch: "CatalogLog") -> dict:
        """Merge a branch back: SNAPSHOT CHERRY-PICK per the design
        note — for every table the branch changed, the branch head's
        file list is hard-linked into the main table dir and adopted
        as one transactional commit, and ONE atomic catalog commit
        publishes all merged tables together (the full intent /
        reconcile crash protocol applies: a crash mid-merge leaves
        main readers at the old snapshot and the tagged debris
        repairable). First-committer-wins ACROSS branches, checked at
        merge time: a changed table whose main pin moved since the
        fork raises :class:`CatalogConflict` — resolution is rebase
        (re-branch from current main and re-apply), never content
        merge. Merged files arrive without their stats/bloom sidecars
        — the zone-map footer backfill covers them once, lazily.

        Table-set changes merge too (v2, lifting the design note's v1
        refusal): a table CREATED on the branch is zero-copy cloned
        beside the catalog and its pin ADDED in the same atomic
        catalog commit (conflict if main registered the name since
        the fork; a crashed merge's staged clone is reused iff its
        content matches the branch head, else refused loudly); a
        table DROPPED on the branch has its main pin removed in that
        commit, first-committer-checked so a table main kept writing
        is never silently dropped (rebase instead). The adds/drops
        ride the transaction's intent, so the crash protocol covers
        them the same as content moves."""
        import shutil

        up_path = branch.root / "upstream.json"
        if not up_path.exists():
            raise ValueError(
                f"{branch.root} was not created by branch() — no "
                "upstream fork point recorded"
            )
        up = json.loads(up_path.read_text())
        up_pins = {n: int(x) for n, x in up["pins"].items()}
        bv, bpins = branch.snapshot()
        added_names = sorted(set(bpins) - set(up_pins))
        dropped_names = sorted(set(up_pins) - set(bpins))
        changed = {n: v for n, v in bpins.items()
                   if n in up_pins and v > 0}
        if not (changed or added_names or dropped_names):
            return {"merged": [], "catalog_version": self.latest_version()}
        txn = self.begin()
        try:
            for name, bver in sorted(changed.items()):
                if name not in txn.pins:
                    raise CatalogConflict(
                        f"table {name!r} was dropped from main since "
                        "the fork"
                    )
                if txn.pins[name] != up_pins[name]:
                    # 'moved' means CONTENT moved: a reconcile rollback
                    # (crashed earlier merge) advances the pin while
                    # restoring the fork content bit-for-bit — that
                    # must not force a rebase. If the fork manifest was
                    # vacuumed on main we can no longer prove equality
                    # and conflict loudly.
                    try:
                        mlog = self.table_log(name)
                        _, fork_files = mlog.snapshot(up_pins[name])
                        _, cur_files = mlog.snapshot(txn.pins[name])
                        # content identity = same file set AND same
                        # deletion-vector block (a MOR delete moves
                        # content without moving a single file)
                        unmoved = (
                            set(fork_files) == set(cur_files)
                            and mlog._dv_of(up_pins[name])
                            == mlog._dv_of(txn.pins[name])
                        )
                    except Exception:
                        unmoved = False
                    if not unmoved:
                        raise CatalogConflict(
                            f"table {name!r} moved on main "
                            f"(v{up_pins[name]} -> v{txn.pins[name]}) "
                            "since the fork: rebase the branch "
                            "(re-branch and re-apply)"
                        )
                t = txn.table(name)
                blog = branch.table_log(name)
                _, bfiles = blog.snapshot(bver)
                with open(blog.root / "_commits" /
                          f"v{bver:012d}.json") as f:
                    bman = json.load(f)
                bdv = bman.get("dv") or {}
                for rel in list(bfiles) + list(bdv.get("files", [])):
                    dst = t.log.root / rel
                    if dst.exists():
                        continue  # fork-era file: same inode already
                    dst.parent.mkdir(parents=True, exist_ok=True)
                    try:
                        os.link(blog.root / rel, dst)
                    except OSError:
                        shutil.copy2(blog.root / rel, dst)
                t.adopt(bfiles, schema=bman.get("schema"),
                        layout=bman.get("layout"),
                        dv=bman.get("dv"),
                        # the branch's constraint set merges with its
                        # content ({} reflects a drop-on-branch; the
                        # adopted snapshot replaces main's rows, so
                        # carrying its constraints is content-safe)
                        constraints=bman.get("constraints") or {})
            for name in added_names:
                if name in txn.pins:
                    raise CatalogConflict(
                        f"table {name!r} was created on the branch but "
                        "main registered the same name since the fork: "
                        "rebase the branch"
                    )
                blog = branch.table_log(name)
                bver = bpins[name]
                dest = self.root.parent / name
                if (dest / "_commits").exists():
                    # a crashed earlier merge staged the clone: reuse
                    # iff content is the branch head bit-for-bit,
                    # refuse loudly otherwise (never adopt unknown
                    # state into the catalog)
                    dlog = TableLog(str(dest))
                    _, dfiles = dlog.snapshot()
                    _, bfiles = blog.snapshot(bver)
                    if (set(dfiles) != set(bfiles)
                            or dlog._dv_of() != blog._dv_of(bver)):
                        raise CatalogConflict(
                            f"merge destination {dest} already holds a "
                            "table whose content is not the branch "
                            "head; move it aside before merging"
                        )
                elif dest.exists() and any(dest.iterdir()):
                    raise CatalogConflict(
                        f"merge destination {dest} is not empty and "
                        "not a table; move it aside before merging"
                    )
                else:
                    blog.clone(str(dest), version=bver)
                txn.add_table(name, TableLog(str(dest)))
            for name in dropped_names:
                if name not in txn.pins:
                    continue  # main already dropped it: nothing to do
                if txn.pins[name] != up_pins[name]:
                    # same content-identity grace as the update path:
                    # only a REAL content move blocks the drop
                    try:
                        mlog = self.table_log(name)
                        _, fork_files = mlog.snapshot(up_pins[name])
                        _, cur_files = mlog.snapshot(txn.pins[name])
                        unmoved = (
                            set(fork_files) == set(cur_files)
                            and mlog._dv_of(up_pins[name])
                            == mlog._dv_of(txn.pins[name])
                        )
                    except Exception:
                        unmoved = False
                    if not unmoved:
                        raise CatalogConflict(
                            f"table {name!r} was dropped on the branch "
                            f"but moved on main (v{up_pins[name]} -> "
                            f"v{txn.pins[name]}) since the fork: "
                            "rebase the branch"
                        )
                txn.drop_table(name)
        except Exception:
            # abandoned merge txn: retire its start marker; any table
            # commits already made are tagged debris for reconcile()
            self._start_path(txn.txn_id).unlink(missing_ok=True)
            raise
        cv = self.commit(txn)
        return {"merged": sorted(changed), "added": added_names,
                "dropped": dropped_names, "catalog_version": cv}

    def vacuum(
        self, keep_versions: int = 2, min_age_seconds: float = 600.0
    ) -> dict:
        """Catalog-aware retention — the ONLY safe way to vacuum tables
        under a catalog: a direct ``TableLog.vacuum`` counts manifests
        from the table's own head and can silently drop a version an
        OLDER CATALOG SNAPSHOT still pins, breaking multi-table time
        travel. This composition drops catalog manifests beyond the
        newest ``keep_versions``, then vacuums each table keeping
        every version at or above the MINIMUM pin across the
        SURVIVING catalog manifests — so every readable catalog
        snapshot keeps every table version it references. TAGGED
        snapshots survive regardless of age (the point of a tag), and
        their pins join the floor computation. In-flight transactions
        are safe: their table commits are newer than any pin (always
        kept), and ``min_age_seconds`` guards staged files exactly as
        in ``TableLog.vacuum``.

        Two hardening rules close the reconcile interaction:

        * vacuum REFUSES while any ``intent-*.json`` exists — an
          intent's txn may have a catalog commit (crash after publish,
          before cleanup) that vacuum would drop, after which
          ``reconcile`` could no longer prove the txn committed. Run
          :meth:`reconcile` first; it clears every intent it sees.
        * per-table floors are passed to ``TableLog.vacuum`` as a
          VERSION NUMBER (``keep_from_version``), not a count — a
          table commit landing between the floor computation and the
          table vacuum shifts a count window off the floor-pinned
          manifest, silently breaking a surviving catalog snapshot."""
        vs = self.versions()
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        intents = sorted(p.name for p in self.root.glob("intent-*.json"))
        if intents:
            raise ValueError(
                f"catalog {self.root} has unreconciled transaction "
                f"intents {intents}: run reconcile() before vacuum() — "
                "vacuum could drop the catalog commit that proves an "
                "intent's transaction already published"
            )
        keep = sorted(set(vs[-keep_versions:]) | set(self.tags().values()))
        dropped = 0
        for v in vs:
            if v not in keep:
                _cat_manifest(self.root, v).unlink()
                dropped += 1
        floors: dict[str, int] = {}
        paths: dict[str, str] = {}
        for v in keep:
            for name, p in self._read_manifest(v)["pins"].items():
                floors[name] = min(
                    floors.get(name, p["version"]), p["version"]
                )
                paths[name] = p["path"]
        report: dict = {
            "dropped_catalog_manifests": dropped,
            "tables": {},
        }
        for name, floor in floors.items():
            log = TableLog(str(self._resolve(paths[name])))
            report["tables"][name] = log.vacuum(
                keep_versions=1,
                keep_from_version=floor,
                min_age_seconds=min_age_seconds,
            )
        return report

    # -- crash repair --------------------------------------------------

    def _txn_committed(self, txn_id: str) -> bool:
        for v in self.versions():
            if self._read_manifest(v).get("txn") == txn_id:
                return True
        return False

    def _dangling_tagged(self, name: str, pin: int) -> dict[str, int]:
        """txn_id -> newest version, for table versions ABOVE the pin
        whose op carries a txn tag (crash debris of some transaction)."""
        log = self.table_log(name)
        out: dict[str, int] = {}
        for v in log.versions():
            if v <= pin:
                continue
            op = log.last_op(version=v) or ""
            if "@txn-" in op:
                out[op.split("@txn-", 1)[1]] = v
        return out

    def reconcile(self, min_age_seconds: float = 600.0) -> dict:
        """Repair crash debris, deterministically (metadata-only — no
        Spark job: rollback and re-pin are manifest writes):

        * an intent whose txn already has a catalog commit → delete the
          intent (crash after publish, before cleanup);
        * an intent whose update versions are already AT OR BEHIND the
          head pins → the commit published but its catalog manifest is
          no longer findable (vacuumed), or ``sync_table`` adopted the
          txn's table versions after the crash — either way the
          effects are visible and a roll-forward could only regress or
          conflict: clear the intent, report it ``superseded``;
        * an intent without a catalog commit → ROLL FORWARD: the table
          commits it records all exist (TxnTable commits before the
          intent is ever written), so publish the catalog commit the
          crashed process was about to write. If the base pins moved
          out-of-band since the crash the replay raises
          :class:`CatalogConflict` — DEGRADE instead of wedging:
          clear the intent, report it ``unrepairable``, and let the
          rollback scan below treat its table versions as ordinary
          debris, so one stuck intent never blocks repair of the rest;
        * tagged table versions above the pin with NO intent → ROLL
          BACK: the transaction died mid-write and its full update set
          is unknowable; restore the pinned content on top of the
          orphan (``TableLog.rollback`` — versions are immutable, so
          this is a new commit, not history rewriting) and RE-PIN the
          table at the restoring version via a ``reconcile`` catalog
          commit, unwedging strict-serialized future transactions.
          A LIVE transaction also has tagged versions and no intent —
          ``begin()``'s start marker distinguishes it: debris whose
          marker is younger than ``min_age_seconds`` is SKIPPED
          (reported ``skipped_live``), so a maintenance-cadence
          reconcile never rolls back an in-flight writer. Set
          ``min_age_seconds`` above the longest expected transaction;
          pass an explicit 0 only when no writer can be in flight.

        Idempotent and TERMINATING: a second call finds nothing to
        repair, and no input state makes it raise out of the loop."""
        report: dict = {"rolled_forward": [], "rolled_back": [],
                        "cleared_intents": [], "superseded_intents": [],
                        "unrepairable_intents": [], "skipped_live": [],
                        "cleared_markers": []}

        def _retire(txn_id: str, p: Path) -> None:
            p.unlink(missing_ok=True)
            self._start_path(txn_id).unlink(missing_ok=True)

        for p in sorted(self.root.glob("intent-*.json")):
            intent = json.loads(p.read_text())
            txn_id = intent["txn"]
            updates = {n: int(v) for n, v in intent["updates"].items()}
            adds = intent.get("adds") or {}
            drops = intent.get("drops") or []
            if self._txn_committed(txn_id):
                _retire(txn_id, p)
                report["cleared_intents"].append(txn_id)
                continue
            _, head_pins = self.snapshot()
            if (
                all(head_pins.get(n, -1) >= v for n, v in updates.items())
                and all(n in head_pins for n in adds)
                and all(n not in head_pins for n in drops)
                # a pure table-set intent with nothing at head to show
                # for it is NOT superseded (all() over empties is True)
                and (updates or adds or drops)
            ):
                _retire(txn_id, p)
                report["superseded_intents"].append(txn_id)
                continue
            try:
                self._commit_pins(
                    txn_id,
                    {n: int(v) for n, v in intent["base_pins"].items()},
                    updates,
                    adds=adds,
                    drops=drops,
                )
            except CatalogConflict as e:
                _retire(txn_id, p)
                report["unrepairable_intents"].append(
                    {"txn": txn_id, "reason": str(e)}
                )
                continue
            _retire(txn_id, p)
            report["rolled_forward"].append(txn_id)
        head = self.latest_version()
        _, pins = self.snapshot(head)
        repins: dict[str, int] = {}
        for name, pin in pins.items():
            dangling = {
                t: v
                for t, v in self._dangling_tagged(name, pin).items()
                if not self._txn_committed(t)  # pinned txn: not debris
            }
            if not dangling:
                continue
            live = sorted(
                t for t in dangling
                if (a := self._start_age(t)) is not None
                and a < min_age_seconds
            )
            if live:
                # ANY live txn on the table blocks the restore — a
                # rollback here would clobber its committed versions
                # and doom its commit() to CatalogConflict
                report["skipped_live"].append(
                    {"table": name, "txns": live}
                )
                continue
            log = self.table_log(name)
            res = log.rollback(to_version=pin)
            repins[name] = res["version"]
            for t in sorted(dangling):
                self._start_path(t).unlink(missing_ok=True)
            report["rolled_back"].append(
                {"txns": sorted(dangling), "table": name,
                 "restored_as": res["version"]}
            )
        if repins:
            m = self._read_manifest(self.latest_version())
            new_pins = {n: dict(p) for n, p in m["pins"].items()}
            for name, nv in repins.items():
                new_pins[name]["version"] = nv
            self._publish(self.latest_version(), new_pins, "reconcile")
        # retire stale start markers that left no debris at all (a txn
        # that began, wrote nothing, and was abandoned)
        for p in sorted(self.root.glob("start-*.json")):
            txn_id = p.name[len("start-"):-len(".json")]
            age = self._start_age(txn_id)
            if age is not None and age >= min_age_seconds:
                p.unlink(missing_ok=True)
                report["cleared_markers"].append(txn_id)
        return report
