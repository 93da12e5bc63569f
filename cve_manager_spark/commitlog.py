"""Commit-log protocol: snapshot isolation + writer-conflict detection
for the parquet lake tables.

The plain COW ops in :mod:`cve_manager_spark.maintenance` are
single-writer: their multi-file swap (move new part files in, unlink the
originals) has a documented non-atomic window, and two concurrent
maintenance jobs — or a streaming MERGE racing a batch compaction — can
interleave into a mixed layout. That window is exactly what a table
format's transaction log exists to close (the role Delta's ``_delta_log``
/ Iceberg's metadata tree play at 100 TB). This module is the minimal
single-node analogue:

- **Data files are immutable.** A committed table's directory only ever
  GAINS part files; nothing is unlinked by a writer. "Delete" and
  "replace" are manifest operations.
- **A manifest is the table.** ``_commits/v{N:012d}.json`` lists the
  relative paths of every live data file at version N. Readers resolve
  the latest manifest once and scan exactly those files — an in-flight
  writer's new files are invisible (no manifest references them yet) and
  a concurrent commit cannot yank files out from under a running scan
  (they stay on disk until ``vacuum``). That is snapshot isolation.
- **Publish is atomic and exclusive.** A writer stages the manifest to a
  hidden tmp file, then ``os.link``\\ s it to ``v{parent+1}.json`` —
  hard-linking a fully-written file is atomic, and it FAILS with
  ``EEXIST`` if another writer already claimed that version. The loser
  gets :class:`CommitConflict`, removes the data files it staged, and
  retries against the new snapshot (optimistic concurrency, the
  put-if-absent primitive; on S3 the same protocol rides
  ``If-None-Match: *``, on HDFS an exclusive create).
- **Crash safety.** A writer dying before its commit leaves orphan data
  files referenced by no manifest — invisible to every reader, reclaimed
  by ``vacuum``. A writer dying after the link has fully committed.
  There is no window in which readers observe a half-applied operation.

The reference has no analogue (its warehouse is Postgres, where MVCC is
the database's job — cve_manager.py:344-384); this is the piece a
parquet lake needs once two writers exist.

Committed tables must be read through :meth:`TableLog.read` (or any
reader that resolves the manifest) — a naive ``spark.read.parquet(dir)``
would see superseded files too, same as reading a Delta table's
directory without the log.
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
from pyspark.sql import types as T

from cve_manager_spark.maintenance import (
    _count_tmp,
    _local_path,
    _partition_cols,
    plan_target_files,
)

_LOG_DIR = "_commits"
_DV_DIR = "_deletes"

# sentinel for _publish: "carry the parent manifest's deletion-vector
# block forward unchanged" — the fail-safe default, so a publish path
# that never thinks about DVs (append, set-partitioning, schema
# evolution) cannot silently resurrect deleted rows by dropping the
# block. Ops that rewrite or replace data files pass an explicit value.
_DV_INHERIT = object()

# a deletion-vector relation at or below this many rows is broadcast
# into the anti-join (driver knows the exact count from the manifest's
# counts map — no size estimation involved)
_DV_BROADCAST_ROWS = 4_000_000


class CommitConflict(Exception):
    """Another writer committed the version this writer was building
    against. The losing operation has already cleaned up its staged
    files; re-run it against the fresh snapshot to retry."""


def _manifest_path(table: Path, version: int) -> Path:
    return table / _LOG_DIR / f"v{version:012d}.json"


def _latest_hint_path(table: Path) -> Path:
    return table / _LOG_DIR / "_latest"


def _read_latest_hint(table: Path) -> int | None:
    """Best-effort latest-version pointer, or None (missing/corrupt).
    Purely a HINT: resolution always verifies the pointed manifest
    exists and probes forward past it (see TableLog.latest_version)."""
    try:
        return int(_latest_hint_path(table).read_text())
    except (OSError, ValueError):
        return None


def _advance_latest_hint(table: Path, version: int) -> None:
    """Monotonically advance the pointer (atomic replace, best-effort:
    a crash or lost race here only costs the next reader a short
    forward probe, never correctness)."""
    cur = _read_latest_hint(table)
    if cur is not None and cur >= version:
        return
    tmp = table / _LOG_DIR / f".latest-tmp-{uuid.uuid4().hex[:8]}"
    try:
        tmp.write_text(str(version))
        os.replace(tmp, _latest_hint_path(table))
    except OSError:
        tmp.unlink(missing_ok=True)


def _schema_json(df: DataFrame) -> str:
    """Table schema as manifest-recorded JSON, nullability normalized to
    True: parquet scans are nullable-on-read anyway, and an evolved
    column is NULL in every pre-evolution file, so recording a
    non-nullable field (e.g. from a lit() expression) would promise
    something old files cannot keep."""
    from pyspark.sql.types import StructField, StructType

    return StructType(
        [StructField(f.name, f.dataType, True) for f in df.schema.fields]
    ).json()


def _union_schema_json(ours: str, theirs: "str | None") -> str:
    """Field-union of two manifest schema JSONs (ours first, then fields
    only theirs carries). Used by append's blind-retry path: the commit
    that beat us may have performed an additive evolution, and
    re-publishing the schema computed before the conflict would record
    the narrower pre-evolution schema — hiding the concurrently added
    column from every later reader (``read`` applies the manifest schema
    explicitly). A type clash on a shared field is a real fork and
    raises instead of silently picking a side."""
    from pyspark.sql.types import StructType

    if theirs is None or not theirs.lstrip().startswith("{"):
        return ours
    a = StructType.fromJson(json.loads(ours))
    b = StructType.fromJson(json.loads(theirs))
    ours_by_name = {f.name: f for f in a.fields}
    for f in b.fields:
        mine = ours_by_name.get(f.name)
        if mine is not None and mine.dataType != f.dataType:
            raise CommitConflict(
                f"retry would fork schema: column {f.name!r} is "
                f"{mine.dataType.simpleString()} here but "
                f"{f.dataType.simpleString()} in the interleaved commit"
            )
    extra = [f for f in b.fields if f.name not in ours_by_name]
    return StructType(list(a.fields) + extra).json()


def _path_layout(rel: str) -> tuple[str, ...]:
    """Partition columns a file's own PATH declares: the ``key=value``
    directory segments above it, in order. Files are immutable, so the
    layout they were staged under is frozen into their path forever —
    which makes every file self-describing and lets a reader compose a
    manifest that MIXES layouts (partition evolution) without per-file
    metadata."""
    parts = rel.replace("\\", "/").split("/")[:-1]
    return tuple(
        p.split("=", 1)[0] for p in parts if "=" in p
    )


def _fresh_stem(op: str) -> str:
    return f"part-{op}-{uuid.uuid4().hex[:12]}"


class TableLog:
    """Handle on a commit-logged parquet table rooted at ``path``."""

    def __init__(self, path: str):
        # resolve(): delete_where/merge_upsert map input_file_name()'s
        # absolute file:// URIs back to manifest-relative paths via
        # Path.relative_to(self.root) — with a relative root that raises
        # ValueError mid-operation, so normalize once at construction
        self.root = Path(path).resolve()

    # -- log bootstrap / inspection ------------------------------------

    def init(self) -> int:
        """Adopt an existing parquet dir: write v0 listing its current
        part files. Refuses if a log already exists (re-initialising
        would fork history)."""
        log_dir = self.root / _LOG_DIR
        if log_dir.exists() and any(log_dir.glob("v*.json")):
            raise ValueError(f"commit log already exists under {self.root}")
        log_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(
            str(p.relative_to(self.root)) for p in self.root.rglob("*.parquet")
        )
        self._publish(
            parent=-1, files=files, op="init",
            layout=_partition_cols_logged(self.root),
        )
        return 0

    def versions(self) -> list[int]:
        """Full manifest listing — O(retained versions). Maintenance
        and history surfaces (rollback bounds, vacuum, error messages)
        use this; the per-read hot path goes through
        :meth:`latest_version` instead, which is O(1) once the pointer
        is warm (VERDICT r10: a daily-merge table must not pay an
        all-versions directory listing on every read forever)."""
        log_dir = self.root / _LOG_DIR
        if not log_dir.exists():
            return []
        return sorted(int(p.stem[1:]) for p in log_dir.glob("v*.json"))

    def latest_version(self) -> int | None:
        """The newest committed version WITHOUT listing the log dir:
        read the ``_latest`` pointer, verify its manifest exists, then
        probe forward past any commits that beat their pointer update
        (the pointer is advanced after the atomic manifest link, so it
        can lag but never lead a real commit). Falls back to the full
        listing when the pointer is missing (pre-pointer tables,
        init-only logs) or stale-beyond-vacuum. There is no separate
        checkpoint file because every manifest is already
        self-contained (full file list + schema) — Delta needs
        checkpoints to fold incremental actions; here the pointer alone
        restores O(1) resolution."""
        hint = _read_latest_hint(self.root)
        if hint is not None and _manifest_path(self.root, hint).exists():
            v = hint
            while _manifest_path(self.root, v + 1).exists():
                v += 1
            if v > hint:
                _advance_latest_hint(self.root, v)
            return v
        vs = self.versions()
        if not vs:
            return None
        _advance_latest_hint(self.root, vs[-1])
        return vs[-1]

    def last_op(self, version: int | None = None) -> str | None:
        """The op string recorded in the latest (or a pinned) manifest —
        None for an un-initialized table. Writers that must apply a
        multi-log operation exactly once tag their appends (see
        :meth:`append`) and consult this on replay: a log whose newest
        commit already carries the tag is skipped, which closes the
        crash window between two logs' commits."""
        if self.latest_version() is None:
            return None
        v, _ = self.snapshot(version)
        with open(_manifest_path(self.root, v)) as f:
            return json.load(f).get("op")

    def snapshot(self, version: int | None = None) -> tuple[int, list[str]]:
        """(version, relative file list) of the latest — or a pinned —
        manifest. Reading a pinned version is time travel; it stays
        valid until ``vacuum`` drops that manifest. Resolution is O(1):
        the latest comes off the ``_latest`` pointer, a pinned version
        is one manifest existence check — no directory listing on the
        read path (the listing only runs to build an error message)."""
        if version is None:
            v = self.latest_version()
            if v is None:
                raise ValueError(
                    f"no commit log under {self.root} (run init())"
                )
        else:
            v = version
            if not _manifest_path(self.root, v).exists():
                vs = self.versions()
                if not vs:
                    raise ValueError(
                        f"no commit log under {self.root} (run init())"
                    )
                raise ValueError(
                    f"version {v} not in log (have {vs[0]}..{vs[-1]})"
                )
        with open(_manifest_path(self.root, v)) as f:
            m = json.load(f)
        return v, list(m["files"])

    def commit_ts_of(self, version: int) -> float:
        """Wall-clock commit time of a version: the manifest's ``ts``
        (recorded at publish), falling back to the manifest FILE's
        mtime for manifests that predate timestamp recording — the
        hard link is created at commit, so its mtime IS the commit
        time, just at filesystem precision."""
        p = _manifest_path(self.root, version)
        with open(p) as f:
            ts = json.load(f).get("ts")
        return float(ts) if ts is not None else p.stat().st_mtime

    def version_at(self, ts: float) -> int:
        """The newest version committed AT OR BEFORE wall-clock ``ts``
        — Delta/Iceberg's ``AS OF TIMESTAMP`` resolution. Commit
        timestamps are monotone in version by construction (versions
        publish serially through the exclusive link), so this is a
        predecessor lookup over the retained manifests; a timestamp
        older than the oldest retained commit raises (that history is
        vacuumed — same loud contract as reading a dropped version).
        O(#retained versions) driver-side JSON reads, no Spark job."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"no commit log under {self.root}")
        best = None
        for v in vs:
            if self.commit_ts_of(v) <= ts:
                best = v
            else:
                break
        if best is None:
            raise ValueError(
                f"timestamp {ts} precedes the oldest retained commit "
                f"of {self.root} (v{vs[0]} at {self.commit_ts_of(vs[0])})"
            )
        return best

    def schema_of(self, version: int | None = None):
        """The table schema recorded in a manifest (``StructType``), or
        None for manifests that predate schema recording (init-adopted
        tables before their first committed write). With schema
        evolution, the schema is versioned WITH the data: time travel
        returns both as of that version."""
        from pyspark.sql.types import StructType

        v, _ = self.snapshot(version)
        with open(_manifest_path(self.root, v)) as f:
            s = json.load(f).get("schema")
        if s is None:
            return None
        if s.lstrip().startswith("{"):
            return StructType.fromJson(json.loads(s))
        # legacy manifests recorded simpleString; only empty reads used it
        return s

    def layout_of(self, version: int | None = None) -> list[str] | None:
        """The partition layout recorded in a manifest — the layout NEW
        writes staged against that version use. ``None`` for manifests
        that predate layout recording. The manifest's FILES may span
        several historical layouts (partition evolution rewrites no
        data); each file's own layout is declared by its path."""
        v, _ = self.snapshot(version)
        with open(_manifest_path(self.root, v)) as f:
            return json.load(f).get("layout")

    def _pcols(self, version: int | None = None) -> list[str]:
        """Write layout for a COW op pinned at ``version``: the
        manifest-recorded layout, falling back to the directory walker
        for legacy manifests (which predate evolution and therefore
        have one uniform layout the walker can recover)."""
        lay = self.layout_of(version)
        return lay if lay is not None else _partition_cols_logged(self.root)

    def set_partitioning(
        self, spark: SparkSession, pcols: list[str]
    ) -> dict:
        """Evolve the table's partition layout — a METADATA-ONLY commit
        (Iceberg-style partition evolution): the manifest republishes
        the same file list with the new layout recorded; zero data
        bytes move. New writes stage into the new layout; readers
        compose the mixed layouts per-file (each file's path declares
        its own); ``compact()`` migrates everything to the current
        layout when uniformity is worth the rewrite. Publish races
        resolve like every commit (loser raises
        :class:`CommitConflict`)."""
        version, files = self.snapshot()
        schema = self.schema_of(version)
        if schema is not None and not isinstance(schema, str):
            known = [f.name for f in schema.fields]
        else:
            known = self.read(spark, version=version).columns
        missing = [c for c in pcols if c not in known]
        if missing:
            raise ValueError(
                f"set_partitioning: {missing} not in table columns {known}"
            )
        with open(_manifest_path(self.root, version)) as f:
            raw_schema = json.load(f).get("schema")
        v = self._publish(
            version, files, "set-partitioning",
            schema=raw_schema, layout=list(pcols),
        )
        return {"version": v, "layout": list(pcols)}

    def to_view(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        timestamp: float | None = None,
        where: dict | None = None,
    ) -> DataFrame:
        """Expose one snapshot to ``spark.sql`` as a temp view: the
        view's plan IS the manifest-resolved (and DV-applied,
        zone-map-prunable) read, so SQL users get the commit log's
        correctness without touching the API — the same reason Delta
        registers tables instead of letting users read the directory.
        The view pins the snapshot AT CREATION: later commits don't
        leak in until re-registered (re-run to follow the head).
        Returns the underlying DataFrame."""
        df = self.read(spark, version=version, timestamp=timestamp,
                       where=where)
        df.createOrReplaceTempView(name)
        return df

    def constraints_of(self, version: int | None = None) -> dict:
        """The CHECK constraints recorded at ``version`` —
        ``{name: sql_expr}`` — versioned with the data like schema and
        layout (time travel sees the constraints that held then)."""
        v, _ = self.snapshot(version)
        with open(_manifest_path(self.root, v)) as f:
            return json.load(f).get("constraints") or {}

    def set_constraint(
        self, spark: SparkSession, name: str, expr: str
    ) -> dict:
        """Add a CHECK constraint as a metadata-only commit (Delta's
        ``ALTER TABLE ADD CONSTRAINT``): the EXISTING data is validated
        first (one counting scan — a constraint that does not hold is
        refused, nothing committed), then every future committed write
        validates its NEW rows only (O(batch), never O(table)) and
        refuses the whole commit on any violation. SQL CHECK
        semantics: a row violates only when the expression is FALSE —
        NULL/unknown passes, so ``col IS NOT NULL`` is how NOT NULL is
        spelled."""
        version, files = self.snapshot()
        cons = dict(self.constraints_of(version))
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists on {self.root} "
                f"({cons[name]!r}); drop it first"
            )
        n_bad = (
            self.read(spark, version=version)
            .where(F.expr(expr).eqNullSafe(F.lit(False)))
            .count()
        ) if files else 0
        if n_bad:
            raise ValueError(
                f"constraint {name!r} ({expr!r}) does not hold on "
                f"{self.root}: {n_bad} existing rows violate it; "
                "nothing committed"
            )
        cons[name] = expr
        with open(_manifest_path(self.root, version)) as f:
            raw_schema = json.load(f).get("schema")
        v = self._publish(
            version, files, f"set-constraint@{name}",
            schema=raw_schema, constraints=cons,
        )
        return {"version": v, "constraints": cons}

    def drop_constraint(self, name: str) -> dict:
        """Remove a CHECK constraint (metadata-only commit). Older
        versions keep it — constraints are versioned with the data."""
        version, files = self.snapshot()
        cons = dict(self.constraints_of(version))
        if name not in cons:
            raise KeyError(
                f"constraint {name!r} not set on {self.root}"
            )
        del cons[name]
        with open(_manifest_path(self.root, version)) as f:
            raw_schema = json.load(f).get("schema")
        v = self._publish(
            version, files, f"drop-constraint@{name}",
            schema=raw_schema,
            # explicit {} clears; None would inherit the dropped set
            constraints=cons if cons else {},
        )
        return {"version": v, "constraints": cons}

    def _enforce_constraints(
        self, rows: DataFrame, version: int, what: str
    ) -> None:
        """Refuse a write whose NEW rows violate any recorded CHECK
        constraint — called by every committed op that introduces rows
        (append/overwrite/merge/update images), BEFORE staging, so a
        refused batch costs one counting aggregate and writes nothing.
        Existing data was validated when the constraint was set;
        deletes cannot create violations."""
        cons = self.constraints_of(version)
        if not cons:
            return
        checks = [
            F.sum(
                F.when(F.expr(e).eqNullSafe(F.lit(False)), 1).otherwise(0)
            ).alias(n)
            for n, e in sorted(cons.items())
        ]
        bad = rows.agg(*checks).first()
        viol = {n: bad[n] for n in sorted(cons) if (bad[n] or 0) > 0}
        if viol:
            raise ValueError(
                f"{what} on {self.root} violates CHECK constraints "
                f"{viol} (violating-row counts); nothing committed"
            )

    def enable_bloom(
        self, column: str, bits: int = 131072, k: int = 5
    ) -> dict:
        """Enable POINT-LOOKUP data skipping on ``column``: every
        committed write from now on records a per-file bloom sidecar
        (see :class:`_BloomIndex`), and EQUALITY bounds —
        ``read(where={column: (v, v)})``, ``read_pruned(lo=v, hi=v)``,
        ``changes(where=...)`` — prune files the bloom proves empty of
        ``v``, after the zone-map pass. This is the skipping index for
        the case range stats can't touch: a digest / id column whose
        per-file [min, max] spans the whole domain. String and
        integral columns only (their Spark string cast is bit-exact
        with Python ``str()``, so a false negative is impossible);
        files written BEFORE enablement have no sidecar and are always
        kept — rewrite via ``compact()`` to backfill. Maintenance
        setting, not versioned table state: like the stats cache it
        lives in ``_commits`` and affects scan cost only, never
        results. Size ``bits`` ≈ 10 × rows-per-file for ~1% false
        positives at k=5 (a false positive reads one extra file)."""
        return _BloomIndex(self).enable(column, bits=bits, k=k)

    def row_count(self, version: int | None = None) -> int:
        """EXACT row count of a snapshot from metadata alone — no
        Spark job, no data pages: per-file counts are recorded into
        the stats sidecar at write time (``_stage``) and summed
        driver-side; init-adopted files backfill once from footers
        through the thread pool (files are immutable, counts never
        invalidate). The Delta ``numRecords`` discipline: COUNT(*) on
        a 100 TB table is O(#files) sidecar lookups, and
        ``catalog-status``-style monitoring never touches data."""
        v, files = self.snapshot(version)
        if not files:
            return 0
        total = sum(_ZoneMaps(self).rows_for(files).values())
        # merge-on-read deletes subtract from the manifest's counts
        # map — still zero data reads (counts keys are maintained to
        # be exactly the live files with live deletes)
        return total - sum(self._dv_of(v).get("counts", {}).values())

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: dict[str, tuple] | None = None,
        timestamp: float | None = None,
    ) -> DataFrame:
        """Scan exactly the manifest's files. ``basePath`` pins the table
        root so hive partition-directory columns survive the explicit
        file list; an empty manifest reads as an empty relation via the
        schema recorded at commit time. When the manifest records a
        schema (every committed write since schema evolution landed),
        the scan applies it explicitly: files written BEFORE an additive
        evolution lack the new columns and project NULL for them — the
        Delta/Iceberg add-column semantics, no rewrite of old files.

        ``where`` — optional ``{column: (lo, hi)}`` range bounds (either
        bound may be None for open intervals). When supplied, the read
        consults the table's zone maps AUTOMATICALLY: files whose
        committed per-file [min, max] cannot intersect the bounds are
        never scanned (stats recorded at write time by ``_stage``; a
        stat-less file is kept), and the bounds are still applied as a
        real filter on the result — pruning is an optimization, never
        the filter. Equivalent to :func:`read_pruned` without the
        report.

        ``timestamp``: wall-clock ``AS OF TIMESTAMP`` time travel —
        resolved to a version via :meth:`version_at` (mutually
        exclusive with ``version``)."""
        if timestamp is not None:
            if version is not None:
                raise ValueError(
                    "read: pass version or timestamp, not both"
                )
            version = self.version_at(timestamp)
        if where:
            df, _ = _prune_snapshot(self, spark, where, version)
            return df
        v, files = self.snapshot(version)
        schema = self.schema_of(v)
        if not files:
            if schema is None:
                raise ValueError(f"v{v} is empty and carries no schema")
            return spark.createDataFrame([], schema)
        return self._read_files(
            spark, files, schema, dv=self._dv_of(v) or None
        )

    def _dv_of(self, version: int | None = None) -> dict:
        """The manifest's deletion-vector block at ``version`` —
        ``{"files": [dv_rel...], "counts": {data_rel: n}}`` — or ``{}``
        for a snapshot with no live merge-on-read deletes. The counts
        map's keys are exactly the CURRENT manifest's data files that
        have live deletes (ops that replace a data file drop its
        entry), so ``sum(counts.values())`` is the live deleted-row
        count with zero data reads."""
        v, _ = self.snapshot(version)
        with open(_manifest_path(self.root, v)) as f:
            return json.load(f).get("dv") or {}

    def _dv_df(self, spark: SparkSession, dv_files: list[str]) -> DataFrame:
        """Scan position-delete files into the canonical DV relation:
        ``(__dv_file string, __dv_pos long)`` — Iceberg v2's position
        delete file shape (file path + row ordinal), with the path
        stored RELATIVE to the table root so clones, branches, and
        moved tables keep their vectors valid."""
        return spark.read.parquet(
            *(str(self.root / r) for r in dv_files)
        ).select(
            F.col("__dv_file").cast("string").alias("__dv_file"),
            F.col("__dv_pos").cast("long").alias("__dv_pos"),
        )

    def _lineage_cols(self):
        """(rel-path expr, row-position expr) of the scanned file —
        parquet metadata columns resolved AT THE SCAN, so they stay
        correct through any downstream join (``input_file_name()`` does
        not: it reads task state and is undefined after a join mixes
        streams). ``row_index`` is the row's ordinal within its
        immutable file — the stable row identity position deletes key
        on."""
        prefix = str(self.root).rstrip("/") + "/"
        return (
            F.substring_index(
                F.col("_metadata.file_path"), prefix, -1
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        )

    def _read_files(self, spark: SparkSession, rel: list[str], schema,
                    dv: dict | None = None, lineage: bool = False):
        """Scan an explicit relative-file subset under the table's
        recorded schema — the affected-file re-read inside COW ops must
        see the SAME shape as the snapshot read (pre-evolution files
        lack evolved columns; without the schema the rewrite predicate
        would fail to resolve, or silently fork the layout).

        Partition evolution makes the subset potentially MIXED-layout:
        one Spark scan cannot span files whose paths declare different
        partition schemas, so files are grouped by their path-declared
        layout, each group scanned with ``basePath`` (hive groups
        recover their partition columns from directories, flat groups
        carry them in data), and the groups unioned by name. With a
        recorded schema the result is projected into schema field
        order, so every layout reads identically.

        ``dv``: a manifest deletion-vector block — rows whose
        (file, position) appear in the position-delete relation are
        ANTI-JOINED away (merge-on-read). The DV side's exact row
        count is known from the manifest's counts map, so the
        broadcast decision is driver-side arithmetic, not estimation;
        entries for files outside ``rel`` simply never match. A table
        without DVs takes the original plan untouched — no metadata
        columns, no join. ``lineage=True`` keeps ``__file``/``__pos``
        on the result (reserved names; table columns never start with
        a double underscore)."""
        groups: dict[tuple[str, ...], list[str]] = {}
        for r in rel:
            groups.setdefault(_path_layout(r), []).append(r)
        want_pos = bool(dv) or lineage

        def scan(files: list[str]) -> DataFrame:
            reader = spark.read.option("basePath", str(self.root))
            if schema is not None and not isinstance(schema, str):
                reader = reader.schema(schema)
            df = reader.parquet(*(str(self.root / r) for r in files))
            if want_pos:
                df = df.select("*", *self._lineage_cols())
            return df

        dfs = [scan(groups[lay]) for lay in sorted(groups)]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        if schema is not None and not isinstance(schema, str):
            cols = [f.name for f in schema.fields]
            if want_pos:
                cols += ["__file", "__pos"]
            df = df.select(*cols)
        if dv:
            dvdf = self._dv_df(spark, dv["files"])
            n_dv = sum(dv.get("counts", {}).values())
            if 0 < n_dv <= _DV_BROADCAST_ROWS:
                dvdf = F.broadcast(dvdf)
            df = df.join(
                dvdf,
                (df["__file"] == dvdf["__dv_file"])
                & (df["__pos"] == dvdf["__dv_pos"]),
                "left_anti",
            )
        if want_pos and not lineage:
            df = df.drop("__file", "__pos")
        return df

    # -- the commit primitive ------------------------------------------

    def _publish(
        self,
        parent: int,
        files: list[str],
        op: str,
        schema: str | None = None,
        layout: list[str] | None = None,
        dv=_DV_INHERIT,
        constraints: dict | None = None,
    ) -> int:
        """Atomically publish version ``parent+1``. Raises
        :class:`CommitConflict` if that version already exists.
        ``layout=None`` carries the PARENT's recorded layout forward
        (layout, like schema, travels with the version history);
        committed ops pass the layout they actually staged under.

        ``dv`` is the manifest's deletion-vector block
        (``{"files": [dv_rel...], "counts": {data_rel: n}}`` — see
        :meth:`delete_where_mor`). The default CARRIES the parent's
        block forward unchanged: losing the block silently resurrects
        merge-on-read-deleted rows, so inheritance is the only safe
        default. Ops that replace data files pass an explicit value
        (``None`` clears it; a dict with an empty counts map is
        normalized to cleared)."""
        version = parent + 1
        target = _manifest_path(self.root, version)
        tmp = target.parent / f".tmp-{uuid.uuid4().hex}.json"
        if (layout is None or dv is _DV_INHERIT
                or constraints is None) and parent >= 0:
            try:
                with open(_manifest_path(self.root, parent)) as f:
                    pm = json.load(f)
            except FileNotFoundError:
                pm = {}
            if layout is None:
                layout = pm.get("layout")
            if dv is _DV_INHERIT:
                dv = pm.get("dv")
            if constraints is None:
                constraints = pm.get("constraints")
        if dv is _DV_INHERIT:
            dv = None
        if dv and not dv.get("counts"):
            dv = None
        body = {
            "version": version,
            "parent": parent,
            "op": op,
            "ts": time.time(),  # commit wall clock: AS OF TIMESTAMP
            "files": sorted(files),
        }
        if schema is not None:
            body["schema"] = schema
        if layout is not None:
            body["layout"] = layout
        if dv:
            body["dv"] = {
                "files": sorted(dv["files"]),
                "counts": dict(sorted(dv["counts"].items())),
            }
        if constraints:
            # CHECK constraints travel with the version history like
            # schema and layout; {} (explicit empty, from
            # drop_constraint) clears, None inherits — mirrored above
            body["constraints"] = dict(sorted(constraints.items()))
        tmp.write_text(json.dumps(body, indent=1))
        try:
            # hard link = atomic + exclusive: EEXIST is the conflict signal
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} of {self.root} was committed by another "
                "writer; retry against the new snapshot"
            ) from None
        finally:
            tmp.unlink(missing_ok=True)
        # pointer update AFTER the atomic link: it can lag (crash here),
        # never lead; latest_version() probes past a lagging pointer
        _advance_latest_hint(self.root, version)
        return version

    # -- committed write operations ------------------------------------
    #
    # Shape shared by all three: pin a snapshot; write NEW immutable part
    # files (staged under fresh names directly in their final partition
    # dirs — safe because no manifest references them until the commit);
    # publish (old files ∖ replaced) ∪ new as parent+1. On conflict the
    # staged files are unlinked and CommitConflict propagates — the table
    # is bit-identical to before the attempt.

    def _stage(self, out: DataFrame, op: str, pcols: list[str],
               max_records: int | None = None) -> list[str]:
        """Write ``out`` into the table dir under fresh part names;
        return the new files' relative paths."""
        # uuid-unique tmp dir: two concurrent writers of the SAME op must
        # not share a staging dir (the conflict is decided at publish
        # time, not by clobbering each other's rewrite)
        tmp = self.root.with_name(
            self.root.name + f".{op}-tmp-{uuid.uuid4().hex[:8]}"
        )
        if tmp.exists():
            shutil.rmtree(tmp)
        writer = out.write
        if max_records is not None:
            writer = writer.option("maxRecordsPerFile", max_records)
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(str(tmp))
        stem = _fresh_stem(op)
        new_rel: list[str] = []
        for i, f in enumerate(sorted(tmp.rglob("*.parquet"))):
            dest_dir = self.root / f.relative_to(tmp).parent
            dest_dir.mkdir(parents=True, exist_ok=True)
            dest = dest_dir / f"{stem}-{i:05d}.snappy.parquet"
            f.rename(dest)
            new_rel.append(str(dest.relative_to(self.root)))
        shutil.rmtree(tmp)
        # zone maps at WRITE time: the writer knows exactly which files
        # it produced, so it records their per-file min/max into the
        # sidecar here — an O(files-this-commit) thread-pooled footer
        # pass over just-written files (the parquet writer already
        # computed the stats; this only copies them out of the footers)
        # — so predicate reads never pay a table-wide footer sweep.
        # Stats are an optimization: a failure here must never fail the
        # write, and a conflict-aborted stage leaves only harmless
        # orphan entries (fresh uuid stems are never reused).
        try:
            cols = _stat_columns(out.dtypes)
            if new_rel:
                zm = _ZoneMaps(self)
                if cols:
                    zm.stats_for(new_rel, cols)
                zm.rows_for(new_rel)  # exact counts, same sidecar
        except Exception:
            pass
        # bloom sidecars, same write-time discipline (see _BloomIndex):
        # only for enabled columns of bloom-safe type present in this
        # write and not hive-encoded into the path
        try:
            bl = _BloomIndex(self)
            cfg = bl.config()
            bcols = [
                c for c, t in out.dtypes
                if c in cfg and c not in pcols and t in _BLOOM_TYPES
            ]
            if bcols and new_rel:
                bl.build_for(out.sparkSession, new_rel, bcols)
        except Exception:
            pass
        return new_rel

    def _abort(self, new_rel: list[str]) -> None:
        for rel in new_rel:
            (self.root / rel).unlink(missing_ok=True)

    def _stage_dv(self, hits: DataFrame, n_rows: int) -> list[str]:
        """Write a position-delete relation (``__dv_file``,
        ``__dv_pos``) as parquet under ``_deletes/`` and return the new
        files' relative paths. Same staging discipline as ``_stage``:
        fresh uuid names, invisible until a manifest references them,
        reclaimed by vacuum if the commit never lands. File count
        scales with the DELETE size, never the table (one file per few
        million positions); no stats/bloom sidecars — DV files are
        protocol metadata, never data-scan candidates."""
        tmp = self.root.with_name(
            self.root.name + f".dv-tmp-{uuid.uuid4().hex[:8]}"
        )
        if tmp.exists():
            shutil.rmtree(tmp)
        n_files = max(1, min(32, n_rows // 2_000_000 + 1))
        hits.repartition(n_files).write.parquet(str(tmp))
        stem = _fresh_stem("dvd")
        dest_dir = self.root / _DV_DIR
        dest_dir.mkdir(parents=True, exist_ok=True)
        new_rel: list[str] = []
        for i, f in enumerate(sorted(tmp.rglob("*.parquet"))):
            dest = dest_dir / f"{stem}-{i:05d}.snappy.parquet"
            f.rename(dest)
            new_rel.append(str(dest.relative_to(self.root)))
        shutil.rmtree(tmp)
        return new_rel

    def _dv_minus(self, dv: dict, replaced: "set[str]"):
        """The deletion-vector block carried forward by an op that
        REPLACED the data files in ``replaced``: their counts entries
        drop (the rewrite materialized those deletes), the delete
        files stay while any live entry remains (stale positions for
        replaced files can never match — the file left the manifest).
        Returns ``None`` when nothing live remains, which clears the
        block and lets vacuum reclaim the delete files."""
        counts = {
            k: n for k, n in dv.get("counts", {}).items()
            if k not in replaced
        }
        if not counts:
            return None
        return {"files": list(dv["files"]), "counts": counts}

    def append(
        self,
        spark: SparkSession,
        rows: DataFrame,
        expected_version: int | None = None,
        max_retries: int = 5,
        allow_evolution: bool = False,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed blind APPEND: stage ``rows`` as fresh part files and
        publish (snapshot ∪ new) — the streaming-ingest primitive.

        Unlike delete/merge, an append derives nothing from the rows it
        read: it commutes with any concurrent commit (the Delta/Iceberg
        blind-append rule). So on :class:`CommitConflict` the staged
        files are NOT discarded — the retry re-reads the latest manifest
        and re-publishes the SAME staged files against the new parent,
        paying one tiny JSON write instead of a Spark job. Passing
        ``expected_version`` opts out of that (strict serialization:
        conflict propagates), for callers whose appended rows WERE
        derived from a snapshot read — e.g. a dedup gate that must not
        land on top of an interleaved writer it never compared against.

        ``tag`` stamps the manifest op as ``append@<tag>`` — the
        idempotency hook for writers applying one logical operation
        across SEVERAL logs: on replay they consult :meth:`last_op` and
        skip a log whose newest commit already carries their tag, so a
        crash between two logs' commits re-applies only the missing
        half.

        ``allow_evolution=True`` permits ADDITIVE schema evolution: the
        rows may carry new columns on top of every existing one (same
        types for the shared columns; dropping or retyping stays an
        error). The widened schema is recorded in the new manifest, so
        readers of this and later versions project NULL for the new
        columns in pre-evolution files — no rewrite — while readers
        pinned at or before the parent version keep the old schema
        (schema is versioned WITH the data).
        """
        version, files = self.snapshot(expected_version)
        pcols = self._pcols(version)
        df = self.read(spark, version=version)
        tab_cols, row_cols = set(df.columns), set(rows.columns)
        added = sorted(row_cols - tab_cols)
        if tab_cols - row_cols or (added and not allow_evolution):
            raise ValueError(
                f"append schema mismatch: table {sorted(df.columns)} vs "
                f"rows {sorted(rows.columns)}"
                + (
                    " (pass allow_evolution=True to add columns)"
                    if added and not (tab_cols - row_cols)
                    else ""
                )
            )
        tab_types, row_types = dict(df.dtypes), dict(rows.dtypes)
        type_clash = {
            c: (tab_types[c], row_types[c])
            for c in tab_types
            if tab_types[c] != row_types[c]
        }
        if type_clash:
            raise ValueError(
                "append schema mismatch: column types diverge "
                f"{type_clash} — a silent widen would fork the table "
                "schema across files"
            )
        n_rows = rows.count()
        if n_rows == 0:
            return {"n_appended": 0, "version": version}
        out_cols = list(df.columns) + added
        self._enforce_constraints(rows, version, "append")
        new_rel = self._stage(rows.select(*out_cols), "app", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_rows:
            self._abort(new_rel)
            raise RuntimeError(
                f"append row mismatch for {self.root}: staged {n_new} of "
                f"{n_rows} rows; nothing committed"
            )
        out_schema = _schema_json(rows.select(*out_cols))
        op = "append" if tag is None else f"append@{tag}"
        parent, base = version, files
        for attempt in range(max_retries):
            try:
                v = self._publish(
                    parent, list(base) + new_rel, op, schema=out_schema
                )
                return {"n_appended": n_rows, "version": v}
            except CommitConflict:
                if expected_version is not None or attempt == max_retries - 1:
                    self._abort(new_rel)
                    raise
                parent, base = self.snapshot()
                # a blind retry is only sound against commits the
                # append COMMUTES with; a concurrently added/changed
                # CHECK constraint is not one — these rows were
                # validated against the begin-pinned set, so blindly
                # re-publishing could land rows the new constraint
                # forbids (Delta's MetadataChangedException case)
                if self.constraints_of(parent) != self.constraints_of(
                    version
                ):
                    self._abort(new_rel)
                    raise CommitConflict(
                        f"{self.root}: CHECK constraints changed while "
                        "this append ran; re-run to validate against "
                        "the new set"
                    ) from None
                # the interleaved commit may have evolved the schema;
                # merge its recorded fields into ours so the retried
                # manifest doesn't shadow the concurrently added column
                with open(_manifest_path(self.root, parent)) as f:
                    theirs = json.load(f).get("schema")
                try:
                    out_schema = _union_schema_json(out_schema, theirs)
                except CommitConflict:
                    self._abort(new_rel)
                    raise
        raise AssertionError("unreachable")

    def overwrite(
        self,
        spark: SparkSession,
        rows: DataFrame,
        tag: str | None = None,
        expected_version: int | None = None,
    ) -> dict[str, int]:
        """Committed REPLACE-ALL (Delta's overwrite mode): stage
        ``rows`` as fresh part files under the current layout and
        publish a manifest referencing ONLY them — one atomic commit,
        so no reader ever sees an empty or half-replaced table (the
        delete-everything-then-append composition has exactly that
        window). The superseded files stay on disk for pinned readers
        until vacuum, like every COW op. ``tag`` stamps the op as
        ``overwrite@<tag>`` — the :meth:`last_op` idempotency hook the
        drift-retrain maintenance loop keys on (a rebuild that already
        landed is skipped, not repeated). ``expected_version`` pins the
        publish parent (strict serialization for transactional
        callers)."""
        version, _ = self.snapshot(expected_version)
        pcols = self._pcols(version)
        n_rows = rows.count()
        self._enforce_constraints(rows, version, "overwrite")
        new_rel = self._stage(rows, "ovw", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_rows:
            self._abort(new_rel)
            raise RuntimeError(
                f"overwrite row mismatch for {self.root}: staged {n_new} "
                f"of {n_rows} rows; nothing committed"
            )
        op = "overwrite" if tag is None else f"overwrite@{tag}"
        try:
            # full replace: any deletion vectors die with the data
            v = self._publish(
                version, new_rel, op, schema=_schema_json(rows), dv=None
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"n_rows": n_rows, "version": v}

    def rollback(self, to_version: int) -> dict[str, int]:
        """Restore the table to ``to_version`` — published as a NEW
        commit whose manifest is a copy of the old one (Delta's
        RESTORE): history moves forward, nothing is deleted, and any
        reader pinned to an intermediate version is untouched. Rewrites
        zero data bytes — data files are immutable, so restoring is one
        manifest write referencing the old files (they are still on
        disk unless vacuum dropped that manifest, in which case
        ``snapshot`` already failed loudly). Publish races resolve like
        every other commit: loser gets :class:`CommitConflict` and
        decides whether the rollback still makes sense against the new
        history — retrying blindly is wrong here, since the conflicting
        commit may BE the correction the rollback was for."""
        _, files = self.snapshot(to_version)
        latest = self.latest_version()
        if latest == to_version:
            return {"version": latest, "n_files": len(files)}
        # carry the target version's recorded schema AND layout: a
        # rollback past an evolution restores the old shape too
        # (schema and layout travel with data); the op records the
        # RESTORE TARGET so version-resolved sidecar state (the IVF-PQ
        # quantizer id) can re-resolve at the restored content's
        # version instead of pairing rolled-back data with post-target
        # metadata
        with open(_manifest_path(self.root, to_version)) as f:
            m = json.load(f)
        v = self._publish(
            latest, files, f"rollback@to={to_version}",
            schema=m.get("schema"), layout=m.get("layout"),
            dv=m.get("dv"),
            # restore the target's constraint set too ({} explicitly
            # clears when rolling back past a set-constraint)
            constraints=m.get("constraints") or {},
        )
        return {"version": v, "n_files": len(files)}

    def delete_where(
        self,
        spark: SparkSession,
        predicate: "F.Column | str",
        expected_version: int | None = None,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed COW DELETE: same semantics as
        ``maintenance.delete_where`` (3VL — only predicate-TRUE rows go),
        but the swap is a manifest commit: no unlink, no window in which
        survivor rows exist twice. ``expected_version`` pins the
        snapshot read AND the publish parent (strict serialization, as
        in :meth:`merge_upsert`); ``tag`` stamps the op as
        ``delete@<tag>`` — the multi-table transaction coordinator uses
        both to tie a table commit to its catalog transaction."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        version, files = self.snapshot(expected_version)
        pcols = self._pcols(version)
        schema = self.schema_of(version)
        dv = self._dv_of(version)
        # read the PINNED version, not the latest: a commit landing after
        # snapshot() must not leak its files into this rewrite (the publish
        # below would still conflict on parent, but the abort is cheaper
        # and the row-count guard stays meaningful)
        if dv:
            # merge-on-read deletes already applied: a DV-deleted row
            # can neither re-match the predicate nor be resurrected
            # into the rewrite; lineage columns give the file identity
            # (input_file_name is undefined through the anti-join)
            df = self._read_files(spark, files, schema, dv=dv,
                                  lineage=True)
            hits = (
                df.where(pred)
                .groupBy("__file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            touched_rel = sorted(r["__file"] for r in hits)
        else:
            df = self.read(spark, version=version)
            hits = (
                df.withColumn("__f", F.input_file_name())
                .where(pred)
                .groupBy("__f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            touched_rel = sorted(
                str(_local_path(r["__f"]).relative_to(self.root))
                for r in hits
            )
        if not hits:
            return {"n_deleted": 0, "files_touched": 0, "version": version}
        n_deleted = sum(r["n"] for r in hits)
        affected = self._read_files(spark, touched_rel, schema,
                                    dv=dv or None)
        n_affected = affected.count()
        survivors = affected.where(~pred.eqNullSafe(F.lit(True)))
        new_rel = self._stage(survivors, "del", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_affected - n_deleted:
            self._abort(new_rel)
            raise RuntimeError(
                f"delete row mismatch for {self.root}: affected {n_affected},"
                f" deleted {n_deleted}, rewrote {n_new}; nothing committed"
            )
        out_files = [f for f in files if f not in set(touched_rel)] + new_rel
        op = "delete" if tag is None else f"delete@{tag}"
        try:
            v = self._publish(
                version, out_files, op, schema=_schema_json(affected),
                dv=self._dv_minus(dv, set(touched_rel)) if dv
                else _DV_INHERIT,
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"n_deleted": n_deleted, "files_touched": len(touched_rel),
                "version": v}

    def delete_where_mor(
        self,
        spark: SparkSession,
        predicate: "F.Column | str",
        expected_version: int | None = None,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed MERGE-ON-READ DELETE: same row semantics as
        :meth:`delete_where` (3VL — only predicate-TRUE rows go), but
        instead of rewriting the touched data files it writes POSITION
        DELETE files (Iceberg v2 position deletes / Delta deletion
        vectors): ``(__dv_file, __dv_pos)`` pairs staged under
        ``_deletes/`` and recorded in the manifest's ``dv`` block.
        Readers anti-join the vectors at scan time.

        The scale contract is the point: a COW delete of k rows costs
        O(bytes of every touched file) — at 100 TB, deleting a few
        thousand rows scattered across the table rewrites terabytes.
        Merge-on-read costs O(k) write (the positions) plus an
        anti-join at read whose small side is exactly k rows (broadcast
        while k stays under :data:`_DV_BROADCAST_ROWS`). ``compact()``
        / ``zorder()`` materialize the vectors back into clean files
        when read amplification accumulates — the standard MOR
        maintenance trade.

        Deletes COMPOSE: the predicate is evaluated on the DV-applied
        snapshot, so an already-deleted row can never re-match and
        per-file counts stay exact (``row_count()`` subtracts them
        metadata-only). ``expected_version``/``tag`` carry the same
        strict-serialization / transaction-stamp semantics as every
        committed write."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        version, files = self.snapshot(expected_version)
        if not files:
            return {"n_deleted": 0, "files_touched": 0, "version": version}
        schema = self.schema_of(version)
        dv = self._dv_of(version)
        df = self._read_files(spark, files, schema, dv=dv or None,
                              lineage=True)
        hits = df.where(pred).select(
            F.col("__file").alias("__dv_file"),
            F.col("__pos").alias("__dv_pos"),
        )
        n_deleted = hits.count()
        if n_deleted == 0:
            return {"n_deleted": 0, "files_touched": 0, "version": version}
        new_dv_rel = self._stage_dv(hits, n_deleted)
        n_staged = _count_files(spark, self.root, new_dv_rel)
        if n_staged != n_deleted:
            self._abort(new_dv_rel)
            raise RuntimeError(
                f"delete-mor row mismatch for {self.root}: matched "
                f"{n_deleted}, staged {n_staged}; nothing committed"
            )
        # per-file counts off the just-staged (tiny) relation — keeps
        # the manifest's counts map exact without re-running the scan
        per_file = {
            r["__dv_file"]: r["n"]
            for r in spark.read.parquet(
                *(str(self.root / r) for r in new_dv_rel)
            ).groupBy("__dv_file").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        counts = dict(dv.get("counts", {}))
        for k, n in per_file.items():
            counts[k] = counts.get(k, 0) + n
        new_dv = {
            "files": list(dv.get("files", [])) + new_dv_rel,
            "counts": counts,
        }
        with open(_manifest_path(self.root, version)) as f:
            raw_schema = json.load(f).get("schema")
        op = "delete-mor" if tag is None else f"delete-mor@{tag}"
        try:
            v = self._publish(
                version, files, op, schema=raw_schema, dv=new_dv
            )
        except CommitConflict:
            self._abort(new_dv_rel)
            raise
        return {"n_deleted": n_deleted, "files_touched": len(per_file),
                "dv_files": len(new_dv_rel), "version": v}

    def update_where_mor(
        self,
        spark: SparkSession,
        predicate: "F.Column | str",
        set_exprs: "dict[str, F.Column | str]",
        expected_version: int | None = None,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed MERGE-ON-READ UPDATE (predicate-based ``UPDATE …
        SET``): one atomic commit that marks the matched rows' old
        images deleted via POSITION DELETES and appends their new
        images as fresh part files — no touched data file is
        rewritten. ``set_exprs`` maps column name → replacement
        expression (a Column or SQL string, evaluated against the old
        image, so ``{"v": "v + 1"}`` increments).

        Cost is O(k) for k matched rows (positions + new images) — the
        MOR counterpart of rewriting every touched file's bytes, same
        trade as :meth:`delete_where_mor`. The new images stage under
        the table's partition layout, so an update that MOVES a row
        across partitions routes it correctly (the old image's
        position delete covers the source partition). In the keyed
        change feed an update surfaces as the standard
        pre/post-image pair — the position-set diff yields the old
        image as leaving and the entering file the new one, exactly
        as a COW update would.

        Updating a partition-layout or type-changing expression is
        refused: the new images must carry the table schema
        bit-for-bit (a silent cast would fork the schema across
        files)."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        version, files = self.snapshot(expected_version)
        if not files:
            return {"n_updated": 0, "version": version}
        pcols = self._pcols(version)
        schema = self.schema_of(version)
        dv = self._dv_of(version)
        df = self._read_files(spark, files, schema, dv=dv or None,
                              lineage=True)
        known = [c for c in df.columns if c not in ("__file", "__pos")]
        unknown = sorted(c for c in set_exprs if c not in known)
        if unknown:
            raise ValueError(
                f"update_where_mor: {unknown} not in table "
                f"columns {known}"
            )
        matched = df.where(pred)
        n_matched = matched.count()
        if n_matched == 0:
            return {"n_updated": 0, "version": version}
        hits = matched.select(
            F.col("__file").alias("__dv_file"),
            F.col("__pos").alias("__dv_pos"),
        )
        new_dv_rel = self._stage_dv(hits, n_matched)
        old_cols = [c for c in df.columns if c not in ("__file", "__pos")]
        exprs = {
            c: (F.expr(e) if isinstance(e, str) else e)
            for c, e in set_exprs.items()
        }
        images = matched.select(*[
            exprs[c].alias(c) if c in exprs else F.col(c)
            for c in old_cols
        ])
        base = self._read_files(spark, files, schema)
        type_clash = {
            c: (dict(base.dtypes)[c], dict(images.dtypes)[c])
            for c in dict(base.dtypes)
            if dict(base.dtypes)[c] != dict(images.dtypes)[c]
        }
        if type_clash:
            self._abort(new_dv_rel)
            raise ValueError(
                "update_where_mor: set expressions change column types "
                f"{type_clash} — a silent widen would fork the table "
                "schema across files"
            )
        try:
            self._enforce_constraints(images, version, "update")
        except ValueError:
            self._abort(new_dv_rel)
            raise
        new_rel = self._stage(images, "upd", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        n_dv = _count_files(spark, self.root, new_dv_rel)
        if n_new != n_matched or n_dv != n_matched:
            self._abort(new_rel)
            self._abort(new_dv_rel)
            raise RuntimeError(
                f"update-mor row mismatch for {self.root}: matched "
                f"{n_matched}, staged images {n_new}, staged positions "
                f"{n_dv}; nothing committed"
            )
        per_file = {
            r["__dv_file"]: r["n"]
            for r in spark.read.parquet(
                *(str(self.root / r) for r in new_dv_rel)
            ).groupBy("__dv_file").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        counts = dict(dv.get("counts", {}))
        for k, n in per_file.items():
            counts[k] = counts.get(k, 0) + n
        new_dv = {
            "files": list(dv.get("files", [])) + new_dv_rel,
            "counts": counts,
        }
        op = "update-mor" if tag is None else f"update-mor@{tag}"
        try:
            v = self._publish(
                version, list(files) + new_rel, op,
                schema=_schema_json(images), dv=new_dv,
            )
        except CommitConflict:
            self._abort(new_rel)
            self._abort(new_dv_rel)
            raise
        return {"n_updated": n_matched, "files_touched": len(per_file),
                "version": v}

    def merge_upsert_mor(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        expected_version: int | None = None,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed MERGE-ON-READ MERGE by key: same row semantics as
        :meth:`merge_upsert` (matched keys replaced, unmatched
        appended), but matched OLD images die by position delete and
        the updates land as fresh part files — one atomic commit,
        zero touched files rewritten. This is the CDC-apply shape for
        huge tables: a nightly batch of k upserts costs one scan (to
        locate the matched positions) plus O(k) writes, instead of
        rewriting every file any key touches; read amplification is
        one anti-join, reclaimed by ``compact()`` on maintenance
        cadence. Same strict serialization, schema identity, and
        duplicate-key refusal as the COW form."""
        version, files = self.snapshot(expected_version)
        pcols = self._pcols(version)
        schema = self.schema_of(version)
        dv = self._dv_of(version)
        df = self.read(spark, version=version)
        if sorted(df.columns) != sorted(updates.columns):
            raise ValueError(
                f"merge schema mismatch: table {sorted(df.columns)} vs "
                f"updates {sorted(updates.columns)}"
            )
        tab_types, upd_types = dict(df.dtypes), dict(updates.dtypes)
        type_clash = {
            c: (tab_types[c], upd_types[c])
            for c in tab_types
            if tab_types[c] != upd_types[c]
        }
        if type_clash:
            raise ValueError(
                "merge schema mismatch: column types diverge "
                f"{type_clash} — a silent widen would fork the table "
                "schema across rewritten files"
            )
        n_updates = updates.count()
        if n_updates == 0:
            return {"n_matched": 0, "n_inserted": 0, "version": version}
        keys = updates.select(*key_cols).distinct()
        if keys.count() != n_updates:
            raise ValueError("merge_upsert_mor: duplicate keys in updates")
        self._enforce_constraints(updates, version, "merge")
        if not files:
            out = updates.select(*df.columns)
            new_rel = self._stage(out, "mrg", pcols)
            try:
                v = self._publish(
                    version, new_rel,
                    "merge-mor" if tag is None else f"merge-mor@{tag}",
                    schema=_schema_json(df),
                )
            except CommitConflict:
                self._abort(new_rel)
                raise
            return {"n_matched": 0, "n_inserted": n_updates, "version": v}
        dfl = self._read_files(spark, files, schema, dv=dv or None,
                               lineage=True)
        matched = dfl.join(F.broadcast(keys), key_cols, "left_semi")
        n_matched = matched.count()
        hits = matched.select(
            F.col("__file").alias("__dv_file"),
            F.col("__pos").alias("__dv_pos"),
        )
        new_dv_rel = self._stage_dv(hits, n_matched) if n_matched else []
        new_rel = self._stage(updates.select(*df.columns), "mrg", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        n_dv = _count_files(spark, self.root, new_dv_rel) if new_dv_rel else 0
        if n_new != n_updates or n_dv != n_matched:
            self._abort(new_rel)
            self._abort(new_dv_rel)
            raise RuntimeError(
                f"merge-mor row mismatch for {self.root}: updates "
                f"{n_updates}, staged {n_new}, matched {n_matched}, "
                f"staged positions {n_dv}; nothing committed"
            )
        counts = dict(dv.get("counts", {}))
        if new_dv_rel:
            per_file = {
                r["__dv_file"]: r["n"]
                for r in spark.read.parquet(
                    *(str(self.root / r) for r in new_dv_rel)
                ).groupBy("__dv_file").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            for k, n in per_file.items():
                counts[k] = counts.get(k, 0) + n
        new_dv = (
            {"files": list(dv.get("files", [])) + new_dv_rel,
             "counts": counts}
            if counts else None
        )
        op = "merge-mor" if tag is None else f"merge-mor@{tag}"
        try:
            v = self._publish(
                version, list(files) + new_rel, op,
                schema=_schema_json(df), dv=new_dv,
            )
        except CommitConflict:
            self._abort(new_rel)
            self._abort(new_dv_rel)
            raise
        return {"n_matched": n_matched,
                "n_inserted": n_updates - n_matched, "version": v}

    def dv_status(
        self,
        version: int | None = None,
        materialize_fraction: float = 0.10,
        consolidate_files: int = 8,
    ) -> dict:
        """Metadata-only merge-on-read health report — the advisor the
        maintenance cadence keys on instead of a blind timer. From the
        manifest's dv block and the row-count sidecar alone (zero data
        reads): total deleted rows, deleted fraction of the table,
        per-file worst deleted fraction, and delete-file count; plus
        two recommendations — ``materialize`` (run :meth:`compact` /
        :meth:`zorder`) when the deleted fraction crosses
        ``materialize_fraction`` (the anti-join's small side has grown
        into real read tax and the wasted scan of dead rows compounds
        every query), and ``consolidate`` (run
        :meth:`consolidate_deletes`) when delete FILES exceed
        ``consolidate_files`` (per-file open cost, not row volume).
        Thresholds mirror the Delta deletion-vector maintenance
        guidance; tune per deployment."""
        v, files = self.snapshot(version)
        dv = self._dv_of(v)
        n_files = len(files)
        if not dv:
            return {"version": v, "deleted_rows": 0,
                    "deleted_fraction": 0.0, "dv_files": 0,
                    "files_with_deletes": 0, "data_files": n_files,
                    "max_file_deleted_fraction": 0.0,
                    "materialize": False, "consolidate": False}
        counts = dv.get("counts", {})
        deleted = sum(counts.values())
        rows = _ZoneMaps(self).rows_for(files)
        total = sum(rows.values()) or 1
        worst = max(
            (n / r for f, n in counts.items()
             if (r := rows.get(f)) is not None and r > 0),
            default=0.0,
        )
        frac = deleted / total
        return {
            "version": v,
            "deleted_rows": deleted,
            "deleted_fraction": round(frac, 4),
            "dv_files": len(dv.get("files", [])),
            "files_with_deletes": len(counts),
            "data_files": n_files,
            "max_file_deleted_fraction": round(worst, 4),
            "materialize": frac >= materialize_fraction
            or worst >= 2 * materialize_fraction,
            "consolidate": len(dv.get("files", [])) > consolidate_files,
        }

    def consolidate_deletes(self, spark: SparkSession) -> dict[str, int]:
        """Maintenance twin of Iceberg's rewrite-position-deletes: a
        long run of small MOR deletes leaves one tiny delete file per
        commit, and every read pays an open per file. This rewrites
        the LIVE delete entries (those whose data file is still in the
        manifest) into a handful of fresh delete files and republishes
        the SAME data file list — metadata-only from the data's point
        of view, O(live deleted rows) work, zero data bytes moved.
        Superseded delete files become vacuum-reclaimable. Counts are
        preserved exactly (entries for departed data files are
        dropped, and they were already excluded from counts)."""
        version, files = self.snapshot()
        dv = self._dv_of(version)
        if not dv or len(dv.get("files", [])) <= 1:
            return {"dv_files_before": len((dv or {}).get("files", [])),
                    "dv_files_after": len((dv or {}).get("files", [])),
                    "version": version}
        live = set(files)
        entries = self._dv_df(spark, dv["files"]).where(
            F.col("__dv_file").isin(*sorted(live & set(dv["counts"])))
        )
        n_live = sum(dv["counts"].values())
        new_rel = self._stage_dv(entries, n_live)
        n_staged = _count_files(spark, self.root, new_rel)
        if n_staged != n_live:
            self._abort(new_rel)
            raise RuntimeError(
                f"consolidate-deletes row mismatch for {self.root}: live "
                f"{n_live}, staged {n_staged}; nothing committed"
            )
        with open(_manifest_path(self.root, version)) as f:
            raw_schema = json.load(f).get("schema")
        try:
            v = self._publish(
                version, files, "consolidate-deletes", schema=raw_schema,
                dv={"files": new_rel, "counts": dict(dv["counts"])},
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"dv_files_before": len(dv["files"]),
                "dv_files_after": len(new_rel), "version": v}

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        expected_version: int | None = None,
        tag: str | None = None,
    ) -> dict[str, int]:
        """Committed COW MERGE by key (exact-schema form of
        ``maintenance.merge_upsert``): matched keys replaced, unmatched
        appended, only matched files rewritten — published as one atomic
        manifest commit.

        ``expected_version`` pins the snapshot this merge reads AND the
        parent it publishes against. A caller that derived ``updates``
        from a read of version v must pass v: otherwise a commit landing
        between that read and this call would be silently clobbered —
        merge_upsert would re-pin the newer snapshot and publish on top
        of it, resurrecting rows the caller never saw (lost update).
        With the pin, any intervening commit makes the publish target
        v+1 already exist, so the caller gets :class:`CommitConflict`
        and recomputes against the fresh snapshot."""
        version, files = self.snapshot(expected_version)
        pcols = self._pcols(version)
        schema = self.schema_of(version)
        dv = self._dv_of(version)
        df = self.read(spark, version=version)
        if sorted(df.columns) != sorted(updates.columns):
            raise ValueError(
                f"merge schema mismatch: table {sorted(df.columns)} vs "
                f"updates {sorted(updates.columns)}"
            )
        tab_types, upd_types = dict(df.dtypes), dict(updates.dtypes)
        type_clash = {
            c: (tab_types[c], upd_types[c])
            for c in tab_types
            if tab_types[c] != upd_types[c]
        }
        if type_clash:
            raise ValueError(
                "merge schema mismatch: column types diverge "
                f"{type_clash} — a silent widen would fork the table "
                "schema across rewritten files"
            )
        n_updates = updates.count()
        if n_updates == 0:
            return {"n_matched": 0, "n_inserted": 0, "files_touched": 0,
                    "version": version}
        keys = updates.select(*key_cols).distinct()
        if keys.count() != n_updates:
            raise ValueError("merge_upsert: duplicate keys in updates")
        self._enforce_constraints(updates, version, "merge")
        if dv:
            # DV-applied lineage read: a merge-on-read-deleted row
            # must not match (its key inserts as new), and file
            # identity must not go through input_file_name (undefined
            # through the DV anti-join)
            dfl = self._read_files(spark, files, schema, dv=dv,
                                   lineage=True)
            hits = (
                dfl.join(F.broadcast(keys), key_cols)
                .groupBy("__file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            touched_rel = sorted(r["__file"] for r in hits)
        else:
            hits = (
                df.withColumn("__f", F.input_file_name())
                .join(F.broadcast(keys), key_cols)
                .groupBy("__f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            touched_rel = sorted(
                str(_local_path(r["__f"]).relative_to(self.root))
                for r in hits
            )
        n_matched = sum(r["n"] for r in hits)
        if touched_rel:
            affected = self._read_files(
                spark, touched_rel, schema, dv=dv or None
            )
            n_affected = affected.count()
            out = affected.join(
                F.broadcast(keys), key_cols, "left_anti"
            ).unionByName(updates)
        else:
            n_affected = 0
            out = updates.select(*df.columns)
        new_rel = self._stage(out, "mrg", pcols)
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_affected - n_matched + n_updates:
            self._abort(new_rel)
            raise RuntimeError(
                f"merge row mismatch for {self.root}: affected {n_affected},"
                f" matched {n_matched}, updates {n_updates}, rewrote {n_new};"
                " nothing committed"
            )
        out_files = [f for f in files if f not in set(touched_rel)] + new_rel
        op = "merge" if tag is None else f"merge@{tag}"
        try:
            v = self._publish(
                version, out_files, op, schema=_schema_json(df),
                dv=self._dv_minus(dv, set(touched_rel)) if dv
                else _DV_INHERIT,
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"n_matched": n_matched, "n_inserted": n_updates - n_matched,
                "files_touched": len(touched_rel), "version": v}

    def compact(
        self,
        spark: SparkSession,
        target_rows_per_file: int,
        sort_by: list[str] | None = None,
    ) -> dict[str, int]:
        """Committed compaction: rewrite the WHOLE snapshot into
        ~target-sized (optionally range-clustered) files and publish the
        replacement manifest. Because the old files stay on disk until
        vacuum, a maintenance compaction can run concurrently with a
        keyed MERGE — whichever commits second loses cleanly and
        retries, never a mixed layout."""
        version, files = self.snapshot()
        pcols = self._pcols(version)
        df = self.read(spark, version=version)
        n_rows = df.count()
        if n_rows == 0:
            return {"n_rows": 0, "files_before": len(files),
                    "files_after": len(files), "version": version}
        n_files = plan_target_files(n_rows, target_rows_per_file)
        if sort_by:
            out = df.repartitionByRange(
                n_files, *pcols, *sort_by
            ).sortWithinPartitions(*pcols, *sort_by)
        else:
            out = (df.repartition(n_files, *pcols) if pcols
                   else df.repartition(n_files))
        new_rel = self._stage(out, "cmp", pcols, max_records=target_rows_per_file)
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_rows:
            self._abort(new_rel)
            raise RuntimeError(
                f"compaction row mismatch for {self.root}: {n_rows} -> "
                f"{n_new}; nothing committed"
            )
        try:
            # compaction MATERIALIZES merge-on-read deletes: the
            # rewrite read was DV-applied, so the new files carry no
            # deleted rows and the dv block clears (vacuum reclaims
            # the delete files once no retained manifest lists them)
            v = self._publish(
                version, new_rel, "compact", schema=_schema_json(df),
                dv=None,
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"n_rows": n_rows, "files_before": len(files),
                "files_after": len(new_rel), "version": v}

    def adopt_files(
        self,
        rel_files: list[str],
        schema: str | None = None,
        layout: list[str] | None = None,
        expected_version: int | None = None,
        tag: str | None = None,
        dv: dict | None = None,
        constraints: dict | None = None,
    ) -> dict[str, int]:
        """Commit a manifest listing files ALREADY PRESENT in the table
        directory — the metadata-only adoption primitive branch merge
        is built on (the merged snapshot's files were hard-linked in
        beforehand; this publishes them as one atomic commit). Same
        strict serialization as every committed write:
        ``expected_version`` pins the publish parent, ``tag`` stamps
        the op (``adopt@<tag>``) so a crashed multi-table merge's
        debris is attributable to its transaction by
        :func:`~cve_manager_spark.catalogtx.CatalogLog.reconcile`.
        Refuses files that do not exist — adoption never invents
        state. ``dv``: the adopted snapshot's deletion-vector block
        (its delete files must be present too — an adopted snapshot
        is COMPLETE, so the default is explicitly no-DV, never
        inherit)."""
        missing = [r for r in rel_files if not (self.root / r).exists()]
        missing += [
            r for r in (dv or {}).get("files", [])
            if not (self.root / r).exists()
        ]
        if missing:
            raise ValueError(
                f"adopt_files: {len(missing)} files not present under "
                f"{self.root} (first: {missing[0]!r})"
            )
        parent = self.latest_version()
        if parent is None:
            raise ValueError(f"no commit log under {self.root}")
        if expected_version is not None and parent != expected_version:
            raise CommitConflict(
                f"{self.root} is at v{parent}, expected "
                f"v{expected_version}"
            )
        op = f"adopt@{tag}" if tag else "adopt"
        v = self._publish(
            parent, sorted(rel_files), op, schema=schema, layout=layout,
            dv=dv, constraints=constraints,
        )
        return {"version": v, "n_files": len(rel_files)}

    def clone(self, dest: str, version: int | None = None) -> "TableLog":
        """ZERO-COPY CLONE: materialize one snapshot as an independent,
        fully writable table — every data file HARD-LINKED into
        ``dest`` (same filesystem: O(files) metadata ops, zero data
        bytes; silent copy fallback across devices), a fresh v0
        manifest carrying the snapshot's schema and layout, and the
        commit-time stats/bloom sidecars for the linked files copied
        over so the clone's data skipping is warm from the first read.

        Hard links are exactly the right primitive for immutable data
        files: both tables' COW ops only ever write NEW files, and
        each side's vacuum unlinks its OWN directory entries — the
        shared inode survives until every link drops, so neither
        side's retention can break the other. This is Delta's shallow
        clone use case (a writable dev/eval copy of a production
        snapshot, paying metadata only) with deep-clone safety: no
        reference from the clone back into the source directory
        exists at all, so even deleting the source table wholesale
        leaves the clone intact."""
        v, files = self.snapshot(version)
        droot = Path(dest)
        if (droot / _LOG_DIR).exists() or (
            droot.exists() and any(droot.rglob("*.parquet"))
        ):
            raise ValueError(
                f"clone destination {droot} already holds a table"
            )
        with open(_manifest_path(self.root, v)) as f:
            m = json.load(f)
        dv = m.get("dv") or {}
        # deletion-vector files travel with the snapshot: same
        # hard-link discipline (immutable, rel-path-keyed, so the
        # vectors stay valid against the linked data files)
        for rel in list(files) + list(dv.get("files", [])):
            src, dst = self.root / rel, droot / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)  # cross-device fallback
        dlog = TableLog(str(droot))
        (droot / _LOG_DIR).mkdir(parents=True, exist_ok=True)
        dlog._publish(
            -1, files, f"clone@from-v{v}",
            schema=m.get("schema"), layout=m.get("layout"),
            dv=m.get("dv"), constraints=m.get("constraints"),
        )
        # warm the clone's skipping state: stats cache entries and
        # bloom sidecars are keyed by relative path, which the clone
        # preserves; the bloom CONFIG carries too, so future writes to
        # the clone keep recording sidecars
        src_cache = _ZoneMaps(self)._load()
        dst_zm = _ZoneMaps(dlog)
        dst_cache = {"_fmt": src_cache.get("_fmt", _STAT_FMT)}
        for rel in files:
            if rel in src_cache:
                dst_cache[rel] = src_cache[rel]
        if len(dst_cache) > 1:
            dst_zm.path.parent.mkdir(parents=True, exist_ok=True)
            tmp = dst_zm.path.with_name(".stats-clone-tmp")
            tmp.write_text(json.dumps(dst_cache))
            os.replace(tmp, dst_zm.path)
        sbl, dbl = _BloomIndex(self), _BloomIndex(dlog)
        if sbl.cfg_path.exists():
            dbl.cfg_path.parent.mkdir(parents=True, exist_ok=True)
            dbl.cfg_path.write_text(sbl.cfg_path.read_text())
            for rel in files:
                for column in sbl.config():
                    sp = sbl._sidecar(rel, column)
                    if sp.exists():
                        dbl.dir.mkdir(parents=True, exist_ok=True)
                        try:
                            os.link(sp, dbl._sidecar(rel, column))
                        except OSError:
                            shutil.copy2(sp, dbl._sidecar(rel, column))
        return dlog

    def zorder(
        self,
        spark: SparkSession,
        cols: list[str],
        target_rows_per_file: int,
        bits_per_col: int = 8,
    ) -> dict[str, int]:
        """Committed Z-ORDER rewrite (the OPTIMIZE ZORDER maintenance
        op): recluster the snapshot along a space-filling curve over
        ``cols`` so the per-file [min, max] recorded at commit time is
        narrow in EVERY listed dimension at once — single-column range
        clustering makes zone maps selective on one column and useless
        on the rest; Z-ordering splits the selectivity across all of
        them (each of k dimensions prunes roughly to
        files^(1 - 1/k)).

        Mechanics, all scale-shaped: per column, 2^bits-1 quantile
        cutpoints are computed once (``approxQuantile`` — one
        aggregate, driver gets a few hundred scalars; quantile buckets
        make the curve robust to skew where fixed-width buckets
        collapse), each row's bucket is found by an in-row
        higher-order ``aggregate`` over the broadcast cutpoint array
        (no join, stays in codegen), buckets interleave bitwise into
        the Z-value, and the rewrite is exactly :meth:`compact`'s
        committed COW path range-partitioned on the Z-value. Numeric
        columns only (quantiles need an ordering DuckDB/Spark agree
        on); the Z-value is a transient sort key, never stored. The
        ordering is an OPTIMIZATION: content is byte-identical as a
        multiset, so a concurrent reader or a differential oracle sees
        no change — only the file-level stats get sharper."""
        version, files = self.snapshot()
        pcols = self._pcols(version)
        df = self.read(spark, version=version)
        for c in cols:
            t = dict(df.dtypes).get(c)
            if t is None:
                raise ValueError(f"zorder: no column {c!r}")
            if t in ("string", "boolean") or t.startswith(
                ("array", "map", "struct", "binary")
            ):
                raise ValueError(
                    f"zorder: column {c!r} of type {t} is not "
                    "numeric/temporal (quantile bucketing needs one)"
                )
        n_rows = df.count()
        if n_rows == 0:
            return {"n_rows": 0, "files_before": len(files),
                    "files_after": len(files), "version": version}
        n_bkt = 2 ** bits_per_col
        probs = [i / n_bkt for i in range(1, n_bkt)]
        z = F.lit(0).cast("long")
        ncols = len(cols)
        for ci, c in enumerate(cols):
            cuts = df.select(
                F.col(c).cast("double").alias("__q")
            ).stat.approxQuantile("__q", probs, 0.001)
            arr = F.array(*[F.lit(x) for x in cuts])
            bucket = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, x: acc
                + F.when(F.col(c).cast("double") >= x, 1).otherwise(0),
            )
            for i in range(bits_per_col):
                z = z + F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)).cast(
                        "long"
                    ),
                    i * ncols + ci,
                )
        n_files = plan_target_files(n_rows, target_rows_per_file)
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, *pcols, "__z")
            .sortWithinPartitions(*pcols, "__z")
            .drop("__z")
        )
        new_rel = self._stage(
            out, "zord", pcols, max_records=target_rows_per_file
        )
        n_new = _count_files(spark, self.root, new_rel)
        if n_new != n_rows:
            self._abort(new_rel)
            raise RuntimeError(
                f"zorder row mismatch for {self.root}: {n_rows} -> "
                f"{n_new}; nothing committed"
            )
        try:
            # full rewrite off the DV-applied read: merge-on-read
            # deletes materialize here too, same as compact()
            v = self._publish(
                version, new_rel, "zorder", schema=_schema_json(df),
                dv=None,
            )
        except CommitConflict:
            self._abort(new_rel)
            raise
        return {"n_rows": n_rows, "files_before": len(files),
                "files_after": len(new_rel), "version": v}

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
        key_cols: list[str] | None = None,
        where: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Change data feed between two versions, computed from the
        manifests alone — the row-level face of time travel
        (``timetravel_snapshot_diff`` is the digest-level query twin).

        The scale property: a published file is IMMUTABLE (every COW op
        writes new files and republishes the manifest), so rows in
        files common to both manifests are identical and cancel
        exactly — only files ENTERING or LEAVING the manifest between
        the two versions are read. CDF cost is proportional to changed
        data, never table size; a compaction (rewrite without row
        change) diffs to empty.

        Without ``key_cols``: multiset diff — one output row per
        distinct changed row with ``_change_type`` ('insert'|'delete')
        and ``_change_count`` (how many copies appeared/disappeared).
        With ``key_cols`` (a primary key unique per snapshot): rows are
        classified as 'insert', 'delete', or an update pair
        ('update_preimage' + 'update_postimage'), Delta-CDF style, with
        ``_change_count`` fixed at 1. Rows rewritten byte-identically
        into new files (compaction) cancel in both modes.

        Schema evolution between the versions is aligned Delta-style:
        columns absent on one side read as NULL there, so an additive
        evolution surfaces as updates only where values actually
        appeared.

        ``where``: ``{column: (lo, hi)}`` range bounds (either bound
        None = open) giving the change feed OF THE PREDICATE-BOUNDED
        SUBSET — both snapshots are filtered BEFORE diffing, so an
        update that moves a row across the bound surfaces as an insert
        (moved in) or delete (moved out), exactly as if the bounded
        subset were its own table. The bounds prune via the same
        commit-time zone maps as ``read(where=)``: entering/leaving
        files whose [min, max] cannot intersect the bounds are never
        opened, so a bounded CDC consumer ('changes where ts >= X')
        reads O(matching changed files), not O(changed files) — on a
        range-clustered table the usual case is one file per commit.
        The filter itself still applies to the kept files (pruning is
        an optimization); a bound on a column absent from one side's
        schema makes that side empty there (NULL fails a range), the
        consistent reading of 'the subset' across an evolution."""
        vf, files_f = self.snapshot(v_from)
        vt, files_t = self.snapshot(v_to)
        only_f = sorted(set(files_f) - set(files_t))
        only_t = sorted(set(files_t) - set(files_f))
        schema_f = self.schema_of(vf)
        schema_t = self.schema_of(vt)
        dv_f, dv_t = self._dv_of(vf), self._dv_of(vt)
        if where:
            pf, _ = _prune_files(self, only_f, where)
            pt, _ = _prune_files(self, only_t, where)
            if not (pf or pt) and (only_f or only_t):
                readable = not (
                    (schema_f is None or isinstance(schema_f, str))
                    and (schema_t is None or isinstance(schema_t, str))
                )
                if not readable:
                    # schemaless manifests: keep ONE file so the diff
                    # keeps the table shape (the range filter below
                    # still makes it empty) — one file read, not a
                    # failure, mirroring _prune_snapshot's fallback
                    if only_t:
                        pt = only_t[:1]
                    else:
                        pf = only_f[:1]
            only_f, only_t = pf, pt

        def side(rel, schema, dv):
            if rel:
                # each side reads DV-APPLIED AS OF ITS OWN VERSION: a
                # row already merge-on-read-deleted at v_from was not
                # part of that snapshot's content, so a file leaving
                # the manifest must not surface it as a delete (dv
                # entries for files outside the subset never match)
                return self._read_files(spark, rel, schema,
                                        dv=dv or None)
            if schema is None or isinstance(schema, str):
                return None
            return spark.createDataFrame([], schema)

        a = side(only_f, schema_f, dv_f)  # rows leaving
        b = side(only_t, schema_t, dv_t)  # rows entering

        # merge-on-read deletes change CONTENT without changing the
        # file list: for files present in BOTH manifests, diff the
        # position-delete sets. Positions deleted at v_to but not at
        # v_from are rows that LEFT (append to the from-side); the
        # reverse direction (a rollback past a MOR delete) is rows
        # that RETURNED. Cost stays O(changed): the dv relations are
        # O(deleted rows), and only common files with differing
        # entries are opened — never the whole snapshot.
        common = set(files_f) & set(files_t)
        if common and (dv_f or dv_t):
            cdf = spark.createDataFrame(
                [(r,) for r in sorted(common)], "__cf string"
            )

            def dv_common(dv):
                if not dv or not dv.get("files"):
                    return None
                d = self._dv_df(spark, dv["files"])
                # restrict to common files: stale entries for replaced
                # files and entries for one-sided files are not part
                # of this diff
                return d.join(
                    F.broadcast(cdf),
                    d["__dv_file"] == cdf["__cf"], "left_semi",
                )

            da, db = dv_common(dv_f), dv_common(dv_t)

            def dv_minus(x, y):
                if x is None:
                    return None
                if y is None:
                    return x
                return x.join(y, ["__dv_file", "__dv_pos"], "left_anti")

            def dv_rows(entries, schema):
                """Content of the rows at the given (file, position)
                entries — reads only the files the entries name."""
                if entries is None:
                    return None
                touched = sorted(
                    r["__dv_file"]
                    for r in entries.select("__dv_file")
                    .distinct().collect()
                )
                if not touched:
                    return None
                if where:
                    touched, _ = _prune_files(self, touched, where)
                    if not touched:
                        return None
                rows = self._read_files(spark, touched, schema,
                                        lineage=True)
                rows = rows.join(
                    entries,
                    (rows["__file"] == entries["__dv_file"])
                    & (rows["__pos"] == entries["__dv_pos"]),
                    "left_semi",
                )
                return rows.drop("__file", "__pos")

            gone = dv_rows(dv_minus(db, da), schema_f)   # newly deleted
            back = dv_rows(dv_minus(da, db), schema_t)   # resurrected

            def add_side(base, extra):
                if extra is None:
                    return base
                if base is None:
                    return extra
                return base.unionByName(extra, allowMissingColumns=True)

            a = add_side(a, gone)
            b = add_side(b, back)
        if a is None and b is None:
            raise ValueError(
                f"neither v{vf} nor v{vt} carries a readable schema"
            )
        # align columns across an evolution: union field list, missing
        # side reads NULL (the add-column read semantics, applied to CDF)
        cols = list((b if b is not None else a).columns)
        other = a if b is not None else None
        if other is not None:
            cols += [c for c in other.columns if c not in cols]

        # name -> field over the UNION of both sides' schemas: a column
        # that exists only on the from-side (reverse-direction diff
        # across an additive evolution) must still find its type here.
        tmpl: dict = {}
        for src in (b, a):
            if src is not None:
                for f in src.schema.fields:
                    tmpl.setdefault(f.name, f)

        def align(df):
            if df is None:
                df = spark.createDataFrame(
                    [], T.StructType([tmpl[c] for c in cols])
                )
            by_name = dict(zip(df.columns, df.schema.fields))
            out = []
            for c in cols:
                if c in by_name:
                    out.append(F.col(c))
                else:
                    out.append(
                        F.lit(None).cast(tmpl[c].dataType).alias(c)
                    )
            return df.select(*out)

        a = align(a)
        b = align(b)
        if where:
            for column, (lo, hi) in where.items():
                if lo is not None:
                    a = a.where(F.col(column) >= F.lit(lo))
                    b = b.where(F.col(column) >= F.lit(lo))
                if hi is not None:
                    a = a.where(F.col(column) <= F.lit(hi))
                    b = b.where(F.col(column) <= F.lit(hi))

        if key_cols is None:
            ga = a.groupBy(*cols).agg(F.count(F.lit(1)).alias("__cf"))
            gb = b.groupBy(*cols).agg(F.count(F.lit(1)).alias("__ct"))
            cond = None
            for c in cols:
                e = ga[c].eqNullSafe(gb[c])
                cond = e if cond is None else (cond & e)
            j = ga.join(gb, cond, "full_outer")
            pick = [
                F.coalesce(ga[c], gb[c]).alias(c) for c in cols
            ]
            delta = (
                F.coalesce(F.col("__ct"), F.lit(0))
                - F.coalesce(F.col("__cf"), F.lit(0))
            ).alias("__d")
            j = j.select(*pick, delta).where(F.col("__d") != 0)
            return j.select(
                *cols,
                F.when(F.col("__d") > 0, F.lit("insert"))
                .otherwise(F.lit("delete"))
                .alias("_change_type"),
                F.abs(F.col("__d")).cast("long").alias("_change_count"),
            )

        payload = [c for c in cols if c not in key_cols]
        # literal presence markers survive the full-outer join even for
        # rows whose data columns are ALL NULL — value-nullness probing
        # would misread such a row as absent and cancel its insert or
        # delete against nothing.
        fa = a.withColumn("__pf", F.lit(1)).alias("__f")
        tb = b.withColumn("__pt", F.lit(1)).alias("__t")
        cond = None
        for k in key_cols:
            e = fa[k].eqNullSafe(tb[k])
            cond = e if cond is None else (cond & e)
        j = fa.join(tb, cond, "full_outer")
        same = F.lit(True)
        for c in payload:
            same = same & fa[c].eqNullSafe(tb[c])
        has_f = fa["__pf"].isNotNull()
        has_t = tb["__pt"].isNotNull()
        kind = (
            F.when(has_f & ~has_t, F.lit("delete"))
            .when(has_t & ~has_f, F.lit("insert"))
            .when(same, F.lit(None))  # rewritten unchanged: cancels
            .otherwise(F.lit("update"))
        )
        # __to_ columns come from the to-side ALONE: insert rows have
        # the from-side all-NULL and update rows always carry the
        # to-side image, so a from-side fallback could only resurrect
        # a stale pre-value when an update sets a column to NULL.
        j = j.select(
            *[tb[c].alias(f"__to_{c}") for c in cols],
            *[fa[c].alias(f"__from_{c}") for c in cols],
            kind.alias("__kind"),
        ).where(F.col("__kind").isNotNull())
        one = F.lit(1).cast("long").alias("_change_count")
        ins = j.where(F.col("__kind") == "insert").select(
            *[F.col(f"__to_{c}").alias(c) for c in cols],
            F.lit("insert").alias("_change_type"), one,
        )
        dele = j.where(F.col("__kind") == "delete").select(
            *[F.col(f"__from_{c}").alias(c) for c in cols],
            F.lit("delete").alias("_change_type"), one,
        )
        upd = j.where(F.col("__kind") == "update")
        pre = upd.select(
            *[F.col(f"__from_{c}").alias(c) for c in cols],
            F.lit("update_preimage").alias("_change_type"), one,
        )
        post = upd.select(
            *[F.col(f"__to_{c}").alias(c) for c in cols],
            F.lit("update_postimage").alias("_change_type"), one,
        )
        return ins.unionByName(dele).unionByName(pre).unionByName(post)

    def consume_changes(
        self,
        spark: SparkSession,
        cursor_path: str,
        key_cols: list[str] | None = None,
        start_version: int | None = None,
        max_versions: int | None = None,
        where: dict[str, tuple] | None = None,
    ):
        """Tail the log incrementally: return ``(changes_df, ack)`` for
        everything committed since the cursor's last-consumed version,
        or ``None`` when the cursor is already at the latest.
        ``max_versions`` caps one consumption span to that many commits
        (``max_versions=1`` = strict version-by-version tailing, the
        bounded-work-per-step mode the streaming consumer uses); the
        ack then records only the capped head, so the next call resumes
        exactly where this span ended. The
        consumer applies the changes FIRST and calls ``ack()`` after —
        a crash before the ack re-delivers the same range next call
        (at-least-once), which an idempotent applier
        (streaming.sinks.apply_facts_changes drops-then-adds by id)
        turns into exactly-once effect. The cursor is one JSON file
        ({"version": v}) written atomically via rename, so a torn
        write can't corrupt it.

        First call (no cursor file): ``start_version`` picks where to
        begin — an explicit version for a full backfill, or None for
        Kafka-style "latest" (the cursor initializes to the current
        head and the call returns None; only future commits flow).
        Versions older than the vacuum retention window raise through
        ``snapshot()`` — the standard CDC-retention trade, surfaced
        loudly instead of silently skipping.

        ``where`` — optional ``{column: (lo, hi)}`` bounds forwarded to
        :meth:`changes`: the consumer tails the change feed OF THE
        BOUNDED SUBSET, with entering/leaving files outside the bounds
        zone-map pruned. The cursor still advances over full versions
        (acks are subset-independent), so different subscribers may
        tail different slices of the same log with independent
        cursors."""
        import tempfile

        cur = Path(cursor_path)
        head = self.latest_version()
        if head is None:
            raise ValueError(f"no commit log under {self.root}")
        cur.parent.mkdir(parents=True, exist_ok=True)

        def _write_cursor(v: int) -> None:
            fd, tmp = tempfile.mkstemp(
                dir=str(cur.parent), prefix=cur.name, suffix=".tmp"
            )
            with os.fdopen(fd, "w") as f:
                json.dump({"version": v}, f)
            os.replace(tmp, str(cur))

        if cur.exists():
            with open(cur) as f:
                last = int(json.load(f)["version"])
        elif start_version is not None:
            last = int(start_version)
            # persist the explicit pin UNCONDITIONALLY, before any
            # changes are returned (r12 ADVICE): the r12 code only
            # wrote the cursor in the nothing-to-consume branch, so a
            # commit landing between a caller's snapshot() and its
            # park call meant the cursor never existed — the next
            # consumer then initialized to the by-then head and the
            # in-between commits were silently skipped. Writing the
            # pin first means the worst a crash can do is re-deliver
            # the span (at-least-once, which the idempotent appliers
            # already absorb).
            _write_cursor(last)
        else:
            last = None  # initialize to head, consume nothing

        if last is None:
            _write_cursor(head)
            return None
        if last >= head:
            return None
        if max_versions is not None:
            if max_versions < 1:
                raise ValueError("max_versions must be >= 1")
            # cap the span to committed versions only: the head of this
            # span is the max_versions-th committed version above last
            upcoming = [v for v in self.versions() if v > last]
            head = upcoming[: max_versions][-1]
        # ``where`` composes the cursor with the bounded feed: a
        # subscriber tailing only its slice ('changes where region in
        # range') pays O(matching changed files) per span — the
        # zone-map pruning of changes(where=), under the same
        # at-least-once ack contract
        changes = self.changes(
            spark, last, head, key_cols=key_cols, where=where
        )

        def ack() -> int:
            _write_cursor(head)
            return head

        return changes, ack

    def vacuum(
        self, keep_versions: int = 1, min_age_seconds: float = 600.0,
        keep_from_version: int | None = None,
    ) -> dict[str, int]:
        """Reclaim storage: drop all but the newest ``keep_versions``
        manifests, then unlink every part file no retained manifest
        references — superseded COW originals and crashed writers'
        orphans alike. Run on maintenance cadence; ``keep_versions`` is
        the time-travel / in-flight-reader retention window (a reader
        pinned to a dropped version fails loudly at its next file open,
        the standard VACUUM trade).

        ``min_age_seconds``: an unreferenced file younger than this is
        SKIPPED — an in-flight writer's freshly staged files are
        indistinguishable from a crashed writer's orphans by reference
        alone, so a vacuum racing a live writer would yank its staging
        out from under the commit. The default (600s) is a conservative
        retention window so routine maintenance can never shoot a live
        writer; raise it above the longest expected write duration in
        a slow-writer deployment, and pass an EXPLICIT 0 to opt into
        aggressive reclaim when no writer can be in flight (tests,
        decommissioned tables).

        ``keep_from_version``: an ABSOLUTE retention floor — every
        manifest at or above it survives regardless of
        ``keep_versions``. This is the race-free contract a
        coordinating catalog needs: a floor expressed as a COUNT
        shifts when a commit lands between the caller's floor
        computation and this call, silently dropping the floor-pinned
        manifest; a floor expressed as a VERSION NUMBER cannot."""
        import time

        vs = self.versions()
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        keep = vs[-keep_versions:]
        if keep_from_version is not None:
            keep = sorted(
                set(keep) | {v for v in vs if v >= keep_from_version}
            )
        live: set[str] = set()
        for v in keep:
            with open(_manifest_path(self.root, v)) as f:
                m = json.load(f)
            live.update(m["files"])
            # position-delete files are live while any retained
            # manifest's dv block lists them
            live.update((m.get("dv") or {}).get("files", []))
        dropped_manifests = 0
        for v in vs:
            if v not in keep:
                _manifest_path(self.root, v).unlink()
                dropped_manifests += 1
        dropped_files = 0
        now = time.time()
        for p in self.root.rglob("*.parquet"):
            if str(p.relative_to(self.root)) not in live:
                if (
                    min_age_seconds > 0
                    and now - p.stat().st_mtime < min_age_seconds
                ):
                    continue
                p.unlink()
                dropped_files += 1
        # prune now-empty partition dirs so _partition_cols stays honest
        for d in sorted(
            (d for d in self.root.rglob("*") if d.is_dir()), reverse=True
        ):
            if d.name.startswith(("_", ".")):
                continue
            if not any(d.iterdir()):
                d.rmdir()
        return {"dropped_files": dropped_files,
                "dropped_manifests": dropped_manifests}


def _partition_cols_logged(root: Path) -> list[str]:
    """_partition_cols over a committed table: the layout check must
    ignore the ``_commits`` dir (underscore-hidden, so the shared walker
    already skips it) and tolerate superseded files awaiting vacuum —
    they live in the same hive dirs, so the walk is unchanged."""
    return _partition_cols(root, "commitlog")


def _count_files(spark: SparkSession, root: Path, rel: list[str]) -> int:
    if not rel:
        return 0
    return spark.read.option("basePath", str(root)).parquet(
        *(str(root / r) for r in rel)
    ).count()


def _footer_minmax(path: Path, columns: list[str]) -> dict:
    """Per-column (min, max, has_nulls) from the parquet FOOTER alone —
    no data pages read. Columns without statistics map to None (the
    caller must keep such files)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(str(path)).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for c in columns:
        i = idx.get(c)
        if i is None:
            out[c] = None  # hive-partitioned column: value lives in path
            continue
        lo = hi = None
        nulls = False
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            nulls = nulls or bool(st.null_count)
        out[c] = {"min": lo, "max": hi, "nulls": nulls} if ok else None
    return out


def _footer_nrows(path: Path) -> int:
    """Exact row count from the parquet footer alone — no data read."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(str(path)).metadata.num_rows)


_NROWS_KEY = "#rows"  # reserved sidecar key ('#' can't be a column name
# in these tables); per-file exact row counts, same cache as the stats

_STAT_FMT = 2  # cache format: typed (tagged) stat values


def _enc_stat(v):
    """Encode one footer stat value for the JSON sidecar so it
    ROUND-TRIPS TO A COMPARABLE TYPE — the r12 `default=str` dump
    stringified dates/timestamps/decimals, so every warm-cache run
    compared str against typed bounds, hit TypeError, and silently kept
    every file (pruning degraded to a full scan for those column types
    on the table's second process). Returns None for values that cannot
    be encoded faithfully (the caller then records "no stats" for the
    column — keep-the-file semantics, never a wrong prune). Long
    strings are deliberately dropped: a documents-table commit must not
    dump page-sized min/max values into the sidecar."""
    import base64
    import datetime
    import decimal

    if v is None or isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v if len(v) <= 256 else None
    if isinstance(v, datetime.datetime):
        return {"$t": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"$d": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"$n": str(v)}
    if isinstance(v, bytes):
        return (
            {"$b": base64.b64encode(v).decode("ascii")}
            if len(v) <= 256
            else None
        )
    return None


def _dec_stat(v):
    import base64
    import datetime
    import decimal

    if isinstance(v, dict):
        if "$t" in v:
            return datetime.datetime.fromisoformat(v["$t"])
        if "$d" in v:
            return datetime.date.fromisoformat(v["$d"])
        if "$n" in v:
            return decimal.Decimal(v["$n"])
        if "$b" in v:
            return base64.b64decode(v["$b"])
        return None
    return v


def _enc_entry(e: dict | None) -> dict | None:
    if e is None:
        return None
    mn, mx = _enc_stat(e["min"]), _enc_stat(e["max"])
    # an unencodable min/max degrades the COLUMN entry to "no stats"
    # (keep the file), never to a wrong comparison
    if (mn is None) != (e["min"] is None) or (mx is None) != (
        e["max"] is None
    ):
        return None
    return {"min": mn, "max": mx, "nulls": bool(e["nulls"])}


def _dec_entry(e: dict | None) -> dict | None:
    if e is None:
        return None
    return {
        "min": _dec_stat(e["min"]),
        "max": _dec_stat(e["max"]),
        "nulls": e["nulls"],
    }


_STAT_TYPES = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "boolean",
    "date",
    "string",
}


def _stat_columns(dtypes: list[tuple[str, str]]) -> list[str]:
    """Columns whose per-file min/max are worth recording at commit
    time: atomic comparable types. Binary and nested types are skipped
    (pruning on them is useless or bloats the sidecar)."""
    return [
        name
        for name, t in dtypes
        if t in _STAT_TYPES
        or t.startswith("decimal")
        or t.startswith("timestamp")
    ]


_BLOOM_TYPES = ("string", "bigint", "int", "smallint", "tinyint", "long")


def _bloom_positions_py(value, k: int, bits: int) -> list[int]:
    """The k bloom bit positions of ``value`` — PURE PYTHON twin of the
    Spark-side expression in ``_BloomIndex.build_for`` (md5 of
    '<string form>:<i>', first 15 hex chars as an int, mod bits), so
    the driver-side probe needs no Spark job and cannot diverge from
    what the writer recorded. Only string/integral columns are bloom-
    indexed: their Spark CAST(... AS STRING) form equals Python
    ``str()`` exactly, which makes a false NEGATIVE (pruning a file
    that holds the value) impossible by construction."""
    import hashlib

    return [
        int(
            hashlib.md5(f"{value}:{i}".encode()).hexdigest()[:15], 16
        ) % bits
        for i in range(k)
    ]


class _BloomIndex:
    """Per-file bloom-filter sidecars for POINT-LOOKUP data skipping —
    the complement of :class:`_ZoneMaps`: range stats prune nothing on
    a high-cardinality unclustered column (every file's [min, max]
    spans the whole domain — digests, ids after a shuffle), which is
    exactly where a membership filter shines. Delta calls this the
    bloom filter index; Parquet has footer blooms, but keeping ours in
    commit-scoped sidecars preserves the engine's rule that committed
    reads never re-open footers.

    Enabled per column via :meth:`TableLog.enable_bloom`; from then on
    every committed write records one sidecar per (new file, column)
    in ``_commits/_blooms/`` — an O(files-this-commit) pass over the
    just-written rows, JVM-side (md5 + conv inside codegen, one
    explode + collect_set per file whose set is capped at ``bits``).
    Data files are immutable, so sidecars never invalidate; a
    conflict-aborted stage leaves orphan sidecars (harmless, the
    zone-map discipline); files predating enablement simply have no
    sidecar and are always kept. Sizing: ~1% false-positive rate at
    bits ≈ 10 × rows-per-file with k=5 — and a false positive only
    costs reading one extra file, never correctness."""

    def __init__(self, log: "TableLog"):
        self.log = log
        self.dir = log.root / _LOG_DIR / "_blooms"
        self.cfg_path = log.root / _LOG_DIR / "_bloomconfig.json"

    def config(self) -> dict:
        try:
            return json.loads(self.cfg_path.read_text())
        except (OSError, ValueError):
            return {}

    def enable(self, column: str, bits: int = 131072, k: int = 5) -> dict:
        import tempfile

        if bits < 8 or k < 1:
            raise ValueError("need bits >= 8 and k >= 1")
        cfg = self.config()
        cfg[column] = {"bits": int(bits), "k": int(k)}
        self.cfg_path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=str(self.cfg_path.parent), prefix=".bloomcfg"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, str(self.cfg_path))
        return cfg

    def _sidecar(self, rel: str, column: str) -> Path:
        import hashlib

        name = hashlib.md5(f"{rel}::{column}".encode()).hexdigest()
        return self.dir / f"{name}.json"

    def build_for(
        self, spark: SparkSession, rel_files: list[str],
        columns: list[str],
    ) -> None:
        """Record bloom sidecars for just-written files (writer-side,
        called by ``_stage``)."""
        import base64
        import tempfile
        from urllib.parse import unquote, urlparse

        import numpy as np

        cfg = self.config()
        todo = [
            (r, c) for r in rel_files for c in columns
            if not self._sidecar(r, c).exists()
        ]
        if not todo:
            return
        paths = sorted({str(self.log.root / r) for r, _ in todo})
        df = spark.read.option(
            "basePath", str(self.log.root)
        ).parquet(*paths)
        self.dir.mkdir(parents=True, exist_ok=True)
        root = str(self.log.root.resolve())
        for column in columns:
            bits, k = cfg[column]["bits"], cfg[column]["k"]
            pos = F.array(*[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(
                                F.col(column).cast("string"),
                                F.lit(f":{i}"),
                            )),
                            1, 15,
                        ),
                        16, 10,
                    ).cast("long") % bits
                )
                for i in range(k)
            ])
            rows = (
                df.select(
                    F.input_file_name().alias("__f"),
                    F.explode(pos).alias("__p"),
                )
                .where(F.col("__p").isNotNull())
                .groupBy("__f")
                .agg(F.collect_set("__p").alias("__ps"))
                .collect()
            )
            by_rel: dict[str, list[int]] = {}
            for r in rows:
                p = unquote(urlparse(r["__f"]).path)
                if p.startswith(root):
                    by_rel[p[len(root):].lstrip("/")] = r["__ps"]
            for rel in rel_files:
                target = self._sidecar(rel, column)
                if target.exists():
                    continue
                arr = np.zeros(bits, dtype=bool)
                ps = by_rel.get(rel)
                if ps:
                    arr[np.asarray(ps, dtype=np.int64)] = True
                body = {
                    "file": rel, "column": column, "bits": bits,
                    "k": k,
                    "b64": base64.b64encode(
                        np.packbits(arr).tobytes()
                    ).decode(),
                }
                fd, tmp = tempfile.mkstemp(
                    dir=str(self.dir), prefix=".bloom"
                )
                with os.fdopen(fd, "w") as f:
                    json.dump(body, f)
                os.replace(tmp, str(target))

    def might_contain(self, rel: str, column: str, value) -> bool | None:
        """False = the file provably lacks ``value`` (safe to prune);
        True = maybe present; None = no sidecar / unprobeable value
        (caller must keep the file)."""
        import base64

        import numpy as np

        if not isinstance(value, (str, int)) or isinstance(value, bool):
            return None
        try:
            d = json.loads(self._sidecar(rel, column).read_text())
        except (OSError, ValueError):
            return None
        arr = np.unpackbits(
            np.frombuffer(base64.b64decode(d["b64"]), dtype=np.uint8)
        )
        for h in _bloom_positions_py(value, d["k"], d["bits"]):
            if not arr[h]:
                return False
        return True


class _ZoneMaps:
    """File-level min/max sidecar for a commit-logged table — the
    data-skipping index Delta keeps in its log and Iceberg in manifest
    entries. Data files are IMMUTABLE, so a file's stats never
    invalidate: the cache (`_commits/_filestats.json`) only ever gains
    entries, and a lost write in a cache race costs a re-read of some
    footers, never correctness.

    Stats are recorded AT COMMIT TIME by the writer (`TableLog._stage`
    calls :meth:`stats_for` on exactly the files it just wrote — an
    O(files-this-commit) pass proportional to the write itself), so a
    predicate read over a long-lived table consults the sidecar with
    ZERO footer reads. The footer path remains only as the backfill for
    init-adopted pre-existing files, and reads missing footers through
    a thread pool, never one file at a time."""

    def __init__(self, log: "TableLog"):
        self.log = log
        self.path = log.root / _LOG_DIR / "_filestats.json"

    def _load(self) -> dict:
        try:
            with open(self.path) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            return {"_fmt": _STAT_FMT}
        if cache.get("_fmt") != _STAT_FMT:
            # pre-typed (default=str) cache: discard — files are
            # immutable, so a rebuild from footers is always safe
            return {"_fmt": _STAT_FMT}
        return cache

    def stats_for(
        self,
        rel_files: list[str],
        columns: list[str],
        max_workers: int = 16,
    ) -> dict[str, dict]:
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        cache = self._load()
        todo: list[tuple[str, list[str]]] = []
        for rel in rel_files:
            have = cache.get(rel, {})
            missing = [c for c in columns if c not in have]
            if missing:
                todo.append((rel, missing))
        if todo:

            def one(item: tuple[str, list[str]]):
                rel, missing = item
                return rel, _footer_minmax(self.log.root / rel, missing)

            if len(todo) == 1:
                results = [one(todo[0])]
            else:
                with ThreadPoolExecutor(
                    min(max_workers, len(todo))
                ) as ex:
                    results = list(ex.map(one, todo))
            for rel, got in results:
                have = cache.setdefault(rel, {})
                have.update({c: _enc_entry(e) for c, e in got.items()})
            fd, tmp = tempfile.mkstemp(
                dir=str(self.path.parent), prefix=".stats"
            )
            with os.fdopen(fd, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, str(self.path))
        return {
            r: {
                c: _dec_entry(e)
                for c, e in cache.get(r, {}).items()
                if c != _NROWS_KEY
            }
            for r in rel_files
        }

    def rows_for(
        self, rel_files: list[str], max_workers: int = 16
    ) -> dict[str, int]:
        """Per-file EXACT row counts, cached under ``#rows`` in the
        same sidecar — recorded at write time by ``_stage`` (footer
        read of just-written files), backfilled through the thread
        pool for init-adopted files. Files are immutable, so a count
        never invalidates."""
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        cache = self._load()
        todo = [
            r for r in rel_files if _NROWS_KEY not in cache.get(r, {})
        ]
        if todo:

            def one(rel: str):
                return rel, _footer_nrows(self.log.root / rel)

            if len(todo) == 1:
                results = [one(todo[0])]
            else:
                with ThreadPoolExecutor(
                    min(max_workers, len(todo))
                ) as ex:
                    results = list(ex.map(one, todo))
            for rel, n in results:
                cache.setdefault(rel, {})[_NROWS_KEY] = n
            fd, tmp = tempfile.mkstemp(
                dir=str(self.path.parent), prefix=".stats"
            )
            with os.fdopen(fd, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, str(self.path))
        return {r: int(cache[r][_NROWS_KEY]) for r in rel_files}


def _path_value(rel: str, column: str):
    """The hive-encoded value of ``column`` in a file's path, parsed to
    int/float when it looks numeric, else the raw string; None when the
    path does not carry the column."""
    for seg in rel.replace("\\", "/").split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k == column:
                if v == "__HIVE_DEFAULT_PARTITION__":
                    return None
                for cast in (int, float):
                    try:
                        return cast(v)
                    except ValueError:
                        pass
                return v
    return None


def _prune_files(
    log: TableLog, files: list[str], preds: dict[str, tuple]
) -> tuple[list[str], dict]:
    """Zone-map prune of an ARBITRARY manifest-file list: keep only
    files whose per-file [min, max] (commit-time sidecar stats, or the
    path-encoded value for hive-layout columns) can intersect each
    ``column: (lo, hi)`` bound. A file without stats is kept, never
    dropped — pruning is an optimization, not the filter. Shared by
    snapshot reads (:func:`_prune_snapshot`) and the CDF path
    (:meth:`TableLog.changes` with ``where=``), which prunes the
    entering/leaving file sets instead of a whole snapshot."""
    zm = _ZoneMaps(log)
    keep = list(files)
    for column, (lo, hi) in preds.items():
        data_files = [r for r in keep if column not in _path_layout(r)]
        stats = zm.stats_for(data_files, [column]) if data_files else {}

        def overlaps(mn, mx, lo=lo, hi=hi) -> bool:
            try:
                if lo is not None and mx is not None and mx < lo:
                    return False
                if hi is not None and mn is not None and mn > hi:
                    return False
            except TypeError:
                return True  # incomparable types: keep, never drop
            return True

        nxt: list[str] = []
        for rel in keep:
            if column in _path_layout(rel):
                val = _path_value(rel, column)
                if val is None or overlaps(val, val):
                    nxt.append(rel)
                continue
            st = stats.get(rel, {}).get(column)
            if st is None:
                nxt.append(rel)  # no stats: cannot prune safely
                continue
            if overlaps(st["min"], st["max"]):
                nxt.append(rel)
        keep = nxt
    # EQUALITY bounds additionally consult bloom sidecars: on a
    # high-cardinality unclustered column every file's [min, max]
    # spans the domain (zone maps prune nothing), which is the case
    # membership filters exist for. might_contain() returning False is
    # a proof of absence (see _bloom_positions_py); None (no sidecar,
    # unprobeable type) keeps the file.
    bl = _BloomIndex(log)
    cfg = bl.config()
    for column, (lo, hi) in preds.items():
        if lo is None or lo != hi or column not in cfg:
            continue
        keep = [
            rel for rel in keep
            if column in _path_layout(rel)
            or bl.might_contain(rel, column, lo) is not False
        ]
    report = {
        "files_total": len(files),
        "files_read": len(keep),
        "files_pruned": len(files) - len(keep),
    }
    return keep, report


def _prune_snapshot(
    log: TableLog,
    spark: SparkSession,
    preds: dict[str, tuple],
    version: int | None = None,
):
    """Shared zone-map prune core: scan ONLY the manifest files whose
    per-file [min, max] can intersect each ``column: (lo, hi)`` bound
    in ``preds``. Returns ``(df, report)`` — ``df`` WITH the range
    filters still applied (pruning is an optimization, never the
    filter itself: a file without stats is kept, not dropped)."""
    v, files = log.snapshot(version)
    schema = log.schema_of(v)
    dv = log._dv_of(v) or None
    keep, report = _prune_files(log, files, preds)
    if not keep:
        if schema is None or isinstance(schema, str):
            # schemaless manifest (init-adopted v0): read one file so
            # the result keeps the table shape; the filter below still
            # makes it empty. One footer-sized read, not a failure.
            if files:
                keep = files[:1]
                report["files_read"] = 1
                report["files_pruned"] = len(files) - 1
                df = log._read_files(spark, keep, schema, dv=dv)
            else:
                raise ValueError(f"v{v} is empty and carries no schema")
        else:
            df = spark.createDataFrame([], schema)
    else:
        # merge-on-read deletes apply AFTER pruning: DVs remove rows,
        # never files, so file-level skipping is unaffected — the
        # anti-join runs over the kept files only
        df = log._read_files(spark, keep, schema, dv=dv)
    for column, (lo, hi) in preds.items():
        if lo is not None:
            df = df.where(F.col(column) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(column) <= F.lit(hi))
    return df, report


def read_pruned(
    log: TableLog,
    spark: SparkSession,
    column: str,
    lo=None,
    hi=None,
    version: int | None = None,
):
    """Zone-map data skipping over a commit-logged table: scan ONLY the
    manifest files whose per-file [min, max] for ``column`` can
    intersect [lo, hi] — the file-level stats pruning Delta keeps in
    its log and Iceberg in manifest entries. Stats are recorded at
    COMMIT time by the writing job (``_stage``), so this consults the
    sidecar with zero footer reads on committed data; init-adopted
    pre-existing files backfill from footers through a thread pool
    once (immutable files — stats never invalidate). Hive-partitioned
    files prune on their path-encoded value. Returns ``(df, report)``
    where ``df`` is the kept files' scan WITH the range filter still
    applied (pruning is an optimization, never the filter itself — a
    file without footer stats is kept, not dropped) and ``report``
    counts total/read/pruned files.

    The same pruning runs automatically inside :meth:`TableLog.read`
    when a ``where=`` bound is supplied; this explicit form
    additionally returns the prune report.

    At 100 TB this composes with `maintenance.compact(sort_by=...)` /
    `write_clustered`: range-clustering makes per-file ranges narrow
    and disjoint, so a point or range predicate reads O(matching
    files), and the driver-side prune costs one sidecar pass —
    no Spark job, no file listing beyond the manifest."""
    return _prune_snapshot(log, spark, {column: (lo, hi)}, version)
