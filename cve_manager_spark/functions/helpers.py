"""Tiny expression helpers.

Two families:

1. Reference-parity scalar semantics (SURVEY §2.3) — the reference is
   Python + Postgres, whose string/bool spellings differ from Spark's:
   - ``pybool_str``: Python ``str(True)`` == ``'True'`` (cve_manager.py:258,
     298) vs Spark's ``cast('string')`` == ``'true'``.
   - ``strip_charset_prefix``: Python ``lstrip('CWE-')`` strips any of the
     *characters* C,W,E,- from the left (cve_manager.py:416), not the
     literal prefix — charset semantics, reproduced exactly.
   - ``is_digits``: ``str.isdigit`` gate before the CWE lookup join
     (cve_manager.py:417).
   - ``normalize_ws``: CR/LF/TAB → space in descriptions
     (cve_manager.py:254-256).

2. Exact-decimal aggregation (engine-wide rule). Floating-point SUM is
   order-dependent; on a 1000-executor cluster the partial-aggregation
   order is nondeterministic run to run, so a double SUM is not even equal
   to *itself* across runs, let alone to an oracle. Every money/measure
   aggregate therefore casts to DECIMAL (exact, associative), aggregates,
   and casts the final scalar back to double. This costs nothing
   observable (decimal sum is still whole-stage-codegen'd, map-side
   partial aggregation still applies) and buys bitwise-deterministic
   results at any scale.

All helpers return Column expressions built from ``pyspark.sql.functions``
only — they stay inside whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pybool_str(c: Column) -> Column:
    """Boolean → Python-spelled string: True→'True', False→'False', NULL→NULL."""
    return F.when(c.isNull(), F.lit(None).cast("string")).when(c, "True").otherwise("False")


def strip_charset_prefix(c: Column, charset: str = "CWE-") -> Column:
    """Exact ``str.lstrip(charset)`` semantics: strip any leading run of the
    given characters ('CWE-89'→'89', 'NVD-CWE-noinfo' unchanged only in the
    intended-prefix reading — lstrip actually eats chars; we reproduce
    lstrip, per cve_manager.py:416)."""
    # Escape regex metacharacters inside a character class: only '-' and
    # ']' and '\\' and '^' matter; keep '-' last.
    inner = "".join(ch for ch in charset if ch != "-").replace("\\", "\\\\").replace("]", "\\]")
    if "-" in charset:
        inner += "-"
    return F.regexp_replace(c, f"^[{inner}]+", "")


def is_digits(c: Column) -> Column:
    """``str.isdigit`` over ASCII: non-empty all-digit string."""
    return c.rlike("^[0-9]+$")


def normalize_ws(c: Column) -> Column:
    """Replace CR, LF, TAB with single spaces (cve_manager.py:254-256)."""
    return F.translate(c, "\r\n\t", "   ")


# ---------------------------------------------------------------------------
# Exact-decimal aggregation
# ---------------------------------------------------------------------------

def dec(c: Column, scale: int = 4, precision: int = 18) -> Column:
    """Cast a double measure to exact decimal for associative aggregation."""
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(c: Column, scale: int = 4, precision: int = 18) -> Column:
    """Order-independent SUM of a double column: sum as decimal, emit double."""
    return F.sum(dec(c, scale, precision)).cast("double")


def dec_mul_sum(a: Column, b: Column, scale: int = 4, precision: int = 18) -> Column:
    """SUM(a*b) with both factors decimal-cast first: the product is exact
    (scale adds), the sum is exact, the final double is deterministic."""
    return F.sum(dec(a, scale, precision) * dec(b, scale, precision)).cast("double")


def dec_avg(c: Column, scale: int = 4, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double.

    Both operands of the final division are exactly reproducible, so the
    double quotient is bitwise deterministic (unlike built-in avg(double)).
    """
    return (F.sum(dec(c, scale, precision)).cast("double") / F.count(c)).cast("double")


# ---------------------------------------------------------------------------
# Parallelism guard for compute-bound operators
# ---------------------------------------------------------------------------

_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _byte_string(raw: str, default: int = 134_217_728) -> int:
    """JVM ``JavaUtils.byteStringAsBytes`` semantics for size confs:
    ``"134217728"`` → bytes, ``"128m"``/``"128MB"`` → 128·2²⁰, case-
    insensitive. Digit-stripping is NOT equivalent — it turned "128m"
    into 128 *bytes*, which made fan_out's estimated partition count
    astronomical so the guard silently never repartitioned (ADVICE r6),
    reintroducing the single-partition hazard this module documents.
    Unrecognized forms fall back to the 128 MB Spark default."""
    s = str(raw).strip().lower()
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    num, suffix = s[:i], s[i:].strip()
    if not num or suffix not in _BYTE_SUFFIX:
        return default
    return int(num) * _BYTE_SUFFIX[suffix]


def fan_out(df, target: int | None = None):
    """Repartition up to the cluster's parallelism when the input has too
    few partitions.

    Small parquet files scan as ONE partition (a 600 KB documents file =
    one row group), so a compute-heavy narrow operator (shingling,
    fingerprinting, per-row vector math) runs single-threaded on a
    many-core executor — measured 2.8× on the Jaccard pipeline. At real
    scale inputs carry enough partitions and this is a no-op; the
    round-robin shuffle of raw rows is only paid when parallelism is
    actually missing.

    The scan-partition count is ESTIMATED driver-side from the scan's
    file list and (for local files) sizes — ``df.rdd.getNumPartitions()``
    would answer exactly but forces an RDD plan translation per call, a
    plan-build side effect a shared production session shouldn't pay.
    Non-local filesystems skip the stat and assume adequate parallelism
    (the documented at-scale no-op case); callers that know better pass
    ``target`` explicitly.
    """
    import math
    import os
    from urllib.parse import unquote, urlparse

    try:
        sess = df.sparkSession
        target = target or sess.sparkContext.defaultParallelism
        files = df.inputFiles()
    except Exception:
        # Spark Connect has no sparkContext; there the session is remote
        # and scan parallelism is the server's concern.
        return df
    if not files:
        return df  # in-memory relation: no file scan to widen
    try:
        raw = sess.conf.get("spark.sql.files.maxPartitionBytes")
        max_pb = _byte_string(raw)
    except Exception:
        max_pb = 134_217_728
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return df  # remote FS: trust the scan's own parallelism
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return df
    # Spark packs files into splits of maxPartitionBytes, charging each
    # file openCostInBytes (4 MB default) — so both one big file and many
    # tiny ones estimate the way FilePartition actually bins them
    n = math.ceil((total + 4_194_304 * len(files)) / max_pb)
    if n < target:
        return df.repartition(target)
    return df


# --- KMV theta sketch (shared by plans.sketches and streaming.sinks) ---

# h = first 15 md5 hex chars as a 60-bit integer — the engine-shared
# uniform hash (Spark conv(hex,16,10) == DuckDB CAST('0x'||hex AS
# BIGINT) bit-for-bit on 15-char inputs, both < 2^60).
KMV_POW60 = 1152921504606846976  # 2^60


def long_array_sql(vals) -> str:
    """SQL text of an ``array<bigint>`` literal — for callers that embed
    the array inside a larger single F.expr string (one py4j round trip
    for the WHOLE expression, see :func:`long_array_lit`)."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def long_array_lit(vals) -> Column:
    """``array<bigint>`` literal built as ONE parsed SQL expression.

    ``F.lit(list)`` / ``F.array(*[F.lit(v) for v in vals])`` cross the
    py4j boundary once per element (measured: ~34 ms for a 64-wide array,
    ~150 ms for the per-element form) — pure DRIVER time paid every time
    a query embeds a frozen vector (centroids, PCA directions, drift
    stats). One ``F.expr`` string is a single round trip (~7 ms); the
    optimizer constant-folds the parsed CreateArray of foldable literals
    into the exact same Literal node, so physical plans are unchanged.
    """
    if not vals:
        return F.lit([]).cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def long_matrix_lit(rows) -> Column:
    """``array<array<bigint>>`` literal via ONE parsed expression — the
    2-D companion of :func:`long_array_lit` (a k x d centroid table via
    ``F.lit`` measured ~390 ms of py4j chatter; this form is ~60 ms)."""
    if not rows:
        return F.lit([]).cast("array<array<bigint>>")
    inner = ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in r) + ")" for r in rows
    )
    return F.expr(f"array({inner})")


def double_array_lit(vals) -> Column:
    """``array<double>`` literal via ONE parsed expression (see
    :func:`long_array_lit`). ``repr`` round-trips IEEE doubles exactly
    and the SQL parser's correctly-rounded parse restores the same bits;
    non-finite values fall back to the per-element path."""
    import math

    fs = [float(v) for v in vals]
    if not fs or not all(math.isfinite(v) for v in fs):
        return F.array(*[F.lit(v) for v in fs])
    return F.expr("array(" + ",".join(f"{v!r}D" for v in fs) + ")")


def values_relation(spark, rows, colspec: str):
    """Tiny literal relation as a pure-JVM ``VALUES`` LocalRelation.

    ``spark.createDataFrame(small_list)`` parallelizes pickled rows over
    ``defaultParallelism`` partitions, so every ACTION that touches the
    3-row spine spawns a Python worker per core just to deserialize it —
    measured ~7 core-s / 32 mostly-empty tasks per run on local[32], and
    the worker-fork storm is what made those queries degrade first under
    host load. ``VALUES`` parses in one py4j call and scans as a
    LocalTableScan: zero Python workers, zero tasks for the spine.

    ``colspec`` is the same "name type, ..." DDL string createDataFrame
    took; values are rendered as typed SQL literals (int/long/double/
    string/bool/None).
    """
    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return str(v) if -2147483648 <= v <= 2147483647 else f"{v}L"
        if isinstance(v, float):
            # repr of a non-finite float ('nan'/'inf') is not a SQL
            # literal — it parsed as a bare identifier and failed loudly.
            # Spark's string→double cast accepts these spellings exactly
            # (same values double_array_lit guards against).
            if v != v:
                return "CAST('NaN' AS DOUBLE)"
            if v == float("inf"):
                return "CAST('Infinity' AS DOUBLE)"
            if v == float("-inf"):
                return "CAST('-Infinity' AS DOUBLE)"
            return f"{v!r}D"
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    cols = [c.strip().split()[0] for c in colspec.split(",")]
    types = [c.strip().split(None, 1)[1] for c in colspec.split(",")]
    rows = list(rows)
    if not rows:
        # `VALUES` needs at least one tuple; an all-NULL dummy filtered
        # back out keeps the zero-row relation a pure-JVM LocalRelation
        # (degenerate inputs — e.g. a BPE merge table trained on an
        # empty-token corpus — reach here)
        body = "(" + ",".join("NULL" for _ in cols) + ")"
        df = spark.sql(
            f"SELECT * FROM VALUES {body} AS t({','.join(cols)}) WHERE 1=0"
        )
    else:
        body = ",".join(
            "(" + ",".join(render(v) for v in r) + ")" for r in rows
        )
        df = spark.sql(f"SELECT * FROM VALUES {body} AS t({','.join(cols)})")
    from pyspark.sql import functions as FF

    return df.select(
        *[FF.col(c).cast(t).alias(c) for c, t in zip(cols, types)]
    )


def kmv_hash60(elem: Column) -> Column:
    """60-bit uniform hash of an element expression for KMV sketches."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(elem), 1, 15), 16, 10).cast("long")


def kmv_nhat_sql(k_eff: str, theta: str, k: int) -> str:
    """SQL for the KMV distinct estimate: a not-full sketch holds its
    whole set (exact); a full one estimates (k-1) * 2^60 / theta_k in
    DECIMAL(38,0). One definition keeps the batch audit and the
    streaming probe in provable lockstep (stream == batch tests)."""
    return (
        f"CAST(CASE WHEN {k_eff} < {k} THEN {k_eff} "
        f"ELSE CAST({k - 1} AS DECIMAL(38,0)) * {KMV_POW60} div {theta} "
        f"END AS BIGINT)"
    )
