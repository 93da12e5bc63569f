"""Sinks (SURVEY §2.1 S5/S6/S8).

- ``write_tab_csv``: distributed tab-separated CSV (the engine-native
  form of the reference's three flatten outputs, cve_manager.py:218-229).
- ``write_reference_csv``: byte-parity single-file variant with the
  reference's exact header spellings (which contain duplicate names —
  impossible as DataFrame columns, so the header line is prepended
  driver-side to the single part file). Compatibility sink only; the
  distributed writer is the scale path.
- ``export_results``: comma CSV query-result export (:456-472,514-530) —
  distributed write, no driver-side buffering of the result set.
- ``write_jdbc`` / ``write_postgres_copy``: S6 bulk load. JDBC batch
  insert is the portable path; the COPY fast path streams each partition
  through psycopg2 ``copy_expert`` (the reference's one genuinely good
  performance idea, :344, kept — but per-partition and parallel instead
  of single-threaded).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

from cve_manager_spark.schemas import CSV_HEADERS


def write_tab_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("sep", "\t").option("header", True).option(
        "emptyValue", ""
    ).csv(path)


def write_reference_csv(df: DataFrame, out_file: str, relation: str) -> None:
    """Single tab-CSV file with the reference header line (:227-229)."""
    tmp = out_file + ".tmp.d"
    df.coalesce(1).write.mode("overwrite").option("sep", "\t").option(
        "header", False
    ).option("emptyValue", "").csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    with open(out_file, "w", encoding="utf8") as out:
        out.write("\t".join(CSV_HEADERS[relation]) + "\r\n")
        with open(part, encoding="utf8") as f:
            shutil.copyfileobj(f, out)
    shutil.rmtree(tmp)


def export_results(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Query-result CSV export (S8): distributed, header on, comma sep."""
    df.write.mode(mode).option("header", True).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    mode: str = "append",
    batchsize: int = 10000,
) -> None:
    """S6 portable bulk load: JDBC batched inserts (cve_manager.py:321-360)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()


def write_postgres_copy(
    df: DataFrame, dsn: str, table: str, sep: str = "\t", null: str = ""
) -> None:
    """S6 fast path: per-partition Postgres COPY (the :344 copy_from,
    parallelized). Each executor task opens its own connection and
    streams its partition — COPY throughput × #partitions, no driver
    bottleneck. Requires psycopg2 on executors; gated import."""
    if len(sep) != 1:
        raise ValueError("COPY delimiter must be a single character")
    columns = df.columns
    copy_options = (
        f"FORMAT csv, DELIMITER '{sep.replace(chr(39), chr(39) * 2)}', "
        f"NULL '{null.replace(chr(39), chr(39) * 2)}'"
    )

    def copy_partition(rows) -> None:
        import csv as _csv
        import io as _io

        import psycopg2  # deferred: optional dependency

        buf = _io.StringIO()
        writer = _csv.writer(buf, delimiter=sep, lineterminator="\n")
        n = 0
        for row in rows:
            writer.writerow([null if v is None else v for v in row])
            n += 1
        if n == 0:
            return
        buf.seek(0)
        with psycopg2.connect(dsn) as con:
            with con.cursor() as cur:
                cols = ", ".join(columns)
                cur.copy_expert(
                    f"COPY {table} ({cols}) FROM STDIN WITH ({copy_options})",
                    buf,
                )
            con.commit()

    df.foreachPartition(copy_partition)
