"""CVE-domain parity query builders (SURVEY §3.2–3.3).

Parameterized DataFrame builders replacing the reference's string-built
SQL (cve_manager.py:400,411,418,424,434,442,492,500,545). Injection-proof
by construction (F.lit parameters, never string concat — F8) and free of
the reference's accidental bugs (§2.11): the N+1 CWE lookup loop becomes
one broadcast left join; the CPE path works regardless of auth mode; the
missing-space-before-OR lexing hazard disappears with expressions.

All builders take DataFrames (any source: flattened feeds, catalog
tables, JDBC) so they are generic over deployment.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import is_digits, strip_charset_prefix


def cvss_vs_cpes(cvss: DataFrame, cpe: DataFrame) -> DataFrame:
    """The cvss_vs_cpes view (cve_manager.py:79-90): inner equi-join on cve,
    σ(vulnerable='True'), fixed projection."""
    return (
        cpe.where(F.col("vulnerable") == "True")
        .join(cvss, "cve", "inner")
        .select(
            "cve",
            "base_score_3",
            "base_severity_3",
            "base_score",
            "severity",
            "cpe23uri",
            "description",
            "published_date",
        )
    )


def cve_detail(
    cvss: DataFrame, cve_problem: DataFrame, cpe: DataFrame, cwe: DataFrame, cve_id: str
) -> dict[str, DataFrame]:
    """Point/detail lookup (cve_manager.py:399-429): three result sections
    from one parameterized id.

    - ``summary``: the :400 projection, contains-match on the id. The
      reference fetchone()s an arbitrary row; we order by cve for a
      deterministic first row (documented deviation, SURVEY §2.6 A1).
    - ``problems``: strip/digit-gate the CWE label then LEFT broadcast
      join to cwe — the reference's per-row point-query loop (:415-423),
      N+1 round trips → zero (the dim ships with the plan).
    - ``cpes``: the :424 filter.
    """
    like = F.col("cve").contains(F.lit(cve_id))
    summary = (
        cvss.where(like)
        .select(
            "cve",
            "vector_string_3",
            "base_score_3",
            "base_severity_3",
            "vector_string",
            "base_score",
            "severity",
            "description",
            "published_date",
            "last_modified_date",
        )
        .orderBy("cve")
    )
    probs = (
        cve_problem.where(like)
        .withColumn("cwe_num", strip_charset_prefix(F.col("problem"), "CWE-"))
        .withColumn(
            "cwe_id",
            F.when(is_digits(F.col("cwe_num")), F.col("cwe_num").cast("int")),
        )
        .join(F.broadcast(cwe.select("cwe_id", "name")), "cwe_id", "left")
        .select("cve", "problem", F.col("name").alias("cwe_name"))
    )
    cpes = cpe.where(like & (F.col("vulnerable") == "True")).select("cve", "cpe23uri")
    return {"summary": summary, "problems": probs, "cpes": cpes}


def cves_by_score_date(
    cvss: DataFrame, score: float, date: datetime.date | str | None = None
) -> DataFrame:
    """Score/date threshold scan (cve_manager.py:434,442): the :434 OR is
    SQL 3VL — a CVE with only a V2 score still matches on the V2 arm."""
    out = cvss.select(
        "cve", "base_score_3", "vector_string_3", "base_score", "vector_string", "published_date"
    ).where((F.col("base_score_3") >= score) | (F.col("base_score") >= score))
    if date is not None:
        out = out.where(F.col("published_date") >= F.lit(date).cast("date"))
    return out


def cves_by_cpe(
    view: DataFrame, cpe_pattern: str, score: float, date: datetime.date | str | None = None
) -> DataFrame:
    """CPE substring scan over the view (cve_manager.py:492,500)."""
    out = view.select(
        "cpe23uri", "cve", "base_score_3", "base_score", "published_date"
    ).where(
        F.col("cpe23uri").contains(F.lit(cpe_pattern))
        & ((F.col("base_score_3") >= score) | (F.col("base_score") >= score))
    )
    if date is not None:
        out = out.where(F.col("published_date") >= F.lit(date).cast("date"))
    return out


def cwe_detail(cwe: DataFrame, cwe_id: int) -> DataFrame:
    """CWE point lookup (cve_manager.py:545): SELECT * WHERE cwe_id = n."""
    return cwe.where(F.col("cwe_id") == int(cwe_id)).orderBy("cwe_id")
