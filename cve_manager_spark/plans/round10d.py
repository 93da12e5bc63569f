"""Round-10d tranche: data-governance audits — the privacy-risk numbers
a dataset release (or a training-corpus card) must report before data
leaves the boundary.

k-anonymity / l-diversity / re-identification-uniqueness are the
standard disclosure-risk measures (Sweeney; Machanavajjhala et al.) —
all three are pure integer aggregates over quasi-identifier groups, so
unlike the DP-noise family (inherently nondeterministic) they
hash-verify exactly. The quasi-identifiers here are the customer
dimensions (nation, market segment, account-balance band — the
attributes a linker would join on); the sensitive attribute is the
order priority. At 100 TB each audit is one group-by over the
dimension table (plus one fact join for l-diversity): the audits cost
a report query, which is why releases can afford to gate on them.

Determinism notes: the balance band is FLOOR(x*100) cents (exact on
both engines — the supplier_hhi recipe) trunc-divided; all shares are
integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cve_manager_spark.plans.spec import QuerySpec
from cve_manager_spark.sources.testdata import load_table

SPECS: list[QuerySpec] = []


def _register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 5,
):
    def deco(fn):
        SPECS.append(
            QuerySpec(
                name=name,
                build=fn,
                oracle=oracle,
                doc=doc or (fn.__doc__ or ""),
                tags=tags,
                priority=priority,
            )
        )
        return fn

    return deco


_KANON_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS k
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_rows
FROM g GROUP BY k
"""


@_register(
    "k_anonymity_audit",
    _KANON_ORACLE,
    doc="k-anonymity profile of the customer table under the "
    "(nation, market-segment) quasi-identifier: the distribution of "
    "equivalence-class sizes — how many groups (and how many ROWS) "
    "sit at each k. Rows in k=1 groups are directly re-identifiable "
    "by anyone holding the quasi-identifier; a release gate reads "
    "'no rows below k=5' straight off this histogram. One group-by "
    "over the dimension table + a bounded re-aggregate.",
)
def k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k")
    )
    return g.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
    )


_LDIV_ORACLE = """
SELECT c.c_nationkey, c.c_mktsegment,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_distinct
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey, c.c_mktsegment
"""


@_register(
    "l_diversity_audit",
    _LDIV_ORACLE,
    doc="l-diversity of the order-priority 'sensitive attribute' within "
    "each (nation, segment) quasi-identifier group: a group can be "
    "k-anonymous yet still leak — if every order in it shares one "
    "priority, knowing someone is in the group reveals their value "
    "(the homogeneity attack l-diversity exists to catch). Emits per "
    "group the member/order counts and the distinct sensitive-value "
    "count; l=1 groups are the leak. One fact join + one group-by; "
    "the group relation is dimension-bounded.",
)
def l_diversity_audit(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey)
    return j.groupBy("c_nationkey", "c_mktsegment").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("l_distinct"),
    )


_UNIQ_ORACLE = """
WITH q AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) // 200000 AS bal_band
  FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment, bal_band, CAST(COUNT(*) AS BIGINT) AS k
  FROM q GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT CAST(SUM(k) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) * 1000000
            // SUM(k) AS BIGINT) AS unique_ppm,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_below_k5,
       CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000
            // SUM(k) AS BIGINT) AS below_k5_ppm
FROM g
"""


@_register(
    "quasi_id_uniqueness",
    _UNIQ_ORACLE,
    doc="Re-identification risk under a RICHER quasi-identifier — "
    "(nation, segment, 2000-unit account-balance band): the share of "
    "customers whose combination is UNIQUE in the table (a linker "
    "holding these three attributes re-identifies them outright) and "
    "the share in sub-k=5 groups. Adding one numeric band to the "
    "k_anonymity_audit quasi-ID typically explodes uniqueness — the "
    "measurement behind 'generalize or drop the column' release "
    "decisions. The band is FLOOR(x*100) exact cents trunc-divided "
    "(engine-identical on negative balances); output is one summary "
    "row of exact integers/ppm.",
)
def quasi_id_uniqueness(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    band = F.expr(
        "CAST(FLOOR(c_acctbal * 100) AS BIGINT) div 200000"
    ).alias("bal_band")
    g = cust.select("c_nationkey", "c_mktsegment", band).groupBy(
        "c_nationkey", "c_mktsegment", "bal_band"
    ).agg(F.count(F.lit(1)).alias("k"))
    uniq = F.when(F.col("k") == 1, 1).otherwise(0)
    small = F.when(F.col("k") < 5, F.col("k")).otherwise(0)
    return g.groupBy().agg(
        F.sum("k").cast("bigint").alias("n_customers"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(uniq).cast("bigint").alias("n_unique"),
        F.expr(
            "CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) * 1000000 "
            "div sum(k) AS BIGINT)"
        ).alias("unique_ppm"),
        F.sum(small).cast("bigint").alias("n_rows_below_k5"),
        F.expr(
            "CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000 "
            "div sum(k) AS BIGINT)"
        ).alias("below_k5_ppm"),
    )
