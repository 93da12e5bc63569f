"""NVD feed flattener: nested JSON → the three relational DataFrames
(SURVEY §2.4, §3.1; reference dataflow cve_manager.py:249-317).

The reference walks one CVE dict at a time in a single Python process,
handling absent subtrees with a KeyError-message ladder (:259-277) and a
hand-rolled conditional node walk (:285-317). Here the whole flatten is
one declarative plan per output relation:

    read feed (explicit schema) → explode(CVE_Items) → struct-path
    projection (absent subtree ⇒ NULL) → explode nested arrays

which Catalyst turns into FileScan→Generate→Project with nested-schema
pruning — executor-parallel per input file/split, no driver-side state.
At 100 TB of feeds this is the difference between "peak RAM = corpus"
(:245, all_cves list concat) and a streaming per-split pipeline.

Documented deviations from the reference (accidental behaviors, not
semantics — SURVEY §2.11):
- a CVE whose metric block is *partially* populated emits a row with
  NULLs for the absent leaves; the reference drops the whole row when the
  KeyError message matches no branch (:316 'Error e').
- rows are emitted in executor order, not feed-file order (the relations
  are unordered sets; the reference's order was an artifact of its loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cve_manager_spark.functions.helpers import normalize_ws, pybool_str


def explode_items(feed_df: DataFrame) -> DataFrame:
    """One row per CVE item, with the item's id precomputed."""
    return feed_df.select(F.explode("CVE_Items").alias("item")).select(
        F.col("item.cve.CVE_data_meta.ID").alias("cve"), "item"
    )


def _description(item: F.Column) -> F.Column:
    """Concatenate all description_data values, normalize CR/LF/TAB
    (cve_manager.py:252-256)."""
    joined = F.array_join(item["cve"]["description"]["description_data"]["value"], "")
    return normalize_ws(joined)


def flatten_cvss(feed_df: DataFrame) -> DataFrame:
    """The 32-column cvss relation (cve_manager.py:258 row build).

    The V3/V2/userInteractionRequired fallback ladder (:259-277) is
    subsumed by NULL propagation through nullable struct paths: a missing
    baseMetricV3 yields NULL for every *_3 column, exactly the None
    fill-in of the :260-262 branch, and so on for V2 and the V2-only
    userInteractionRequired case (:269-270).
    """
    items = explode_items(feed_df)
    item = F.col("item")
    v3 = item["impact"]["baseMetricV3"]
    c3 = v3["cvssV3"]
    v2 = item["impact"]["baseMetricV2"]
    c2 = v2["cvssV2"]
    return items.select(
        F.col("cve"),
        c3["attackComplexity"].alias("attack_complexity_3"),
        c3["attackVector"].alias("attack_vector_3"),
        c3["availabilityImpact"].alias("availability_impact_3"),
        c3["confidentialityImpact"].alias("confidentiality_impact_3"),
        c3["integrityImpact"].alias("integrity_impact_3"),
        c3["privilegesRequired"].alias("privileges_required_3"),
        c3["scope"].alias("scope_3"),
        c3["userInteraction"].alias("user_interaction_3"),
        c3["vectorString"].alias("vector_string_3"),
        v3["exploitabilityScore"].alias("exploitability_score_3"),
        v3["impactScore"].alias("impact_score_3"),
        c3["baseScore"].alias("base_score_3"),
        c3["baseSeverity"].alias("base_severity_3"),
        c2["accessComplexity"].alias("access_complexity"),
        c2["accessVector"].alias("access_vector"),
        c2["authentication"].alias("authentication"),
        c2["availabilityImpact"].alias("availability_impact"),
        c2["confidentialityImpact"].alias("confidentiality_impact"),
        c2["integrityImpact"].alias("integrity_impact"),
        v2["obtainAllPrivilege"].alias("obtain_all_privileges"),
        v2["obtainOtherPrivilege"].alias("obtain_other_privileges"),
        v2["obtainUserPrivilege"].alias("obtain_user_privileges"),
        v2["userInteractionRequired"].alias("user_interaction_required"),
        c2["vectorString"].alias("vector_string"),
        v2["exploitabilityScore"].alias("exploitability_score"),
        v2["impactScore"].alias("impact_score"),
        c2["baseScore"].alias("base_score"),
        v2["severity"].alias("severity"),
        _description(item).alias("description"),
        F.to_date(F.substring(item["publishedDate"], 1, 10)).alias("published_date"),
        F.to_date(F.substring(item["lastModifiedDate"], 1, 10)).alias("last_modified_date"),
    )


def flatten_problems(feed_df: DataFrame) -> DataFrame:
    """(cve, problem) — double explode of the CWE label nesting
    (cve_manager.py:280-284)."""
    items = explode_items(feed_df)
    return (
        items.select(
            "cve",
            F.explode(F.col("item.cve.problemtype.problemtype_data")).alias("pt"),
        )
        .select("cve", F.explode(F.col("pt.description")).alias("d"))
        .select("cve", F.col("d.value").alias("problem"))
    )


def flatten_cpe(feed_df: DataFrame) -> DataFrame:
    """(cve, cpe23uri, vulnerable) — conditional node walk
    (cve_manager.py:285-317) as a CASE over arrays + one explode.

    Reference semantics reproduced exactly:
    - node has a ``children`` key → emit the children's cpe_match entries
      ONLY (the node's own cpe_match is ignored on that branch, and an
      empty children list emits nothing);
    - otherwise → the node's own cpe_match if present;
    - the :306-315 else-branch re-loop is dead code (re-reads node i,
      which the branch guarantees has no cpe_match) → contributes nothing;
    - entries without cpe23Uri are dropped (:297,304);
    - ``vulnerable`` is emitted in Python bool spelling 'True'/'False'
      (:298 str(...)).
    """
    items = explode_items(feed_df)
    node = F.col("node")
    empty = F.array().cast("array<struct<vulnerable:boolean,cpe23Uri:string>>")
    # children[].cpe_match is an array-of-arrays; children lacking a
    # cpe_match key contribute NULL inner arrays — filtered, then flattened.
    children_matches = F.flatten(
        F.filter(node["children"]["cpe_match"], lambda m: m.isNotNull())
    )
    matches = F.when(node["children"].isNotNull(), children_matches).otherwise(
        F.coalesce(node["cpe_match"], empty)
    )
    return (
        items.select("cve", F.explode(F.col("item.configurations.nodes")).alias("node"))
        .select("cve", F.explode(matches).alias("m"))
        .where(F.col("m.cpe23Uri").isNotNull())
        .select(
            "cve",
            F.col("m.cpe23Uri").alias("cpe23uri"),
            pybool_str(F.col("m.vulnerable")).alias("vulnerable"),
        )
    )


def flatten_all(feed_df: DataFrame) -> dict[str, DataFrame]:
    """All three relations from one feed DataFrame. Each output is its own
    plan over the shared (cached if reused) feed scan."""
    return {
        "cvss": flatten_cvss(feed_df),
        "cve_problem": flatten_problems(feed_df),
        "cpe": flatten_cpe(feed_df),
    }
