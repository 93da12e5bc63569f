"""Schemas: NVD JSON 1.1 feed, the four relational tables, and the view.

The reference has no schema on the JSON side — fields are reached by
hard-coded dict paths with a try/except KeyError ladder
(cve_manager.py:249-317). Here the feed gets an explicit StructType:
Spark resolves absent subtrees to NULL, which replaces the entire
exception ladder with ordinary null semantics. (Automatic nested-schema
pruning covers parquet/ORC, not JSON — use ``feed_schema_for`` below to
hand the JSON parser a minimal schema per output relation.)

Relational schemas follow the reference DDL (cve_manager.py:22-91) with
Spark-native types: character(n) → string, real → double (matches the
DuckDB-oracle arithmetic), date stays date.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType())


_LANG_VALUE = ArrayType(
    StructType([_s("lang"), _s("value")])
)

_CPE_MATCH = ArrayType(
    StructType(
        [
            StructField("vulnerable", BooleanType()),
            _s("cpe23Uri"),
        ]
    )
)

_CVSS_V3 = StructType(
    [
        _s("vectorString"),
        _s("attackVector"),
        _s("attackComplexity"),
        _s("privilegesRequired"),
        _s("userInteraction"),
        _s("scope"),
        _s("confidentialityImpact"),
        _s("integrityImpact"),
        _s("availabilityImpact"),
        StructField("baseScore", DoubleType()),
        _s("baseSeverity"),
    ]
)

_CVSS_V2 = StructType(
    [
        _s("vectorString"),
        _s("accessVector"),
        _s("accessComplexity"),
        _s("authentication"),
        _s("confidentialityImpact"),
        _s("integrityImpact"),
        _s("availabilityImpact"),
        StructField("baseScore", DoubleType()),
    ]
)

# One CVE item (element of CVE_Items, cve_manager.py:245-317).
NVD_ITEM = StructType(
    [
        StructField(
            "cve",
            StructType(
                [
                    StructField("CVE_data_meta", StructType([_s("ID"), _s("ASSIGNER")])),
                    StructField(
                        "problemtype",
                        StructType(
                            [
                                StructField(
                                    "problemtype_data",
                                    ArrayType(
                                        StructType([StructField("description", _LANG_VALUE)])
                                    ),
                                )
                            ]
                        ),
                    ),
                    StructField(
                        "description",
                        StructType([StructField("description_data", _LANG_VALUE)]),
                    ),
                ]
            ),
        ),
        StructField(
            "configurations",
            StructType(
                [
                    _s("CVE_data_version"),
                    StructField(
                        "nodes",
                        ArrayType(
                            StructType(
                                [
                                    _s("operator"),
                                    StructField("cpe_match", _CPE_MATCH),
                                    StructField(
                                        "children",
                                        ArrayType(
                                            StructType(
                                                [
                                                    _s("operator"),
                                                    StructField("cpe_match", _CPE_MATCH),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        StructField(
            "impact",
            StructType(
                [
                    StructField(
                        "baseMetricV3",
                        StructType(
                            [
                                StructField("cvssV3", _CVSS_V3),
                                StructField("exploitabilityScore", DoubleType()),
                                StructField("impactScore", DoubleType()),
                            ]
                        ),
                    ),
                    StructField(
                        "baseMetricV2",
                        StructType(
                            [
                                StructField("cvssV2", _CVSS_V2),
                                _s("severity"),
                                StructField("exploitabilityScore", DoubleType()),
                                StructField("impactScore", DoubleType()),
                                StructField("obtainAllPrivilege", BooleanType()),
                                StructField("obtainOtherPrivilege", BooleanType()),
                                StructField("obtainUserPrivilege", BooleanType()),
                                StructField("userInteractionRequired", BooleanType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        _s("publishedDate"),
        _s("lastModifiedDate"),
    ]
)

# Whole yearly feed file (header scalars + CVE_Items, cve_manager.py:240-245).
NVD_FEED = StructType(
    [
        _s("CVE_data_type"),
        _s("CVE_data_format"),
        _s("CVE_data_version"),
        _s("CVE_data_numberOfCVEs"),
        _s("CVE_data_timestamp"),
        StructField("CVE_Items", ArrayType(NVD_ITEM)),
    ]
)

# Relational targets (cve_manager.py:22-91). Column order matches the CSV
# header order (:227-229) so the tab-CSV sink is a plain write.
CVSS = StructType(
    [
        _s("cve"),
        _s("attack_complexity_3"),
        _s("attack_vector_3"),
        _s("availability_impact_3"),
        _s("confidentiality_impact_3"),
        _s("integrity_impact_3"),
        _s("privileges_required_3"),
        _s("scope_3"),
        _s("user_interaction_3"),
        _s("vector_string_3"),
        StructField("exploitability_score_3", DoubleType()),
        StructField("impact_score_3", DoubleType()),
        StructField("base_score_3", DoubleType()),
        _s("base_severity_3"),
        _s("access_complexity"),
        _s("access_vector"),
        _s("authentication"),
        _s("availability_impact"),
        _s("confidentiality_impact"),
        _s("integrity_impact"),
        StructField("obtain_all_privileges", BooleanType()),
        StructField("obtain_other_privileges", BooleanType()),
        StructField("obtain_user_privileges", BooleanType()),
        StructField("user_interaction_required", BooleanType()),
        _s("vector_string"),
        StructField("exploitability_score", DoubleType()),
        StructField("impact_score", DoubleType()),
        StructField("base_score", DoubleType()),
        _s("severity"),
        _s("description"),
        StructField("published_date", DateType()),
        StructField("last_modified_date", DateType()),
    ]
)

CPE = StructType([_s("cve"), _s("cpe23uri"), _s("vulnerable")])

CVE_PROBLEM = StructType([_s("cve"), _s("problem")])

CWE = StructType(
    [
        StructField("cwe_id", IntegerType()),
        _s("name"),
        _s("description"),
        _s("extended_description"),
        _s("modes_of_introduction"),
        _s("common_consequences"),
        _s("potential_mitigations"),
    ]
)

# CSV header spellings, cve_manager.py:227-229 (kept for byte-parity sinks).
CSV_HEADERS = {
    "cve_cpes": ["CVE", "cpe23Uri", "Vulnerable"],
    "cve_related_problems": ["CVE", "Problem"],
    "cve_cvss_scores": [
        "CVE", "Attack Complexity", "Attack Vector", "Availability Impact",
        "Confidentiality Impact", "Integrity Impact", "Privileges Required",
        "Scope", "UserInteraction", "Vector String", "Exploitability Score",
        "Impact Score", "base Score", "base Severity", "Access Complexity",
        "Access Vector", "Authentication", "Availability Impact",
        "Confidentiality Impact", "Integrity Impact", "Obtain All Privilege",
        "Obtain Other Privilege", "Obtain User Privilege",
        "User Interaction Required", "Vector String", "Exploitability Score",
        "impact Score", "baseScore", "severity", "Description",
        "Published Date", "Last Modified Date",
    ],
}


# ---------------------------------------------------------------------------
# Per-relation pruned read schemas for the JSON source.
#
# Spark's nested-schema pruning applies to parquet/ORC scans, NOT to JSON:
# the JSON parser materializes every field in the schema it is given. For
# feed-scale ETL the parse dominates, so reading one relation with the full
# NVD schema wastes ~85% of the work (measured 6.7s → 0.95s on a 15k-item
# feed when pruned). ``feed_schema_for`` builds the minimal schema for a
# set of output relations; ``flatten_all`` still uses the full schema
# (every subtree is needed once all three relations are produced).
# ---------------------------------------------------------------------------

def _prune_struct(schema: StructType, paths: list[list[str]]) -> StructType:
    """Keep only fields on the given paths; arrays are transparent. A path
    ending at a struct keeps that whole subtree."""
    fields = []
    for f in schema.fields:
        sub = [p[1:] for p in paths if p and p[0] == f.name]
        if not sub:
            continue
        if any(len(p) == 0 for p in sub):
            fields.append(f)  # whole subtree requested
            continue
        dt = f.dataType
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            pruned = _prune_struct(dt.elementType, sub)
            fields.append(StructField(f.name, ArrayType(pruned), f.nullable))
        elif isinstance(dt, StructType):
            fields.append(StructField(f.name, _prune_struct(dt, sub), f.nullable))
        else:
            fields.append(f)
    return StructType(fields)


RELATION_FEED_PATHS = {
    "cvss": [
        "CVE_Items.cve.CVE_data_meta.ID",
        "CVE_Items.cve.description",
        "CVE_Items.impact",
        "CVE_Items.publishedDate",
        "CVE_Items.lastModifiedDate",
    ],
    "cve_problem": [
        "CVE_Items.cve.CVE_data_meta.ID",
        "CVE_Items.cve.problemtype",
    ],
    "cpe": [
        "CVE_Items.cve.CVE_data_meta.ID",
        "CVE_Items.configurations.nodes",
    ],
}


def feed_schema_for(*relations: str) -> StructType:
    """Minimal NVD feed read schema producing the given relations
    (subset of {'cvss', 'cve_problem', 'cpe'})."""
    paths: list[list[str]] = []
    for rel in relations:
        paths += [p.split(".") for p in RELATION_FEED_PATHS[rel]]
    return _prune_struct(NVD_FEED, paths)
