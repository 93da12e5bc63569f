"""Expression helpers (SURVEY.md §2.3, §4.3)."""

from cve_manager_spark.functions.helpers import (  # noqa: F401
    dec_avg,
    dec_mul_sum,
    dec_sum,
    is_digits,
    normalize_ws,
    pybool_str,
    strip_charset_prefix,
)
