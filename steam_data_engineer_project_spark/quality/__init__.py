"""dbt-style declarative data-quality checks (SURVEY §2.11)."""

from .checks import (  # noqa: F401
    accepted_range,
    accepted_range_rule,
    not_null,
    not_null_rule,
    relationships,
    row_rules_single_pass,
    run_checks,
    unique,
)
