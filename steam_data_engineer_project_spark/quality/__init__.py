"""dbt-style declarative data-quality checks (SURVEY §2.11)."""

from .checks import (  # noqa: F401
    accepted_range,
    not_null,
    relationships,
    run_checks,
    unique,
)
