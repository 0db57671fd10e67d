"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators); ``oracle_sql()`` gives the DuckDB
equivalent for the driver's correctness gate. Implementation lives in
``steam_data_engineer_project_spark`` — see that package and SURVEY.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from steam_data_engineer_project_spark.queries import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; entries without an oracle
    (non-SQL-expressible ops) are omitted -> driver records rows-only."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
