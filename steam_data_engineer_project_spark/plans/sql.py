"""The mart SQL surface: verbatim-adjacent Spark SQL for the dbt models
(SURVEY §3.1 step 5 — `spark.sql` over registered temp views replaces dbt's
compiled-SQL-over-MySQL execution; Catalyst replaces MySQL's planner).

Dialect translation from the reference MySQL (models/marts/core/
dim_games.sql:1-22): ``GROUP_CONCAT(DISTINCT x)`` becomes
``concat_ws(',', sort_array(collect_set(x)))`` — sort_array canonicalizes
the ordering MySQL leaves unspecified (SURVEY §4 determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: models/marts/core/dim_games.sql:1-22 in Spark dialect
DIM_GAMES_SQL = """
SELECT g.game_id, g.title, g.required_age,
       d.developers, p.publishers, ge.genres, la.languages
FROM stg_games g
LEFT JOIN (
    SELECT gd.game_id,
           concat_ws(',', sort_array(collect_set(sd.name))) AS developers
    FROM game_developers gd JOIN stg_developers sd ON gd.dev_id = sd.dev_id
    GROUP BY gd.game_id
) d ON g.game_id = d.game_id
LEFT JOIN (
    SELECT gp.game_id,
           concat_ws(',', sort_array(collect_set(sp.name))) AS publishers
    FROM game_publishers gp JOIN stg_publishers sp ON gp.pub_id = sp.pub_id
    GROUP BY gp.game_id
) p ON g.game_id = p.game_id
LEFT JOIN (
    SELECT game_id, concat_ws(',', sort_array(collect_set(genre))) AS genres
    FROM game_genres GROUP BY game_id
) ge ON g.game_id = ge.game_id
LEFT JOIN (
    SELECT game_id, concat_ws(',', sort_array(collect_set(language))) AS languages
    FROM game_languages GROUP BY game_id
) la ON g.game_id = la.game_id
"""


def register_views(tables: dict[str, DataFrame]) -> None:
    """Register every source/model as a temp view — dbt's
    `materialized='view'`: Catalyst inlines them into consumers with
    pushdown/pruning across the boundary."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)


def run_model_sql(
    spark: SparkSession, tables: dict[str, DataFrame], sql: str
) -> DataFrame:
    register_views(tables)
    return spark.sql(sql)
