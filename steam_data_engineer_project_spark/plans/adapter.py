"""Steam-shaped source tables derived deterministically from the TPC-H-ish
driver testdata — the fixture adapter the model DAG runs against.

The mapping preserves the structural properties the dbt models depend on
(star schema with bridges, append-only price series, review stream keyed to
games), so every model exercises the same join/aggregate shapes as the
reference while staying oracle-checkable from the base parquet tables:

- games           ← part       (game_id = p_partkey, title = p_name)
- developers      ← supplier   (many-many to games through lineitem)
- publishers      ← nation     (via the supplying nation)
- genres/languages← p_type / p_brand (attribute dims of the part itself)
- prices          ← lineitem   (game_id = l_partkey, ts = l_shipdate)
- reviews         ← 'view' events (appid = user_id; joins are LEFT, so
                    appids outside the game range simply don't enrich)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import initial_price


def steam_sources(
    spark: SparkSession, tables: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Build the Steam-shaped source dict from loaded base tables."""
    part = tables["part"]
    supplier = tables["supplier"]
    nation = tables["nation"]
    lineitem = tables["lineitem"]
    events = tables["events"]

    games = part.select(
        F.col("p_partkey").alias("game_id"),
        F.col("p_name").alias("title"),
        F.col("p_type").alias("description"),
        F.pmod(F.col("p_partkey"), F.lit(19)).cast("int").alias("required_age"),
    )
    developers = supplier.select(
        F.col("s_suppkey").alias("dev_id"), F.col("s_name").alias("name")
    )
    publishers = nation.select(
        F.col("n_nationkey").alias("pub_id"), F.col("n_name").alias("name")
    )
    game_developers = lineitem.select(
        F.col("l_partkey").alias("game_id"), F.col("l_suppkey").alias("dev_id")
    ).distinct()
    game_publishers = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("l_partkey").alias("game_id"),
            F.col("s_nationkey").alias("pub_id"),
        )
        .distinct()
    )
    # genres / languages: attribute dims carried on the part row itself —
    # the bridge is (game, attribute-value).
    game_genres = part.select(
        F.col("p_partkey").alias("game_id"), F.col("p_type").alias("genre")
    )
    game_languages = part.select(
        F.col("p_partkey").alias("game_id"), F.col("p_brand").alias("language")
    )
    # round() before the int cast: 0.03*100 is 2.9999999999999996 in binary —
    # a bare double->int cast truncates in Spark but rounds in other engines.
    disc_pct = F.round(F.col("l_discount") * 100).cast("int")
    prices = lineitem.select(
        F.col("l_partkey").alias("game_id"),
        F.col("l_extendedprice").alias("price"),
        disc_pct.alias("discount"),
        initial_price(F.col("l_extendedprice"), disc_pct).alias("initial_price"),
        F.col("l_shipdate").alias("timestamp"),
    )
    reviews = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").cast("string").alias("appid"),  # raw shape: string
        F.concat(
            F.lit("author_"), F.pmod(F.col("event_id"), F.lit(97)).cast("string")
        ).alias("author_steamid"),
        F.col("event_id").cast("string").alias("recommendationid"),
        F.expr("unix_micros(ts) DIV 1000000").alias("timestamp_created"),
        (F.col("value") > 50).alias("voted_up"),
    )
    return {
        "games": games,
        "developers": developers,
        "publishers": publishers,
        "game_developers": game_developers,
        "game_publishers": game_publishers,
        "game_genres": game_genres,
        "game_languages": game_languages,
        "prices": prices,
        "reviews": reviews,
    }
