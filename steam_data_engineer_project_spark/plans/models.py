"""The dbt model DAG as named DataFrame builders with declared dependencies
(SURVEY §3.1). ``build`` materializes models in topological order; staging
models are view-like (lazy DataFrames Catalyst inlines, exactly like dbt's
`materialized='view'` + MySQL view expansion), marts are whatever the caller
persists them as.

Models and their reference SQL (file:line under /root/reference/steam_analytics):

- stg_games            models/staging/stg_games.sql:3-14 (P1)
- stg_prices           models/staging/stg_prices.sql:3-11 (P2)
- stg_developers/_publishers  models/staging/stg_developers.sql:3-7 etc (P3)
- stg_reviews          models/staging/stg_reviews.sql:3-10 — REPAIRED: the
                       reference calls an undefined `get_reviews` macro and
                       errors (target/run_results.json); here it is a real
                       source + the model body's CAST and FROM_UNIXTIME.
- dim_games            models/marts/core/dim_games.sql:1-22 (J1 + A1,
                       GROUP_CONCAT canonicalized with sort_array)
- fact_reviews         models/marts/core/fact_reviews.sql:1-10 (W1). The
                       reference re-applies FROM_UNIXTIME to an
                       already-converted column (fact_reviews.sql:7 vs
                       stg_reviews.sql:8) — evident intent implemented:
                       one conversion, documented deviation.
- game_quality_metrics models/marts/business/game_quality_metrics.sql:1-15
                       (J2 + A2) — the AVG deliberately runs over the
                       reviews×prices join fanout, preserved exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.aggregates import davg, group_concat_distinct


@dataclass(frozen=True)
class Model:
    name: str
    deps: tuple[str, ...]
    build: Callable[[dict[str, DataFrame]], DataFrame]


def _stg_games(t: dict[str, DataFrame]) -> DataFrame:
    g = t["games"]
    return g.select("game_id", "title", "description", "required_age").filter(
        F.col("title").isNotNull() & (F.col("title") != "")
    )


def _stg_prices(t: dict[str, DataFrame]) -> DataFrame:
    p = t["prices"]
    return p.filter(
        (F.col("price") >= 0) & (F.col("discount") >= 0) & (F.col("initial_price") >= 0)
    )


def _stg_developers(t: dict[str, DataFrame]) -> DataFrame:
    return t["developers"].filter(
        F.col("name").isNotNull() & (F.col("name") != "")
    )


def _stg_publishers(t: dict[str, DataFrame]) -> DataFrame:
    return t["publishers"].filter(
        F.col("name").isNotNull() & (F.col("name") != "")
    )


def _stg_reviews(t: dict[str, DataFrame]) -> DataFrame:
    r = t["reviews"]
    return r.select(
        # try_cast: the raw crawler shape carries appid as string; garbage
        # nulls out (and is dropped by the not-null guard) instead of
        # aborting the model under ANSI mode.
        F.col("appid").try_cast("int").alias("appid"),
        "author_steamid",
        "recommendationid",
        F.timestamp_seconds(F.col("timestamp_created")).alias("review_ts"),
        "voted_up",
    ).filter(F.col("appid").isNotNull() & F.col("author_steamid").isNotNull())


def _dim_games(t: dict[str, DataFrame]) -> DataFrame:
    stg = t["stg_games"]
    devs = (
        t["game_developers"]
        .join(t["stg_developers"], "dev_id")
        .groupBy("game_id")
        .agg(group_concat_distinct(F.col("name")).alias("developers"))
    )
    pubs = (
        t["game_publishers"]
        .join(t["stg_publishers"], "pub_id")
        .groupBy("game_id")
        .agg(group_concat_distinct(F.col("name")).alias("publishers"))
    )
    genres = t["game_genres"].groupBy("game_id").agg(
        group_concat_distinct(F.col("genre")).alias("genres")
    )
    langs = t["game_languages"].groupBy("game_id").agg(
        group_concat_distinct(F.col("language")).alias("languages")
    )
    return (
        stg.join(devs, "game_id", "left")
        .join(pubs, "game_id", "left")
        .join(genres, "game_id", "left")
        .join(langs, "game_id", "left")
        .select(
            "game_id",
            "title",
            "required_age",
            "developers",
            "publishers",
            "genres",
            "languages",
        )
    )


def _fact_reviews(t: dict[str, DataFrame]) -> DataFrame:
    r = t["stg_reviews"]
    return r.select(
        "appid",
        "author_steamid",
        "recommendationid",
        F.unix_micros("review_ts").alias("review_ts_us"),
        "voted_up",
        F.count("*").over(Window.partitionBy("appid")).alias("review_count"),
    )


def _game_quality_metrics(t: dict[str, DataFrame]) -> DataFrame:
    # The reference SQL aggregates AFTER the dim×reviews×prices join, so its
    # AVG runs over the join fanout. Pre-aggregating per game is PROVABLY
    # identical here: the fanout duplicates every price row of a game the
    # same n times, which scales davg's micro-unit sum and count both by n
    # — and floor((n·S)/(n·C)) = floor(S/C), MIN is duplication-invariant,
    # and review_count is constant per game. Same values, but the big
    # prices table is reduced to one row per game BEFORE the join instead
    # of being exploded reviews× through it — the only plan that survives
    # a 100× scale-up of prices and reviews.
    dim = t["dim_games"]
    price_agg = t["stg_prices"].groupBy("game_id").agg(
        davg(F.col("price")).alias("avg_price"),
        davg(F.col("discount")).alias("avg_discount"),
        F.min("initial_price").alias("min_initial_price"),
    )
    review_agg = t["fact_reviews"].groupBy("appid").agg(
        F.count("*").alias("review_count")
    )
    return (
        dim.join(review_agg, dim.game_id == review_agg.appid, "left")
        .join(price_agg, "game_id", "left")
        .select(
            "game_id",
            "title",
            "developers",
            "genres",
            "review_count",
            "avg_price",
            "avg_discount",
            "min_initial_price",
        )
    )


#: topological order is list order (deps always precede dependents)
MODELS: tuple[Model, ...] = (
    Model("stg_games", ("games",), _stg_games),
    Model("stg_prices", ("prices",), _stg_prices),
    Model("stg_developers", ("developers",), _stg_developers),
    Model("stg_publishers", ("publishers",), _stg_publishers),
    Model("stg_reviews", ("reviews",), _stg_reviews),
    Model(
        "dim_games",
        (
            "stg_games",
            "stg_developers",
            "stg_publishers",
            "game_developers",
            "game_publishers",
            "game_genres",
            "game_languages",
        ),
        _dim_games,
    ),
    Model("fact_reviews", ("stg_reviews",), _fact_reviews),
    Model(
        "game_quality_metrics",
        ("dim_games", "fact_reviews", "stg_prices"),
        _game_quality_metrics,
    ),
)


def build(sources: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Materialize the DAG: returns sources + every model, dependency-checked.

    Lazy DataFrames throughout — Catalyst inlines staging 'views' into the
    marts that reference them (predicate pushdown + column pruning across
    model boundaries for free, like dbt view materialization minus the
    round trips).
    """
    out = dict(sources)
    for m in MODELS:
        missing = [d for d in m.deps if d not in out]
        if missing:
            raise ValueError(f"model {m.name}: unresolved deps {missing}")
        out[m.name] = m.build(out)
    return out
