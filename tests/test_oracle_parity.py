"""Replicates the driver's correctness gate locally: run every registered
query on Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values. Catching a mismatch here means catching it before
CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from steam_data_engineer_project_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_arrow_table()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    pycols = [[_canon(x) for x in cols[i]] for i in order]
    return sorted(zip(*pycols), key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_DIR)
    spark_tbl = sdf.toPandas()
    duck_tbl = _duck(spec.oracle).to_pandas()

    assert sorted(spark_tbl.columns) == sorted(
        duck_tbl.columns
    ), f"{name}: column names differ"
    assert len(spark_tbl) == len(duck_tbl), f"{name}: row count differs"

    s_rows = _rows(list(spark_tbl.columns), [spark_tbl[c].tolist() for c in spark_tbl.columns])
    d_rows = _rows(list(duck_tbl.columns), [duck_tbl[c].tolist() for c in duck_tbl.columns])
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatching rows: {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is None]
)
def test_rows_only_queries_run(spark, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
