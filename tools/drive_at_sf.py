"""Driver-style correctness gate at an arbitrary scale factor.

Mirrors the external driver: vanilla session (hostile non-UTC TZ probe),
every registered query vs its DuckDB oracle over the same parquet tables,
comparing sorted column names, row count, and order-insensitive values
(floats rounded to 9 places). Writes a CORRECTNESS_r{N}-shaped JSON.

Usage: python tools/drive_at_sf.py <sf_dir> <out_json>
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def rows(df):
    names = sorted(df.columns)
    cols = [[canon(x) for x in df[c].tolist()] for c in names]
    return sorted(zip(*cols), key=lambda r: tuple((x is None, str(x)) for x in r))


def main() -> int:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("drive-at-sf")
        .config("spark.sql.session.timeZone", "America/New_York")
        # the gate COLLECTS full results for comparison — at sf1.0 several
        # queries return 5-10 M rows, far past local-mode's 1g default heap.
        # (The production answer is "don't collect"; a correctness gate must.)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    results, fails = {}, []
    for name in qs:
        t0 = time.time()
        entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            con = duckdb.connect()
            for t in TABLES:
                p = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                        if os.path.isdir(p)
                        else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            ddf = con.execute(oracles[name]).fetch_arrow_table().to_pandas()
            entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(ddf)
            entry["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
            entry["rows_match"] = len(sdf) == len(ddf)
            entry["hash_match"] = (
                entry["schema_match"]
                and entry["rows_match"]
                and rows(sdf) == rows(ddf)
            )
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            entry["err"] = f"{type(e).__name__}: {e}"[:400]
        ok = entry["hash_match"]
        if not ok:
            fails.append(name)
        print(f"{name:36s}{'OK' if ok else 'FAIL':6s}{time.time()-t0:7.1f}s", flush=True)
        results[name] = entry
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("FAILS:", ", ".join(fails) if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
