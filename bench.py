#!/usr/bin/env python3
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

Each query executes through the noop sink — full physical plan runs (scan,
shuffle, agg), nothing is collected to the driver, which is how these
operators would run on a cluster (write to a distributed sink).

Methodology: every query is first warmed once at sf0.001 (forces Catalyst
analysis + whole-stage codegen + Python-worker startup for its plan), then
timed over REPEAT passes at the target SF with the per-query minimum
reported. Steady-state timing is the honest scale signal here: one-time
driver-side JIT/compile costs are O(1) per query shape, not O(data), so on
a real cluster run they vanish into the first seconds of a 100 TB job; the
min-over-passes also shields the numbers from unrelated host activity
(this box runs a periodic monitor) without hiding any per-row cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re as _re

    _m = _re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = _m.group(1).rstrip(".") if _m else os.path.basename(sf_dir.rstrip("/"))

    from steam_data_engineer_project_spark.queries import QUERIES
    from steam_data_engineer_project_spark.session import get_spark

    spark = get_spark("steam-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    # Warm every query's plan at the smallest SF so measured times reflect
    # per-row engine work, not first-run JIT/codegen (see module docstring).
    for spec in QUERIES.values():
        spec.spark(spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for _ in range(max(1, repeats)):
        for name, spec in QUERIES.items():
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"total_wall_sec_{len(timings)}_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "passes": max(1, repeats),
                "note": "per-query min over passes after sf0.001 plan warmup",
            }
        )
    )


if __name__ == "__main__":
    main()
