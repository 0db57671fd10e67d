#!/usr/bin/env python3
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

Each query executes through the noop sink — full physical plan runs (scan,
shuffle, agg), nothing is collected to the driver, which is how these
operators would run on a cluster (write to a distributed sink).
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
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from steam_data_engineer_project_spark.queries import QUERIES
    from steam_data_engineer_project_spark.session import get_spark

    spark = get_spark("steam-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    # JVM/codegen warm-up on the smallest SF so measured times reflect the
    # engine, not first-query JIT.
    QUERIES["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.time()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"total_wall_sec_{len(timings)}_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
