#!/usr/bin/env python3
"""Dump .explain('formatted') for registered queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag     e.g. r12 (output dir plans/r12/)
  suffix  e.g. before / after
  query   optional subset of query names (default: all registered queries)

Runs on the bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
partitions = cpus) so the captured plans match what the bench executes.
Building a query's DataFrame may perform its documented build-time work
(fixture caches, store builds) exactly as the bench's warmup does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from steam_data_engineer_project_spark.queries import QUERIES
    from steam_data_engineer_project_spark.session import get_spark

    spark = get_spark(
        "steam-spark-plan-dump", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    targets = names or list(QUERIES)
    for name in targets:
        spec = QUERIES[name]
        df = spec.spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
