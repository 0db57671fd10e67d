"""Derive per-query wall-time budgets for tests/test_budgets.py.

Runs every registered query twice at sf0.001 through the noop sink (the
second pass is the steady-state one — plans compiled, fixtures cached) and
prints a TIME_BUDGET dict pinning each query at ~2.5× its measured
steady-state time with a 3 s floor (sub-second queries would otherwise fail
on scheduler jitter alone). Re-run on a quiet machine whenever a query's
cost profile legitimately changes, and commit the regenerated table with
the justification.

Usage: python tools/derive_time_budgets.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_BUDGET_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from steam_data_engineer_project_spark.queries import QUERIES
    from steam_data_engineer_project_spark.session import get_spark

    spark = get_spark(
        "steam-spark-budgets", master="local[8]", shuffle_partitions=8
    )
    # the budgets only mean something relative to THIS host's speed —
    # print the calibration reference the test suite scales them by, and
    # re-pin tests/test_budgets.py:CALIB_REF together with the table.
    from tests.test_budgets import _calibration_pass

    calib = sorted(_calibration_pass(spark) for _ in range(7))
    print(f"CALIB_REF = {calib[7 // 2]:.2f}  # median of 7 passes")
    best: dict[str, float] = {}
    for _ in range(2):
        for name, spec in QUERIES.items():
            t0 = time.time()
            spec.spark(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    print("TIME_BUDGET = {")
    for name in sorted(best):
        budget = max(3.0, round(2.5 * best[name], 1))
        print(f'    "{name}": {budget},  # measured {best[name]:.2f}s')
    print("}")


if __name__ == "__main__":
    main()
