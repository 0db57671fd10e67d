"""Spot benchmark for the heaviest registry queries at a high notch.

The full bench (bench.py) at sf2.0 would spend most of its wall time on
queries whose scaling is already settled; the spot gate tracks only the
heaviest set (the same queries CORRECTNESS_sf2.json hash-checks), so the
sf1→sf2 scaling ratios in SCALE.md stay reproducible.

Usage:
    python tools/spot_bench.py <sf_dir> <out_json> [q1,q2,...]

Defaults to the 8-query round-6 gate set. Same methodology as bench.py:
warm every plan at sf0.001, then per-query min over
$SPARK_GRAFT_BENCH_REPEATS (default 2) passes through the noop sink.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATE_QUERIES = [
    "streaming_state_suite",
    "dedup_ngram_jaccard_docs",
    "dedup_minhash_lsh_docs",
    "dedup_simhash_docs",
    "dedup_cluster_canonical",
    "dedup_embedding_cosine",
    "dedup_cross_corpus",
    "corpus_pipeline_e2e",
    # round 7 additions: the stored-codebook ANN serve path (3rd-heaviest
    # at sf1 before the store landed — the gate now tracks the fix) and
    # the stored-artifact lifecycle suite
    "ann_ivf_topk",
    "corpus_store_suite",
]


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else GATE_QUERIES
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = m.group(1).rstrip(".") if m else os.path.basename(sf_dir.rstrip("/"))

    from steam_data_engineer_project_spark.queries import QUERIES
    from steam_data_engineer_project_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark(
        "steam-spark-spot-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    for name in names:
        QUERIES[name].spark(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    timings: dict[str, float] = {}
    for _ in range(max(1, repeats)):
        for name in names:
            t0 = time.time()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    payload = {
        "metric": f"spot_wall_sec_top{len(timings)}",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "note": f"per-query min over {max(1, repeats)} passes after sf0.001 plan warmup",
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(payload))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
