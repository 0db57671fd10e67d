"""Sweep `max_doc_freq` over the corpus-store doc tier to expose the
cost hump that SCALE.md's three-point curve attributes to df-vs-cap
mechanics.

The claim: the serve-side posting join costs Σ df_corpus·df_batch per
surviving shingle; duplicate copies multiply every shingle's df, so at a
given copy count the shingles whose df sits just UNDER the cap are
maximal pain (cap² pairs each) while shingles past the cap cost zero.
Sweeping the cap at one fixed notch moves the boundary instead of the
data: a low cap sheds the common band (cheap), a high cap admits it
(expensive), and the measured pair count + wall time should rise
monotonically with the cap — which is exactly the knob a 100 TB
deployment turns (cap ∝ tolerated duplication, not corpus size).

Usage:
    python tools/cap_sweep.py [sf_dir] [cap1,cap2,...] [out_json]

Defaults: /root/repo/.sf2data and caps 50,100,200,400,800. Prints one
JSON line per cap: candidate pairs surviving, docs with a near match,
and the wall time of the store-served verdict plan (min over
$SPARK_GRAFT_BENCH_REPEATS passes, noop sink, after a first untimed
pass that warms the store build). With out_json, also writes the full
sweep as one committed artifact (a JSON object with a "sweep" list) so
SCALE.md's cap-knee numbers are reproducible files, not prose.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from steam_data_engineer_project_spark import queries as Q  # noqa: E402
from steam_data_engineer_project_spark.operators import (  # noqa: E402
    incremental_dedup_verdicts,
    normalized_hashes,
)
from steam_data_engineer_project_spark.operators.dedup import (  # noqa: E402
    shingle_table,
)
from steam_data_engineer_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf2data"
    caps = (
        [int(c) for c in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [50, 100, 200, 400, 800]
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    spark = get_spark(
        "cap-sweep",
        master=f"local[{int(os.environ.get('SPARK_GRAFT_CPUS', '32'))}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )

    d = Q._store_text(spark, sf_dir)
    grp = F.col("doc_id") % 10
    corpus = d.filter(grp <= 7)
    batch = d.filter(grp.isin(8, 9))

    # Build the stored artifacts once (untimed) — the sweep varies only
    # the serve-time cap, mirroring corpus_store_suite's serve path.
    root = tempfile.mkdtemp(prefix="capsweep_")
    normalized_hashes(corpus, "stext").write.mode("overwrite").parquet(
        os.path.join(root, "hashes")
    )
    shingle_table(corpus, "stext", "doc_id", n=Q._ST_N).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "shingles"))
    stored_h = spark.read.parquet(os.path.join(root, "hashes"))
    stored_sh = spark.read.parquet(os.path.join(root, "shingles"))

    records = []
    for cap in caps:
        verdicts = incremental_dedup_verdicts(
            None,
            batch,
            "stext",
            "doc_id",
            n=Q._ST_N,
            min_shared=Q._ST_MIN_SHARED,
            max_doc_freq=cap,
            corpus_hashes=stored_h.select("h"),
            corpus_shingles=stored_sh.select("doc_id", "shingle"),
        )
        # warm (first pass also JITs this cap's plan), then timed passes
        verdicts.write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(repeats):
            t0 = time.time()
            verdicts.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        agg = verdicts.agg(
            F.sum("n_corpus_matches").alias("pairs"),
            F.sum((F.col("verdict") == "near_dup").cast("long")).alias("near"),
        ).collect()[0]
        rec = {
            "metric": "cap_sweep_doc_tier",
            "sf_dir": sf_dir,
            "max_doc_freq": cap,
            "candidate_pairs": int(agg["pairs"] or 0),
            "near_dup_docs": int(agg["near"] or 0),
            "serve_sec": round(best, 3),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    if out_path:
        base = max(records, key=lambda r: r["max_doc_freq"])
        with open(out_path, "w") as f:
            json.dump(
                {
                    "metric": "cap_sweep_doc_tier",
                    "sf_dir": sf_dir,
                    "repeats": repeats,
                    "sweep": records,
                    "note": (
                        "store-served doc-tier verdicts, min over "
                        f"{repeats} timed passes after a warm pass; "
                        "recall/cost vs the largest swept cap "
                        f"(max_doc_freq={base['max_doc_freq']})"
                    ),
                },
                f,
                indent=1,
            )
            f.write("\n")


if __name__ == "__main__":
    main()
