"""Measure the Bloom bitset's AGING curve: false-positive rate vs number
of appended batches at fixed m_bits, then the rebuild that resets it.

The stored filter is the one corpus-store artifact that degrades rather
than merely grows: each appended batch ORs more bits into the same m-bit
space, the fill ratio rho climbs as 1 - e^(-h*n/m), and the FP rate
follows rho^h — silently re-flagging ever more genuinely-new shingles as
candidates. This tool plants b batches of DISTINCT keys, measures at each
step (a) the fill ratio of the merged stored filter, (b) the MEASURED FP
rate on a planted-absent probe set, and (c) the rho^h prediction; then
runs CorpusStore.rebuild_bloom — sized by bloom_required_bits, derived
from the STORED shingle table, never any corpus — and re-measures.

What the numbers justify: the resize POLICY (rebuild when fill crosses
~0.5, the knee where FP ≈ 2^-h starts doubling every ~0.2 of fill) and
the m-sizing rule (m = h·n / −ln(1 − p^(1/h)); at optimal h this is the
classic n·ln(1/p)/ln²2 ≈ 1.44·n·log2(1/p) bits).

Usage:
    python tools/bloom_aging.py [n_batches] [keys_per_batch] [out_json]

Defaults: 10 batches x 50k keys, m = 2^20, h = 4 (so fill crosses 0.5 at
batch ~4 and the curve's whole shape fits one run). Everything is
Spark-side (range + format_string keys, bit_count fill, probe join);
only the per-step scalar aggregates reach the driver.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from artifact_meta import provenance  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from steam_data_engineer_project_spark.corpus_store import (  # noqa: E402
    CorpusStore,
    bloom_required_bits,
)
from steam_data_engineer_project_spark.operators import (  # noqa: E402
    bloom_bitset,
    bloom_probe_count,
)
from steam_data_engineer_project_spark.session import get_spark  # noqa: E402

M_BITS = 1 << 20
N_HASHES = 4
N_PROBE = 100_000


def _keys(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.format_string(f"{prefix}:%d", F.col("id")).alias("shingle")
    )


def _measured_fp(spark, store, m_bits: int) -> float:
    """Probe N_PROBE keys KNOWN absent from every batch against the merged
    stored filter: the full-hit fraction IS the FP rate (zero false
    negatives by construction, so every hit on an absent key is false)."""
    merged = (
        store.read(spark, "bloom")
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    absent = _keys(spark, "absent", N_PROBE).withColumn(
        "pid", F.monotonically_increasing_id()
    )
    hits = bloom_probe_count(
        absent, "shingle", "pid", merged, m_bits=m_bits, n_hashes=N_HASHES
    )
    row = hits.agg(
        F.sum((F.col("n_hits") == F.col("n_probed")).cast("long")).alias(
            "fp"
        ),
        F.count("*").alias("n"),
    ).collect()[0]
    return row["fp"] / row["n"]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = get_spark(
        "bloom-aging",
        master=f"local[{int(os.environ.get('SPARK_GRAFT_CPUS', '32'))}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )

    root = tempfile.mkdtemp(prefix="bloom_aging_")
    curve = []
    try:
        store = CorpusStore(root, tables=("shingles", "bloom"))
        store.set_bloom_params(M_BITS, N_HASHES)
        for b in range(n_batches):
            keys = _keys(spark, f"b{b}", per_batch)
            store.admit(
                {
                    "shingles": keys.select(
                        F.lit(b).cast("long").alias("doc_id"), "shingle"
                    ),
                    "bloom": bloom_bitset(
                        keys,
                        "shingle",
                        m_bits=M_BITS,
                        n_hashes=N_HASHES,
                    ).select("word_idx", "bits"),
                },
                b,
            )
            fill = store.bloom_fill_ratio(spark)
            fp = _measured_fp(spark, store, M_BITS)
            curve.append(
                {
                    "batches": b + 1,
                    "keys": (b + 1) * per_batch,
                    "fill": round(fill, 4),
                    "fp_measured": round(fp, 6),
                    "fp_predicted_fill_pow_h": round(fill**N_HASHES, 6),
                }
            )
            print(json.dumps(curve[-1]), flush=True)

        # the rebuild: size for the keys the store ACTUALLY holds (read
        # from the stored shingle table), target FP 0.5% — then re-measure
        n_keys = (
            store.read(spark, "shingles")
            .select("shingle")
            .distinct()
            .count()
        )
        fp_target = 0.005
        new_m = bloom_required_bits(n_keys, fp_target, N_HASHES)
        store.rebuild_bloom(spark, new_m, N_HASHES)
        rebuilt = {
            "n_keys": n_keys,
            "fp_target": fp_target,
            "m_bits_old": M_BITS,
            "m_bits_new": new_m,
            "fill_after": round(store.bloom_fill_ratio(spark), 4),
            "fp_measured_after": round(
                _measured_fp(spark, store, new_m), 6
            ),
        }
        print(json.dumps(rebuilt), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    h = N_HASHES
    payload = {
        **provenance(out_path),
        "metric": "bloom_aging_curve",
        "m_bits": M_BITS,
        "n_hashes": h,
        "keys_per_batch": per_batch,
        "probe_size": N_PROBE,
        "curve": curve,
        "rebuild": rebuilt,
        "policy": (
            "rebuild from the STORED shingle table when fill crosses 0.5 "
            "(the design fill of an optimally-sized filter); size the new "
            "filter with bloom_required_bits(n_keys, fp_target, h) = "
            "h*n/-ln(1-p^(1/h)) — at the optimal h=(m/n)ln2 this is the "
            "classic n*ln(1/p)/ln^2(2)"
        ),
        "half_fill_fp": round(0.5**h, 6),
        "note": (
            "fp_measured = full-hit fraction of a planted-absent probe "
            f"set (n={N_PROBE}); fp_predicted = fill^h; measured ~ "
            "predicted validates bit-level health, the rebuild row shows "
            "the reset; sanity: ln(2)^2-rule bits/key at p=0.005 = "
            f"{round(math.log(1/0.005)/math.log(2)**2, 2)}"
        ),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    print(json.dumps({k: v for k, v in payload.items() if k != "curve"}))


if __name__ == "__main__":
    main()
