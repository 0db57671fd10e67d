"""Generate an sf1.0 dataset by 10× FK-consistent amplification of sf0.1.

The driver ships sf≤0.1; the scale claims (davg long-space headroom, CC
round counts, dedup candidate bounds) deserve one measured notch higher.
Each copy i shifts every surrogate key by i·STRIDE, so foreign keys resolve
within their copy (orders⋈lineitem⋈part⋈supplier⋈customer all stay
consistent); region/nation (tiny, referenced by unshifted nationkeys) stay
single-copy, as do events.user_id (so per-user event streams get 10× deeper
— a deliberate hot-key stressor) and document/embedding contents (so dedup
and ANN see real 10-way duplicate groups — the adversarial case for
candidate-pair bounds).

Output: /root/repo/.sf1data (gitignored; ~170 MB). Usage:
    python tools/gen_sf1.py
Then:
    SPARK_GRAFT_SF_DIR=/root/repo/.sf1data python bench.py
    python tools/drive_at_sf.py /root/repo/.sf1data CORRECTNESS_sf1.json
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: COPIES/DST are env-overridable so higher notches reuse this script:
#:   SPARK_GRAFT_COPIES=20 SPARK_GRAFT_AMP_DST=.sf2data python tools/gen_sf1.py
COPIES = int(os.environ.get("SPARK_GRAFT_COPIES", "10"))
DST = os.path.join(_REPO, os.environ.get("SPARK_GRAFT_AMP_DST", ".sf1data"))
STRIDE = 10_000_000  # > every base key; keeps shifted ids disjoint

#: key columns to shift per table (all other columns copied verbatim)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE = ["region", "nation"]


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gen-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for t in SINGLE:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(t, "copied", flush=True)
    for t, keys in SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        # one narrow pass: cross the table with the copy index and shift keys
        copies = base.crossJoin(
            spark.range(COPIES).select(F.col("id").alias("__copy"))
        )
        out = copies.select(
            *[
                (F.col(c) + F.col("__copy") * STRIDE).cast(
                    dict(base.dtypes)[c]
                ).alias(c)
                if c in keys
                else F.col(c)
                for c in base.columns
            ]
        )
        out.repartition(16).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n, flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
