"""Extended soak of the store lifecycle properties — beyond the deep gate.

The fast gate replays pinned falsifying schedules; ``pytest -m deep``
runs 80 in-process examples and 4 cross-process seed pairs. This tool is
the dial past that for bug-hunting sessions (the in-process property at
default settings found the round-10 compaction double-serve only after
repeated runs — soak depth matters):

    python tools/soak_lifecycle.py inproc [n_examples=200] [retention_s=0]
    python tools/soak_lifecycle.py xproc  [n_seeds=10] [seed_base=2000] [retention_s=0]

``inproc`` drives tests/test_corpus_store.py's model property verbatim
(same ops, same model, same pinned @example ledger) at higher
max_examples. ``xproc`` spawns tests/cross_proc_lifecycle.py worker
pairs on fresh random schedules. On a falsifying schedule either mode
prints it for pinning (minimize, then add as @example / a fast-gate
schedule pair — the protocol's regression ledger). Exit 0 = no
violation found.

Round-11 soak on this host: inproc 200 examples (retention 0) + 100
under a 3600s orphan-retention window; xproc seed pairs 2000-2009 and
5000-5007 (retention 0), 3000-3005 and 4000-4007 (3600s window) — 32
random cross-process schedule pairs total, all clean.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def soak_inproc(n_examples: int, retention: float = 0.0) -> None:
    from steam_data_engineer_project_spark.session import get_spark
    import pathlib

    import test_corpus_store as tcs

    spark = get_spark(
        "soak-inproc",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    scratch = os.path.join(_REPO, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="soak_", dir=scratch))
    try:
        kwargs = {"orphan_retention_s": retention} if retention else None
        tcs._lifecycle_model_property(spark, tmp, n_examples, kwargs)
        print(f"INPROC SOAK OK: {n_examples} examples (retention={retention})")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def _run_pair(tmp: str, schedules: list, retention: float = 0.0) -> list[str]:
    bdir = os.path.join(tmp, "barriers")
    os.makedirs(bdir, exist_ok=True)
    procs = []
    for p, segments in enumerate(schedules):
        sp = os.path.join(bdir, f"sched_p{p}.json")
        with open(sp, "w") as f:
            json.dump(
                {"segments": segments, "barriers": bdir,
                 "retention": retention},
                f,
            )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(_REPO, "tests", "cross_proc_lifecycle.py"),
                    os.path.join(tmp, "store"),
                    str(p),
                    sp,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
            errs.append("TIMEOUT " + err.decode()[-1500:])
            continue
        if p.returncode != 0:
            errs.append(err.decode()[-2500:])
    return errs


def soak_xproc(n_seeds: int, seed_base: int, retention: float = 0.0) -> None:
    scratch = os.path.join(_REPO, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    for seed in range(seed_base, seed_base + n_seeds):
        rng = random.Random(seed)

        def ops(k):
            out = []
            for _ in range(k):
                r = rng.random()
                if r < 0.42:
                    out.append(["admit", rng.randint(1, 3)])
                elif r < 0.52:
                    out.append(["admit_torn", rng.randint(1, 2)])
                elif r < 0.68:
                    out.append(["retire", rng.randint(0, 10)])
                elif r < 0.84:
                    out.append(["compact", rng.choice([0, 0, rng.randint(1, 10)])])
                elif r < 0.93:
                    out.append(["compact_torn", 0])
                else:
                    out.append(["reopen", 0])
            return out

        schedules = [
            [ops(rng.randint(3, 5)) for _ in range(4)] for _ in range(2)
        ]
        tmp = tempfile.mkdtemp(prefix=f"xsoak{seed}_", dir=scratch)
        errs = _run_pair(tmp, schedules, retention)
        if errs:
            print(f"SEED {seed} FALSIFIED — pin this schedule pair:")
            print("\n".join(errs))
            print("schedules:", json.dumps(schedules))
            sys.exit(1)
        print(f"seed {seed}: ok")
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"XPROC SOAK OK: {n_seeds} seeds from {seed_base}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "inproc"
    if mode == "inproc":
        soak_inproc(
            int(sys.argv[2]) if len(sys.argv) > 2 else 200,
            float(sys.argv[3]) if len(sys.argv) > 3 else 0.0,
        )
    elif mode == "xproc":
        soak_xproc(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            int(sys.argv[3]) if len(sys.argv) > 3 else 2000,
            float(sys.argv[4]) if len(sys.argv) > 4 else 0.0,
        )
    else:
        sys.exit(f"unknown mode {mode!r} (inproc | xproc)")
