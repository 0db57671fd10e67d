"""Extended soak of the store lifecycle properties — beyond the deep gate.

The fast gate replays pinned falsifying schedules; ``pytest -m deep``
runs 80 in-process examples and 4 cross-process seed pairs. This tool is
the dial past that for bug-hunting sessions (the in-process property at
default settings found the round-10 compaction double-serve only after
repeated runs — soak depth matters):

    python tools/soak_lifecycle.py inproc [n_examples=200] [retention_s=0]
    python tools/soak_lifecycle.py xproc  [n_seeds=10] [seed_base=2000] [retention_s=0]
    python tools/soak_lifecycle.py record [out=SOAK_rN.json] [scale=1.0]

``inproc`` drives tests/test_corpus_store.py's model property verbatim
(same ops, same model, same pinned @example ledger) at higher
max_examples. ``xproc`` spawns tests/cross_proc_lifecycle.py worker
pairs on fresh random schedules. A SUB-SECOND retention (0 < r < 5)
runs the RACED regime in both modes: a sweep after every op, so expiry
reaps fire while mutations and reads interleave (in-process) or while
the PEER process mutates (cross-process). On a falsifying schedule
either mode prints it for pinning (minimize, then add as @example / a
fast-gate schedule pair — the protocol's regression ledger). Exit 0 =
no violation found.

``record`` runs the round's standard soak matrix — in-process and
cross-process arms at retention 0 / 3600s / raced 0.3s — and writes a
provenance-stamped tally artifact (SOAK_rN.json, round-11 judge ask 5)
so the assurance trend is machine-readable like BENCH/CORRECTNESS.
``scale`` multiplies every arm's example/seed count (0.25 for a quick
smoke, 2.0 for a hunting session).

Round-11 soak: inproc 200 examples (retention 0) + 100 under a 3600s
window; 32 random cross-process schedule pairs — all clean (tallied in
the round-11 commit log). Round 12 onward the tally lives in the
committed SOAK_r{N}.json instead of this docstring.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, os.path.join(_REPO, "tools"))

#: the raced-reap regime: sweep_orphans after every op (matches
#: cross_proc_lifecycle.py's gate)
_RACED = lambda r: 0 < r < 5  # noqa: E731


def soak_inproc(n_examples: int, retention: float = 0.0, spark=None) -> None:
    from steam_data_engineer_project_spark.session import get_spark
    import pathlib

    import test_corpus_store as tcs

    own = spark is None
    if own:
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
        tcs._lifecycle_model_property(
            spark, tmp, n_examples, kwargs, sweep_each_op=_RACED(retention)
        )
        print(
            f"INPROC SOAK OK: {n_examples} examples (retention={retention}"
            f"{', raced sweeps' if _RACED(retention) else ''})"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if own:
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


def _rand_schedules(seed: int) -> list:
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

    return [[ops(rng.randint(3, 5)) for _ in range(4)] for _ in range(2)]


def soak_xproc(
    n_seeds: int, seed_base: int, retention: float = 0.0
) -> list[int]:
    """Run ``n_seeds`` random cross-process schedule pairs; returns the
    list of clean seeds (exits 1 printing the schedule on a falsifier)."""
    scratch = os.path.join(_REPO, ".scratch")
    os.makedirs(scratch, exist_ok=True)
    clean = []
    for seed in range(seed_base, seed_base + n_seeds):
        schedules = _rand_schedules(seed)
        tmp = tempfile.mkdtemp(prefix=f"xsoak{seed}_", dir=scratch)
        errs = _run_pair(tmp, schedules, retention)
        if errs:
            print(f"SEED {seed} FALSIFIED — pin this schedule pair:")
            print("\n".join(errs))
            print("schedules:", json.dumps(schedules))
            sys.exit(1)
        print(f"seed {seed}: ok (retention={retention})")
        clean.append(seed)
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"XPROC SOAK OK: {n_seeds} seeds from {seed_base}")
    return clean


#: the per-round soak matrix `record` runs: (mode, count, retention).
#: Counts are scaled by the `scale` argv. xproc seed bases advance per
#: wall-clock day so repeated rounds draw FRESH schedules, never re-runs.
_MATRIX = [
    ("inproc", 60, 0.0),
    ("inproc", 40, 3600.0),
    ("inproc", 60, 0.3),  # raced reaps
    ("xproc", 4, 0.0),
    ("xproc", 4, 3600.0),
    ("xproc", 8, 0.3),  # raced reaps
]


def record(out_path: str, scale: float = 1.0) -> None:
    from artifact_meta import provenance
    from steam_data_engineer_project_spark.session import get_spark

    spark = get_spark(
        "soak-record",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "12g"},
    )
    # minute-granular base: a purely day-derived one made same-day
    # reruns replay IDENTICAL schedule pairs while tallying as fresh
    # coverage (hit in round 12: the 1.0x and 2.0x record runs shared
    # their raced-arm seeds)
    minute = int(time.time() // 60)
    seed_base = 100_000 + (minute % 1_000_000) * 100
    arms = []
    t0 = time.time()
    try:
        for mode, count, retention in _MATRIX:
            n = max(1, int(round(count * scale)))
            a0 = time.time()
            if mode == "inproc":
                soak_inproc(n, retention, spark=spark)
                arm = {"mode": mode, "examples": n}
            else:
                seeds = soak_xproc(n, seed_base, retention)
                seed_base += n
                arm = {"mode": mode, "seed_pairs": seeds}
            arm.update(
                {
                    "retention_s": retention,
                    "raced_sweeps": _RACED(retention),
                    "wall_s": round(time.time() - a0, 1),
                    "violations": 0,  # a falsifier sys.exits before here
                }
            )
            arms.append(arm)
    finally:
        spark.stop()
    payload = {
        "tool": "tools/soak_lifecycle.py record",
        "scale": scale,
        "arms": arms,
        "total_wall_s": round(time.time() - t0, 1),
        "violations_total": 0,
        **provenance(out_path),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"SOAK RECORDED → {out_path}")


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
    elif mode == "record":
        record(
            sys.argv[2] if len(sys.argv) > 2 else os.path.join(
                _REPO, "SOAK_r0.json"
            ),
            float(sys.argv[3]) if len(sys.argv) > 3 else 1.0,
        )
    else:
        sys.exit(f"unknown mode {mode!r} (inproc | xproc | record)")
