"""Direct contract tests for fsutil — the single swap/lock implementation
every file-backed store now shares (corpus store, streaming state store,
incremental mart). The consumers each carry crash-walk tests through
their own protocols; this file pins the primitive itself: every crash
point of swap_in leaves a state recover_swap repairs to old-or-new
(never neither, never mixed), recovery is idempotent, and the flock
excludes a second holder across handles. No Spark needed — pure os."""

from __future__ import annotations

import os
import shutil
import threading

from steam_data_engineer_project_spark.fsutil import (
    exclusive_flock,
    recover_swap,
    swap_in,
)


def _mkdir(path: str, tag: str) -> None:
    os.makedirs(path)
    with open(os.path.join(path, "content"), "w") as f:
        f.write(tag)


def _tag(path: str) -> str | None:
    p = os.path.join(path, "content")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read()


def _stage(tmp_path, with_live: bool):
    root = str(tmp_path)
    live = os.path.join(root, "live")
    staged = os.path.join(root, "staged")
    disp = os.path.join(root, "live.displaced")
    for d in (live, staged, disp):
        shutil.rmtree(d, ignore_errors=True)
    if with_live:
        _mkdir(live, "old")
    _mkdir(staged, "new")
    return live, staged, disp


def test_swap_in_every_crash_point_recovers(tmp_path):
    """swap_in is (1) rename live→displaced, (2) rename staged→live,
    (3) rmtree displaced. Simulate the state after each step, run
    recover_swap (twice — entry-time repair must be idempotent), and
    assert live holds OLD (crash before install: the caller's retry
    re-stages and re-swaps) or NEW (crash after install: the swap
    committed) — never nothing, never the displaced leftovers."""
    # crash after step 1: live missing, old displaced, staged intact
    live, staged, disp = _stage(tmp_path, with_live=True)
    os.rename(live, disp)
    for _ in range(2):
        recover_swap(live, disp)
        assert _tag(live) == "old" and not os.path.exists(disp)
    swap_in(live, staged, disp)  # the retry completes
    assert _tag(live) == "new" and not os.path.exists(disp)

    # crash after step 2: new live, old still displaced
    live, staged, disp = _stage(tmp_path, with_live=True)
    os.rename(live, disp)
    os.rename(staged, live)
    for _ in range(2):
        recover_swap(live, disp)
        assert _tag(live) == "new" and not os.path.exists(disp)

    # crash after step 3 (complete): recovery is a no-op
    live, staged, disp = _stage(tmp_path, with_live=True)
    swap_in(live, staged, disp)
    recover_swap(live, disp)
    assert _tag(live) == "new" and not os.path.exists(disp)

    # first-ever install (no live yet), crash after step 2
    live, staged, disp = _stage(tmp_path, with_live=False)
    os.rename(staged, live)
    recover_swap(live, disp)
    assert _tag(live) == "new"


def test_swap_in_without_existing_live(tmp_path):
    live, staged, disp = _stage(tmp_path, with_live=False)
    swap_in(live, staged, disp)
    assert _tag(live) == "new" and not os.path.exists(disp)


def test_exclusive_flock_blocks_second_holder(tmp_path):
    lock = str(tmp_path / "sub" / "_lock")  # parent dir auto-created
    order: list[str] = []
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with exclusive_flock(lock):
            order.append("a")
            entered.set()
            release.wait(30)

    def contender():
        entered.wait(30)
        with exclusive_flock(lock):
            order.append("b")

    t1 = threading.Thread(target=holder, daemon=True)
    t2 = threading.Thread(target=contender, daemon=True)
    t1.start()
    t2.start()
    assert entered.wait(30)
    # the contender must be blocked while the lock is held
    t2.join(timeout=1.0)
    assert t2.is_alive() and order == ["a"]
    release.set()
    t2.join(timeout=30)
    assert order == ["a", "b"]


def test_swap_in_sweeps_stale_displaced(tmp_path):
    """A displaced dir that survives a silently-failed cleanup rmtree is
    trash by protocol; swap_in must sweep it itself rather than crash
    ENOTEMPTY on the displace rename — not every caller has an
    entry-time recovery pass (round-10 ADVICE)."""
    live, staged, disp = _stage(tmp_path, with_live=True)
    _mkdir(disp, "stale-trash")
    swap_in(live, staged, disp)
    assert _tag(live) == "new" and not os.path.exists(disp)


def test_swap_in_restores_displaced_only_torn_state(tmp_path):
    """Entry-time handling of a leftover displaced dir must be
    recover_swap, not a blind rmtree (round-11 ADVICE): in the
    displaced-only torn state (crash BETWEEN the two renames) the
    displaced dir holds the ONLY copy of the old state. A recovery-less
    caller that goes straight to swap_in must still end with new state
    installed — and if its staged rename FAILS, the old state must
    survive (under the blind-rmtree version it was destroyed before the
    install was even attempted)."""
    # happy path: displaced-only + swap_in completes → new installed
    live, staged, disp = _stage(tmp_path, with_live=True)
    os.rename(live, disp)  # the torn state: live gone, old in displaced
    swap_in(live, staged, disp)
    assert _tag(live) == "new" and not os.path.exists(disp)

    # failure path: displaced-only + a BROKEN staged rename → the old
    # state must still be recoverable (it is back in displaced, where
    # the next recover_swap restores it)
    live, staged, disp = _stage(tmp_path, with_live=True)
    os.rename(live, disp)
    shutil.rmtree(staged)  # staged vanished: the install rename raises
    try:
        swap_in(live, staged, disp)
    except OSError:
        pass
    else:  # pragma: no cover - the rename must fail
        raise AssertionError("swap_in with missing staged did not raise")
    recover_swap(live, disp)
    assert _tag(live) == "old" and not os.path.exists(disp)
