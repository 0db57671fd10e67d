"""Streaming semantics the batch oracle can't see: checkpoint resume
(files processed exactly once across restarts), late-data policy, and
change-notification content across micro-batch boundaries.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from steam_data_engineer_project_spark.streaming.price_pipeline import (
    run_price_pipeline,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_events(events_dir: str, fname: str, rows: list[dict]) -> None:
    os.makedirs(events_dir, exist_ok=True)
    with open(os.path.join(events_dir, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(appid, event_id, price, ts_s, discount=0.0):
    return {
        "type": "price",
        "appid": appid,
        "event_id": event_id,
        "discount": discount,
        "price": price,
        "timestamp": float(ts_s),
    }


def test_price_pipeline_resume_late_data_and_notifications(spark):
    base = os.path.join(REPO_ROOT, ".scratch")
    os.makedirs(base, exist_ok=True)
    work = tempfile.mkdtemp(prefix="test_stream_", dir=base)
    events_dir = os.path.join(work, "events")
    try:
        # ---- run 1: two keys, one in-run price change
        _write_events(
            events_dir,
            "a.jsonl",
            [_ev(1, 1, 10.0, 100), _ev(1, 2, 12.0, 200), _ev(2, 3, 5.0, 100)],
        )
        out = run_price_pipeline(spark, events_dir, work)
        state = {
            r.appid: r
            for r in spark.read.parquet(out["crawl_state"]).collect()
        }
        assert state[1].last_price == 12.0 and state[1].n_events == 2
        assert state[2].last_price == 5.0 and state[2].n_events == 1
        notifs = spark.read.parquet(out["notifications"]).collect()
        ops = sorted((n.appid, n.op, n.prev_price) for n in notifs)
        assert ops == [(1, "c", None), (1, "u", 10.0), (2, "c", None)]

        # ---- run 2 (restart from checkpoint): an unchanged price, a change,
        # and a LATE event (ts before the stored watermark)
        _write_events(
            events_dir,
            "b.jsonl",
            [
                _ev(1, 4, 12.0, 300),  # same price -> no notification
                _ev(2, 5, 99.0, 50),  # late -> appended, never notifies
                _ev(2, 6, 7.0, 150),  # change vs stored 5.0
            ],
        )
        out = run_price_pipeline(spark, events_dir, work)

        # exactly-once file progress: run-1 events not reprocessed
        state = {
            r.appid: r
            for r in spark.read.parquet(out["crawl_state"]).collect()
        }
        assert state[1].n_events == 3 and state[2].n_events == 3
        # event-time merge: late 99.0 never became the last price
        assert state[1].last_price == 12.0 and state[1].last_ts_us == 300_000_000
        assert state[2].last_price == 7.0 and state[2].last_ts_us == 150_000_000

        # prices table is append-only and keeps the late row
        prices = spark.read.parquet(out["prices"])
        assert prices.count() == 6

        # notifications: only the appid-2 change was added; the late event
        # and the unchanged price notified nothing
        notifs = spark.read.parquet(out["notifications"]).collect()
        ops = sorted((n.appid, n.op, n.prev_price) for n in notifs)
        assert ops == [(1, "c", None), (1, "u", 10.0), (2, "c", None), (2, "u", 5.0)]
    finally:
        shutil.rmtree(work, ignore_errors=True)
