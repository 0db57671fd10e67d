"""Provenance stamp for committed measurement artifacts.

SKEW_sf1.json / BLOOM_AGING.json / CODEBOOK_DRIFT.json / EXPORT_sf1.json
are regenerated manually by their tools, so nothing structural stops the
measured code from drifting past the measurement. Every tool stamps its
payload with :func:`provenance` — the generating commit and whether the
worktree was dirty — and tests/test_artifacts.py warns (never silently
passes) when an artifact predates the last commit touching the code it
measures. Warn, not fail: a stale artifact is a regeneration chore, not
a correctness regression, and the numbers it pins are still the last
honest measurement.
"""

from __future__ import annotations

import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def provenance(out_path: str | None = None) -> dict:
    """{"generated_at_commit": HEAD sha, "worktree_dirty": bool} — merged
    into each tool's output payload so the artifact names the code state
    it measured. ``out_path`` is the artifact being (re)written: it is
    the measurement's OUTPUT, not measured code, so a tracked prior
    version sitting modified in the worktree must not mark the run dirty
    (regenerating an artifact would otherwise always self-report dirty).
    Degrades to commit=None outside a git checkout."""
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        status = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        # PROGRESS.jsonl is the build driver's always-appending turn log,
        # not code — it alone must not mark a measurement dirty; ditto
        # the measurement artifacts themselves (all OUTPUTS, never
        # measured code — a back-to-back regeneration sweep would
        # otherwise have each artifact dirty the next one's stamp).
        skip = {
            "PROGRESS.jsonl",
            "SKEW_sf1.json",
            "BLOOM_AGING.json",
            "CODEBOOK_DRIFT.json",
            "EXPORT_sf1.json",
        }
        if out_path:
            skip.add(os.path.basename(out_path))

        def _is_artifact(name: str) -> bool:
            # per-round soak tallies are outputs too (SOAK_r12.json, ...)
            return name in skip or (
                name.startswith("SOAK_r") and name.endswith(".json")
            )

        dirty = any(
            line
            for line in status
            if not _is_artifact(os.path.basename(line[3:].strip()))
        )
    except Exception:
        return {"generated_at_commit": None, "worktree_dirty": None}
    return {"generated_at_commit": head, "worktree_dirty": dirty}
