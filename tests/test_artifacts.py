"""Provenance checks for the committed measurement artifacts.

SKEW_sf1.json / BLOOM_AGING.json / CODEBOOK_DRIFT.json / EXPORT_sf1.json
pin measured claims (task-balance under planted skew, the bloom aging
curve, codebook-staleness recall decay, the export writer's shape) but
are regenerated manually by their tools — nothing structural stops the
measured code from drifting past the measurement. Each tool stamps its
output with the generating commit (tools/artifact_meta.py); this suite
WARNS — never silently passes — when an artifact predates the last
commit touching the code it measures, or was generated from a dirty
worktree. Warn, not fail: a stale artifact is a regeneration chore
(rerun the named tool), not a correctness regression — the numbers it
pins are still the last honest measurement. The artifacts' substantive
bounds are asserted elsewhere (e.g. test_plans.py's skew pin).
"""

from __future__ import annotations

import json
import os
import subprocess
import warnings

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: artifact → (generating tool, the code whose behavior it measures).
#: Paths are repo-relative; touching any of them after the artifact's
#: generating commit marks the artifact stale.
ARTIFACTS = {
    "SKEW_sf1.json": (
        "tools/skew_stress.py",
        [
            "steam_data_engineer_project_spark/operators/dedup.py",
            "steam_data_engineer_project_spark/operators/skew.py",
            "tools/skew_stress.py",
        ],
    ),
    "BLOOM_AGING.json": (
        "tools/bloom_aging.py",
        [
            "steam_data_engineer_project_spark/operators/bloom.py",
            "steam_data_engineer_project_spark/corpus_store.py",
            "tools/bloom_aging.py",
        ],
    ),
    "CODEBOOK_DRIFT.json": (
        "tools/codebook_drift.py",
        [
            "steam_data_engineer_project_spark/operators/clustering.py",
            "steam_data_engineer_project_spark/corpus_store.py",
            "tools/codebook_drift.py",
        ],
    ),
    "EXPORT_sf1.json": (
        "tools/export_bench.py",
        [
            "steam_data_engineer_project_spark/operators/sampling.py",
            "tools/export_bench.py",
        ],
    ),
}

# the per-round soak tally (SOAK_r12.json, SOAK_r13.json, ...): only the
# LATEST one is held to freshness — earlier rounds' tallies are history,
# correct for the commits they stamp.
_soaks = sorted(
    (
        f
        for f in os.listdir(REPO)
        if f.startswith("SOAK_r") and f.endswith(".json")
    ),
    # numeric round order: lexicographic would rank SOAK_r9 after
    # SOAK_r10 and pin freshness to the wrong 'latest' round
    key=lambda f: (
        int(n) if (n := f[len("SOAK_r"):-len(".json")]).isdigit() else -1
    ),
)
if _soaks:
    ARTIFACTS[_soaks[-1]] = (
        "tools/soak_lifecycle.py record",
        [
            "steam_data_engineer_project_spark/corpus_store.py",
            "steam_data_engineer_project_spark/fsutil.py",
            "tools/soak_lifecycle.py",
            "tests/cross_proc_lifecycle.py",
        ],
    )


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    )


@pytest.mark.parametrize("name", sorted(ARTIFACTS))
def test_artifact_provenance_is_fresh(name):
    tool, measured = ARTIFACTS[name]
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet")
    with open(path) as f:
        art = json.load(f)

    commit = art.get("generated_at_commit")
    if not commit:
        warnings.warn(
            f"{name} predates commit-stamping — regenerate with {tool} "
            f"to record its provenance",
            stacklevel=1,
        )
        return
    if art.get("worktree_dirty"):
        warnings.warn(
            f"{name} was generated from a DIRTY worktree at {commit[:10]} "
            f"— the stamped commit may not be the measured code; "
            f"regenerate with {tool} from a clean tree",
            stacklevel=1,
        )

    last_touch = _git("log", "-1", "--format=%H", "--", *measured)
    assert last_touch.returncode == 0, last_touch.stderr
    code_commit = last_touch.stdout.strip()
    if not code_commit:
        return  # shallow/filtered checkout — nothing to compare against
    if _git("cat-file", "-e", f"{commit}^{{commit}}").returncode != 0:
        warnings.warn(
            f"{name}: generating commit {commit[:10]} is unknown to this "
            f"checkout — cannot judge freshness; regenerate with {tool}",
            stacklevel=1,
        )
        return
    fresh = (
        _git("merge-base", "--is-ancestor", code_commit, commit).returncode
        == 0
    )
    if not fresh:
        warnings.warn(
            f"{name} is STALE: generated at {commit[:10]} but "
            f"{code_commit[:10]} has since touched the code it measures "
            f"({', '.join(measured)}) — rerun {tool}",
            stacklevel=1,
        )


def test_export_artifact_pins_minimal_shape():
    """EXPORT_sf1.json (tools/export_bench.py, committed) is the measured
    cost/shape of the sharded export writers at sf1: the 'minimal export
    shape' claim in write_shards' docstring — ONE wide exchange on a
    content hash, each shard one sorted file — asserted from the event
    log and the written directory rather than argued, at EVERY measured
    shard count (64 and the 256 scale-up probe: a 100 TB export runs
    thousands of shards, and the invariants that must survive the
    scale-up are exactly 'still one exchange' and 'still one file per
    shard'). Since round 12 the artifact measures BOTH writers per shard
    count — 'native' (write.partitionBy, committer commit) and
    'deferred' (export_shards_on_materialize: pyarrow stream + rename
    commit, summaries from the written bytes) — under the same
    invariants, plus the deferred summaries' doc total equalling the
    input rows. Regenerate after touching the export writers."""
    path = os.path.join(REPO, "EXPORT_sf1.json")
    if not os.path.exists(path):
        pytest.skip("EXPORT_sf1.json not generated yet")
    with open(path) as f:
        art = json.load(f)

    # sf1 documents = 50k rows (10x FK-consistent amplification of sf0.1)
    assert art["n_rows"] >= 50_000
    shard_counts = [r["n_shards"] for r in art["runs"]]
    assert 64 in shard_counts and max(shard_counts) >= 256, shard_counts
    by_writer = {r.get("writer", "native") for r in art["runs"]}
    if "deferred" in by_writer:  # regenerated from round 12 on
        for n in set(shard_counts):
            writers = {
                r.get("writer", "native")
                for r in art["runs"]
                if r["n_shards"] == n
            }
            assert writers == {"native", "deferred"}, (n, writers)
    for run in art["runs"]:
        if run.get("writer") == "deferred":
            assert run["summary_docs_total"] == art["n_rows"], run
        # one wide exchange: exactly one stage in the run's job group
        # wrote shuffle data (the repartition(n_shards, shard)); a global
        # sort or a driver-side collect would add shuffle-writing rounds
        assert run["n_shuffle_write_stages"] == 1, run
        # every shard directory holds exactly one sorted run
        assert run["files_per_shard"] == [1], run
        assert run["n_shard_dirs"] == run["n_shards"]
        # the exchange moves the dataset once: shuffle write within 3x of
        # the compressed output (row-format shuffle blocks vs columnar
        # parquet), not a multiple-materialization blowup
        assert 0 < run["shuffle_write_bytes"] < 3 * max(run["output_bytes"], 1)
        assert run["wall_s"] > 0
