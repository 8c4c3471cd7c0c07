"""Round-11 pins for the advisor fixes: _committed_record reads the
COMMITTED record (git show), never the possibly-overwritten working-tree
file, and rejects booleans; DAU semantics are pinned in
test_streaming.py / test_streaming_fuzz_builtin.py."""

from __future__ import annotations

import json
import os
import subprocess

import bench


def test_committed_record_rejects_booleans(tmp_path):
    """bool is an int subclass — a corrupted true/false value must not
    reach the ratio check as 1/0."""
    rec = tmp_path / "BENCH_DETAIL.json"
    rec.write_text(
        json.dumps({"sf": 0.1, "queries": {"ok": 1.5, "corrupt": True}})
    )
    assert bench._committed_record(0.1, path=str(rec)) == {"ok": 1.5}


def test_committed_record_prefers_git_over_working_tree():
    """With no explicit path, the record must come from
    `git show HEAD:BENCH_DETAIL.json` — the on-disk file is overwritten
    at the end of every bench run, so on a workspace that benches
    repeatedly the working-tree copy is the latest (possibly
    host-inflated) run, not the committed quiet-host record."""
    blob = subprocess.run(
        ["git", "show", "HEAD:BENCH_DETAIL.json"],
        cwd=os.path.dirname(os.path.abspath(bench.__file__)),
        capture_output=True,
        text=True,
        timeout=10,
    )
    assert blob.returncode == 0, "committed BENCH_DETAIL.json must exist"
    committed = json.loads(blob.stdout)
    got = bench._committed_record(committed["sf"])
    want = {
        k: v
        for k, v in committed["queries"].items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }
    assert got == want and len(got) > 100
