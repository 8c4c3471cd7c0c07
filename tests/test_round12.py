"""Round-12 pins for the r11 ADVICE fixes: _committed_record tolerates
non-dict JSON, and the rotation window comment drift is gone (the
window block is regenerated wholesale each round)."""

from __future__ import annotations

import bench


def test_committed_record_non_dict_record_is_empty(tmp_path):
    """A record file that parses to a JSON list (or any non-dict) must
    hit the documented 'unparseable -> empty' contract, not crash
    bench startup with AttributeError."""
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text("[1, 2, 3]")
    assert bench._committed_record(0.1, path=str(p)) == {}
    p.write_text('"just a string"')
    assert bench._committed_record(0.1, path=str(p)) == {}


def test_round12_window_is_the_rotation_output():
    """The first 50 registry entries must equal tools/rotation.py's
    computed round-12 window (oldest-evidence cohort: 10 r6 rows then
    40 r7 rows) — hand-paste drift between the tool and _PRIORITY is
    exactly what the generated-window discipline exists to prevent."""
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "rotation.py"), "window", "12"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=repo,
    )
    assert out.returncode == 0
    want = [
        line.split('"')[1]
        for line in out.stdout.splitlines()
        if line.strip().startswith('"')
    ]
    from etl_power_bi_dashboard_spark.plans import all_queries

    got = list(all_queries())[: len(want)]
    assert got == want and len(want) == 50
