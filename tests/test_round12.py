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


# (The r12 window pin moved to tests/test_round13.py when the window
# rotated at round-13 open — the live _PRIORITY now holds the r13
# window, cut from r01–r12 evidence.)
