"""Round-10 pins.

1. Bench record guard (VERDICT r9 "What's wrong #1"): the intra-run
   spread guard is blind to a co-tenant slow phase spanning all of a
   row's reps — q15_pk_uniqueness read [3.881, 3.881] in the r9 driver
   run (spread exactly 1.0, guard silent) against a committed
   quiet-host 1.742 s. bench.py now also compares every row's
   best-of-n to the committed BENCH_DETAIL.json record; these tests
   pin the trigger predicate on the r9 canaries and the committed-
   record reader's sf/shape gating.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def test_record_guard_fires_on_both_r9_canaries():
    # q15_pk_uniqueness: driver best-of 3.881 vs committed 1.742 (2.2x)
    assert bench._record_guard_triggers(3.881, 1.742)
    # v5_label_coherence: 3.233 vs 1.89 — only 1.34s absolute, which is
    # why the record guard's floor (0.5s) sits BELOW the intra-run
    # noisy-flag floor (2.0s); this canary must trigger
    assert bench._record_guard_triggers(3.233, 1.89)


def test_record_guard_silent_on_quiet_and_degenerate_rows():
    # equal to the record: quiet
    assert not bench._record_guard_triggers(1.742, 1.742)
    # a 1.0-spread inflated pair is invisible to the intra-run guard by
    # construction; the record guard sees it ONLY via the record — with
    # no record (new query, first run, sf mismatch) it must stay silent
    assert not bench._record_guard_triggers(3.881, None)
    # below the ratio: a 1.4x drift is host noise, not a regression
    assert not bench._record_guard_triggers(2.4, 1.742)
    # above the ratio but under the absolute floor: sub-second rows
    # cold-start >1.5x routinely; 0.4s of drift is not a 2x regression
    assert not bench._record_guard_triggers(0.9, 0.5)
    # a zero/negative record can't anchor a ratio
    assert not bench._record_guard_triggers(3.0, 0.0)


def test_committed_record_gates_on_sf_and_shape(tmp_path):
    rec = tmp_path / "BENCH_DETAIL.json"
    rec.write_text(json.dumps({
        "sf": 0.1,
        "queries": {"q15_pk_uniqueness": 1.742, "bad": "not-a-number"},
    }))
    got = bench._committed_record(0.1, path=str(rec))
    assert got == {"q15_pk_uniqueness": 1.742}  # non-numeric dropped
    # different sf: no cross-sf comparisons
    assert bench._committed_record(0.01, path=str(rec)) == {}
    # absent / unparseable files degrade to empty, never raise
    assert bench._committed_record(0.1, path=str(tmp_path / "nope.json")) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench._committed_record(0.1, path=str(bad)) == {}
    # queries key missing or mis-shaped
    noq = tmp_path / "noq.json"
    noq.write_text(json.dumps({"sf": 0.1, "queries": [1, 2]}))
    assert bench._committed_record(0.1, path=str(noq)) == {}


def test_record_guard_evidence_is_file_only_and_always_present(tmp_path):
    """The stdout records must stay bounded (driver tail capture);
    record_guard is file evidence like reps/noisy — and it is written
    even when EMPTY, so its absence is never ambiguous."""
    timings = {"q1": 1.0}
    reps = {"q1": [1.0, 1.1, 1.0]}
    out = tmp_path / "BENCH_DETAIL.json"
    for line in bench.emit_records(
        timings, sf=0.1, reps=reps, record_guard=["q1"],
        write_detail=True, detail_path=str(out),
    ):
        assert "record_guard" not in json.loads(line)
    detail = json.loads(out.read_text())
    assert detail["record_guard"] == ["q1"]
    # empty list still written — absence would be ambiguous evidence
    out2 = tmp_path / "BENCH_DETAIL2.json"
    bench.emit_records(
        timings, sf=0.1, reps=reps, record_guard=[],
        write_detail=True, detail_path=str(out2),
    )
    assert json.loads(out2.read_text())["record_guard"] == []
