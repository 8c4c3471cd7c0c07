"""Round-13 pins: the rotation window matches the tool's ranking over
round-open evidence (the generated-window discipline, VERDICT r12 #8)."""

from __future__ import annotations

import bench


def test_round13_window_is_the_rotation_output():
    """The first 50 registry entries must equal the rotation tool's
    ranking over the ROUND-13-OPEN evidence (CORRECTNESS_r01–r12 only —
    the tool itself globs every round file, so its live output moves
    again the moment the driver writes r13; the window was cut from the
    r12 state). Hand-paste drift between the tool and _PRIORITY is
    exactly what the generated-window discipline exists to prevent."""
    import glob
    import json
    import os
    import re
    import sys

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import rotation

    latest = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if rnd > 12:
            continue
        for name, row in json.load(open(path)).items():
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, row)
    # compute_window ranks a module-ordered list (all_queries() fronts
    # _PRIORITY, so the registry modules give the pre-priority order)
    from etl_power_bi_dashboard_spark.plans import _MODULES, all_queries

    mod_order = [q.name for mod in _MODULES for q in mod.QUERIES]
    want = rotation.compute_window(mod_order, latest)
    got = list(all_queries())[: len(want)]
    assert got == want and len(want) == 50
