#!/usr/bin/env python
"""Convergence-rate report from MMS summary JSONs.

The script equivalent of the reference's analysis notebooks
(notebooks/convergence/Poisson_MMS.ipynb): reads the committed reference
summaries (tests/reference_values/*.json) and/or summaries produced by a
run of the convergence suite, fits observed orders of accuracy, and
prints a table against the theoretical rates.

Usage:
    python tools/convergence_report.py [dir=tests/reference_values]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

# theoretical orders for Lagrange degree p: L2 = p+1, H1-seminorm = p
DEGREE = {
    "tri3": 1, "quad4": 1, "tet4": 1, "hex8": 1,
    "tri6": 2, "quad9": 2, "tet10": 2, "hex20": 2, "hex27": 2,
    "tet20": 3,
}


def observed_order(hs, errs):
    """Least-squares slope of log(err) vs log(h) over the asymptotic tail."""
    pts = [(math.log(h), math.log(e)) for h, e in zip(hs, errs) if e > 0]
    pts = pts[-4:] if len(pts) > 4 else pts  # tail = asymptotic regime
    n = len(pts)
    if n < 2:
        return float("nan")
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    return (n * sxy - sx * sy) / (n * sxx - sx * sx)


def resolution_to_h(summary):
    if "mesh_sizes" in summary:
        return summary["mesh_sizes"]
    res = summary["resolutions"]
    # the reference stores mesh sizes h under "resolutions" (decreasing);
    # integer cell counts (increasing) are converted to h ~ 1/res
    if len(res) >= 2 and res[0] > res[-1]:
        return res
    return [1.0 / r for r in res]


def main(directory: str = "tests/reference_values") -> None:
    rows = []
    paths = sorted(Path(directory).glob("poisson*_summary.json"))
    if not paths:
        raise SystemExit(
            f"no poisson*_summary.json files found in {directory!r}"
        )
    for path in paths:
        s = json.loads(path.read_text())
        name = s.get("element_name", path.stem)
        key = name.lower().replace("d2", "").replace("d3", "")
        p = DEGREE.get(key)
        hs = resolution_to_h(s)
        l2 = observed_order(hs, s["L2_errors"])
        h1 = observed_order(hs, s["H1_seminorm_errors"])
        rows.append((name, p, l2, (p + 1) if p else None, h1, p))
    w = max(len(r[0]) for r in rows)
    print(f"{'element':<{w}}  {'L2 rate':>8} {'(theory)':>8}  {'H1 rate':>8} {'(theory)':>8}")
    for name, p, l2, l2t, h1, h1t in rows:
        lt = f"{l2t}" if l2t else "?"
        ht = f"{h1t}" if h1t else "?"
        flag = ""
        if l2t and (l2 < l2t - 0.3):
            flag = "  <-- below theoretical L2 order"
        print(f"{name:<{w}}  {l2:8.2f} {lt:>8}  {h1:8.2f} {ht:>8}{flag}")


if __name__ == "__main__":
    main(*sys.argv[1:])
