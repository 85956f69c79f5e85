"""Bound-quality table: certifier root gap per size (QUALITY.md section).

Runs tools/certify_boxqp.py's root relaxation in its operative
configuration (rounds=root_rounds, stop_at=incumbent+tol, 450 s deadline)
over the first few bundled instances of each size and prints the
root-gap table: gap = (root UB - incumbent) * 100 / |incumbent|.
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from certify_boxqp import _NodeLP, _active_set_polish, load_raw  # noqa: E402

INSTANCE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "benchmarking_instances",
)


def main(sizes=(20, 30, 40, 50, 60, 70), ninst=5, deadline_s=450.0):
    for size in sizes:
        gaps, walls, fath = [], [], 0
        files = sorted(
            glob.glob(os.path.join(INSTANCE_ROOT, f"Size{size}", "*.in"))
        )[:ninst]
        for path in files:
            n, hdr, v, q, sol = load_raw(path)
            if sol is None:
                sol = np.full(n, 0.5)
            x0, val0 = _active_set_polish(q, v, sol)
            tol = max(1e-5, 1e-6 * abs(val0))
            lp = _NodeLP(q, v)
            t0 = time.perf_counter()
            ub, x_lp, err = lp.solve(
                np.zeros(n), np.ones(n), rounds=lp.root_rounds,
                stop_at=val0 + tol, deadline=t0 + deadline_s,
            )
            w = time.perf_counter() - t0
            if ub is None:
                continue
            gaps.append(100.0 * (ub - val0) / abs(val0))
            walls.append(w)
            if ub <= val0 + tol:
                fath += 1
        print(
            f"N={size}: root gap mean {np.mean(gaps):.3f}% "
            f"max {np.max(gaps):.3f}% fathomed-at-root {fath}/{len(files)} "
            f"(root wall mean {np.mean(walls):.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
