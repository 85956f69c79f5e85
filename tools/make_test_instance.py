"""Generate small BoxQP test instances with EXACT known optima.

For small N the global maximum of f(x) = 0.5 x^T Q x + V^T x over [0,1]^N is
found exactly by enumerating all 3^N active-set patterns (each variable at its
lower bound, upper bound, or free), solving the reduced linear system for the
free block, and keeping the best feasible KKT point.  This gives golden
instances for the test suite without copying any reference data files.

Usage: python tools/make_test_instance.py N SEED OUTPATH
"""

from __future__ import annotations

import itertools
import sys

import numpy as np


def exact_boxqp_max(q, v):
    """Exact global max of 0.5 xQx + Vx over [0,1]^n via active-set
    enumeration (valid for small n)."""
    n = q.shape[0]
    best_val, best_x = -np.inf, None
    for pattern in itertools.product((0.0, 1.0, None), repeat=n):
        free = [i for i, p in enumerate(pattern) if p is None]
        x = np.array([p if p is not None else 0.0 for p in pattern])
        if free:
            fixed = [i for i in range(n) if pattern[i] is not None]
            qff = q[np.ix_(free, free)]
            rhs = -(v[free] + q[np.ix_(free, fixed)] @ x[fixed])
            try:
                xf = np.linalg.solve(qff, rhs)
            except np.linalg.LinAlgError:
                continue
            if np.any(xf < -1e-12) or np.any(xf > 1 + 1e-12):
                continue
            x[free] = np.clip(xf, 0.0, 1.0)
        val = 0.5 * x @ q @ x + v @ x
        if val > best_val:
            best_val, best_x = val, x
    return best_val, best_x


def make_instance(n, seed, out_path):
    rng = np.random.RandomState(seed)
    # Dense symmetric Q with negative-leaning diagonal (concave-ish but with
    # indefinite structure, like the reference set); positive-leaning V.
    a = rng.uniform(-1, 1, (n, n))
    q = (a + a.T) / 2
    q[np.diag_indices(n)] -= n / 2.0
    v = rng.uniform(0, n / 2.0, n)
    q = np.round(q, 6)
    v = np.round(v, 6)

    if n <= 8:
        opt, x = exact_boxqp_max(q, v)
    else:
        # With diag(Q) shifted by -n/2 the matrix is negative definite w.h.p.
        # (off-diagonal spectral radius ~ sqrt(n) << n/2), so the problem is
        # concave and any local max over the box is global: a multi-start
        # projected solver gives the exact optimum.
        evals = np.linalg.eigvalsh(q)
        assert evals.max() < 0, "instance not concave; cannot certify optimum"
        from scipy.optimize import minimize

        best_val, best_x = -np.inf, None
        for k in range(8):
            x0 = rng.uniform(0, 1, n) if k else np.clip(
                np.linalg.solve(q, -v), 0, 1
            )
            res = minimize(
                lambda x: -(0.5 * x @ q @ x + v @ x),
                x0,
                jac=lambda x: -(q @ x + v),
                method="L-BFGS-B",
                bounds=[(0.0, 1.0)] * n,
                options={"ftol": 1e-14, "gtol": 1e-12, "maxiter": 2000},
            )
            if -res.fun > best_val:
                best_val, best_x = -res.fun, res.x
        opt, x = best_val, best_x
    num_frac = int(np.sum((x > 1e-9) & (x < 1 - 1e-9)))

    with open(out_path, "w") as f:
        f.write(
            f"{n}\t{opt:.6f}\t{opt:.6f}\tTrue\t0.01\t0.01\t{seed}\t{num_frac}\n"
        )
        f.write("\t".join(f"{val:.6f}" for val in v) + "\n")
        for row in q:
            f.write("\t".join(f"{val:.6f}" for val in row) + "\n")
        f.write("\t".join(f"{val:.6f}" for val in x) + "\n")
    print(f"wrote {out_path}: N={n} opt={opt:.6f} frac={num_frac} x={x}")


if __name__ == "__main__":
    n, seed, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    make_instance(n, seed, out)
