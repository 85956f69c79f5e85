"""Unit tests for the B&B certifier's cutting machinery (tools/certify_boxqp).

The certifier plays Gurobi's role for the bundled instance set (the
reference's headers are Gurobi-certified, ``examples/benchmarking_instances/
*/tuningH0*-100-*.in:1``), so its bound must be provably valid: every cut it
separates has to hold for the exact moment matrix X = x x^T of ANY feasible
point.  These tests pin that invariant plus end-to-end certification of a
small instance.
"""

import importlib.util
import os

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "certify_boxqp",
    os.path.join(os.path.dirname(__file__), "..", "..", "tools",
                 "certify_boxqp.py"),
)
cert = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cert)


def _random_qv(n, seed):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, n)
    return (a + a.T) / 2, rng.randn(n)


def _cut_value(entries, x, Xm, n):
    """Evaluate a cut row's LHS at the exact lifting of x."""
    total = 0.0
    pairs = [(i, j) for i in range(n) for j in range(i, n)]
    for col, coef in entries:
        if col < n:
            total += coef * x[col]
        else:
            i, j = pairs[col - n]
            total += coef * Xm[i, j]
    return total


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eigen_cuts_valid_for_exact_moments(seed):
    """Eigenvalue cuts must hold with X = x x^T for every feasible x."""
    n = 8
    q, v = _random_qv(n, seed)
    lp = cert._NodeLP(q, v)
    rng = np.random.RandomState(seed + 100)
    # Separate at a deliberately infeasible moment point (X = 0) so cuts exist.
    x_sep = rng.rand(n)
    cuts = lp._separate_eigen(x_sep, np.zeros((n, n)))
    assert cuts, "a zero moment matrix must violate PSD cuts"
    for _ in range(50):
        x = rng.rand(n)
        Xm = np.outer(x, x)
        for entries, rhs in cuts:
            assert _cut_value(entries, x, Xm, n) <= rhs + 1e-9


def test_eigen_cut_cuts_off_the_separation_point():
    """The separated cut must be violated at the point it was built from."""
    n = 6
    q, v = _random_qv(n, 3)
    lp = cert._NodeLP(q, v)
    x = np.full(n, 0.5)
    Xm = np.zeros((n, n))  # moment defect -x x^T is negative definite
    cuts = lp._separate_eigen(x, Xm)
    assert cuts
    entries, rhs = cuts[0]
    assert _cut_value(entries, x, Xm, n) > rhs + 1e-8


@pytest.mark.parametrize("seed", [0, 1])
def test_triangle_cuts_valid_for_exact_moments(seed):
    n = 6
    q, v = _random_qv(n, seed)
    lp = cert._NodeLP(q, v)
    rng = np.random.RandomState(seed)
    # Random infeasible moment point to force separation.
    x_sep = rng.rand(n)
    X_sep = np.outer(x_sep, x_sep) * 0.2
    cuts = lp._separate_triangles(x_sep, X_sep)
    for _ in range(50):
        x = rng.rand(n)
        Xm = np.outer(x, x)
        for entries, rhs in cuts:
            assert _cut_value(entries, x, Xm, n) <= rhs + 1e-9


def test_certify_small_instance_end_to_end():
    """B&B must certify a small concave-ish instance and agree with brute
    force over the box corners + interior stationary point."""
    n = 5
    rng = np.random.RandomState(7)
    a = rng.randn(n, n)
    q = (a + a.T) / 2
    v = rng.randn(n)
    # Brute-force the maximum over all vertices and polished interior points.
    best = -np.inf
    for mask in range(1 << n):
        x = np.array([(mask >> k) & 1 for k in range(n)], float)
        _, val = cert._active_set_polish(q, v, x)
        best = max(best, val)
    x0, val0 = cert._active_set_polish(q, v, np.full(n, 0.5))
    best = max(best, val0)
    proven, bval, bx, ub, nodes, wall = cert.certify(
        q, v, val0, x0, tol=1e-6, max_nodes=5000, max_seconds=120.0
    )
    assert proven
    assert bval == pytest.approx(best, abs=1e-5)
    assert ub <= best + 1e-4


def test_pool_grows_and_prunes():
    n = 6
    q, v = _random_qv(n, 11)
    lp = cert._NodeLP(q, v, max_pool=5)
    lp.solve(np.zeros(n), np.ones(n), rounds=3)
    assert len(lp.pool) == len(lp.pool_idle)
    lp.pool_idle = [100] * len(lp.pool)  # mark everything stale
    lp._prune_pool()
    assert len(lp.pool) <= 5
