"""Unit tests for the fused-kernel RNG plumbing and the unrolled loop driver.

The hardware PRNG itself only exists on real TPU (noise-on statistics are
validated there by tools/tpu_validate.py); here we check the pieces that are
testable everywhere: normalisation constants, rng-name validation, and the
tail-loop path of :func:`_run_unrolled` for iteration counts that do not
divide the unroll factor (including iterations < unroll).
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import langevin as lgv
from ccvm_tpu.ops import pallas_kernels as pk

N = 20
BATCH = 16


def test_popcount32_normalisation_constant():
    """popcount(u32) is Binomial(32, 1/2): mean 16, var 8 — the kernel's
    (pc - 16) * _POPC32_INV_STD must be exactly unit-variance, zero-mean."""
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**32, size=200_000, dtype=np.uint64)
    pc = np.array([bin(int(b)).count("1") for b in bits[:50_000]])
    z = (pc - 16) * pk._POPC32_INV_STD
    assert abs(z.mean()) < 0.03
    assert abs(z.std() - 1.0) < 0.02


def test_popcount64_normalisation_constant():
    """The 3-word scheme: Binomial(64,1/2) centred + U[-1/2,1/2), variance
    16 + 1/12."""
    var = 16.0 + 1.0 / 12.0
    assert np.isclose(pk._POPC_INV_STD, 1.0 / np.sqrt(var))


def test_bad_rng_name_raises():
    with pytest.raises(ValueError, match="rng must be one of"):
        pk._noise_pair((8, 128), 1.0, rng="nope")
    with pytest.raises(ValueError, match="rng must be one of"):
        pk._noise_one((8, 128), 1.0, rng="nope")


def _zeros_normal(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


@pytest.mark.parametrize("iters", [3, 8, 11, 16])
def test_unrolled_tail_loop_matches_oracle(iters):
    """iterations % _UNROLL != 0 (and iterations < _UNROLL) must agree with
    the lax oracle — exercises the scalar tail loop in _run_unrolled."""
    rng = np.random.RandomState(1)
    a = rng.randn(N, N).astype(np.float32)
    q = jnp.asarray((a + a.T) / 2)
    v = jnp.asarray(rng.randn(N).astype(np.float32))
    key = jax.random.PRNGKey(0)
    p = lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.002), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = lgv.solve(key, q, v, p, iterations=iters, batch_size=BATCH)
    c_pal = pk.langevin_solve(
        key, q, v, p, iterations=iters, batch_size=BATCH,
        interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=1e-5)


def test_popcount16_halves_are_unit_normals():
    """popcount of each 16-bit half of a u32 is Binomial(16, 1/2): mean 8,
    var 4 — (pc - 8) * 0.5 must be zero-mean unit-variance, and the two
    halves independent (they come from disjoint bits)."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2**32, size=100_000, dtype=np.uint64)
    lo = np.array([bin(int(b) & 0xFFFF).count("1") for b in bits[:40_000]])
    hi = np.array([bin((int(b) >> 16) & 0xFFFF).count("1")
                   for b in bits[:40_000]])
    z1, z2 = (lo - 8) * 0.5, (hi - 8) * 0.5
    for z in (z1, z2):
        assert abs(z.mean()) < 0.03
        assert abs(z.std() - 1.0) < 0.02
    corr = np.corrcoef(z1, z2)[0, 1]
    assert abs(corr) < 0.02


def test_popcount16_dispatches_to_half_word_generator(monkeypatch):
    """rng="popcount16" must reach _normal_pair_popcount16 for pair draws
    and the one-word generator for single draws (noise_scale != 0 so the
    zero-noise shortcut cannot mask a broken dispatch — the TPU primitive
    itself is stubbed out since it does not exist on CPU)."""
    calls = []
    monkeypatch.setattr(
        pk, "_normal_pair_popcount16",
        lambda shape: calls.append("pair16")
        or (jnp.zeros(shape), jnp.zeros(shape)),
    )
    monkeypatch.setattr(
        pk, "_normal_one_popcount",
        lambda shape: calls.append("one32") or jnp.zeros(shape),
    )
    z1, z2 = pk._noise_pair((8, 128), 1.0, rng="popcount16")
    assert z1.shape == (8, 128) and z2.shape == (8, 128)
    z = pk._noise_one((8, 128), 1.0, rng="popcount16")
    assert z.shape == (8, 128)
    assert calls == ["pair16", "one32"]
