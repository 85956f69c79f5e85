"""Pallas-kernel-vs-lax-oracle equivalence tests (SURVEY.md section 4).

The kernels run in interpreter mode on CPU with ``noise_scale=0``, which
statically elides the TPU hardware PRNG; the lax oracle's noise is patched to
zero.  With noise off both paths are deterministic, so the drift math,
schedules, clamps, and change-of-variable handling must agree to float32
round-off.  (Noise-on statistical agreement is validated on real TPU
hardware; see tools/tpu_validate.py.)
"""

from __future__ import annotations

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import dl as dldyn
from ccvm_tpu.dynamics import langevin as lgv
from ccvm_tpu.dynamics import mf as mfdyn
from ccvm_tpu.dynamics import pumped_langevin as plgv
from ccvm_tpu.ops import pallas_kernels as pk

N = 20
BATCH = 16
ITERS = 50
TOL = 1e-5


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    a = rng.randn(N, N).astype(np.float32)
    q = jnp.asarray((a + a.T) / 2)
    v = jnp.asarray(rng.randn(N).astype(np.float32))
    return q, v


def _zeros_normal(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def test_langevin_kernel_matches_lax_oracle(problem):
    q, v = problem
    key = jax.random.PRNGKey(0)
    p = lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.002), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = lgv.solve(key, q, v, p, iterations=ITERS, batch_size=BATCH)
    c_pal = pk.langevin_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)


def test_pumped_langevin_kernel_matches_lax_oracle(problem):
    q, v = problem
    key = jax.random.PRNGKey(0)
    p = plgv.PumpedLangevinParams(
        pump=jnp.float32(2.0), S=jnp.float32(0.5), dt=jnp.float32(0.002),
        sigma=jnp.float32(0.5), feedback_scale=jnp.float32(1.0),
        lower_limit=jnp.float32(0.0), upper_limit=jnp.float32(1.0),
        iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = plgv.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True,
        )
    c_pal = pk.pumped_langevin_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)


@pytest.mark.parametrize("pump_is_gt_one", [True, False])
def test_dl_kernel_matches_lax_oracle(problem, pump_is_gt_one):
    q, v = problem
    key = jax.random.PRNGKey(0)
    pump = 8.0 if pump_is_gt_one else 0.5
    p = dldyn.DLParams(
        pump=jnp.float32(pump), S=jnp.float32(1.0), dt=jnp.float32(0.001),
        noise_ratio=jnp.float32(10.0), feedback_scale=jnp.float32(100.0),
        g=jnp.float32(0.05), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax, s_lax = dldyn.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True, pump_is_gt_one=pump_is_gt_one,
        )
    c_pal, s_pal = pk.dl_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, pump_is_gt_one=pump_is_gt_one,
        interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)
    np.testing.assert_allclose(s_pal, s_lax, atol=TOL)


def test_mf_kernel_matches_lax_oracle(problem):
    q, v = problem
    key = jax.random.PRNGKey(0)
    p = mfdyn.MFParams(
        pump=jnp.float32(0.0), S=jnp.float32(20.0), dt=jnp.float32(0.0025),
        j=jnp.float32(5.0), feedback_scale=jnp.float32(4000.0),
        g=jnp.float32(0.001), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        mu_lax, mt_lax, sg_lax = mfdyn.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True,
        )
    mu_pal, mt_pal, sg_pal = pk.mf_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(mu_pal, mu_lax, atol=TOL)
    np.testing.assert_allclose(mt_pal, mt_lax, atol=TOL)
    np.testing.assert_allclose(sg_pal, sg_lax, atol=TOL)


def test_kernel_rejects_per_variable_s(problem):
    """Per-variable S configs fall back to the lax path (return None)."""
    q, v = problem
    key = jax.random.PRNGKey(0)
    p = lgv.LangevinParams(
        S=jnp.ones((4, N), jnp.float32) * 0.5, dt=jnp.float32(0.002),
        sigma=jnp.float32(0.5), feedback_scale=jnp.float32(1.0),
        lower_limit=jnp.float32(0.0), upper_limit=jnp.float32(1.0),
    )
    assert pk.langevin_solve(
        key, q, v, p, iterations=2, batch_size=4, interpret=True
    ) is None


def test_tile_plan_splits_large_batches():
    pb, tile, grid = pk._tile_plan(1000, 128, 2)
    assert (pb, tile, grid) == (1000, 1000, 1)
    pb, tile, grid = pk._tile_plan(100_000, 128, 2)
    assert tile * grid == pb >= 100_000
    assert pk._vmem_ok(tile, 128, 2)
    # even split: padding waste is bounded by one sublane per grid program
    assert pb - 100_000 <= 8 * grid


def test_langevin_kernel_tiled_matches_lax_oracle(problem, monkeypatch):
    """Force multi-program tiling (tiny VMEM budget) and check the grid path
    agrees with the lax oracle noise-free."""
    q, v = problem
    key = jax.random.PRNGKey(0)
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 128 * 1024)
    p = lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.002), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )
    batch = 64
    _, _, grid = pk._tile_plan(batch, 128, 1)
    assert grid > 1
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = lgv.solve(key, q, v, p, iterations=ITERS, batch_size=batch)
    c_pal = pk.langevin_solve(
        key, q, v, p, iterations=ITERS, batch_size=batch,
        interpret=True, noise_scale=0.0,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)


@pytest.fixture(scope="module")
def stacked_problem():
    rng = np.random.RandomState(3)
    qs, vs = [], []
    for _ in range(3):
        a = rng.randn(N, N).astype(np.float32)
        qs.append((a + a.T) / 2)
        vs.append(rng.randn(N).astype(np.float32))
    return jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(vs))


def test_stacked_langevin_kernel_matches_per_instance(stacked_problem):
    """The (instance, batch_tile) grid must reproduce per-instance kernel
    calls exactly in the noise-free mode."""
    qs, vs = stacked_problem
    key = jax.random.PRNGKey(0)
    p = lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.002), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )
    c_stacked = pk.langevin_solve(
        key, qs, vs, p, iterations=ITERS, batch_size=BATCH,
        interpret=True, noise_scale=0.0,
    )
    assert c_stacked.shape == (3, BATCH, N)
    for i in range(3):
        c_one = pk.langevin_solve(
            key, qs[i], vs[i], p, iterations=ITERS, batch_size=BATCH,
            interpret=True, noise_scale=0.0,
        )
        np.testing.assert_allclose(c_stacked[i], c_one, atol=TOL)


def test_stacked_dl_kernel_matches_lax_oracle(stacked_problem):
    qs, vs = stacked_problem
    key = jax.random.PRNGKey(0)
    p = dldyn.DLParams(
        pump=jnp.float32(8.0), S=jnp.float32(1.0), dt=jnp.float32(0.001),
        noise_ratio=jnp.float32(10.0), feedback_scale=jnp.float32(100.0),
        g=jnp.float32(0.05), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    c_st, s_st = pk.dl_solve(
        key, qs, vs, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, pump_is_gt_one=True,
        interpret=True, noise_scale=0.0,
    )
    assert c_st.shape == (3, BATCH, N)
    with mock.patch.object(common, "normal", _zeros_normal):
        for i in range(3):
            c_lax, s_lax = dldyn.solve(
                key, qs[i], vs[i], p, iterations=ITERS, batch_size=BATCH,
                pump_rate_flag=True, pump_is_gt_one=True,
            )
            np.testing.assert_allclose(c_st[i], c_lax, atol=TOL)
            np.testing.assert_allclose(s_st[i], s_lax, atol=TOL)


def test_stacked_mf_kernel_matches_lax_oracle(stacked_problem):
    qs, vs = stacked_problem
    key = jax.random.PRNGKey(0)
    p = mfdyn.MFParams(
        pump=jnp.float32(0.0), S=jnp.float32(20.0), dt=jnp.float32(0.0025),
        j=jnp.float32(5.0), feedback_scale=jnp.float32(4000.0),
        g=jnp.float32(0.001), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    mu_st, mt_st, sg_st = pk.mf_solve(
        key, qs, vs, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0,
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        for i in range(3):
            mu_lax, mt_lax, sg_lax = mfdyn.solve(
                key, qs[i], vs[i], p, iterations=ITERS, batch_size=BATCH,
                pump_rate_flag=True,
            )
            np.testing.assert_allclose(mu_st[i], mu_lax, atol=TOL)
            np.testing.assert_allclose(mt_st[i], mt_lax, atol=TOL)
            np.testing.assert_allclose(sg_st[i], sg_lax, atol=TOL)


def test_stacked_pumped_langevin_kernel_matches_lax_oracle(stacked_problem):
    qs, vs = stacked_problem
    key = jax.random.PRNGKey(0)
    p = plgv.PumpedLangevinParams(
        pump=jnp.float32(2.0), S=jnp.float32(0.5), dt=jnp.float32(0.002),
        sigma=jnp.float32(0.5), feedback_scale=jnp.float32(1.0),
        lower_limit=jnp.float32(0.0), upper_limit=jnp.float32(1.0),
        iterations=jnp.float32(ITERS),
    )
    c_st = pk.pumped_langevin_solve(
        key, qs, vs, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0,
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        for i in range(3):
            c_lax = plgv.solve(
                key, qs[i], vs[i], p, iterations=ITERS, batch_size=BATCH,
                pump_rate_flag=True,
            )
            np.testing.assert_allclose(c_st[i], c_lax, atol=TOL)


# ---------------------------------------------------------------------------
# Fused Adam-in-loop kernels (VERDICT round 2, item 6): noise-free oracle
# equivalence against the lax Adam path for DL and Langevin, across the
# beta2/add_assign specialization matrix.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "beta2,add_assign", [(0.99, False), (1.0, False), (0.99, True)]
)
def test_langevin_adam_kernel_matches_lax_oracle(problem, beta2, add_assign):
    q, v = problem
    key = jax.random.PRNGKey(0)
    hp = common.AdamHyperparameters(
        alpha=0.1, beta1=0.9, beta2=beta2, add_assign=add_assign
    )
    p = lgv.LangevinParams(
        S=jnp.float32(0.5), dt=jnp.float32(0.002), sigma=jnp.float32(0.5),
        feedback_scale=jnp.float32(1.0), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = lgv.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH, hp=hp
        )
    c_pal = pk.langevin_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        interpret=True, noise_scale=0.0, hp=hp,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)


@pytest.mark.parametrize("beta2", [0.99, 1.0])
def test_dl_adam_kernel_matches_lax_oracle(problem, beta2):
    q, v = problem
    key = jax.random.PRNGKey(0)
    hp = common.AdamHyperparameters(
        alpha=0.1, beta1=0.9, beta2=beta2, add_assign=False
    )
    p = dldyn.DLParams(
        pump=jnp.float32(8.0), S=jnp.float32(1.0), dt=jnp.float32(0.001),
        noise_ratio=jnp.float32(10.0), feedback_scale=jnp.float32(100.0),
        g=jnp.float32(0.05), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax, s_lax = dldyn.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True, pump_is_gt_one=True, hp=hp,
        )
    c_pal, s_pal = pk.dl_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, pump_is_gt_one=True,
        interpret=True, noise_scale=0.0, hp=hp,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)
    np.testing.assert_allclose(s_pal, s_lax, atol=TOL)


@pytest.mark.parametrize(
    "beta2,add_assign", [(0.99, False), (1.0, False), (0.99, True)]
)
def test_pumped_langevin_adam_kernel_matches_lax_oracle(
    problem, beta2, add_assign
):
    q, v = problem
    key = jax.random.PRNGKey(0)
    hp = common.AdamHyperparameters(
        alpha=0.1, beta1=0.9, beta2=beta2, add_assign=add_assign
    )
    p = plgv.PumpedLangevinParams(
        pump=jnp.float32(2.0), S=jnp.float32(0.5), dt=jnp.float32(0.002),
        sigma=jnp.float32(0.5), feedback_scale=jnp.float32(1.0),
        lower_limit=jnp.float32(0.0), upper_limit=jnp.float32(1.0),
        iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        c_lax = plgv.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True, hp=hp,
        )
    c_pal = pk.pumped_langevin_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0, hp=hp,
    )
    np.testing.assert_allclose(c_pal, c_lax, atol=TOL)


@pytest.mark.parametrize(
    "beta2,add_assign", [(0.99, False), (1.0, False), (0.99, True)]
)
def test_mf_adam_kernel_matches_lax_oracle(problem, beta2, add_assign):
    q, v = problem
    key = jax.random.PRNGKey(0)
    hp = common.AdamHyperparameters(
        alpha=0.1, beta1=0.9, beta2=beta2, add_assign=add_assign
    )
    p = mfdyn.MFParams(
        pump=jnp.float32(0.0), S=jnp.float32(20.0), dt=jnp.float32(0.0025),
        j=jnp.float32(5.0), feedback_scale=jnp.float32(4000.0),
        g=jnp.float32(0.001), lower_limit=jnp.float32(0.0),
        upper_limit=jnp.float32(1.0), iterations=jnp.float32(ITERS),
    )
    with mock.patch.object(common, "normal", _zeros_normal):
        mu_lax, mt_lax, sg_lax = mfdyn.solve(
            key, q, v, p, iterations=ITERS, batch_size=BATCH,
            pump_rate_flag=True, hp=hp,
        )
    mu_pal, mt_pal, sg_pal = pk.mf_solve(
        key, q, v, p, iterations=ITERS, batch_size=BATCH,
        pump_rate_flag=True, interpret=True, noise_scale=0.0, hp=hp,
    )
    np.testing.assert_allclose(mu_pal, mu_lax, atol=TOL)
    np.testing.assert_allclose(mt_pal, mt_lax, atol=TOL)
    np.testing.assert_allclose(sg_pal, sg_lax, atol=TOL)


def test_stacked_seed_derivation_matches_serial():
    """The sweep seed contract (sweep.py): stacked instance i's kernel seed
    is derived from PRNGKey(seed + i), exactly as a serial solve of that
    instance would derive it."""
    seed = 11
    keys = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(5)])
    stacked = pk._seed_from_key(keys)
    assert stacked.shape == (5, 1)
    for i in range(5):
        single = pk._seed_from_key(jax.random.PRNGKey(seed + i))
        assert single.shape == (1, 1)
        np.testing.assert_array_equal(stacked[i], single[0])


def test_seeds_for_single_key_stacked_call_are_distinct():
    """A single key driving a stacked call still gives every instance an
    independent stream (the key is split per instance)."""
    seeds = pk._seeds_for(jax.random.PRNGKey(0), 8)
    assert seeds.shape == (8, 1)
    assert len(np.unique(np.asarray(seeds))) == 8
