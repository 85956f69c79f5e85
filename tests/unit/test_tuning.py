"""Tests for the working grid-search tune() (the reference's tune() is an
unimplemented placeholder that crashes on a read-only property,
``dl_solver.py:327-329``; SURVEY.md section 7 step 8 calls for a real one)."""

import numpy as np
import pytest

from ccvm_tpu.problem_classes.boxqp import ProblemInstance
from ccvm_tpu.solvers import LangevinSolver

N = 8


@pytest.fixture
def instance(tmp_path):
    rng = np.random.RandomState(0)
    a = rng.randn(N, N)
    q = (a + a.T) / 2
    v = rng.randn(N)
    lines = [f"{N}\t10.0\t9.0\t90.0\t0.1\t0.1\t0\t0\n"]
    lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
    for row in q:
        lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
    path = tmp_path / "t.in"
    path.write_text("".join(lines))
    return ProblemInstance(
        instance_type="tuning", file_path=str(path), device="cpu"
    )


def _solver():
    s = LangevinSolver(device="cpu", batch_size=32, backend="lax")
    s.parameter_key = {
        N: {"dt": 0.02, "S": 0.5, "iterations": 50, "sigma": 0.5,
            "feedback_scale": 1.0}
    }
    return s


def test_tune_picks_a_candidate_and_sets_is_tuned(instance):
    solver = _solver()
    assert not solver.is_tuned
    best = solver.tune(
        [instance],
        parameter_ranges={"dt": [0.005, 0.02], "sigma": [0.1, 0.5]},
        tuning_batch_size=16,
        seed=0,
    )
    assert solver.is_tuned
    assert best[N]["dt"] in (0.005, 0.02)
    assert best[N]["sigma"] in (0.1, 0.5)
    # non-tuned keys keep their base values
    assert best[N]["iterations"] == 50
    assert solver.parameter_key == best


def test_tune_restores_batch_size(instance):
    solver = _solver()
    solver.tune([instance], parameter_ranges={"dt": [0.02]},
                tuning_batch_size=8)
    assert solver.batch_size == 32


def test_tune_requires_base_parameter_key(instance):
    solver = LangevinSolver(device="cpu", batch_size=8, backend="lax")
    with pytest.raises(ValueError, match="parameter_key"):
        solver.tune([instance], parameter_ranges={"dt": [0.01]})


def test_tune_unknown_size_raises(instance):
    solver = _solver()
    solver._parameter_key = {99: dict(solver.parameter_key[N])}
    with pytest.raises(KeyError):
        solver.tune([instance], parameter_ranges={"dt": [0.01]})


def _make_instance(tmp_path, seed, name):
    rng = np.random.RandomState(seed)
    a = rng.randn(N, N)
    q = (a + a.T) / 2
    v = rng.randn(N)
    lines = [f"{N}\t10.0\t9.0\t90.0\t0.1\t0.1\t0\t0\n"]
    lines.append("\t".join(f"{x:.6f}" for x in v) + "\n")
    for row in q:
        lines.append("\t".join(f"{x:.6f}" for x in row) + "\n")
    path = tmp_path / name
    path.write_text("".join(lines))
    return ProblemInstance(
        instance_type="tuning", file_path=str(path), device="cpu"
    )


def test_tune_stacks_multi_instance_scoring_through_sweep(tmp_path, monkeypatch):
    """With >1 instance per size, each candidate is scored by ONE
    sweep_solve dispatch (the framework's stacked path), not a serial
    per-instance loop."""
    import ccvm_tpu.parallel.sweep as sweep_mod
    from ccvm_tpu import tuning

    insts = [_make_instance(tmp_path, s, f"i{s}.in") for s in (1, 2, 3)]
    solver = _solver()
    for inst in insts:
        inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))

    calls = []
    real_sweep = sweep_mod.sweep_solve

    def counting_sweep(*args, **kwargs):
        calls.append(kwargs.get("seed"))
        return real_sweep(*args, **kwargs)

    monkeypatch.setattr(sweep_mod, "sweep_solve", counting_sweep)
    best = tuning.tune_solver(
        solver, insts, parameter_ranges={"dt": [0.005, 0.02]},
        tuning_batch_size=16, seed=3,
    )
    assert len(calls) == 2  # one dispatch per candidate, not per instance
    assert best[N]["dt"] in (0.005, 0.02)


def test_tune_use_sweep_false_goes_serial(tmp_path, monkeypatch):
    import ccvm_tpu.parallel.sweep as sweep_mod
    from ccvm_tpu import tuning

    insts = [_make_instance(tmp_path, s, f"i{s}.in") for s in (1, 2)]
    solver = _solver()
    for inst in insts:
        inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))

    def boom(*args, **kwargs):
        raise AssertionError("sweep path must not be used")

    monkeypatch.setattr(sweep_mod, "sweep_solve", boom)
    best = tuning.tune_solver(
        solver, insts, parameter_ranges={"dt": [0.02]},
        tuning_batch_size=8, use_sweep=False,
    )
    assert best[N]["dt"] == 0.02


def test_setting_parameter_key_clears_is_tuned(instance):
    solver = _solver()
    solver.tune([instance], parameter_ranges={"dt": [0.02]},
                tuning_batch_size=8)
    assert solver.is_tuned
    solver.parameter_key = {
        N: {"dt": 0.01, "S": 0.5, "iterations": 50, "sigma": 0.5,
            "feedback_scale": 1.0}
    }
    assert not solver.is_tuned


def test_tune_confirmation_pass_rescores_top_k(tmp_path, monkeypatch):
    """confirm_seeds > 1 re-scores the top-k finalists with extra seeds and
    picks the winner by MEAN score (one-seed grid scores are too noisy to
    separate adjacent fine-grid candidates)."""
    import ccvm_tpu.parallel.sweep as sweep_mod
    from ccvm_tpu import tuning

    insts = [_make_instance(tmp_path, s, f"c{s}.in") for s in (1, 2, 3)]
    solver = _solver()
    for inst in insts:
        inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))

    seeds_seen = []
    real_sweep = sweep_mod.sweep_solve

    def counting_sweep(*args, **kwargs):
        seeds_seen.append(kwargs.get("seed"))
        return real_sweep(*args, **kwargs)

    monkeypatch.setattr(sweep_mod, "sweep_solve", counting_sweep)
    best = tuning.tune_solver(
        solver, insts, parameter_ranges={"dt": [0.005, 0.02]},
        tuning_batch_size=16, seed=3, confirm_seeds=3, confirm_top_k=2,
    )
    # 2 grid dispatches + 2 finalists x 2 extra confirmation seeds = 6.
    assert len(seeds_seen) == 6
    assert len(set(seeds_seen)) == 3  # three distinct seeds used
    assert best[N]["dt"] in (0.005, 0.02)


def test_tune_accepts_algorithm_parameters(tmp_path):
    """Adam-in-the-loop dynamics can be tuned (threaded through the sweep)."""
    from ccvm_tpu import tuning
    from ccvm_tpu.solvers.algorithms import AdamParameters

    insts = [_make_instance(tmp_path, s, f"a{s}.in") for s in (1, 2)]
    solver = _solver()
    for inst in insts:
        inst.scale_coefs(solver.get_scaling_factor(inst.q_matrix))

    best = tuning.tune_solver(
        solver, insts, parameter_ranges={"dt": [0.02]},
        tuning_batch_size=8,
        algorithm_parameters=AdamParameters(alpha=0.1, beta1=0.9, beta2=0.999),
    )
    assert best[N]["dt"] == 0.02
