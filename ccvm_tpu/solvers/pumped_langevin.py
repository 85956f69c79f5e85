"""Pumped Langevin solver façade (API parity with
``ccvm_simulators/solvers/pumped_langevin_solver.py``)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import pumped_langevin as dyn
from ccvm_tpu.native import write_sample_rows
from ccvm_tpu.post_processor.factory import PostProcessorFactory
from ccvm_tpu.solution import Solution
from ccvm_tpu.solvers.algorithms import AdamParameters
from ccvm_tpu.solvers.base import CCVMSolver

PUMPED_LANGEVIN_SCALING_MULTIPLIER = 0.05
"""Reference ``pumped_langevin_solver.py:10``."""


class PumpedLangevinSolver(CCVMSolver):
    """Langevin dynamics extended with a pump/saturation drift term
    (reference ``pumped_langevin_solver.py:18``)."""

    def __init__(
        self,
        device,
        problem_category="boxqp",
        batch_size=1000,
        mesh=None,
        backend="auto",
        timing="sync",
        kernel_rng="popcount32",
    ):
        super().__init__(device, mesh=mesh, timing=timing)
        self.batch_size = batch_size
        self.backend = backend
        self.kernel_rng = kernel_rng
        self._scaling_multiplier = PUMPED_LANGEVIN_SCALING_MULTIPLIER
        self._method_selector(problem_category)

    @property
    def parameter_key(self):
        """Keys must be exactly {pump, dt, S, iterations, sigma,
        feedback_scale} (reference ``:74-93``)."""
        return self._parameter_key

    @parameter_key.setter
    def parameter_key(self, parameters):
        expected_pl_parameter_key_set = set(
            ["pump", "dt", "S", "iterations", "sigma", "feedback_scale"]
        )
        for parameter_key in parameters.values():
            if parameter_key.keys() != expected_pl_parameter_key_set:
                raise ValueError(
                    "The parameter key is not valid for this solver. Expected keys: "
                    + str(expected_pl_parameter_key_set)
                    + " Given keys: "
                    + str(parameter_key.keys())
                )
        self._parameter_key = parameters
        self._is_tuned = False

    ##################################
    # Problem-category methods       #
    ##################################

    def _calculate_drift_boxqp(self, c, p, S, feedback_scale):
        """Pump drift + feedback gradient (reference ``:95-116``)."""
        c = jnp.asarray(c)
        lo, hi = self.solution_bounds
        g = dyn.grads_boxqp(c, self.q_matrix, self.v_vector, lo, hi, S)
        return (-1 + p - jnp.square(c)) * c + feedback_scale * g

    def _calculate_grads_boxqp(self, c, lower_limit=0, upper_limit=1, S=1):
        return dyn.grads_boxqp(
            jnp.asarray(c), self.q_matrix, self.v_vector, lower_limit, upper_limit, S
        )

    def _change_variables_boxqp(self, problem_variables, lower_limit=0, upper_limit=1, S=1):
        return common.change_variables_boxqp(
            jnp.asarray(problem_variables), lower_limit, upper_limit, S
        )

    def _fit_to_constraints_boxqp(self, c, lower_clamp, upper_clamp):
        return common.fit_to_constraints_boxqp(jnp.asarray(c), lower_clamp, upper_clamp)

    def _append_samples_to_file(self, c_sample, evolution_file_object):
        """Reference's writer requires an s_sample it never passes
        (``:632-636``); we write the c block only — documented fix."""
        write_sample_rows(evolution_file_object, np.asarray(c_sample))

    def tune(self, instances, post_processor=None, parameter_ranges=None, **kwargs):
        """Working grid-search tuner (see :mod:`ccvm_tpu.tuning`)."""
        from ccvm_tpu.tuning import tune_solver

        best = tune_solver(
            self, instances, parameter_ranges=parameter_ranges,
            post_processor=post_processor, **kwargs,
        )
        self._parameter_key = best
        self._is_tuned = True
        return best

    ##################################
    # Solve paths                    #
    ##################################

    def _make_params(self, pump, S, dt, sigma, feedback_scale, iterations):
        lo, hi = self.solution_bounds
        return dyn.PumpedLangevinParams(
            pump=np.float32(pump),
            S=np.asarray(S, np.float32),
            dt=np.float32(dt),
            sigma=np.float32(sigma),
            feedback_scale=np.float32(feedback_scale),
            lower_limit=np.float32(lo),
            upper_limit=np.float32(hi),
            iterations=np.float32(iterations),
        )

    def _solve(self, key, params, iterations, pump_rate_flag, evolution_step_size, hp=None):
        # Evaluated on every solve (including evolution sampling) so an
        # explicit backend="pallas" that a feature forces onto the lax path
        # logs the reason instead of silently degrading.
        # hp_in_kernel: the pumped-Langevin Adam variant has a fused
        # kernel (moment arrays in VMEM scratch), so Adam solves stay
        # fused.
        use_pallas = self._use_pallas(evolution_step_size, params.S, hp,
                                      hp_in_kernel=True)
        if not evolution_step_size:
            if use_pallas:
                from ccvm_tpu.ops import pallas_kernels as kernels

                c = kernels.pumped_langevin_solve(
                    key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag, rng=self.kernel_rng,
                    hp=hp,
                )
                if c is not None:
                    return c
            tp_mesh = self._tp_mesh()
            if tp_mesh is not None:
                from ccvm_tpu.parallel import tp

                return tp.pumped_langevin_solve(
                    tp_mesh, key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag, hp=hp,
                )
            key, q, v, params = self._replicate_for_mesh(
                key, self.q_matrix, self.v_vector, params
            )
            return dyn.solve(
                key, q, v, params,
                iterations=iterations, batch_size=self.batch_size,
                pump_rate_flag=pump_rate_flag, hp=hp,
                shard=self._batch_sharding(),
            )

        # In-jit evolution sampling: one dispatch, one sync (see langevin.py).
        num_samples, segments = self._evolution_sample_plan(
            iterations, evolution_step_size
        )
        c, samples = dyn.solve_sampled(
            key, self.q_matrix, self.v_vector, params,
            np.asarray(segments, np.int32), batch_size=self.batch_size,
            pump_rate_flag=pump_rate_flag, hp=hp,
        )
        self.c_sample = self._device_sample_stack(samples, num_samples)
        return c

    def _solve_adam(
        self, key, params, iterations, pump_rate_flag, evolution_step_size,
        hyperparameters,
    ):
        return self._solve(
            key, params, iterations, pump_rate_flag, evolution_step_size,
            hp=hyperparameters,
        )

    def __call__(
        self,
        instance,
        post_processor=None,
        pump_rate_flag=True,
        evolution_step_size=None,
        evolution_file=None,
        algorithm_parameters=None,
        seed=None,
    ):
        """Solve an instance (reference ``pumped_langevin_solver.py:451-658``)."""
        if instance.device != self.device:
            raise ValueError(
                f"The device type of the instance ({instance.device}) and the solver"
                f" ({self.device}) must match."
            )

        problem_size = instance.problem_size
        self.q_matrix = instance.q_matrix
        self.v_vector = instance.v_vector
        self.solution_bounds = instance.solution_bounds

        batch_size = self.batch_size

        try:
            pump = self.parameter_key[problem_size]["pump"]
            dt = self.parameter_key[problem_size]["dt"]
            S = self.parameter_key[problem_size]["S"]
            iterations = self.parameter_key[problem_size]["iterations"]
            sigma = self.parameter_key[problem_size]["sigma"]
            feedback_scale = self.parameter_key[problem_size]["feedback_scale"]
        except KeyError as e:
            raise KeyError(
                f"The parameter '{e.args[0]}' for the given instance size is not defined."
            ) from e

        S = np.asarray(S, np.float32) if not np.isscalar(S) else S
        if np.ndim(S) == 1:
            if S.shape[0] == problem_size:
                S = np.outer(np.ones(batch_size, np.float32), S)
            else:
                raise ValueError("Tensor S size should be equal to problem size.")

        solve_time_start = time.time()

        self.c_sample = None
        if evolution_step_size:
            if evolution_step_size < 1:
                raise ValueError(
                    "The evolution step size must be greater than or equal to 1."
                )
            if evolution_file is None:
                evolution_file = f"./{instance.name}_evolution.txt"

        params = self._make_params(pump, S, dt, sigma, feedback_scale, iterations)
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**31)
        key = jax.random.PRNGKey(int(seed))

        if algorithm_parameters is None:
            c = self._solve(key, params, iterations, pump_rate_flag, evolution_step_size)
        elif isinstance(algorithm_parameters, AdamParameters):
            c = self._solve_adam(
                key, params, iterations, pump_rate_flag, evolution_step_size,
                algorithm_parameters.to_hyperparameters(),
            )
        else:
            raise ValueError(
                f"Solver option type {type(algorithm_parameters)} is not supported."
            )
        if self.timing == "sync":
            c = jax.block_until_ready(c)
        solve_time = (time.time() - solve_time_start) / batch_size

        # Calibrate the variable before post-processing (reference :603-619)
        c_prime = common.langevin_change_variables(c, params.S)
        if post_processor:
            post_processor_object = PostProcessorFactory.create_postprocessor(
                post_processor
            )
            problem_variables = post_processor_object.postprocess(
                c_prime, self.q_matrix, self.v_vector
            )
            pp_time = post_processor_object.pp_time / batch_size
        else:
            problem_variables = c_prime
            pp_time = 0.0

        # Float64 host readout energy: solution statistics need more than
        # float32 precision near the 0.1% gap; the mixed-precision readout
        # (compute_energy_readout64) keeps the big (batch, n) array on
        # device and transfers only the energies + boundary rows;
        # the device->host transfer doubles as the pipeline's single sync.
        objval = instance.compute_energy_readout64(problem_variables)

        if self.timing == "async":
            solve_time = (time.time() - solve_time_start) / batch_size - pp_time

        if evolution_step_size:
            open(evolution_file, "w").close()
            batch_index = int(jnp.argmax(-objval))
            with open(evolution_file, "a") as evolution_file_obj:
                self._append_samples_to_file(
                    c_sample=self.c_sample[batch_index],
                    evolution_file_object=evolution_file_obj,
                )

        solution = Solution(
            problem_size=instance.problem_size,
            batch_size=batch_size,
            instance_name=instance.name,
            iterations=iterations,
            objective_values=objval,
            solve_time=solve_time,
            pp_time=pp_time,
            optimal_value=instance.optimal_sol,
            best_value=instance.best_sol,
            num_frac_values=instance.num_frac_values,
            solution_vector=instance.solution_vector,
            variables={"problem_variables": problem_variables},
            device=self.device,
        )

        if evolution_step_size:
            solution.evolution_file = evolution_file

        return solution
