"""DL-CCVM solver façade (API parity with
``ccvm_simulators/solvers/dl_solver.py``)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from pandas import DataFrame

from ccvm_tpu.dynamics import common
from ccvm_tpu.dynamics import dl as dyn
from ccvm_tpu.native import write_sample_rows
from ccvm_tpu.post_processor.factory import PostProcessorFactory
from ccvm_tpu.solution import Solution
from ccvm_tpu.solvers.algorithms import AdamParameters
from ccvm_tpu.solvers.base import CCVMSolver

DL_SCALING_MULTIPLIER = 0.2
"""Reference ``dl_solver.py:12``."""


class DLSolver(CCVMSolver):
    """Models the delay-line coherent continuous-variable machine (DL-CCVM),
    reference ``dl_solver.py:17``."""

    def __init__(
        self,
        device,
        problem_category="boxqp",
        batch_size=1000,
        S=1,
        mesh=None,
        backend="auto",
        timing="sync",
        kernel_rng="popcount16",
    ):
        # popcount16 default: both Wiener normals of the DL pair from one
        # hardware-PRNG word (+3.7% step rate, quality validated unchanged
        # on the certified N=70 set — docs/perf_analysis.md roofline).
        super().__init__(device, mesh=mesh, timing=timing)
        self.batch_size = batch_size
        self.kernel_rng = kernel_rng
        self.S = S
        self.backend = backend
        self._default_optics_machine_parameters = {
            "laser_power": 1200e-6,
            "modulators_power": 10e-3,
            "squeezing_power": 180e-3,
            "electronics_power": 0.0,
            "amplifiers_power": 222.2e-3,
            "electronics_latency": 1e-9,
            "laser_clock": 10e-12,
            "postprocessing_power": {
                20: 4.96,
                30: 5.1,
                40: 4.95,
                50: 5.26,
                60: 5.11,
                70: 5.09,
            },
        }
        self._scaling_multiplier = DL_SCALING_MULTIPLIER
        self._method_selector(problem_category)

    @property
    def parameter_key(self):
        """Keys must be exactly {pump, dt, iterations, noise_ratio,
        feedback_scale} (reference ``dl_solver.py:96-115``)."""
        return self._parameter_key

    @parameter_key.setter
    def parameter_key(self, parameters):
        expected_dlparameter_key_set = set(
            ["pump", "dt", "iterations", "noise_ratio", "feedback_scale"]
        )
        for parameter_key in parameters.values():
            if parameter_key.keys() != expected_dlparameter_key_set:
                raise ValueError(
                    "The parameter key is not valid for this solver. Expected keys: "
                    + str(expected_dlparameter_key_set)
                    + " Given keys: "
                    + str(parameter_key.keys())
                )
        self._parameter_key = parameters
        self._is_tuned = False

    ##################################
    # Problem-category methods       #
    ##################################

    def _calculate_drift_boxqp(
        self, c, s, pump, rate, feedback_scale=100, lower_limit=0, upper_limit=1, S=1
    ):
        """Two-quadrature drift (reference ``dl_solver.py:117-172``); the
        pump>1 saturation override happens inside, as in the reference."""
        if pump > 1:
            S = np.sqrt(pump - 1)
        return dyn.drift_boxqp(
            jnp.asarray(c), jnp.asarray(s), self.q_matrix, self.v_vector,
            pump, rate, feedback_scale, lower_limit, upper_limit, S,
        )

    def _calculate_grads_boxqp(self, c, s, lower_limit=0, upper_limit=1, S=1):
        return dyn.grads_boxqp(
            jnp.asarray(c), jnp.asarray(s), self.q_matrix, self.v_vector,
            lower_limit, upper_limit, S,
        )

    def _change_variables_boxqp(self, problem_variables, lower_limit=0, upper_limit=1, S=1):
        return common.change_variables_boxqp(
            jnp.asarray(problem_variables), lower_limit, upper_limit, S
        )

    def _fit_to_constraints_boxqp(self, c, lower_clamp, upper_clamp):
        return common.fit_to_constraints_boxqp(jnp.asarray(c), lower_clamp, upper_clamp)

    def _append_samples_to_file(self, c_sample, s_sample, evolution_file_object):
        """Write c then s sample blocks (reference ``dl_solver.py:252-281``)."""
        write_sample_rows(evolution_file_object, np.asarray(c_sample))
        write_sample_rows(evolution_file_object, np.asarray(s_sample))

    def _is_valid_optics_machine_parameters(self, machine_parameters):
        required_keys = [
            "laser_power",
            "modulators_power",
            "squeezing_power",
            "electronics_power",
            "amplifiers_power",
            "electronics_latency",
            "laser_clock",
            "postprocessing_power",
        ]
        missing_keys = [key for key in required_keys if key not in machine_parameters]
        if missing_keys:
            raise ValueError(
                f"Invalid optics_machine_parameters: Missing required keys - {missing_keys}"
            )

    def tune(self, instances, post_processor=None, parameter_ranges=None, **kwargs):
        """Working grid-search tuner (see :mod:`ccvm_tpu.tuning`; the
        reference's tune is a crashing placeholder, ``dl_solver.py:327-329``)."""
        from ccvm_tpu.tuning import tune_solver

        best = tune_solver(
            self, instances, parameter_ranges=parameter_ranges,
            post_processor=post_processor, **kwargs,
        )
        self._parameter_key = best
        self._is_tuned = True
        return best

    ##################################
    # Machine models                 #
    ##################################

    def _optics_machine_energy(self, machine_parameters=None):
        """DL-CCVM optics energy model (reference ``dl_solver.py:331-406``)."""
        if machine_parameters is None:
            machine_parameters = self._default_optics_machine_parameters
        else:
            self._is_valid_optics_machine_parameters(machine_parameters)

        def _optics_machine_energy_callable(dataframe: DataFrame, problem_size: int):
            self._validate_machine_energy_dataframe_columns(dataframe)
            try:
                pump = self.parameter_key[problem_size]["pump"]
            except KeyError:
                raise KeyError(
                    f"Pump for the given instance size: {problem_size} is not defined."
                )

            T_clock = machine_parameters["laser_clock"]
            P_opt = machine_parameters["laser_power"]
            T_elec = machine_parameters["electronics_latency"]
            P_mod = machine_parameters["modulators_power"]
            P_sq = machine_parameters["squeezing_power"]
            P_elec = machine_parameters["electronics_power"]
            P_opa = machine_parameters["amplifiers_power"]
            postprocessing_time = np.mean(dataframe["pp_time"].values)
            iterations = np.mean(dataframe["iterations"].values)
            size = float(problem_size)
            optics_energy = (
                pump * P_opt * T_elec
                + pump * P_opt * T_clock * size
                + 2 * P_mod * T_clock * size * (size - 1)
                + P_sq * T_elec
                + P_sq * T_clock * size
                + P_elec * T_elec
                + P_elec * T_clock * size
                + P_opa * T_elec * (size - 1)
                + P_opa * T_clock * size * (size - 1)
            ) * iterations
            postprocessing_energy = (
                machine_parameters["postprocessing_power"][problem_size]
                * postprocessing_time
            )
            return optics_energy + postprocessing_energy

        return _optics_machine_energy_callable

    def _optics_machine_time(self, machine_parameters: dict = None):
        """DL-CCVM optics time model: N * laser_clock * iterations + pp_time
        (reference ``dl_solver.py:408-466``)."""
        if machine_parameters is None:
            machine_parameters = self._default_optics_machine_parameters
        else:
            self._is_valid_optics_machine_parameters(machine_parameters)

        def _optics_machine_time_callable(dataframe: DataFrame, problem_size: int):
            try:
                iterations = np.mean(dataframe["iterations"].values)
                postprocessing_time = np.mean(dataframe["pp_time"].values)
            except KeyError as e:
                raise KeyError(
                    f"The given dataframe is missing the {e.args[0]} "
                    f"column. Required columns are: ['iterations', 'pp_time']."
                )
            laser_clock = machine_parameters["laser_clock"]
            return float(problem_size) * laser_clock * iterations + postprocessing_time

        return _optics_machine_time_callable

    ##################################
    # Solve paths                    #
    ##################################

    def _make_params(self, pump, S, dt, noise_ratio, feedback_scale, g, iterations,
                     pump_ramp=None):
        lo, hi = self.solution_bounds
        ramp_power = ramp_fraction = None
        if pump_ramp is not None:
            power, fraction = pump_ramp
            if not (fraction > 0):
                raise ValueError("pump_ramp fraction must be positive.")
            if not (power > 0):
                raise ValueError("pump_ramp power must be positive.")
            # (1.0, 1.0) IS the reference schedule; normalise it back to the
            # None fields so the default (kernel-eligible) path is taken.
            if (power, fraction) != (1.0, 1.0):
                ramp_power = np.float32(power)
                ramp_fraction = np.float32(fraction)
        return dyn.DLParams(
            pump=np.float32(pump),
            S=np.asarray(S, np.float32),
            dt=np.float32(dt),
            noise_ratio=np.float32(noise_ratio),
            feedback_scale=np.float32(feedback_scale),
            g=np.float32(g),
            lower_limit=np.float32(lo),
            upper_limit=np.float32(hi),
            iterations=np.float32(iterations),
            ramp_power=ramp_power,
            ramp_fraction=ramp_fraction,
        )

    def _solve(
        self, key, params, iterations, pump_rate_flag, pump_is_gt_one,
        evolution_step_size, hp=None,
    ):
        # Evaluated on every solve (including evolution sampling) so an
        # explicit backend="pallas" that a feature forces onto the lax path
        # logs the reason instead of silently degrading.
        # hp_in_kernel: the DL Adam variant has a fused kernel (four
        # moment arrays in VMEM scratch), so Adam solves stay fused.
        has_ramp = params.ramp_power is not None or params.ramp_fraction is not None
        use_pallas = self._use_pallas(
            evolution_step_size, params.S, hp, hp_in_kernel=True,
            extra_reasons=("generalised pump_ramp runs the lax path",)
            if has_ramp else (),
        )
        if not evolution_step_size:
            if use_pallas:
                from ccvm_tpu.ops import pallas_kernels as kernels

                out = kernels.dl_solve(
                    key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag, pump_is_gt_one=pump_is_gt_one,
                    rng=self.kernel_rng, hp=hp,
                )
                if out is not None:
                    return out
            tp_mesh = self._tp_mesh()
            if tp_mesh is not None:
                from ccvm_tpu.parallel import tp

                return tp.dl_solve(
                    tp_mesh, key, self.q_matrix, self.v_vector, params,
                    iterations=iterations, batch_size=self.batch_size,
                    pump_rate_flag=pump_rate_flag,
                    pump_is_gt_one=pump_is_gt_one, hp=hp,
                )
            key, q, v, params = self._replicate_for_mesh(
                key, self.q_matrix, self.v_vector, params
            )
            return dyn.solve(
                key, q, v, params,
                iterations=iterations, batch_size=self.batch_size,
                pump_rate_flag=pump_rate_flag, pump_is_gt_one=pump_is_gt_one,
                hp=hp, shard=self._batch_sharding(),
            )

        # In-jit evolution sampling: one dispatch, one sync (see langevin.py);
        # the final clamp to the original +-S happens inside solve_sampled
        # (reference dl_solver.py:566-567).
        num_samples, segments = self._evolution_sample_plan(
            iterations, evolution_step_size
        )
        (c, s), (c_samp, s_samp) = dyn.solve_sampled(
            key, self.q_matrix, self.v_vector, params,
            np.asarray(segments, np.int32), batch_size=self.batch_size,
            pump_rate_flag=pump_rate_flag, pump_is_gt_one=pump_is_gt_one,
            hp=hp,
        )
        self.c_sample = self._device_sample_stack(c_samp, num_samples)
        self.s_sample = self._device_sample_stack(s_samp, num_samples)
        return c, s

    def _solve_adam(
        self, key, params, iterations, pump_rate_flag, pump_is_gt_one,
        evolution_step_size, hyperparameters,
    ):
        """Working DL+Adam (the reference's own call site is broken and
        raises TypeError, ``dl_solver.py:906-923`` — documented fix)."""
        return self._solve(
            key, params, iterations, pump_rate_flag, pump_is_gt_one,
            evolution_step_size, hp=hyperparameters,
        )

    def __call__(
        self,
        instance,
        post_processor=None,
        pump_rate_flag=True,
        g=0.05,
        evolution_step_size=None,
        evolution_file=None,
        algorithm_parameters=None,
        seed=None,
        pump_ramp=None,
    ):
        """Solve an instance (reference ``dl_solver.py:771-999``).

        ``pump_ramp``: optional ``(power, fraction)`` generalising the linear
        pump ramp to rate(i) = min((i+1)/(fraction*T), 1)**power — a
        TPU-native extension (the reference has only the linear ramp,
        ``dl_solver.py:524``); ``(1.0, 1.0)`` or ``None`` is the reference
        schedule.  Non-default ramps run the scanned lax path.
        """
        if instance.device != self.device:
            raise ValueError(
                f"The device type of the instance ({instance.device}) and the solver"
                f" ({self.device}) must match."
            )

        problem_size = instance.problem_size
        self.q_matrix = instance.q_matrix
        self.v_vector = instance.v_vector
        self.solution_bounds = instance.solution_bounds

        S = self.S
        batch_size = self.batch_size

        try:
            pump = self.parameter_key[problem_size]["pump"]
            dt = self.parameter_key[problem_size]["dt"]
            iterations = self.parameter_key[problem_size]["iterations"]
            noise_ratio = self.parameter_key[problem_size]["noise_ratio"]
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
        self.s_sample = None
        if evolution_step_size:
            if evolution_step_size < 1:
                raise ValueError(
                    "The evolution step size must be greater than or equal to 1."
                )
            if evolution_file is None:
                evolution_file = f"./{instance.name}_evolution.txt"

        params = self._make_params(
            pump, S, dt, noise_ratio, feedback_scale, g, iterations,
            pump_ramp=pump_ramp,
        )
        pump_is_gt_one = bool(pump > 1)
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**31)
        key = jax.random.PRNGKey(int(seed))

        if algorithm_parameters is None:
            c, s = self._solve(
                key, params, iterations, pump_rate_flag, pump_is_gt_one,
                evolution_step_size,
            )
        elif isinstance(algorithm_parameters, AdamParameters):
            c, s = self._solve_adam(
                key, params, iterations, pump_rate_flag, pump_is_gt_one,
                evolution_step_size, algorithm_parameters.to_hyperparameters(),
            )
        else:
            raise ValueError(
                f"Solver option type {type(algorithm_parameters)} is not supported."
            )
        if self.timing == "sync":
            c = jax.block_until_ready(c)
        solve_time = (time.time() - solve_time_start) / batch_size

        lo, hi = self.solution_bounds
        if post_processor:
            post_processor_object = PostProcessorFactory.create_postprocessor(
                post_processor
            )
            problem_variables = post_processor_object.postprocess(
                self.change_variables(c, lo, hi, params.S),
                self.q_matrix,
                self.v_vector,
            )
            pp_time = post_processor_object.pp_time / batch_size
        else:
            problem_variables = c
            pp_time = 0.0

        # NOTE: the reference applies change_variables AGAIN to post-processed
        # output (dl_solver.py:941-958); preserved for behavioural parity.
        # Float64 host readout energy: solution statistics need more than
        # float32 precision near the 0.1% gap; the mixed-precision readout
        # (compute_energy_readout64) keeps the big (batch, n) array on
        # device and transfers only the energies + boundary rows;
        # the device->host transfer doubles as the pipeline's single sync.
        # With a scalar S the change of variables is FUSED into the energy
        # dispatch — one fewer tunnel dispatch and no materialised confs
        # buffer (wall-neutral: dispatches pipeline; measured in
        # docs/ROADMAP.md).  DL never stores the box-coordinate confs in
        # the Solution, so nothing else needs them.
        if np.ndim(params.S) == 0:
            objval = instance.compute_energy_readout64(
                problem_variables,
                change_vars=("boxqp", lo, hi, params.S),
            )
        else:
            confs = self.change_variables(problem_variables, lo, hi, params.S)
            objval = instance.compute_energy_readout64(confs)

        if self.timing == "async":
            solve_time = (time.time() - solve_time_start) / batch_size - pp_time

        if evolution_step_size:
            open(evolution_file, "w").close()
            batch_index = int(jnp.argmax(-objval))
            with open(evolution_file, "a") as evolution_file_obj:
                self._append_samples_to_file(
                    c_sample=self.c_sample[batch_index],
                    s_sample=self.s_sample[batch_index],
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
            variables={
                "problem_variables": problem_variables,
                "s": s,
            },
            device=self.device,
        )

        if evolution_step_size:
            solution.evolution_file = evolution_file

        return solution
