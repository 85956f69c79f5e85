"""Solver base class for the TPU-native CCVM framework.

API-parity port of ``ccvm_simulators/solvers/ccvm_solver.py`` (444 LoC): the
public surface (``parameter_key``, ``get_scaling_factor``, ``machine_time``,
``machine_energy``, the method selector) is preserved so reference user code
ports 1:1, while the compute path underneath is JAX (see ccvm_tpu.dynamics
and ccvm_tpu.ops).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod

import numpy as np
from pandas import DataFrame

from ccvm_tpu.dynamics import common
from ccvm_tpu.runtime import DeviceType, validate_device  # noqa: F401

logger = logging.getLogger(__name__)


class MachineType:
    """The type of machine we are simulating (``ccvm_solver.py:15-22``)."""

    CPU = "cpu"
    GPU = "gpu"
    FPGA = "fpga"
    DL_CCVM = "dl-ccvm"
    MF_CCVM = "mf-ccvm"


class CCVMSolver(ABC):
    """The base class for all solvers (``ccvm_solver.py:25``).

    Args:
        device (str): "cpu", "cuda" or "tpu".
        mesh (jax.sharding.Mesh, optional): When given, trajectory batches are
            sharded over the mesh's "batch" axis (data parallelism over
            chips/hosts); the reference has no distributed path at all.
        timing (str): "sync" (default) inserts a device barrier right after
            the SDE integration so ``solve_time`` measures it alone, at the
            cost of one extra host<->device round trip per solve. "async"
            lets the whole solve->readout pipeline run with a single
            end-of-pipeline sync; ``solve_time`` then covers the full
            pipeline minus ``pp_time`` (the readout math itself is trivial).
    """

    def __init__(self, device, mesh=None, timing="sync"):
        validate_device(device)
        if timing not in ("sync", "async"):
            raise ValueError(
                f'timing must be "sync" or "async", got {timing!r}'
            )
        self.device = device
        self.mesh = mesh
        self.timing = timing
        self._is_tuned = False
        self._scaling_multiplier = None
        self._parameter_key = None
        self._default_cpu_machine_parameters = {
            "cpu_power": {20: 4.93, 30: 5.19, 40: 5.0, 50: 5.01, 60: 5.0, 70: 5.22}
        }
        self._default_cuda_machine_parameters = {
            "gpu_power": {
                20: 28.93,
                30: 29.8,
                40: 31.09,
                50: 31.29,
                60: 31.49,
                70: 32.28,
            }
        }
        self.calculate_grads = None
        self.change_variables = None
        self.fit_to_constraints = None

    ##################################
    # Properties                     #
    ##################################
    @property
    def is_tuned(self):
        """bool: True if the current parameters were set by tune()."""
        return self._is_tuned

    @property
    def parameter_key(self):
        """The parameters used by the solver when solving the problem."""
        return self._parameter_key

    ##################################
    # Abstract methods               #
    ##################################

    @abstractmethod
    def tune(self):
        """Determine the best solver parameters over a set of instances."""

    @abstractmethod
    def _solve(self):
        """Solve a problem instance with the original dynamics."""

    @abstractmethod
    def _solve_adam(self):
        """Solve a problem instance with Adam-filtered gradients."""

    @abstractmethod
    def _calculate_drift_boxqp(self, **kwargs):
        """Drift part of the CCVM for the boxqp problem."""

    @abstractmethod
    def _calculate_grads_boxqp(self, **kwargs):
        """Gradients of the variables for the boxqp problem."""

    @abstractmethod
    def _change_variables_boxqp(self, **kwargs):
        """Change of variables on the boxqp problem."""

    @abstractmethod
    def _fit_to_constraints_boxqp(self, **kwargs):
        """Fit the variables to the constraints for the boxqp problem."""

    ##################################
    # Implemented methods            #
    ##################################

    def get_scaling_factor(self, q_matrix):
        """Default problem-scaling value: sqrt(sum |Q|) * solver multiplier
        (``ccvm_solver.py:134-150``)."""
        return common.scaling_factor(q_matrix, self._scaling_multiplier)

    def _method_selector(self, problem_category):
        """Bind problem-category-specific methods (``ccvm_solver.py:152-170``)."""
        if problem_category.lower() == "boxqp":
            self.calculate_drift = self._calculate_drift_boxqp
            self.calculate_grads = self._calculate_grads_boxqp
            self.change_variables = self._change_variables_boxqp
            self.fit_to_constraints = self._fit_to_constraints_boxqp
        else:
            raise ValueError(
                "The given instance is not a valid problem category."
                f" Given category: {problem_category}"
            )

    ################################
    ### Machine energy functions ###
    ################################

    def _validate_machine_energy_dataframe_columns(self, dataframe):
        """Validate optics-energy dataframe columns (``ccvm_solver.py:176-195``)."""
        required_columns = ["pp_time", "iterations"]
        missing_columns = [
            col for col in required_columns if col not in dataframe.columns
        ]
        if missing_columns:
            raise ValueError(
                f"The given dataframe is missing the following columns: {missing_columns}"
            )

    def _cpu_machine_energy(self, machine_parameters: dict = None):
        """Average energy of simulating on a CPU (``ccvm_solver.py:197-246``)."""
        if machine_parameters is None:
            machine_parameters = self._default_cpu_machine_parameters
        elif "cpu_power" not in machine_parameters.keys():
            raise ValueError(
                "The given machine parameters are not valid. "
                "The dictionary must contain the key 'cpu_power'"
            )

        def _cpu_machine_energy_callable(dataframe: DataFrame, problem_size: int):
            if "solve_time" not in dataframe.columns:
                raise ValueError(
                    "The given dataframe does not contain the column 'solve_time'"
                )
            machine_time = np.mean(dataframe["solve_time"].values)
            machine_power = machine_parameters["cpu_power"][problem_size]
            return machine_power * machine_time

        return _cpu_machine_energy_callable

    def _cuda_machine_energy(self, machine_parameters: dict = None):
        """Average energy of simulating on CUDA GPUs (``ccvm_solver.py:248-299``)."""
        if machine_parameters is None:
            machine_parameters = self._default_cuda_machine_parameters
        elif "gpu_power" not in machine_parameters.keys():
            raise ValueError(
                "The given machine parameters are not valid. "
                "The dictionary must contain the key 'gpu_power'"
            )

        def _cuda_machine_energy_callable(dataframe: DataFrame, problem_size: int):
            if "solve_time" not in dataframe.columns:
                raise ValueError(
                    "The given dataframe does not contain the column 'solve_time'"
                )
            machine_time = np.mean(dataframe["solve_time"].values)
            machine_power = machine_parameters["gpu_power"][problem_size]
            return machine_power * machine_time

        return _cuda_machine_energy_callable

    def machine_energy(self, machine: str, machine_parameters: dict = None):
        """Average energy consumed by the specified hardware
        (``ccvm_solver.py:301-350``)."""
        solver_energy_methods = {
            "cpu": self._cpu_machine_energy,
            "gpu": self._cuda_machine_energy,
            "dl-ccvm": (
                getattr(self, "_optics_machine_energy", None)
                if self.__class__.__name__ == "DLSolver"
                else None
            ),
            "mf-ccvm": (
                getattr(self, "_optics_machine_energy", None)
                if self.__class__.__name__ == "MFSolver"
                else None
            ),
            "fpga": (
                getattr(self, "_fpga_machine_energy", None)
                if self.__class__.__name__ == "LangevinSolver"
                else None
            ),
        }

        if machine not in solver_energy_methods:
            raise ValueError(
                f"The given machine type is not valid. "
                f"The machine type must be one of {', '.join(solver_energy_methods.keys())}"
            )

        energy_method = solver_energy_methods[machine]
        if not energy_method:
            raise ValueError(
                f"Mismatch between the solver and the machine type. "
                f"Provided machine type: {machine}, solver type: {self.__class__.__name__}"
            )
        return energy_method(machine_parameters)

    ##############################
    ### Machine time functions ###
    ##############################

    def _cpu_gpu_machine_time(self, **_):
        """Average simulation wall time on CPU/GPU (``ccvm_solver.py:356-392``)."""

        def _cpu_gpu_machine_time_callable(dataframe: DataFrame, **_):
            if "solve_time" not in dataframe.columns:
                raise ValueError(
                    "The given dataframe does not contain the column 'solve_time'"
                )
            return np.mean(dataframe["solve_time"].values)

        return _cpu_gpu_machine_time_callable

    def machine_time(self, machine: str, machine_parameters: dict = None):
        """Average time spent by the specified hardware
        (``ccvm_solver.py:394-444``)."""
        solver_time_methods = {
            "cpu": self._cpu_gpu_machine_time,
            "gpu": self._cpu_gpu_machine_time,
            "dl-ccvm": (
                getattr(self, "_optics_machine_time", None)
                if self.__class__.__name__ == "DLSolver"
                else None
            ),
            "mf-ccvm": (
                getattr(self, "_optics_machine_time", None)
                if self.__class__.__name__ == "MFSolver"
                else None
            ),
            "fpga": (
                getattr(self, "_fpga_machine_time", None)
                if self.__class__.__name__ == "LangevinSolver"
                else None
            ),
        }

        if machine not in solver_time_methods:
            raise ValueError(
                f"The given machine type is not valid. "
                f"The machine type must be one of {', '.join(solver_time_methods.keys())}"
            )

        time_method = solver_time_methods[machine]
        if not time_method:
            raise ValueError(
                f"Mismatch between the solver and the machine type. "
                f"Provided machine type: {machine}, solver type: {self.__class__.__name__}"
            )
        return time_method(machine_parameters=machine_parameters)

    ##############################
    ### Shared TPU-side helpers ###
    ##############################

    def _use_pallas(self, evolution_step_size, S, hp=None, hp_in_kernel=False,
                    extra_reasons=()):
        """Whether this solve runs the fused whole-solve Pallas kernel.

        One shared decision for all four façades.  When the user explicitly
        requested ``backend="pallas"`` but a feature forces the scanned lax
        path, the fallback is logged instead of silently degrading
        (``backend="auto"`` falls back quietly by design).
        ``extra_reasons``: façade-specific lax-path features (e.g. DL's
        generalised pump ramp).
        """
        reasons = list(extra_reasons)
        if evolution_step_size:
            reasons.append("evolution sampling runs the scanned lax path")
        if np.ndim(S) != 0:
            reasons.append("per-variable S runs the lax path")
        if hp is not None and not hp_in_kernel:
            reasons.append(
                "Adam-in-loop runs the lax path for this solver"
            )
        if self.mesh is not None:
            reasons.append("mesh-sharded solves run the shard_map/lax path")
        if self.backend == "pallas":
            if reasons:
                logger.warning(
                    "pallas backend requested but falling back to lax: %s",
                    "; ".join(reasons),
                )
                return False
            return True
        if self.backend == "auto":
            import jax

            return not reasons and jax.default_backend() == "tpu"
        return False

    def _tp_mesh(self):
        """The mesh when it carries a nontrivial "model" (tensor-parallel)
        axis, else None.  Facades route such solves through
        :mod:`ccvm_tpu.parallel.tp` (Q rows sharded over ICI)."""
        m = self.mesh
        if m is not None and "model" in m.axis_names and m.shape["model"] > 1:
            return m
        return None

    def _batch_sharding(self):
        """NamedSharding that splits the trajectory batch over the mesh's
        "batch" axis, or None when running single-device."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.mesh, PartitionSpec("batch", None))

    def _replicate_for_mesh(self, *pytrees):
        """Replicate inputs over the mesh so they are compatible with the
        batch-sharded computation (no-op single-device)."""
        if self.mesh is None:
            return pytrees if len(pytrees) != 1 else pytrees[0]
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(self.mesh, PartitionSpec())
        out = tuple(jax.device_put(t, replicated) for t in pytrees)
        return out if len(out) != 1 else out[0]

    def _evolution_sample_plan(self, iterations, evolution_step_size):
        """Number of samples and segment lengths for evolution recording.

        Matches the reference's schedule: a sample after iteration 0, after
        every ``evolution_step_size``-th iteration, and after the last
        iteration if not already aligned (``dl_solver.py:866-873``,
        ``:557-564``).
        """
        num_steps = int(iterations / evolution_step_size)
        num_samples = num_steps + 1
        if iterations % evolution_step_size != 0:
            num_samples += 1
        # Segment lengths: iteration indices after which we sample are
        # 0, step, 2*step, ..., and iterations-1.
        sample_points = list(range(0, iterations, evolution_step_size))
        if sample_points[-1] != iterations - 1:
            sample_points.append(iterations - 1)
        segments = []
        prev = -1
        for sp in sample_points:
            segments.append(sp - prev)
            prev = sp
        return num_samples, segments

    @staticmethod
    def _device_sample_stack(samples, num_samples):
        """(S, batch, n) segment samples -> (batch, n, num_samples) **device**
        array (zero-padded in the trailing dim like the reference's buffer,
        ``dl_solver.py:557-564``).

        The stack stays on device: only the best trajectory's
        ``(n, num_samples)`` slice is ever read back when the evolution file
        is written, so an evolution solve at the headline batch 65536 no
        longer materialises the ~300 MB full host buffer.
        """
        import jax.numpy as jnp

        samples = jnp.moveaxis(jnp.asarray(samples), 0, -1)
        pad = num_samples - samples.shape[-1]
        if pad:
            samples = jnp.pad(samples, ((0, 0), (0, 0), (0, pad)))
        return samples
