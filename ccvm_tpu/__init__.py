"""ccvm_tpu — a TPU-native coherent continuous-variable machine simulator.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``ccvm-simulators`` reference library: DL-CCVM, MF-CCVM, Langevin and pumped
Langevin SDE solvers for box-constrained quadratic programming, plus
post-processing, solution/TTS statistics, plotting and benchmarking.

Design highlights (vs the reference's per-iteration Python loop on torch):
  * every solve is one fused computation: ``lax.scan`` inside ``jit``, or a
    single Pallas TPU kernel running the whole Euler-Maruyama loop on-chip;
  * trajectory batches shard across chips/hosts via ``jax.sharding.Mesh``;
  * deterministic, key-based PRNG.
"""

__version__ = "0.1.0"

from ccvm_tpu import checkpoint, profiling
from ccvm_tpu.metadata import Metadata
from ccvm_tpu.problem_classes.boxqp import ProblemInstance
from ccvm_tpu.solution import Solution
from ccvm_tpu.solvers import (
    AdamParameters,
    CCVMSolver,
    DLSolver,
    LangevinSolver,
    MFSolver,
    PumpedLangevinSolver,
)

__all__ = [
    "checkpoint",
    "profiling",
    "Metadata",
    "ProblemInstance",
    "Solution",
    "AdamParameters",
    "CCVMSolver",
    "DLSolver",
    "LangevinSolver",
    "MFSolver",
    "PumpedLangevinSolver",
]
