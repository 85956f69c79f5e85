from ccvm_tpu.solvers.base import CCVMSolver, MachineType
from ccvm_tpu.solvers.algorithms import AdamParameters
from ccvm_tpu.solvers.dl import DLSolver
from ccvm_tpu.solvers.langevin import LangevinSolver
from ccvm_tpu.solvers.mf import MFSolver
from ccvm_tpu.solvers.pumped_langevin import PumpedLangevinSolver

__all__ = [
    "CCVMSolver",
    "MachineType",
    "AdamParameters",
    "DLSolver",
    "LangevinSolver",
    "MFSolver",
    "PumpedLangevinSolver",
]
