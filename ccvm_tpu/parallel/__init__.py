from ccvm_tpu.parallel.mesh import make_batch_mesh, make_mesh
from ccvm_tpu.parallel.sweep import sweep_solve
from ccvm_tpu.parallel.tp import (
    dl_sharded_solve,
    dl_solve,
    langevin_solve,
    mf_solve,
    pumped_langevin_solve,
)

__all__ = [
    "make_batch_mesh",
    "make_mesh",
    "dl_sharded_solve",
    "dl_solve",
    "langevin_solve",
    "mf_solve",
    "pumped_langevin_solve",
    "sweep_solve",
]
