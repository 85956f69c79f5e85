"""Device-mesh helpers for multi-chip CCVM solves.

The reference is strictly single-process/single-device (no torch.distributed
anywhere; see SURVEY.md section 2.7).  Here scaling is expressed TPU-natively:

* **DP** ("batch" axis): the trajectory batch — embarrassingly parallel —
  shards across chips; no communication on the hot path.
* **TP** ("model" axis): for large problem sizes the Q matvec partial sums
  ride the ICI via ``psum_scatter`` (see :mod:`ccvm_tpu.parallel.tp`).
* PP / SP / EP: not applicable to this workload (no layered model, no
  sequence dimension, no experts) — deliberate N/A, documented here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices=None, tp: int = 1, devices=None) -> Mesh:
    """Build a ("batch", "model") mesh over the available devices.

    Args:
        n_devices: total devices to use (default: all local devices).
        tp: size of the "model" (tensor-parallel) axis; must divide
            n_devices.  The "batch" axis gets the rest.
        devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    n = devices.size
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide the device count {n}")
    return Mesh(devices.reshape(n // tp, tp), ("batch", "model"))


def make_batch_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the trajectory batch."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("batch",))
