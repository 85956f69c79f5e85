"""Device/runtime plumbing for the TPU-native CCVM framework.

The reference threads a ``device`` string ("cpu"/"cuda") through every layer
(``ccvm_simulators/solvers/ccvm_solver.py:8-12``, ``:33-36``).  Here the same
user-facing strings are kept (plus "tpu"), but they resolve to concrete
:class:`jax.Device` objects, and multi-chip execution is expressed through a
:class:`jax.sharding.Mesh` instead of a device string.
"""

from __future__ import annotations

import enum
import functools

import jax
import numpy as np


class DeviceType(enum.Enum):
    """Devices usable by the solvers.

    Mirrors the reference enum (``ccvm_solver.py:8-12``) with a TPU entry
    added; "cuda" is accepted for API compatibility and maps to JAX's "gpu"
    platform when one exists.
    """

    CPU_DEVICE = "cpu"
    CUDA_DEVICE = "cuda"
    TPU_DEVICE = "tpu"


_PLATFORM_FOR_DEVICE = {"cpu": "cpu", "cuda": "gpu", "tpu": "tpu"}


def validate_device(device: str) -> str:
    """Validate a device string; raises ValueError like the reference base
    solver (``ccvm_solver.py:33-35``)."""
    if device not in DeviceType._value2member_map_:
        raise ValueError("Given device is not available")
    return device


@functools.lru_cache(maxsize=None)
def resolve_device(device: str) -> jax.Device:
    """Map a device string to a concrete jax.Device.

    Falls back to the default backend if the requested platform is not
    present (e.g. tests that run everything on CPU, or "cuda" requested on a
    TPU host).  The string is still validated so invalid names error the same
    way as the reference.
    """
    validate_device(device)
    platform = _PLATFORM_FOR_DEVICE[device]
    try:
        return jax.devices(platform)[0]
    except RuntimeError:
        return jax.devices()[0]


def default_device() -> str:
    """The preferred device string for this host ("tpu" when available)."""
    platform = jax.default_backend()
    for name, plat in _PLATFORM_FOR_DEVICE.items():
        if plat == platform:
            return name
    return "cpu"


def put(x, device: str):
    """Place an array on the resolved device."""
    return jax.device_put(np.asarray(x), resolve_device(device))


def enable_compilation_cache(
    cache_dir: str = "~/.cache/ccvm_tpu_jax_cache",
    min_compile_time_secs: float = 1.0,
) -> None:
    """Turn on JAX's persistent compilation cache.

    The fused solve kernels compile once per (solver, problem size, batch,
    iterations) combination — tens of seconds each on a tunneled TPU — so
    long-running entry points (bench.py, benchmarking_study.py) pay compiles
    once per machine instead of once per process.  Safe to call repeatedly.
    """
    import os

    try:
        path = os.path.expanduser(cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
    except Exception:
        pass  # cache is an optimisation; never fail the caller
