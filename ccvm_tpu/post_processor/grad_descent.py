"""Projected gradient-descent post-processor (TPU-native).

Reference: ``ccvm_simulators/post_processor/grad_descent.py`` — a Python loop
of ``c -= step * (cQ + V); clamp``.  Here the whole refinement is one
``lax.scan`` inside ``jit``; default iteration count is 1% of the main solve
iterations, as in the reference (``:57-58``).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

from ccvm_tpu.post_processor.post_processor import PostProcessor, require_array


@functools.partial(jax.jit, static_argnames=("num_iter",))
def _gd_refine(c, q_matrix, v_vector, lower_clamp, upper_clamp, step_size, num_iter):
    def body(c, _):
        grads = jnp.einsum(
            "bi,ij->bj", c, q_matrix, preferred_element_type=c.dtype
        ) + v_vector
        c = jnp.clip(c - step_size * grads, lower_clamp, upper_clamp)
        return c, None

    c, _ = lax.scan(body, c, None, length=num_iter)
    return c


class PostProcessorGradDescent(PostProcessor):
    def __init__(self):
        self.pp_time = 0

    def postprocess(
        self,
        c,
        q_matrix,
        v_vector,
        lower_clamp=0.0,
        upper_clamp=1.0,
        num_iter_main=1000,
        num_iter_pp=None,
        step_size=0.1,
    ):
        """Refine ``c`` with projected gradient descent (reference ``:13-68``).

        Args:
            c: (batch, n) initial values.
            q_matrix, v_vector: BoxQP coefficients.
            num_iter_pp: iterations; defaults to 1% of ``num_iter_main``.
        """
        start_time = time.time()
        c = jnp.asarray(require_array("c", c))
        q_matrix = jnp.asarray(require_array("q_matrix", q_matrix))
        v_vector = jnp.asarray(require_array("v_vector", v_vector))

        if num_iter_pp is None:
            num_iter_pp = int(num_iter_main * 0.01)

        result = _gd_refine(
            c,
            q_matrix,
            v_vector,
            jnp.float32(lower_clamp),
            jnp.float32(upper_clamp),
            jnp.float32(step_size),
            num_iter_pp,
        )
        result.block_until_ready()
        self.pp_time = time.time() - start_time
        return result
