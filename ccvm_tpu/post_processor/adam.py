"""Adam post-processor (TPU-native).

Reference (``post_processor/adam.py:15-69``): ``torch.optim.Adam`` with
lr=0.01, betas=(0.9, 0.99) on the whole batch, clamping after each step.
Here the identical update runs as a ``lax.scan`` inside ``jit``.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

from ccvm_tpu.post_processor.post_processor import (
    MethodType,
    PostProcessor,
    require_array,
)


@functools.partial(jax.jit, static_argnames=("num_iter",))
def _adam_refine(c, q_matrix, v_vector, lower_clamp, upper_clamp, num_iter):
    lr, b1, b2, eps = 0.01, 0.9, 0.99, 1e-8

    def body(carry, i):
        c, m, v = carry
        g = jnp.einsum(
            "bi,ij->bj", c, q_matrix, preferred_element_type=c.dtype
        ) + v_vector
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * jnp.square(g)
        mhat = m / (1 - b1 ** (i + 1.0))
        vhat = v / (1 - b2 ** (i + 1.0))
        c = jnp.clip(
            c - lr * mhat / (jnp.sqrt(vhat) + eps), lower_clamp, upper_clamp
        )
        return (c, m, v), None

    (c, _, _), _ = lax.scan(
        body, (c, jnp.zeros_like(c), jnp.zeros_like(c)), jnp.arange(num_iter)
    )
    return c


class PostProcessorAdam(PostProcessor):
    """Adam refinement of a batch of candidate solutions."""

    def __init__(self):
        self.pp_time = 0
        self.method_type = MethodType.Adam

    def postprocess(
        self,
        c,
        q_matrix,
        v_vector,
        lower_clamp=0.0,
        upper_clamp=1.0,
        num_iter=1,
        device="cpu",
    ):
        start_time = time.time()
        c = jnp.asarray(require_array("c", c))
        q_matrix = jnp.asarray(require_array("q_matrix", q_matrix))
        v_vector = jnp.asarray(require_array("v_vector", v_vector))
        result = _adam_refine(
            c,
            q_matrix,
            v_vector,
            jnp.float32(lower_clamp),
            jnp.float32(upper_clamp),
            num_iter,
        )
        result.block_until_ready()
        self.pp_time = time.time() - start_time
        return result
