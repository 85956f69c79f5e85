"""ASGD post-processor (TPU-native).

Reference (``post_processor/asgd.py:15-69``): ``torch.optim.ASGD`` with
lr=0.01, lambd=0.001 (defaults alpha=0.75, t0=1e6) on the whole batch,
clamping after each step; the returned values are the raw parameters (not
the ASGD running average), matching the reference which reads
``model.params``.  The same recurrence is implemented here as a scan.
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
def _asgd_refine(c, q_matrix, v_vector, lower_clamp, upper_clamp, num_iter):
    lr, lambd, alpha = 0.01, 0.001, 0.75

    def body(carry, i):
        c, eta = carry
        g = jnp.einsum(
            "bi,ij->bj", c, q_matrix, preferred_element_type=c.dtype
        ) + v_vector
        # torch ASGD step: decay, then gradient step with the current eta
        c = c * (1.0 - lambd * eta) - eta * g
        c = jnp.clip(c, lower_clamp, upper_clamp)
        # eta_{t+1} = lr / (1 + lambd*lr*t)^alpha   (t = step count)
        eta = lr / (1.0 + lambd * lr * (i + 1.0)) ** alpha
        return (c, eta), None

    (c, _), _ = lax.scan(body, (c, jnp.float32(lr)), jnp.arange(num_iter))
    return c


class PostProcessorASGD(PostProcessor):
    """ASGD refinement of a batch of candidate solutions."""

    def __init__(self):
        self.pp_time = 0
        self.method_type = MethodType.ASGD

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
        result = _asgd_refine(
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
