"""BFGS post-processor (TPU-native).

Reference (``post_processor/bfgs.py:13-56``): per-row scipy L-BFGS-B with
bounds [0,1] and analytic Jacobian, mapping ``c -> 0.5(c+1)`` in and
``2(x-0.5)`` out.  Here the same mapping wraps a batched on-device
box-projected L-BFGS (:mod:`ccvm_tpu.ops.lbfgs`) — no host loop, no scipy.
"""

from __future__ import annotations

import time

import jax.numpy as jnp

from ccvm_tpu.ops.lbfgs import lbfgs_box_batch
from ccvm_tpu.post_processor.post_processor import PostProcessor, require_array


class PostProcessorBFGS(PostProcessor):
    def __init__(self):
        self.pp_time = 0

    def postprocess(self, c, q_matrix, v_vector):
        """Refine ``c`` with box-constrained L-BFGS in [0, 1], then map back
        to the reference's output convention ``2 (x - 0.5)``."""
        start_time = time.time()
        c = jnp.asarray(require_array("c", c))
        q_matrix = jnp.asarray(require_array("q_matrix", q_matrix))
        v_vector = jnp.asarray(require_array("v_vector", v_vector))

        c0 = 0.5 * (c + 1.0)
        x = lbfgs_box_batch(
            c0, q_matrix, v_vector, lower=0.0, upper=1.0, max_iter=50
        )
        result = 2.0 * (x - 0.5)
        result.block_until_ready()
        self.pp_time = time.time() - start_time
        return result
