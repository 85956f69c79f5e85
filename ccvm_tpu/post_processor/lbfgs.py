"""LBFGS post-processor (TPU-native).

Reference (``post_processor/lbfgs.py:15-66``): per-row ``torch.optim.LBFGS``
with lr=0.001, one inner iteration, clamp to the box after each outer
iteration.  Here the batched on-device L-BFGS runs with the same conservative
first-step scaling (t0 = min(1, 1/|g|_1) * lr, torch's damping for the first
step) and the box projection built in.
"""

from __future__ import annotations

import time

import jax.numpy as jnp

from ccvm_tpu.ops.lbfgs import lbfgs_box_batch
from ccvm_tpu.post_processor.post_processor import (
    MethodType,
    PostProcessor,
    require_array,
)


class PostProcessorLBFGS(PostProcessor):
    def __init__(self):
        self.pp_time = 0
        self.method_type = MethodType.LBFGS

    def postprocess(
        self, c, q_matrix, v_vector, lower_clamp=0.0, upper_clamp=1.0, num_iter=1
    ):
        """Refine ``c`` with ``num_iter`` box-projected L-BFGS iterations."""
        start_time = time.time()
        c = jnp.asarray(require_array("c", c))
        q_matrix = jnp.asarray(require_array("q_matrix", q_matrix))
        v_vector = jnp.asarray(require_array("v_vector", v_vector))

        result = lbfgs_box_batch(
            c,
            q_matrix,
            v_vector,
            lower=lower_clamp,
            upper=upper_clamp,
            first_step_scale=0.001,
            max_iter=num_iter,
        )
        result.block_until_ready()
        self.pp_time = time.time() - start_time
        return result
