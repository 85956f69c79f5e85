"""Device-side compute kernels (Pallas TPU kernels + batched optimizers)."""
