"""Device codec kernels (XLA array programs + Pallas TPU kernels)."""
