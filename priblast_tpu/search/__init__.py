"""Device-side search kernels (seed-and-extend chain on TPU)."""
