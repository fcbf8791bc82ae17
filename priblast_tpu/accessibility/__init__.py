"""Accessibility (partition-function) engines.

- :mod:`priblast_tpu.ops.native` — exact CPU engine (bit parity anchor).
- :mod:`priblast_tpu.accessibility.linear_ref` — numpy reference of the
  TPU-native linear-domain scaled formulation.
- :mod:`priblast_tpu.accessibility.batched` — batched JAX/TPU engine.
"""
