"""Device-memory introspection for sizing padded-batch ladders.

The search kernels bound their batch shapes by ladders of power-of-two
sizes; the caps used to be constants "sized for v5e HBM" (round-2/3 weak
item). They are now derived from the running device's reported memory
limit (`jax.local_devices()[0].memory_stats()`), with the old v5e
constants as the fallback when the backend exposes no stats (CPU tests,
interpret mode)."""

from __future__ import annotations

import functools
import os

_V5E_HBM = 16 * (1 << 30)


@functools.lru_cache(maxsize=1)
def hbm_bytes() -> int:
    """Reported per-device memory limit in bytes (fallback: v5e's 16 GiB).
    Env override: PRIBLAST_HBM_BYTES."""
    env = os.environ.get("PRIBLAST_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            v = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if v:
                return int(v)
    except Exception:
        pass
    return _V5E_HBM


def ladder_cap(bytes_per_item: int, frac: float, lo: int, hi: int) -> int:
    """Largest power-of-two batch that keeps bytes_per_item * batch within
    `frac` of device memory, clamped to [lo, hi]."""
    budget = hbm_bytes() * frac
    cap = lo
    while cap * 2 <= hi and bytes_per_item * cap * 2 <= budget:
        cap *= 2
    return cap
