"""Bit-exact vectorized replicas of the table-driven fast exp/log
approximations used by the reference (herumi/fmath; reference:
src/fmath.hpp:400-470 `expd`, :738-752 `log`).

The reference's accessibility energies flow through these approximations
rather than libm, so exact predictions.txt parity requires replicating them
including all intermediate roundings. Both functions are deterministic pure
table lookups + IEEE arithmetic, reproduced here with numpy (used by the CPU
oracle path) and with jax.numpy (used on TPU when `exact=True`).

Tables are precomputed by tools/gen_fmath_tables.cpp with the same libm the
reference uses at static-init time and stored in
priblast_tpu/data/fmath_tables.npz.
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data" / "fmath_tables.npz"

_EXPD_SBIT = 11
_EXPD_MASK = (1 << _EXPD_SBIT) - 1
_EXPD_ADJ = (1 << (_EXPD_SBIT + 10)) - (1 << _EXPD_SBIT)
_EXPD_B = float(np.uint64(3) << np.uint64(51)).__float__()  # 3 * 2^51
_EXPD_C1 = 1.0
_EXPD_C2 = 0.16666666685227835064
_EXPD_C3 = 3.0000000027955394
_EXPD_MIN = -708.39641853226408  # expd(x) == 0 below this
_EXPD_MAX = 709.78271289338397  # expd(x) == inf above this

_LOG_LEN = 11
_LOG_MASK_B2 = (1 << (23 - _LOG_LEN)) - 1


@functools.lru_cache(maxsize=1)
def _tables():
    with np.load(_DATA) as z:
        return (
            z["expd_tbl"].copy(),  # (2048,) uint64: low 52 bits of 2^(i/2048)
            z["log_app"].copy(),  # (2048,) float32
            z["log_rev"].copy(),  # (2048,) float32
            np.float32(z["c_log2"]),
        )


def expd(x: np.ndarray) -> np.ndarray:
    """fmath::expd — double-precision exp with an 11-bit 2^frac table and a
    cubic correction polynomial. Vectorized, bit-exact vs the reference."""
    tbl, _, _, _ = _tables()
    x = np.asarray(x, dtype=np.float64)
    a = 2048.0 / np.log(2.0)
    ra = 1.0 / a

    d = x * a + _EXPD_B
    bits = d.view(np.uint64)
    # Low 32 bits of the double's pattern, sign-extended (the reference reads
    # them via _mm_cvtsi128_si32 into a uint64_t).
    di32 = (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    di = di32.astype(np.int64).view(np.uint64)
    iax = tbl[(di & np.uint64(_EXPD_MASK)).astype(np.int64)]
    t = (d - _EXPD_B) * ra - x
    u = ((di + np.uint64(_EXPD_ADJ)) >> np.uint64(_EXPD_SBIT)) << np.uint64(52)
    y = (_EXPD_C3 - t) * (t * t) * _EXPD_C2 - t + _EXPD_C1
    res = y * (u | iax).view(np.float64)
    res = np.where(x <= _EXPD_MIN, 0.0, res)
    res = np.where(x >= _EXPD_MAX, np.inf, res)
    return res


def logf(x: np.ndarray) -> np.ndarray:
    """fmath::log — single-precision log via an 11-bit mantissa table.
    Vectorized, bit-exact vs the reference. Returns float32."""
    _, app, rev, c_log2 = _tables()
    x = np.asarray(x, dtype=np.float32)
    i = x.view(np.uint32)
    a = (i & np.uint32(0xFF << 23)).astype(np.int32)  # exponent field
    b2 = (i & np.uint32(_LOG_MASK_B2)).astype(np.int32)
    idx = ((i >> np.uint32(23 - _LOG_LEN)) & np.uint32((1 << _LOG_LEN) - 1)).astype(np.int64)
    t1 = (a - (127 << 23)).astype(np.float32) * c_log2
    t2 = b2.astype(np.float32) * rev[idx]
    return (t1 + app[idx]) + t2


def logsumexp2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """The reference's pairwise log-add (src/raccess.cpp:414-419):
    max(x,y) + log(expd(-|x-y|) + 1), with log computed in float32."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    gt = x > y
    hi = np.where(gt, x, y)
    lo = np.where(gt, y, x)
    return hi + logf((expd(lo - hi) + 1.0).astype(np.float32)).astype(np.float64)


# ---------------------------------------------------------------------------
# JAX versions (same tables, same bit manipulations) for on-device exact mode.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _jax_tables():
    import jax.numpy as jnp

    tbl, app, rev, c_log2 = _tables()
    return jnp.asarray(tbl), jnp.asarray(app), jnp.asarray(rev), jnp.float32(c_log2)


def expd_jax(x):
    """JAX replica of :func:`expd` (requires x64 enabled)."""
    import jax.numpy as jnp
    import jax.lax as lax

    tbl, _, _, _ = _jax_tables()
    x = jnp.asarray(x, dtype=jnp.float64)
    a = 2048.0 / np.log(2.0)
    ra = 1.0 / a
    d = x * a + _EXPD_B
    bits = lax.bitcast_convert_type(d, jnp.uint64)
    di32 = lax.bitcast_convert_type((bits & np.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
    di = di32.astype(jnp.int64).astype(jnp.uint64)
    iax = tbl[(di & np.uint64(_EXPD_MASK)).astype(jnp.int32)]
    t = (d - _EXPD_B) * ra - x
    u = ((di + np.uint64(_EXPD_ADJ)) >> np.uint64(_EXPD_SBIT)) << np.uint64(52)
    y = (_EXPD_C3 - t) * (t * t) * _EXPD_C2 - t + _EXPD_C1
    res = y * lax.bitcast_convert_type(u | iax, jnp.float64)
    res = jnp.where(x <= _EXPD_MIN, 0.0, res)
    res = jnp.where(x >= _EXPD_MAX, jnp.inf, res)
    return res


def logf_jax(x):
    """JAX replica of :func:`logf`. Returns float32."""
    import jax.numpy as jnp
    import jax.lax as lax

    _, app, rev, c_log2 = _jax_tables()
    x = jnp.asarray(x, dtype=jnp.float32)
    i = lax.bitcast_convert_type(x, jnp.uint32)
    a = (i & np.uint32(0xFF << 23)).astype(jnp.int32)
    b2 = (i & np.uint32(_LOG_MASK_B2)).astype(jnp.int32)
    idx = ((i >> np.uint32(23 - _LOG_LEN)) & np.uint32((1 << _LOG_LEN) - 1)).astype(jnp.int32)
    t1 = (a - (127 << 23)).astype(jnp.float32) * c_log2
    t2 = b2.astype(jnp.float32) * rev[idx]
    return (t1 + app[idx]) + t2


def logsumexp2_jax(x, y):
    """JAX replica of :func:`logsumexp2`."""
    import jax.numpy as jnp

    gt = x > y
    hi = jnp.where(gt, x, y)
    lo = jnp.where(gt, y, x)
    return hi + logf_jax((expd_jax(lo - hi) + 1.0).astype(jnp.float32)).astype(jnp.float64)
