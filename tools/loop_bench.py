"""Microbenchmark: loop primitives on the current accelerator (axon probe).

Measures fori_loop/while_loop scaling with trip count and body weight to
find why the lockstep extension kernels stall on-chip.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B = 65536
M = 131072
rng = np.random.default_rng(0)
buf = jnp.asarray(rng.standard_normal(M).astype(np.float32))
idx = jnp.asarray(rng.integers(0, M - 4096, B).astype(np.int32))


def bench(name, fn, *args, reps=2):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = np.asarray(f(*args))
    t1 = time.perf_counter()
    ts = []
    for _ in range(reps):
        t2 = time.perf_counter()
        out = f(*args)
        s = float(jnp.sum(out))  # tiny readback
        ts.append(time.perf_counter() - t2)
    print(f"{name:40s} compile+1st {t1 - t0:8.2f}s  warm {min(ts)*1e3:9.2f}ms",
          flush=True)
    return r


# warmup dispatch (pay the process tax on something tiny)
t0 = time.perf_counter()
np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(8)))
print(f"first-dispatch tax: {time.perf_counter() - t0:.2f}s", flush=True)


def fori(n):
    def fn(b, i):
        def step(k, acc):
            return acc + b[jnp.clip(i + (k & 1023), 0, M - 1)]
        return lax.fori_loop(0, n, step, jnp.zeros(B, jnp.float32))
    return fn


bench("fori_loop 64x gather body", fori(64), buf, idx)
bench("fori_loop 512x gather body", fori(512), buf, idx)


def wloop(n):
    def fn(b, i):
        def cond(st):
            k, acc = st
            return jnp.any(k < n)

        def step(st):
            k, acc = st
            return k + 1, acc + b[jnp.clip(i + (k & 1023), 0, M - 1)]

        return lax.while_loop(cond, step, (jnp.zeros((), jnp.int32),
                                           jnp.zeros(B, jnp.float32)))[1]
    return fn


bench("while_loop 64x gather body", wloop(64), buf, idx)
bench("while_loop 512x gather body", wloop(512), buf, idx)


def wloop_vec(n):
    """Per-lane active mask in the carry (like ungapped_core)."""
    def fn(b, i):
        def cond(st):
            k, acc, act = st
            return jnp.any(act)

        def step(st):
            k, acc, act = st
            v = b[jnp.clip(i + (k & 1023), 0, M - 1)]
            acc = acc + jnp.where(act, v, 0.0)
            act = act & (k < i % np.int32(n))
            return k + 1, acc, act

        return lax.while_loop(
            cond, step, (jnp.zeros((), jnp.int32),
                         jnp.zeros(B, jnp.float32),
                         jnp.ones(B, bool)))[1]
    return fn


bench("while_loop vec-mask ragged<=512", wloop_vec(512), buf, idx)


def wloop_fat(n, gathers):
    def fn(b, i):
        def cond(st):
            k, acc = st
            return jnp.any(k < n)

        def step(st):
            k, acc = st
            for g in range(gathers):
                acc = acc + b[jnp.clip(i + ((k + g) & 1023), 0, M - 1)]
            return k + 1, acc

        return lax.while_loop(cond, step, (jnp.zeros((), jnp.int32),
                                           jnp.zeros(B, jnp.float32)))[1]
    return fn


bench("while_loop 64x, 16-gather body", wloop_fat(64, 16), buf, idx)
bench("while_loop 64x, 32-gather body", wloop_fat(64, 32), buf, idx)
