"""Microbenchmark: gather primitives on the current accelerator.

Times the access patterns the search kernels depend on, to pick the right
lowering (plain gather vs one-hot MXU contraction vs windowed lane-select).
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
W = 320
rng = np.random.default_rng(0)
buf = jnp.asarray(rng.standard_normal(M).astype(np.float32))
idx = jnp.asarray(rng.integers(0, M, B).astype(np.int32))
win = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))
lo = jnp.asarray(rng.integers(0, W, B).astype(np.int32))


def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = np.asarray(f(*args))
    t1 = time.perf_counter()
    ts = []
    for _ in range(reps):
        t2 = time.perf_counter()
        out = f(*args)
        s = np.asarray(out)
        ts.append(time.perf_counter() - t2)
    print(f"{name:34s} compile+1st {t1 - t0:8.3f}s  warm {min(ts)*1e3:9.2f}ms",
          flush=True)
    return r


bench("plain gather B idx from M buf", lambda b, i: b[i], buf, idx)
bench("gather x8 (chained)",
      lambda b, i: sum(b[jnp.clip(i + k, 0, M - 1)] for k in range(8)),
      buf, idx)


def loop_gather(b, i):
    def step(k, acc):
        return acc + b[jnp.clip(i + k, 0, M - 1)]
    return lax.fori_loop(0, 16, step, jnp.zeros(B, jnp.float32))


bench("fori_loop 16x gather", loop_gather, buf, idx)


def onehot_mxu(b, i):
    K = 512
    hi = i // K
    lo_ = i - hi * K
    oh = (hi[:, None] == jnp.arange(M // K)[None, :]).astype(jnp.bfloat16)
    rows = jnp.dot(oh, b.reshape(M // K, K).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    sel = (lo_[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    return jnp.sum(rows * sel, axis=1)


bench("one-hot MXU gather", onehot_mxu, buf, idx)

bench("take_along_axis [B,W] per-lane",
      lambda w, l: jnp.take_along_axis(w, l[:, None], axis=1)[:, 0], win, lo)

bench("lane-select one-hot [B,W]",
      lambda w, l: jnp.sum(
          w * (l[:, None] == jnp.arange(W)[None, :]), axis=1), win, lo)

tbl = jnp.asarray(rng.standard_normal(625).astype(np.float32))
ti = jnp.asarray(rng.integers(0, 625, B).astype(np.int32))
bench("small-table gather (625)", lambda t_, i: t_[i], tbl, ti)
bench("small-table one-hot (625)",
      lambda t_, i: jnp.sum(
          t_[None, :] * (i[:, None] == jnp.arange(625)[None, :]), axis=1),
      tbl, ti)


def loop_small(t_, i):
    def step(k, acc):
        return acc + t_[jnp.clip(i + k, 0, 624)]
    return lax.fori_loop(0, 16, step, jnp.zeros(B, jnp.float32))


bench("fori_loop 16x small-table gather", loop_small, tbl, ti)

bench("searchsorted (65537 cum)",
      lambda b, i: jnp.searchsorted(jnp.sort(b), i.astype(jnp.float32)),
      buf, idx)

# window extraction: B windows of 16 from M buffer
bench("gather-of-slices [B,16]",
      lambda b, i: b[jnp.clip(i[:, None] + jnp.arange(16)[None, :],
                              0, M - 1)], buf, idx)

def dyn_slice_scan(b, i):
    def step(c, ib):
        return c, lax.dynamic_slice(b, (ib,), (16,))
    _, out = lax.scan(step, 0, i[:256])
    return out

bench("scan dynamic_slice 256x16", dyn_slice_scan, buf, idx)
