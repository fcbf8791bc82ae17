"""Ablation probe for the gapped DP while-loop: times stripped variants of
the per-diagonal body on synthetic data to locate the on-chip cost.

Variants:
  full    — mimic of the real body (gathers + combo scan + updates)
  nogather— table gathers replaced by arithmetic on the index
  noscan  — combo scan replaced by a single shifted add
  floor   — window slices + row updates only

Usage: python tools/gapped_ablate.py [B] [max_ext] [dropout]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ME = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DO = int(sys.argv[3]) if len(sys.argv) > 3 else 16
W = ME
OFF = DO + 2
DD = ME + OFF + 1
XW = ME + 3
INF = np.float32(np.inf)

mismI = jnp.asarray(np.random.rand(175).astype(np.float32))
bp = jnp.asarray(np.random.randint(0, 7, 25).astype(np.int32))
i11 = jnp.asarray(np.random.rand(1600).astype(np.float32))

combos = [(s, u1) for s in range(DO, -1, -1) for u1 in range(s, -1, -1)]


def _sr(x, n, fill):
    if n == 0:
        return x
    pad = jnp.full((n,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - n]], axis=0)


def make(variant):
    def step(st):
        L = st["L"]
        z0 = jnp.asarray(0, jnp.int32)
        win_h = lax.dynamic_slice(st["hyb"], (L, z0, z0), (DO + 2, W, B))
        win_s = lax.dynamic_slice(st["st"], (L, z0, z0), (DO + 2, W, B))
        win_v = lax.dynamic_slice(st["vm"], (L, z0, z0), (DO + 2, W, B))
        qm_i = lax.dynamic_slice(st["qm"], (z0, z0), (W, B))
        dm_t = lax.dynamic_slice(st["dmr"], (XW - 1 - L, z0), (W, B))

        if variant == "floor":
            hyb_row = win_h[0] + 1.0
            st_row = win_s[0]
            vm_row = win_v[0]
        else:
            if variant == "nogather":
                t0 = (qm_i * 5 + dm_t) % 7
                mism_shared = (t0 * 3).astype(jnp.float32) * 0.01
            else:
                t0 = bp[qm_i * 5 + dm_t]
                mism_shared = mismI[(t0 * 5 + qm_i) * 5 + dm_t]
            if variant == "noscan":
                run_min = _sr(win_h[0], 1, INF) + mism_shared
                run_pk = jnp.zeros((W, B), jnp.int32)
            else:
                run_min = jnp.full((W, B), INF, jnp.float32)
                run_pk = jnp.zeros((W, B), jnp.int32)
                for (s, u1) in combos:
                    r = DO - s
                    sh = u1 + 1
                    ph_sh = _sr(win_h[r], sh, INF)
                    if s >= 2:
                        raw = mism_shared + _sr(win_v[r], sh,
                                                jnp.float32(0))
                        Et = raw / 100.0 + ph_sh
                    else:
                        if variant == "nogather":
                            e = (t0 * 7).astype(jnp.float32)
                        else:
                            pt_sh = _sr(win_s[r], sh, 0)
                            e = i11[((t0 * 8 + pt_sh) * 5 + qm_i) * 5
                                    + dm_t]
                        Et = e + ph_sh
                    pk = jnp.full((W, 1), s * 7 + u1, jnp.int32)
                    better = Et < run_min
                    run_min = jnp.where(better, Et, run_min)
                    run_pk = jnp.where(better, pk, run_pk)
            hyb_row = run_min
            st_row = jnp.where(hyb_row < 1.0, 1, 0)
            if variant == "nogather":
                vm_row = hyb_row * 0.5
            else:
                vm_row = mismI[(st_row * 5 + qm_i) * 5 + dm_t]

        def upd(buf, row):
            return lax.dynamic_update_slice(buf, row[None],
                                            (L + OFF, z0, z0))

        return dict(L=L + 1, qm=st["qm"], dmr=st["dmr"],
                    hyb=upd(st["hyb"], hyb_row),
                    st=upd(st["st"], st_row.astype(jnp.int32)),
                    vm=upd(st["vm"], vm_row))

    @jax.jit
    def run(qm, dmr, hyb, stb, vm):
        st = dict(L=jnp.asarray(1, jnp.int32), qm=qm, dmr=dmr,
                  hyb=hyb, st=stb, vm=vm)
        st = lax.while_loop(lambda s: s["L"] < ME, step, st)
        return st["hyb"][OFF + 1], st["vm"][OFF + 1]

    return run


def main():
    rng = np.random.default_rng(0)
    qm = jnp.asarray(rng.integers(0, 5, (XW, B)).astype(np.int32))
    dmr = jnp.asarray(rng.integers(0, 5, (XW + DO + W + 5, B))
                      .astype(np.int32))
    hyb = jnp.asarray(rng.random((DD, W, B)).astype(np.float32))
    stb = jnp.asarray(rng.integers(0, 7, (DD, W, B)).astype(np.int32))
    vm = jnp.asarray(rng.random((DD, W, B)).astype(np.float32))
    for variant in ("floor", "noscan", "nogather", "full"):
        run = make(variant)
        t0 = time.perf_counter()
        r = run(qm, dmr, hyb, stb, vm)
        _ = np.asarray(r[0])
        cold = time.perf_counter() - t0
        ts = []
        for _rep in range(3):
            t0 = time.perf_counter()
            r = run(qm, dmr, hyb, stb, vm)
            _ = np.asarray(r[0])
            ts.append(time.perf_counter() - t0)
        per_it = min(ts) / (ME - 1) * 1e3
        print(f"{variant:9s} cold {cold:6.1f}s warm {min(ts)*1e3:8.1f} ms "
              f"({per_it:6.2f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
