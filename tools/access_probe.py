"""Per-pass timing of the accessibility engine on the real chip.

Splits _run_batch_impl into separately-jitted phases and reports warm
times, so Pallas/optimization effort lands on the pass that actually
dominates. Usage: python tools/access_probe.py [B] [N]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from priblast_tpu.accessibility import batched as ba
    from priblast_tpu.utils import jaxcache

    jaxcache.enable()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    w_span, d = 70, 5
    band = w_span + 2
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    codes = rng.integers(1, 5, (B, N)).astype(np.uint8)
    s_np = np.zeros((B, N + ba.ML + 4), dtype=np.int32)
    s_np[:, 1 : N + 1] = codes
    s = jax.device_put(s_np)
    lengths = jax.device_put(np.full(B, N, np.int32))

    t = ba.make_tables(w_span, dtype=jnp.dtype("float32"))

    @jax.jit
    def ph_grids(s, lengths):
        return ba.make_grids(t, s, lengths, N, band, dtype)

    @jax.jit
    def ph_inside(g):
        return ba.inside_pass(t, g, N, band, B, dtype)

    @jax.jit
    def ph_bouter(ins, g, lengths):
        stem = ins[0]
        return ba.b_outer_scan(stem, g.ext_dot, N, band, B, dtype, lengths)

    @jax.jit
    def ph_ogrids(s, lengths, g, ins, B_full):
        stem, stem_m, stem_a, multi, multi1, multi2, A_cols = ins
        logZ = jnp.take_along_axis(A_cols, lengths[None, :], axis=0)[0]
        return ba.make_outside_grids(t, s, lengths, N, band, dtype, g,
                                     multi2, A_cols, B_full, logZ), logZ

    @jax.jit
    def ph_outside(og, ins):
        return ba.outside_pass(t, og, ins[4], N, band, B, dtype)

    @jax.jit
    def ph_prob(s, g, ins, outs, lengths, B_full, logZ):
        pg = ba.make_prob_grids(t, s, N, band, dtype)
        res = ba.probability_pass(t, g, pg, ins, outs, ins[6], B_full,
                                  logZ, d, N, band, dtype)
        return res

    def sync(out):
        # block_until_ready on the tunneled platform does not block
        # (NOTES.md gotcha); a tiny host read of the LAST queued output
        # forces the whole in-order queue to drain.
        leaf = jax.tree.leaves(out)[-1]
        np.asarray(leaf[(0,) * leaf.ndim])

    def timeit(name, fn, *args):
        out = fn(*args)  # compile
        sync(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:12s} {dt * 1e3:9.1f} ms", flush=True)
        return out, dt

    total = 0.0
    g, dt = timeit("grids", ph_grids, s, lengths); total += dt
    ins, dt = timeit("inside", ph_inside, g); total += dt
    B_full, dt = timeit("b_outer", ph_bouter, ins, g, lengths); total += dt
    (og, logZ), dt = timeit("ogrids", ph_ogrids, s, lengths, g, ins, B_full)
    total += dt
    outs, dt = timeit("outside", ph_outside, og, ins); total += dt
    _, dt = timeit("prob", ph_prob, s, g, ins, outs, lengths, B_full, logZ)
    total += dt
    print(f"{'TOTAL':12s} {total * 1e3:9.1f} ms   "
          f"{B * N / total:9.0f} nt/s (staged; fused jit differs slightly)")


if __name__ == "__main__":
    main()
