"""jax.profiler trace of the accessibility grid-construction phases.

Writes a trace to /tmp/access_trace and prints the top self-time ops per
phase from the trace.json. Usage: python tools/access_trace.py [phase]
(phase: grids | ogrids | inside | all; default grids+ogrids).
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def top_ops(trace_dir: str, k: int = 25) -> None:
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    f = max(files, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    dur = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid_name = ev.get("pid")
        name = ev.get("name", "")
        # keep device-lane events only (heuristic: ts/dur in us, XLA op names)
        if "args" in ev and isinstance(ev["args"], dict):
            lname = ev["args"].get("long_name", "")
        else:
            lname = ""
        cat = ev.get("cat", "")
        dur[(name.split(".")[0], cat)] += ev.get("dur", 0.0)
    items = sorted(dur.items(), key=lambda kv: -kv[1])[:k]
    for (name, cat), d in items:
        print(f"{d / 1e3:10.2f} ms  {cat:12s} {name[:90]}")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from priblast_tpu.accessibility import batched as ba
    from priblast_tpu.utils import jaxcache

    jaxcache.enable()

    B, N = 128, 1024
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

    def sync(out):
        leaf = jax.tree.leaves(out)[-1]
        np.asarray(leaf[(0,) * leaf.ndim])

    g = ph_grids(s, lengths)
    sync(g)
    ins = ph_inside(g)
    sync(ins)

    @jax.jit
    def ph_bouter(ins, g, lengths):
        return ba.b_outer_scan(ins[0], g.ext_dot, N, band, B, dtype, lengths)

    B_full = ph_bouter(ins, g, lengths)
    sync(B_full)

    @jax.jit
    def ph_ogrids(s, lengths, g, ins, B_full):
        logZ = jnp.take_along_axis(ins[6], lengths[None, :], axis=0)[0]
        return ba.make_outside_grids(t, s, lengths, N, band, dtype, g,
                                     ins[5], ins[6], B_full, logZ)

    og = ph_ogrids(s, lengths, g, ins, B_full)
    sync(og)

    trace_dir = "/tmp/access_trace"
    with jax.profiler.trace(trace_dir):
        g = ph_grids(s, lengths)
        sync(g)
        og = ph_ogrids(s, lengths, g, ins, B_full)
        sync(og)
        ins2 = ph_inside(g)
        sync(ins2)
    time.sleep(1)
    top_ops(trace_dir, 30)


if __name__ == "__main__":
    main()
