"""MFU / roofline accounting for the accessibility engine.

Counts the banded DP's FLOPs via XLA's cost analysis on the production
batch shapes, then combines them with a measured (or supplied) nt/s rate to
report FLOP/s and %-of-peak for the chip. Runs entirely on CPU (lowering
only) unless --measure is given.

Usage:
  python tools/mfu_report.py [--nt-per-s RATE] [--bucket N --batch B]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# chip peaks (per chip). v5e: 197 TFLOP/s bf16 MXU; f32 einsums lower onto
# the MXU via multi-pass decomposition (~1/4 rate); VPU vector f32 is
# ~3.6 TFLOP/s (8 lanes x 128 x 2 ops x ~1.75 GHz). HBM ~819 GB/s.
PEAKS = {
    "v5e": dict(bf16=197e12, f32_mxu=49e12, vpu=3.6e12, hbm=819e9),
    "v5p": dict(bf16=459e12, f32_mxu=115e12, vpu=7e12, hbm=2765e9),
}


def program_flops(bucket: int, batch: int, w: int = 70, d: int = 5,
                  dtype: str = "float32") -> dict:
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from priblast_tpu.accessibility.batched import _run_batch_impl
    from priblast_tpu.utils import thermo

    s = np.zeros((batch, bucket + thermo.MAXLOOP + 4), np.int32)
    lens = np.full(batch, bucket, np.int32)

    def fn(s_, l_):
        return _run_batch_impl(w, d, bucket, dtype, False, s_, l_)

    lowered = jax.jit(fn).lower(s, lens)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(flops=float(cost.get("flops", 0.0)),
                bytes=float(cost.get("bytes accessed", 0.0)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nt-per-s", type=float, default=None,
                    help="measured db-step throughput to convert to FLOP/s")
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--gen", default="v5e", choices=sorted(PEAKS))
    ns = ap.parse_args()

    c = program_flops(ns.bucket, ns.batch)
    nt = ns.bucket * ns.batch
    fl_per_nt = c["flops"] / nt
    by_per_nt = c["bytes"] / nt
    peaks = PEAKS[ns.gen]
    print(f"shape: batch={ns.batch} x bucket={ns.bucket} "
          f"({nt} padded nt/launch)")
    print(f"XLA-counted FLOPs: {c['flops']:.3g} "
          f"({fl_per_nt:.0f} FLOP/nt)  bytes: {c['bytes']:.3g} "
          f"({by_per_nt:.0f} B/nt)")
    print(f"arithmetic intensity: {c['flops'] / max(c['bytes'], 1):.2f} "
          f"FLOP/B (HBM roofline crossover at "
          f"{peaks['vpu'] / peaks['hbm']:.1f} for the VPU, "
          f"{peaks['bf16'] / peaks['hbm']:.0f} for the bf16 MXU)")
    if ns.nt_per_s:
        fs = ns.nt_per_s * fl_per_nt
        bs = ns.nt_per_s * by_per_nt
        print(f"at {ns.nt_per_s:.3g} nt/s: {fs:.3g} FLOP/s = "
              f"{100 * fs / peaks['vpu']:.1f}% of VPU f32 peak, "
              f"{100 * fs / peaks['f32_mxu']:.2f}% of f32-MXU peak; "
              f"{bs:.3g} B/s = {100 * bs / peaks['hbm']:.1f}% of HBM")


if __name__ == "__main__":
    main()
