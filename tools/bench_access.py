"""Accessibility-engine microbenchmark: batch scaling + dtype cost.

Usage: python tools/bench_access.py [B ...]  (default 64 128 256 512)
Each (B, N) shape compiles once (server-side, minutes) then reports the
warm steady-state rate. Run on the real chip with nothing else using it.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from priblast_tpu.accessibility.batched import BatchedRaccess

    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]
    N = 1024
    rng = np.random.default_rng(0)
    for dtype in ("float32",):
        eng = BatchedRaccess(70, 5, dtype=dtype)
        for B in sizes:
            codes = rng.integers(1, 5, (B, N)).astype(np.uint8)
            lens = np.full(B, N, np.int32)
            t0 = time.time()
            eng.run(codes, lens)
            cold = time.time() - t0
            reps, t0 = 3, time.time()
            for _ in range(reps):
                acc, cond = eng.run(codes, lens)
            warm = (time.time() - t0) / reps
            print(f"{dtype} B={B:4d} N={N}: cold {cold:7.1f}s  "
                  f"warm {warm:6.3f}s  {B * N / warm:9.0f} nt/s", flush=True)


if __name__ == "__main__":
    main()
