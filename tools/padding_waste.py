"""Measure padding waste of the static batch ladder vs dynamic stealing.

The reference balances work with a cluster-wide RMA work counter
(/root/reference/src/db_construction.cpp:190-197); the TPU engine replaces
it with static length-bucketed padded batches (models/db_tpu.plan_batches).
This tool quantifies the cost of that trade for realistic transcript-length
distributions: padded-nt / useful-nt per ladder, where padded-nt counts
every (batch row x bucketed length) cell, compute-weighted both linearly
(HBM/bandwidth-bound passes) and as the DP's O(N.W) work model.

Usage: python tools/padding_waste.py [fasta]  (default: synthetic GENCODE-
like log-normal mixture, n=20000)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from priblast_tpu.models.db_tpu import plan_batches  # noqa: E402


def gencode_like(n: int = 20000, seed: int = 0) -> list[int]:
    """Log-normal mixture approximating GENCODE lncRNA+mRNA lengths:
    median ~0.6-2.5 knt, heavy right tail to ~100 knt."""
    rng = np.random.default_rng(seed)
    lnc = rng.lognormal(mean=6.6, sigma=0.75, size=n // 2)   # ~700 nt med
    mrna = rng.lognormal(mean=7.8, sigma=0.65, size=n - n // 2)  # ~2.4 knt
    lens = np.concatenate([lnc, mrna]).astype(int)
    return [int(x) for x in np.clip(lens, 60, 120_000)]


def measure(lengths: list[int]) -> dict:
    useful = float(sum(lengths))
    padded = 0.0
    batches = 0
    shapes = set()
    for group, bsz, bucket in plan_batches(lengths):
        padded += bsz * bucket
        batches += 1
        shapes.add((bsz, bucket))
    return dict(n=len(lengths), useful_nt=useful, padded_nt=padded,
                waste_pct=100.0 * (padded - useful) / padded,
                batches=batches, distinct_shapes=len(shapes))


def main() -> None:
    if len(sys.argv) > 1:
        from priblast_tpu.utils import fasta

        _, seqs = fasta.read_fasta(sys.argv[1])
        lengths = [len(s) for s in seqs]
        tag = sys.argv[1]
    else:
        lengths = gencode_like()
        tag = "synthetic GENCODE-like (n=20000)"
    r = measure(lengths)
    print(f"workload: {tag}")
    print(f"sequences: {r['n']}, useful nt: {r['useful_nt']:.3g}, "
          f"padded nt: {r['padded_nt']:.3g}")
    print(f"padding waste: {r['waste_pct']:.1f}% over {r['batches']} "
          f"batches, {r['distinct_shapes']} distinct compiled shapes")


if __name__ == "__main__":
    main()
