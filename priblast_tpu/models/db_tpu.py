"""TPU path of the db step: batched accessibility over length buckets.

Sequences are sorted by length (descending — guided LPT like the reference's
scheduling, src/utils.cpp:56-63), grouped into fixed-size batches, and each
batch is padded to a bucketed maximum length (geometric steps bound the
number of jit specializations). This is the TPU-native replacement for the
reference's heap/area-sum/dynamic work distribution: static balanced padded
batches instead of a work-stealing counter (SURVEY §2 'parallelism
strategies')."""

from __future__ import annotations

import numpy as np

from priblast_tpu.utils import alphabet


def bucket_length(n: int, quantum: int = 256) -> int:
    """Round a length up to a bucket boundary: 8 steps per octave (a
    floating-point-like grid, <=12.5% length padding), floored at `quantum`.
    Coarse buckets keep the number of jit specializations (and first-run
    compiles) small; the persistent compile cache makes later runs instant.
    Measured padding waste on a GENCODE-like length mixture: 10.3% across
    23 distinct compiled shapes (tools/padding_waste.py)."""
    step = max(quantum, 1 << max((max(n, 2) - 1).bit_length() - 3, 0))
    return max(quantum, (n + step - 1) // step * step)


def adaptive_batch(bucket: int, cap: int = 128) -> int:
    """Batch size targeting ~128k padded nucleotides per device batch
    (keeps HBM footprint flat across buckets); power-of-two quantized so
    (batch, bucket) shape combinations stay few."""
    b = max(8, min(cap, (1 << 17) // max(bucket, 1)))
    p = 8
    while p * 2 <= b:
        p *= 2
    return p


def plan_batches(lengths: list[int], batch_size: int | None = None):
    """Yield (indices, batch_size, padded_len) from descending-length order.
    Groups are padded by callers to batch_size x padded_len so every batch
    shares one compiled program per (batch, bucket) shape."""
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    k = 0
    while k < len(order):
        bucket = bucket_length(lengths[order[k]])
        bsz = batch_size or adaptive_batch(bucket)
        if batch_size is None:
            # tail trim: shrink the final batch to the next power of two
            # that still covers the remainder (fewer all-padding rows)
            rem = len(order) - k
            while bsz // 2 >= max(rem, 8):
                bsz //= 2
        group = order[k : k + bsz]
        yield group, bsz, bucket
        k += bsz


def compute_accessibilities(seqs: list[str], w: int, d: int,
                            batch_size: int | None = None,
                            dtype: str = "float32", mesh=None):
    """Per-sequence accessibility via the batched TPU engine. Returns lists
    (accs, conds) in the original sequence order, matching the exact
    engine's layout. With a mesh, batches are sharded across it."""
    from priblast_tpu.accessibility.batched import BatchedRaccess

    engine = BatchedRaccess(w, d, dtype=dtype, mesh=mesh)
    n = len(seqs)
    accs: list[np.ndarray | None] = [None] * n
    conds: list[np.ndarray | None] = [None] * n
    lengths = [len(s) for s in seqs]

    for group, bsz, padded in plan_batches(lengths, batch_size):
        # pad the batch dimension so every batch shares the compiled program
        codes = np.zeros((bsz, padded), np.uint8)
        lens = np.zeros(bsz, np.int32)
        for bi, idx in enumerate(group):
            codes[bi, : lengths[idx]] = alphabet.access_codes(seqs[idx])
            lens[bi] = lengths[idx]
        acc, cond = engine.run(codes, lens)
        for bi, idx in enumerate(group):
            ln = lengths[idx]
            accs[idx] = acc[bi, : max(ln - d + 1, 0)].copy()
            conds[idx] = cond[bi, :ln].copy()
    return accs, conds
