"""Dinucleotide-frequency-matched RNA sequence generation (bench realism).

Uniform-random ACGU is hit-DENSE (round-3's 10-Mnt run produced 3.67M
prediction lines for 100 queries) and distorts every stage ratio
(VERDICT round-3 missing #2). Real transcripts differ in two measurable
ways a seed-and-extend engine is sensitive to: base composition (GC%)
and dinucleotide bias — most prominently CpG depletion, which directly
thins the C-G seed stacks that drive pRIblast's hybridization energies.

This module draws sequences from a first-order Markov chain whose
stationary base frequencies and dinucleotide odds ratios follow published
human transcriptome statistics (GENCODE-like composition: ~47% GC, CpG
odds ~0.3, UpA suppressed ~0.75): the same model class the RNA literature
uses for dinucleotide-preserving shuffles. The reference's validated
workload is GENCODE lncRNA x mRNA (/root/reference/README.md:41-52).
"""

from __future__ import annotations

import numpy as np

# base order A, C, G, U
_BASE_FREQ = np.array([0.265, 0.235, 0.245, 0.255])
# dinucleotide odds ratios rho[x, y] ~ f(xy) / (f(x) f(y)), human
# transcript-like: CpG strongly depleted, UpA mildly depleted, mirrored
# mild enrichments elsewhere
_ODDS = np.array([
    #  A     C     G     U
    [1.00, 1.05, 1.05, 0.95],   # A·
    [1.10, 1.05, 0.30, 1.10],   # C·  (CpG depletion)
    [0.95, 1.05, 1.05, 1.00],   # G·
    [0.75, 1.10, 1.10, 1.00],   # U·  (UpA depletion)
])
_BASES = np.frombuffer(b"ACGU", dtype=np.uint8)


def _transition() -> np.ndarray:
    t = _ODDS * _BASE_FREQ[None, :]
    return t / t.sum(axis=1, keepdims=True)


def markov_batch(rng: np.random.Generator, lengths) -> list[np.ndarray]:
    """Draw len(lengths) sequences as ACGU byte arrays, vectorized across
    the batch (one categorical draw per position over all sequences)."""
    lengths = np.asarray(lengths, np.int64)
    n = len(lengths)
    n_max = int(lengths.max()) if n else 0
    tcum = np.cumsum(_transition(), axis=1)
    fcum = np.cumsum(_BASE_FREQ)
    u = rng.random((n,))
    state = np.searchsorted(fcum, u).clip(0, 3)
    out = np.zeros((n, n_max), np.uint8)
    out[:, 0] = state
    urand = rng.random((n_max, n))
    for i in range(1, n_max):
        row = tcum[state]
        state = (urand[i][:, None] > row).sum(axis=1).clip(0, 3)
        out[:, i] = state
    return [_BASES[out[i, : lengths[i]]] for i in range(n)]


def markov_seq(rng: np.random.Generator, n: int) -> str:
    return markov_batch(rng, [n])[0].tobytes().decode()


def dinucleotide_stats(seqs) -> dict:
    """Observed GC fraction and CpG odds of generated sequences (for
    reporting alongside bench numbers)."""
    cnt = np.zeros(4, np.int64)
    dint = np.zeros((4, 4), np.int64)
    lut = np.full(256, -1, np.int8)
    for i, b in enumerate(b"ACGU"):
        lut[b] = i
    for s in seqs:
        a = lut[np.frombuffer(s.encode() if isinstance(s, str) else s,
                              dtype=np.uint8)]
        a = a[a >= 0]
        cnt += np.bincount(a, minlength=4)
        idx = a[:-1] * 4 + a[1:]
        dint += np.bincount(idx, minlength=16).reshape(4, 4)
    f = cnt / max(cnt.sum(), 1)
    tot = max(dint.sum(), 1)
    cpg = (dint[1, 2] / tot) / max(f[1] * f[2], 1e-12)
    return dict(gc=float(f[1] + f[2]), cpg_odds=float(cpg))
