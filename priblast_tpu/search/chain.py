"""Device-extend search chain for one (query, db-chunk) pair.

Stage layout (reference: src/rna_interaction_search.cpp:264-320):
  host   seed search + SA-interval expansion      (native stage 1)
  device batched ungapped extension               (search/ungapped.py)
  host   sort + interaction-threshold dedup + seed base pairs (chain_mid)
  device batched gapped extension DP              (search/gapped.py)
  host   traceback, dangles, bp sort, final sort + dedup (chain_finish)

Hit semantics are identical to the exact engine; energies carry the device
dtype's accumulation noise (float64 device math reproduces the host engine
to ~1e-12).
"""

from __future__ import annotations

import numpy as np

from priblast_tpu.ops import native
from priblast_tpu.search.gapped import gapped_extend_batch
from priblast_tpu.search.ungapped import ungapped_extend_device


def _pad1(a, size, dtype):
    out = np.zeros(size, dtype)
    out[:len(a)] = a
    return out


def _len_bucket(n: int) -> int:
    # pow2 length buckets so kernel shapes (and compiles) are reused across
    # queries/chunks; zero padding is sentinel semantics for the gathers
    return max(256, 1 << (n - 1).bit_length())


class ChunkDevice:
    """jnp copies of a DbChunk's arrays, built once per chunk (padded to a
    pow2 length bucket so compiled kernel shapes are shared)."""

    def __init__(self, chunk):
        import jax.numpy as jnp

        self.chunk = chunk
        ns = _len_bucket(len(chunk.seqs))
        na = _len_bucket(len(chunk.acc))
        nc = _len_bucket(len(chunk.cond))
        self.seqs = jnp.asarray(_pad1(chunk.seqs, ns, np.int32))
        self.acc = jnp.asarray(_pad1(chunk.acc, na, np.float32))
        self.cond = jnp.asarray(_pad1(chunk.cond, nc, np.float32))
        no = max(8, 1 << chunk.n_seqs.bit_length())  # >= n_seqs + 1
        self.acc_off = jnp.asarray(_pad1(chunk.acc_off, no, np.int64))
        self.cond_off = jnp.asarray(_pad1(chunk.cond_off, no, np.int64))
        self.sentinel = len(chunk.seqs) - 1


class QueryDevice:
    """jnp copies of one query's arrays (padded to a pow2 length bucket)."""

    def __init__(self, q_enc, q_acc, q_cond):
        import jax.numpy as jnp

        n = _len_bucket(len(q_enc))
        self.enc = jnp.asarray(_pad1(q_enc, n, np.int32))
        self.acc = jnp.asarray(_pad1(q_acc, n, np.float32))
        self.cond = jnp.asarray(_pad1(q_cond, n, np.float32))


# fixed padded-batch ladder: bounds the number of distinct compiled shapes
# (each (B, flag) pair is its own XLA program; compiles are cached on disk)
_LADDER = (64, 512, 4096)


def _bucket(n: int) -> int:
    for b in _LADDER:
        if n <= b:
            return b
    return _LADDER[-1]


def search_chunk_device(q_enc, q_sa, q_acc, q_cond, chunk, p, *,
                        max_ext: int = 64, dtype: str = "float32",
                        qdev: QueryDevice | None = None,
                        cdev: ChunkDevice | None = None):
    """Full search chain with both extension phases on device. Returns the
    same SoA hit dict as native.search_chunk."""
    import jax.numpy as jnp

    from priblast_tpu.utils import jaxcache

    jaxcache.enable()
    pre = native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunk, p, stage=1)
    n = len(pre["q_sp"])
    if n == 0:
        return pre
    qdev = qdev or QueryDevice(q_enc, q_acc, q_cond)
    cdev = cdev or ChunkDevice(chunk)

    # ---- device ungapped (padding hits terminate immediately: zero-length
    # extents anchored at sentinel positions)
    cap = _LADDER[-1]
    db_last = len(chunk.seqs) - 1  # trailing sentinel
    parts = {k: [] for k in ("q_sp", "db_sp", "q_len", "db_len",
                             "dbseq_start", "acc_e", "hyb_e", "energy")}
    for o in range(0, n, cap):
        ns = min(cap, n - o)
        B = _bucket(ns)

        def pad(a, fill=0):
            out = np.full(B, fill, a.dtype)
            out[:ns] = a[o:o + ns]
            return out

        res = ungapped_extend_device(
            jnp.asarray(pad(pre["q_sp"])),
            jnp.asarray(pad(pre["db_sp"], db_last)),
            jnp.asarray(pad(pre["q_len"])), jnp.asarray(pad(pre["dbseq_id"])),
            jnp.asarray(pad(pre["dbseq_start"])),
            jnp.asarray(pad(pre["acc_e"].astype(np.float32))),
            jnp.asarray(pad(pre["hyb_e"].astype(np.float32))),
            qdev.enc, cdev.seqs,
            (qdev.acc, qdev.cond, cdev.acc, cdev.cond, cdev.acc_off,
             cdev.cond_off),
            p.min_accessible_length, p.drop_out_length_wo_gap)
        for k in parts:
            parts[k].append(np.asarray(res[k])[:ns])
    hits = {k: np.concatenate(v) for k, v in parts.items()}
    hits["dbseq_id"] = pre["dbseq_id"]

    # ---- host mid: sort, dedup, seed base pairs
    mid = native.chain_mid(q_enc, chunk, p, hits)
    m = len(mid["q_sp"])
    if m == 0:
        return mid

    # ---- device gapped
    gparts, gbps, oparts = [], [], []
    for o in range(0, m, cap):
        ns = min(cap, m - o)
        sub = {k: np.asarray(mid[k])[o:o + ns] for k in native._HIT_KEYS}
        g, b, ov = gapped_extend_batch(
            sub, qdev.enc, cdev.seqs, qdev.acc, qdev.cond, cdev.acc,
            cdev.cond, cdev.acc_off, cdev.cond_off,
            d=p.min_accessible_length, dropout=p.drop_out_length_w_gap,
            min_helix=p.min_helix_length, max_ext=max_ext, dtype=dtype,
            pad_to=_bucket(ns))
        gparts.append(g)
        gbps.extend(b)
        oparts.append(ov)
    gx = {k: np.concatenate([g[k] for g in gparts])
          for k in native._HIT_KEYS}
    overflow = np.concatenate(oparts)

    if overflow.any():
        # rare: extension outran the device cap — host engine fallback from
        # the pre-extension state
        idx = np.nonzero(overflow)[0]
        sub = {k: np.asarray(mid[k])[idx] for k in native._HIT_KEYS}
        ref = native.gapped_extend(q_enc, q_acc, q_cond, chunk, p, sub)
        for out_i, src_i in enumerate(idx):
            for k in native._HIT_KEYS:
                gx[k][src_i] = ref[k][out_i]
            lo, hi = ref["bp_off"][out_i], ref["bp_off"][out_i + 1]
            gbps[src_i] = list(zip(ref["bp_q"][lo:hi].tolist(),
                                   ref["bp_db"][lo:hi].tolist()))

    # ---- assemble per-hit base pairs: seed bps (mid) + gapped tracebacks
    bp_off = np.zeros(m + 1, np.int64)
    bp_q, bp_db = [], []
    for i in range(m):
        lo, hi = mid["bp_off"][i], mid["bp_off"][i + 1]
        bp_q.extend(mid["bp_q"][lo:hi].tolist())
        bp_db.extend(mid["bp_db"][lo:hi].tolist())
        bp_q.extend(qq for qq, _ in gbps[i])
        bp_db.extend(dd for _, dd in gbps[i])
        bp_off[i + 1] = len(bp_q)

    return native.chain_finish(q_enc, chunk, p, gx, bp_off,
                               np.asarray(bp_q, np.int32),
                               np.asarray(bp_db, np.int32))
