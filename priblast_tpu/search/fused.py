"""Fused seed-expansion + ungapped extension + threshold filter (device).

The staged pipeline (search/seed.py expand_stage -> pipeline.ungapped_stage
-> pipeline.threshold_stage) is semantically three maps and two filters over
the candidate pair stream — but staged, it moves every intermediate hit
array across the host↔device boundary twice. On a real v5e host that is
PCIe traffic; through a tunneled device it dominates end-to-end time by two
orders of magnitude (tools/stage_probe.py measurements). This module fuses
the whole stretch into ONE device program per pair batch:

  host   : seed DFS candidates (native C++, tiny — reference
           src/seed_search.cpp:153-230) -> per-CANDIDATE arrays (~100x
           smaller than per-pair arrays), shipped once per wave
  device : pair generation (searchsorted over the candidate pair-count
           prefix), SA gathers + window accessibility + interaction filter
           (reference CalcInteractionEnergy, src/seed_search.cpp:47-141),
           lockstep ungapped extension (reference
           src/ungapped_extension.cpp:30-155) on the surviving lanes,
           interaction-energy threshold (reference flags these before its
           redundancy scan, src/rna_interaction_search.cpp:389-391), and
           order-preserving compaction
  host   : reads back ONLY the compacted survivors (~10x fewer than pairs)

Per-batch traffic: one int32 scalar pair offset in, `cap` compacted hits
out. The candidate buffers and the packed query/db buffers are resident on
device for the whole wave.

Hit order is the reference's emission order (candidate-major, db-position
outer, query-position inner — src/seed_search.cpp:274-301), preserved by
pair-index-ordered compaction, so downstream sort/dedup tie-breaking is
unchanged. With a mesh, each device generates and compacts its contiguous
pair-index block (shard_map over the batch), so the device-major
concatenation is still pair-index order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module


from priblast_tpu.search.ungapped import ungapped_core

# candidate pack rows (one [ROWS, NC] int32 device buffer per wave)
_R_QSA = 0    # query SA interval start, pre-based into the packed query SA
_R_DSA = 1    # db SA interval start, pre-based into the packed db SA
_R_LEN = 2    # seed length
_R_QB = 3     # query encoded-buffer base
_R_QAB = 4    # query accessibility base
_R_DBB = 5    # chunk sequence base
_R_SPB = 6    # chunk start_pos/seq_len segment base
_R_NSEQ = 7   # chunk sequence count
_R_OFFB = 8   # chunk segment base in the packed abs acc/cond offsets
_R_NQ = 9     # query-interval width (inner pair dimension)
_ROWS = 10


def _core(d: int, max_len: int, sbits: int, dtype_name: str, thr: float,
          dropout: int, cap: int,
          o, n_pairs, cand, cum, energy_c,
          q_sa, db_sa, start_pos, seq_len, abs_aoff, abs_coff,
          qbufs, dbufs, B: int):
    """One [B] pair block: expand + ungapped + threshold + compact."""
    dt = jnp.float64 if dtype_name == "float64" else jnp.float32

    pid = o + lax.iota(jnp.int32, B)
    live = pid < n_pairs
    # owning candidate: pair counts prefix (zero-width pad candidates sit
    # after every real pair index, so clip never selects one for live lanes)
    ci = jnp.clip(jnp.searchsorted(cum, pid, side="right") - 1,
                  0, cand.shape[1] - 1).astype(jnp.int32)

    def crow(r):
        return cand[r, ci]

    nq = jnp.maximum(crow(_R_NQ), 1)
    off = pid - cum[ci]
    ki = off // nq          # db-interval offset (outer loop in the ref)
    qi = off - ki * nq      # query-interval offset (inner loop)

    def at(buf, pos):
        return buf[jnp.clip(pos, 0, buf.shape[0] - 1)]

    q_sp = at(q_sa, crow(_R_QSA) + qi)
    db_sp = at(db_sa, crow(_R_DSA) + ki)
    length = jnp.maximum(crow(_R_LEN), 1)
    energy = energy_c[ci]

    # owning db sequence: upper_bound(start_pos, db_sp) - 1 on the chunk's
    # segment (reference: src/seed_search.cpp:101-141)
    spb = crow(_R_SPB)
    lo = jnp.zeros_like(db_sp)
    hi = jnp.maximum(crow(_R_NSEQ), 1)

    def bstep(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        go = (mid < hi) & (at(start_pos, spb + mid) <= db_sp)
        return (jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid))

    lo, hi = lax.fori_loop(0, sbits, bstep, (lo, hi))
    sid = lo - 1
    local_start = (at(seq_len, spb + sid)
                   - (db_sp - at(start_pos, spb + sid)) - length)
    offb = crow(_R_OFFB)
    aoff = at(abs_aoff, offb + sid)
    coff = at(abs_coff, offb + sid)

    # window accessibility (reference: src/seed_search.cpp:143-151)
    qab = crow(_R_QAB)
    taps = jnp.arange(d, max_len, dtype=jnp.int32)
    tapmask = taps[None, :] < length[:, None]
    _, q_acc, q_cond = qbufs
    _, db_acc, db_cond = dbufs

    def win(acc, cond, abase, cbase):
        c = cond[jnp.clip(cbase[:, None] + taps[None, :], 0,
                          cond.shape[0] - 1)].astype(dt)
        return at(acc, abase).astype(dt) + jnp.sum(
            jnp.where(tapmask, c, 0.0), axis=1)

    qa = win(q_acc, q_cond, qab + q_sp, qab + q_sp)
    dba = win(db_acc, db_cond, aoff + local_start, coff + local_start)
    acc_e = qa + dba
    keep = live & (acc_e + energy.astype(dt) < 0)

    # lockstep ungapped extension on surviving lanes (f32 arithmetic as in
    # the reference; dead lanes are inactive from step zero)
    qenc_bufs = (qbufs[0], q_acc, q_cond)
    res = ungapped_core(
        q_sp, db_sp, length, local_start,
        acc_e.astype(jnp.float32), energy.astype(jnp.float32),
        crow(_R_QB), qab, crow(_R_DBB), aoff, coff,
        qenc_bufs, dbufs, d, dropout, active0=keep)

    keep = keep & (res["energy"] <= jnp.float32(thr))

    # order-preserving compaction into [cap]
    idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep, idx, cap)

    def compact(v, fill=0):
        out = jnp.full((cap,), fill, v.dtype)
        return out.at[dst].set(v, mode="drop")

    out = dict(
        q_sp=compact(res["q_sp"]), db_sp=compact(res["db_sp"]),
        q_len=compact(res["q_len"]), db_len=compact(res["db_len"]),
        dbseq_id=compact(sid), dbseq_start=compact(res["dbseq_start"]),
        acc_e=compact(res["acc_e"]), hyb_e=compact(res["hyb_e"]),
        energy=compact(res["energy"]), pid=compact(pid))
    return out, jnp.sum(keep.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _fused_jit(d, max_len, sbits, dtype_name, thr, dropout, cap, B,
               o, n_pairs, cand, cum, energy_c,
               q_sa, db_sa, start_pos, seq_len, abs_aoff, abs_coff,
               qbufs, dbufs):
    return _core(d, max_len, sbits, dtype_name, thr, dropout, cap,
                 o, n_pairs, cand, cum, energy_c,
                 q_sa, db_sa, start_pos, seq_len, abs_aoff, abs_coff,
                 qbufs, dbufs, B)


@functools.lru_cache(maxsize=32)
def _fused_sharded(mesh, d, max_len, sbits, dtype_name, thr, dropout,
                   cap, B):
    """shard_map variant: each device owns a contiguous pid block and
    compacts locally; device-major concatenation preserves pid order."""
    import functools as _ft

    try:
        from jax import shard_map as _sm

        shard_map = _ft.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme

        shard_map = _ft.partial(_sme, check_rep=False)

    ndev = int(np.prod(mesh.devices.shape))
    if B % ndev or cap % ndev:
        raise ValueError(
            f"fused pair block B={B} and cap={cap} must divide the mesh "
            f"size {ndev}; use a power-of-two device count or shrink the "
            f"mesh (jax.sharding.Mesh over a 2^k subset)")

    def per_dev(o, n_pairs, cand, cum, energy_c, q_sa, db_sa, start_pos,
                seq_len, abs_aoff, abs_coff, qbufs, dbufs):
        didx = lax.axis_index("data")
        o_dev = o + didx * (B // ndev)
        out, cnt = _core(d, max_len, sbits, dtype_name, thr, dropout,
                         cap // ndev, o_dev, n_pairs, cand, cum, energy_c,
                         q_sa, db_sa, start_pos, seq_len, abs_aoff,
                         abs_coff, qbufs, dbufs, B // ndev)
        return out, cnt[None]

    rep = P()
    fn = shard_map(per_dev, mesh=mesh,
                   in_specs=(rep,) * 13,
                   out_specs=({k: P("data") for k in
                               ("q_sp", "db_sp", "q_len", "db_len",
                                "dbseq_id", "dbseq_start", "acc_e",
                                "hyb_e", "energy", "pid")}, P("data")))
    return jax.jit(fn)


# pair-block ladder: each size is one compiled program; `cap` (the
# compacted output size) starts at B//4 and falls back to B on overflow
_PAIR_LADDER = (65536, 2097152)

_OUT_KEYS = ("q_sp", "db_sp", "q_len", "db_len", "dbseq_id", "dbseq_start",
             "acc_e", "hyb_e", "energy", "pid")


def _bucket(n: int) -> int:
    for b in _PAIR_LADDER:
        if n <= b:
            return b
    return _PAIR_LADDER[-1]


class _WaveBuffers:
    """Per-wave device residents: candidate pack + prefix + energies."""

    def __init__(self, p, cands, qpack, dbpack, dtype):
        nc = sum(len(c["q_sp"]) for _, c in cands)
        ncp = max(8, 1 << max(nc - 1, 1).bit_length())
        cand = np.zeros((_ROWS, ncp), np.int32)
        energy = np.zeros(ncp,
                          np.float64 if dtype == "float64" else np.float32)
        cnt = np.zeros(ncp, np.int64)
        self.gbounds = []      # (qid, cid, pair_lo, pair_hi)
        pos = 0
        tot = 0
        for (qid, cid), c in cands:
            n = len(c["q_sp"])
            # stage=4 packing: q interval = (q_sp, db_sp); db interval =
            # (q_len, db_len); seed length = dbseq_id; energy = hyb_e
            nq = (c["db_sp"] - c["q_sp"] + 1).astype(np.int64)
            ndb = (c["db_len"] - c["q_len"] + 1).astype(np.int64)
            sl = slice(pos, pos + n)
            cand[_R_QSA, sl] = qpack.sa_base[qid] + c["q_sp"]
            cand[_R_DSA, sl] = dbpack.sa_base[cid] + c["q_len"]
            cand[_R_LEN, sl] = c["dbseq_id"]
            cand[_R_QB, sl] = qpack.enc_base[qid]
            cand[_R_QAB, sl] = qpack.acc_base[qid]
            cand[_R_DBB, sl] = dbpack.seq_base[cid]
            cand[_R_SPB, sl] = dbpack.seq_meta_base[cid]
            cand[_R_NSEQ, sl] = dbpack.n_seqs[cid]
            cand[_R_OFFB, sl] = dbpack.off_base[cid]
            cand[_R_NQ, sl] = nq
            energy[sl] = c["hyb_e"]
            cnt[sl] = nq * ndb
            npairs = int((nq * ndb).sum())
            self.gbounds.append((qid, cid, tot, tot + npairs))
            pos += n
            tot += npairs
        # lanes compute pid = o + iota up to o + B - 1, which can overrun
        # tot by up to the largest block size; keep that margin below the
        # int32 wrap so padding lanes can never alias real pair indices
        assert tot + _PAIR_LADDER[-1] <= (1 << 31) - 1, \
            "pair stream exceeds int32 (split the wave)"
        self.tot = tot
        cum = np.zeros(ncp + 1, np.int64)
        np.cumsum(cnt, out=cum[1:])
        from priblast_tpu.parallel import dist

        mesh = dbpack.mesh
        self.cand = dist.put_replicated(cand, mesh)
        self.cum = dist.put_replicated(cum.astype(np.int32), mesh)
        self.energy = dist.put_replicated(energy, mesh)
        self.sbits = int(max(int(dbpack.n_seqs.max()), 1)).bit_length() + 1


def fused_stage(p, cands, qpack, dbpack, dtype: str = "float32"):
    """Post-threshold HitStream for all candidates of a wave (equivalent to
    expand_stage -> ungapped_stage -> threshold_stage, single device pass
    per pair block)."""
    from priblast_tpu.search.pipeline import HitStream

    wb = _WaveBuffers(p, cands, qpack, dbpack, dtype)
    mesh = dbpack.mesh
    # device filter threshold, rounded toward +inf in f32 so the device
    # keeps a superset for -f values not exactly representable in f32; the
    # exact f64 comparison is re-applied on the compacted host energies
    thr = float(p.interaction_energy_threshold)
    thr32 = np.float32(thr)
    if float(thr32) < thr:
        thr32 = np.nextafter(thr32, np.float32(np.inf))
    statics = (p.min_accessible_length, p.max_seed_length, wb.sbits, dtype,
               float(thr32),
               p.drop_out_length_wo_gap)
    bufs = (wb.cand, wb.cum, wb.energy, qpack.sa, dbpack.sa_j,
            dbpack.start_pos_j, dbpack.seq_len_j, dbpack.abs_acc_off_j,
            dbpack.abs_cond_off_j, qpack.bufs, dbpack.bufs)

    parts = []

    def run_block(o: int, ns: int) -> None:
        B = _bucket(ns)
        for cap in (max(B // 4, 8), B):
            if mesh is None:
                out, cnt = _fused_jit(*statics, cap, B,
                                      np.int32(o), np.int32(wb.tot), *bufs)
                count = int(cnt)
                if count <= cap:
                    parts.append({k: np.asarray(out[k])[:count]
                                  for k in _OUT_KEYS})
                    return
            else:
                fn = _fused_sharded(mesh, *statics, cap, B)
                out, cnt = fn(np.int32(o), np.int32(wb.tot), *bufs)
                cnt = np.asarray(cnt)
                ndev = len(cnt)
                cl = cap // ndev
                if (cnt <= cl).all():
                    segs = {k: np.asarray(out[k]) for k in _OUT_KEYS}
                    parts.append({k: np.concatenate(
                        [segs[k][i * cl: i * cl + cnt[i]]
                         for i in range(ndev)]) for k in _OUT_KEYS})
                    return
        raise AssertionError("unreachable: cap == B cannot overflow")

    for o in range(0, max(wb.tot, 1), _PAIR_LADDER[-1]):
        if wb.tot == 0:
            break
        run_block(o, min(_PAIR_LADDER[-1], wb.tot - o))

    if parts:
        flat = {k: np.concatenate([s[k] for s in parts]) for k in _OUT_KEYS}
    else:
        flat = {k: np.zeros(0, np.float32 if k in ("acc_e", "hyb_e",
                                                   "energy") else np.int32)
                for k in _OUT_KEYS}
    # exact f64 threshold re-check (matches threshold_stage semantics:
    # f32-valued energies compared against the double threshold)
    fkeep = flat["energy"].astype(np.float64) <= p.interaction_energy_threshold
    if not fkeep.all():
        flat = {k: v[fkeep] for k, v in flat.items()}
    pids = flat.pop("pid")
    soa = {k: (v.astype(np.float64) if k in ("acc_e", "hyb_e", "energy")
               else v) for k, v in flat.items()}
    groups = []
    for qid, cid, plo, phi in wb.gbounds:
        groups.append((qid, cid, int(np.searchsorted(pids, plo)),
                       int(np.searchsorted(pids, phi))))
    return HitStream(soa, groups)
