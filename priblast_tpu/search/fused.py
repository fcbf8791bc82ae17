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
import os

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


# ---------------------------------------------------------------------------
# v2 path (round 4, mesh-ported round 5): gather-minimal expansion +
# windowed extension. The round-3 lockstep `_core`
# measured ~18k pairs/s on a v5e: its searchsorted/candidate-row/binary-
# search gathers ran at ~110 M elems/s and its lockstep extension ran as
# many serial steps as the WORST lane needed. v2 restructures:
#
#   A  expansion: candidate-constant fields reach the pair lanes by
#      SCATTER + CUMSUM segment broadcasts (one scatter of the candidate
#      boundaries + one prefix sum per field — bandwidth, not gathers;
#      float fields ride bitcast int32 deltas, exactly). The owning db
#      sequence comes from dense position->sequence maps (DbPack.pos_*),
#      one gather per field instead of a per-pair binary search. Window
#      accessibility sums are two point reads of hi/lo split prefix sums
#      (pipeline._prefix_hilo) instead of a [B, max_len] tap gather.
#      Survivors of the interaction filter are compacted on device.
#   B  windowed ungapped extension (search/uwin.py) on the compacted
#      stream: per-step energies from one-hot MXU planes, a 24-step
#      sequential scan with the reference's exact f32 arithmetic.
#   C  the few lanes still extending at the window edge re-run on the
#      lockstep kernel (search/ungapped.py), gathered/scattered by index.
#   D  threshold filter + final compaction; the host reads back only the
#      surviving hits.
# ---------------------------------------------------------------------------


def _seg_i32(vals, base_ci, idx, B: int):
    """Segment-broadcast vals[ci] over the pair lanes: scatter the
    candidate-boundary deltas, prefix-sum. vals: [NCP] int32."""
    dv = vals[1:] - vals[:-1]
    arr = jnp.zeros(B, jnp.int32).at[0].add(vals[base_ci])
    arr = arr.at[idx[1:]].add(dv, mode="drop")
    return jnp.cumsum(arr)


def _expand_core(d: int, dtype_name: str, cap: int, B: int,
                 o, n_pairs, cand, cum, energy_c,
                 q_sa, db_sa, pos_sid, pos_ls, pos_ac2,
                 q_acc, qp_hl2, db_acc, dp_hl2):
    """Kernel A: one [B] pair block -> compacted acc-filter survivors."""
    dt = jnp.float64 if dtype_name == "float64" else jnp.float32
    pid = o + lax.iota(jnp.int32, B)
    live = pid < n_pairs
    base_ci = jnp.clip(
        jnp.searchsorted(cum, o, side="right").astype(jnp.int32) - 1,
        0, cand.shape[1] - 1)
    # candidate start positions within this block (-1 = before the block,
    # dropped by scatter mode="drop")
    idx = jnp.where(cum[:-1] > o, cum[:-1] - o, -1).astype(jnp.int32)

    def seg(r):
        return _seg_i32(cand[r], base_ci, idx, B)

    nq = jnp.maximum(seg(_R_NQ), 1)
    cumci = _seg_i32(cum[:-1].astype(jnp.int32), base_ci, idx, B)
    off = pid - cumci
    ki = off // nq
    qi = off - ki * nq
    if dtype_name == "float64":
        # broadcast the f64 bits exactly as two int32 segment sums
        bits = lax.bitcast_convert_type(energy_c, jnp.int32)   # [NCP, 2]
        eb = jnp.stack([_seg_i32(bits[:, 0], base_ci, idx, B),
                        _seg_i32(bits[:, 1], base_ci, idx, B)], axis=1)
        energy = lax.bitcast_convert_type(eb, jnp.float64)
    else:
        energy = lax.bitcast_convert_type(
            _seg_i32(lax.bitcast_convert_type(energy_c, jnp.int32),
                     base_ci, idx, B), jnp.float32)

    def at(buf, pos):
        return buf[jnp.clip(pos, 0, buf.shape[0] - 1)]

    q_sp = at(q_sa, seg(_R_QSA) + qi)
    db_sp = at(db_sa, seg(_R_DSA) + ki)
    length = jnp.maximum(seg(_R_LEN), 1)
    qb = seg(_R_QB)
    qab = seg(_R_QAB)
    dbb = seg(_R_DBB)

    # owning db sequence via the dense position maps (reference:
    # src/seed_search.cpp:101-141). Gathers cost per INDEX on a v5e, so
    # the five parallel map reads ride two row-gathers: pos_ls holds
    # len+start (local_start = (len+start) - db_sp - length, integer-exact
    # in any association) and pos_ac2 holds (aoff, coff) as [N, 2] rows.
    pos = dbb + db_sp
    sid = at(pos_sid, pos)
    local_start = at(pos_ls, pos) - db_sp - length
    ac = at(pos_ac2, pos)
    aoff = ac[..., 0]
    coff = ac[..., 1]

    # window accessibility as prefix-sum differences (reference:
    # src/seed_search.cpp:143-151); hi differences are exact (Sterbenz),
    # lo differences restore the bits the split dropped. (hi, lo) ride one
    # [N, 2] row-gather per point read.
    def win(acc_pt, hl2, abase, cbase):
        wa = at(hl2, cbase + d)
        wb = at(hl2, cbase + length)
        hi_a = lax.bitcast_convert_type(wa[..., 0], jnp.float32)
        lo_a = lax.bitcast_convert_type(wa[..., 1], jnp.float32)
        hi_b = lax.bitcast_convert_type(wb[..., 0], jnp.float32)
        lo_b = lax.bitcast_convert_type(wb[..., 1], jnp.float32)
        s = ((hi_b - hi_a).astype(dt) + (lo_b - lo_a).astype(dt))
        return at(acc_pt, abase).astype(dt) + s

    qa = win(q_acc, qp_hl2, qab + q_sp, qab + q_sp)
    dba = win(db_acc, dp_hl2, aoff + local_start, coff + local_start)
    acc_e = qa + dba
    keep = live & (acc_e + energy.astype(dt) < 0)

    cidx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep, cidx, cap)

    def compact(v, fill=0):
        out = jnp.full((cap,), fill, v.dtype)
        return out.at[dst].set(v, mode="drop")

    out = dict(q_sp=compact(q_sp), db_sp=compact(db_sp),
               length=compact(length), dbseq_id=compact(sid),
               dbseq_start=compact(local_start),
               acc_e=compact(acc_e), hyb_e=compact(energy),
               qb=compact(qb), qab=compact(qab), dbb=compact(dbb),
               aoff=compact(aoff), coff=compact(coff), pid=compact(pid))
    return out, jnp.sum(keep.astype(jnp.int32))


_expand_jit = jax.jit(_expand_core, static_argnums=(0, 1, 2, 3))


def _uwin_core(d, dropout, wu, n, hits, qbufs, dbufs):
    from priblast_tpu.search.uwin import ungapped_window

    B = hits["q_sp"].shape[0]
    act = lax.iota(jnp.int32, B) < n
    res = ungapped_window(hits["q_sp"], hits["db_sp"], hits["length"],
                          hits["dbseq_start"], hits["acc_e"].astype(
                              jnp.float32),
                          hits["hyb_e"].astype(jnp.float32),
                          hits["qb"], hits["qab"], hits["dbb"],
                          hits["aoff"], hits["coff"], qbufs, dbufs,
                          d, dropout, act, wu=wu)
    unfin = res.pop("unfinished") & act
    return res, unfin, jnp.sum(unfin.astype(jnp.int32))


_uwin_jit = jax.jit(_uwin_core, static_argnums=(0, 1, 2))


def _tail_core(d, dropout, capu, hits, unfin, res, qbufs, dbufs):
    """Kernel C: re-run the unfinished lanes on the lockstep kernel and
    scatter the corrected results back into the windowed results."""
    B = hits["q_sp"].shape[0]
    cidx = jnp.cumsum(unfin.astype(jnp.int32)) - 1
    dstu = jnp.where(unfin, cidx, capu)
    iu = jnp.full((capu,), B - 1, jnp.int32).at[dstu].set(
        lax.iota(jnp.int32, B), mode="drop")
    nu = jnp.sum(unfin.astype(jnp.int32))
    act = lax.iota(jnp.int32, capu) < nu

    def g(k):
        return hits[k][iu]

    sub = ungapped_core(g("q_sp"), g("db_sp"), g("length"),
                        g("dbseq_start"), hits["acc_e"][iu].astype(
                            jnp.float32),
                        hits["hyb_e"][iu].astype(jnp.float32),
                        g("qb"), g("qab"), g("dbb"), g("aoff"), g("coff"),
                        qbufs, dbufs, d, dropout, active0=act)
    out = dict(res)
    iw = jnp.where(act, iu, B)
    for k in sub:
        out[k] = out[k].at[iw].set(sub[k], mode="drop")
    return out


_tail_jit = jax.jit(_tail_core, static_argnums=(0, 1, 2))


def _thresh_core(thr, cap, n, res, hits):
    """Kernel D: interaction-energy threshold + final compaction."""
    B = res["q_sp"].shape[0]
    keep = (lax.iota(jnp.int32, B) < n) & (res["energy"]
                                           <= jnp.float32(thr))
    cidx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep, cidx, cap)

    def compact(v, fill=0):
        out = jnp.full((cap,), fill, v.dtype)
        return out.at[dst].set(v, mode="drop")

    out = {k: compact(res[k]) for k in
           ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
            "acc_e", "hyb_e", "energy")}
    out["dbseq_id"] = compact(hits["dbseq_id"])
    out["pid"] = compact(hits["pid"])
    return out, jnp.sum(keep.astype(jnp.int32))


_thresh_jit = jax.jit(_thresh_core, static_argnums=(0, 1))


@functools.lru_cache(maxsize=32)
def _fused_sharded_v2(mesh, d, dtype_name, thr, dropout, cap, B, capu):
    """shard_map mesh variant of the v2 chain: each device owns a
    contiguous pid block and runs expand -> windowed extension -> lockstep
    tail -> threshold locally on fixed shapes; device-major concatenation
    preserves pid order. The per-device survivor/unfinished counts return
    so the caller can retry a block at larger caps (rare)."""
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
    capd = cap // ndev

    def per_dev(o, n_pairs, cand, cum, energy_c, q_sa, db_sa, pos_sid,
                pos_ls, pos_ac2, q_acc, qp_hl2, db_acc, dp_hl2,
                qbufs6, dbufs6):
        didx = lax.axis_index("data")
        o_dev = o + didx * (B // ndev)
        hits, cnt = _expand_core(d, dtype_name, capd, B // ndev,
                                 o_dev, n_pairs, cand, cum, energy_c,
                                 q_sa, db_sa, pos_sid, pos_ls, pos_ac2,
                                 q_acc, qp_hl2, db_acc, dp_hl2)
        ncl = jnp.minimum(cnt, capd)
        res, unfin, n_unfin = _uwin_core(d, dropout, 16, ncl, hits,
                                         qbufs6, dbufs6)
        res = _tail_core(d, dropout, capu, hits, unfin, res,
                         qbufs6[:3], dbufs6[:3])
        out, nf = _thresh_core(thr, capd, ncl, res, hits)
        return out, cnt[None], n_unfin[None], nf[None]

    rep = P()
    fn = shard_map(per_dev, mesh=mesh,
                   in_specs=(rep,) * 16,
                   out_specs=({k: P("data") for k in _OUT_KEYS},
                              P("data"), P("data"), P("data")))
    return jax.jit(fn)


def _bucket_of(n: int, ladder) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


# pair-block ladder: each size is one compiled program; `cap` (the
# compacted output size) starts at B//4 and falls back to B on overflow.
# The top size is derived from device memory (~150 B/lane of live f32/i32
# vectors through expansion + compaction).
from priblast_tpu.utils import devmem as _devmem

_PAIR_LADDER = (65536, 524288,
                _devmem.ladder_cap(150, 0.02, 1 << 21, 1 << 23))

# survivor ladders for the uwin/tail stages. The acc-filter survivor count
# can reach the full pair block B <= _PAIR_LADDER[-1], so the top rung MUST
# cover it exactly — `hits_b = {k: v[:be]}` below would otherwise silently
# drop survivors beyond the rung (round-4 advisor finding).
_EXT_LADDER = tuple(b for b in (16384, 65536, 262144, 524288, 2097152)
                    if b < _PAIR_LADDER[-1]) + (_PAIR_LADDER[-1],)
_TAIL_LADDER = tuple(b for b in (2048, 16384, 262144)
                     if b < _EXT_LADDER[-1]) + (_EXT_LADDER[-1],)


def _fused_blocks_v2(p, wb, qpack, dbpack, dtype: str, thr32: float):
    """Single-device v2 block loop; returns list of host SoA parts."""
    d = p.min_accessible_length
    dropout = p.drop_out_length_wo_gap
    exp_args = (wb.cand, wb.cum, wb.energy, qpack.sa, dbpack.sa_j,
                dbpack.pos_sid, dbpack.pos_ls, dbpack.pos_ac2,
                qpack.acc, qpack.cond_pref2,
                dbpack.acc, dbpack.cond_pref2)
    import os as _os
    import time as _time

    dbg = _os.environ.get("PRIBLAST_FUSED_TIMINGS")
    t0 = _time.perf_counter()

    def tick(msg):
        nonlocal t0
        if dbg:
            t1 = _time.perf_counter()
            print(f"[fused2] {msg:24s} {(t1 - t0) * 1e3:8.1f} ms",
                  flush=True)
            t0 = _time.perf_counter()

    parts = []
    for o in range(0, max(wb.tot, 1), _PAIR_LADDER[-1]):
        if wb.tot == 0:
            break
        ns = min(_PAIR_LADDER[-1], wb.tot - o)
        B = _bucket(ns)
        hits = cnt = None
        for cap in (max(B // 4, 8), B):
            hits, cnt = _expand_jit(d, dtype, cap, B,
                                    np.int32(o), np.int32(wb.tot),
                                    *exp_args)
            cnt = int(cnt)
            if cnt <= cap:
                break
        tick(f"expand B={B} cnt={cnt}")
        be = _bucket_of(max(cnt, 1), _EXT_LADDER)
        hits_b = {k: v[:be] for k, v in hits.items()}
        res, unfin, n_unfin = _uwin_jit(d, dropout, 16, np.int32(cnt),
                                        hits_b, qpack.bufs6, dbpack.bufs6)
        n_unfin = int(n_unfin)
        tick(f"uwin be={be} unfin={n_unfin}")
        if n_unfin:
            capu = _bucket_of(n_unfin, _TAIL_LADDER)
            res = _tail_jit(d, dropout, capu, hits_b, unfin, res,
                            qpack.bufs, dbpack.bufs)
            tick(f"tail capu={capu}")
        for capf in (max(be // 4, 8), be):
            out, nf = _thresh_jit(thr32, capf, np.int32(cnt), res, hits_b)
            nf = int(nf)
            if nf <= capf:
                # defer the (slow) host transfer: start it asynchronously
                # and materialize after every block's kernels are queued,
                # so readback overlaps the next block's device work
                sliced = {k: v[:nf] for k, v in out.items()}
                for v in sliced.values():
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        pass
                parts.append(sliced)
                break
        tick(f"thresh nf={nf}")
    return [{k: np.asarray(v) for k, v in part.items()} for part in parts]


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


def _split_waves(cands, limit: int):
    """Partition a candidate list into sub-waves whose total pair counts
    stay below `limit` (so int32 pair indices can never wrap). Groups —
    and, if one group alone exceeds the limit, individual candidates' db
    intervals — are split; candidate order (and so the reference's
    emission order) is preserved."""
    def npairs(c):
        return ((c["db_sp"] - c["q_sp"] + 1).astype(np.int64)
                * (c["db_len"] - c["q_len"] + 1).astype(np.int64))

    waves = [[]]
    budget = limit
    for gkey, c in cands:
        pc = npairs(c)
        i = 0
        n = len(pc)
        while i < n:
            take = i
            acc = 0
            while take < n and acc + pc[take] <= budget:
                acc += int(pc[take])
                take += 1
            if take > i:
                sub = {k: v[i:take] for k, v in c.items()}
                waves[-1].append((gkey, sub))
                budget -= acc
                i = take
            if i < n:
                # next candidate alone exceeds the remaining budget
                if budget < limit:
                    waves.append([])
                    budget = limit
                    continue
                # a single candidate exceeds a whole wave: split its db
                # interval (pairs are db-major, so order is preserved)
                nq = int(c["db_sp"][i] - c["q_sp"][i] + 1)
                rows = max(limit // max(nq, 1), 1)
                sub = {k: v[i:i + 1].copy() for k, v in c.items()}
                sub["db_len"][0] = sub["q_len"][0] + rows - 1
                waves[-1].append((gkey, sub))
                c = {k: v.copy() for k, v in c.items()}
                c["q_len"][i] += rows
                pc[i] -= rows * nq
                waves.append([])
                budget = limit
    return [w for w in waves if w]


def fused_stage(p, cands, qpack, dbpack, dtype: str = "float32"):
    """Post-threshold HitStream for all candidates of a wave (equivalent to
    expand_stage -> ungapped_stage -> threshold_stage, single device pass
    per pair block). Waves whose pair stream would overflow int32 indices
    are auto-split into sub-waves (reference emission order preserved)."""
    from priblast_tpu.search.pipeline import HitStream

    limit = int(os.environ.get("PRIBLAST_PAIR_WAVE_LIMIT",
                               (1 << 31) - 1 - _PAIR_LADDER[-1]))
    subwaves = _split_waves(cands, limit)
    if len(subwaves) > 1:
        soas, counts = [], []
        for sw in subwaves:
            st = _fused_wave(p, sw, qpack, dbpack, dtype)
            soas.append(st.soa)
            for qid, cid, lo, hi in st.groups:
                counts.append((qid, cid, hi - lo))
        soa = {k: np.concatenate([s[k] for s in soas])
               for k in soas[0]}
        # merge adjacent split pieces of the same (query, chunk) group
        groups = []
        pos = 0
        for qid, cid, n in counts:
            if groups and groups[-1][0] == qid and groups[-1][1] == cid:
                groups[-1] = (qid, cid, groups[-1][2], pos + n)
            else:
                groups.append((qid, cid, pos, pos + n))
            pos += n
        return HitStream(soa, [tuple(g) for g in groups])
    return _fused_wave(p, cands, qpack, dbpack, dtype)


def _fused_wave(p, cands, qpack, dbpack, dtype: str = "float32"):
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

    if mesh is None:
        parts = _fused_blocks_v2(p, wb, qpack, dbpack, dtype, float(thr32))
    else:
        ndev = int(np.prod(mesh.devices.shape))
        bufs = (wb.cand, wb.cum, wb.energy, qpack.sa, dbpack.sa_j,
                dbpack.pos_sid, dbpack.pos_ls, dbpack.pos_ac2,
                qpack.acc, qpack.cond_pref2, dbpack.acc, dbpack.cond_pref2,
                qpack.bufs6, dbpack.bufs6)
        d2 = p.min_accessible_length
        dropout = p.drop_out_length_wo_gap
        parts = []

        def run_block(o: int, ns: int) -> None:
            B = _bucket(ns)
            capu = 16384
            while True:
                for cap in (max(B // 4, 8 * ndev), B):
                    fn = _fused_sharded_v2(mesh, d2, dtype, float(thr32),
                                           dropout, cap, B, capu)
                    out, cnt, nunf, nf = fn(np.int32(o), np.int32(wb.tot),
                                            *bufs)
                    cnt = np.asarray(cnt)
                    if (cnt <= cap // ndev).all():
                        break
                if (np.asarray(nunf) <= capu).all():
                    break
                # rare: too many window-edge stragglers for the fixed
                # tail buffer — recompile the block at a larger one
                capu = min(capu * 4, B)
            nf = np.asarray(nf)
            cl = cap // ndev
            segs = {k: np.asarray(out[k]) for k in _OUT_KEYS}
            parts.append({k: np.concatenate(
                [segs[k][i * cl: i * cl + nf[i]]
                 for i in range(ndev)]) for k in _OUT_KEYS})

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
