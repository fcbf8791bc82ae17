"""Device seed-candidate expansion (the heavy half of the seed stage).

The reference's seed search is (a) a DFS over paired SA intervals — tiny,
data-dependent, stays on the host (native C++, search.cc SeedSearcher;
reference: src/seed_search.cpp:153-230) — and (b) the *expansion* of every
candidate interval pair into per-position hits with window-accessibility
interaction energies (reference CalcInteractionEnergy,
src/seed_search.cpp:47-141). Expansion is O(sum |qI| x |dbI|) gather work
over the suffix arrays and accessibility arrays: this module runs it as one
vectorized device kernel over all candidates of all (query, chunk) pairs.

Per flat pair index the kernel gathers both SA positions, locates the owning
db sequence by on-device binary search over the chunk's start_pos segment
(reference: src/seed_search.cpp:101-141), computes both window
accessibilities (fixed max-seed-length masked sums; reference
src/seed_search.cpp:143-151), and filters interaction < 0. The host then
compacts the surviving hits (order preserved: candidate-major, db-position
then query-position, exactly the reference's emission order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module



@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _expand_kernel(d: int, max_len: int, sbits: int, dtype_name: str,
                   q_sa_idx, db_sa_idx, length, energy,
                   qab, spb, nseq, offb,
                   q_sa, db_sa, start_pos, seq_len, abs_aoff, abs_coff,
                   q_acc, q_cond, db_acc, db_cond):
    """One device pass over a [B] batch of candidate-expansion pairs.

    q_sa_idx/db_sa_idx: flat indices into the packed suffix-array buffers;
    length/energy: the candidate's seed length and hybrid energy; qab: the
    query's accessibility base; spb: the chunk's start_pos/seq_len segment
    base; nseq: the chunk's sequence count; offb: the chunk's segment base
    in the packed absolute acc/cond offset buffers. sbits: binary-search
    iteration count (ceil(log2(max n_seqs)) + 1).
    """
    dt = jnp.float64 if dtype_name == "float64" else jnp.float32

    def at(buf, pos):
        return buf[jnp.clip(pos, 0, buf.shape[0] - 1)]

    q_sp = at(q_sa, q_sa_idx)
    db_sp = at(db_sa, db_sa_idx)

    # upper_bound(start_pos, db_sp) - 1 over the chunk's segment
    lo = jnp.zeros_like(db_sp)
    hi = nseq

    def bstep(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        go = (mid < hi) & (at(start_pos, spb + mid) <= db_sp)
        return (jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid))

    lo, hi = lax.fori_loop(0, sbits, bstep, (lo, hi))
    sid = lo - 1
    local_start = (at(seq_len, spb + sid)
                   - (db_sp - at(start_pos, spb + sid)) - length)
    aoff = at(abs_aoff, offb + sid)
    coff = at(abs_coff, offb + sid)

    # window accessibility (reference: src/seed_search.cpp:143-151)
    taps = jnp.arange(d, max_len, dtype=jnp.int32)
    mask = taps[None, :] < length[:, None]

    def win(acc, cond, abase, cbase):
        # acc[base] + sum_{i=d}^{len-1} cond[base+i]; acc/cond bases differ
        # on the db side (absolute array offsets, seed_search.cpp:143-151)
        c = cond[jnp.clip(cbase[:, None] + taps[None, :], 0,
                          cond.shape[0] - 1)].astype(dt)
        return at(acc, abase).astype(dt) + jnp.sum(jnp.where(mask, c, 0.0),
                                                   axis=1)

    qa = win(q_acc, q_cond, qab + q_sp, qab + q_sp)
    dba = win(db_acc, db_cond, aoff + local_start, coff + local_start)

    acc_e = qa + dba
    inter = acc_e + energy.astype(dt)
    keep = inter < 0
    return dict(q_sp=q_sp, db_sp=db_sp, dbseq_id=sid,
                dbseq_start=local_start, acc_e=acc_e, keep=keep)


# pair-batch ladder (each size is one compiled program per buffer shape)
_EXPAND_LADDER = (4096, 65536, 524288)


def _bucket(n: int, ladder=_EXPAND_LADDER) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


def seed_candidates(p, chunks, queries, threads: int = 1):
    """Host DFS seed candidates for every (query, chunk) pair. Returns a
    list of ((qid, cid), candidates-SoA) in group order."""
    import concurrent.futures as cf

    from priblast_tpu.ops import native

    pairs = [(qid, cid) for qid in range(len(queries))
             for cid in range(len(chunks))]

    def one(pair):
        qid, cid = pair
        q_enc, q_sa, q_acc, q_cond = queries[qid]
        return native.search_chunk(q_enc, q_sa, q_acc, q_cond, chunks[cid],
                                   p, stage=4)

    if threads > 1 and len(pairs) > 1:
        with cf.ThreadPoolExecutor(threads) as ex:
            cands = list(ex.map(one, pairs))
    else:
        cands = [one(pair) for pair in pairs]
    return list(zip(pairs, cands))


def expand_stage(p, cands, qpack, dbpack, dtype: str = "float32"):
    """Device expansion of all candidates into a stage-1 HitStream
    (hits with interaction energy < 0, reference emission order)."""
    from priblast_tpu.search.pipeline import HitStream, _STREAM_KEYS

    # --- flatten candidates into per-pair arrays (numpy, vectorized)
    segs = []   # per group: (qid, cid, candidate arrays)
    tot_pairs = 0
    per_group = []
    for (qid, cid), c in cands:
        # stage=4 packing: q interval = (q_sp, db_sp); db interval =
        # (q_len, db_len); seed length = dbseq_id; energy = hyb_e
        nq = c["db_sp"] - c["q_sp"] + 1
        ndb = c["db_len"] - c["q_len"] + 1
        npairs = (nq.astype(np.int64) * ndb).sum()
        per_group.append((qid, cid, int(npairs)))
        segs.append((qid, cid, c, nq, ndb))
        tot_pairs += int(npairs)

    if tot_pairs == 0:
        soa = {k: np.zeros(0, np.float64 if k in ("acc_e", "hyb_e", "energy")
                           else np.int32) for k in _STREAM_KEYS}
        groups = []
        lo = 0
        for qid, cid, _np_ in per_group:
            groups.append((qid, cid, lo, lo))
        return HitStream(soa, groups)

    f = {k: np.empty(tot_pairs, np.int32)
         for k in ("q_sa_idx", "db_sa_idx", "length", "qab", "spb", "nseq",
                   "offb")}
    f["energy"] = np.empty(tot_pairs, np.float64)
    gbounds = []
    pos = 0
    for qid, cid, c, nq, ndb in segs:
        cn = len(nq)
        cnt = (nq.astype(np.int64) * ndb)
        total = int(cnt.sum())
        gbounds.append((qid, cid, pos, pos + total))
        if total == 0:
            continue
        # per-pair candidate index and in-candidate (ki, qi): the reference
        # loops k over the db interval (outer) and j over the query interval
        # (inner) — src/seed_search.cpp:274-301
        cidx = np.repeat(np.arange(cn), cnt)
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        nq_pp = nq[cidx].astype(np.int64)
        ki = off // nq_pp
        qi = off % nq_pp
        sl = slice(pos, pos + total)
        f["q_sa_idx"][sl] = (qpack.sa_base[qid] + c["q_sp"][cidx] + qi)
        f["db_sa_idx"][sl] = (dbpack.sa_base[cid] + c["q_len"][cidx] + ki)
        f["length"][sl] = c["dbseq_id"][cidx]
        f["energy"][sl] = c["hyb_e"][cidx]
        f["qab"][sl] = qpack.acc_base[qid]
        f["spb"][sl] = dbpack.seq_meta_base[cid]
        f["nseq"][sl] = dbpack.n_seqs[cid]
        f["offb"][sl] = dbpack.off_base[cid]
        pos += total

    from priblast_tpu.parallel import dist

    sbits = int(dbpack.n_seqs.max()).bit_length() + 1
    mesh = dbpack.mesh
    cap = _EXPAND_LADDER[-1]
    outs = {k: [] for k in ("q_sp", "db_sp", "dbseq_id", "dbseq_start",
                            "acc_e", "keep")}
    for o in range(0, tot_pairs, cap):
        ns = min(cap, tot_pairs - o)
        B = _bucket(ns)

        def padded(a, fill=0):
            out = np.full(B, fill, a.dtype)
            out[:ns] = a[o:o + ns]
            return out

        def put(a, fill=0):
            return dist.put_batch(padded(a, fill), mesh)

        res = _expand_kernel(
            p.min_accessible_length, p.max_seed_length, sbits, dtype,
            put(f["q_sa_idx"]),
            put(f["db_sa_idx"]),
            put(f["length"], 1),
            put(f["energy"].astype(
                np.float64 if dtype == "float64" else np.float32)),
            put(f["qab"]), put(f["spb"]),
            put(f["nseq"], 1),
            put(f["offb"]),
            qpack.sa, dbpack.sa_j, dbpack.start_pos_j, dbpack.seq_len_j,
            dbpack.abs_acc_off_j, dbpack.abs_cond_off_j,
            qpack.acc, qpack.cond, dbpack.acc, dbpack.cond)
        for k in outs:
            outs[k].append(np.asarray(res[k])[:ns])
    flat = {k: np.concatenate(v) for k, v in outs.items()}

    keep = flat["keep"]
    soa = {
        "q_sp": flat["q_sp"][keep],
        "db_sp": flat["db_sp"][keep],
        "dbseq_id": flat["dbseq_id"][keep],
        "dbseq_start": flat["dbseq_start"][keep],
        "acc_e": flat["acc_e"][keep].astype(np.float64),
        "hyb_e": f["energy"][keep],
    }
    ln = f["length"][keep]
    soa["q_len"] = ln.copy()
    soa["db_len"] = ln.copy()
    soa["energy"] = soa["acc_e"] + soa["hyb_e"]
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    groups = [(qid, cid, int(kept_cum[lo]), int(kept_cum[hi]))
              for qid, cid, lo, hi in gbounds]
    return HitStream(soa, groups)
