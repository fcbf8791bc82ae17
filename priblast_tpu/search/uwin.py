"""Windowed ungapped extension (device, JAX) — the fused path's fast lane.

The reference's per-hit greedy extension (src/ungapped_extension.cpp:30-155)
is a sequential scan whose EVERY quantity is a pure function of the
characters and accessibility values around the hit: positions pair exactly
when the base-pair table says so, so the pairing pattern, the loop-energy
terms and the accessibility deltas are all character-derived. Only the
running energy/minimum/stop bookkeeping is sequential — and that is a few
dozen [B]-wide register ops per step.

The round-3/4 lockstep `lax.while_loop` (search/ungapped.py) instead did
~12 irregular device gathers per step and ran as many steps as the WORST
lane needed (hundreds): gathers run at ~110 M elems/s on a v5e, so the
fused stage measured ~18k pairs/s. This module restructures one WINDOW of
the extension (default 24 steps each direction) as:

  1. dense clipped window gathers of the characters / accessibility arrays
     (one gather per array per phase, not one per step);
  2. per-step loop-energy values precomputed as [WU, B] planes via one-hot
     MXU contractions of composite numpy tables (exact — one nonzero per
     row), keyed by the gap u = distance to the previous paired position,
     which the reference's own dropout rule bounds by dropout-1;
  3. a `lax.scan` over the window that reproduces the reference's
     sequential f32 arithmetic bit-for-bit (same add order, same clipped
     reads, same strict-< minimum updates);
  4. an `unfinished` mask for lanes still extending at the window edge —
     the caller re-runs those few from scratch on the lockstep kernel.

Batched across queries and db chunks over the same flattened buffers as
search/ungapped.py (the packing contract is identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module


from priblast_tpu.utils import thermo


@functools.lru_cache(maxsize=1)
def _raw():
    r = thermo.RAW
    f = lambda x: np.asarray(x, np.float64).reshape(-1)
    return dict(
        bp=r.BP_pair.reshape(5, 5).astype(np.int64),
        rtype=r.rtype.astype(np.int64),
        stack=f(r.stack37),
        i11=f(r.int11_37),
        i22=f(r.int22_37),
        mismI=f(r.mismatchI37),
        intloop=f(r.internal_loop37),
    )


@functools.lru_cache(maxsize=4)
def _utables(right: bool):
    """Composite loop-energy tables per gap class u, in RAW Turner units
    (the /100 happens once on the selected value, matching
    src/ungapped_extension.cpp:157-186 exactly). Character axis order:
    q-side combined index (qm[x]*5 + qm[x-1])(*5 + qm[x-2]); d-side
    likewise. For the right phase the previous pair is the un-reversed
    type and the current pair is rtype'd (reference :96-145)."""
    r = _raw()
    bp, rt = r["bp"], r["rtype"]
    stack, i11, i22, mism = r["stack"], r["i11"], r["i22"], r["mismI"]
    A5 = list(range(5))
    out = {}
    # u = 0 (stack): chars x, x-1 both sides
    C1, Q1, C2, D1 = np.ix_(A5, A5, A5, A5)
    cur = bp[C1, C2]
    prev = bp[Q1, D1]
    if right:
        stk = stack[prev * 7 + rt[cur]]
    else:
        stk = stack[cur * 7 + rt[prev]]
    out["STK"] = stk.reshape(25, 25)
    # A-term of the general loop: mismatch at the current pair
    out["A"] = (mism[(cur * 5 + Q1) * 5 + D1] if not right else
                mism[(rt[cur] * 5 + D1) * 5 + Q1]).reshape(25, 25)
    # B-term: mismatch at the previous pair (read at its own offset)
    out["B"] = (mism[(rt[cur] * 5 + D1) * 5 + Q1] if not right else
                mism[(cur * 5 + Q1) * 5 + D1]).reshape(25, 25)
    # u = 1: chars x, x-1, x-2 both sides
    C1, Q1, Q2, C2, D1, D2 = np.ix_(A5, A5, A5, A5, A5, A5)
    cur = bp[C1, C2]
    prev2 = bp[Q2, D2]
    if right:
        z = i11[((prev2 * 8 + rt[cur]) * 5 + Q1) * 5 + D1]
    else:
        z = i11[((cur * 8 + rt[prev2]) * 5 + Q1) * 5 + D1]
    out["I11"] = z.reshape(125, 125)
    # u = 2: previous pair at x-3 factored out as the 7-way T2 select
    v = []
    for tt in range(7):
        if right:
            z = i22[((((tt * 8 + rt[cur]) * 5 + Q2) * 5 + Q1) * 5 + D1)
                    * 5 + D2]
        else:
            z = i22[((((cur * 8 + tt) * 5 + Q1) * 5 + Q2) * 5 + D2)
                    * 5 + D1]
        v.append(z.reshape(125, 125))
    out["I22"] = np.stack(v)
    # T2 plane for the u=2 select: left uses rt[type(x-3)], right the raw
    # type(x-3)
    out["T2"] = (bp if right else rt[bp]).astype(np.float64)
    out["T1"] = bp.astype(np.float64)          # current pair type
    return out


def _clip_at(buf, idx):
    return buf[jnp.clip(idx, 0, buf.shape[0] - 1)]


def _win(buf, base, sign: int, lo: int, hi: int):
    """w[x - lo, b] = buf[base_b + sign*x] for x in [lo, hi), clipped reads
    (the reference's _at semantics, src/ungapped_extension.cpp)."""
    x = jnp.arange(lo, hi, dtype=jnp.int32)
    return _clip_at(buf, base[None, :] + sign * x[:, None])


# Packed windows (round 5): irregular gathers cost per INDEX on a v5e
# (~100 M idx/s 1-wide; short-row slice-gathers ~2x faster per index and
# deliver 2-16 elements each), and the window reads below were the fused
# stage's wall (~1.9 us/lane). Chars ride [*, 4]-int32 rows of 32 nibbles
# and f32 arrays ride [*, 4] rows (see pipeline._nibble_pack / _row4_f32,
# which also add the 32-entry clip-equivalent head pad), cutting gathered
# INDICES per 45-char window from 45 to 3. Unpacking is fused elementwise
# VPU work. Values are bit-identical to the unpacked clipped reads.
_NPAD = 32  # must match pipeline._NPAD


def _win_offsets(n: int, sign: int, lo: int, hi: int):
    if sign > 0:
        return lo, np.arange(n, dtype=np.int64)
    return -(hi - 1), np.arange(n - 1, -1, -1, dtype=np.int64)


def _row_words(rowbuf, pmin, span: int, per_row: int):
    """Gather the rows covering elements [pmin, pmin + span) of a
    row-packed buffer and return them as a flat word list [NR*W, B] plus
    the in-row offset m = pmin % (row elements)."""
    elems = per_row
    rlo = pmin // jnp.int32(elems)
    m = (pmin % jnp.int32(elems)).astype(jnp.int32)
    NR = (span + elems - 2) // elems + 1
    k = jnp.clip(rlo[None, :] + jnp.arange(NR, dtype=jnp.int32)[:, None],
                 0, rowbuf.shape[0] - 1)
    rows = rowbuf[k]                           # [NR, B, W]
    words = jnp.moveaxis(rows, 2, 1).reshape(NR * rowbuf.shape[1], -1)
    return words, m


def _win_nib(nib4, base, sign: int, lo: int, hi: int):
    """Row-packed-nibble equivalent of _win over a char buffer.
    nib4: [Nw/4, 4] int32, 32 chars per row."""
    n = hi - lo
    off0, cx = _win_offsets(n, sign, lo, hi)
    pmin = base + jnp.int32(_NPAD + off0)
    # nibble positions: row = 32 chars = 4 words
    words, m = _row_words(nib4, pmin, n + 31, 32)
    # words: [NR*4, B] int32; char r sits at nibble m + cx[r]
    rows = []
    nw = words.shape[0]
    for r in range(n):
        c = int(cx[r])
        widx = m + jnp.int32(c)                # nibble index
        q0 = c >> 3
        sel = (widx >> 3) - q0                 # 0..4 (m in 0..31)
        w = words[min(q0, nw - 1)]
        for t in range(1, 5):
            w = jnp.where(sel == t, words[min(q0 + t, nw - 1)], w)
        shift = (widx & 7) * 4
        rows.append((w >> shift) & 15)
    return jnp.stack(rows, 0)


def _win_row4(p4, base, sign: int, lo: int, hi: int):
    """Row-packed equivalent of _win over an f32 buffer ([N/4, 4]):
    element at position p lives at flat slot (p & 3) + p//4*4 of the
    gathered rows; the in-row phase m selects among 4 static slots."""
    n = hi - lo
    off0, cx = _win_offsets(n, sign, lo, hi)
    pmin = base + jnp.int32(_NPAD + off0)
    el, m = _row_words(p4, pmin, n + 3, 4)     # [NE, B], m = pmin & 3
    ne = el.shape[0]
    out = []
    for r in range(n):
        c = int(cx[r])
        w = el[min(c, ne - 1)]
        for t in range(1, 4):
            w = jnp.where(m == t, el[min(c + t, ne - 1)], w)
        out.append(w)
    return jnp.stack(out, 0)


def _phase_planes(dt, right: bool, qraw, draw, WU: int, OX: int):
    """Per-step planes over x in [-OX, WU+1] (plane row x + OX): pair
    types and the u-class loop-energy values, via exact one-hot MXU
    contractions. qraw/draw: raw char windows [X, B]."""
    t = _utables(right)
    hp = jax.lax.Precision.HIGHEST

    def mapc(v):
        return jnp.where(v < 2, 0,
                         jnp.where(v <= 5, v - 1, v - 5)).astype(jnp.int32)

    qm, dm = mapc(qraw), mapc(draw)

    def oh(idx, K):
        return (idx[..., None] ==
                jnp.arange(K, dtype=jnp.int32)).astype(dt)

    def plane(M, qidx, didx):
        Kq, Kd = M.shape[-2], M.shape[-1]
        Nq = jnp.einsum("xbp,pq->xbq", oh(qidx, Kq),
                        jnp.asarray(M, dt), precision=hp)
        return jnp.einsum("xbq,xbq->xb", Nq, oh(didx, Kd), precision=hp)

    def sh(a, k):   # value at offset x - k, aligned to a's rows
        if k == 0:
            return a
        return jnp.concatenate([jnp.zeros((k,) + a.shape[1:], a.dtype),
                                a[:-k]], 0)

    def shf(a, k):  # value at offset x + k (one step further out)
        return jnp.concatenate([a[k:],
                                jnp.zeros((k,) + a.shape[1:], a.dtype)], 0)

    q2 = qm * 5 + sh(qm, 1)
    d2 = dm * 5 + sh(dm, 1)
    q3 = q2 * 5 + sh(qm, 2)
    d3 = d2 * 5 + sh(dm, 2)
    # B reads the mismatch AT the previous pair, whose flanking chars sit
    # one step FURTHER OUT (position p-1 on the left walk = offset y+1)
    q2f = qm * 5 + shf(qm, 1)
    d2f = dm * 5 + shf(dm, 1)
    P = {}
    P["T1"] = plane(t["T1"], qm, dm).astype(jnp.int32)
    P["STK"] = plane(t["STK"], q2, d2)
    P["A"] = plane(t["A"], q2, d2)
    P["B"] = plane(t["B"], q2f, d2f)
    P["I11"] = plane(t["I11"], q3, d3)
    t2p = plane(t["T2"], sh(qm, 3), sh(dm, 3)).astype(jnp.int32)
    i22 = None
    for tt in range(7):
        v = plane(t["I22"][tt], q3, d3)
        i22 = v if i22 is None else jnp.where(t2p == tt, v, i22)
    P["I22"] = i22
    return P


def ungapped_window(q_sp, db_sp, length, dbseq_start, acc_e, hyb_e,
                    qb, qab, dbb, aoff, coff, bufs, dbufs,
                    d: int, dropout: int, active0, wu: int = 24):
    """One fixed window of both extension phases. Same contract as
    ungapped_core (search/ungapped.py) plus an `unfinished` bool per lane:
    lanes still active at the window edge in either phase (their outputs
    are NOT final — re-run them on the lockstep kernel from the same
    inputs). Arithmetic per step is bit-identical to ungapped_core."""
    dt = jnp.float32
    qbuf, q_acc, q_cond, qnib, qacc4, qcond4 = bufs
    dbuf, db_acc, db_cond, dnib, dacc4, dcond4 = dbufs
    OX = dropout + 3
    WU = wu
    XLO, XHI = -OX, WU + 2     # char plane x-range
    r = _raw()
    il100 = [float(r["intloop"][min(2 * u, 30)])
             for u in range(max(dropout + 1, 4))]

    energy0 = (acc_e + hyb_e).astype(dt)
    acc_e = acc_e.astype(dt)
    hyb_e = hyb_e.astype(dt)
    B = q_sp.shape[0]

    def phase(right: bool, i0, j0, ide0, e, a, hh, min_e, min_a, min_h,
              minq_off, p_off, act0):
        """One phase window. i0/j0: origin positions (the hit boundary);
        ide0: db-accessibility anchor. p_off: offset of the last paired
        position relative to i0 (<= 0 at entry). minq_off: offset of the
        current argmin. Offsets grow with the step index s = 1..WU."""
        sign = 1 if right else -1
        qraw = _win_nib(qnib, qb + i0, sign, XLO, XHI)
        draw = _win_nib(dnib, dbb + j0, sign, XLO, XHI)
        # boundary masks (left also stops on i < 0 / j < 0; the clipped
        # char read itself reproduces the reference's _at)
        x = jnp.arange(XLO, XHI, dtype=jnp.int32)
        if not right:
            oob = ((i0[None, :] - x[:, None] < 0)
                   | (j0[None, :] - x[:, None] < 0))
            qraw = jnp.where(oob, 0, qraw)
            draw = jnp.where(oob, 0, draw)
        P = _phase_planes(dt, right, qraw, draw, WU, OX)

        # dense per-step accessibility deltas, reference add order
        # (src/ungapped_extension.cpp:62-67 left, :112-119 right)
        if not right:
            qaw = _win_row4(qacc4, qab + i0, -1, 0, WU + 1)
            qcw = _win_row4(qcond4, qab + i0 + d, -1, 1, WU + 1)
            dcw = _win_row4(dcond4, coff + ide0, 1, 1, WU + 1)
            dacc = ((qaw[1:] - qaw[:-1]) + qcw) + dcw
        else:
            qcw2 = _win_row4(qcond4, qab + i0, 1, 1, WU + 1)
            daw = _win_row4(dacc4, aoff + ide0, -1, 0, WU + 1)
            dcw2 = _win_row4(dcond4, coff + ide0 + d, -1, 1, WU + 1)
            dacc = ((qcw2 + daw[1:]) - daw[:-1]) + dcw2
        dacc = dacc.astype(dt)

        qr_s = lax.slice_in_dim(qraw, OX + 1, OX + WU + 1)
        dr_s = lax.slice_in_dim(draw, OX + 1, OX + WU + 1)
        t1_s = lax.slice_in_dim(P["T1"], OX + 1, OX + WU + 1)
        stk_s = lax.slice_in_dim(P["STK"], OX + 1, OX + WU + 1)
        i11_s = lax.slice_in_dim(P["I11"], OX + 1, OX + WU + 1)
        i22_s = lax.slice_in_dim(P["I22"], OX + 1, OX + WU + 1)
        a_s = lax.slice_in_dim(P["A"], OX + 1, OX + WU + 1)
        # B planes per u >= 3, read at the previous pair's offset s-1-u
        b_us = [lax.slice_in_dim(P["B"], OX - u, OX - u + WU)
                for u in range(3, max(dropout, 4))]
        b_us = jnp.stack(b_us) if b_us else jnp.zeros((1, WU, B), dt)

        xs = dict(s=jnp.arange(1, WU + 1, dtype=jnp.int32),
                  qr=qr_s, dr=dr_s, t1=t1_s, stk=stk_s, i11=i11_s,
                  i22=i22_s, A=a_s, Bu=jnp.moveaxis(b_us, 0, 1),
                  dacc=dacc)

        def step(st, row):
            s = row["s"]
            brk = (row["qr"] < 2) | (row["dr"] < 2)
            act = st["act"] & ~brk
            dv = jnp.where(act, row["dacc"], jnp.asarray(0, dt))
            e = st["e"] + dv
            a = st["a"] + dv
            u = s - 1 - st["p_off"]
            paired = act & (row["t1"] != 0)
            # general-u raw value: intloop[2u] + A + B(prev offset)
            lev = None
            for uu in range(max(dropout, 4) - 1, 2, -1):
                cand = (il100[min(uu, len(il100) - 1)] + row["A"]
                        + row["Bu"][uu - 3])
                lev = cand if lev is None else jnp.where(u == uu, cand, lev)
            lev = jnp.where(u == 2, row["i22"],
                            jnp.where(u == 1, row["i11"],
                                      jnp.where(u == 0, row["stk"], lev)))
            le = jnp.where(paired, (lev / 100.0).astype(dt),
                           jnp.asarray(0, dt))
            e = e + le
            hh = st["hh"] + le
            better = paired & (e < st["min_e"])
            min_e = jnp.where(better, e, st["min_e"])
            min_a = jnp.where(better, a, st["min_a"])
            min_h = jnp.where(better, hh, st["min_h"])
            min_off = jnp.where(better, s, st["min_off"])
            p_off = jnp.where(paired, s, st["p_off"])
            drop = (s - min_off) >= dropout
            act = act & ~drop
            return dict(e=e, a=a, hh=hh, min_e=min_e, min_a=min_a,
                        min_h=min_h, min_off=min_off, p_off=p_off,
                        act=act), None

        st0 = dict(e=e, a=a, hh=hh, min_e=min_e, min_a=min_a, min_h=min_h,
                   min_off=minq_off, p_off=p_off, act=act0)
        st, _ = lax.scan(step, st0, xs, unroll=8)
        return st

    act0 = active0
    stL = phase(False, q_sp, db_sp, dbseq_start + length - 1,
                energy0, acc_e, hyb_e, energy0, acc_e, hyb_e,
                jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), act0)
    unfinished = stL["act"]
    min_p = q_sp - stL["min_off"]
    min_q = db_sp - stL["min_off"]

    stR = phase(True, q_sp + length - 1, db_sp + length - 1, dbseq_start,
                stL["min_e"], stL["min_a"], stL["min_h"],
                stL["min_e"], stL["min_a"], stL["min_h"],
                jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32), act0)
    unfinished = unfinished | stR["act"]
    min_r = q_sp + length - 1 + stR["min_off"]
    min_ids = dbseq_start - stR["min_off"]

    new_len = min_r - min_p + 1
    return dict(q_sp=min_p, db_sp=min_q, q_len=new_len, db_len=new_len,
                dbseq_start=min_ids,
                acc_e=stR["min_a"], hyb_e=stR["min_h"],
                energy=stR["min_e"], unfinished=unfinished)
