"""Batched gapped extension on device (JAX), over flattened buffers.

Reference semantics: src/gapped_extension.cpp:33-319 (mirrored by the
validated native engine, ops/native/search.cc gapped_extend_one). The
reference's pruned stem-candidate list (CheckStemCandidate,
gapped_extension.cpp:213-217) only admits predecessors whose interior loop
size u1+u2 = (i-k-1)+(j-l-1) is <= dropout, so the DP is a *banded*
anti-diagonal sweep: each diagonal L evaluates all cells (i, L-i) as a min
over the (dropout+1)(dropout+2)/2 static (u1,u2) predecessor offsets.

TPU structure (round 4 — measured on chip, NOTES.md):
- The combo min runs as an UNROLLED RUNNING-MIN SCAN in the reference's
  stems-list order (predecessor diagonal ascending, then k ascending):
  strict-< compare/select per combo reproduces the reference's stems-scan
  tie-breaking (first occurrence wins) while every intermediate stays a
  single [W, B] tile.
- ZERO table gathers inside the loop. Every energy-table term is a pure
  function of a few characters around the cell, so all of them are
  precomputed ONCE per call as "planes" over (diagonal, lane): composite
  numpy tables over combined character indices, contracted with one-hot
  character matrices on the MXU (exact: one nonzero per row), then skewed
  from (x, y) to (diagonal, lane) layout by the pad-reshape trick — no
  gather anywhere. In-loop table gathers ran at ~110 M elems/s on a v5e
  (~1 ms per [32, 4096] lookup, 15+ lookups/diagonal = the round-3 wall).
- The DP state the scan reads is a ROLLING WINDOW carried through the
  while loop (dropout+2 diagonal rows), not slices of the full [DD, W, B]
  buffers; only the predecessor-link rows (for traceback) are written to a
  full buffer.
- All per-cell tensors are [W, B] with the HIT BATCH minor, so vector
  lanes see B (thousands) instead of W (= max_ext, 24-64).

Fixed-bound formulation: extension is capped at `max_ext` diagonals; hits
still active at the cap are flagged `overflow` and the caller re-runs them
from their pre-extension state at a deeper cap (device) or on the host
engine (rare — the reference's own dropout rule terminates when no minimum
improves for `dropout` diagonals).

Hits are batched ACROSS queries and db chunks: per-hit base offsets locate
each hit's query/chunk region inside flattened device buffers (see
search/ungapped.py for the packing contract). Traceback runs on device as a
fixed-length scan over the predecessor-link matrix, so only the (short)
base-pair offset lists come back to the host.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from priblast_tpu.utils import jaxcache

jaxcache.enable()  # persistent XLA compile cache for every kernel module


from priblast_tpu.utils import thermo

BIG = np.int32(10_000_000)  # "unbounded" boundary sentinel (reference
#                             MAX_EXTENSION, gapped_extension.cpp:30)


@functools.lru_cache(maxsize=1)
def _tables_np():
    r = thermo.RAW
    f = lambda x: np.asarray(x, np.float64).reshape(-1)
    return dict(
        bp=r.BP_pair.reshape(-1).astype(np.int64),
        rtype=r.rtype.astype(np.int64),
        stack=f(r.stack37),
        bulge=f(r.bulge37),
        i11=f(r.int11_37),
        i21=f(r.int21_37),
        i22=f(r.int22_37),
        mismI=f(r.mismatchI37),
        intloop=f(r.internal_loop37),
        lxc=np.float64(thermo.RAW.lxc37),
        term_au=np.float64(thermo.RAW.TerminalAU),
    )


def _np_wob(t):
    # wobble pair types (reference: gapped_extension.cpp:340)
    return (t == 3) | (t == 4)


def _pallas_mode() -> str:
    """Per-diagonal Pallas sweep (search/gapped_pl.py): VMEM-resident
    rolling windows remove the XLA while-loop's ~0.9 ms/diagonal HBM
    floor. auto = on for the TPU backend; 'interpret' runs the kernel in
    interpreter mode (CPU parity tests)."""
    v = os.environ.get("PRIBLAST_GAPPED_PALLAS", "auto").lower()
    if v in ("0", "false", "never", "off"):
        return "off"
    if v in ("1", "true", "always", "on"):
        return "on"
    if v == "interpret":
        return "interpret"
    return "on" if jax.default_backend() == "tpu" else "off"


def _bulge_const(s: int) -> float:
    r = _tables_np()
    return float(r["bulge"][s] if s <= 30 else
                 r["bulge"][30] + r["lxc"] * np.log(s / 30.0))


@functools.lru_cache(maxsize=8)
def _plane_tables(flag: int):
    """Composite numpy lookup tables over combined-character indices for
    the per-cell energy planes. Conventions: q-side combined index is
    (qm[x]*5 + aux1)(*5 + aux2); d-side likewise with dm[y] leading. All
    value tables are RAW Turner units; the single /100 happens in-kernel
    at the working dtype (matching the round-3 arithmetic exactly — a
    pre-divided f64 table would double-round the f32 path). Table
    compositions mirror ops/native/search.cc loop37_gapped and
    gapped_extension.cpp:426-473.
    """
    r = _tables_np()
    bp = r["bp"].reshape(5, 5)
    rt = r["rtype"]
    t0 = rt[bp] if flag == 1 else bp      # flag-adjusted cell pair type
    st = rt[t0]                           # stored cell type (= rt[type1])
    mism = r["mismI"]
    stack = r["stack"]
    i11, i21, i22 = r["i11"], r["i21"], r["i22"]
    b1 = float(r["bulge"][1])

    # axis order: C1=qm[x], QA=q-aux1, QE=q-aux2, C2=dm[y], DA=d-aux1,
    # DG=d-aux2 (np.ix_ broadcasting)
    A5 = list(range(5))
    C1, QA, C2, DA = np.ix_(A5, A5, A5, A5)
    T = t0[C1, C2]
    S_ = st[QA, DA]                        # st at (aux1_q, aux1_d) chars

    def q2d2(arr):
        return arr.reshape(25, 25)

    out = {}
    # mism_shared: aux = (qm[x-1], dm[y-1])
    out["MS"] = q2d2(mism[(T * 5 + QA) * 5 + DA] if flag == 0 else
                     mism[(T * 5 + DA) * 5 + QA])
    # vm (predecessor-cell mismatch, stored per cell): aux = (qm[x+1],
    # dm[y+1]); reference mism_row with st_row = rt[type1]
    ST = st[C1, C2]
    out["VM"] = q2d2(mism[(ST * 5 + DA) * 5 + QA] if flag == 0 else
                     mism[(ST * 5 + QA) * 5 + DA])
    # helix x'=1 badness: aux = (qm[x+1], dm[y-1]); includes the wobble
    # cross-term with t0 (reference: gapped_extension.cpp:342-364)
    T1 = t0[QA, DA]
    out["BAD1"] = q2d2(((T1 == 0) |
                        (_np_wob(T) & _np_wob(T1))).astype(np.float64))
    # helix x'>=2 badness: single chars (qm[x+x'], dm[y-x'])
    out["BADX"] = (t0 == 0).astype(np.float64)
    # stack-class values, /100 (aux q = qm[x-u1-1+...], aux d = ...):
    #   STK00: pred (x-1, y-1);  STK10: pred (x-2, y-1);  STK01: (x-1, y-2)
    def stk(pt):
        return stack[T * 7 + pt] if flag == 0 else stack[pt * 7 + T]

    out["STK00"] = q2d2(stk(S_))
    out["STK10"] = q2d2(b1 + stk(S_))   # aux: (qm[x-2], dm[y-1])
    out["STK01"] = q2d2(b1 + stk(S_))   # aux: (qm[x-1], dm[y-2])
    # small-internal specials, /100. V11 carries tb in its char axes;
    # V12/V21/V22 are per-tb slates (tb = predecessor stored type 0..6),
    # combined in xy space against the TB planes.
    C1, QA, QE, C2, DA, DG = np.ix_(A5, A5, A5, A5, A5, A5)
    T = t0[C1, C2]
    TB = st[QE, DG]

    def q3d3(arr):
        return arr.reshape(125, 125)

    if flag == 0:
        v11 = i11[((T * 8 + TB) * 5 + QA) * 5 + DA]
    else:
        v11 = i11[((TB * 8 + T) * 5 + QA) * 5 + DA]
    out["V11"] = q3d3(v11)

    C1, QA, C2, DA, DG = np.ix_(A5, A5, A5, A5, A5)
    T = t0[C1, C2]
    v12, v21, v22 = [], [], []
    for tb in range(7):
        if flag == 0:
            v12.append(i21[(((T * 8 + tb) * 5 + QA) * 5 + DG) * 5 + DA])
        else:
            v12.append(i21[(((tb * 8 + T) * 5 + QA) * 5 + DA) * 5 + DG])
        v12[-1] = v12[-1].reshape(25, 125)        # q=(c1,qa) d=(c2,da,dg)
    C1, QA, QE, C2, DA = np.ix_(A5, A5, A5, A5, A5)
    T = t0[C1, C2]
    for tb in range(7):
        if flag == 0:
            z = i21[(((tb * 8 + T) * 5 + DA) * 5 + QA) * 5 + QE]
        else:
            z = i21[(((T * 8 + tb) * 5 + DA) * 5 + QE) * 5 + QA]
        v21.append(z.reshape(125, 25))            # q=(c1,qa,qe) d=(c2,da)
    C1, QA, QE, C2, DA, DG = np.ix_(A5, A5, A5, A5, A5, A5)
    T = t0[C1, C2]
    for tb in range(7):
        if flag == 0:
            z = i22[((((T * 8 + tb) * 5 + QA) * 5 + QE) * 5 + DG) * 5 + DA]
        else:
            z = i22[((((tb * 8 + T) * 5 + QE) * 5 + QA) * 5 + DA) * 5 + DG]
        v22.append(z.reshape(125, 125))
    out["V12"] = np.stack(v12)                    # [7, 25, 125]
    out["V21"] = np.stack(v21)                    # [7, 125, 25]
    out["V22"] = np.stack(v22)                    # [7, 125, 125]
    # bit/bool tables of the flag-adjusted type
    out["NZ0"] = (t0 != 0).astype(np.float64)
    out["W0"] = _np_wob(t0).astype(np.float64)
    out["AU0"] = (t0 > 2).astype(np.float64)
    out["STT"] = st.astype(np.float64)            # stored type (0..6)
    return out


def _sr(x, n: int, fill):
    """Static shift along axis 0 (lane i reads the value lane i - n held);
    saturates to all-fill when the shift covers the whole width."""
    if n == 0:
        return x
    if n >= x.shape[0]:
        return jnp.full(x.shape, fill, x.dtype)
    pad = jnp.full((n,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - n]], axis=0)


def _gather_chars(seq, start, sign: int, xw: int):
    """raw[x, b] = seq[start_b + sign*x], 0 outside bounds; and the GetChar
    mapping (reference: gapped_extension.cpp:401-407)."""
    n = seq.shape[0]
    x = jnp.arange(xw, dtype=jnp.int32)
    pos = start[None, :] + sign * x[:, None]
    oob = (pos < 0) | (pos >= n)
    raw = jnp.where(oob, 0, seq[jnp.clip(pos, 0, n - 1)]).astype(jnp.int32)
    mapped = jnp.where(raw < 2, 0, jnp.where(raw <= 5, raw - 1, raw - 5))
    return raw, mapped.astype(jnp.int32)


def _take(arr2d, idx):
    """arr2d[idx[b], b] with clipping (arr2d is [X, B], idx is [B])."""
    return jnp.take_along_axis(
        arr2d, jnp.clip(idx, 0, arr2d.shape[0] - 1)[None, :], axis=0)[0]


def _extend_dir(q_start, db_start, id_anchor, energy0, acc0,
                valid, qb, qab, dbb, aoff, coff,
                q_enc, db_seq, q_acc, q_cond,
                db_acc, db_cond, *, flag: int,
                d: int, dropout: int, min_helix: int, max_ext: int,
                dtype: str = "float32", allow_pallas: bool = True):
    """One direction (flag 0 = left, 1 = right) of the gapped extension for
    a batch of hits over flattened buffers.

    q_start/db_start: the fixed extension origins in query-local /
    chunk-local coordinates (reference gapped_extension.cpp:88-98 — flag 0:
    hit start points; flag 1: hit end points). id_anchor: db-accessibility
    anchor (flag 0: dbseq_start + db_len - 1; flag 1: dbseq_start).
    energy0/acc0: the hit's current total and accessibility energies.
    qb/qab/dbb: per-hit base offsets into the flat encoded-query, flat
    query-accessibility and flat db-sequence buffers; aoff/coff: absolute
    offsets of the hit's db sequence's accessibility arrays. Returns
    per-hit argmin extension amounts (min_i on the query side, min_j on the
    db side; 0 = no improvement), updated energies, the traceback offset
    lists (tb_i/tb_j, in reference push order, 0-terminated), and an
    `overflow` flag for hits that were still active at max_ext.
    """
    if max_ext > 120:  # survives python -O (a bare assert would not)
        raise ValueError(
            f"max_ext={max_ext} > 120: packed predecessor coords need 14 "
            f"bits (ZW payload bits 16384/32768 would be corrupted)")
    dt = jnp.float64 if dtype == "float64" else jnp.float32
    r_np = _tables_np()
    pt_tab = _plane_tables(flag)
    B = q_start.shape[0]
    W = max_ext               # row i of a diagonal (lane-i axis, axis 0)
    OFF = dropout + 2         # diag D lives at buffer/plane row D + OFF
    DD = max_ext + OFF + 1
    XW = max_ext + max(min_helix, 2)  # char arrays cover offsets 0..XW-1
    Y = W + 1                 # db-offset range of reachable cells
    INF = jnp.asarray(np.inf, dt)
    sign = -1 if flag == 0 else 1
    TAU = jnp.asarray(float(r_np["term_au"]), dt)
    hprec = jax.lax.Precision.HIGHEST

    # --- per-hit character windows ([X, B]: hit batch minor)
    q_raw, qm = _gather_chars(q_enc, qb + q_start, sign, XW)
    db_raw, dm = _gather_chars(db_seq, dbb + db_start, sign, XW)

    # boundary offsets (reference: gapped_extension.cpp:111-134)
    def max_ext_of(raw):
        blocked = raw[1:] < 2
        first = jnp.argmax(blocked, axis=0).astype(jnp.int32) + 1
        return jnp.where(jnp.any(blocked, axis=0), first - 1, BIG)

    maxq = max_ext_of(q_raw)
    maxd = max_ext_of(db_raw)

    # prefix accessibility arrays, extq[x] / extdb[x] = energy of extending
    # x positions (reference: gapped_extension.cpp:156-212). The length-1
    # entry is computed in float32 and widened, as in the reference.
    x1 = jnp.arange(XW, dtype=jnp.int32)
    nq = q_acc.shape[0]
    aoff = aoff.astype(jnp.int32)
    coff = coff.astype(jnp.int32)
    nda, ndc = db_acc.shape[0], db_cond.shape[0]

    def g1(arr, idx, size):
        return arr[jnp.clip(idx, 0, size - 1)]

    def inc3(a_, b_, c_):
        full = a_.astype(dt) - b_.astype(dt) + c_.astype(dt)
        f32 = (a_ - b_ + c_).astype(dt)
        return full.at[1].set(f32[1])

    if flag == 0:
        posq = (qab + q_start)[None, :] - x1[:, None]
        incq = inc3(g1(q_acc, posq, nq), g1(q_acc, posq + 1, nq),
                    g1(q_cond, posq + d, nq))
        incdb = g1(db_cond, (coff + id_anchor)[None, :] + x1[:, None],
                   ndc).astype(dt)
    else:
        incq = g1(q_cond, (qab + q_start)[None, :] + x1[:, None],
                  nq).astype(dt)
        posd = (aoff + id_anchor)[None, :] - x1[:, None]
        posc = (coff + id_anchor)[None, :] - x1[:, None]
        incdb = inc3(g1(db_acc, posd, nda), g1(db_acc, posd + 1, nda),
                     g1(db_cond, posc + d, ndc))
    # SEQUENTIAL prefix chaining (reference gapped_extension.cpp:156-212
    # adds one entry at a time): jnp.cumsum lowers to a tree reduction
    # whose f32 rounding drifts ~1 ulp from the native engine and flips
    # near-tie argmins; a lax.scan reproduces the exact chain
    def seq_prefix(inc):
        def stp(c, row):
            c = c + row
            return c, c
        _, out = lax.scan(stp, jnp.zeros(B, dt), inc[1:], unroll=8)
        return jnp.concatenate([jnp.zeros((1, B), dt), out], 0)

    extq = seq_prefix(incq)
    extdb = seq_prefix(incdb)

    # reversed+padded view for the per-diagonal extdb row: row slices of
    # rev(extdb) starting at XW-1-L give vector extdb[L - i] over rows i
    pad_r = dropout + max(min_helix, 2) + W + 2
    extdbr = jnp.concatenate(
        [extdb[::-1], jnp.full((pad_r, B), INF, dt)], axis=0)

    def dslice(arr, start, width=W):
        start = jnp.asarray(start, jnp.int32)
        return lax.dynamic_slice(arr, (start, jnp.asarray(0, jnp.int32)),
                                 (width, B))

    extq_i = extq[:W]
    i_lane = jnp.arange(W, dtype=jnp.int32)[:, None]  # [W, 1]

    # --- plane construction: every table term as a sheared (diag-major)
    # plane [DD, W, B], built by one-hot MXU contraction in (x, y) space
    # plus the pad-reshape skew — no gathers.
    def shiftq(k, up=False):
        # qm[x + k] (up) or qm[x - k] (down), over x in [0, W)
        return qm[k:k + W] if up else _sr(qm[:W], k, 0)

    dmY = dm[:Y]

    def shiftd(k, up=False):
        return dm[k:k + Y] if up else _sr(dmY, k, 0)

    # bf16 one-hots when the working dtype is f32: 0/1 are exact in bf16
    # and precision=HIGHEST keeps every product exact, so plane values are
    # bit-identical while the dominant [W|Y, B, K] traffic halves
    oh_dt = jnp.bfloat16 if dt == jnp.float32 else dt

    def onehot(idx, K):
        return (idx[..., None] ==
                jnp.arange(K, dtype=jnp.int32)).astype(oh_dt)

    def pairq(aux):
        return qm[:W] * 5 + aux

    def paird(aux):
        return dmY * 5 + aux

    def xy_plane(M, qidx, didx):
        """P[x, y, b] = M[qidx[x, b], didx[y, b]] via two exact one-hot
        contractions (one nonzero per output)."""
        Kq, Kd = M.shape
        Nq = jnp.einsum("xbp,pq->xbq", onehot(qidx, Kq),
                        jnp.asarray(M, dt), precision=hprec)
        return jnp.einsum("xbq,ybq->xyb", Nq, onehot(didx, Kd),
                          precision=hprec)

    def shear(P, fill):
        """[W, Y, B] (x, y) -> [DD, W, B] diag-major (diag D at row D+OFF);
        S[D + OFF, i] = P[i, D - i] (garbage where D < i, which is outside
        the valid anti-diagonal cells)."""
        Yp = W + 2
        if Yp > P.shape[1]:
            P = jnp.concatenate(
                [P, jnp.full((W, Yp - P.shape[1], B), fill, P.dtype)], 1)
        flat = P.reshape(W * Yp, B)
        Bm = flat[: W * (Yp - 1)].reshape(W, Yp - 1, B)
        S = Bm[:, : W + 1].transpose(1, 0, 2)
        return jnp.concatenate(
            [jnp.full((OFF, W, B), fill, P.dtype), S], 0)

    qx, qm1, qm2 = qm[:W], shiftq(1), shiftq(2)
    qp1 = shiftq(1, up=True)
    dym1, dym2, dym3 = shiftd(1), shiftd(2), shiftd(3)
    dyp1 = shiftd(1, up=True)

    P = {}
    P["MS"] = shear(xy_plane(pt_tab["MS"], pairq(qm1), paird(dym1)), 0.0)
    P["VM"] = shear(xy_plane(pt_tab["VM"], pairq(qp1), paird(dyp1)), 0.0)
    P["STK00"] = shear(xy_plane(pt_tab["STK00"], pairq(qm1),
                                paird(dym1)) / 100.0, 0.0)
    P["STK10"] = shear(xy_plane(pt_tab["STK10"], pairq(qm2),
                                paird(dym1)) / 100.0, 0.0)
    P["STK01"] = shear(xy_plane(pt_tab["STK01"], pairq(qm1),
                                paird(dym2)) / 100.0, 0.0)
    q3 = pairq(qm1) * 5 + qm2
    d3 = paird(dym1) * 5 + dym2
    P["V11"] = shear(xy_plane(pt_tab["V11"], q3, d3) / 100.0, 0.0)
    # V12/V21/V22: per-tb xy planes combined against the predecessor
    # stored-type plane (char-derived; garbage preds carry INF energy)
    stt = jnp.asarray(pt_tab["STT"], dt)

    def tb_plane(qo: int, do: int):
        # stored type at (x - qo, y - do) as int [W, Y, B]
        v = xy_plane(stt.reshape(5, 5), shiftq(qo), shiftd(do))
        return v.astype(jnp.int32)

    def tb_combine(tabs, qidx, didx, tbp):
        Kq, Kd = tabs[0].shape
        if min(Kq, Kd) < 125:
            # stack the 7 tb-slates into ONE einsum pair (the per-tb loop
            # cost 7 einsum pairs; contraction starts on the WIDE side so
            # the stacked intermediate carries the narrow one)
            T = jnp.asarray(np.stack(tabs), dt)     # [7, Kq, Kd]
            if Kd <= Kq:
                Nq = jnp.einsum("xbp,tpq->xbtq", onehot(qidx, Kq), T,
                                precision=hprec)
                V = jnp.einsum("xbtq,ybq->xybt", Nq, onehot(didx, Kd),
                               precision=hprec)
            else:
                Nd = jnp.einsum("ybq,tpq->ybtp", onehot(didx, Kd), T,
                                precision=hprec)
                V = jnp.einsum("xbp,ybtp->xybt", onehot(qidx, Kq), Nd,
                               precision=hprec)
            acc = V[..., 0]
            for tb in range(1, 7):
                acc = jnp.where(tbp == tb, V[..., tb], acc)
            return acc
        acc = None
        for tb in range(7):
            v = xy_plane(tabs[tb], qidx, didx)
            acc = v if acc is None else jnp.where(tbp == tb, v, acc)
        return acc

    P["V12"] = shear(tb_combine(pt_tab["V12"], pairq(qm1), d3,
                                tb_plane(2, 3)) / 100.0, 0.0)
    P["V21"] = shear(tb_combine(pt_tab["V21"], q3, paird(dym1),
                                tb_plane(3, 2)) / 100.0, 0.0)
    P["V22"] = shear(tb_combine(pt_tab["V22"], q3, d3,
                                tb_plane(3, 3)) / 100.0, 0.0)
    # type-bit planes (flag-adjusted cell type t0): nonzero, wobble,
    # terminal-AU, helix badness, packed pred-type bits
    nz0_xy = xy_plane(pt_tab["NZ0"], qx, dmY)
    w0_xy = xy_plane(pt_tab["W0"], qx, dmY)
    # helix lookahead pairs (qm[x+x'], dm[y+x']): both strands advance in
    # the extension direction (reference dslice dm[L - i + x], i.e. y + x)
    if min_helix >= 2:
        bad_xy = xy_plane(pt_tab["BAD1"], pairq(qp1), paird(dyp1))
    else:
        bad_xy = jnp.zeros((W, Y, B), dt)
    for x2 in range(2, min_helix):
        bad_xy = jnp.maximum(
            bad_xy, xy_plane(pt_tab["BADX"], shiftq(x2, up=True),
                             shiftd(x2, up=True)))
    P["NZ0"] = shear(nz0_xy > 0.5, False)
    P["W0"] = shear(w0_xy > 0.5, False)
    P["AU0"] = shear(xy_plane(pt_tab["AU0"], qx, dmY) > 0.5, False)
    P["BAD"] = shear(bad_xy > 0.5, False)
    # candidate payload bits: pred stored type == 0 -> bit 14, wobble ->
    # bit 15 (wob(rt[t]) == wob(t) and rt[t] == 0 <=> t == 0)
    P["ZW"] = shear(((nz0_xy < 0.5).astype(jnp.int32) * 16384
                     + (w0_xy > 0.5).astype(jnp.int32) * 32768), 0)

    # lane-pad the plane/window arrays the combo scan reads SHIFTED, so a
    # shift by sh becomes a STATIC SLICE [PAD-sh : PAD-sh+W] (a fusable
    # view) instead of a pad+concat that materializes an intermediate per
    # combo — the concat form ran each combo at HBM speed (NOTES.md r4)
    PAD = dropout + 2
    PW = W + PAD

    def lanepad(x, fill):
        return jnp.concatenate(
            [jnp.full(x.shape[:-2] + (PAD,) + x.shape[-1:], fill, x.dtype),
             x], axis=-2)

    P["VM"] = lanepad(P["VM"], jnp.asarray(0, dt))
    P["ZW"] = lanepad(P["ZW"], 0)
    P["AU0"] = lanepad(P["AU0"], False)

    _PADDED = ("VM", "ZW", "AU0")

    def prow(name, L):
        # lane-padded planes carry PAD leading pad lanes; a current-cell
        # row read must skip them
        lane0 = PAD if name in _PADDED else 0
        return lax.dynamic_slice(
            P[name], (L + OFF, jnp.asarray(lane0, jnp.int32),
                      jnp.asarray(0, jnp.int32)), (1, W, B))[0]

    def pwin(name, L, w=None):
        return lax.dynamic_slice(
            P[name], (L, jnp.asarray(0, jnp.int32),
                      jnp.asarray(0, jnp.int32)),
            (dropout + 2, w or W, B))

    # --- origin cell (reference: gapped_extension.cpp:116-127)
    bp_j = jnp.asarray(r_np["bp"].astype(np.int32))
    rt_j = jnp.asarray(r_np["rtype"].astype(np.int32))
    oq = _take(qm, jnp.zeros(B, jnp.int32))
    od = _take(dm, jnp.zeros(B, jnp.int32))
    otype = bp_j[oq * 5 + od]
    if flag == 0:
        otype = rt_j[otype]
    origin_hyb = jnp.full((PW, B), INF, dt).at[PAD].set(
        jnp.where(valid, energy0.astype(dt), INF))
    o_adm = jnp.zeros((W, B), bool).at[0].set(valid)

    # rolling windows at L = 1: rows = diags -1-dropout .. 0 (the hyb
    # window is lane-padded with INF; the admission window is not shifted)
    win_h0 = jnp.concatenate(
        [jnp.full((dropout + 1, PW, B), INF, dt), origin_hyb[None]], 0)
    win_a0 = jnp.concatenate(
        [jnp.zeros((dropout + 1, W, B), bool), o_adm[None]], 0)
    # mt bits (type of the cell's recorded predecessor): diag -1 row = all
    # type 0; diag 0 row = origin type at lane 0
    mtz_m1 = jnp.ones((W, B), bool)
    mtw_m1 = jnp.zeros((W, B), bool)
    mtz_0 = jnp.ones((W, B), bool).at[0].set(otype == 0)
    mtw_0 = jnp.zeros((W, B), bool).at[0].set((otype == 3) | (otype == 4))

    pred_buf = jnp.full((DD, W, B), -1, jnp.int32)

    # (u1, u2) predecessor offsets in the reference's stems-list order
    combos = [(s, u1) for s in range(dropout, -1, -1)
              for u1 in range(s, -1, -1)]
    ME1 = max_ext + 1

    def body(st):
        L = st["L"]
        active = st["active"]
        win_h, win_a = st["win_h"], st["win_a"]
        z0 = jnp.asarray(0, L.dtype)

        nz0 = prow("NZ0", L)
        w0 = prow("W0", L)
        au0 = prow("AU0", L)
        badr = prow("BAD", L)
        ms = prow("MS", L)
        extdb_j = dslice(extdbr, XW - 1 - L)

        # stems[0] fallback bits: first admitted cell in (diag, k) order
        # over the surviving window (reference gapped_extension.cpp:230-258,
        # min_k initialized to 0); only its (==0, wobble) bits are needed
        adm_flat = win_a.reshape(-1, B)
        first_idx = jnp.argmax(adm_flat, axis=0)
        any_adm = jnp.any(adm_flat, axis=0)
        nzw = pwin("NZ0", L).reshape(-1, B)
        w0w = pwin("W0", L).reshape(-1, B)
        s0_nz = jnp.take_along_axis(nzw, first_idx[None], axis=0)[0]
        s0_w = jnp.take_along_axis(w0w, first_idx[None], axis=0)[0]
        stem0_z = jnp.where(any_adm, ~s0_nz, True)
        stem0_w = jnp.where(any_adm, s0_w, False)

        # --- helix/wobble admission (reference: gapped_extension.cpp:342-364)
        # prev_mt = m[i-1][j-1].type: diag L-2 bits shifted one lane (the
        # shifted-in lane reads type 0 -> z bit True)
        prev_z = _sr(st["mtz_m1"], 1, True)
        prev_w = _sr(st["mtw_m1"], 1, False)
        gate = prev_z | (w0 & prev_w)
        j_lane = L - i_lane               # [W, 1]
        cellmask = (active[None, :] & (i_lane >= 1)
                    & (i_lane <= L - 1)
                    & (i_lane <= maxq[None, :])
                    & (j_lane <= maxd[None, :]))
        adm_new = cellmask & nz0 & ~(gate & badr)

        # --- running-min combo scan (stems order; strict < keeps the first
        # occurrence, reproducing the reference's stems-scan tie-breaking).
        # Non-admitted predecessor cells hold INF in the hyb window, so
        # garbage plane values can never win; no admission mask needed.
        vm_win = pwin("VM", L, PW)
        au_win = pwin("AU0", L, PW)
        zw_win = pwin("ZW", L, PW)
        au_f = jnp.where(au0, TAU, jnp.asarray(0, dt))
        base_pk = i_lane * max_ext + L    # i*ME1 + (L - i) = packed (i, j)
        cands = []                        # per-combo (Et, payload)
        z32 = jnp.asarray(0, dt)

        def shv(win2d, sh):
            # lane i reads the value lane i - sh held (static view of the
            # lane-padded row)
            return win2d[PAD - sh: PAD - sh + W]

        for (s, u1) in combos:
            u2 = s - u1
            r = dropout - s
            sh = u1 + 1
            ph_sh = shv(win_h[r], sh)
            if s >= 2 and u1 >= 1 and u2 >= 1 and \
                    (u1, u2) not in ((1, 1), (1, 2), (2, 1), (2, 2)):
                raw = ((float(r_np["intloop"][min(s, 30)]) + ms)
                       + shv(vm_win[r], sh))
                Et = raw / 100.0 + ph_sh
            elif s >= 2 and (u1 == 0 or u2 == 0):
                au_p = jnp.where(shv(au_win[r], sh), TAU, z32)
                Et = (_bulge_const(s) + au_f + au_p) / 100.0 + ph_sh
            else:
                name = {(0, 0): "STK00", (1, 0): "STK10", (0, 1): "STK01",
                        (1, 1): "V11", (1, 2): "V12", (2, 1): "V21",
                        (2, 2): "V22"}[(u1, u2)]
                Et = prow(name, L) + ph_sh
            # payload: packed pred coords (k, l) = (i-u1-1, j-u2-1) plus
            # the pred stored-type bits from the ZW plane
            pay = (shv(zw_win[r], sh)
                   + (base_pk - ((u1 + 1) * ME1 + u2 + 1)))
            cands.append((Et, pay))

        # tournament reduction with LEFT priority on ties (a <= b keeps
        # the left candidate), which preserves the stems-list
        # first-occurrence tie-break while cutting the serial select
        # chain from C stages to log2(C)
        while len(cands) > 1:
            nxt = []
            for ci2 in range(0, len(cands) - 1, 2):
                (ea, pa), (eb, pb) = cands[ci2], cands[ci2 + 1]
                left = ea <= eb
                nxt.append((jnp.where(left, ea, eb),
                            jnp.where(left, pa, pb)))
            if len(cands) % 2:
                nxt.append(cands[-1])
            cands = nxt
        run_min, run_pay = cands[0]
        run_pay = jnp.where(jnp.isinf(run_min), 0, run_pay)

        hyb = run_min
        nopred = jnp.isinf(hyb)
        pay = jnp.maximum(run_pay, 0)
        pk = pay & 16383
        mtz_c = jnp.where(nopred, stem0_z, (pay & 16384) != 0)
        mtw_c = jnp.where(nopred, stem0_w, (pay & 32768) != 0)
        packed = jnp.where(nopred, 0, pk)

        hyb_row = jnp.where(adm_new, hyb, INF)
        pr_row = jnp.where(adm_new, packed, -1)
        mtz_row = jnp.where(adm_new, mtz_c, True)
        mtw_row = jnp.where(adm_new, mtw_c, False)

        # --- running minimum (reference: gapped_extension.cpp:259-276)
        inter = jnp.where(adm_new, extq_i + extdb_j + hyb, INF)
        dmin = jnp.min(inter, axis=0)
        darg = jnp.argmin(inter, axis=0).astype(jnp.int32)
        improve = active & (dmin < st["min_e"])
        min_e = jnp.where(improve, dmin, st["min_e"])
        min_i = jnp.where(improve, darg, st["min_i"])
        min_j = jnp.where(improve, L - darg, st["min_j"])
        min_len = jnp.where(improve, L, st["min_len"])
        acc_new = acc0.astype(dt) + _take(extq, darg) + _take(extdb, L - darg)
        min_a = jnp.where(improve, acc_new, st["min_a"])

        # --- termination (reference: gapped_extension.cpp:292-297)
        stop = ((L - min_len >= dropout)
                | ((L > maxq) & (L > maxd)))
        ovf = st["ovf"] | (active & ~stop & (L >= max_ext))
        active = active & ~stop & (L < max_ext)

        return dict(L=L + 1, active=active, ovf=ovf,
                    min_e=min_e, min_i=min_i, min_j=min_j, min_len=min_len,
                    min_a=min_a,
                    win_h=jnp.concatenate(
                        [win_h[1:],
                         jnp.concatenate([jnp.full((PAD, B), INF, dt),
                                          hyb_row], 0)[None]], 0),
                    win_a=jnp.concatenate([win_a[1:], adm_new[None]], 0),
                    mtz_m1=st["mtz_0"], mtw_m1=st["mtw_0"],
                    mtz_0=mtz_row, mtw_0=mtw_row,
                    pred=lax.dynamic_update_slice(
                        st["pred"], pr_row[None], (L + OFF, z0, z0)))

    pl_mode = (_pallas_mode()
               if dtype == "float32" and allow_pallas else "off")
    if pl_mode != "off":
        from priblast_tpu.search import gapped_pl

        EXTD = jnp.stack([dslice(extdbr, XW - 1 - LL)
                          for LL in range(1, max_ext + 1)])
        intloop_c = tuple(float(r_np["intloop"][min(s, 30)])
                          for s in range(dropout + 1))
        bulge_c = tuple(_bulge_const(s) if s >= 2 else 0.0
                        for s in range(dropout + 1))
        pf = jnp.concatenate(
            [valid.astype(dt)[None], energy0.astype(dt)[None],
             acc0.astype(dt)[None], jnp.zeros((5, B), dt)], axis=0)
        pred_pl, ints_pl, floats_pl = gapped_pl.pallas_sweep(
            P, extq_i, EXTD, maxq, maxd, origin_hyb, o_adm, mtz_0, mtw_0,
            pf, W=W, dropout=dropout, max_ext=max_ext,
            combos=tuple(combos), intloop_c=intloop_c, bulge_c=bulge_c,
            tau=float(r_np["term_au"]),
            interpret=(pl_mode == "interpret"))
        st = dict(min_i=ints_pl[0], min_j=ints_pl[1],
                  ovf=ints_pl[3] > 0,
                  min_e=floats_pl[0], min_a=floats_pl[1],
                  pred=jnp.concatenate(
                      [jnp.full((OFF + 1, W, B), -1, jnp.int32), pred_pl],
                      axis=0))
    else:
        st = dict(L=jnp.asarray(1, jnp.int32), active=valid,
                  ovf=jnp.zeros(B, bool),
                  min_e=energy0.astype(dt), min_i=jnp.zeros(B, jnp.int32),
                  min_j=jnp.zeros(B, jnp.int32),
                  min_len=jnp.zeros(B, jnp.int32),
                  min_a=acc0.astype(dt),
                  win_h=win_h0, win_a=win_a0,
                  mtz_m1=mtz_m1, mtw_m1=mtw_m1, mtz_0=mtz_0, mtw_0=mtw_0,
                  pred=pred_buf)
        st = lax.while_loop(lambda s: jnp.any(s["active"]), body, st)

    # --- device traceback (reference: gapped_extension.cpp:409-424): walk
    # the predecessor links from (min_i, min_j); every step decreases the
    # diagonal by >= 2, so max_ext // 2 + 1 steps always reach the origin.
    pred_flat = st["pred"].reshape(DD * W, B)

    def tb_step(carry, _):
        ti, tj = carry
        live = (ti != 0) & (tj != 0)
        packed = jnp.take_along_axis(
            pred_flat, ((ti + tj + OFF) * W + ti)[None], axis=0)[0]
        packed = jnp.maximum(packed, 0)
        nti = jnp.where(live, packed // ME1, 0)
        ntj = jnp.where(live, packed % ME1, 0)
        return (nti.astype(jnp.int32), ntj.astype(jnp.int32)), \
            (jnp.where(live, ti, 0), jnp.where(live, tj, 0))

    (_, _), (tb_i, tb_j) = lax.scan(tb_step, (st["min_i"], st["min_j"]),
                                    None, length=max_ext // 2 + 1)
    return dict(min_i=st["min_i"], min_j=st["min_j"], min_e=st["min_e"],
                min_a=st["min_a"], overflow=st["ovf"],
                tb_i=tb_i.T, tb_j=tb_j.T)


gapped_extend_device = functools.partial(
    jax.jit, static_argnames=("flag", "d", "dropout", "min_helix",
                              "max_ext", "dtype"))(_extend_dir)

# hit_i column order for the fused both-directions call
_HI_COLS = ("q_sp", "db_sp", "q_len", "db_len", "dbseq_start",
            "qb", "qab", "dbb", "aoff", "coff")


@functools.partial(jax.jit,
                   static_argnames=("d", "dropout", "min_helix", "max_ext",
                                    "dtype", "allow_pallas"))
def gapped_extend_both(hit_i, hit_f, valid,
                       q_enc, db_seq, q_acc, q_cond, db_acc, db_cond, *,
                       d: int, dropout: int, min_helix: int, max_ext: int,
                       dtype: str = "float32", allow_pallas: bool = True):
    """Both extension directions in ONE device program (left, then right
    from the post-left extents — reference gapped_extension.cpp:41-47).
    One dispatch + stacked transfers: on a tunneled chip each jit call
    costs ~10-30 ms of dispatch/sync, so the per-direction host round
    trip of the staged form dominated small batches (NOTES.md round 4).

    hit_i: [B, 10] int32, columns per _HI_COLS; hit_f: [B, 2] float64
    (energy, acc_e); valid: [B] bool. Returns (ints [B, 4] = min_i/j of
    each direction, floats [B, 2] = final energy/acc, overflow [B],
    tb [B, 4, T] = tb_i0, tb_j0, tb_i1, tb_j1).
    """
    cols = {k: hit_i[:, ci] for ci, k in enumerate(_HI_COLS)}
    energy, acc_e = hit_f[:, 0], hit_f[:, 1]
    seqs = (q_enc, db_seq, q_acc, q_cond, db_acc, db_cond)
    bases = tuple(cols[k] for k in ("qb", "qab", "dbb", "aoff", "coff"))
    kw = dict(d=d, dropout=dropout, min_helix=min_helix, max_ext=max_ext,
              dtype=dtype, allow_pallas=allow_pallas)
    r0 = _extend_dir(cols["q_sp"], cols["db_sp"],
                     cols["dbseq_start"] + cols["db_len"] - 1,
                     energy, acc_e, valid, *bases, *seqs, flag=0, **kw)
    q_sp2 = cols["q_sp"] - r0["min_i"]
    db_sp2 = cols["db_sp"] - r0["min_j"]
    q_end2 = q_sp2 + (cols["q_len"] + r0["min_i"]) - 1
    db_end2 = db_sp2 + (cols["db_len"] + r0["min_j"]) - 1
    r1 = _extend_dir(q_end2, db_end2, cols["dbseq_start"],
                     r0["min_e"], r0["min_a"], valid, *bases, *seqs,
                     flag=1, **kw)
    # int8 transfers: extents and traceback offsets are <= max_ext <= 120
    # (guarded above), and the tunneled-host D2H path runs at ~10-20 MB/s,
    # so the [B, 4, T] traceback array dominates per-block wall time at f32
    ints = jnp.stack([r0["min_i"], r0["min_j"], r1["min_i"], r1["min_j"]],
                     axis=1).astype(jnp.int8)
    floats = jnp.stack([r1["min_e"], r1["min_a"]], axis=1)
    tb = jnp.stack([r0["tb_i"], r0["tb_j"], r1["tb_i"], r1["tb_j"]],
                   axis=1).astype(jnp.int8)
    return ints, floats, r0["overflow"] | r1["overflow"], tb


def gapped_extend_flat_batch(hits, qbufs, dbufs, *, d: int,
                             dropout: int, min_helix: int, max_ext: int = 64,
                             dtype: str = "float32",
                             pad_to: int | None = None, mesh=None):
    """Both extension directions for a hit batch (SoA numpy dict carrying
    per-hit base offsets qb/qab/dbb/aoff/coff), device DP + device
    traceback. Returns (updated hit dict, bp dict, overflow mask). The bp
    dict holds the gapped base pairs in reference push order as flattened
    arrays: n0/q0/db0 for the left extension (per-hit counts + coords) and
    n1/q1/db1 for the right. Hits flagged overflow are NOT extended here —
    the caller must re-run them at a deeper max_ext (device) or on the host
    engine from their pre-extension state.

    qbufs = (q_enc_flat, q_acc_flat, q_cond_flat) and dbufs = (db_seq_flat,
    db_acc_flat, db_cond_flat) are jnp device copies; reference:
    gapped_extension.cpp:41-67.
    """
    from priblast_tpu.parallel import dist

    n = len(hits["q_sp"])
    B = pad_to or max(8, 1 << (n - 1).bit_length())
    assert B >= n

    hit_i = np.zeros((B, len(_HI_COLS)), np.int32)
    for ci, k in enumerate(_HI_COLS):
        hit_i[:n, ci] = hits[k]
    hit_i[n:, 2] = 1   # q_len
    hit_i[n:, 3] = 1   # db_len
    hit_f = np.zeros((B, 2), np.float64)
    hit_f[:n, 0] = hits["energy"]
    hit_f[:n, 1] = hits["acc_e"]
    valid = np.zeros(B, bool)
    valid[:n] = True

    ints, floats, ovf, tb = gapped_extend_both(
        dist.put_batch(hit_i, mesh), dist.put_batch(hit_f, mesh),
        dist.put_batch(valid, mesh),
        qbufs[0], dbufs[0], qbufs[1], qbufs[2], dbufs[1], dbufs[2],
        d=d, dropout=dropout, min_helix=min_helix, max_ext=max_ext,
        dtype=dtype, allow_pallas=mesh is None)
    for x in (ints, floats, ovf, tb):
        try:  # overlap the four D2H latencies (tunnel round trips)
            x.copy_to_host_async()
        except Exception:
            pass
    ints = np.asarray(ints)[:n].astype(np.int32)
    floats = np.asarray(floats)[:n]
    tb = np.asarray(tb)[:n].astype(np.int32)
    overflow = np.asarray(ovf)[:n]
    m_i0, m_j0, m_i1, m_j1 = (ints[:, k] for k in range(4))
    q_sp = hits["q_sp"].astype(np.int32)
    db_sp = hits["db_sp"].astype(np.int32)
    q_sp2 = q_sp - m_i0
    db_sp2 = db_sp - m_j0
    q_len2 = hits["q_len"].astype(np.int32) + m_i0
    db_len2 = hits["db_len"].astype(np.int32) + m_j0

    def coords(tb_i, tb_j, q0, db0, sgn):
        """Vectorized traceback coordinates in push order."""
        mask = (tb_i > 0) & (tb_j > 0)
        cq = (q0[:, None] + sgn * tb_i)[mask]
        cdb = (db0[:, None] + sgn * tb_j)[mask]
        return dict(n=mask.sum(axis=1).astype(np.int64),
                    q=cq.astype(np.int32), db=cdb.astype(np.int32))

    bp0 = coords(tb[:, 0], tb[:, 1], q_sp, db_sp, -1)
    bp1 = coords(tb[:, 2], tb[:, 3], q_sp2 + q_len2 - 1,
                 db_sp2 + db_len2 - 1, 1)

    out = dict(hits)
    out["q_sp"] = q_sp2
    out["db_sp"] = db_sp2
    out["q_len"] = q_len2 + m_i1
    out["db_len"] = db_len2 + m_j1
    out["dbseq_start"] = hits["dbseq_start"].astype(np.int32) - m_j1
    out["energy"] = floats[:, 0].astype(np.float64)
    out["acc_e"] = floats[:, 1].astype(np.float64)
    out["hyb_e"] = out["energy"] - out["acc_e"]
    bps = dict(n0=bp0["n"], q0=bp0["q"], db0=bp0["db"],
               n1=bp1["n"], q1=bp1["q"], db1=bp1["db"])
    return out, bps, overflow
